"""`python -m gaussctrl_tpu.cli.splat_train` — from-scratch 3DGS pre-training.

The `ns-train splatfacto` role (/root/reference/README.md:100-113: every scene
is pre-trained 30k steps before editing), made standalone: parse the scene,
seed gaussians from the sparse point cloud, optimize with static-capacity
densification, save a step-numbered npz the edit CLI consumes via
`--load-checkpoint`.
"""

from __future__ import annotations

import argparse
import time
from pathlib import Path

import numpy as np

from gaussctrl_tpu.cli.flags import add_dataclass_flags, apply_overrides
from gaussctrl_tpu.core.ckpt import save_checkpoint
from gaussctrl_tpu.core.writer import MetricsWriter
from gaussctrl_tpu.data.datamanager import DataManager, DataManagerConfig
from gaussctrl_tpu.splat.pretrain import PretrainConfig, pretrain


def _git_tracked_archives(ckpt_dir: Path) -> set[str]:
    """Names of fp16 archives in `ckpt_dir` that are tracked by git.

    Pruning must NEVER unlink a git-tracked archive: round 3's end-of-round
    snapshot committed the deletion of every archive precisely because the
    latest-only cycle had already unlinked files that were in HEAD. Tracked
    archives are retired by the committer (scripts/commit_archives.py) in
    the same commit that adds the newer one — never by the training loop."""
    import subprocess
    try:
        out = subprocess.run(
            ["git", "ls-files", "--", "step-*.fp16.npz"],
            capture_output=True, text=True, cwd=str(ckpt_dir), timeout=30)
        return {Path(line).name for line in out.stdout.splitlines() if line}
    except (OSError, subprocess.SubprocessError):
        return set()


def _save_ckpt(ckpt_dir, step, scene, archive: bool):
    """Step-numbered checkpoint, optionally with a committable fp16 archive.

    Archives follow a latest-only pruning cycle EXCEPT for git-tracked
    files (see _git_tracked_archives): the point is ONE small file a round
    can `git add -f` after every segment (outputs/bear_r3c/README.md has
    the resume recipe). Stale archives from a previous run can't collide:
    out_dir is timestamped per run, so every ckpts dir starts empty."""
    out = save_checkpoint(ckpt_dir, step, scene)
    if archive:
        from gaussctrl_tpu.core.ckpt import compress_scene_npz
        arch = compress_scene_npz(out, out.with_suffix(".fp16.npz"))
        tracked = _git_tracked_archives(Path(ckpt_dir))
        for f in Path(ckpt_dir).glob("step-*.fp16.npz"):
            if f != arch and f.name not in tracked:
                f.unlink()
    return out


def main(argv=None):
    p = argparse.ArgumentParser(prog="gaussctrl-splat-train",
                                description="3DGS pre-training (splatfacto role)")
    p.add_argument("--data", required=True)
    p.add_argument("--output-dir", default="outputs")
    p.add_argument("--experiment-name", default=None)
    p.add_argument("--sh-degree", type=int, default=3)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--resume-checkpoint", default=None,
                   help="mid-run scene .npz to resume from (step parsed "
                        "from the filename; schedules continue)")
    p.add_argument("--archive-ckpts", action="store_true",
                   help="also write a compressed fp16 archive next to every "
                        "mid-run checkpoint (step-*.fp16.npz, ~4x smaller; "
                        "small enough to commit to git so the run survives "
                        "container resets — resume accepts it directly)")
    add_dataclass_flags(p, PretrainConfig, "trainer")
    from gaussctrl_tpu.splat.rasterize import RasterConfig
    add_dataclass_flags(p, RasterConfig, "raster")
    from gaussctrl_tpu.core.mesh import enable_persistent_cache
    enable_persistent_cache()
    args = p.parse_args(argv)

    cfg = apply_overrides(PretrainConfig(), args, "trainer")
    from gaussctrl_tpu.splat.rasterize import RasterConfig
    raster_cfg = apply_overrides(RasterConfig(), args, "raster")
    init_scene, start_step = None, 0
    if args.resume_checkpoint:
        from gaussctrl_tpu.core.ckpt import checkpoint_step, load_scene_npz
        init_scene = load_scene_npz(args.resume_checkpoint)
        start_step = checkpoint_step(args.resume_checkpoint) or 0
        print(f"[splat-train] resuming from {args.resume_checkpoint} "
              f"@ step {start_step} ({init_scene.num_gaussians} gaussians)",
              flush=True)
    dcfg = DataManagerConfig(load_all=True)
    dcfg.dataparser.data = args.data
    dm = DataManager(dcfg)
    parsed = dm.parsed
    assert parsed.points_xyz is not None, (
        f"{args.data} has no ply_file_path sparse point cloud")

    exp = args.experiment_name or Path(args.data).name
    out_dir = Path(args.output_dir) / exp / "splat" / time.strftime(
        "%Y-%m-%d_%H%M%S")
    out_dir.mkdir(parents=True, exist_ok=True)
    writer = MetricsWriter(str(out_dir), echo_every=200)
    import json
    (out_dir / "dataparser_transforms.json").write_text(json.dumps({
        "transform": np.asarray(parsed.dataparser_transform).tolist(),
        "scale": float(parsed.dataparser_scale),
    }, indent=2))

    print(f"[splat-train] {len(dm)} views, "
          f"{parsed.points_xyz.shape[0]} seed points, "
          f"{cfg.num_steps} steps", flush=True)
    t0 = time.time()
    scene, metrics = pretrain(
        dm.cameras, dm.stacked_images(), parsed.points_xyz,
        parsed.points_rgb if parsed.points_rgb is not None
        else np.full_like(parsed.points_xyz, 0.5),
        cfg, sh_degree=args.sh_degree, raster_cfg=raster_cfg, seed=args.seed,
        log_fn=lambda s, m: writer.write(s, m),
        ckpt_fn=lambda s, sc: _save_ckpt(out_dir / "ckpts", s, sc,
                                         args.archive_ckpts),
        init_scene=init_scene, start_step=start_step)
    print(f"[splat-train] done in {time.time() - t0:.0f}s — "
          f"{scene.num_gaussians} gaussians", flush=True)
    # final save routes through _save_ckpt so --archive-ckpts covers the
    # completed run too (the archive would otherwise stay ckpt_every stale)
    path = _save_ckpt(out_dir / "ckpts", cfg.num_steps, scene,
                      args.archive_ckpts)
    print(f"[splat-train] saved {path}", flush=True)
    writer.close()

    # full-res renders of 4 evenly-spaced train views (the run record a
    # reviewer opens; the reference relies on ns-render for this)
    import jax.numpy as jnp
    from PIL import Image

    from gaussctrl_tpu.splat.rasterize import resolve_auto_blend
    from gaussctrl_tpu.splat.render import render_rgbd
    rc1 = resolve_auto_blend(raster_cfg)
    cams = dm.cameras
    rd = out_dir / "final_renders"
    rd.mkdir(exist_ok=True)
    for i in np.linspace(0, len(cams) - 1, min(4, len(cams))).astype(int):
        c = cams[int(i)]
        out = render_rgbd(scene, c.c2w, c.fx, c.fy, c.cx, c.cy, cams.width,
                          cams.height, jnp.zeros(3), cfg=rc1)
        Image.fromarray(np.asarray(
            np.clip(out["rgb"], 0, 1) * 255).astype(np.uint8)).save(
                rd / f"{int(i):05d}.png")
    print(f"[splat-train] final renders -> {rd}", flush=True)
    return path


if __name__ == "__main__":
    main()
