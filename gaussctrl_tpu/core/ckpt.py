"""Checkpoint IO: native npz pytree checkpoints + torch splatfacto importer.

The reference loads a nerfstudio splatfacto `step-000029999.ckpt` (torch
pickle) via Trainer._load_checkpoint (/root/reference/gaussctrl/gc_trainer.py:75)
and saves `step-{step:09d}.ckpt` with pipeline+optimizer state, pruning older
files (gc_trainer.py:147-174). Here:

  * `import_splatfacto_ckpt` reads the torch checkpoint (torch is CPU-only in
    this image — used purely as an unpickler) and returns a `GaussianScene`,
    supporting both the nerfstudio 1.0 flat parameter names and the newer
    `gauss_params.*` layout.
  * `save_checkpoint` / `load_checkpoint` store arbitrary JAX pytrees as npz
    with slash-joined key paths (host-portable, no orbax daemon needed), with
    the same step-numbered naming + latest-only pruning contract.
"""

from __future__ import annotations

import io
import re
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from gaussctrl_tpu.splat.scene import GaussianScene

_SPLATFACTO_KEYS = {
    "means": "means",
    "scales": "scales",
    "quats": "quats",
    "opacities": "opacities",
    "features_dc": "features_dc",
    "features_rest": "features_rest",
}


def import_splatfacto_ckpt(path) -> tuple[GaussianScene, int]:
    """Load a torch splatfacto checkpoint → (GaussianScene, step)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    state = ckpt.get("pipeline", ckpt)
    step = int(ckpt.get("step", 0))

    found = {}
    for key, val in state.items():
        if not hasattr(val, "numpy"):
            continue
        # accept "_model.gauss_params.means", "_model.means", "model.means", …
        leaf = key.split(".")[-1]
        if leaf in _SPLATFACTO_KEYS and ("gauss_params" in key or "_model" in key or key == leaf):
            found[leaf] = np.asarray(val.detach().to(torch.float32).numpy())
    missing = set(_SPLATFACTO_KEYS) - set(found)
    if missing:
        raise ValueError(f"splatfacto checkpoint {path} missing params: {sorted(missing)}")

    opac = found["opacities"]
    if opac.ndim == 1:
        opac = opac[:, None]
    fdc = found["features_dc"]
    if fdc.ndim == 3:  # some exports keep [N, 1, 3]
        fdc = fdc[:, 0, :]
    scene = GaussianScene(
        means=jnp.asarray(found["means"]),
        scales=jnp.asarray(found["scales"]),
        quats=jnp.asarray(found["quats"]),
        opacities=jnp.asarray(opac),
        features_dc=jnp.asarray(fdc),
        features_rest=jnp.asarray(found["features_rest"]),
    )
    return scene, step


def _flatten(tree) -> dict[str, np.ndarray]:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = "/".join(
            str(getattr(p, "name", getattr(p, "key", getattr(p, "idx", p))))
            for p in path
        )
        flat[key] = np.asarray(leaf)
    return flat


def save_pytree(path, tree):
    """Save a pytree to npz, keyed by tree path."""
    np.savez_compressed(path, **_flatten(tree))


def load_pytree(path, like):
    """Load npz into the structure of `like` (same treedef)."""
    data = np.load(path)
    leaves_paths, treedef = jax.tree_util.tree_flatten_with_path(like)
    leaves = []
    for p, leaf in leaves_paths:
        key = "/".join(
            str(getattr(q, "name", getattr(q, "key", getattr(q, "idx", q)))) for q in p
        )
        arr = data[key]
        leaves.append(jnp.asarray(arr, dtype=leaf.dtype).reshape(leaf.shape))
    return jax.tree_util.tree_unflatten(treedef, leaves)


def load_scene_npz(path) -> GaussianScene:
    """Load a GaussianScene from a `save_pytree`/`save_checkpoint` npz.

    Always returns float32 leaves: checkpoints compressed for archival
    (`compress_scene_npz`, fp16 payload) must resume with full-precision
    optimization, and the trainers assume f32 params throughout."""
    data = np.load(path)
    return GaussianScene(**{k: jnp.asarray(data[k], dtype=jnp.float32)
                            for k in
                            ("means", "scales", "quats", "opacities",
                             "features_dc", "features_rest")})


def compress_scene_npz(src, dst, dtype=np.float16) -> Path:
    """Re-encode a scene checkpoint with a reduced-precision payload.

    Used to archive mid-run pre-training checkpoints in git so a later
    round can resume without redoing the chip time (the full f32 npz of a
    ~1M-gaussian scene is ~200 MB; fp16 + zip is ~4x smaller). `means`
    stay f32 — position quantization visibly degrades the scene, while
    the remaining fields tolerate half precision (they sit behind
    exp/sigmoid/normalize reparameterizations or are SH colors).
    """
    data = np.load(src)
    out = {}
    for k in data.files:
        arr = data[k]
        if k != "means" and arr.dtype == np.float32:
            arr = arr.astype(dtype)
        out[k] = arr
    dst = Path(dst)
    np.savez_compressed(dst, **out)
    return dst


def save_checkpoint(ckpt_dir, step: int, tree, keep_only_latest: bool = True):
    """step-numbered checkpoint with latest-only pruning (gc_trainer.py:147-174)."""
    ckpt_dir = Path(ckpt_dir)
    ckpt_dir.mkdir(parents=True, exist_ok=True)
    out = ckpt_dir / f"step-{step:09d}.npz"
    save_pytree(out, tree)
    if keep_only_latest:
        for f in ckpt_dir.glob("step-*.npz"):
            # spare fp16 archives — they follow their own latest-only cycle
            # (cli/splat_train._save_ckpt) and may be git-tracked
            if f != out and not f.name.endswith(".fp16.npz"):
                f.unlink()
    return out


def save_checkpoint_sharded(ckpt_dir, step: int, tree,
                            keep_only_latest: bool = True) -> Path:
    """Orbax-backed step-numbered checkpoint for sharded pytrees.

    For multi-host scenes (gaussian axes sharded over a Mesh) every host
    writes only the shards it owns — the multi-host growth path of
    `save_checkpoint` (npz gathers everything to host 0). Same step-naming
    and latest-only pruning contract (gc_trainer.py:147-174)."""
    import orbax.checkpoint as ocp

    ckpt_dir = Path(ckpt_dir)
    ckpt_dir.mkdir(parents=True, exist_ok=True)
    out = ckpt_dir / f"step-{step:09d}.orbax"
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(out.absolute(), tree, force=True)
    ckptr.wait_until_finished()
    if keep_only_latest:
        for f in ckpt_dir.glob("step-*.orbax"):
            if f != out:
                import shutil
                shutil.rmtree(f, ignore_errors=True)
    return out


def load_checkpoint_sharded(path, like=None, sharding=None):
    """Restore an orbax checkpoint. `like` supplies the pytree structure;
    `sharding` (a jax.sharding.Sharding, or a pytree of them matching `like`)
    restores each leaf already laid out across the mesh — no host-memory
    round trip of the full scene."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    if like is None:
        return ckptr.restore(Path(path).absolute())

    def abstract(x, s):
        return jax.ShapeDtypeStruct(jnp.shape(x), jnp.asarray(x).dtype,
                                    sharding=s)

    if sharding is None or not isinstance(sharding, type(like)):
        tmpl = jax.tree_util.tree_map(lambda x: abstract(x, sharding), like)
    else:
        tmpl = jax.tree_util.tree_map(abstract, like, sharding)
    return ckptr.restore(Path(path).absolute(), tmpl)


def latest_checkpoint(ckpt_dir) -> Path | None:
    """Highest-step checkpoint across BOTH formats (a stale npz must not
    shadow a newer orbax dir — their pruning is per-format)."""
    ckpts = list(Path(ckpt_dir).glob("step-*.npz")) + \
        list(Path(ckpt_dir).glob("step-*.orbax"))
    # same-step tiebreak: prefer the full-precision npz over its fp16
    # archive (both load, but f32 holds the exact full-precision params;
    # optimizer state is not checkpointed — it restarts on resume)
    return max(ckpts, key=lambda p: (checkpoint_step(p),
                                     not p.name.endswith(".fp16.npz"))
               ) if ckpts else None


def checkpoint_step(path) -> int:
    m = re.search(r"step-(\d+)", str(path))
    return int(m.group(1)) if m else 0
