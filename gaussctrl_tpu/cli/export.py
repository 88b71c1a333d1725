"""`python -m gaussctrl_tpu.cli.export` — the `ns-export gaussian-splat` role.

Exports a trained/edited scene checkpoint to the INRIA 3DGS PLY layout
(every splat viewer's interchange format), or to a plain colored point
cloud. Accepts our npz checkpoints, torch splatfacto checkpoints, and
INRIA PLYs (round-trip).
"""

from __future__ import annotations

import argparse


def main(argv=None):
    p = argparse.ArgumentParser("gaussctrl-export")
    p.add_argument("--load-checkpoint", required=True,
                   help=".npz / splatfacto .ckpt / 3DGS .ply")
    p.add_argument("--output", required=True, help="output .ply path")
    p.add_argument("--format", choices=["gaussian-splat", "point-cloud"],
                   default="gaussian-splat")
    args = p.parse_args(argv)

    from gaussctrl_tpu.cli.render import _load_scene
    scene = _load_scene(args.load_checkpoint)
    if args.format == "gaussian-splat":
        from gaussctrl_tpu.data.ply import write_gaussian_ply
        write_gaussian_ply(args.output, scene)
    else:
        import jax
        import numpy as np

        from gaussctrl_tpu.data.ply import write_ply
        from gaussctrl_tpu.splat.sh import C0
        rgb = np.clip(np.asarray(scene.features_dc) * C0 + 0.5, 0, 1)
        op = jax.nn.sigmoid(scene.opacities[:, 0])
        keep = np.asarray(op) > 0.05            # drop dead/padded slots
        write_ply(args.output, np.asarray(scene.means)[keep], rgb[keep])
    print(f"exported {scene.num_gaussians} gaussians -> {args.output}")


if __name__ == "__main__":
    main()
