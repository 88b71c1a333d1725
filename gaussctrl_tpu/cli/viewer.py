"""`python -m gaussctrl_tpu.cli.viewer` — the `ns-viewer` equivalent
(/root/reference/gaussctrl/gc_viewer.py): load a scene checkpoint, serve an
interactive orbit viewer."""

from __future__ import annotations

import argparse


def main(argv=None):
    p = argparse.ArgumentParser(prog="gaussctrl-viewer")
    p.add_argument("--load-checkpoint", required=True,
                   help="scene checkpoint (.npz / splatfacto .ckpt / "
                        "3DGS .ply)")
    p.add_argument("--data", default=None,
                   help="scene data dir (enables train-camera markers and "
                        "exact jump-to-train-view)")
    p.add_argument("--port", type=int, default=7007)
    p.add_argument("--width", type=int, default=512)
    p.add_argument("--height", type=int, default=512)
    from gaussctrl_tpu.core.mesh import enable_persistent_cache
    enable_persistent_cache()
    args = p.parse_args(argv)

    from gaussctrl_tpu.cli.render import _load_scene
    scene = _load_scene(args.load_checkpoint)
    print(f"[viewer] {scene.num_gaussians} gaussians", flush=True)

    cameras = None
    if args.data:
        from gaussctrl_tpu.data.datamanager import (
            DataManager, DataManagerConfig)
        dcfg = DataManagerConfig()
        dcfg.dataparser.data = args.data
        cameras = DataManager(dcfg).cameras
        print(f"[viewer] {len(cameras)} train cameras", flush=True)

    from gaussctrl_tpu.viewer import ViewerServer
    ViewerServer(scene, args.width, args.height, port=args.port,
                 cameras=cameras).serve()


if __name__ == "__main__":
    main()
