"""Device mesh and sharding helpers.

The framework's primary parallel axis is *views* (the set of images being
rendered / inverted / edited): independent per-view work (splat render, VAE
encode, DDIM inversion) is data-parallel over the ``view`` mesh axis, while the
cross-view reference attention gathers reference-view K/V across the axis (XLA
lowers the gather of replicated-index rows of a view-sharded array to an ICI
allgather). Replaces the reference's single-GPU `cuda:0` pin
(/root/reference/gaussctrl/gc_pipeline.py:96-102) with a first-class
`jax.sharding.Mesh`.
"""

from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

VIEW_AXIS = "view"


def enable_persistent_cache(cache_dir: str | None = None) -> None:
    """Turn on JAX's persistent compilation cache (compiles of the SD stack
    take minutes on this hardware; across CLI invocations they are identical).
    Safe to call multiple times; GAUSSCTRL_NO_CACHE=1 disables."""
    # platform override for every CLI (JAX_PLATFORMS is too late here — the
    # environment's sitecustomize pre-imports jax and pins the hardware
    # platform): GAUSSCTRL_PLATFORM=cpu runs any CLI TPU-free, e.g. for
    # rendering checkpoints on a box without a (live) chip
    plat = os.environ.get("GAUSSCTRL_PLATFORM")
    if plat:
        try:
            jax.config.update("jax_platforms", plat)
        except Exception:
            pass
    if os.environ.get("GAUSSCTRL_NO_CACHE") == "1":
        return
    if cache_dir is None:
        cache_dir = os.environ.get(
            "GAUSSCTRL_CACHE_DIR",
            os.path.join(os.path.expanduser("~"), ".cache", "gaussctrl_jax"))
        # CPU compiles are AOT'd against the build host's exact ISA features;
        # a cache written on another machine loads with "machine feature not
        # supported ... could lead to SIGILL" (observed). Partition the CPU
        # cache per machine; TPU artifacts are device-keyed already.
        try:
            # config read, NOT jax.default_backend(): backend init hangs
            # indefinitely when the TPU tunnel is down
            if jax.config.jax_platforms == "cpu":
                import hashlib

                import jaxlib
                with open("/proc/cpuinfo") as f:
                    flags = next((l for l in f if l.startswith("flags")), "")
                # XLA:CPU AOT also bakes in backend *options* (e.g.
                # +prefer-no-scatter) that vary with XLA_FLAGS and the
                # jaxlib build — same-host processes with different flags
                # otherwise cross-load each other's artifacts with a
                # "machine feature not supported ... SIGILL" warning
                key = flags + jaxlib.__version__ + os.environ.get(
                    "XLA_FLAGS", "")
                tag = hashlib.sha1(key.encode()).hexdigest()[:10]
                cache_dir = os.path.join(cache_dir, f"cpu-{tag}")
        except Exception:
            pass
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass  # older jax without the knobs — run uncached


def make_mesh(devices=None, axis_name: str = VIEW_AXIS) -> Mesh:
    """A 1-D mesh over all (or the given) devices; axis = the view axis."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def shard_views(mesh: Mesh, axis_name: str = VIEW_AXIS) -> NamedSharding:
    """Sharding that splits the leading (view) dimension across the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicate(mesh: Mesh) -> NamedSharding:
    """Fully-replicated sharding (model weights, reference K/V)."""
    return NamedSharding(mesh, P())


def pad_to_multiple(n: int, m: int) -> int:
    """Round ``n`` up to a multiple of ``m`` (view batches must divide the mesh)."""
    return ((n + m - 1) // m) * m


def device_put_sharded_views(x, mesh: Mesh):
    """Place an array with its leading axis sharded over the mesh."""
    return jax.device_put(x, shard_views(mesh))
