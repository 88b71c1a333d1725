"""GaussianScene — the 3DGS parameter pytree.

TPU-native replacement for nerfstudio SplatfactoModel's parameter groups
(visible through the reference optimizer config,
/root/reference/gaussctrl/gc_config.py:58-87: means/xyz, features_dc,
features_rest, opacity(logit), scaling(log), rotation(quat)).

Storage conventions match splatfacto so torch checkpoints import losslessly:
  scales   : log-space  (rasterizer applies exp)
  opacities: logit-space (rasterizer applies sigmoid)
  quats    : unnormalized (rasterizer normalizes)
  colors   : SH features, dc [N, 3] + rest [N, K-1, 3]

Static capacity: the buffer size N is fixed at load time (re-optimization
does not densify — the reference re-opt starts past splatfacto's refinement
window, SURVEY.md §2.2), so every downstream kernel sees static shapes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct


@struct.dataclass
class GaussianScene:
    means: jnp.ndarray          # [N, 3]
    scales: jnp.ndarray         # [N, 3] log-space
    quats: jnp.ndarray          # [N, 4] (w, x, y, z), unnormalized
    opacities: jnp.ndarray      # [N, 1] logit-space
    features_dc: jnp.ndarray    # [N, 3] SH degree-0 coefficients
    features_rest: jnp.ndarray  # [N, K-1, 3] higher-degree SH coefficients

    @property
    def num_gaussians(self) -> int:
        return self.means.shape[0]

    @property
    def sh_degree(self) -> int:
        k = 1 + self.features_rest.shape[1]
        return int(round(np.sqrt(k))) - 1

    @property
    def colors(self) -> jnp.ndarray:
        """[N, K, 3] full SH coefficient stack (dc first)."""
        return jnp.concatenate([self.features_dc[:, None, :], self.features_rest], axis=1)

    def astype(self, dtype) -> "GaussianScene":
        return jax.tree_util.tree_map(lambda x: x.astype(dtype), self)


def random_scene(key, n: int, sh_degree: int = 3, extent: float = 1.0) -> GaussianScene:
    """A random scene for tests/benchmarks."""
    k1, k2, k3, k4, k5, k6 = jax.random.split(key, 6)
    num_rest = (sh_degree + 1) ** 2 - 1
    return GaussianScene(
        means=jax.random.uniform(k1, (n, 3), minval=-extent, maxval=extent),
        scales=jnp.log(jax.random.uniform(k2, (n, 3), minval=0.005, maxval=0.05) * extent),
        quats=jax.random.normal(k3, (n, 4)),
        opacities=jax.random.normal(k4, (n, 1)),
        features_dc=jax.random.normal(k5, (n, 3)) * 0.5,
        features_rest=jax.random.normal(k6, (n, num_rest, 3)) * 0.05,
    )


def from_points(points: np.ndarray, colors: np.ndarray, sh_degree: int = 3,
                init_opacity: float = 0.1) -> GaussianScene:
    """Initialize a scene from a sparse point cloud (splatfacto-style seed).

    colors in [0, 1]; dc = (color - 0.5) / C0 so degree-0 SH reproduces it.
    """
    n = points.shape[0]
    C0 = 0.28209479177387814
    num_rest = (sh_degree + 1) ** 2 - 1
    # mean distance to 3 nearest neighbours sets the initial scale
    # (the simple_knn role; native grid-hash KNN when built, else O(N^2))
    pts = np.asarray(points, np.float32)
    from gaussctrl_tpu import native
    if native.available():
        nn = np.maximum(native.knn_mean_dist(pts, 3), 1e-6)
    elif n <= 20000:
        d2 = ((pts[:, None, :] - pts[None, :, :]) ** 2).sum(-1)
        d2_sorted = np.sort(d2, axis=1)
        nn = np.sqrt(np.maximum(d2_sorted[:, 1:4].mean(axis=1), 1e-12))
    else:
        nn = np.full((n,), 0.02, np.float32)
    quats = np.zeros((n, 4), np.float32)
    quats[:, 0] = 1.0
    logit = np.log(init_opacity / (1 - init_opacity))
    return GaussianScene(
        means=jnp.asarray(pts),
        scales=jnp.log(jnp.asarray(nn)[:, None]).repeat(3, axis=1),
        quats=jnp.asarray(quats),
        opacities=jnp.full((n, 1), logit, jnp.float32),
        features_dc=jnp.asarray((np.asarray(colors, np.float32) - 0.5) / C0),
        features_rest=jnp.zeros((n, num_rest, 3), jnp.float32),
    )
