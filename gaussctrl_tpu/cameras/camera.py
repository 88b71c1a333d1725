"""Camera pytrees and projection math.

Replaces nerfstudio `Cameras` plus the camera→rasterizer matrix plumbing in the
reference model (/root/reference/gaussctrl/gc_model.py:96-121): camera-to-world
poses are stored in the nerfstudio/OpenGL convention (+x right, +y up, -z
forward); the splatting convention (+z forward, +y down) is obtained with the
diag(1,-1,-1) column flip, and the world→camera matrix by analytic inverse.

Everything is a batched array pytree: a `Cameras` holds N cameras, statically
shaped, so per-view rendering vmaps/shards over the leading axis.
"""

from __future__ import annotations


import jax.numpy as jnp
import numpy as np
from flax import struct


@struct.dataclass
class Cameras:
    """Batch of pinhole cameras (post-undistortion).

    Attributes:
      c2w: [N, 3, 4] camera-to-world, OpenGL/nerfstudio convention.
      fx, fy, cx, cy: [N] intrinsics in pixels.
      width, height: static ints (uniform across the batch; the reference's
        scenes are uniformly sized after downscale).
    """

    c2w: jnp.ndarray
    fx: jnp.ndarray
    fy: jnp.ndarray
    cx: jnp.ndarray
    cy: jnp.ndarray
    width: int = struct.field(pytree_node=False)
    height: int = struct.field(pytree_node=False)

    def __len__(self):
        return self.c2w.shape[0]

    def __getitem__(self, idx):
        return Cameras(
            c2w=self.c2w[idx],
            fx=self.fx[idx],
            fy=self.fy[idx],
            cx=self.cx[idx],
            cy=self.cy[idx],
            width=self.width,
            height=self.height,
        )


# gsplat convention flip: +y down, +z forward (gc_model.py:100-101).
_R_EDIT = np.diag(np.array([1.0, -1.0, -1.0], dtype=np.float32))


def view_matrix(c2w: jnp.ndarray) -> jnp.ndarray:
    """World→camera [4, 4] from a [3, 4] OpenGL c2w (analytic inverse).

    Mirrors gc_model.py:96-107: R' = R @ diag(1,-1,-1); w2c = [[R'^T, -R'^T t],
    [0, 1]].
    """
    R = c2w[:3, :3] @ jnp.asarray(_R_EDIT, dtype=c2w.dtype)
    t = c2w[:3, 3:4]
    R_inv = R.T
    t_inv = -R_inv @ t
    top = jnp.concatenate([R_inv, t_inv], axis=1)
    bottom = jnp.array([[0.0, 0.0, 0.0, 1.0]], dtype=c2w.dtype)
    return jnp.concatenate([top, bottom], axis=0)


def projection_matrix(znear: float, zfar: float, fovx, fovy, dtype=jnp.float32):
    """OpenGL-style perspective projection (nerfstudio splatfacto's helper).

    Used only to form the full projmat handed to projection for parity; the
    EWA projection itself uses fx/fy directly.
    """
    t = znear * jnp.tan(0.5 * fovy)
    b = -t
    r = znear * jnp.tan(0.5 * fovx)
    l = -r
    n, f = znear, zfar
    return jnp.array(
        [
            [2 * n / (r - l), 0.0, (r + l) / (r - l), 0.0],
            [0.0, 2 * n / (t - b), (t + b) / (t - b), 0.0],
            [0.0, 0.0, (f + n) / (f - n), -1.0 * f * n / (f - n)],
            [0.0, 0.0, 1.0, 0.0],
        ],
        dtype=dtype,
    )


def fov(cameras: Cameras):
    """Per-camera (fovx, fovy) — gc_model.py:111-112."""
    fovx = 2.0 * jnp.arctan(cameras.width / (2.0 * cameras.fx))
    fovy = 2.0 * jnp.arctan(cameras.height / (2.0 * cameras.fy))
    return fovx, fovy


def make_cameras(
    c2w: np.ndarray,
    fx,
    fy,
    cx,
    cy,
    width: int,
    height: int,
) -> Cameras:
    """Build a `Cameras` batch from numpy inputs, broadcasting intrinsics."""
    n = c2w.shape[0]
    as_vec = lambda v: jnp.broadcast_to(jnp.asarray(v, jnp.float32).reshape(-1), (n,))
    return Cameras(
        c2w=jnp.asarray(c2w, jnp.float32),
        fx=as_vec(fx),
        fy=as_vec(fy),
        cx=as_vec(cx),
        cy=as_vec(cy),
        width=int(width),
        height=int(height),
    )
