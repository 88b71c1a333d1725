"""gaussctrl_tpu — TPU-native multi-view-consistent 3D Gaussian Splatting editing.

A from-scratch JAX/XLA/Pallas framework with the capabilities of
ActiveVisionLab/gaussctrl (see SURVEY.md): differentiable Gaussian splatting
(render + depth), a Stable-Diffusion-1.5 + depth-ControlNet latent diffusion
stack with DDIM inversion and cross-view reference attention, text-prompted
segmentation masking, and 3DGS re-optimization against edited views — all
designed TPU-first (static shapes, scan/vmap, sharded view batches over a
device mesh, reference K/V allgathered over ICI).
"""

__version__ = "0.1.0"

from gaussctrl_tpu.splat import (  # noqa: E402,F401
    GaussianScene, RasterConfig, eval_sh, num_sh_bases, project_gaussians,
    rasterize, render_camera, render_rgbd,
)
