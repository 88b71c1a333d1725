from gaussctrl_tpu.splat.scene import GaussianScene
from gaussctrl_tpu.splat.sh import eval_sh, num_sh_bases
from gaussctrl_tpu.splat.project import project_gaussians
from gaussctrl_tpu.splat.rasterize import rasterize, RasterConfig
from gaussctrl_tpu.splat.render import render_rgbd, render_camera
