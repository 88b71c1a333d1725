"""Pipeline orchestration: the GaussCtrl editing method."""

from gaussctrl_tpu.pipeline.gaussctrl import (
    GaussCtrlConfig, GaussCtrlPipeline, depth_to_disparity,
)
