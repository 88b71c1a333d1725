"""Dotted-flag CLI system: coercion + nested overrides."""

import argparse

from gaussctrl_tpu.cli.flags import add_dataclass_flags, apply_overrides
from gaussctrl_tpu.data.datamanager import DataManagerConfig
from gaussctrl_tpu.pipeline import GaussCtrlConfig


def test_pipeline_flag_overrides():
    p = argparse.ArgumentParser()
    add_dataclass_flags(p, GaussCtrlConfig, "pipeline")
    args = p.parse_args([
        "--pipeline.edit_prompt", "a polar bear",
        "--pipeline.guidance_scale", "7.5",
        "--pipeline.chunk_size", "0",
        "--pipeline.ref_view_num", "2",
    ])
    cfg = apply_overrides(GaussCtrlConfig(), args, "pipeline")
    assert cfg.edit_prompt == "a polar bear"
    assert cfg.guidance_scale == 7.5 and isinstance(cfg.guidance_scale, float)
    assert cfg.chunk_size == 0 and isinstance(cfg.chunk_size, int)
    assert cfg.ref_view_num == 2
    assert cfg.reverse_prompt == GaussCtrlConfig().reverse_prompt  # untouched


def test_nested_datamanager_flags():
    p = argparse.ArgumentParser()
    add_dataclass_flags(p, DataManagerConfig, "pipeline.datamanager")
    args = p.parse_args([
        "--pipeline.datamanager.subset_num", "2",
        "--pipeline.datamanager.sampled_views_every_subset", "5",
        "--pipeline.datamanager.load_all", "true",
        "--pipeline.datamanager.dataparser.downscale_factor", "2",
    ])
    cfg = apply_overrides(DataManagerConfig(), args, "pipeline.datamanager")
    assert cfg.subset_num == 2
    assert cfg.sampled_views_every_subset == 5
    assert cfg.load_all is True
    assert cfg.dataparser.downscale_factor == 2
