"""Pallas TPU kernels (the hot ops)."""

from gaussctrl_tpu.ops.flash_attention import flash_attention
