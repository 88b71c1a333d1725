"""Mask providers.

`SAM`-quality text→mask (GroundingDINO SwinB + SAM ViT-H in the reference,
/root/reference/gaussctrl/lang_sam.py:84-121) is the largest foreign-weight
surface of the port; the pipeline only needs the callable contract below, so
segmentation backends are pluggable. `sam.py` holds the JAX SAM port; the two
fallbacks here keep every pipeline path drivable without foreign weights.
"""

from __future__ import annotations

from typing import Protocol

import jax.numpy as jnp


class MaskProvider(Protocol):
    def __call__(self, images: jnp.ndarray, text: str) -> jnp.ndarray:
        """images [V,H,W,3] in [0,1] -> masks [V,H,W,1] in [0,1]."""
        ...


class NullMasker:
    """All-ones masks — edit everywhere (the no-`langsam_obj` path,
    gc_pipeline.py:227-232 falls through to the raw edit)."""

    def __call__(self, images: jnp.ndarray, text: str) -> jnp.ndarray:
        return jnp.ones(images.shape[:3] + (1,), images.dtype)


class ThresholdMasker:
    """Luminance-threshold stand-in masker for tests: 'bright'/'dark'."""

    def __init__(self, threshold: float = 0.5):
        self.threshold = threshold

    def __call__(self, images: jnp.ndarray, text: str) -> jnp.ndarray:
        lum = images.mean(axis=-1, keepdims=True)
        if text == "dark":
            return (lum < self.threshold).astype(images.dtype)
        return (lum >= self.threshold).astype(images.dtype)
