"""CLIP metric contracts (tiny random towers)."""

import jax
import numpy as np

from gaussctrl_tpu.metrics import (
    CLIPScorer, clip_directional_similarity, clip_similarity,
)


def test_clip_metrics_contracts():
    scorer = CLIPScorer.from_dir(None)
    imgs = jax.random.uniform(jax.random.PRNGKey(0), (3, 40, 40, 3))
    s = clip_similarity(scorer, imgs, "a bronze bear")
    assert -1.0 <= s <= 1.0
    # identical images + identical prompts -> delta degenerates; self-direction
    # of a real delta must be exactly 1
    other = jax.random.uniform(jax.random.PRNGKey(1), (3, 40, 40, 3))
    d_self = clip_directional_similarity(scorer, other, imgs,
                                         "a panda", "a bear")
    assert -1.0 <= d_self <= 1.0
    # similarity is deterministic
    assert s == clip_similarity(scorer, imgs, "a bronze bear")
