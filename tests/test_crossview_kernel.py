"""Fused cross-view attention kernel vs the unfused processor oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaussctrl_tpu.diffusion.processors import CrossViewAttnProcessor
from gaussctrl_tpu.ops.crossview_attention import crossview_attention


@pytest.mark.parametrize("g,f,t,c,heads,r,coeff", [
    (2, 4, 64, 16, 2, 2, 0.6),     # CFG groups, UNet blend
    (1, 3, 100, 32, 4, 1, 0.0),    # pure ref attention (ControlNet mode)
    (2, 5, 300, 16, 2, 4, 0.6),    # non-multiple T, 4 refs
])
def test_fused_matches_processor(g, f, t, c, heads, r, coeff):
    b = g * f
    key = jax.random.PRNGKey(0)
    q, k, v = jax.random.normal(key, (3, b, t, c))
    oracle = CrossViewAttnProcessor(r, coeff, g)(q, k, v, heads)
    fused = crossview_attention(q, k, v, r, coeff, g, heads,
                                block_q=64, block_k=128, interpret=True)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(oracle),
                               atol=3e-5, rtol=3e-5)


def test_refs_shared_within_group_only():
    """Changing a ref in group 1 must not affect group 0 outputs."""
    g, f, t, c, heads, r = 2, 3, 32, 8, 2, 1
    b = g * f
    q, k, v = jax.random.normal(jax.random.PRNGKey(1), (3, b, t, c))
    out1 = crossview_attention(q, k, v, r, 0.5, g, heads, block_q=32,
                               block_k=128, interpret=True)
    k2 = k.at[f].set(jax.random.normal(jax.random.PRNGKey(2), (t, c)))
    out2 = crossview_attention(q, k2, v, r, 0.5, g, heads, block_q=32,
                               block_k=128, interpret=True)
    np.testing.assert_allclose(np.asarray(out1[:f]), np.asarray(out2[:f]),
                               atol=1e-6)
    assert np.abs(np.asarray(out1[f:]) - np.asarray(out2[f:])).max() > 1e-4
