"""Flash-attention kernel vs the einsum oracle (interpret mode on CPU)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaussctrl_tpu.diffusion.nn import attention
from gaussctrl_tpu.ops.flash_attention import flash_attention


def _oracle(q, k, v, heads):
    b, tq, c = q.shape
    tk = k.shape[1]
    d = c // heads
    qh = q.reshape(b, tq, heads, d)
    kh = k.reshape(b, tk, heads, d)
    vh = v.reshape(b, tk, heads, d)
    s = jnp.einsum("bqhd,bkhd->bhqk", qh, kh) / math.sqrt(d)
    w = jax.nn.softmax(s, -1)
    return jnp.einsum("bhqk,bkhd->bqhd", w, vh).reshape(b, tq, c)


@pytest.mark.parametrize("kernel", ["full", "stream"])
@pytest.mark.parametrize("b,tq,tk,c,heads", [
    (2, 64, 64, 16, 2),        # tiny, blocks > T (padding path)
    (1, 300, 300, 32, 4),      # non-multiple T (tail masking)
    (2, 64, 128, 16, 2),       # cross-attention Tq != Tk
])
def test_flash_matches_oracle(b, tq, tk, c, heads, kernel):
    key = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (b, tq, c))
    k = jax.random.normal(kk, (b, tk, c))
    v = jax.random.normal(kv, (b, tk, c))
    out = flash_attention(q, k, v, heads, block_q=64, block_k=128,
                          interpret=True, kernel=kernel)
    ref = _oracle(q, k, v, heads)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_attention_dispatch_cpu_is_einsum():
    """On the CPU test backend the default path must stay einsum (no pallas)."""
    q = jax.random.normal(jax.random.PRNGKey(1), (1, 512, 16))
    out = attention(q, q, q, 2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(_oracle(q, q, q, 2)),
                               atol=1e-5)
