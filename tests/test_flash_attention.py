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


@pytest.mark.parametrize("b,tq,tk,c,heads", [
    (2, 64, 64, 16, 2),        # tiny (bq > Tq padding path)
    (1, 300, 300, 32, 4),      # non-multiple T (tail masking)
    (2, 64, 128, 16, 2),       # cross-attention Tq != Tk
    (2, 256, 256, 80, 2),      # head_dim 40 — the SD shape this targets
])
def test_flash_t_matches_oracle(b, tq, tk, c, heads):
    """Transposed small-head_dim schedule (kernel='full_t') vs the oracle:
    d lives on sublanes (pad 40->48 instead of 40->128), scores stay in
    VMEM; results must match plain attention."""
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(3), 3)
    q = jax.random.normal(kq, (b, tq, c))
    k = jax.random.normal(kk, (b, tk, c))
    v = jax.random.normal(kv, (b, tk, c))
    out = flash_attention(q, k, v, heads, block_q=128, interpret=True,
                          kernel="full_t")
    ref = _oracle(q, k, v, heads)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_attention_dispatch_cpu_is_einsum():
    """On the CPU test backend the default path must stay einsum (no pallas)."""
    q = jax.random.normal(jax.random.PRNGKey(1), (1, 512, 16))
    out = attention(q, q, q, 2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(_oracle(q, q, q, 2)),
                               atol=1e-5)


@pytest.mark.parametrize("tq,tk,q_block", [
    (256, 256, 64),    # even split
    (300, 256, 64),    # tail padding (300 = 4*64 + 44)
    (256, 128, 512),   # block >= Tq: falls through to plain einsum
])
def test_qblocked_einsum_exact(tq, tk, q_block):
    """Query-blocked attention is EXACT (not flash-approximate-accumulated):
    every block computes complete softmax rows, so it must match the plain
    einsum bitwise-tight. This is the memory-bounded path the b=40
    inversion scan routes through (nn.attention GAUSSCTRL_SCORES_MB)."""
    from gaussctrl_tpu.diffusion.nn import (attention_einsum,
                                            attention_einsum_qblocked)
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(7), 3)
    q = jax.random.normal(kq, (3, tq, 40))
    k = jax.random.normal(kk, (3, tk, 40))
    v = jax.random.normal(kv, (3, tk, 40))
    out = attention_einsum_qblocked(q, k, v, 2, q_block=q_block)
    ref = attention_einsum(q, k, v, 2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-6, rtol=1e-6)


def test_attention_routes_qblocked_over_budget(monkeypatch):
    """attention() must route to the q-blocked path when the implied f32
    score tensor exceeds GAUSSCTRL_SCORES_MB, and stay exact."""
    from gaussctrl_tpu.diffusion import nn as dnn
    q = jax.random.normal(jax.random.PRNGKey(2), (2, 512, 32))
    ref = dnn.attention_einsum(q, q, q, 4)
    # 2*4*512*512*4B = 8 MB of scores; budget 1 MB forces blocking
    monkeypatch.setenv("GAUSSCTRL_SCORES_MB", "1")
    called = {}
    orig = dnn.attention_einsum_qblocked

    def spy(*a, **kw):
        called["yes"] = True
        return orig(*a, **kw)

    monkeypatch.setattr(dnn, "attention_einsum_qblocked", spy)
    out = dnn.attention(q, q, q, 4)
    assert called.get("yes"), "expected q-blocked routing under 1MB budget"
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-6, rtol=1e-6)


@pytest.mark.parametrize("self_coeff", [0.6, 0.0])
@pytest.mark.parametrize("g,f,t,c,heads,r", [
    (2, 4, 64, 16, 2, 2),      # CFG-doubled tiny
    (1, 3, 100, 32, 4, 2),     # no CFG, non-multiple T (tail masking)
    (2, 5, 128, 80, 2, 4),     # head_dim 40, 4 refs — the SD shape
])
def test_cross_view_fused_matches_processor(g, f, t, c, heads, r,
                                            self_coeff):
    """Fused cross-view kernel (one pallas_call, self + r ref panels per
    q-block) vs the composed oracle: self_coeff*self + (1-c)/r * sum of
    per-ref attentions with K/V from each group's first r views."""
    from gaussctrl_tpu.ops.flash_attention import cross_view_attention
    b = g * f
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(7), 3)
    q = jax.random.normal(kq, (b, t, c))
    k = jax.random.normal(kk, (b, t, c))
    v = jax.random.normal(kv, (b, t, c))

    ref = self_coeff * _oracle(q, k, v, heads)
    kg = k.reshape(g, f, t, c)
    vg = v.reshape(g, f, t, c)
    acc = 0.0
    for i in range(r):
        kr = jnp.broadcast_to(kg[:, i:i + 1], (g, f, t, c)).reshape(b, t, c)
        vr = jnp.broadcast_to(vg[:, i:i + 1], (g, f, t, c)).reshape(b, t, c)
        acc = acc + _oracle(q, kr, vr, heads)
    ref = ref + (1.0 - self_coeff) * acc / r

    out = cross_view_attention(q, k, v, heads, num_refs=r,
                               self_coeff=self_coeff, cfg_groups=g,
                               block_q=64, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=3e-5, rtol=3e-5)


def test_cross_view_fused_gates(monkeypatch):
    """Routing gates for the fused cross-view path: the mesh lane
    (allow_fused=False) and a disabling env override must both fall back to
    the composed einsum path even when the backend reports TPU; the default
    level set is the recorded sweep winner (outputs/perf_r5/README.md)."""
    from gaussctrl_tpu.diffusion import processors as P
    assert P._XVIEW_FUSED_DEFAULT == "4096,1024,256"

    calls = {"fused": 0}
    import importlib
    F = importlib.import_module("gaussctrl_tpu.ops.flash_attention")

    def fake_fused(*a, **k):
        calls["fused"] += 1
        raise AssertionError("fused path must not be taken")

    monkeypatch.setattr(F, "cross_view_attention", fake_fused)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    # keep the COMPOSED branches on einsum: with the faked backend the
    # flash gate would otherwise hand CPU a non-interpret Pallas call
    monkeypatch.setenv("GAUSSCTRL_FLASH", "0")

    g, f, t, c, heads, r = 2, 4, 256, 16, 2, 2
    b = g * f
    q = jax.random.normal(jax.random.PRNGKey(0), (b, t, c))
    # 1) mesh lane: allow_fused=False
    out = P.CrossViewAttnProcessor(r, 0.6, g, allow_fused=False)(q, q, q,
                                                                 heads)
    assert out.shape == (b, t, c) and calls["fused"] == 0
    # 2) env kill-switch: empty level set
    monkeypatch.setenv("GAUSSCTRL_XVIEW_FUSED_LEVELS", "")
    out = P.CrossViewAttnProcessor(r, 0.6, g)(q, q, q, heads)
    assert out.shape == (b, t, c) and calls["fused"] == 0
    # 3) default env + TPU backend + fused level -> takes the fused path
    monkeypatch.delenv("GAUSSCTRL_XVIEW_FUSED_LEVELS", raising=False)
    with pytest.raises(AssertionError, match="must not"):
        P.CrossViewAttnProcessor(r, 0.6, g)(q, q, q, heads)
    assert calls["fused"] == 1
