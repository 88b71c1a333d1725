"""Attention processors — including the cross-view reference attention.

TPU-native equivalent of the reference's `CrossViewAttnProcessor`
(/root/reference/gaussctrl/utils.py:44-133): every *self*-attention layer
blends plain self-attention with the mean of attentions whose K/V come from
the reference views:

    out = c · selfattn(q, k, v) + (1 − c) · mean_r attn(q, k_ref[r], v_ref[r])

with c = 0.6 on the UNet and c = 0 (pure reference attention) on the
ControlNet (gc_pipeline.py:162-168). Unlike the reference, the number of
reference views is *not* hardcoded to 4 (reference quirk, SURVEY.md §5.1.1).

Batch convention: B = G · F where G CFG groups (2 when guided: [uncond|cond],
matching utils.py:94's `unet_chunk_size=2`) and F views per group, the first
`num_refs` of which are the reference views. Under a view-sharded mesh the
`kg[:, :R]` slice below is the point where XLA inserts the ICI allgather of
reference K/V — the collective form of utils.py:25-37's in-batch gather.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from gaussctrl_tpu.diffusion.nn import (_use_flash, attention,
                                        attention_einsum,
                                        attention_einsum_qblocked)


# Token levels whose whole cross-view layer routes to the fused Pallas
# kernel by default — the r5 on-chip sweep winners (outputs/perf_r5/
# micro.json): 4096 fused_bq512 172.0 vs 181.5 composed (xview) / 138.9 vs
# 145.6 (xview0); 1024 fused 12.7 vs 45.4 composed; 256 fused 4.27 vs 6.10.
# The 64-token level stays composed (2 calls/step, sub-ms either way).
_XVIEW_FUSED_DEFAULT = "4096,1024,256"


def resolve_self_attn_impl(t: int, head_dim: int,
                           default: str = "auto") -> str:
    """Edit-lane self-attention routing, resolved to a concrete impl name.

    The measured policy (r4 on-chip A/B, outputs/perf_r4/ab.txt + ab_iso.txt):
    at the CFG-doubled 4096-token level plain einsum wins — 37.19 s/scan vs
    48.06 s q-blocked and 45.03 s flash_t at b=80 — while flash keeps the
    ≤2048-token levels (r1/r3 measurements in nn._use_flash). The q-blocked
    budget fallback is therefore NEVER auto-selected here: XLA fuses the
    softmax of the square self-attention einsum, so the notional [B,h,T,T]
    scores don't materialize (two clean b=80 runs in ab.txt), and q-blocking
    only adds per-block overhead. r4 shipped the budget gate on this lane and
    regressed the headline 0.726→0.707 views/s (VERDICT r4 weak #1) — this
    resolver + the bench-side guard make that drift structurally visible.

    GAUSSCTRL_EDIT_SELF_ATTN overrides: einsum | qblocked | flash | full |
    full_t | stream (A/B knob).
    """
    import os
    impl = os.environ.get("GAUSSCTRL_EDIT_SELF_ATTN", default)
    if impl != "auto":
        return impl
    return "flash" if _use_flash(t, t, head_dim) else "einsum"


def _grouped_ref_attention(q, kg, vg, r, heads, flash_fn=None):
    """Σ_i attn(q, k_ref_i, v_ref_i) with the view axis folded into the
    query length — one flash call per ref (K/V fetched once per CFG group).
    q [B,T,C]; kg/vg [G,F,T,C]. Separated out so CPU tests can drive it with
    flash interpret mode against the einsum reference."""
    if flash_fn is None:
        import functools
        import os

        from gaussctrl_tpu.ops.flash_attention import flash_attention

        # same A/B knob as nn.attention (full_t = transposed small-head_dim
        # schedule); default "auto" keeps the measured r3 routing. is_self
        # False: this branch is CROSS-view attention — at f=1 its shape is
        # coincidentally square and the transposed-schedule proxy would
        # misfire (measured slower on the tall-skinny access pattern)
        flash_fn = functools.partial(
            flash_attention,
            kernel=os.environ.get("GAUSSCTRL_FLASH_KERNEL", "auto"),
            is_self=False)
    b, t, c = q.shape
    g, f = kg.shape[0], kg.shape[1]
    qg = q.reshape(g, f * t, c)
    acc = 0.0
    for i in range(r):
        acc = acc + flash_fn(qg, kg[:, i], vg[:, i], heads)
    return acc.reshape(b, t, c)


@dataclasses.dataclass(frozen=True)
class FlashSelfAttnProcessor:
    """Route plain self-attention to an explicit Pallas schedule.

    The production inversion lane's processor (r4 on-chip A/B,
    outputs/perf_r4/ab.txt): the no-CFG b=40 inversion scan runs 2.0x
    faster under the transposed single-shot `full_t` schedule than the
    einsum path (8.99 s vs 17.9 s for 2x b=20), while the CFG-doubled
    edit lane measured the OPPOSITE — einsum wins there by 4.5-7.8 s/scan
    (ab_iso.txt) — so the lanes route differently: `invert` takes this
    processor, `denoise` keeps the einsum-routed CrossViewAttnProcessor.
    TPU-only (Pallas); callers gate on backend.
    """
    kernel: str = "full_t"
    interpret: bool = False

    def __call__(self, q, k, v, heads):
        from gaussctrl_tpu.ops.flash_attention import flash_attention
        return flash_attention(q, k, v, heads, kernel=self.kernel,
                               interpret=self.interpret)


@dataclasses.dataclass(frozen=True)
class CrossViewAttnProcessor:
    num_refs: int = 4
    self_attn_coeff: float = 0.6   # 0.6 UNet / 0.0 ControlNet
    cfg_groups: int = 2            # 2 when CFG-doubled, 1 otherwise
    # self-branch routing default; "auto" = measured lane policy
    # (resolve_self_attn_impl), env GAUSSCTRL_EDIT_SELF_ATTN overrides
    self_attn_impl: str = "auto"
    # fused Pallas path gate: the kernel has no mesh partition rules, so
    # the pipeline sets this False in mesh mode (einsum stays the XLA-
    # partitionable sharded lane)
    allow_fused: bool = True

    def __call__(self, q, k, v, heads):
        b, t, c = q.shape
        g, r = self.cfg_groups, self.num_refs
        f = b // g
        assert b % g == 0 and r <= f, (b, g, r)

        # Fused whole-blend Pallas kernel (self + r ref panels per q-block,
        # q fetched once, blend in VMEM — ops/flash_attention.py
        # cross_view_attention). Routed per token level via
        # GAUSSCTRL_XVIEW_FUSED_LEVELS (A/B knob; default set from the r5
        # on-chip sweep, outputs/perf_r5/micro.json). block_q is per-level:
        # 4096 wants 512 (bq1024 fails remote-compile; bq768 non-pow2 is
        # slower), ≤1024 wants the whole row in one q-block (bq1024: 12.7 ms
        # vs 14.7 at bq512 vs 21.3 at bq256). TPU-only (Pallas).
        import os
        fused_levels = os.environ.get("GAUSSCTRL_XVIEW_FUSED_LEVELS",
                                      _XVIEW_FUSED_DEFAULT)
        if self.allow_fused and fused_levels \
                and str(t) in fused_levels.split(",") \
                and jax.default_backend() == "tpu":
            from gaussctrl_tpu.ops.flash_attention import cross_view_attention
            return cross_view_attention(
                q, k, v, heads, num_refs=r,
                self_coeff=float(self.self_attn_coeff), cfg_groups=g,
                block_q=512 if t >= 4096 else max(t, 128))

        out = 0.0
        if self.self_attn_coeff != 0.0:
            # self branch: explicit lane routing (resolve_self_attn_impl) —
            # the 4096-token CFG-doubled level takes plain einsum, the
            # measured winner; nn.attention's scores-budget fallback is
            # deliberately bypassed (it q-blocks this shape, the measured
            # loser — VERDICT r4 weak #1)
            impl = resolve_self_attn_impl(t, c // heads, self.self_attn_impl)
            if impl == "einsum":
                self_c = attention_einsum(q, k, v, heads)
            elif impl == "qblocked":
                self_c = attention_einsum_qblocked(q, k, v, heads)
            elif impl in ("flash", "auto", "full", "full_t", "stream"):
                from gaussctrl_tpu.ops.flash_attention import flash_attention
                kern = impl if impl in ("full", "full_t", "stream") else "auto"
                self_c = flash_attention(q, k, v, heads, kernel=kern)
            else:  # unknown override — fall back to the shared gate
                self_c = attention(q, k, v, heads)
            out = self.self_attn_coeff * self_c

        kg = k.reshape(g, f, t, c)
        vg = v.reshape(g, f, t, c)
        # _use_flash carries the GAUSSCTRL_FLASH force/disable switch and the
        # measured routing rule (flash wins at 256..2048 tokens; einsum wins
        # at 4096 where head_dim 40 limits the MXU contraction).
        # GAUSSCTRL_REF_ATTN=flash|einsum overrides the gate for THIS branch
        # only, so the A/B matrix can flip the ref branch independently of
        # the self branch (scripts/perf_r4_ab.py).
        import os
        ref_mode = os.environ.get("GAUSSCTRL_REF_ATTN", "auto")
        use_ref_flash = (_use_flash(f * t, t, c // heads)
                         if ref_mode == "auto" else ref_mode == "flash")
        if use_ref_flash:
            # Grouped ref attention: every view in a CFG group attends the
            # SAME ref K/V, so fold the view axis into the query length and
            # make one flash call per ref — the ref K/V block is fetched once
            # per (group, head) instead of once per view, and no [B,h,T,T]
            # scores ever hit HBM. Measured 1.8x over broadcast-einsum at the
            # 1024-token level (B=14, v5e).
            ref_c = _grouped_ref_attention(q, kg, vg, r, heads)
        else:
            # broadcast ref K/V to every view in the group (XLA einsum path)
            ref_c = 0.0
            for i in range(r):
                kr = jnp.broadcast_to(kg[:, i:i + 1],
                                      (g, f, t, c)).reshape(b, t, c)
                vr = jnp.broadcast_to(vg[:, i:i + 1],
                                      (g, f, t, c)).reshape(b, t, c)
                ref_c = ref_c + attention_einsum(q, kr, vr, heads)
        return out + (1.0 - self.self_attn_coeff) * (ref_c / r)
