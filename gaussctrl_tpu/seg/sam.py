"""SAM (Segment Anything) in flax — box-prompted segmentation.

TPU-native port of the SAM ViT-H the reference drives through
`segment_anything` (/root/reference/gaussctrl/lang_sam.py:12-13, 58-82,
103-113: box-prompted, `multimask_output=False`): windowed-attention ViT image
encoder with decomposed relative positions, random-Fourier prompt encoder,
and the two-way transformer mask decoder. NHWC throughout; window partition
and rel-pos tables are static-shape reshapes/gathers (no dynamic padding).

`convert_sam` ingests the facebook `sam_vit_h_4b8939.pth` state dict offline
(torch CPU unpickle) into these module trees.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


@dataclasses.dataclass(frozen=True)
class SAMConfig:
    img_size: int = 1024
    patch_size: int = 16
    embed_dim: int = 1280
    depth: int = 32
    num_heads: int = 16
    mlp_ratio: float = 4.0
    window_size: int = 14
    global_attn_indexes: Tuple[int, ...] = (7, 15, 23, 31)
    out_chans: int = 256          # neck / prompt / decoder channel
    decoder_depth: int = 2
    decoder_heads: int = 8
    decoder_mlp_dim: int = 2048
    num_mask_tokens: int = 4      # 1 + multimask 3

    @property
    def grid(self) -> int:
        return self.img_size // self.patch_size

    @classmethod
    def vit_h(cls) -> "SAMConfig":
        return cls()

    @classmethod
    def vit_l(cls) -> "SAMConfig":
        return cls(embed_dim=1024, depth=24, num_heads=16,
                   global_attn_indexes=(5, 11, 17, 23))

    @classmethod
    def vit_b(cls) -> "SAMConfig":
        return cls(embed_dim=768, depth=12, num_heads=12,
                   global_attn_indexes=(2, 5, 8, 11))

    @classmethod
    def tiny(cls) -> "SAMConfig":
        return cls(img_size=64, patch_size=8, embed_dim=32, depth=2,
                   num_heads=2, window_size=4, global_attn_indexes=(1,),
                   out_chans=16, decoder_mlp_dim=32)


class LayerNorm2d(nn.Module):
    """Channel-wise LayerNorm over NHWC feature maps (SAM's LayerNorm2d)."""
    channels: int
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        w = self.param("weight", nn.initializers.ones, (self.channels,))
        b = self.param("bias", nn.initializers.zeros, (self.channels,))
        mu = x.mean(-1, keepdims=True)
        var = ((x - mu) ** 2).mean(-1, keepdims=True)
        return (x - mu) * jax.lax.rsqrt(var + self.eps) * w + b


def _rel_pos_bias(rel_pos: jnp.ndarray, q_size: int, k_size: int) -> jnp.ndarray:
    """[2*size-1, d] table -> [q_size, k_size, d] gathered offsets."""
    coords = (jnp.arange(q_size)[:, None] - jnp.arange(k_size)[None, :]
              + (k_size - 1))
    return rel_pos[coords]


class ViTAttention(nn.Module):
    """qkv attention with decomposed relative position bias."""
    dim: int
    num_heads: int
    input_size: int  # tokens per side (window or full grid)

    @nn.compact
    def __call__(self, x):  # [B, H, W, C]
        b, h, w, c = x.shape
        nh = self.num_heads
        hd = c // nh
        qkv = nn.Dense(3 * c, name="qkv")(x).reshape(b, h * w, 3, nh, hd)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # [B, HW, nh, hd]
        attn = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                          preferred_element_type=jnp.float32) * (hd ** -0.5)
        rel_h = self.param("rel_pos_h", nn.initializers.zeros,
                           (2 * self.input_size - 1, hd))
        rel_w = self.param("rel_pos_w", nn.initializers.zeros,
                           (2 * self.input_size - 1, hd))
        rh = _rel_pos_bias(rel_h, h, h)  # [h, h, hd]
        rw = _rel_pos_bias(rel_w, w, w)  # [w, w, hd]
        qr = q.reshape(b, h, w, nh, hd)
        bias_h = jnp.einsum("bxyhd,xud->bhxyu", qr, rh)   # [B,nh,h,w,h']
        bias_w = jnp.einsum("bxyhd,yvd->bhxyv", qr, rw)   # [B,nh,h,w,w']
        attn = attn.reshape(b, nh, h, w, h, w)
        attn = attn + bias_h[..., :, None] + bias_w[..., None, :]
        attn = attn.reshape(b, nh, h * w, h * w)
        attn = jax.nn.softmax(attn.astype(jnp.float32), -1).astype(v.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(b, h, w, c)
        return nn.Dense(c, name="proj")(out)


def window_partition(x, ws):
    b, h, w, c = x.shape
    ph, pw = (ws - h % ws) % ws, (ws - w % ws) % ws
    x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
    hp, wp = h + ph, w + pw
    x = x.reshape(b, hp // ws, ws, wp // ws, ws, c).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, ws, ws, c), (hp, wp)


def window_unpartition(win, ws, pad_hw, hw):
    hp, wp = pad_hw
    h, w = hw
    b = win.shape[0] // (hp * wp // ws // ws)
    x = win.reshape(b, hp // ws, wp // ws, ws, ws, -1).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, hp, wp, -1)[:, :h, :w]


class ViTBlock(nn.Module):
    cfg: SAMConfig
    window_size: int  # 0 = global

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        shortcut = x
        h = nn.LayerNorm(epsilon=1e-6, name="norm1")(x)
        if self.window_size > 0:
            hw = h.shape[1:3]
            h, pad_hw = window_partition(h, self.window_size)
            h = ViTAttention(c.embed_dim, c.num_heads, self.window_size,
                            name="attn")(h)
            h = window_unpartition(h, self.window_size, pad_hw, hw)
        else:
            h = ViTAttention(c.embed_dim, c.num_heads, c.grid, name="attn")(h)
        x = shortcut + h
        h = nn.LayerNorm(epsilon=1e-6, name="norm2")(x)
        h = nn.Dense(int(c.embed_dim * c.mlp_ratio), name="mlp_lin1")(h)
        h = nn.gelu(h)
        h = nn.Dense(c.embed_dim, name="mlp_lin2")(h)
        return x + h


class ImageEncoderViT(nn.Module):
    cfg: SAMConfig = SAMConfig()

    @nn.compact
    def __call__(self, x):  # [B, img, img, 3] normalized
        c = self.cfg
        x = nn.Conv(c.embed_dim, (c.patch_size, c.patch_size),
                    strides=(c.patch_size, c.patch_size), padding="VALID",
                    name="patch_embed")(x)
        pos = self.param("pos_embed", nn.initializers.zeros,
                         (1, c.grid, c.grid, c.embed_dim))
        x = x + pos
        for i in range(c.depth):
            ws = 0 if i in c.global_attn_indexes else c.window_size
            x = ViTBlock(c, ws, name=f"blocks_{i}")(x)
        x = nn.Conv(c.out_chans, (1, 1), use_bias=False, name="neck_conv1")(x)
        x = LayerNorm2d(c.out_chans, name="neck_ln1")(x)
        x = nn.Conv(c.out_chans, (3, 3), padding=1, use_bias=False,
                    name="neck_conv2")(x)
        return LayerNorm2d(c.out_chans, name="neck_ln2")(x)  # [B, g, g, 256]


class PromptEncoder(nn.Module):
    """Box prompts -> sparse corner embeddings + dense no-mask embedding."""
    cfg: SAMConfig = SAMConfig()

    def setup(self):
        c = self.cfg
        self.pe_gaussian = self.param(
            "pe_gaussian", nn.initializers.normal(1.0), (2, c.out_chans // 2))
        # 0: neg point, 1: pos point, 2: box corner 1, 3: box corner 2
        self.point_embed = self.param(
            "point_embed", nn.initializers.normal(1.0), (4, c.out_chans))
        self.no_mask_embed = self.param(
            "no_mask_embed", nn.initializers.normal(1.0), (c.out_chans,))

    def _pe(self, coords01: jnp.ndarray) -> jnp.ndarray:
        """[..., 2] in [0,1] -> [..., out_chans] random-Fourier features."""
        x = (2.0 * coords01 - 1.0) @ self.pe_gaussian * (2.0 * np.pi)
        return jnp.concatenate([jnp.sin(x), jnp.cos(x)], axis=-1)

    def dense_pe(self) -> jnp.ndarray:
        """Positional encoding of the image embedding grid [g, g, C]."""
        g = self.cfg.grid
        ys = (jnp.arange(g, dtype=jnp.float32) + 0.5) / g
        xs = (jnp.arange(g, dtype=jnp.float32) + 0.5) / g
        grid = jnp.stack(jnp.meshgrid(xs, ys, indexing="xy"), -1)  # [g,g,2]
        return self._pe(grid)

    def __call__(self, boxes: jnp.ndarray):
        """boxes [B, 4] xyxy in pixels of the encoder input frame.

        Returns sparse [B, 2, C] corner tokens and dense [B, g, g, C]."""
        c = self.cfg
        b = boxes.shape[0]
        corners = (boxes.reshape(b, 2, 2) + 0.5) / c.img_size
        sparse = self._pe(corners) + self.point_embed[None, 2:4]
        dense = jnp.broadcast_to(self.no_mask_embed[None, None, None, :],
                                 (b, c.grid, c.grid, c.out_chans))
        return sparse, dense


class DecoderAttention(nn.Module):
    dim: int
    num_heads: int
    downsample: int = 1

    @nn.compact
    def __call__(self, q, k, v):
        d = self.dim // self.downsample
        hd = d // self.num_heads
        qq = nn.Dense(d, name="q_proj")(q)
        kk = nn.Dense(d, name="k_proj")(k)
        vv = nn.Dense(d, name="v_proj")(v)
        B, Tq, Tk = qq.shape[0], qq.shape[1], kk.shape[1]
        qq = qq.reshape(B, Tq, self.num_heads, hd)
        kk = kk.reshape(B, Tk, self.num_heads, hd)
        vv = vv.reshape(B, Tk, self.num_heads, hd)
        a = jnp.einsum("bqhd,bkhd->bhqk", qq, kk,
                       preferred_element_type=jnp.float32) * (hd ** -0.5)
        a = jax.nn.softmax(a.astype(jnp.float32), -1).astype(vv.dtype)
        o = jnp.einsum("bhqk,bkhd->bqhd", a, vv).reshape(B, Tq, d)
        return nn.Dense(self.dim, name="out_proj")(o)


class TwoWayBlock(nn.Module):
    cfg: SAMConfig
    skip_first_layer_pe: bool

    @nn.compact
    def __call__(self, queries, keys, query_pe, key_pe):
        c = self.cfg
        if self.skip_first_layer_pe:
            # first layer: raw token self-attention, output replaces queries
            queries = DecoderAttention(
                c.out_chans, c.decoder_heads, name="self_attn")(
                queries, queries, queries)
        else:
            q = queries + query_pe
            queries = queries + DecoderAttention(
                c.out_chans, c.decoder_heads, name="self_attn")(q, q, queries)
        queries = nn.LayerNorm(name="norm1")(queries)

        q = queries + query_pe
        k = keys + key_pe
        queries = queries + DecoderAttention(
            c.out_chans, c.decoder_heads, 2, name="cross_attn_t2i")(q, k, keys)
        queries = nn.LayerNorm(name="norm2")(queries)

        h = nn.Dense(c.decoder_mlp_dim, name="mlp_lin1")(queries)
        queries = queries + nn.Dense(c.out_chans, name="mlp_lin2")(nn.relu(h))
        queries = nn.LayerNorm(name="norm3")(queries)

        q = queries + query_pe
        k = keys + key_pe
        keys = keys + DecoderAttention(
            c.out_chans, c.decoder_heads, 2, name="cross_attn_i2t")(k, q, queries)
        keys = nn.LayerNorm(name="norm4")(keys)
        return queries, keys


class MaskDecoder(nn.Module):
    cfg: SAMConfig = SAMConfig()

    @nn.compact
    def __call__(self, image_embedding, image_pe, sparse_prompt, dense_prompt):
        """image_embedding [B,g,g,C]; returns (masks [B,M,4g,4g], iou [B,M])."""
        c = self.cfg
        b, g, _, ch = image_embedding.shape
        iou_token = self.param("iou_token", nn.initializers.normal(1.0), (1, ch))
        mask_tokens = self.param("mask_tokens", nn.initializers.normal(1.0),
                                 (c.num_mask_tokens, ch))
        out_tokens = jnp.concatenate([iou_token, mask_tokens])[None]
        tokens = jnp.concatenate(
            [jnp.broadcast_to(out_tokens, (b,) + out_tokens.shape[1:]),
             sparse_prompt], axis=1)

        src = (image_embedding + dense_prompt).reshape(b, g * g, ch)
        pos_src = jnp.broadcast_to(image_pe.reshape(1, g * g, ch),
                                   (b, g * g, ch))
        queries, keys = tokens, src
        for i in range(c.decoder_depth):
            queries, keys = TwoWayBlock(c, skip_first_layer_pe=(i == 0),
                                        name=f"layers_{i}")(
                queries, keys, tokens, pos_src)
        q = queries + tokens
        k = keys + pos_src
        queries = queries + DecoderAttention(
            ch, c.decoder_heads, 2, name="final_attn")(q, k, keys)
        queries = nn.LayerNorm(name="norm_final")(queries)

        iou_out = queries[:, 0]
        mask_out = queries[:, 1: 1 + c.num_mask_tokens]

        up = keys.reshape(b, g, g, ch)
        up = nn.ConvTranspose(ch // 4, (2, 2), strides=(2, 2),
                              name="upscale_conv1")(up)
        up = LayerNorm2d(ch // 4, name="upscale_ln")(up)
        up = nn.gelu(up)
        up = nn.ConvTranspose(ch // 8, (2, 2), strides=(2, 2),
                              name="upscale_conv2")(up)
        up = nn.gelu(up)                                   # [B, 4g, 4g, ch/8]

        hyper = []
        for m in range(c.num_mask_tokens):
            h = mask_out[:, m]
            h = nn.relu(nn.Dense(ch, name=f"hyper_{m}_lin1")(h))
            h = nn.relu(nn.Dense(ch, name=f"hyper_{m}_lin2")(h))
            hyper.append(nn.Dense(ch // 8, name=f"hyper_{m}_lin3")(h))
        hyper = jnp.stack(hyper, 1)                         # [B, M, ch/8]
        masks = jnp.einsum("bmc,bxyc->bmxy", hyper, up)

        h = nn.relu(nn.Dense(ch, name="iou_lin1")(iou_out))
        h = nn.relu(nn.Dense(ch, name="iou_lin2")(h))
        iou = nn.Dense(c.num_mask_tokens, name="iou_lin3")(h)
        return masks, iou


# ImageNet normalization constants SAM uses (pixel scale 0..255)
SAM_MEAN = np.array([123.675, 116.28, 103.53], np.float32)
SAM_STD = np.array([58.395, 57.12, 57.375], np.float32)


@dataclasses.dataclass
class SAM:
    """Bundle of the three SAM modules + params with a predict() convenience."""
    cfg: SAMConfig
    params: dict

    @classmethod
    def create(cls, cfg: SAMConfig, key=None) -> "SAM":
        key = jax.random.PRNGKey(0) if key is None else key
        enc = ImageEncoderViT(cfg)
        pe = PromptEncoder(cfg)
        dec = MaskDecoder(cfg)
        k1, k2, k3 = jax.random.split(key, 3)
        g = cfg.grid

        def init(k1, k2, k3):  # jitted: one compiled graph, not op-by-op
            return {
                "image_encoder": enc.init(
                    k1, jnp.zeros((1, cfg.img_size, cfg.img_size, 3)))["params"],
                "prompt_encoder": pe.init(k2, jnp.zeros((1, 4)))["params"],
                "mask_decoder": dec.init(
                    k3, jnp.zeros((1, g, g, cfg.out_chans)),
                    jnp.zeros((g, g, cfg.out_chans)),
                    jnp.zeros((1, 2, cfg.out_chans)),
                    jnp.zeros((1, g, g, cfg.out_chans)))["params"],
            }

        return cls(cfg=cfg, params=jax.jit(init)(k1, k2, k3))

    def encode(self, images01: jnp.ndarray) -> jnp.ndarray:
        """images [B,S,S,3] in [0,1] at encoder resolution -> embeddings."""
        x = (images01 * 255.0 - SAM_MEAN) / SAM_STD
        return ImageEncoderViT(self.cfg).apply(
            {"params": self.params["image_encoder"]}, x)

    def predict_boxes(self, embeddings: jnp.ndarray, boxes: jnp.ndarray
                      ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """embeddings [B,g,g,C], boxes [B,4] xyxy (encoder pixels) ->
        (mask logits [B, 4g, 4g], iou [B]) with multimask_output=False
        (lang_sam.py:103-113)."""
        pe = PromptEncoder(self.cfg)
        sparse, dense = pe.apply({"params": self.params["prompt_encoder"]},
                                 boxes)
        image_pe = pe.apply({"params": self.params["prompt_encoder"]},
                            method=PromptEncoder.dense_pe)
        masks, iou = MaskDecoder(self.cfg).apply(
            {"params": self.params["mask_decoder"]}, embeddings, image_pe,
            sparse, dense)
        return masks[:, 0], iou[:, 0]
