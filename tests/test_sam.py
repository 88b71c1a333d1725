"""SAM port: forward shapes, windowing identity, converter round trip."""

import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaussctrl_tpu.diffusion.weights import tree_shapes
from gaussctrl_tpu.seg.sam import (
    SAM, SAMConfig, window_partition, window_unpartition,
)
from gaussctrl_tpu.seg.weights import convert_sam


@pytest.fixture(scope="module")
def sam():
    return SAM.create(SAMConfig.tiny())


def test_window_roundtrip():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 10, 14, 8))
    win, pad_hw = window_partition(x, 4)
    back = window_unpartition(win, 4, pad_hw, (10, 14))
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=1e-6)


@pytest.mark.slow
def test_sam_predict_shapes(sam):
    cfg = sam.cfg
    imgs = jax.random.uniform(jax.random.PRNGKey(1),
                              (2, cfg.img_size, cfg.img_size, 3))
    emb = sam.encode(imgs)
    assert emb.shape == (2, cfg.grid, cfg.grid, cfg.out_chans)
    boxes = jnp.array([[4.0, 4.0, 40.0, 40.0], [0.0, 0.0, 60.0, 60.0]])
    masks, iou = sam.predict_boxes(emb, boxes)
    assert masks.shape == (2, 4 * cfg.grid, 4 * cfg.grid)
    assert iou.shape == (2,)
    assert np.isfinite(np.asarray(masks)).all()


@pytest.mark.slow
def test_box_location_affects_mask(sam):
    cfg = sam.cfg
    emb = sam.encode(jax.random.uniform(jax.random.PRNGKey(2),
                                        (1, cfg.img_size, cfg.img_size, 3)))
    m1, _ = sam.predict_boxes(emb, jnp.array([[0.0, 0.0, 20.0, 20.0]]))
    m2, _ = sam.predict_boxes(emb, jnp.array([[30.0, 30.0, 60.0, 60.0]]))
    assert np.abs(np.asarray(m1) - np.asarray(m2)).max() > 1e-5


def _flatten(tree, prefix=""):
    for k, v in tree.items():
        p = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            yield from _flatten(v, p)
        else:
            yield p, np.asarray(v)


def _fake_sam_sd(params):
    """Inverse of convert_sam for the tiny config: flax tree -> torch keys."""
    sd = {}

    def put(k, v):
        sd[k] = v

    enc = dict(_flatten(params["image_encoder"]))
    put("image_encoder.patch_embed.proj.weight",
        enc["patch_embed/kernel"].transpose(3, 2, 0, 1))
    put("image_encoder.patch_embed.proj.bias", enc["patch_embed/bias"])
    put("image_encoder.pos_embed", enc["pos_embed"])
    for p, v in enc.items():
        m = re.match(r"blocks_(\d+)/(.*)", p)
        if not m:
            continue
        i, rest = m.group(1), m.group(2)
        t = f"image_encoder.blocks.{i}."
        if rest.startswith("norm"):
            n, leaf = rest.split("/")
            put(t + n + (".weight" if leaf == "scale" else ".bias"), v)
        elif rest in ("attn/rel_pos_h", "attn/rel_pos_w"):
            put(t + rest.replace("/", "."), v)
        elif rest.startswith("attn/"):
            _, mod, leaf = rest.split("/")
            put(t + f"attn.{mod}." + ("weight" if leaf == "kernel" else "bias"),
                v.T if leaf == "kernel" else v)
        elif rest.startswith("mlp_lin"):
            mod, leaf = rest.split("/")
            n = mod[-1]
            put(t + f"mlp.lin{n}." + ("weight" if leaf == "kernel" else "bias"),
                v.T if leaf == "kernel" else v)
    put("image_encoder.neck.0.weight", enc["neck_conv1/kernel"].transpose(3, 2, 0, 1))
    put("image_encoder.neck.1.weight", enc["neck_ln1/weight"])
    put("image_encoder.neck.1.bias", enc["neck_ln1/bias"])
    put("image_encoder.neck.2.weight", enc["neck_conv2/kernel"].transpose(3, 2, 0, 1))
    put("image_encoder.neck.3.weight", enc["neck_ln2/weight"])
    put("image_encoder.neck.3.bias", enc["neck_ln2/bias"])

    pe = dict(_flatten(params["prompt_encoder"]))
    put("prompt_encoder.pe_layer.positional_encoding_gaussian_matrix",
        pe["pe_gaussian"])
    for i in range(4):
        put(f"prompt_encoder.point_embeddings.{i}.weight",
            pe["point_embed"][i: i + 1])
    put("prompt_encoder.no_mask_embed.weight", pe["no_mask_embed"][None])

    dec = dict(_flatten(params["mask_decoder"]))
    cross = {"self_attn": "self_attn", "cross_attn_t2i": "cross_attn_token_to_image",
             "cross_attn_i2t": "cross_attn_image_to_token"}
    for p, v in dec.items():
        m = re.match(r"layers_(\d+)/(.*)", p)
        if m:
            i, rest = m.group(1), m.group(2)
            t = f"mask_decoder.transformer.layers.{i}."
            parts = rest.split("/")
            if parts[0] in cross:
                put(t + f"{cross[parts[0]]}.{parts[1]}." +
                    ("weight" if parts[2] == "kernel" else "bias"),
                    v.T if parts[2] == "kernel" else v)
            elif parts[0].startswith("norm"):
                put(t + parts[0] + (".weight" if parts[1] == "scale" else ".bias"), v)
            elif parts[0].startswith("mlp_lin"):
                put(t + f"mlp.lin{parts[0][-1]}." +
                    ("weight" if parts[1] == "kernel" else "bias"),
                    v.T if parts[1] == "kernel" else v)
    for mod, leaf in (("q_proj", None), ("k_proj", None), ("v_proj", None),
                      ("out_proj", None)):
        put(f"mask_decoder.transformer.final_attn_token_to_image.{mod}.weight",
            dec[f"final_attn/{mod}/kernel"].T)
        put(f"mask_decoder.transformer.final_attn_token_to_image.{mod}.bias",
            dec[f"final_attn/{mod}/bias"])
    put("mask_decoder.transformer.norm_final_attn.weight", dec["norm_final/scale"])
    put("mask_decoder.transformer.norm_final_attn.bias", dec["norm_final/bias"])
    put("mask_decoder.iou_token.weight", dec["iou_token"])
    put("mask_decoder.mask_tokens.weight", dec["mask_tokens"])
    put("mask_decoder.output_upscaling.0.weight",
        dec["upscale_conv1/kernel"].transpose(2, 3, 0, 1))
    put("mask_decoder.output_upscaling.0.bias", dec["upscale_conv1/bias"])
    put("mask_decoder.output_upscaling.1.weight", dec["upscale_ln/weight"])
    put("mask_decoder.output_upscaling.1.bias", dec["upscale_ln/bias"])
    put("mask_decoder.output_upscaling.3.weight",
        dec["upscale_conv2/kernel"].transpose(2, 3, 0, 1))
    put("mask_decoder.output_upscaling.3.bias", dec["upscale_conv2/bias"])
    for m in range(4):
        for j in range(3):
            put(f"mask_decoder.output_hypernetworks_mlps.{m}.layers.{j}.weight",
                dec[f"hyper_{m}_lin{j + 1}/kernel"].T)
            put(f"mask_decoder.output_hypernetworks_mlps.{m}.layers.{j}.bias",
                dec[f"hyper_{m}_lin{j + 1}/bias"])
    for j in range(3):
        put(f"mask_decoder.iou_prediction_head.layers.{j}.weight",
            dec[f"iou_lin{j + 1}/kernel"].T)
        put(f"mask_decoder.iou_prediction_head.layers.{j}.bias",
            dec[f"iou_lin{j + 1}/bias"])
    return sd


def test_sam_converter_roundtrip(sam):
    sd = _fake_sam_sd(sam.params)
    converted = convert_sam(sd)
    cs, es = tree_shapes(converted), tree_shapes(
        jax.tree_util.tree_map(np.asarray, sam.params))
    assert set(cs) == set(es), (sorted(set(es) - set(cs))[:5],
                                sorted(set(cs) - set(es))[:5])
    for k in es:
        assert cs[k] == es[k], (k, cs[k], es[k])
    # spot-check a transposed linear carried through
    np.testing.assert_allclose(
        converted["image_encoder"]["blocks_0"]["attn"]["qkv"]["kernel"],
        np.asarray(sam.params["image_encoder"]["blocks_0"]["attn"]["qkv"]["kernel"]))
