"""facebook SAM checkpoint -> flax params (offline torch unpickle).

Ingests `sam_vit_h_4b8939.pth` (the checkpoint the reference downloads,
/root/reference/gaussctrl/lang_sam.py:16-18) into the module trees of
seg/sam.py. Same conversion rules as the diffusion port (conv HWIO, linear
transposed); ConvTranspose weights map [I,O,kh,kw] -> [kh,kw,I,O].
"""

from __future__ import annotations

import re
from typing import Dict

import numpy as np


def _set(tree, path, value):
    parts = path.split("/")
    node = tree
    for p in parts[:-1]:
        node = node.setdefault(p, {})
    node[parts[-1]] = value


def _ln(tree, base, w, b):
    _set(tree, base + "/scale", w)
    _set(tree, base + "/bias", b)


def convert_sam(sd: Dict[str, np.ndarray]) -> Dict[str, dict]:
    """Flat torch state dict -> {image_encoder, prompt_encoder, mask_decoder}."""
    enc: dict = {}
    pe: dict = {}
    dec: dict = {}
    get = lambda k: np.asarray(sd[k])

    # ---- image encoder ---------------------------------------------------
    _set(enc, "patch_embed/kernel", get("image_encoder.patch_embed.proj.weight"
                                        ).transpose(2, 3, 1, 0))
    _set(enc, "patch_embed/bias", get("image_encoder.patch_embed.proj.bias"))
    _set(enc, "pos_embed", get("image_encoder.pos_embed"))
    n_blocks = 1 + max(int(m.group(1)) for k in sd
                       if (m := re.match(r"image_encoder\.blocks\.(\d+)\.", k)))
    for i in range(n_blocks):
        t = f"image_encoder.blocks.{i}."
        b = f"blocks_{i}"
        _ln(enc, f"{b}/norm1", get(t + "norm1.weight"), get(t + "norm1.bias"))
        _ln(enc, f"{b}/norm2", get(t + "norm2.weight"), get(t + "norm2.bias"))
        _set(enc, f"{b}/attn/qkv/kernel", get(t + "attn.qkv.weight").T)
        _set(enc, f"{b}/attn/qkv/bias", get(t + "attn.qkv.bias"))
        _set(enc, f"{b}/attn/proj/kernel", get(t + "attn.proj.weight").T)
        _set(enc, f"{b}/attn/proj/bias", get(t + "attn.proj.bias"))
        _set(enc, f"{b}/attn/rel_pos_h", get(t + "attn.rel_pos_h"))
        _set(enc, f"{b}/attn/rel_pos_w", get(t + "attn.rel_pos_w"))
        _set(enc, f"{b}/mlp_lin1/kernel", get(t + "mlp.lin1.weight").T)
        _set(enc, f"{b}/mlp_lin1/bias", get(t + "mlp.lin1.bias"))
        _set(enc, f"{b}/mlp_lin2/kernel", get(t + "mlp.lin2.weight").T)
        _set(enc, f"{b}/mlp_lin2/bias", get(t + "mlp.lin2.bias"))
    _set(enc, "neck_conv1/kernel",
         get("image_encoder.neck.0.weight").transpose(2, 3, 1, 0))
    _set(enc, "neck_ln1/weight", get("image_encoder.neck.1.weight"))
    _set(enc, "neck_ln1/bias", get("image_encoder.neck.1.bias"))
    _set(enc, "neck_conv2/kernel",
         get("image_encoder.neck.2.weight").transpose(2, 3, 1, 0))
    _set(enc, "neck_ln2/weight", get("image_encoder.neck.3.weight"))
    _set(enc, "neck_ln2/bias", get("image_encoder.neck.3.bias"))

    # ---- prompt encoder --------------------------------------------------
    _set(pe, "pe_gaussian",
         get("prompt_encoder.pe_layer.positional_encoding_gaussian_matrix"))
    _set(pe, "point_embed", np.concatenate(
        [get(f"prompt_encoder.point_embeddings.{i}.weight") for i in range(4)]))
    _set(pe, "no_mask_embed", get("prompt_encoder.no_mask_embed.weight")[0])

    # ---- mask decoder ----------------------------------------------------
    def attn(dst, src):
        for p in ("q_proj", "k_proj", "v_proj", "out_proj"):
            _set(dec, f"{dst}/{p}/kernel", get(f"{src}.{p}.weight").T)
            _set(dec, f"{dst}/{p}/bias", get(f"{src}.{p}.bias"))

    n_layers = 1 + max(int(m.group(1)) for k in sd if (m := re.match(
        r"mask_decoder\.transformer\.layers\.(\d+)\.", k)))
    for i in range(n_layers):
        t = f"mask_decoder.transformer.layers.{i}"
        b = f"layers_{i}"
        attn(f"{b}/self_attn", f"{t}.self_attn")
        attn(f"{b}/cross_attn_t2i", f"{t}.cross_attn_token_to_image")
        attn(f"{b}/cross_attn_i2t", f"{t}.cross_attn_image_to_token")
        for n in range(1, 5):
            _ln(dec, f"{b}/norm{n}", get(f"{t}.norm{n}.weight"),
                get(f"{t}.norm{n}.bias"))
        _set(dec, f"{b}/mlp_lin1/kernel", get(f"{t}.mlp.lin1.weight").T)
        _set(dec, f"{b}/mlp_lin1/bias", get(f"{t}.mlp.lin1.bias"))
        _set(dec, f"{b}/mlp_lin2/kernel", get(f"{t}.mlp.lin2.weight").T)
        _set(dec, f"{b}/mlp_lin2/bias", get(f"{t}.mlp.lin2.bias"))
    attn("final_attn", "mask_decoder.transformer.final_attn_token_to_image")
    _ln(dec, "norm_final",
        get("mask_decoder.transformer.norm_final_attn.weight"),
        get("mask_decoder.transformer.norm_final_attn.bias"))
    _set(dec, "iou_token", get("mask_decoder.iou_token.weight"))
    _set(dec, "mask_tokens", get("mask_decoder.mask_tokens.weight"))
    _set(dec, "upscale_conv1/kernel",
         get("mask_decoder.output_upscaling.0.weight").transpose(2, 3, 0, 1))
    _set(dec, "upscale_conv1/bias", get("mask_decoder.output_upscaling.0.bias"))
    _set(dec, "upscale_ln/weight", get("mask_decoder.output_upscaling.1.weight"))
    _set(dec, "upscale_ln/bias", get("mask_decoder.output_upscaling.1.bias"))
    _set(dec, "upscale_conv2/kernel",
         get("mask_decoder.output_upscaling.3.weight").transpose(2, 3, 0, 1))
    _set(dec, "upscale_conv2/bias", get("mask_decoder.output_upscaling.3.bias"))
    for m in range(4):
        for j in range(3):
            t = f"mask_decoder.output_hypernetworks_mlps.{m}.layers.{j}"
            _set(dec, f"hyper_{m}_lin{j + 1}/kernel", get(t + ".weight").T)
            _set(dec, f"hyper_{m}_lin{j + 1}/bias", get(t + ".bias"))
    for j in range(3):
        t = f"mask_decoder.iou_prediction_head.layers.{j}"
        _set(dec, f"iou_lin{j + 1}/kernel", get(t + ".weight").T)
        _set(dec, f"iou_lin{j + 1}/bias", get(t + ".bias"))

    return {"image_encoder": enc, "prompt_encoder": pe, "mask_decoder": dec}


def load_sam(ckpt_path: str, cfg=None):
    """Load a facebook SAM .pth -> seg.sam.SAM (torch CPU unpickle)."""
    import torch

    from gaussctrl_tpu.seg.sam import SAM, SAMConfig

    sd = torch.load(ckpt_path, map_location="cpu", weights_only=True)
    sd = {k: v.float().numpy() for k, v in sd.items()}
    if cfg is None:
        dim = sd["image_encoder.pos_embed"].shape[-1]
        cfg = {1280: SAMConfig.vit_h, 1024: SAMConfig.vit_l,
               768: SAMConfig.vit_b}[dim]()
    return SAM(cfg=cfg, params=convert_sam(sd))
