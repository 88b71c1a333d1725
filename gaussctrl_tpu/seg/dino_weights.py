"""Official GroundingDINO checkpoint -> flax params (offline torch unpickle).

Ingests `groundingdino_swinb_cogcoor.pth` (the checkpoint the reference
downloads via HF hub, /root/reference/gaussctrl/lang_sam.py:84-88) into the
module trees of seg/dino.py. Conversion rules as the SAM/diffusion ports:
linear [out,in] -> kernel transposed, conv [O,I,kh,kw] -> HWIO, LayerNorm/
GroupNorm weight -> scale; torch nn.MultiheadAttention in_proj kept in torch
[3d, d] layout (TorchMHA consumes it directly)."""

from __future__ import annotations

import re
from typing import Dict

import numpy as np


def _set(tree, path, value):
    parts = path.split("/")
    node = tree
    for p in parts[:-1]:
        node = node.setdefault(p, {})
    node[parts[-1]] = np.asarray(value)


def convert_dino(sd: Dict[str, np.ndarray]) -> dict:
    """Flat torch state dict (module. prefix stripped) -> flax params tree."""
    p: dict = {}
    get = lambda k: np.asarray(sd[k])
    has = lambda k: k in sd

    def lin(dst, src):
        _set(p, dst + "/kernel", get(src + ".weight").T)
        if has(src + ".bias"):
            _set(p, dst + "/bias", get(src + ".bias"))

    def norm(dst, src):
        _set(p, dst + "/scale", get(src + ".weight"))
        _set(p, dst + "/bias", get(src + ".bias"))

    def mha(dst, src):
        _set(p, dst + "/in_proj_weight", get(src + ".in_proj_weight"))
        _set(p, dst + "/in_proj_bias", get(src + ".in_proj_bias"))
        lin(dst + "/out_proj", src + ".out_proj")

    def deform(dst, src):
        for n in ("sampling_offsets", "attention_weights", "value_proj",
                  "output_proj"):
            lin(f"{dst}/{n}", f"{src}.{n}")

    def mlp(dst, src, n):
        for j in range(n):
            lin(f"{dst}/lin{j}", f"{src}.layers.{j}")

    # ---- Swin backbone ---------------------------------------------------
    _set(p, "backbone/patch_embed/kernel",
         get("backbone.0.patch_embed.proj.weight").transpose(2, 3, 1, 0))
    _set(p, "backbone/patch_embed/bias",
         get("backbone.0.patch_embed.proj.bias"))
    norm("backbone/patch_norm", "backbone.0.patch_embed.norm")
    n_stages = 1 + max(int(m.group(1)) for k in sd
                       if (m := re.match(r"backbone\.0\.layers\.(\d+)\.", k)))
    for s in range(n_stages):
        blocks = {int(m.group(1)) for k in sd if (m := re.match(
            rf"backbone\.0\.layers\.{s}\.blocks\.(\d+)\.", k))}
        for b in sorted(blocks):
            t = f"backbone.0.layers.{s}.blocks.{b}"
            d = f"backbone/stage{s}_block{b}"
            norm(f"{d}/norm1", f"{t}.norm1")
            norm(f"{d}/norm2", f"{t}.norm2")
            _set(p, f"{d}/attn/relative_position_bias_table",
                 get(f"{t}.attn.relative_position_bias_table"))
            lin(f"{d}/attn/qkv", f"{t}.attn.qkv")
            lin(f"{d}/attn/proj", f"{t}.attn.proj")
            lin(f"{d}/mlp_fc1", f"{t}.mlp.fc1")
            lin(f"{d}/mlp_fc2", f"{t}.mlp.fc2")
        if has(f"backbone.0.layers.{s}.downsample.reduction.weight"):
            lin(f"backbone/downsample{s}/reduction",
                f"backbone.0.layers.{s}.downsample.reduction")
            norm(f"backbone/downsample{s}/norm",
                 f"backbone.0.layers.{s}.downsample.norm")
    for s in range(n_stages):
        if has(f"backbone.0.norm{s}.weight"):
            norm(f"backbone/out_norm{s}", f"backbone.0.norm{s}")

    # ---- input projections ----------------------------------------------
    n_proj = 1 + max(int(m.group(1)) for k in sd
                     if (m := re.match(r"input_proj\.(\d+)\.", k)))
    for i in range(n_proj):
        _set(p, f"input_proj{i}_conv/kernel",
             get(f"input_proj.{i}.0.weight").transpose(2, 3, 1, 0))
        _set(p, f"input_proj{i}_conv/bias", get(f"input_proj.{i}.0.bias"))
        _set(p, f"input_proj{i}_gn/scale", get(f"input_proj.{i}.1.weight"))
        _set(p, f"input_proj{i}_gn/bias", get(f"input_proj.{i}.1.bias"))

    # ---- BERT ------------------------------------------------------------
    _set(p, "bert/word_embeddings",
         get("bert.embeddings.word_embeddings.weight"))
    _set(p, "bert/position_embeddings",
         get("bert.embeddings.position_embeddings.weight"))
    _set(p, "bert/token_type_embeddings",
         get("bert.embeddings.token_type_embeddings.weight"))
    norm("bert/embed_norm", "bert.embeddings.LayerNorm")
    n_bert = 1 + max(int(m.group(1)) for k in sd if (m := re.match(
        r"bert\.encoder\.layer\.(\d+)\.", k)))
    for i in range(n_bert):
        t = f"bert.encoder.layer.{i}"
        d = f"bert/layer{i}"
        lin(f"{d}/q", f"{t}.attention.self.query")
        lin(f"{d}/k", f"{t}.attention.self.key")
        lin(f"{d}/v", f"{t}.attention.self.value")
        lin(f"{d}/attn_out", f"{t}.attention.output.dense")
        norm(f"{d}/attn_norm", f"{t}.attention.output.LayerNorm")
        lin(f"{d}/ff1", f"{t}.intermediate.dense")
        lin(f"{d}/ff2", f"{t}.output.dense")
        norm(f"{d}/ff_norm", f"{t}.output.LayerNorm")
    lin("feat_map", "feat_map")

    # ---- feature enhancer ------------------------------------------------
    _set(p, "level_embed", get("transformer.level_embed"))
    n_enc = 1 + max((int(m.group(1)) for k in sd if (m := re.match(
        r"transformer\.encoder\.layers\.(\d+)\.", k))), default=-1)
    for i in range(n_enc):
        t = f"transformer.encoder.layers.{i}"
        d = f"enc{i}"
        deform(f"{d}/self_attn", f"{t}.self_attn")
        for n in ("linear1", "linear2"):
            lin(f"{d}/{n}", f"{t}.{n}")
        norm(f"{d}/norm1", f"{t}.norm1")
        norm(f"{d}/norm2", f"{t}.norm2")
        tt = f"transformer.encoder.text_layers.{i}"
        mha(f"{d}/text_attn", f"{tt}.self_attn")
        lin(f"{d}/text_ff1", f"{tt}.linear1")
        lin(f"{d}/text_ff2", f"{tt}.linear2")
        norm(f"{d}/text_norm1", f"{tt}.norm1")
        norm(f"{d}/text_norm2", f"{tt}.norm2")
        ft = f"transformer.encoder.fusion_layers.{i}"
        _set(p, f"{d}/fusion/gamma_v", get(f"{ft}.gamma_v"))
        _set(p, f"{d}/fusion/gamma_l", get(f"{ft}.gamma_l"))
        norm(f"{d}/fusion/layer_norm_v", f"{ft}.layer_norm_v")
        norm(f"{d}/fusion/layer_norm_l", f"{ft}.layer_norm_l")
        for n in ("v_proj", "l_proj", "values_v_proj", "values_l_proj",
                  "out_v_proj", "out_l_proj"):
            lin(f"{d}/fusion/{n}", f"{ft}.attn.{n}")

    # ---- query selection -------------------------------------------------
    lin("enc_output", "transformer.enc_output")
    norm("enc_output_norm", "transformer.enc_output_norm")
    mlp("enc_out_bbox_embed", "transformer.enc_out_bbox_embed", 3)
    _set(p, "tgt_embed", get("transformer.tgt_embed.weight"))

    # ---- decoder ---------------------------------------------------------
    n_dec = 1 + max((int(m.group(1)) for k in sd if (m := re.match(
        r"transformer\.decoder\.layers\.(\d+)\.", k))), default=-1)
    for i in range(n_dec):
        t = f"transformer.decoder.layers.{i}"
        d = f"dec{i}"
        mha(f"{d}/self_attn", f"{t}.self_attn")
        mha(f"{d}/ca_text", f"{t}.ca_text")
        deform(f"{d}/cross_attn", f"{t}.cross_attn")
        for n in ("linear1", "linear2"):
            lin(f"{d}/{n}", f"{t}.{n}")
        for n in ("norm1", "norm2", "norm3", "catext_norm"):
            norm(f"{d}/{n}", f"{t}.{n}")
    mlp("ref_point_head", "transformer.decoder.ref_point_head", 2)
    norm("dec_norm", "transformer.decoder.norm")
    # bbox_embed is layer-shared (dec_pred_bbox_embed_share) — load copy 0
    mlp("bbox_embed", "bbox_embed.0", 3)
    return p


def load_dino(ckpt_path: str, vocab_path: str, cfg=None):
    """Load `groundingdino_swinb_cogcoor.pth` + BERT `vocab.txt` ->
    (GroundingDINO, params, WordPieceTokenizer)."""
    import torch

    from gaussctrl_tpu.seg.dino import (DinoConfig, GroundingDINO,
                                        WordPieceTokenizer)

    ckpt = torch.load(ckpt_path, map_location="cpu", weights_only=True)
    sd = ckpt.get("model", ckpt)
    sd = {re.sub(r"^module\.", "", k): v.float().numpy()
          for k, v in sd.items()}
    cfg = cfg or DinoConfig.swin_b()
    model = GroundingDINO(cfg)
    return model, convert_dino(sd), WordPieceTokenizer(vocab_path)
