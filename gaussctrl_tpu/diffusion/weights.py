"""HF checkpoint → flax params port for the SD-1.5 stack.

The reference pulls `CompVis/stable-diffusion-v1-4` /
`jinggogogo/gaussctrl-sd15` + `lllyasviel/sd-controlnet-depth` through
diffusers (/root/reference/gaussctrl/gc_pipeline.py:72, 100). Here the same
checkpoints are ingested **offline** from a local diffusers-layout directory
(`unet/`, `vae/`, `text_encoder/`, plus a controlnet dir), safetensors or
torch `.bin`, and renamed/transposed into the flax module trees defined in
unet.py / controlnet.py / vae.py / clip.py.

Conversion rules:
  torch conv [O,I,kh,kw]  -> flax conv kernel [kh,kw,I,O]
  torch linear [O,I]      -> flax dense kernel [I,O]
  1x1 "conv projections" (Transformer2D proj_in/out) -> dense kernel
  norm weight/bias        -> scale/bias
  embeddings              -> kept as [V,D]
"""

from __future__ import annotations

import os
from typing import Any, Dict

import numpy as np


# ---------------------------------------------------------------------------
# state-dict IO (safetensors preferred; torch .bin via torch CPU if present)
# ---------------------------------------------------------------------------

def load_state_dict(model_dir: str, filename_stem: str = "diffusion_pytorch_model"
                    ) -> Dict[str, np.ndarray]:
    """Load a flat {torch_key: np.ndarray} from a model directory.

    Tries `{stem}.safetensors` then `{stem}.bin`, falling back only to
    KNOWN-EQUIVALENT names for the same component family (`model.*` ↔
    `pytorch_model.*` for transformers-style dirs like text_encoder/ —
    different library versions write different names for the same weights).
    A diffusers stem never falls back to a transformers stem or vice versa:
    that would silently load an unrelated state dict that happens to share
    the directory. When a fallback name is used, it is logged.
    """
    _EQUIV = {  # stems that name the SAME weights across library versions
        "model": ("model", "pytorch_model"),
        "pytorch_model": ("pytorch_model", "model"),
        "diffusion_pytorch_model": ("diffusion_pytorch_model",),
    }
    stems = list(_EQUIV.get(filename_stem, (filename_stem,)))
    tried = []
    for stem in stems:
        st_path = os.path.join(model_dir, f"{stem}.safetensors")
        bin_path = os.path.join(model_dir, f"{stem}.bin")
        tried += [st_path, bin_path]
        if stem != filename_stem and (os.path.exists(st_path)
                                      or os.path.exists(bin_path)):
            print(f"[weights] {model_dir}: '{filename_stem}.*' absent, "
                  f"loading equivalent '{stem}.*'")
        if os.path.exists(st_path):
            from safetensors import safe_open
            out = {}
            with safe_open(st_path, framework="np") as f:
                for k in f.keys():
                    t = f.get_tensor(k)
                    if t.dtype == np.float16:
                        t = t.astype(np.float32)
                    out[k] = t
            return out
        if os.path.exists(bin_path):
            import torch
            sd = torch.load(bin_path, map_location="cpu", weights_only=True)
            return {k: np.asarray(v.float().numpy()) for k, v in sd.items()}
    raise FileNotFoundError(f"no state dict in {model_dir} (tried {tried})")


def _set(tree: Dict[str, Any], path: str, value: np.ndarray):
    parts = path.split("/")
    node = tree
    for p in parts[:-1]:
        node = node.setdefault(p, {})
    node[parts[-1]] = value


def _merge_indices(key: str) -> str:
    """'down_blocks.0.resnets.1.conv1.weight' -> 'down_blocks_0/resnets_1/conv1/weight'."""
    parts = key.split(".")
    merged = []
    for p in parts:
        if p.isdigit() and merged:
            merged[-1] = f"{merged[-1]}_{p}"
        else:
            merged.append(p)
    return "/".join(merged)


_NORM_HINTS = ("norm", "layer_norm", "group_norm")


def _leaf(path: str, tensor: np.ndarray, dense_1x1: bool):
    """Map a torch leaf (weight/bias) to (flax_leaf_name, converted array)."""
    head, leaf = path.rsplit("/", 1)
    last_mod = head.rsplit("/", 1)[-1]
    is_norm = any(h in last_mod for h in _NORM_HINTS) and tensor.ndim == 1
    if leaf == "bias":
        return head + "/bias", tensor
    if is_norm:
        return head + "/scale", tensor
    if tensor.ndim == 4:  # conv
        if dense_1x1 and tensor.shape[2] == tensor.shape[3] == 1:
            return head + "/kernel", tensor[:, :, 0, 0].T
        return head + "/kernel", tensor.transpose(2, 3, 1, 0)
    if tensor.ndim == 2:  # linear
        return head + "/kernel", tensor.T
    return head + "/scale", tensor  # 1-d affine (norm without 'norm' in name)


def _convert(sd: Dict[str, np.ndarray], rename, dense_1x1_mods=()) -> Dict[str, Any]:
    tree: Dict[str, Any] = {}
    for key, tensor in sd.items():
        path = rename(_merge_indices(key))
        if path is None:
            continue
        dense_1x1 = any(path.endswith(f"{m}/weight") or f"/{m}/" in path
                        for m in dense_1x1_mods)
        leaf_path, arr = _leaf(path, tensor, dense_1x1)
        _set(tree, leaf_path, arr)
    return tree


# ---------------------------------------------------------------------------
# per-model renamers (my-module path <- HF path)
# ---------------------------------------------------------------------------

_ENCODER_OWNED = ("conv_in/", "time_embedding/", "down_blocks_", "mid_block/")


def _rename_unet_common(path: str) -> str:
    path = path.replace("/to_out_0/", "/to_out/")
    path = path.replace("/downsamplers_0/", "/downsamplers_0/")
    if path.startswith(_ENCODER_OWNED):
        path = "encoder/" + path
    return path


def convert_unet(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    return _convert(sd, _rename_unet_common, dense_1x1_mods=("proj_in", "proj_out"))


def convert_controlnet(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    def rename(path: str) -> str:
        path = path.replace("controlnet_cond_embedding/", "cond_embedding/")
        return _rename_unet_common(path)

    return _convert(sd, rename, dense_1x1_mods=("proj_in", "proj_out"))


def convert_vae(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    def rename(path: str) -> str:
        # flat encoder/decoder block names: down_blocks_0/resnets_1 -> down_blocks_0_resnets_1
        for side in ("encoder", "decoder"):
            pre = f"{side}/"
            if path.startswith(pre):
                rest = path[len(pre):]
                rest = rest.replace("/resnets_", "_resnets_", 1) if rest.startswith(
                    ("down_blocks_", "up_blocks_")) else rest
                rest = rest.replace("/downsamplers_0/conv", "_downsample", 1)
                rest = rest.replace("/upsamplers_0/conv", "_upsample/conv", 1)
                path = pre + rest
        # old-style attention names -> unified Attention module
        path = path.replace("/attentions_0/query/", "/attentions_0/attn/to_q/")
        path = path.replace("/attentions_0/key/", "/attentions_0/attn/to_k/")
        path = path.replace("/attentions_0/value/", "/attentions_0/attn/to_v/")
        path = path.replace("/attentions_0/proj_attn/", "/attentions_0/attn/to_out/")
        path = path.replace("/attentions_0/to_q/", "/attentions_0/attn/to_q/")
        path = path.replace("/attentions_0/to_k/", "/attentions_0/attn/to_k/")
        path = path.replace("/attentions_0/to_v/", "/attentions_0/attn/to_v/")
        path = path.replace("/attentions_0/to_out_0/", "/attentions_0/attn/to_out/")
        return path

    return _convert(sd, rename)


def convert_clip_text(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    def rename(path: str):
        if not path.startswith("text_model/"):
            return None  # skip vision tower / projection if present
        path = path[len("text_model/"):]
        path = path.replace("embeddings/token_embedding", "token_embedding")
        path = path.replace("embeddings/position_embedding/weight",
                            "position_embedding")
        path = path.replace("encoder/layers_", "layers_")
        path = path.replace("/mlp/", "/")
        if "position_ids" in path:
            return None
        return path

    tree: Dict[str, Any] = {}
    for key, tensor in sd.items():
        path = rename(_merge_indices(key))
        if path is None:
            continue
        if path == "position_embedding":
            _set(tree, path, tensor)
            continue
        if path.endswith("token_embedding/weight"):
            _set(tree, path.replace("/weight", "/embedding"), tensor)
            continue
        leaf_path, arr = _leaf(path, tensor, False)
        _set(tree, leaf_path, arr)
    return tree


def convert_clip_vision(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """HF CLIP vision-tower keys -> CLIPVisionModel params."""
    tree: Dict[str, Any] = {}
    for key, tensor in sd.items():
        if not key.startswith("vision_model."):
            continue
        path = _merge_indices(key[len("vision_model."):])
        path = path.replace("embeddings/", "").replace("encoder/layers_",
                                                       "layers_")
        path = path.replace("/mlp/", "/")
        if "position_ids" in path:
            continue
        if path == "class_embedding":
            _set(tree, path, tensor)
        elif path == "patch_embedding/weight":
            _set(tree, "patch_embedding/kernel", tensor.transpose(2, 3, 1, 0))
        elif path == "position_embedding/weight":
            _set(tree, "position_embedding", tensor)
        else:
            leaf_path, arr = _leaf(path, tensor, False)
            _set(tree, leaf_path, arr)
    return tree


def load_clip_model(clip_dir: str) -> Dict[str, Any]:
    """Local HF CLIPModel dir -> {vision, text, visual/text_projection}."""
    sd = load_state_dict(clip_dir, "model")
    return {
        "vision": convert_clip_vision(sd),
        "text": convert_clip_text(sd),
        "visual_projection": np.asarray(sd["visual_projection.weight"]).T,
        "text_projection": np.asarray(sd["text_projection.weight"]).T,
    }


# ---------------------------------------------------------------------------
# top-level loader
# ---------------------------------------------------------------------------

def load_sd_params(sd_dir: str, controlnet_dir: str, dtype=np.float32
                   ) -> Dict[str, Any]:
    """Load {unet, controlnet, vae, text} params from local diffusers dirs.

    sd_dir: diffusers SD pipeline root (unet/, vae/, text_encoder/).
    controlnet_dir: controlnet model dir (diffusion_pytorch_model.*).
    """
    params = {
        "unet": convert_unet(load_state_dict(os.path.join(sd_dir, "unet"))),
        "vae": convert_vae(load_state_dict(os.path.join(sd_dir, "vae"))),
        "text": convert_clip_text(
            load_state_dict(os.path.join(sd_dir, "text_encoder"), "model")),
        "controlnet": convert_controlnet(load_state_dict(controlnet_dir)),
    }
    if dtype is not None:
        import jax
        params = jax.tree_util.tree_map(lambda x: np.asarray(x, dtype), params)
    return params


def tree_shapes(tree, prefix=""):
    """Flat {path: shape} of a nested param tree (diffability helper)."""
    out = {}
    for k, v in tree.items():
        p = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            out.update(tree_shapes(v, p))
        else:
            out[p] = tuple(v.shape)
    return out
