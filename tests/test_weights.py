"""Weight-port consistency: an HF-layout state dict (synthesized with diffusers/
transformers key naming for the tiny config) must convert into exactly the
param tree the flax models init — same paths, same shapes, values carried
through the documented transposes."""

import re

import jax
import numpy as np
import pytest

from gaussctrl_tpu.diffusion.config import SDConfig
from gaussctrl_tpu.diffusion.sample import SDModels
from gaussctrl_tpu.diffusion.weights import (
    convert_clip_text, convert_controlnet, convert_unet, convert_vae,
    tree_shapes,
)

# module names whose numeric suffix is a torch ModuleList index
_INDEXED = ("down_blocks", "up_blocks", "resnets", "attentions",
            "transformer_blocks", "layers", "blocks", "net",
            "controlnet_down_blocks", "downsamplers", "upsamplers")


def _unmerge(seg: str) -> str:
    m = re.fullmatch(r"(.+?)_(\d+)", seg)
    if m and m.group(1) in _INDEXED:
        return f"{m.group(1)}.{m.group(2)}"
    return seg


def _flatten(tree, prefix=""):
    for k, v in tree.items():
        p = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            yield from _flatten(v, p)
        else:
            yield p, v


def _torchify(path: str, arr: np.ndarray, dense_1x1: bool):
    """my flax path/array -> (hf torch key, torch-shaped array)."""
    head, leaf = path.rsplit("/", 1)
    segs = [_unmerge(s) for s in head.split("/")]
    key = ".".join(segs)
    key = key.replace("to_out", "to_out.0")
    arr = np.asarray(arr)
    if leaf == "scale":
        return key + ".weight", arr
    if leaf == "bias":
        return key + ".bias", arr
    if leaf == "embedding":
        return key + ".weight", arr
    assert leaf == "kernel", path
    if arr.ndim == 4:
        return key + ".weight", arr.transpose(3, 2, 0, 1)
    if dense_1x1:
        return key + ".weight", arr.T[:, :, None, None]
    return key + ".weight", arr.T


def _fake_unet_sd(params):
    sd = {}
    for path, arr in _flatten(params):
        if path.startswith("encoder/"):
            path = path[len("encoder/"):]
        dense_1x1 = "/proj_in/" in path or "/proj_out/" in path
        k, v = _torchify(path, arr, dense_1x1)
        sd[k] = v
    return sd


def _fake_controlnet_sd(params):
    sd = {}
    for path, arr in _flatten(params):
        if path.startswith("encoder/"):
            path = path[len("encoder/"):]
        path = path.replace("cond_embedding/", "controlnet_cond_embedding/")
        dense_1x1 = "/proj_in/" in path or "/proj_out/" in path
        k, v = _torchify(path, arr, dense_1x1)
        sd[k] = v
    return sd


def _fake_vae_sd(params):
    sd = {}
    for path, arr in _flatten(params):
        # flat block names back to nested HF names
        path = re.sub(r"(down_blocks_\d+)_resnets_", r"\1/resnets_", path)
        path = re.sub(r"(up_blocks_\d+)_resnets_", r"\1/resnets_", path)
        path = re.sub(r"(down_blocks_\d+)_downsample/", r"\1/downsamplers_0/conv/", path)
        path = re.sub(r"(up_blocks_\d+)_upsample/conv/", r"\1/upsamplers_0/conv/", path)
        path = path.replace("/attn/to_", "/to_")
        k, v = _torchify(path, arr, False)
        sd[k] = v
    return sd


def _fake_clip_sd(params):
    sd = {}
    for path, arr in _flatten(params):
        if path == "position_embedding":
            sd["text_model.embeddings.position_embedding.weight"] = np.asarray(arr)
            continue
        if path == "token_embedding/embedding":
            sd["text_model.embeddings.token_embedding.weight"] = np.asarray(arr)
            continue
        if path.startswith("layers_"):
            path = "encoder/" + path
        k, v = _torchify(path, arr, False)
        if ".fc1." in k or ".fc2." in k:
            # mlp submodule: layers.N.fc1 -> layers.N.mlp.fc1
            k = re.sub(r"(layers\.\d+\.)(fc[12]\.)", r"\1mlp.\2", k)
        sd["text_model." + k] = v
    return sd


@pytest.fixture(scope="module")
def tiny_params():
    cfg = SDConfig.tiny()
    models = SDModels.create(cfg)
    return models.init_params(jax.random.PRNGKey(0))


def _assert_same_tree(converted, expected, name):
    cs, es = tree_shapes(converted), tree_shapes(expected)
    missing = sorted(set(es) - set(cs))
    extra = sorted(set(cs) - set(es))
    assert not missing and not extra, f"{name}: missing={missing[:8]} extra={extra[:8]}"
    for k in es:
        assert cs[k] == es[k], f"{name}: {k} shape {cs[k]} != {es[k]}"


def test_unet_port_roundtrip(tiny_params):
    converted = convert_unet(_fake_unet_sd(tiny_params["unet"]))
    _assert_same_tree(converted, tiny_params["unet"], "unet")
    # values: pick a conv kernel and a dense kernel, check transpose carried
    a = converted["encoder"]["conv_in"]["kernel"]
    b = tiny_params["unet"]["encoder"]["conv_in"]["kernel"]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_controlnet_port_roundtrip(tiny_params):
    converted = convert_controlnet(_fake_controlnet_sd(tiny_params["controlnet"]))
    _assert_same_tree(converted, tiny_params["controlnet"], "controlnet")


def test_vae_port_roundtrip(tiny_params):
    converted = convert_vae(_fake_vae_sd(tiny_params["vae"]))
    _assert_same_tree(converted, tiny_params["vae"], "vae")


def test_clip_vision_port_roundtrip():
    import jax.numpy as jnp

    from gaussctrl_tpu.diffusion.clip import CLIPVisionConfig, CLIPVisionModel
    from gaussctrl_tpu.diffusion.weights import convert_clip_vision

    cfg = CLIPVisionConfig.tiny()
    model = CLIPVisionModel(cfg)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, cfg.image_size, cfg.image_size, 3))
                        )["params"]
    sd = {}
    for path, arr in _flatten(params):
        arr = np.asarray(arr)
        if path == "class_embedding":
            sd["vision_model.embeddings.class_embedding"] = arr
        elif path == "patch_embedding/kernel":
            sd["vision_model.embeddings.patch_embedding.weight"] = (
                arr.transpose(3, 2, 0, 1))
        elif path == "position_embedding":
            sd["vision_model.embeddings.position_embedding.weight"] = arr
        elif path.startswith("layers_"):
            k, v = _torchify(path, arr, False)
            k = re.sub(r"(layers\.\d+\.)(fc[12]\.)", r"\1mlp.\2", k)
            sd["vision_model.encoder." + k] = v
        else:  # pre_layrnorm / post_layernorm
            k, v = _torchify(path, arr, False)
            sd["vision_model." + k] = v
    converted = convert_clip_vision(sd)
    _assert_same_tree(converted, params, "clip_vision")
    out = model.apply({"params": jax.tree_util.tree_map(jnp.asarray, converted)},
                      jnp.ones((1, cfg.image_size, cfg.image_size, 3)))
    ref = model.apply({"params": params},
                      jnp.ones((1, cfg.image_size, cfg.image_size, 3)))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_clip_port_roundtrip(tiny_params):
    converted = convert_clip_text(_fake_clip_sd(tiny_params["text"]))
    _assert_same_tree(converted, tiny_params["text"], "text")
    np.testing.assert_allclose(
        np.asarray(converted["layers_0"]["self_attn"]["q_proj"]["kernel"]),
        np.asarray(tiny_params["text"]["layers_0"]["self_attn"]["q_proj"]["kernel"]))
