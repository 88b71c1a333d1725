"""End-to-end weight load from DISK checkpoints the test writes itself.

VERDICT r1 #7: the converters were only structure-tested against in-memory
dicts; this exercises the full real-weight plumbing — torch `.bin` /
`.safetensors` files in a diffusers-style directory layout, through
`load_sd_params`, into a running forward pass — so a first real-weight run
has only numerics left to fail, not IO or naming.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaussctrl_tpu.diffusion.config import SDConfig
from gaussctrl_tpu.diffusion.sample import SDModels, eps_model
from gaussctrl_tpu.diffusion.weights import load_sd_params, load_state_dict

from tests.test_weights import (
    _fake_clip_sd, _fake_controlnet_sd, _fake_unet_sd, _fake_vae_sd,
    tiny_params,  # noqa: F401  (fixture)
)


def _save_torch_bin(path, sd):
    import torch
    torch.save({k: torch.from_numpy(np.ascontiguousarray(v))
                for k, v in sd.items()}, path)


def _save_safetensors(path, sd):
    from safetensors.numpy import save_file
    save_file({k: np.ascontiguousarray(v) for k, v in sd.items()}, path)


def _tree_allclose(a, b, path=""):
    assert sorted(a) == sorted(b), (path, sorted(a)[:5], sorted(b)[:5])
    for k in a:
        p = f"{path}/{k}"
        if isinstance(a[k], dict):
            _tree_allclose(a[k], b[k], p)
        else:
            np.testing.assert_allclose(np.asarray(a[k], np.float32),
                                       np.asarray(b[k], np.float32),
                                       atol=1e-6, err_msg=p)


@pytest.fixture(scope="module")
def fake_ckpt_dirs(tmp_path_factory, tiny_params):  # noqa: F811
    """diffusers-style SD dir + controlnet dir written from tiny params.

    unet/vae go as torch .bin; text_encoder as model.safetensors and the
    controlnet as diffusion_pytorch_model.safetensors — both IO branches
    and both naming conventions covered.
    """
    root = tmp_path_factory.mktemp("sd15_fake")
    sd_dir = root / "pipe"
    cn_dir = root / "controlnet"
    for d in ("unet", "vae", "text_encoder"):
        (sd_dir / d).mkdir(parents=True)
    cn_dir.mkdir()
    _save_torch_bin(sd_dir / "unet" / "diffusion_pytorch_model.bin",
                    _fake_unet_sd(tiny_params["unet"]))
    _save_torch_bin(sd_dir / "vae" / "diffusion_pytorch_model.bin",
                    _fake_vae_sd(tiny_params["vae"]))
    _save_safetensors(sd_dir / "text_encoder" / "model.safetensors",
                      _fake_clip_sd(tiny_params["text"]))
    _save_safetensors(cn_dir / "diffusion_pytorch_model.safetensors",
                      _fake_controlnet_sd(tiny_params["controlnet"]))
    return str(sd_dir), str(cn_dir)


def test_load_sd_params_from_disk_matches_source(fake_ckpt_dirs, tiny_params):  # noqa: F811
    sd_dir, cn_dir = fake_ckpt_dirs
    loaded = load_sd_params(sd_dir, cn_dir)
    ref = {"unet": tiny_params["unet"], "vae": tiny_params["vae"],
           "text": tiny_params["text"],
           "controlnet": tiny_params["controlnet"]}
    _tree_allclose(loaded, jax.tree_util.tree_map(np.asarray, ref))


def test_loaded_params_run_forward(fake_ckpt_dirs, tiny_params):  # noqa: F811
    """The loaded tree must be directly consumable by the eps model and
    produce the SAME output as the source params."""
    sd_dir, cn_dir = fake_ckpt_dirs
    cfg = SDConfig.tiny()
    models = SDModels.create(cfg)
    loaded = load_sd_params(sd_dir, cn_dir)
    # graft the loaded subtrees into a full param tree (scheduler-free)
    params = dict(tiny_params)
    s = cfg.sample_size
    z = jax.random.normal(jax.random.PRNGKey(1), (2, s, s, 4))
    ctx = jax.random.normal(jax.random.PRNGKey(2),
                            (2, 7, cfg.unet.cross_attention_dim))
    disp = jnp.zeros((2, s * 8, s * 8, 3))
    ref_eps = eps_model(models, params, z, jnp.int32(3), ctx, disp, 1.0)
    for k in ("unet", "vae", "text", "controlnet"):
        params[k] = jax.tree_util.tree_map(jnp.asarray, loaded[k])
    got_eps = eps_model(models, params, z, jnp.int32(3), ctx, disp, 1.0)
    np.testing.assert_allclose(np.asarray(got_eps), np.asarray(ref_eps),
                               atol=1e-5)
    assert np.abs(np.asarray(ref_eps)).max() > 0


def test_load_state_dict_stem_fallbacks(tmp_path):
    """text_encoder-style dirs use model.* / pytorch_model.bin, not the
    diffusers stem — the loader must find them."""
    d = tmp_path / "enc"
    d.mkdir()
    _save_torch_bin(d / "pytorch_model.bin", {"w": np.ones((2, 2), np.float32)})
    sd = load_state_dict(str(d), "model")
    np.testing.assert_allclose(sd["w"], np.ones((2, 2)))
    with pytest.raises(FileNotFoundError):
        load_state_dict(str(tmp_path / "nope"))
