"""CLIP similarity metrics for evaluating edits.

The reference's quality protocol (README.md:160-161) uses instruct-nerf2nerf's
CLIP metrics: *text-image similarity* (edited render vs edit prompt) and
*directional similarity* (image-delta vs caption-delta in CLIP space). Both
are implemented here on the framework's own CLIP towers so evaluation is
first-class instead of delegated.

  sim(I, T)        = cos( E_img(I), E_txt(T) )
  dir_sim          = cos( E_img(I_edit) − E_img(I_orig),
                          E_txt(T_edit) − E_txt(T_orig) )
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from gaussctrl_tpu.diffusion.clip import (
    CLIP_MEAN, CLIP_STD, CLIPTextConfig, CLIPTextModel, CLIPVisionConfig,
    CLIPVisionModel, load_tokenizer,
)


def _cos(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    a = a / jnp.linalg.norm(a, axis=-1, keepdims=True).clip(1e-8)
    b = b / jnp.linalg.norm(b, axis=-1, keepdims=True).clip(1e-8)
    return (a * b).sum(-1)


@dataclasses.dataclass
class CLIPScorer:
    """Joint-space image/text embedder over the framework's CLIP towers."""
    vision: CLIPVisionModel
    text: CLIPTextModel
    params: dict            # {"vision", "text", "visual_projection",
                            #  "text_projection"}
    tokenizer: object

    @classmethod
    def from_dir(cls, clip_dir: str | None) -> "CLIPScorer":
        vcfg = CLIPVisionConfig.vit_l14() if clip_dir else CLIPVisionConfig.tiny()
        tcfg = CLIPTextConfig.sd15() if clip_dir else CLIPTextConfig.tiny()
        vision, text = CLIPVisionModel(vcfg), CLIPTextModel(tcfg)
        if clip_dir:
            from gaussctrl_tpu.diffusion.weights import load_clip_model
            params = load_clip_model(clip_dir)
        else:
            k1, k2, k3, k4 = jax.random.split(jax.random.PRNGKey(0), 4)
            params = {
                "vision": vision.init(k1, jnp.zeros(
                    (1, vcfg.image_size, vcfg.image_size, 3)))["params"],
                "text": text.init(k2, jnp.zeros(
                    (1, tcfg.max_position_embeddings), jnp.int32))["params"],
                "visual_projection": jax.random.normal(
                    k3, (vcfg.hidden_size, vcfg.projection_dim)) * 0.05,
                "text_projection": jax.random.normal(
                    k4, (tcfg.hidden_size, vcfg.projection_dim)) * 0.05,
            }
        return cls(vision, text, params, load_tokenizer(clip_dir, tcfg))

    def embed_images(self, images01: jnp.ndarray) -> jnp.ndarray:
        """[B,H,W,3] in [0,1] -> joint-space embeddings [B,D] (CLS token)."""
        s = self.vision.cfg.image_size
        b = images01.shape[0]
        x = jax.image.resize(images01, (b, s, s, 3), method="bilinear")
        x = (x - CLIP_MEAN) / CLIP_STD
        tokens = self.vision.apply({"params": self.params["vision"]}, x)
        return tokens[:, 0] @ self.params["visual_projection"]

    def embed_texts(self, prompts: list[str]) -> jnp.ndarray:
        ids = jnp.asarray(np.stack([self.tokenizer.encode(p) for p in prompts]))
        return self.text.apply({"params": self.params["text"]}, ids,
                               self.params["text_projection"],
                               method=CLIPTextModel.embed)


def clip_similarity(scorer: CLIPScorer, images01: jnp.ndarray, prompt: str
                    ) -> float:
    """Mean cosine(edited render, edit prompt) over views."""
    ie = scorer.embed_images(images01)
    te = scorer.embed_texts([prompt])
    return float(_cos(ie, te).mean())


def clip_directional_similarity(
    scorer: CLIPScorer,
    edited01: jnp.ndarray, original01: jnp.ndarray,
    edit_prompt: str, original_prompt: str,
) -> float:
    """Mean cosine(image delta, caption delta) — the in2n protocol."""
    if edited01.shape[0] != original01.shape[0]:
        raise ValueError(
            f"directional similarity needs paired views: got "
            f"{edited01.shape[0]} edited vs {original01.shape[0]} original "
            f"images (pass view-aligned directories)")
    d_img = scorer.embed_images(edited01) - scorer.embed_images(original01)
    te = scorer.embed_texts([edit_prompt, original_prompt])
    d_txt = te[0] - te[1]
    return float(_cos(d_img, d_txt[None]).mean())
