"""CLIP ViT-L/14 text encoder (flax.linen) + offline-gated BPE tokenizer.

The prompt conditioning path of the SD pipeline the reference builds at
/root/reference/gaussctrl/gc_pipeline.py:100-107: prompts are augmented with
', best quality, extremely detailed' and paired with a fixed negative prompt;
both are tokenized to 77 tokens and encoded to [B, 77, 768] context.

CLIP specifics honored here: causal attention mask, quick-GELU activation,
final layer norm, learned position embeddings.
"""

from __future__ import annotations

import dataclasses
import functools
import gzip
import json
import os
import zlib
from typing import List, Optional

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from gaussctrl_tpu.diffusion.config import CLIPTextConfig

# Prompt augmentation used by the reference (gc_pipeline.py:104-107) —
# byte-exact, all 10 negative clauses.
POSITIVE_SUFFIX = ", best quality, extremely detailed"
NEGATIVE_PROMPT = ("longbody, lowres, bad anatomy, bad hands, missing fingers,"
                   " extra digit, fewer digits, cropped, worst quality,"
                   " low quality")


def quick_gelu(x):
    return x * nn.sigmoid(1.702 * x)


class CLIPAttention(nn.Module):
    hidden_size: int
    num_heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None):
        d = self.hidden_size // self.num_heads
        b, t, _ = x.shape
        q = nn.Dense(self.hidden_size, dtype=self.dtype, name="q_proj")(x)
        k = nn.Dense(self.hidden_size, dtype=self.dtype, name="k_proj")(x)
        v = nn.Dense(self.hidden_size, dtype=self.dtype, name="v_proj")(x)
        q = q.reshape(b, t, self.num_heads, d)
        k = k.reshape(b, t, self.num_heads, d)
        v = v.reshape(b, t, self.num_heads, d)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32) / np.sqrt(d)
        scores = scores.astype(jnp.float32)
        if mask is not None:
            scores = jnp.where(mask[None, None], scores, -1e9)
        w = nn.softmax(scores, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", w, v).reshape(b, t, self.hidden_size)
        return nn.Dense(self.hidden_size, dtype=self.dtype, name="out_proj")(out)


class CLIPLayer(nn.Module):
    hidden_size: int
    num_heads: int
    intermediate_size: int
    layer_norm_eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None):
        h = nn.LayerNorm(epsilon=self.layer_norm_eps, dtype=self.dtype,
                         name="layer_norm1")(x)
        x = x + CLIPAttention(self.hidden_size, self.num_heads,
                              dtype=self.dtype, name="self_attn")(h, mask)
        h = nn.LayerNorm(epsilon=self.layer_norm_eps, dtype=self.dtype,
                         name="layer_norm2")(x)
        h = nn.Dense(self.intermediate_size, dtype=self.dtype, name="fc1")(h)
        h = quick_gelu(h)
        return x + nn.Dense(self.hidden_size, dtype=self.dtype, name="fc2")(h)


class CLIPTextModel(nn.Module):
    cfg: CLIPTextConfig = CLIPTextConfig()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray) -> jnp.ndarray:
        """input_ids [B, T] -> last hidden state [B, T, hidden] (final-LN applied)."""
        c = self.cfg
        b, t = input_ids.shape
        tok = nn.Embed(c.vocab_size, c.hidden_size, dtype=self.dtype,
                       name="token_embedding")(input_ids)
        pos = self.param("position_embedding",
                         nn.initializers.normal(0.01),
                         (c.max_position_embeddings, c.hidden_size))
        x = tok + pos[None, :t].astype(self.dtype)
        causal = jnp.tril(jnp.ones((t, t), dtype=bool))
        for i in range(c.num_layers):
            x = CLIPLayer(c.hidden_size, c.num_heads, c.intermediate_size,
                          c.layer_norm_eps, dtype=self.dtype,
                          name=f"layers_{i}")(x, causal)
        return nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype,
                            name="final_layer_norm")(x)

    def embed(self, input_ids: jnp.ndarray, projection: jnp.ndarray
              ) -> jnp.ndarray:
        """Pooled text embedding in CLIP joint space: hidden state at the
        EOS position (highest token id) through `projection` [hidden, joint]."""
        h = self(input_ids)
        eos = jnp.argmax(input_ids, axis=-1)
        pooled = h[jnp.arange(h.shape[0]), eos]
        return pooled @ projection


@dataclasses.dataclass(frozen=True)
class CLIPVisionConfig:
    image_size: int = 224
    patch_size: int = 14
    hidden_size: int = 1024
    num_layers: int = 24
    num_heads: int = 16
    intermediate_size: int = 4096
    projection_dim: int = 768
    layer_norm_eps: float = 1e-5

    @classmethod
    def vit_l14(cls) -> "CLIPVisionConfig":
        return cls()

    @classmethod
    def tiny(cls) -> "CLIPVisionConfig":
        return cls(image_size=32, patch_size=8, hidden_size=32, num_layers=2,
                   num_heads=2, intermediate_size=64, projection_dim=16)


# CLIP image preprocessing constants (OpenAI normalization, [0,1] pixels)
CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


class CLIPVisionModel(nn.Module):
    """CLIP ViT image tower (the reference's quality-metric protocol relies on
    CLIP similarity, SURVEY.md §6; also backs the text→box proposer)."""
    cfg: CLIPVisionConfig = CLIPVisionConfig()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, images: jnp.ndarray) -> jnp.ndarray:
        """images [B, S, S, 3] CLIP-normalized -> tokens [B, 1+P, hidden]
        (post-LN applied to all tokens; token 0 is CLS)."""
        c = self.cfg
        b = images.shape[0]
        x = nn.Conv(c.hidden_size, (c.patch_size, c.patch_size),
                    strides=(c.patch_size, c.patch_size), padding="VALID",
                    use_bias=False, dtype=self.dtype,
                    name="patch_embedding")(images.astype(self.dtype))
        g = c.image_size // c.patch_size
        x = x.reshape(b, g * g, c.hidden_size)
        cls = self.param("class_embedding", nn.initializers.normal(0.02),
                         (c.hidden_size,))
        x = jnp.concatenate(
            [jnp.broadcast_to(cls[None, None], (b, 1, c.hidden_size)), x], 1)
        pos = self.param("position_embedding", nn.initializers.normal(0.02),
                         (1 + g * g, c.hidden_size))
        x = x + pos[None].astype(self.dtype)
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype,
                         name="pre_layrnorm")(x)
        for i in range(c.num_layers):
            x = CLIPLayer(c.hidden_size, c.num_heads, c.intermediate_size,
                          c.layer_norm_eps, dtype=self.dtype,
                          name=f"layers_{i}")(x)
        return nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype,
                            name="post_layernorm")(x)


# ---------------------------------------------------------------------------
# Tokenizer
# ---------------------------------------------------------------------------

def _bytes_to_unicode():
    bs = (list(range(ord("!"), ord("~") + 1)) + list(range(ord("¡"), ord("¬") + 1))
          + list(range(ord("®"), ord("ÿ") + 1)))
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


class CLIPTokenizer:
    """The CLIP byte-level BPE tokenizer (lowercase, </w> word markers).

    Requires the standard `vocab.json` + `merges.txt` files (e.g. from an HF
    tokenizer directory). Offline environments without them should use
    `HashTokenizer` — the encoder only needs *deterministic* ids for tests.
    """

    BOS = 49406
    EOS = 49407

    def __init__(self, vocab_path: str, merges_path: str, max_length: int = 77):
        opener = gzip.open if vocab_path.endswith(".gz") else open
        with opener(vocab_path, "rt", encoding="utf-8") as f:
            self.encoder = json.load(f)
        opener = gzip.open if merges_path.endswith(".gz") else open
        with opener(merges_path, "rt", encoding="utf-8") as f:
            lines = f.read().split("\n")
        merges = [tuple(l.split()) for l in lines if l and not l.startswith("#version")]
        self.bpe_ranks = dict(zip(merges, range(len(merges))))
        self.byte_encoder = _bytes_to_unicode()
        self.max_length = max_length
        self.cache = {}

    def _bpe(self, token: str) -> List[str]:
        if token in self.cache:
            return self.cache[token]
        word = tuple(token[:-1]) + (token[-1] + "</w>",)
        while len(word) > 1:
            pairs = set(zip(word[:-1], word[1:]))
            best = min(pairs, key=lambda p: self.bpe_ranks.get(p, float("inf")))
            if best not in self.bpe_ranks:
                break
            first, second = best
            new_word, i = [], 0
            while i < len(word):
                if i < len(word) - 1 and word[i] == first and word[i + 1] == second:
                    new_word.append(first + second)
                    i += 2
                else:
                    new_word.append(word[i])
                    i += 1
            word = tuple(new_word)
        self.cache[token] = list(word)
        return list(word)

    def encode(self, text: str) -> np.ndarray:
        import re
        pat = re.compile(
            r"""'s|'t|'re|'ve|'m|'ll|'d|[a-zA-Z]+|[0-9]|[^\sa-zA-Z0-9]+""",
            re.IGNORECASE)
        text = " ".join(text.lower().strip().split())
        ids = [self.BOS]
        for tok in pat.findall(text):
            tok = "".join(self.byte_encoder[b] for b in tok.encode("utf-8"))
            ids.extend(self.encoder.get(t, self.EOS - 1) for t in self._bpe(tok))
        ids = ids[: self.max_length - 1] + [self.EOS]
        ids += [self.EOS] * (self.max_length - len(ids))
        return np.asarray(ids, np.int32)


class HashTokenizer:
    """Deterministic fallback tokenizer for weight-free tests (no vocab files).

    Mirrors the real CLIP vocab's layout — BOS/EOS are the two HIGHEST ids
    (49406/49407 in the real vocab) — so `CLIPTextModel.embed`'s HF-style
    ``argmax(ids)`` pooling lands on the first EOS. Word ids come from CRC32,
    which is stable across processes (Python's built-in ``hash`` is salted
    per process, which made weight-free eval metrics nondeterministic and
    could pool two different prompts at the same pre-delta position)."""

    def __init__(self, vocab_size: int, max_length: int = 77):
        self.vocab_size = vocab_size
        self.max_length = max_length
        self.BOS = vocab_size - 2
        self.EOS = vocab_size - 1

    def encode(self, text: str) -> np.ndarray:
        words = text.lower().split()
        ids = [self.BOS] + [zlib.crc32(w.encode()) % (self.vocab_size - 2)
                            for w in words]
        ids = ids[: self.max_length - 1] + [self.EOS]
        ids += [self.EOS] * (self.max_length - len(ids))
        return np.asarray(ids, np.int32)


def load_tokenizer(model_dir: Optional[str], cfg: CLIPTextConfig):
    """CLIPTokenizer if vocab files exist under model_dir/tokenizer, else hash."""
    if model_dir:
        tok_dir = os.path.join(model_dir, "tokenizer")
        vocab = os.path.join(tok_dir, "vocab.json")
        merges = os.path.join(tok_dir, "merges.txt")
        if os.path.exists(vocab) and os.path.exists(merges):
            return CLIPTokenizer(vocab, merges, cfg.max_position_embeddings)
    return HashTokenizer(cfg.vocab_size, cfg.max_position_embeddings)
