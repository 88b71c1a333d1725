"""GroundingDINO port: shapes, masks, deformable sampling, weight mapping."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaussctrl_tpu.seg.dino import (
    DinoConfig, DinoBoxProposer, GroundingDINO, WordPieceTokenizer,
    deform_sample, phrase_masks,
)
from gaussctrl_tpu.seg.dino_weights import convert_dino


CFG = DinoConfig.tiny()


def _text_inputs(t=None):
    t = t or CFG.max_text_len
    ids = np.zeros((1, t), np.int32)
    ids[0, :5] = [1, 10, 11, 2, 1]          # cls, tok, tok, ".", sep-ish
    attn, pos = phrase_masks(ids, special=(1, 2))
    attn = attn | np.eye(t, dtype=bool)
    mask = np.zeros((1, t), bool)
    mask[0, :5] = True
    return ids, pos.astype(np.int32), attn, mask


@pytest.fixture(scope="module")
def model_and_params():
    model = GroundingDINO(CFG)
    im = jnp.zeros((1, CFG.img_size, CFG.img_size, 3))
    ids, pos, attn, mask = _text_inputs()
    params = model.init(jax.random.PRNGKey(0), im, ids, pos, attn, mask)
    return model, params["params"]


@pytest.mark.slow
def test_forward_shapes(model_and_params):
    model, params = model_and_params
    im = jax.random.uniform(jax.random.PRNGKey(1),
                            (2, CFG.img_size, CFG.img_size, 3))
    ids, pos, attn, mask = _text_inputs()
    r = lambda x: np.repeat(x, 2, 0)
    logits, boxes = model.apply({"params": params}, im, r(ids), r(pos),
                                r(attn), r(mask))
    assert logits.shape == (2, CFG.num_queries, CFG.max_text_len)
    assert boxes.shape == (2, CFG.num_queries, 4)
    assert np.isfinite(np.asarray(boxes)).all()
    b = np.asarray(boxes)
    assert (b >= 0).all() and (b <= 1).all()        # sigmoid space
    # padded text tokens must be masked out of the logits
    assert np.asarray(logits)[:, :, 10:].max() < -1e8


def test_phrase_masks_blocks_cross_phrase():
    # [CLS] a b . c d [SEP]  (specials: 101 cls, 102 sep, 1012 ".")
    ids = np.array([[101, 5, 6, 1012, 7, 8, 102, 0]])
    mask, pos = phrase_masks(ids, special=(101, 102, 1012))
    # a attends b (same phrase) but not c (next phrase)
    assert mask[0, 1, 2] and not mask[0, 1, 4]
    assert mask[0, 4, 5]
    # specials attend only themselves
    assert mask[0, 0, 0] and not mask[0, 0, 1]
    # position ids restart per phrase (GroundingDINO: arange(0, seg_len)
    # over the segment INCLUDING its closing special)
    assert pos[0, 1] == 0 and pos[0, 2] == 1 and pos[0, 3] == 2
    assert pos[0, 4] == 0 and pos[0, 5] == 1


def test_deform_sample_matches_manual_bilinear():
    # one level 4x4, one head, one point: compare against direct bilinear
    h = w = 4
    rng = np.random.default_rng(0)
    val = rng.normal(size=(1, h * w, 1, 3)).astype(np.float32)
    loc = np.array([[[[[[0.6, 0.4]]]]]], np.float32)      # [1,1,1,1,1,2]
    wgt = np.ones((1, 1, 1, 1, 1), np.float32)
    out = deform_sample(jnp.asarray(val), [(h, w)], jnp.asarray(loc),
                        jnp.asarray(wgt))
    x, y = 0.6 * w - 0.5, 0.4 * h - 0.5
    x0, y0 = int(np.floor(x)), int(np.floor(y))
    wx, wy = x - x0, y - y0
    grid = val.reshape(h, w, 3)
    expect = (grid[y0, x0] * (1 - wx) * (1 - wy) +
              grid[y0, x0 + 1] * wx * (1 - wy) +
              grid[y0 + 1, x0] * (1 - wx) * wy +
              grid[y0 + 1, x0 + 1] * wx * wy)
    np.testing.assert_allclose(np.asarray(out)[0, 0], expect, atol=1e-5)


def test_deform_sample_zero_outside():
    val = jnp.ones((1, 16, 1, 2))
    loc = jnp.asarray([[[[[[2.0, 2.0]]]]]])               # far outside
    wgt = jnp.ones((1, 1, 1, 1, 1))
    out = deform_sample(val, [(4, 4)], loc, wgt)
    np.testing.assert_allclose(np.asarray(out), 0.0)


def _fake_torch_sd():
    """Torch-style state dict with the tiny config's exact names/shapes."""
    c = CFG
    sd = {}
    r = np.random.default_rng(0)
    A = lambda *s: r.normal(size=s).astype(np.float32) * 0.02

    def lin(k, o, i, bias=True):
        sd[k + ".weight"] = A(o, i)
        if bias:
            sd[k + ".bias"] = A(o)

    def ln(k, d):
        sd[k + ".weight"] = np.ones(d, np.float32)
        sd[k + ".bias"] = np.zeros(d, np.float32)

    def mha(k, d):
        sd[k + ".in_proj_weight"] = A(3 * d, d)
        sd[k + ".in_proj_bias"] = A(3 * d)
        lin(k + ".out_proj", d, d)

    def deform(k, d):
        nl, nh, npt = c.num_levels, c.nheads, c.num_points
        lin(k + ".sampling_offsets", nh * nl * npt * 2, d)
        lin(k + ".attention_weights", nh * nl * npt, d)
        lin(k + ".value_proj", d, d)
        lin(k + ".output_proj", d, d)

    # swin
    sd["backbone.0.patch_embed.proj.weight"] = A(c.swin_dim, 3, 4, 4)
    sd["backbone.0.patch_embed.proj.bias"] = A(c.swin_dim)
    ln("backbone.0.patch_embed.norm", c.swin_dim)
    for s, depth in enumerate(c.swin_depths):
        dim = c.swin_dim * 2 ** s
        for b in range(depth):
            t = f"backbone.0.layers.{s}.blocks.{b}"
            ln(t + ".norm1", dim)
            ln(t + ".norm2", dim)
            sd[t + ".attn.relative_position_bias_table"] = A(
                (2 * c.window - 1) ** 2, c.swin_heads[s])
            lin(t + ".attn.qkv", 3 * dim, dim)
            lin(t + ".attn.proj", dim, dim)
            lin(t + ".mlp.fc1", 4 * dim, dim)
            lin(t + ".mlp.fc2", dim, 4 * dim)
        if s < len(c.swin_depths) - 1:
            lin(f"backbone.0.layers.{s}.downsample.reduction",
                2 * dim, 4 * dim, bias=False)
            ln(f"backbone.0.layers.{s}.downsample.norm", 4 * dim)
    for s in c.out_indices:
        ln(f"backbone.0.norm{s}", c.swin_dim * 2 ** s)
    # input projections
    chans = [c.swin_dim * 2 ** s for s in c.out_indices]
    for i, ch in enumerate(chans):
        sd[f"input_proj.{i}.0.weight"] = A(c.d_model, ch, 1, 1)
        sd[f"input_proj.{i}.0.bias"] = A(c.d_model)
        ln(f"input_proj.{i}.1", c.d_model)
    sd[f"input_proj.{len(chans)}.0.weight"] = A(c.d_model, chans[-1], 3, 3)
    sd[f"input_proj.{len(chans)}.0.bias"] = A(c.d_model)
    ln(f"input_proj.{len(chans)}.1", c.d_model)
    # bert
    sd["bert.embeddings.word_embeddings.weight"] = A(c.vocab_size,
                                                     c.bert_hidden)
    sd["bert.embeddings.position_embeddings.weight"] = A(512, c.bert_hidden)
    sd["bert.embeddings.token_type_embeddings.weight"] = A(2, c.bert_hidden)
    ln("bert.embeddings.LayerNorm", c.bert_hidden)
    for i in range(c.bert_layers):
        t = f"bert.encoder.layer.{i}"
        for n in ("query", "key", "value"):
            lin(f"{t}.attention.self.{n}", c.bert_hidden, c.bert_hidden)
        lin(f"{t}.attention.output.dense", c.bert_hidden, c.bert_hidden)
        ln(f"{t}.attention.output.LayerNorm", c.bert_hidden)
        lin(f"{t}.intermediate.dense", c.bert_ff, c.bert_hidden)
        lin(f"{t}.output.dense", c.bert_hidden, c.bert_ff)
        ln(f"{t}.output.LayerNorm", c.bert_hidden)
    lin("feat_map", c.d_model, c.bert_hidden)
    # enhancer
    sd["transformer.level_embed"] = A(c.num_levels, c.d_model)
    ed = c.dim_ff // 2
    for i in range(c.enc_layers):
        t = f"transformer.encoder.layers.{i}"
        deform(t + ".self_attn", c.d_model)
        lin(t + ".linear1", c.dim_ff, c.d_model)
        lin(t + ".linear2", c.d_model, c.dim_ff)
        ln(t + ".norm1", c.d_model)
        ln(t + ".norm2", c.d_model)
        tt = f"transformer.encoder.text_layers.{i}"
        mha(tt + ".self_attn", c.d_model)
        lin(tt + ".linear1", c.dim_ff // 2, c.d_model)
        lin(tt + ".linear2", c.d_model, c.dim_ff // 2)
        ln(tt + ".norm1", c.d_model)
        ln(tt + ".norm2", c.d_model)
        ft = f"transformer.encoder.fusion_layers.{i}"
        sd[ft + ".gamma_v"] = A(c.d_model)
        sd[ft + ".gamma_l"] = A(c.d_model)
        ln(ft + ".layer_norm_v", c.d_model)
        ln(ft + ".layer_norm_l", c.d_model)
        for n, o, inp in (("v_proj", ed, c.d_model), ("l_proj", ed, c.d_model),
                          ("values_v_proj", ed, c.d_model),
                          ("values_l_proj", ed, c.d_model),
                          ("out_v_proj", c.d_model, ed),
                          ("out_l_proj", c.d_model, ed)):
            lin(f"{ft}.attn.{n}", o, inp)
    # query selection + decoder
    lin("transformer.enc_output", c.d_model, c.d_model)
    ln("transformer.enc_output_norm", c.d_model)
    for j, (o, i_) in enumerate([(c.d_model, c.d_model),
                                 (c.d_model, c.d_model), (4, c.d_model)]):
        lin(f"transformer.enc_out_bbox_embed.layers.{j}", o, i_)
    sd["transformer.tgt_embed.weight"] = A(c.num_queries, c.d_model)
    for i in range(c.dec_layers):
        t = f"transformer.decoder.layers.{i}"
        mha(t + ".self_attn", c.d_model)
        mha(t + ".ca_text", c.d_model)
        deform(t + ".cross_attn", c.d_model)
        lin(t + ".linear1", c.dim_ff, c.d_model)
        lin(t + ".linear2", c.d_model, c.dim_ff)
        for n in ("norm1", "norm2", "norm3", "catext_norm"):
            ln(f"{t}.{n}", c.d_model)
    lin("transformer.decoder.ref_point_head.layers.0", c.d_model,
        2 * c.d_model)
    lin("transformer.decoder.ref_point_head.layers.1", c.d_model, c.d_model)
    ln("transformer.decoder.norm", c.d_model)
    for i in range(c.dec_layers):
        for j, (o, i_) in enumerate([(c.d_model, c.d_model),
                                     (c.d_model, c.d_model), (4, c.d_model)]):
            lin(f"bbox_embed.{i}.layers.{j}", o, i_)
    return sd


@pytest.mark.slow
def test_weight_conversion_structure(model_and_params):
    """convert_dino must produce exactly the flax init tree (names+shapes)."""
    model, init_params = model_and_params
    conv = convert_dino(_fake_torch_sd())
    flat_init = jax.tree_util.tree_flatten_with_path(init_params)[0]
    flat_conv = jax.tree_util.tree_flatten_with_path(conv)[0]
    paths_init = {jax.tree_util.keystr(p): v.shape for p, v in flat_init}
    paths_conv = {jax.tree_util.keystr(p): v.shape for p, v in flat_conv}
    missing = set(paths_init) - set(paths_conv)
    extra = set(paths_conv) - set(paths_init)
    assert not missing, f"converter missing params: {sorted(missing)[:10]}"
    assert not extra, f"converter extra params: {sorted(extra)[:10]}"
    bad = {k for k in paths_init if paths_init[k] != paths_conv[k]}
    assert not bad, {k: (paths_init[k], paths_conv[k]) for k in list(bad)[:5]}
    # and the converted tree actually runs
    im = jnp.zeros((1, CFG.img_size, CFG.img_size, 3))
    ids, pos, attn, mask = _text_inputs()
    conv = jax.tree_util.tree_map(jnp.asarray, conv)
    logits, boxes = model.apply({"params": conv}, im, ids, pos, attn, mask)
    assert np.isfinite(np.asarray(logits[:, :, :5])).all()


def test_tokenizer_wordpiece(tmp_path):
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", ".", "?", "bear", "pol",
             "##ar", "the"]
    vp = tmp_path / "vocab.txt"
    vp.write_text("\n".join(vocab) + "\n")
    tok = WordPieceTokenizer(str(vp))
    ids = tok.encode("The polar bear.")
    # [CLS] the pol ##ar bear . [SEP]
    assert ids == [2, 9, 7, 8, 6, 4, 3]
    assert tok.encode("zzz")[1] == 1                     # UNK


def test_tokenizer_decode_roundtrip(tmp_path):
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", ".", "?", "bear", "pol",
             "##ar", "the"]
    vp = tmp_path / "vocab.txt"
    vp.write_text("\n".join(vocab) + "\n")
    tok = WordPieceTokenizer(str(vp))
    ids = tok.encode("the polar bear.")
    assert tok.decode(ids) == "the polar bear"   # specials/punct stripped


@pytest.mark.slow
def test_langsam_predict_api(model_and_params, tmp_path):
    """The reference LangSAM.predict contract: (masks, boxes, phrases,
    logits) for all detections on one image (lang_sam.py:115-121)."""
    from gaussctrl_tpu.seg.grounding import LangSAM
    from gaussctrl_tpu.seg.sam import SAM, SAMConfig

    model, params = model_and_params
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", ".", "?", "bear"] + \
        [f"tok{i}" for i in range(40)]
    vp = tmp_path / "vocab.txt"
    vp.write_text("\n".join(vocab) + "\n")
    prop = DinoBoxProposer(model, params, WordPieceTokenizer(str(vp)))
    ls = LangSAM(SAM.create(SAMConfig.tiny()), prop)
    img = np.random.default_rng(1).uniform(size=(56, 48, 3)).astype(np.float32)
    masks, boxes, phrases, logits = ls.predict(img, "bear", box_threshold=0.0)
    k = len(boxes)
    assert masks.shape == (k, 56, 48) and len(phrases) == k == len(logits)
    assert k > 0                                  # threshold 0 keeps all
    assert (logits[:-1] >= logits[1:]).all()      # sorted by confidence
    # empty result contract: impossible threshold
    masks, boxes, phrases, logits = ls.predict(img, "bear", box_threshold=2.0)
    assert masks.shape == (0, 56, 48) and len(boxes) == 0


@pytest.mark.slow
def test_proposer_returns_boxes(model_and_params, tmp_path):
    model, params = model_and_params
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", ".", "?", "bear"] + \
        [f"tok{i}" for i in range(40)]
    vp = tmp_path / "vocab.txt"
    vp.write_text("\n".join(vocab) + "\n")
    prop = DinoBoxProposer(model, params, WordPieceTokenizer(str(vp)),
                           box_threshold=0.0)
    imgs = np.random.default_rng(0).uniform(size=(2, 40, 48, 3)
                                            ).astype(np.float32)
    boxes = prop(imgs, "bear")
    assert boxes.shape == (2, 4)
    # threshold 0 -> every view gets some box, inside the image
    assert (boxes[:, 2] > boxes[:, 0]).all()
    assert (boxes >= -24).all() and (boxes[:, 2] <= 48 + 24).all()
