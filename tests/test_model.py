"""Shape/numerics tests for the GVL model trunk, text head, and captioners."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gvl_tpu.config import Config
from gvl_tpu.models import build_model


def tiny_cfg(**kw):
    cfg = Config()
    cfg.update(dict(
        hidden_dim=64, nheads=4, enc_layers=2, dec_layers=2,
        transformer_ff_dim=64, num_feature_levels=3, num_queries=10,
        frame_embedding_num=24, vocab_size=50, input_encoding_size=32,
        rnn_size=32, att_hid_size=32, max_caption_len=8,
        cap_nheads=1, cap_num_feature_levels=3, cap_dec_n_points=4,
        with_box_refine=1, enable_contrastive=True, contrastive_hidden_size=16,
        max_eseq_length=6, caption_decoder_type="standard",
        msda_impl="ref",
    ))
    cfg.update(kw)
    return cfg


def make_batch(rng, cfg, B=2, G=3):
    T = cfg.frame_embedding_num
    D = cfg.feature_dim = 32
    feats = jnp.asarray(rng.randn(B, T, D).astype(np.float32))
    mask = jnp.ones((B, T), dtype=bool)
    duration = jnp.asarray(rng.uniform(10, 100, (B,)).astype(np.float32))
    return feats, mask, duration


def test_trunk_shapes(rng):
    cfg = tiny_cfg()
    model = build_model(cfg, text_hidden_dim=48)
    feats, mask, duration = make_batch(rng, cfg)
    params = model.init(jax.random.PRNGKey(0), feats, mask, duration)
    out = model.apply(params, feats, mask, duration)

    B, Nq, Ld = 2, cfg.num_queries, cfg.dec_layers
    S = sum(cfg.temporal_shapes())
    assert out["pred_logits"].shape == (Ld, B, Nq, cfg.num_classes)
    assert out["pred_boxes"].shape == (Ld, B, Nq, 2)
    assert out["pred_count"].shape == (Ld, B, cfg.max_eseq_length + 1)
    assert out["event_embed"].shape == (Ld, B, Nq, 16)
    assert out["memory"].shape == (B, S, cfg.hidden_dim)
    assert bool(jnp.all(jnp.isfinite(out["pred_boxes"])))
    # boxes are sigmoided
    assert float(out["pred_boxes"].min()) >= 0.0
    assert float(out["pred_boxes"].max()) <= 1.0


def test_trunk_two_stage(rng):
    cfg = tiny_cfg()
    model = build_model(cfg, text_hidden_dim=48)
    feats, mask, duration = make_batch(rng, cfg)
    G = 4
    props = jnp.asarray(rng.uniform(0.2, 0.8, (2, G, 2)).astype(np.float32))
    pmask = jnp.asarray(rng.rand(2, G) > 0.3)
    params = model.init(jax.random.PRNGKey(0), feats, mask, duration,
                        proposals=props, proposals_mask=pmask,
                        disable_iterative_refine=True)
    out = model.apply(params, feats, mask, duration, proposals=props,
                      proposals_mask=pmask, disable_iterative_refine=True)
    assert out["pred_boxes"].shape == (cfg.dec_layers, 2, G, 2)
    np.testing.assert_allclose(np.asarray(out["pred_boxes"][0]),
                               np.asarray(props), rtol=1e-6)


def test_text_and_caption_heads(rng):
    cfg = tiny_cfg()
    model = build_model(cfg, text_hidden_dim=48)
    feats, mask, duration = make_batch(rng, cfg)
    params = model.init(jax.random.PRNGKey(0), feats, mask, duration)
    out = model.apply(params, feats, mask, duration)

    B, G, Ltok = 2, 3, 7
    word = jnp.asarray(rng.randn(B, G, Ltok, 48).astype(np.float32))
    tmask = jnp.ones((B, G, Ltok), dtype=bool)
    smask = jnp.ones((B, G), dtype=bool)
    # init text params too (separate method => extend param tree)
    tparams = model.init(jax.random.PRNGKey(1), word, tmask, smask,
                         method=model.encode_text)
    text = model.apply(tparams, word, tmask, smask, method=model.encode_text)
    assert text["final"].shape == (B, G, 16)

    shapes = tuple(cfg.temporal_shapes())
    Lc = cfg.max_caption_len
    seq = jnp.asarray(rng.randint(0, 50, (B, G, Lc)).astype(np.int32))
    query = out["hs"][-1][:, :G]
    refb = out["layer_refs"][-1][:, :G]
    cparams = model.init(
        jax.random.PRNGKey(2), 0, query, refb, out["memory"],
        out["mask_flat"], shapes, out["valid_ratios"], seq,
        method=model.caption_train)
    lp = model.apply(cparams, 0, query, refb, out["memory"], out["mask_flat"],
                     shapes, out["valid_ratios"], seq,
                     method=model.caption_train)
    assert lp.shape == (B, G, Lc - 1, cfg.vocab_size + 1)
    # logprobs normalized
    np.testing.assert_allclose(np.asarray(jnp.exp(lp).sum(-1)), 1.0, atol=1e-4)

    toks, lps = model.apply(cparams, 0, query, refb, out["memory"],
                            out["mask_flat"], shapes, out["valid_ratios"],
                            method=model.caption_sample)
    assert toks.shape == (B, G, Lc)
    assert lps.shape == (B, G, Lc)
    # EOS masking: after a zero token, everything stays zero
    t = np.asarray(toks)
    for b in range(B):
        for g in range(G):
            row = t[b, g]
            if (row == 0).any():
                first = int(np.argmax(row == 0))
                assert (row[first:] == 0).all()


def test_shared_caption_head_params(rng):
    cfg = tiny_cfg()
    model = build_model(cfg, text_hidden_dim=48)
    feats, mask, duration = make_batch(rng, cfg)
    params = model.init(jax.random.PRNGKey(0), feats, mask, duration)
    names = list(params["params"].keys())
    # exactly one caption head module when share_caption_head
    cap_names = [n for n in names if n.startswith("caption_head")]
    assert cap_names == ["caption_head_0"] or cap_names == []
    # cloned bbox heads when with_box_refine
    bbox_names = sorted(n for n in names if n.startswith("bbox_head"))
    assert bbox_names == [f"bbox_head_{i}" for i in range(cfg.dec_layers)]
