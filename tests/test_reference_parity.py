"""Numerical parity vs the reference PyTorch model.

Builds the reference PDVC on CPU (contrastive off, no downloads), imports its
state_dict through gvl_tpu.train.checkpoint.import_pytorch_state_dict, runs
both models on identical inputs, and compares encoder memory, decoder states,
head outputs, and caption-head logprobs. This is the rebuild's checkpoint-
compatibility proof (SURVEY.md §5.4 / BASELINE.md parity procedure).
"""

import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo/tools")

pytestmark = pytest.mark.skipif(
    not os.path.exists("/root/reference"),
    reason="reference repo not mounted (parity oracle unavailable)")

from gvl_tpu.config import Config
from gvl_tpu.models import build_model
from gvl_tpu.train.checkpoint import import_pytorch_state_dict


@pytest.fixture(scope="module")
def both_models():
    from reference_shim import install_reference_shims, reference_opt
    install_reference_shims()
    import torch
    from pdvc.pdvc import build as ref_build

    torch.manual_seed(0)
    opt = reference_opt()
    ref_model, *_ = ref_build(opt)
    ref_model.eval()

    cfg = Config()
    cfg.update(dict(
        hidden_dim=512, nheads=8, enc_layers=2, dec_layers=2,
        transformer_ff_dim=64, num_feature_levels=3, num_queries=8,
        feature_dim=16, frame_embedding_num=24, vocab_size=50,
        input_encoding_size=32, rnn_size=512, att_hid_size=16,
        max_caption_len=8, cap_nheads=1, cap_num_feature_levels=3,
        cap_dec_n_points=4, with_box_refine=1, enable_contrastive=False,
        caption_decoder_type="standard", max_eseq_length=6,
        transformer_dropout_prob=0.0, drop_prob=0.0, msda_impl="ref"))
    model = build_model(cfg)

    rng = np.random.RandomState(0)
    B, T, D = 2, 24, 16
    feats = rng.randn(B, T, D).astype(np.float32)
    duration = np.array([40.0, 70.0], np.float32)

    params = model.init(
        jax.random.PRNGKey(0), jnp.asarray(feats), jnp.ones((B, T), bool),
        jnp.asarray(duration),
        captions=jnp.zeros((B, 3, cfg.max_caption_len), jnp.int32),
        method=model.init_all)

    sd = {k: v.numpy() for k, v in ref_model.state_dict().items()}
    params2, unused, unfilled = import_pytorch_state_dict(
        sd, params, n_heads=cfg.nheads, share_caption_head=True)
    return ref_model, model, cfg, params2, feats, duration, unused, unfilled


def test_import_covers_everything(both_models):
    *_, unused, unfilled = both_models
    assert unused == [], f"unused torch keys: {unused}"
    assert unfilled == [], f"unfilled flax keys: {unfilled}"


def test_trunk_forward_parity(both_models):
    ref_model, model, cfg, params, feats, duration, *_ = both_models
    import torch

    B, T, _ = feats.shape
    with torch.no_grad():
        vf = torch.from_numpy(feats)
        pad_mask = torch.zeros(B, T, dtype=torch.bool)   # True = padding
        dur = torch.from_numpy(duration)
        srcs, masks, poses = ref_model.base_encoder(vf, pad_mask, dur)
        (src_flat, shapes_t, lsi, vr, pos_flat,
         mask_flat) = ref_model.transformer.prepare_encoder_inputs(
            srcs, masks, poses)
        memory_t = ref_model.transformer.forward_encoder(
            src_flat, shapes_t, lsi, vr, pos_flat, mask_flat)
        qe = ref_model.query_embed.weight
        pmask = torch.ones(B, qe.shape[0]).bool()
        init_ref, tgt, ref_pts, qpos = \
            ref_model.transformer.prepare_decoder_input_query(memory_t, qe)
        hs_t, inter_refs = ref_model.transformer.forward_decoder(
            tgt, ref_pts, memory_t, shapes_t, lsi, vr, qpos, mask_flat,
            pmask, False)
        logits_t, coords_t, counts_t = [], [], []
        for l in range(hs_t.shape[0]):
            reference = init_ref if l == 0 else inter_refs[l - 1]
            logits_t.append(ref_model.class_head[l](hs_t[l]))
            counts_t.append(ref_model.count_head[l](hs_t[l].max(1)[0]))
            tmp = ref_model.bbox_head[l](hs_t[l])
            from misc.detr_utils.misc import inverse_sigmoid as inv_sig
            r = inv_sig(reference)
            if reference.shape[-1] == 1:
                tmp[..., :1] += r
            else:
                tmp += r
            coords_t.append(tmp.sigmoid())

    out = model.apply(params, jnp.asarray(feats), jnp.ones((B, T), bool),
                      jnp.asarray(duration))

    np.testing.assert_allclose(np.asarray(out["memory"]), memory_t.numpy(),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(out["hs"]), hs_t.numpy(),
                               rtol=2e-4, atol=2e-5)
    for l in range(cfg.dec_layers):
        np.testing.assert_allclose(np.asarray(out["pred_logits"][l]),
                                   logits_t[l].numpy(), rtol=1e-3, atol=1e-4)
        np.testing.assert_allclose(np.asarray(out["pred_boxes"][l]),
                                   coords_t[l].numpy(), rtol=1e-3, atol=1e-4)
        np.testing.assert_allclose(np.asarray(out["pred_count"][l]),
                                   counts_t[l].numpy(), rtol=1e-3, atol=1e-4)


def test_caption_head_parity(both_models):
    ref_model, model, cfg, params, feats, duration, *_ = both_models
    import torch

    B, T, _ = feats.shape
    Ne, Lc = 3, cfg.max_caption_len
    rng = np.random.RandomState(1)
    seq = rng.randint(1, cfg.vocab_size, (B, Ne, Lc)).astype(np.int64)
    seq[:, :, 0] = 0  # BOS

    out = model.apply(params, jnp.asarray(feats), jnp.ones((B, T), bool),
                      jnp.asarray(duration))
    query = out["hs"][-1][:, :Ne]
    reference = out["layer_refs"][-1][:, :Ne]
    shapes = tuple(cfg.temporal_shapes(T))

    lp_jax = model.apply(params, cfg.dec_layers - 1, query, reference,
                         out["memory"], out["mask_flat"], shapes,
                         out["valid_ratios"], jnp.asarray(seq.astype(np.int32)),
                         method=model.caption_train)

    with torch.no_grad():
        others = {
            "memory": torch.from_numpy(np.asarray(out["memory"])),
            "mask_flatten": torch.zeros(
                B, sum(shapes), dtype=torch.bool),     # True = padding
            "spatial_shapes": torch.tensor(list(shapes), dtype=torch.long),
            "level_start_index": torch.tensor(
                np.cumsum([0] + list(shapes))[:-1], dtype=torch.long),
            "valid_ratios": torch.from_numpy(np.asarray(out["valid_ratios"])),
        }
        cap_head = ref_model.caption_head[-1]
        lp_t = cap_head(
            torch.from_numpy(np.asarray(query)),
            torch.from_numpy(np.asarray(reference)), others,
            torch.from_numpy(seq.reshape(B * Ne, Lc)))

    lp_jax_flat = np.asarray(lp_jax).reshape(B * Ne, Lc - 1, -1)
    np.testing.assert_allclose(lp_jax_flat, lp_t.numpy(), rtol=2e-3, atol=2e-4)
