"""Text-side oracle parity with contrastive ON (VERDICT r2 missing #3):
the word-level attention pool, sentence-level context block (BertEncoder),
contrastive text/event projections, and background embedding are compared
against the reference torch modules (pdvc.py:211-248 text_encoding,
pdvc.py:1092-1163 context models) through the checkpoint importer, on
identical inputs. The HF text encoder itself is stubbed on the torch side —
both sides consume the same word embeddings, which is exactly the boundary
our design draws (the bundle computes word embeddings outside the model).
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

TEXT_D = 24            # divisible by 12 (the reference BertConfig head count)
CL_D = 20
B, G, LTOK = 2, 4, 6
SIZES = [2, 4]


def _shared_opt(**kw):
    base = dict(
        enable_contrastive=True,
        enable_word_context_modeling=True,
        word_context_modeling_type="attention_pool",
        enable_layer_diff_text_feature=True,
        enable_sentence_context_modeling=True,
        enable_sentence_pos_embedding=True,
        sentence_pos_embedding_type="cosine",
        max_pos_num=50, sentence_modeling_layer_num=1,
        enable_cross_model_fusion=False,
        enable_multilayer_projection=False,
        disable_cl_proj_layer_share_weight=False,
        contrastive_hidden_size=CL_D,
        enable_e2t_cl=True, enable_bg_for_cl=False,
        enable_cross_video_cl=True,
        text_encoder_learning_strategy="frozen",
        train_use_amp=False, eval_use_amp=False,
    )
    base.update(kw)
    return base


class _StubTextEncoder:
    """Minimal stand-in for the HF model: fixed last_hidden_state."""

    class _Cfg:
        hidden_size = TEXT_D

    config = _Cfg()

    def __init__(self):
        self.out = None

    def __call__(self, **kw):
        import torch

        class Out:
            pass

        o = Out()
        o.last_hidden_state = self.out
        return o


@pytest.fixture(scope="module")
def world():
    from reference_shim import install_reference_shims, reference_opt
    install_reference_shims()
    import torch
    from pdvc.pdvc import PDVC, build_base_encoder
    from pdvc.deformable_transformer import build_deforamble_transformer
    from pdvc.CaptioningHead import build_captioner

    torch.manual_seed(0)
    opt = reference_opt(**_shared_opt())
    ref_model = PDVC(build_base_encoder(opt), _StubTextEncoder(),
                     build_deforamble_transformer(opt), build_captioner(opt),
                     num_classes=opt.num_classes, num_queries=opt.num_queries,
                     num_feature_levels=opt.num_feature_levels,
                     aux_loss=opt.aux_loss, with_box_refine=opt.with_box_refine,
                     opt=opt)
    ref_model.eval()

    cfg = Config()
    cfg.update(dict(
        hidden_dim=512, nheads=8, enc_layers=2, dec_layers=2,
        transformer_ff_dim=64, num_feature_levels=3, num_queries=8,
        feature_dim=16, frame_embedding_num=24, vocab_size=50,
        input_encoding_size=32, rnn_size=512, att_hid_size=16,
        max_caption_len=8, cap_nheads=1, cap_num_feature_levels=3,
        cap_dec_n_points=4, with_box_refine=1,
        caption_decoder_type="standard", max_eseq_length=6,
        transformer_dropout_prob=0.0, drop_prob=0.0, msda_impl="ref",
        max_text_input_len=LTOK, **_shared_opt()))
    model = build_model(cfg, text_hidden_dim=TEXT_D)

    rng = np.random.RandomState(0)
    T = 24
    feats = rng.randn(B, T, cfg.feature_dim).astype(np.float32)
    duration = np.array([40.0, 70.0], np.float32)
    word = rng.randn(B, G, LTOK, TEXT_D).astype(np.float32)
    token_mask = rng.rand(B, G, LTOK) < 0.8
    token_mask[..., 0] = True
    gt_mask = np.arange(G)[None, :] < np.asarray(SIZES)[:, None]

    params = model.init(
        jax.random.PRNGKey(0), jnp.asarray(feats), jnp.ones((B, T), bool),
        jnp.asarray(duration),
        captions=jnp.zeros((B, G, cfg.max_caption_len), jnp.int32),
        word_embed=jnp.asarray(word), token_mask=jnp.asarray(token_mask),
        gt_mask=jnp.asarray(gt_mask), method=model.init_all)

    sd = {k: v.numpy() for k, v in ref_model.state_dict().items()}
    params2, unused, unfilled = import_pytorch_state_dict(
        sd, params, n_heads=cfg.nheads, share_caption_head=True)
    return (ref_model, model, cfg, params2, feats, duration, word,
            token_mask, gt_mask, unused, unfilled)


def test_contrastive_import_covers_everything(world):
    *_, unused, unfilled = world
    assert unused == [], f"unused torch keys: {unused}"
    assert unfilled == [], f"unfilled flax keys: {unfilled}"


def test_text_encoding_parity(world):
    (ref_model, model, cfg, params, feats, duration, word, token_mask,
     gt_mask, *_), = [world]
    import torch

    T = feats.shape[1]
    out = model.apply(params, jnp.asarray(feats), jnp.ones((B, T), bool),
                      jnp.asarray(duration))
    memory = np.asarray(out["memory"])                       # (B, S, C)

    # reference path: flat ragged captions
    flat_word, flat_tok = [], []
    for b, n in enumerate(SIZES):
        flat_word.append(word[b, :n])
        flat_tok.append(token_mask[b, :n])
    flat_word = np.concatenate(flat_word)                    # (ncap, L, D)
    flat_tok = np.concatenate(flat_tok).astype(np.float32)

    ref_model.text_encoder.out = torch.from_numpy(flat_word)
    with torch.no_grad():
        (text_embed, word_embed_t, cross_scores,
         pre_proj) = ref_model.text_encoding(
            {"input_ids": torch.zeros(len(flat_word), LTOK, dtype=torch.long),
             "attention_mask": torch.from_numpy(flat_tok)},
            gt_cap_num=SIZES, memory=torch.from_numpy(memory))
    ref_aux, ref_final = text_embed                          # lists per video

    ours = model.apply(
        params, jnp.asarray(word), jnp.asarray(token_mask),
        jnp.asarray(gt_mask), out["memory"], out["mask_flat"],
        deterministic=True, method=model.encode_text)

    for b, n in enumerate(SIZES):
        np.testing.assert_allclose(
            np.asarray(ours["aux"])[b, :n], ref_aux[b].numpy(),
            rtol=2e-4, atol=2e-5, err_msg=f"aux video {b}")
        np.testing.assert_allclose(
            np.asarray(ours["final"])[b, :n], ref_final[b].numpy(),
            rtol=2e-4, atol=2e-5, err_msg=f"final video {b}")


def test_full_contrastive_loss_parity(world):
    """End-to-end: trunk + text + matcher + SetCriterion + contrastive —
    every loss key of the weight dict matches the reference stack on one
    fixed batch (the 'full train-step loss-delta' check of VERDICT item 2,
    modulo the caption head which test_caption_head_parity covers)."""
    (ref_model, model, cfg, params, feats, duration, word, token_mask,
     gt_mask, *_), = [world]
    import torch
    from pdvc.matcher import build_matcher
    from pdvc.criterion import ContrastiveCriterion, SetCriterion
    from reference_shim import reference_opt

    rng = np.random.RandomState(3)
    gt_boxes = rng.uniform(0.2, 0.8, (B, G, 2)).astype(np.float32)
    gt_labels = np.zeros((B, G), np.int64)

    opt = reference_opt(**_shared_opt(), set_cost_cl=1.5, set_cost_class=2.0,
                        set_cost_bbox=5.0, set_cost_giou=4.0)
    matcher = build_matcher(opt)
    criterion = SetCriterion(1, matcher, {}, ["labels", "boxes",
                                              "cardinality"],
                             0.25, 2.0, opt)
    ccrit = ContrastiveCriterion(0.1, opt.enable_cross_video_cl,
                                 opt.enable_e2t_cl, opt.enable_bg_for_cl)

    T = feats.shape[1]
    out = model.apply(params, jnp.asarray(feats), jnp.ones((B, T), bool),
                      jnp.asarray(duration))
    ours_text = model.apply(
        params, jnp.asarray(word), jnp.asarray(token_mask),
        jnp.asarray(gt_mask), out["memory"], out["mask_flat"],
        deterministic=True, method=model.encode_text)

    Ld = cfg.dec_layers
    from gvl_tpu.train.criterion import LossSpec, compute_criterion
    spec = LossSpec(set_cost_class=2.0, set_cost_bbox=5.0, set_cost_giou=4.0,
                    set_cost_cl=1.5, matcher_impl="scipy",
                    enable_cross_video_cl=True, enable_e2t_cl=True,
                    enable_bg_for_cl=False, temperature=0.1)
    text_layers = [ours_text["aux"]] * (Ld - 1) + [ours_text["final"]]
    losses, _ = compute_criterion(
        out, jnp.asarray(gt_boxes), jnp.asarray(gt_labels.astype(np.int32)),
        jnp.asarray(gt_mask), text_layers, spec)

    # reference side consumes the SAME trunk AND text tensors (trunk parity
    # and text_encoding parity are proven separately; reusing our text
    # embeddings keeps the matcher costs bit-identical so discontinuous
    # assignment flips can't mask criterion-math differences)
    with torch.no_grad():
        text_per_layer = []
        for l in range(Ld):
            src = ours_text["aux"] if l < Ld - 1 else ours_text["final"]
            text_per_layer.append(
                [torch.as_tensor(np.asarray(src)[b, :n].copy())
                 for b, n in enumerate(SIZES)])

        targets = [{"labels": torch.as_tensor(gt_labels[b, :n]),
                    "boxes": torch.as_tensor(gt_boxes[b, :n])}
                   for b, n in enumerate(SIZES)]

        def mk(l):
            text_flat = torch.cat(list(text_per_layer[l]), dim=0)
            ev_flat = torch.as_tensor(
                np.asarray(out["event_embed"][l]).reshape(-1, CL_D))
            cl_mat = ccrit.forward_logits(
                text_flat, ev_flat,
                torch.as_tensor(np.asarray(out["background_embed"]))).t()
            return {"pred_logits": torch.as_tensor(
                        np.asarray(out["pred_logits"][l])),
                    "pred_boxes": torch.as_tensor(
                        np.asarray(out["pred_boxes"][l])),
                    "pred_count": torch.as_tensor(
                        np.asarray(out["pred_count"][l])),
                    "cl_match_mats": cl_mat}

        outputs = mk(Ld - 1)
        outputs["aux_outputs"] = [mk(l) for l in range(Ld - 1)]
        ref_losses, last_idx, aux_idx = criterion(outputs, targets)
        for l in range(Ld):
            idx = last_idx[0] if l == Ld - 1 else aux_idx[l][0]
            cl = ccrit(list(text_per_layer[l]),
                       torch.as_tensor(np.asarray(out["event_embed"][l])),
                       idx, bg_embed=torch.as_tensor(
                           np.asarray(out["background_embed"])))
            ref_losses["contrastive_loss" + ("" if l == Ld - 1 else f"_{l}")] \
                = cl

    keys = ["loss_ce", "loss_counter", "loss_bbox", "loss_giou",
            "loss_self_iou", "cardinality_error", "contrastive_loss"]
    for suffix in [""] + [f"_{l}" for l in range(Ld - 1)]:
        for k in keys:
            np.testing.assert_allclose(
                float(losses[k + suffix]), float(ref_losses[k + suffix]),
                rtol=5e-4, atol=5e-5, err_msg=k + suffix)
