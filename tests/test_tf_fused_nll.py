"""Parity tests for the fused teacher-forcing train path (VERDICT r4 #7):

1. the LSTM input-side hoist (tf_input_hoist): applying the ih kernel to the
   token-embedding / query segments outside the serial chain is exact up to
   f32 summation order vs the naive per-step concat+matmul;
2. teacher_forced_nll (picked-logit minus logsumexp on RAW logits, never
   materializing the normalized (B,Ne,T,V) logprob tensor) equals
   caption_nll over __call__'s normalized logprobs;
3. at train-step level, the fused path (static ss_prob=0.0) produces the
   same losses as the serial scheduled-sampling branch traced with
   ss_prob=0 (dropout off so rng-consumption order can't bite).

Reference semantics anchor: Captioner.build_loss (LSTM_DSA.py:48-52) and
the train loop's scheduled-sampling schedule (train.py:355-358).
"""

import jax
import jax.numpy as jnp
import numpy as np

from gvl_tpu.models.captioner import (LightCaptioner, LSTMDSACaptioner,
                                      caption_nll)

from tests.test_caption_heads import dsa_inputs


def _lstm_head(**kw):
    base = dict(vocab_size=40, input_encoding_size=32, rnn_size=32,
                d_model=32, n_levels=2, n_heads=2, n_points=2,
                att_hid_size=16, max_caption_len=6, drop_prob=0.0)
    base.update(kw)
    return LSTMDSACaptioner(**base)


def test_lstm_dsa_input_hoist_parity(rng):
    q, ref, mem, mmask, shapes, vr, seq = dsa_inputs(rng)
    hoist = _lstm_head(tf_input_hoist=True)
    naive = _lstm_head(tf_input_hoist=False)
    params = hoist.init(jax.random.PRNGKey(0), q, ref, mem, mmask, shapes,
                        vr, seq)
    lp_h = hoist.apply(params, q, ref, mem, mmask, shapes, vr, seq,
                       deterministic=True)
    lp_n = naive.apply(params, q, ref, mem, mmask, shapes, vr, seq,
                       deterministic=True)
    np.testing.assert_allclose(np.asarray(lp_h), np.asarray(lp_n),
                               atol=2e-5, rtol=1e-5)


def test_lstm_dsa_input_hoist_parity_scan(rng):
    q, ref, mem, mmask, shapes, vr, seq = dsa_inputs(rng)
    hoist = _lstm_head(tf_input_hoist=True, scan_loops=True)
    naive = _lstm_head(tf_input_hoist=False, scan_loops=True)
    params = hoist.init(jax.random.PRNGKey(0), q, ref, mem, mmask, shapes,
                        vr, seq)
    lp_h = hoist.apply(params, q, ref, mem, mmask, shapes, vr, seq,
                       deterministic=True)
    lp_n = naive.apply(params, q, ref, mem, mmask, shapes, vr, seq,
                       deterministic=True)
    np.testing.assert_allclose(np.asarray(lp_h), np.asarray(lp_n),
                               atol=2e-5, rtol=1e-5)


def test_lstm_dsa_fused_nll_matches_caption_nll(rng):
    q, ref, mem, mmask, shapes, vr, seq = dsa_inputs(rng)
    head = _lstm_head()
    params = head.init(jax.random.PRNGKey(0), q, ref, mem, mmask, shapes,
                       vr, seq)
    B, Ne, Lc = seq.shape
    seq_mask = jnp.asarray(
        np.cumsum(np.asarray(seq) > 0, axis=-1) <= 3).astype(jnp.float32)
    seq_mask = seq_mask.at[:, :, 0].set(1.0)
    lp = head.apply(params, q, ref, mem, mmask, shapes, vr, seq,
                    deterministic=True)
    want = caption_nll(lp.reshape(B * Ne, Lc - 1, -1),
                       seq[:, :, 1:].reshape(B * Ne, -1),
                       seq_mask[:, :, 1:].reshape(B * Ne, -1))
    got = head.apply(params, q, ref, mem, mmask, shapes, vr, seq, seq_mask,
                     deterministic=True, method=head.teacher_forced_nll)
    np.testing.assert_allclose(np.asarray(got).reshape(-1),
                               np.asarray(want), atol=2e-5, rtol=1e-5)


def test_light_fused_nll_matches_caption_nll(rng):
    q, ref, mem, mmask, shapes, vr, seq = dsa_inputs(rng)
    head = LightCaptioner(vocab_size=40, input_encoding_size=32, rnn_size=32,
                          max_caption_len=6, drop_prob=0.0)
    params = head.init(jax.random.PRNGKey(0), q, ref, mem, mmask, shapes,
                       vr, seq)
    B, Ne, Lc = seq.shape
    seq_mask = jnp.ones((B, Ne, Lc), jnp.float32)
    lp = head.apply(params, q, ref, mem, mmask, shapes, vr, seq,
                    deterministic=True)
    want = caption_nll(lp.reshape(B * Ne, Lc - 1, -1),
                       seq[:, :, 1:].reshape(B * Ne, -1),
                       seq_mask[:, :, 1:].reshape(B * Ne, -1))
    got = head.apply(params, q, ref, mem, mmask, shapes, vr, seq, seq_mask,
                     deterministic=True, method=head.teacher_forced_nll)
    np.testing.assert_allclose(np.asarray(got).reshape(-1),
                               np.asarray(want), atol=2e-5, rtol=1e-5)


def test_step_fused_tf_matches_serial(tmp_path, rng):
    """Train-step equivalence: static ss_prob=0.0 routes through
    caption_train_nll + the input hoist; traced ss_prob=0.0 routes through
    the serial scheduled-sampling branch (which degenerates to teacher
    forcing at prob 0). With dropout off the losses must agree."""
    from tests.test_train_smoke import add_text, build_world, device_batch
    from gvl_tpu.train.criterion import LossSpec, make_weight_dict
    from gvl_tpu.train.state import (StepStatics, create_train_state,
                                     make_train_step)

    cfg, ds, batcher, bundle, model = build_world(
        tmp_path, drop_prob=0.0, transformer_dropout_prob=0.0,
        hidden_dropout_prob=0.0)
    batch = add_text(next(iter(batcher)), bundle, cfg)
    db = device_batch(batch)

    key = jax.random.PRNGKey(0)
    G = cfg.effective_max_gt_events
    word = jnp.zeros((db["captions"].shape[0], G, cfg.max_text_input_len,
                      bundle.hidden_size))
    params = model.init(
        key, db["video_feats"], db["video_mask"], db["duration"],
        word_embed=word, token_mask=db["text_mask"].astype(bool),
        gt_mask=db["gt_mask"], captions=db["captions"],
        method=model.init_all)

    statics = StepStatics(
        spec=LossSpec.from_config(cfg), enable_contrastive=True,
        caption_loss=True, two_stage=False, train_text_encoder=False,
        disable_mid_caption_heads=False, enable_pos_emb_for_captioner=False,
        temporal_shapes=tuple(cfg.temporal_shapes()))
    state = create_train_state(cfg, model, params, bundle.params, 4, statics)
    step_fn, _, _ = make_train_step(model, bundle.apply_fn, cfg, statics)
    weights = {k: jnp.asarray(v, jnp.float32)
               for k, v in make_weight_dict(cfg).items()}

    _, losses_fused = jax.jit(step_fn, static_argnums=(4,))(
        state, db, weights, jax.random.PRNGKey(3), 0.0)
    _, losses_serial = jax.jit(step_fn)(
        state, db, weights, jax.random.PRNGKey(3), jnp.float32(0.0))
    for k in losses_fused:
        np.testing.assert_allclose(
            float(losses_fused[k]), float(losses_serial[k]),
            atol=5e-4, rtol=2e-4, err_msg=k)
