"""Unit tests for the Transformer-DSA and GPT-2 caption heads + scheduled
sampling on the LSTM-DSA head."""

import jax
import jax.numpy as jnp
import numpy as np

from gvl_tpu.models.captioner import (LSTMDSACaptioner,
                                      TransformerDSACaptioner, caption_nll)
from gvl_tpu.models.gpt_captioner import GPT2Captioner, GPT2Spec


def dsa_inputs(rng, B=2, Ne=3, C=32, L_levels=2, shapes=(12, 6), Lc=6, V=40):
    S = sum(shapes)
    query = jnp.asarray(rng.randn(B, Ne, C).astype(np.float32))
    reference = jnp.asarray(rng.uniform(0.2, 0.8, (B, Ne, 2)).astype(np.float32))
    memory = jnp.asarray(rng.randn(B, S, C).astype(np.float32))
    memory_mask = jnp.ones((B, S), bool)
    valid_ratios = jnp.ones((B, L_levels))
    seq = jnp.asarray(rng.randint(1, V, (B, Ne, Lc)).astype(np.int32))
    seq = seq.at[:, :, 0].set(0)
    return query, reference, memory, memory_mask, shapes, valid_ratios, seq


def test_transformer_dsa_shapes_and_causality(rng):
    q, ref, mem, mmask, shapes, vr, seq = dsa_inputs(rng)
    head = TransformerDSACaptioner(
        vocab_size=40, input_encoding_size=32, d_model=32, num_layers=1,
        n_levels=2, n_heads=2, n_points=2, max_caption_len=6, drop_prob=0.0)
    params = head.init(jax.random.PRNGKey(0), q, ref, mem, mmask, shapes, vr,
                       seq)
    lp = head.apply(params, q, ref, mem, mmask, shapes, vr, seq)
    B, Ne, Lc = seq.shape
    assert lp.shape == (B, Ne, Lc - 1, 41)
    np.testing.assert_allclose(np.asarray(jnp.exp(lp).sum(-1)), 1.0, atol=1e-4)

    # causality: changing a future token must not affect earlier logprobs
    seq2 = seq.at[:, :, 4].set((seq[:, :, 4] + 7) % 40)
    lp2 = head.apply(params, q, ref, mem, mmask, shapes, vr, seq2)
    np.testing.assert_allclose(np.asarray(lp[:, :, :3]),
                               np.asarray(lp2[:, :, :3]), atol=1e-5)
    # cross-event isolation: event 0's logprobs don't depend on event 1's seq
    seq3 = seq.at[:, 1].set((seq[:, 1] + 3) % 40)
    lp3 = head.apply(params, q, ref, mem, mmask, shapes, vr, seq3)
    np.testing.assert_allclose(np.asarray(lp[:, 0]), np.asarray(lp3[:, 0]),
                               atol=1e-5)

    toks, lps = head.apply(params, q, ref, mem, mmask, shapes, vr,
                           method=head.sample)
    assert toks.shape == (B, Ne, 6) and lps.shape == (B, Ne, 6)


def test_lstm_dsa_scheduled_sampling(rng):
    q, ref, mem, mmask, shapes, vr, seq = dsa_inputs(rng)
    head = LSTMDSACaptioner(
        vocab_size=40, input_encoding_size=32, rnn_size=32, d_model=32,
        n_levels=2, n_heads=2, n_points=2, att_hid_size=16,
        max_caption_len=6, drop_prob=0.0)
    params = head.init(jax.random.PRNGKey(0), q, ref, mem, mmask, shapes, vr,
                       seq)
    lp0 = head.apply(params, q, ref, mem, mmask, shapes, vr, seq,
                     deterministic=True)
    # ss_prob=1.0: inputs differ from GT -> different logprobs after step 1
    lp1 = head.apply(params, q, ref, mem, mmask, shapes, vr, seq,
                     deterministic=False, ss_prob=1.0,
                     rngs={"sample": jax.random.PRNGKey(3),
                           "dropout": jax.random.PRNGKey(4)})
    assert not np.allclose(np.asarray(lp0[:, :, 2:]), np.asarray(lp1[:, :, 2:]))
    # first step is always GT-fed -> identical
    np.testing.assert_allclose(np.asarray(lp0[:, :, 0]),
                               np.asarray(lp1[:, :, 0]), atol=1e-5)


def test_gpt2_captioner_module(rng):
    spec = GPT2Spec(vocab_size=100, n_embd=32, n_layer=1, n_head=2,
                    prefix_length=4, prefix_size=16, stop_token_id=13)
    head = GPT2Captioner(spec)
    N, Lg = 3, 7
    prefix = jnp.asarray(rng.randn(N, 16).astype(np.float32))
    tokens = jnp.asarray(rng.randint(1, 100, (N, Lg)).astype(np.int32))
    mask = jnp.ones((N, Lg), jnp.float32)
    params = head.init(jax.random.PRNGKey(0), prefix, tokens, mask)
    loss, logits = head.apply(params, prefix, tokens, mask)
    assert loss.shape == (N,) and logits.shape == (N, Lg, 100)
    assert np.isfinite(np.asarray(loss)).all()

    toks, probs, gen_mask = head.apply(params, prefix, entry_length=5,
                                       method=head.sample)
    assert toks.shape == (N, 5) and probs.shape == (N, 5)
    assert gen_mask.shape == (N, 5)


def test_gpt2_kv_cache_matches_full_reforward(rng):
    """The cached greedy decode (prime + per-token KV-cache steps) must
    emit exactly the tokens/masks of the O(L^2) full-re-forward oracle loop,
    with probs equal to fp tolerance."""
    spec = GPT2Spec(vocab_size=120, n_embd=32, n_layer=2, n_head=2,
                    prefix_length=4, prefix_size=16, stop_token_id=13)
    head = GPT2Captioner(spec)
    N = 4
    prefix = jnp.asarray(rng.randn(N, 16).astype(np.float32))
    tokens = jnp.asarray(rng.randint(1, 120, (N, 6)).astype(np.int32))
    params = head.init(jax.random.PRNGKey(2), prefix, tokens,
                       jnp.ones((N, 6), jnp.float32))
    t_c, p_c, m_c = head.apply(params, prefix, entry_length=8,
                               use_cache=True, method=head.sample)
    t_f, p_f, m_f = head.apply(params, prefix, entry_length=8,
                               use_cache=False, method=head.sample)
    np.testing.assert_array_equal(np.asarray(t_c), np.asarray(t_f))
    np.testing.assert_array_equal(np.asarray(m_c), np.asarray(m_f))
    np.testing.assert_allclose(np.asarray(p_c), np.asarray(p_f),
                               rtol=1e-5, atol=1e-6)

    # early-exit while_loop: identical where alive (post-all-stop junk
    # tokens of the fixed loop are masked by gen_mask either way)
    t_e, p_e, m_e = head.apply(params, prefix, entry_length=8,
                               use_cache=True, early_exit=True,
                               method=head.sample)
    m = np.asarray(m_f)
    np.testing.assert_array_equal(np.asarray(m_e), m)
    np.testing.assert_array_equal(np.asarray(t_e) * m, np.asarray(t_f) * m)
    np.testing.assert_allclose(np.asarray(p_e) * m, np.asarray(p_f) * m,
                               rtol=1e-5, atol=1e-6)


def test_lstm_dsa_scan_matches_unrolled_tf(rng):
    """The scan and unrolled teacher-forcing variants (both with the vocab
    projection hoisted out of the token chain) must agree exactly — and the
    hoisted no-ss path must agree with the in-chain scheduled-sampling path
    at ss_prob=0 (same math, different schedule)."""
    q, ref, mem, mmask, shapes, vr, seq = dsa_inputs(rng)
    kw = dict(vocab_size=40, input_encoding_size=32, rnn_size=32, d_model=32,
              n_levels=2, n_heads=2, n_points=2, att_hid_size=16,
              max_caption_len=6, drop_prob=0.0)
    head_u = LSTMDSACaptioner(**kw)
    head_s = LSTMDSACaptioner(scan_loops=True, **kw)
    params = head_u.init(jax.random.PRNGKey(0), q, ref, mem, mmask, shapes,
                         vr, seq)
    lp_u = head_u.apply(params, q, ref, mem, mmask, shapes, vr, seq)
    lp_s = head_s.apply(params, q, ref, mem, mmask, shapes, vr, seq)
    np.testing.assert_allclose(np.asarray(lp_u), np.asarray(lp_s),
                               rtol=1e-5, atol=1e-6)
    # gradient equality pins the hoisted BACKWARD too (the NLL pulls one
    # column per token through the batched projection)
    def loss_fn(p, head):
        lp = head.apply(p, q, ref, mem, mmask, shapes, vr, seq)
        tgt = seq[:, :, 1:]
        pick = jnp.take_along_axis(lp, tgt[..., None], axis=-1)[..., 0]
        return -(pick * (tgt > 0)).sum()

    g_u = jax.grad(lambda p: loss_fn(p, head_u))(params)
    g_s = jax.grad(lambda p: loss_fn(p, head_s))(params)
    flat_u = jax.tree_util.tree_leaves(g_u)
    flat_s = jax.tree_util.tree_leaves(g_s)
    for a, b in zip(flat_u, flat_s):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)
