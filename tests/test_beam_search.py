"""Beam search: beam=1 matches greedy; wider beams never score worse."""

import jax
import jax.numpy as jnp
import numpy as np

from gvl_tpu.models.captioner import LSTMDSACaptioner
from tests.test_caption_heads import dsa_inputs


def make_head_and_params(rng):
    q, ref, mem, mmask, shapes, vr, seq = dsa_inputs(rng, B=2, Ne=3, Lc=8,
                                                     V=30)
    head = LSTMDSACaptioner(
        vocab_size=30, input_encoding_size=16, rnn_size=16, d_model=32,
        n_levels=2, n_heads=2, n_points=2, att_hid_size=16,
        max_caption_len=8, drop_prob=0.0)
    params = head.init(jax.random.PRNGKey(0), q, ref, mem, mmask, shapes, vr,
                       seq)
    return head, params, (q, ref, mem, mmask, shapes, vr)


def seq_logprob(head, params, inputs, seq):
    """Score a decoded sequence under teacher forcing (sum of logprobs up to
    and including the first EOS)."""
    q, ref, mem, mmask, shapes, vr = inputs
    B, Ne, L = seq.shape
    full = jnp.concatenate([jnp.zeros((B, Ne, 1), jnp.int32), seq], axis=-1)
    lp = head.apply(params, q, ref, mem, mmask, shapes, vr, full)  # (B,Ne,L,V)
    picked = jnp.take_along_axis(lp, seq[..., None], axis=-1)[..., 0]
    emitted = jnp.cumsum((seq == 0).astype(np.int32), axis=-1)
    keep = (emitted - (seq == 0)) == 0           # up to + incl. first EOS
    return (picked * keep).sum(-1)


def test_beam1_matches_greedy(rng):
    head, params, inputs = make_head_and_params(rng)
    q, ref, mem, mmask, shapes, vr = inputs
    g_seq, g_lps = head.apply(params, q, ref, mem, mmask, shapes, vr,
                              method=head.sample)
    b_seq, b_lps = head.apply(params, q, ref, mem, mmask, shapes, vr,
                              beam_size=1, method=head.sample_beam)
    np.testing.assert_array_equal(np.asarray(g_seq), np.asarray(b_seq))


def test_wider_beam_never_worse(rng):
    head, params, inputs = make_head_and_params(rng)
    q, ref, mem, mmask, shapes, vr = inputs
    seq1, _ = head.apply(params, q, ref, mem, mmask, shapes, vr,
                         beam_size=1, method=head.sample_beam)
    seq4, _ = head.apply(params, q, ref, mem, mmask, shapes, vr,
                         beam_size=4, method=head.sample_beam)
    s1 = np.asarray(seq_logprob(head, params, inputs, seq1))
    s4 = np.asarray(seq_logprob(head, params, inputs, seq4))
    assert (s4 >= s1 - 1e-4).all(), (s1, s4)
