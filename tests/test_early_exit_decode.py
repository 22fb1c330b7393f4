"""eval_decode_early_exit: the while_loop greedy decode (stops once every
caption has emitted EOS, like the reference's loop break at
LSTM_DSA.py:186-188) must emit identical tokens and identical
logprobs-where-alive vs the fixed-step loop.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gvl_tpu.models.captioner import LSTMDSACaptioner
from tests.test_caption_heads import dsa_inputs

pytestmark = pytest.mark.core


def _head(scan_loops=False):
    return LSTMDSACaptioner(
        vocab_size=40, input_encoding_size=32, rnn_size=32, d_model=32,
        n_levels=2, n_heads=2, n_points=2, att_hid_size=16,
        max_caption_len=6, drop_prob=0.0, scan_loops=scan_loops)


def _compare(params, head, q, ref, mem, mmask, shapes, vr):
    seq_a, lps_a = head.apply(params, q, ref, mem, mmask, shapes, vr,
                              greedy=True, method=head.sample)
    seq_b, lps_b = head.apply(params, q, ref, mem, mmask, shapes, vr,
                              greedy=True, early_exit=True,
                              method=head.sample)
    np.testing.assert_array_equal(np.asarray(seq_a), np.asarray(seq_b))
    alive = np.asarray(seq_a) > 0
    np.testing.assert_allclose(np.asarray(lps_a) * alive,
                               np.asarray(lps_b) * alive,
                               rtol=1e-5, atol=1e-6)
    return seq_a


def test_early_exit_matches_fixed_loop(rng):
    q, ref, mem, mmask, shapes, vr, _ = dsa_inputs(rng)
    head = _head()
    params = head.init(jax.random.PRNGKey(0), q, ref, mem, mmask, shapes, vr,
                       jnp.zeros((2, 3, 6), jnp.int32))
    # random init: EOS (token 0) rarely wins -> decode runs to the end
    seq = _compare(params, head, q, ref, mem, mmask, shapes, vr)
    assert (np.asarray(seq) > 0).any()


def test_early_exit_with_eos_bias(rng):
    """Bias the logit layer hard toward EOS: every caption ends on step 1;
    the while_loop path must still produce identical (all-zero) output."""
    q, ref, mem, mmask, shapes, vr, _ = dsa_inputs(rng)
    head = _head()
    params = head.init(jax.random.PRNGKey(1), q, ref, mem, mmask, shapes, vr,
                       jnp.zeros((2, 3, 6), jnp.int32))
    params = jax.tree_util.tree_map(lambda x: x, params)  # unfreeze-safe copy
    bias = params["params"]["logit"]["bias"]
    params["params"]["logit"]["bias"] = bias.at[0].add(100.0)
    seq = _compare(params, head, q, ref, mem, mmask, shapes, vr)
    assert (np.asarray(seq) == 0).all()


def _light_head():
    from gvl_tpu.models.captioner import LightCaptioner
    return LightCaptioner(vocab_size=40, input_encoding_size=32, rnn_size=32,
                          max_caption_len=6, drop_prob=0.0)


def _light_compare(params, head, q, ref, mem, mmask, shapes, vr):
    seq_a, lps_a = head.apply(params, q, ref, mem, mmask, shapes, vr,
                              greedy=True, method=head.sample)
    seq_b, lps_b = head.apply(params, q, ref, mem, mmask, shapes, vr,
                              greedy=True, early_exit=True,
                              method=head.sample)
    np.testing.assert_array_equal(np.asarray(seq_a), np.asarray(seq_b))
    alive = np.asarray(seq_a) > 0
    np.testing.assert_allclose(np.asarray(lps_a) * alive,
                               np.asarray(lps_b) * alive,
                               rtol=1e-5, atol=1e-6)
    return seq_a


def test_light_early_exit_matches_fixed_loop(rng):
    q, ref, mem, mmask, shapes, vr, _ = dsa_inputs(rng)
    head = _light_head()
    params = head.init(jax.random.PRNGKey(0), q, ref, mem, mmask, shapes, vr,
                       jnp.zeros((2, 3, 6), jnp.int32))
    seq = _light_compare(params, head, q, ref, mem, mmask, shapes, vr)
    assert (np.asarray(seq) > 0).any()


def test_light_early_exit_with_eos_bias(rng):
    q, ref, mem, mmask, shapes, vr, _ = dsa_inputs(rng)
    head = _light_head()
    params = head.init(jax.random.PRNGKey(1), q, ref, mem, mmask, shapes, vr,
                       jnp.zeros((2, 3, 6), jnp.int32))
    params = jax.tree_util.tree_map(lambda x: x, params)
    bias = params["params"]["logit"]["bias"]
    params["params"]["logit"]["bias"] = bias.at[0].add(100.0)
    seq = _light_compare(params, head, q, ref, mem, mmask, shapes, vr)
    assert (np.asarray(seq) == 0).all()


def _tr_head():
    from gvl_tpu.models.captioner import TransformerDSACaptioner
    return TransformerDSACaptioner(vocab_size=40, input_encoding_size=32,
                                   d_model=32, num_layers=2, n_levels=2,
                                   n_heads=2, n_points=2, max_caption_len=6,
                                   drop_prob=0.0)


def test_transformer_cached_decode_matches_reforward(rng):
    """KV-cached fixed-shape decode == the reference-style full re-forward
    loop (tokens exactly; logprobs where alive), and the early-exit
    while_loop == both."""
    q, ref, mem, mmask, shapes, vr, seq = dsa_inputs(rng)
    head = _tr_head()
    params = head.init(jax.random.PRNGKey(0), q, ref, mem, mmask, shapes, vr,
                       seq)
    sa, la = head.apply(params, q, ref, mem, mmask, shapes, vr,
                        use_cache=False, method=head.sample)
    sb, lb = head.apply(params, q, ref, mem, mmask, shapes, vr,
                        use_cache=True, method=head.sample)
    sc, lc = head.apply(params, q, ref, mem, mmask, shapes, vr,
                        use_cache=True, early_exit=True, method=head.sample)
    np.testing.assert_array_equal(np.asarray(sa), np.asarray(sb))
    np.testing.assert_array_equal(np.asarray(sa), np.asarray(sc))
    alive = np.asarray(sa) > 0
    np.testing.assert_allclose(np.asarray(la) * alive,
                               np.asarray(lb) * alive, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(lb) * alive,
                               np.asarray(lc) * alive, rtol=1e-5, atol=1e-6)
    assert (np.asarray(sa) > 0).any()


def test_transformer_early_exit_with_eos_bias(rng):
    q, ref, mem, mmask, shapes, vr, seq = dsa_inputs(rng)
    head = _tr_head()
    params = head.init(jax.random.PRNGKey(1), q, ref, mem, mmask, shapes, vr,
                       seq)
    params = jax.tree_util.tree_map(lambda x: x, params)
    bias = params["params"]["logits"]["bias"]
    params["params"]["logits"]["bias"] = bias.at[0].add(100.0)
    for kw in (dict(use_cache=False), dict(use_cache=True),
               dict(use_cache=True, early_exit=True)):
        s, _ = head.apply(params, q, ref, mem, mmask, shapes, vr,
                          method=head.sample, **kw)
        assert (np.asarray(s) == 0).all(), kw


def test_early_exit_lowers_to_while_loop(rng):
    q, ref, mem, mmask, shapes, vr, _ = dsa_inputs(rng)
    head = _head()
    params = head.init(jax.random.PRNGKey(0), q, ref, mem, mmask, shapes, vr,
                       jnp.zeros((2, 3, 6), jnp.int32))
    jaxpr = jax.make_jaxpr(lambda p: head.apply(
        p, q, ref, mem, mmask, shapes, vr, greedy=True, early_exit=True,
        method=head.sample))(params)
    assert "while" in str(jaxpr)
