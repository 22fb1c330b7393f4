"""Banded encoder MSDA kernel vs the dense oracle: outputs and gradients
match whenever the band covers the taps (always, at these margins)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from gvl_tpu.ops.ms_deform_attn import ms_deform_attn_1d
from gvl_tpu.ops.ms_deform_attn_banded import ms_deform_attn_1d_banded

H, L, P, DH = 2, 3, 8, 8
SHAPES = (48, 24, 12)
S = sum(SHAPES)


def _world(rng, B=2, spread=3.0):
    value = rng.randn(B, S, H, DH).astype(np.float32)
    refs = []
    for T in SHAPES:
        refs.append((np.arange(T) + 0.5) / T)
    ref = np.concatenate(refs)
    offsets = rng.uniform(-spread, spread, (B, S, H, L, P)).astype(np.float32)
    shp = np.asarray(SHAPES, np.float32)
    loc = ref[None, :, None, None, None] + \
        offsets / shp[None, None, None, :, None]
    attn = rng.rand(B, S, H, L, P).astype(np.float32)
    attn /= attn.sum((-1, -2), keepdims=True)
    return jnp.asarray(value), jnp.asarray(loc), jnp.asarray(attn)


def test_banded_matches_dense(rng):
    value, loc, attn = _world(rng)
    want = ms_deform_attn_1d(value, SHAPES, loc, attn, impl="ref")
    with pltpu.force_tpu_interpret_mode():
        got = jax.jit(lambda v, l, a: ms_deform_attn_1d_banded(
            v, SHAPES, l, a, margin=8))(value, loc, attn)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-6)


def test_banded_gradients_match(rng):
    value, loc, attn = _world(rng)

    def loss_dense(v, l, a):
        out = ms_deform_attn_1d(v, SHAPES, l, a, impl="ref")
        return (out * out).sum()

    def loss_band(v, l, a):
        out = ms_deform_attn_1d_banded(v, SHAPES, l, a, margin=8)
        return (out * out).sum()

    g_d = jax.grad(loss_dense, argnums=(0, 1, 2))(value, loc, attn)
    with pltpu.force_tpu_interpret_mode():
        g_b = jax.jit(jax.grad(loss_band, argnums=(0, 1, 2)))(
            value, loc, attn)
    for a, b, name in zip(g_d, g_b, ["value", "loc", "attn"]):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-4, atol=1e-5, err_msg=name)


def test_banded_full_band_is_exact_for_any_taps(rng):
    """margin >= max level width -> BS == T_l: arbitrary (non-local) taps
    still agree with the dense oracle (the clamp never engages)."""
    B = 2
    value = jnp.asarray(rng.randn(B, S, H, DH).astype(np.float32))
    loc = jnp.asarray(rng.rand(B, S, H, L, P).astype(np.float32))
    attn = jnp.asarray(rng.rand(B, S, H, L, P).astype(np.float32))
    attn = attn / attn.sum((-1, -2), keepdims=True)
    want = ms_deform_attn_1d(value, SHAPES, loc, attn, impl="ref")
    with pltpu.force_tpu_interpret_mode():
        got = jax.jit(lambda v, l, a: ms_deform_attn_1d_banded(
            v, SHAPES, l, a, margin=64))(value, loc, attn)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-6)
