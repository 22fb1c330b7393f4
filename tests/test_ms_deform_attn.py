"""Parity + gradient tests for the 1-D multi-scale deformable attention op.

Mirrors the reference's kernel test strategy (reference: pdvc/ops/test.py:
CUDA-vs-pytorch parity + gradcheck), with the oracle built here from
torch.nn.functional.grid_sample directly — the same primitive the reference's
pure-PyTorch core wraps — so nothing is copied from the reference repo.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from gvl_tpu.ops import (ms_deform_attn_1d, ms_deform_attn_1d_ref,
                         ms_deform_attn_1d_sampled_values)


def torch_oracle(value, shapes, loc, attn):
    """Ground-truth via torch grid_sample on (1, T_l) grids, y pinned to 0.5.

    value (B,S,H,Dh), loc/attn (B,Lq,H,L,P) numpy float64/32 arrays.
    """
    value = torch.from_numpy(value)
    loc = torch.from_numpy(loc)
    attn = torch.from_numpy(attn)
    B, S, H, Dh = value.shape
    _, Lq, _, L, P = loc.shape
    start = 0
    sampled = []
    for lid, T in enumerate(shapes):
        v = value[:, start:start + T]                       # (B,T,H,Dh)
        start += T
        v = v.permute(0, 2, 3, 1).reshape(B * H, Dh, 1, T)  # (BH,Dh,1,T)
        gx = 2 * loc[:, :, :, lid] - 1                      # (B,Lq,H,P)
        gy = torch.zeros_like(gx)
        grid = torch.stack([gx, gy], dim=-1)                # (B,Lq,H,P,2)
        grid = grid.permute(0, 2, 1, 3, 4).reshape(B * H, Lq, P, 2)
        s = F.grid_sample(v, grid, mode="bilinear",
                          padding_mode="border", align_corners=False)
        sampled.append(s)                                    # (BH,Dh,Lq,P)
    sampled = torch.stack(sampled, dim=3)                    # (BH,Dh,Lq,L,P)
    w = attn.permute(0, 2, 1, 3, 4).reshape(B * H, 1, Lq, L, P)
    out = (sampled * w).sum(dim=(3, 4))                      # (BH,Dh,Lq)
    out = out.reshape(B, H, Dh, Lq).permute(0, 3, 1, 2).reshape(B, Lq, H * Dh)
    return out.numpy()


def make_inputs(rng, B=2, H=4, Dh=16, Lq=18, shapes=(31, 16, 8, 4), P=4,
                dtype=np.float32, wild=False):
    L = len(shapes)
    S = sum(shapes)
    value = rng.randn(B, S, H, Dh).astype(dtype)
    lo, hi = (-0.4, 1.4) if wild else (0.0, 1.0)
    loc = rng.uniform(lo, hi, (B, Lq, H, L, P)).astype(dtype)
    attn = rng.rand(B, Lq, H, L, P).astype(dtype) + 1e-3
    attn = attn / attn.sum(axis=(3, 4), keepdims=True)
    return value, shapes, loc, attn


@pytest.mark.parametrize("wild", [False, True])
def test_ref_matches_torch_grid_sample(rng, wild):
    value, shapes, loc, attn = make_inputs(rng, wild=wild)
    want = torch_oracle(value, shapes, loc, attn)
    got = np.asarray(ms_deform_attn_1d_ref(
        jnp.asarray(value), shapes, jnp.asarray(loc), jnp.asarray(attn)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("wild", [False, True])
def test_pallas_matches_ref(rng, wild):
    # interpret mode on CPU; compiled on TPU
    value, shapes, loc, attn = make_inputs(rng, wild=wild)
    want = np.asarray(ms_deform_attn_1d_ref(
        jnp.asarray(value), shapes, jnp.asarray(loc), jnp.asarray(attn)))
    from jax.experimental.pallas import tpu as pltpu
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(ms_deform_attn_1d(
            jnp.asarray(value), shapes, jnp.asarray(loc), jnp.asarray(attn),
            impl="pallas"))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_grad_matches_finite_difference(rng):
    value, shapes, loc, attn = make_inputs(rng, B=1, H=2, Dh=4, Lq=3,
                                           shapes=(9, 5), P=2)
    value64 = value.astype(np.float64)
    loc64 = loc.astype(np.float64)
    attn64 = attn.astype(np.float64)
    # keep sample coords away from the piecewise-linear kinks (integer grid
    # points and the clip boundary) where centered finite differences and the
    # one-sided analytic derivative legitimately disagree
    for lid, T in enumerate(shapes):
        x = loc64[..., lid, :] * T - 0.5
        frac = x - np.floor(x)
        x = np.floor(x) + np.clip(frac, 0.25, 0.75)
        x = np.clip(x, 0.25, T - 1.25)
        loc64[..., lid, :] = (x + 0.5) / T

    def loss(v, l, a):
        out = ms_deform_attn_1d_ref(v, shapes, l, a)
        return jnp.sum(out * out)

    jax.config.update("jax_enable_x64", True)
    try:
        g = jax.grad(loss, argnums=(0, 1, 2))(
            jnp.asarray(value64), jnp.asarray(loc64), jnp.asarray(attn64))
        eps = 1e-6
        for argi, x in enumerate([value64, loc64, attn64]):
            flat = x.reshape(-1)
            idxs = rng.choice(flat.size, size=8, replace=False)
            for i in idxs:
                xp, xm = flat.copy(), flat.copy()
                xp[i] += eps
                xm[i] -= eps
                args_p = [value64, loc64, attn64]
                args_m = [value64, loc64, attn64]
                args_p[argi] = xp.reshape(x.shape)
                args_m[argi] = xm.reshape(x.shape)
                fd = (loss(*map(jnp.asarray, args_p)) -
                      loss(*map(jnp.asarray, args_m))) / (2 * eps)
                an = np.asarray(g[argi]).reshape(-1)[i]
                np.testing.assert_allclose(an, float(fd), rtol=1e-4, atol=1e-4)
    finally:
        jax.config.update("jax_enable_x64", False)


def test_pallas_grad_matches_ref_grad(rng):
    value, shapes, loc, attn = make_inputs(rng)
    args = (jnp.asarray(value), jnp.asarray(loc), jnp.asarray(attn))

    def loss(impl):
        def f(v, l, a):
            out = ms_deform_attn_1d(v, shapes, l, a, impl=impl)
            return jnp.sum(jnp.sin(out))
        return f

    g_ref = jax.grad(loss("ref"), argnums=(0, 1, 2))(*args)
    from jax.experimental.pallas import tpu as pltpu
    with pltpu.force_tpu_interpret_mode():
        g_pal = jax.grad(loss("pallas"), argnums=(0, 1, 2))(*args)
    for a, b in zip(g_ref, g_pal):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_sampled_values_shape_and_consistency(rng):
    value, shapes, loc, attn = make_inputs(rng)
    B, S, H, Dh = value.shape
    _, Lq, _, L, P = loc.shape
    vals = ms_deform_attn_1d_sampled_values(
        jnp.asarray(value), shapes, jnp.asarray(loc), jnp.asarray(attn))
    assert vals.shape == (B, Lq, H, L * P, Dh)
    # weighting the raw samples reproduces the fused op
    w = jnp.asarray(attn).transpose(0, 1, 2, 3, 4).reshape(B, Lq, H, L * P, 1)
    fused = (vals * w).sum(axis=3).reshape(B, Lq, H * Dh)
    want = ms_deform_attn_1d_ref(jnp.asarray(value), shapes,
                                 jnp.asarray(loc), jnp.asarray(attn))
    np.testing.assert_allclose(np.asarray(fused), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_sampled_values_impls_agree(rng):
    """'twohot' (MXU matmul) and 'gather' produce the same raw samples —
    the 'auto' heuristic in the captioner may pick either by size."""
    value, shapes, loc, attn = make_inputs(rng)
    a = ms_deform_attn_1d_sampled_values(
        jnp.asarray(value), shapes, jnp.asarray(loc), jnp.asarray(attn),
        impl="twohot")
    b = ms_deform_attn_1d_sampled_values(
        jnp.asarray(value), shapes, jnp.asarray(loc), jnp.asarray(attn),
        impl="gather")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-5, atol=1e-5)


def test_sampled_values_twohot_small_vs_large_s(rng):
    """The twohot sampler switches form at S=512: ONE (BH,R,S) matmul below
    (MXU-tile-friendly at flagship S=188), per-level matmuls above (FLOP-
    frugal at long-video S). Both must agree with 'gather' exactly — this
    pins the per-level branch, which small-shape tests no longer reach."""
    for shapes in [(31, 16, 8, 4),            # S=59  -> monolithic branch
                   (400, 200, 100, 50)]:      # S=750 -> per-level branch
        value, sh, loc, attn = make_inputs(rng, shapes=shapes)
        a = ms_deform_attn_1d_sampled_values(
            jnp.asarray(value), sh, jnp.asarray(loc), jnp.asarray(attn),
            impl="twohot")
        b = ms_deform_attn_1d_sampled_values(
            jnp.asarray(value), sh, jnp.asarray(loc), jnp.asarray(attn),
            impl="gather")
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)
