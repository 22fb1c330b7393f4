"""1-D multi-scale deformable attention — the TPU-native replacement for the
reference's CUDA MSDeformAttn op (reference: pdvc/ops/src/cuda/*,
pdvc/ops/functions/ms_deform_attn_func.py:44-71 is the numerical spec).

Semantics
---------
For each (batch b, query q, head h, level l, point p):

    x   = clip(loc * T_l - 0.5, 0, T_l - 1)        # border padding: clamp the
    i0  = floor(x); f = x - i0; i1 = min(i0+1, T_l-1)   # coordinate, then lerp
    tap = value[b, start_l + i0, h] * (1-f) + value[b, start_l + i1, h] * f
    out[b, q, h] = sum_{l,p} attn[b,q,h,l,p] * tap

which matches `F.grid_sample(mode='bilinear', padding_mode='border',
align_corners=False)` on a (1, T_l) grid with y pinned to 0.5 — exactly what
the reference's pure-PyTorch core computes after its 1-D→2-D adaptation
(reference: pdvc/ops/modules/ms_deform_attn.py:114-117).

Implementations
---------------
- `ms_deform_attn_1d_ref`: pure jnp take_along_axis gathers. Differentiable
  via autodiff. The test oracle, and a solid XLA fallback.
- `ms_deform_attn_1d` with impl='pallas': fused Pallas kernel. Per (b·h,
  query-tile) block it builds the (S, TQ) interpolation matrix in VMEM with
  iota-compares (never materialized to HBM — the jnp equivalent would write
  B·H·Lq·S floats) and contracts it against the (S, Dh) value slice on the
  MXU. Custom VJP with the transposed matmuls for dValue and a masked-reduce
  for the tap-weight gradients; this replaces the reference's six hand-tuned
  CUDA col2im reduction variants (ms_deform_im2col_cuda.cuh:303-923) with two
  matmuls.

Shapes
------
value:  (B, S, H, Dh)   S = sum of temporal_shapes; padding rows zeroed
loc:    (B, Lq, H, L, P)  in [0, 1], per-level normalized coordinates
attn:   (B, Lq, H, L, P)  softmax-normalized over (L, P)
out:    (B, Lq, H * Dh)
`temporal_shapes` must be a static tuple/list of python ints.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _prep_taps(temporal_shapes: Sequence[int], loc: jnp.ndarray,
               attn: jnp.ndarray):
    """Shared tap precomputation: global int indices + lerp'd weights.

    Returns g0, g1 (int32) and w0, w1 (f32), all shaped (B, Lq, H, L, P).
    Gradients flow to loc/attn through w0/w1 (f is a linear function of loc
    inside the unclipped region; clip gives zero gradient outside, matching
    torch grid_sample border behavior).
    """
    shapes = jnp.asarray(temporal_shapes, dtype=loc.dtype)          # (L,)
    starts_list = [0]
    for t in temporal_shapes[:-1]:
        starts_list.append(starts_list[-1] + int(t))
    starts = jnp.asarray(starts_list, dtype=jnp.int32)              # (L,)

    t = shapes[None, None, None, :, None]
    x = jnp.clip(loc * t - 0.5, 0.0, t - 1.0)
    i0 = jnp.floor(x)
    f = x - jax.lax.stop_gradient(i0)
    i0 = i0.astype(jnp.int32)
    i1 = jnp.minimum(i0 + 1, (t - 1.0).astype(jnp.int32))
    g0 = i0 + starts[None, None, None, :, None]
    g1 = i1 + starts[None, None, None, :, None]
    w0 = attn * (1.0 - f)
    w1 = attn * f
    return g0, g1, w0, w1


# ---------------------------------------------------------------------------
# Pure-jnp reference (oracle + fallback)
# ---------------------------------------------------------------------------

def _take_taps_ref(value: jnp.ndarray, g0, g1, w0, w1) -> jnp.ndarray:
    """Gather-based weighted tap sum from precomputed flat indices/weights.

    value (B, S, H, Dh); g0/g1 int32 (B, Lq, H, L, P) flat indices into S;
    w0/w1 same shape. Returns (B, Lq, H*Dh). The jnp oracle core, shared by
    the dp path and the shard_map'd sp path (ms_deform_attn_sp.py)."""
    B, S, H, Dh = value.shape
    _, Lq, _, L, P = g0.shape
    v = value.transpose(0, 2, 1, 3).reshape(B * H, S, Dh)

    def flat(idx):
        return idx.transpose(0, 2, 1, 3, 4).reshape(B * H, Lq * L * P)

    s0 = jnp.take_along_axis(v, flat(g0)[..., None], axis=1)        # (BH, LqK, Dh)
    s1 = jnp.take_along_axis(v, flat(g1)[..., None], axis=1)
    w0f = flat(w0.astype(value.dtype))[..., None]
    w1f = flat(w1.astype(value.dtype))[..., None]
    out = (s0 * w0f + s1 * w1f).reshape(B, H, Lq, L * P, Dh).sum(axis=3)
    return out.transpose(0, 2, 1, 3).reshape(B, Lq, H * Dh)


def ms_deform_attn_1d_ref(value: jnp.ndarray,
                          temporal_shapes: Sequence[int],
                          loc: jnp.ndarray,
                          attn: jnp.ndarray) -> jnp.ndarray:
    g0, g1, w0, w1 = _prep_taps(temporal_shapes, loc, attn)
    return _take_taps_ref(value, g0, g1, w0, w1)


def ms_deform_attn_1d_sampled_values(value: jnp.ndarray,
                                     temporal_shapes: Sequence[int],
                                     loc: jnp.ndarray,
                                     attn: jnp.ndarray,
                                     impl: str = "twohot") -> jnp.ndarray:
    """Raw per-tap sampled values, *not* weighted/summed — the
    `return_value=True` path used by the LSTM-DSA captioner (reference:
    pdvc/ops/modules/ms_deform_attn_for_caption.py:124-127).

    impl='twohot' (default): each tap's linear interpolation becomes one row
    of a sparse-as-dense (R, S) matrix with the two lerp weights at i0/i1,
    and sampling is a single MXU matmul — XLA's gather lowering for this
    access pattern was measured ~10x off memory-bound on v5e and scales
    superlinearly with batch. impl='gather' keeps take_along_axis.

    Returns (B, Lq, H, L*P, Dh).
    """
    B, S, H, Dh = value.shape
    _, Lq, _, L, P = loc.shape
    g0, g1, w0, w1 = _prep_taps(temporal_shapes, loc, jnp.ones_like(attn))
    v = value.transpose(0, 2, 1, 3).reshape(B * H, S, Dh)

    def flat(idx):
        return idx.transpose(0, 2, 1, 3, 4).reshape(B * H, Lq * L * P)

    if impl == "twohot" and S < 512:
        # SMALL S (flagship 188): ONE (BH, R, S) matmul. The per-level form
        # below is exact too but launches L tiny matmuls whose contraction
        # dims (T_l down to 13) pad to the 128-lane MXU tile — measured a
        # ~6% eval-step regression at S=188 when it was unconditional
        # (round-4 r2-tree A/B: 3214 vs ~3010 clips/s on the same chip).
        # 512 matches the banded-encoder-kernel threshold.
        f32 = jnp.float32
        rows = (jax.nn.one_hot(flat(g0), S, dtype=f32)
                * flat(w0.astype(f32))[..., None]
                + jax.nn.one_hot(flat(g1), S, dtype=f32)
                * flat(w1.astype(f32))[..., None])        # (BH, R, S)
        out = jax.lax.dot_general(
            rows, v.astype(f32),
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=f32)                   # (BH, R, Dh)
        out = out.astype(value.dtype).reshape(B, H, Lq, L * P, Dh)
        return out.transpose(0, 2, 1, 3, 4)

    if impl == "twohot":
        # LARGE S, PER LEVEL: a tap in level l only touches level-l
        # columns, so one (R, S) matmul wastes Σ_{l'≠l} T_l' columns of
        # zeros per row — the per-level form cuts the decode sampling FLOPs
        # ~L-fold (at YouMakeup S=1500 this matmul was ~the whole decode
        # budget).
        f32 = jnp.float32
        starts = [0]
        for t in temporal_shapes[:-1]:
            starts.append(starts[-1] + int(t))
        v_f32 = v.astype(f32)
        outs = []
        for l, Tl in enumerate(temporal_shapes):
            Tl = int(Tl)

            def flat_l(idx):
                # (B, Lq, H, P) -> (BH, Lq*P)
                return idx[:, :, :, l, :].transpose(0, 2, 1, 3).reshape(
                    B * H, Lq * P)

            g0l = flat_l(g0) - starts[l]
            g1l = flat_l(g1) - starts[l]
            rows = (jax.nn.one_hot(g0l, Tl, dtype=f32)
                    * flat_l(w0.astype(f32))[..., None]
                    + jax.nn.one_hot(g1l, Tl, dtype=f32)
                    * flat_l(w1.astype(f32))[..., None])  # (BH, LqP, Tl)
            v_l = jax.lax.slice_in_dim(v_f32, starts[l], starts[l] + Tl,
                                       axis=1)
            # DEFAULT precision (bf16_3x on TPU): each output element sums
            # only TWO nonzero products, so the error-compensated 3-pass
            # form is within ~1e-6 relative of exact f32 — and ~2x the
            # HIGHEST (6-pass) matmul throughput in the decode hot loop.
            o = jax.lax.dot_general(
                rows, v_l,
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=f32)               # (BH, LqP, Dh)
            outs.append(o.reshape(B, H, Lq, P, Dh))
        out = jnp.stack(outs, axis=3)                     # (B, H, Lq, L, P, Dh)
        out = out.astype(value.dtype).reshape(B, H, Lq, L * P, Dh)
        return out.transpose(0, 2, 1, 3, 4)

    s0 = jnp.take_along_axis(v, flat(g0)[..., None], axis=1)
    s1 = jnp.take_along_axis(v, flat(g1)[..., None], axis=1)
    w0f = flat(w0.astype(value.dtype))[..., None]
    w1f = flat(w1.astype(value.dtype))[..., None]
    out = (s0 * w0f + s1 * w1f).reshape(B, H, Lq, L * P, Dh)
    return out.transpose(0, 2, 1, 3, 4)


# ---------------------------------------------------------------------------
# Pallas fused kernel
# ---------------------------------------------------------------------------

_TQ = 128  # query-tile (lane dimension of the interpolation matrix)


def _fwd_kernel(g0_ref, g1_ref, w0_ref, w1_ref, v_ref, o_ref, *, K: int):
    # blocks: g0/g1/w0/w1 (1, K, TQ); v (1, S, Dh); o (1, TQ, Dh)
    S = v_ref.shape[1]
    iota_s = jax.lax.broadcasted_iota(jnp.int32, (S, _TQ), 0)
    wmat = jnp.zeros((S, _TQ), dtype=jnp.float32)
    for k in range(K):
        m0 = (iota_s == g0_ref[0, k, :][None, :]).astype(jnp.float32)
        m1 = (iota_s == g1_ref[0, k, :][None, :]).astype(jnp.float32)
        wmat = wmat + m0 * w0_ref[0, k, :][None, :] + m1 * w1_ref[0, k, :][None, :]
    # (S, TQ)^T @ (S, Dh) -> (TQ, Dh) on the MXU. HIGHEST precision keeps the
    # interpolation exactly f32 (matching the CUDA op); the matmul is not the
    # bottleneck here — the W build is.
    o_ref[0] = jax.lax.dot_general(
        wmat, v_ref[0],
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)


def _bwd_kernel_full(g0_ref, g1_ref, w0_ref, w1_ref, v_ref, do_ref,
                     dv_ref, dw0_ref, dw1_ref, *, K: int):
    qt = pl.program_id(1)
    S = v_ref.shape[1]
    iota_s = jax.lax.broadcasted_iota(jnp.int32, (S, _TQ), 0)

    # dW (S, TQ) = V (S, Dh) @ dOut^T (Dh, TQ)
    dwmat = jax.lax.dot_general(
        v_ref[0], do_ref[0],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)

    wmat = jnp.zeros((S, _TQ), dtype=jnp.float32)
    for k in range(K):
        m0 = iota_s == g0_ref[0, k, :][None, :]
        m1 = iota_s == g1_ref[0, k, :][None, :]
        dw0_ref[0, k, :] = jnp.sum(jnp.where(m0, dwmat, 0.0), axis=0)
        dw1_ref[0, k, :] = jnp.sum(jnp.where(m1, dwmat, 0.0), axis=0)
        wmat = (wmat + m0.astype(jnp.float32) * w0_ref[0, k, :][None, :]
                + m1.astype(jnp.float32) * w1_ref[0, k, :][None, :])

    # dV (S, Dh) = W (S, TQ) @ dOut (TQ, Dh), accumulated over query tiles
    dv_tile = jax.lax.dot_general(
        wmat, do_ref[0],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(qt == 0)
    def _():
        dv_ref[0] = dv_tile

    @pl.when(qt != 0)
    def _():
        dv_ref[0] = dv_ref[0] + dv_tile


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def _msda_core_pallas(v: jnp.ndarray, g0: jnp.ndarray, g1: jnp.ndarray,
                      w0: jnp.ndarray, w1: jnp.ndarray) -> jnp.ndarray:
    """v: (BH, S, Dh); g*/w*: (BH, K, Lq_pad). Returns (BH, Lq_pad, Dh)."""
    out, _ = _msda_core_pallas_fwd(v, g0, g1, w0, w1)
    return out


def _msda_core_pallas_fwd(v, g0, g1, w0, w1):
    BH, S, Dh = v.shape
    _, K, Lq_pad = g0.shape
    QT = Lq_pad // _TQ

    tap_spec = pl.BlockSpec((1, K, _TQ), lambda b, q: (b, 0, q),
                            memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, K=K),
        grid=(BH, QT),
        in_specs=[tap_spec, tap_spec, tap_spec, tap_spec,
                  pl.BlockSpec((1, S, Dh), lambda b, q: (b, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, _TQ, Dh), lambda b, q: (b, q, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((BH, Lq_pad, Dh), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * BH * Lq_pad * S * Dh + 6 * BH * K * Lq_pad * S,
            bytes_accessed=4 * BH * (S * Dh + 4 * K * Lq_pad + Lq_pad * Dh),
            transcendentals=0),
    )(g0, g1, w0, w1, v)
    return out, (v, g0, g1, w0, w1)


def _msda_core_pallas_bwd(res, dout):
    v, g0, g1, w0, w1 = res
    BH, S, Dh = v.shape
    _, K, Lq_pad = g0.shape
    QT = Lq_pad // _TQ

    tap_spec = pl.BlockSpec((1, K, _TQ), lambda b, q: (b, 0, q),
                            memory_space=pltpu.VMEM)
    dv, dw0, dw1 = pl.pallas_call(
        functools.partial(_bwd_kernel_full, K=K),
        grid=(BH, QT),
        in_specs=[tap_spec, tap_spec, tap_spec, tap_spec,
                  pl.BlockSpec((1, S, Dh), lambda b, q: (b, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, _TQ, Dh), lambda b, q: (b, q, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec((1, S, Dh), lambda b, q: (b, 0, 0),
                                memory_space=pltpu.VMEM),
                   tap_spec, tap_spec),
        out_shape=(jax.ShapeDtypeStruct((BH, S, Dh), jnp.float32),
                   jax.ShapeDtypeStruct((BH, K, Lq_pad), jnp.float32),
                   jax.ShapeDtypeStruct((BH, K, Lq_pad), jnp.float32)),
        cost_estimate=pl.CostEstimate(
            flops=4 * BH * Lq_pad * S * Dh + 9 * BH * K * Lq_pad * S,
            bytes_accessed=4 * BH * (2 * S * Dh + 6 * K * Lq_pad + Lq_pad * Dh),
            transcendentals=0),
    )(g0, g1, w0, w1, v, dout.astype(jnp.float32))
    return dv, None, None, dw0, dw1


_msda_core_pallas.defvjp(_msda_core_pallas_fwd, _msda_core_pallas_bwd)


def _msda_pallas_from_taps(value, g0, g1, w0, w1):
    """Pallas core from precomputed flat taps.

    value (B, S, H, Dh) float32; g*/w* (B, Lq, H, L, P).
    Returns (B, Lq, H*Dh) float32. Shared by the dp path and the sp path."""
    B, S, H, Dh = value.shape
    _, Lq, _, L, P = g0.shape
    K = L * P

    Lq_pad = _round_up(max(Lq, _TQ), _TQ)
    S_pad = _round_up(S, 8)

    def pack(x, dtype):
        x = x.astype(dtype).transpose(0, 2, 3, 4, 1).reshape(B * H, K, Lq)
        return jnp.pad(x, ((0, 0), (0, 0), (0, Lq_pad - Lq)))

    v = value.astype(jnp.float32).transpose(0, 2, 1, 3).reshape(B * H, S, Dh)
    if S_pad != S:
        v = jnp.pad(v, ((0, 0), (0, S_pad - S), (0, 0)))

    out = _msda_core_pallas(v, pack(g0, jnp.int32), pack(g1, jnp.int32),
                            pack(w0, jnp.float32), pack(w1, jnp.float32))
    out = out[:, :Lq, :].reshape(B, H, Lq, Dh).transpose(0, 2, 1, 3)
    return out.reshape(B, Lq, H * Dh)


def _msda_pallas(value, temporal_shapes, loc, attn):
    g0, g1, w0, w1 = _prep_taps(temporal_shapes, loc, attn)
    out = _msda_pallas_from_taps(value.astype(jnp.float32), g0, g1, w0, w1)
    return out.astype(value.dtype)


def ms_deform_attn_1d(value: jnp.ndarray,
                      temporal_shapes: Sequence[int],
                      loc: jnp.ndarray,
                      attn: jnp.ndarray,
                      impl: str = "pallas") -> jnp.ndarray:
    """Fused 1-D multi-scale deformable attention. See module docstring.

    impl='banded' selects the banded encoder kernel (token queries only;
    ops/ms_deform_attn_banded.py) — O(K*band) instead of O(K*S) W-build per
    query tile, the long-video win."""
    if impl == "pallas":
        return _msda_pallas(value, temporal_shapes, loc, attn)
    elif impl == "banded":
        from gvl_tpu.ops.ms_deform_attn_banded import ms_deform_attn_1d_banded
        return ms_deform_attn_1d_banded(value, temporal_shapes, loc, attn)
    elif impl == "ref":
        return ms_deform_attn_1d_ref(value, temporal_shapes, loc, attn)
    raise ValueError(f"unknown msda impl: {impl}")
