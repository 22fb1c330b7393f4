"""Banded Pallas kernel for encoder (token-query) deformable attention.

The dense kernel (ms_deform_attn.py) builds the full (S, TQ) interpolation
matrix per query tile — O(K·S) VPU work per query, O(K·S²) per layer since
the encoder has one query per token. At YouMakeup shapes (T=800 → S=1500)
that W build is ~47% of the whole eval step (tools/bench_longvideo_parts.py:
4.16 ms/call).

Encoder taps are LOCAL: a query at position t samples within
`offset ≤ margin` positions of t in every level (offsets are initialized
within ±P positions, layers.py _directional_offset_bias). So for a tile of
128 consecutive same-level queries, the taps into target level l span about
`128·T_l/T_lq + 2·margin` positions. This kernel:

- runs one pallas_call per QUERY level (so tiles never straddle levels and
  each gets static per-target-level band sizes);
- per (batch·head, tile, target level) computes the dynamic band start from
  the tile's minimum tap index, builds the interpolation matrix only over
  the (BS_l, TQ) band, and contracts it against a dynamically sliced
  (BS_l, Dh) value window on the MXU;
- clamps out-of-band taps to the band edge (same contract as the sp halo:
  inactive when the band covers the taps, which the default margin
  guarantees for init-scale and trained offsets — and whenever
  BS_l == T_l the result is exactly the dense kernel's).

Backward mirrors the dense custom VJP with banded matmuls and a dynamic
read-modify-write accumulation into dValue.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gvl_tpu.ops.ms_deform_attn import _prep_taps, _round_up

_TQ = 128   # measured better than 256 at S=1500 (1702 vs 2134 us):
            # wider tiles widen every band, and the extra W work beats
            # the saved grid overhead
_PAD_G = 10 ** 6      # tap index for padded queries: never drags the band
                      # start down; clamps to band end with zero weight


def _band_sizes(shapes_pad: Sequence[int], Tq: int, margin: int
                ) -> Tuple[int, ...]:
    out = []
    for Tl in shapes_pad:
        span = int(np.ceil(_TQ * Tl / max(Tq, 1))) + 2 * margin
        out.append(min(Tl, _round_up(max(span, 16), 8)))
    return tuple(out)


def _band_start(gs0, gs1, Tl: int, bs: int):
    m = jnp.minimum(jnp.min(gs0), jnp.min(gs1))
    s = jnp.clip(m, 0, Tl - bs)
    return (s // 8) * 8


def _fwd_kernel(g0_ref, g1_ref, w0_ref, w1_ref, *rest, L: int, P: int,
                BS: Tuple[int, ...]):
    v_refs, o_ref = rest[:L], rest[L]
    Dh = o_ref.shape[2]
    acc = jnp.zeros((_TQ, Dh), jnp.float32)
    for l in range(L):
        bs, Tl = BS[l], v_refs[l].shape[1]
        gs0 = g0_ref[0, l * P:(l + 1) * P, :]          # (P, TQ)
        gs1 = g1_ref[0, l * P:(l + 1) * P, :]
        s = _band_start(gs0, gs1, Tl, bs)
        iota = jax.lax.broadcasted_iota(jnp.int32, (bs, _TQ), 0)
        wm = jnp.zeros((bs, _TQ), jnp.float32)
        for p in range(P):
            c0 = jnp.clip(gs0[p] - s, 0, bs - 1)
            c1 = jnp.clip(gs1[p] - s, 0, bs - 1)
            wm = wm + ((iota == c0[None, :]).astype(jnp.float32)
                       * w0_ref[0, l * P + p, :][None, :]
                       + (iota == c1[None, :]).astype(jnp.float32)
                       * w1_ref[0, l * P + p, :][None, :])
        vb = v_refs[l][0, pl.dslice(s, bs), :]
        acc = acc + jax.lax.dot_general(
            wm, vb, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
    o_ref[0] = acc


def _bwd_kernel(g0_ref, g1_ref, w0_ref, w1_ref, *rest, L: int, P: int,
                BS: Tuple[int, ...]):
    v_refs = rest[:L]
    do_ref = rest[L]
    dv_refs = rest[L + 1:2 * L + 1]
    dw0_ref, dw1_ref = rest[2 * L + 1], rest[2 * L + 2]
    qt = pl.program_id(1)

    for l in range(L):
        @pl.when(qt == 0)
        def _(l=l):
            dv_refs[l][0] = jnp.zeros_like(dv_refs[l][0])

    do = do_ref[0].astype(jnp.float32)                 # (TQ, Dh)
    for l in range(L):
        bs, Tl = BS[l], v_refs[l].shape[1]
        gs0 = g0_ref[0, l * P:(l + 1) * P, :]
        gs1 = g1_ref[0, l * P:(l + 1) * P, :]
        s = _band_start(gs0, gs1, Tl, bs)
        vb = v_refs[l][0, pl.dslice(s, bs), :]
        # dW (bs, TQ) = V_band (bs, Dh) @ dOut^T (Dh, TQ)
        dwmat = jax.lax.dot_general(
            vb, do, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        iota = jax.lax.broadcasted_iota(jnp.int32, (bs, _TQ), 0)
        wm = jnp.zeros((bs, _TQ), jnp.float32)
        for p in range(P):
            c0 = jnp.clip(gs0[p] - s, 0, bs - 1)
            c1 = jnp.clip(gs1[p] - s, 0, bs - 1)
            m0 = iota == c0[None, :]
            m1 = iota == c1[None, :]
            dw0_ref[0, l * P + p, :] = jnp.sum(
                jnp.where(m0, dwmat, 0.0), axis=0)
            dw1_ref[0, l * P + p, :] = jnp.sum(
                jnp.where(m1, dwmat, 0.0), axis=0)
            wm = wm + (m0.astype(jnp.float32)
                       * w0_ref[0, l * P + p, :][None, :]
                       + m1.astype(jnp.float32)
                       * w1_ref[0, l * P + p, :][None, :])
        dv_band = jax.lax.dot_general(
            wm, do, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)        # (bs, Dh)
        cur = dv_refs[l][0, pl.dslice(s, bs), :]
        dv_refs[l][0, pl.dslice(s, bs), :] = cur + dv_band


@functools.lru_cache(maxsize=None)
def _banded_core(L: int, P: int, BS: Tuple[int, ...],
                 shapes_pad: Tuple[int, ...], Dh: int):
    """custom-VJP'd banded core for one query level's static geometry.
    Inputs: v_levels (BH, T_l_pad, Dh) each; g/w (BH, K, TQpad).
    Returns (BH, TQpad, Dh)."""

    def specs(Lqp):
        QT = Lqp // _TQ
        tap = pl.BlockSpec((1, L * P, _TQ), lambda b, q: (b, 0, q),
                           memory_space=pltpu.VMEM)
        vs = [pl.BlockSpec((1, shapes_pad[l], Dh), lambda b, q: (b, 0, 0),
                           memory_space=pltpu.VMEM) for l in range(L)]
        o = pl.BlockSpec((1, _TQ, Dh), lambda b, q: (b, q, 0),
                         memory_space=pltpu.VMEM)
        return QT, tap, vs, o

    @jax.custom_vjp
    def core(g0, g1, w0, w1, *vs):
        out, _ = core_fwd(g0, g1, w0, w1, *vs)
        return out

    def core_fwd(g0, g1, w0, w1, *vs):
        BH, K, Lqp = g0.shape
        QT, tap, vspecs, ospec = specs(Lqp)
        out = pl.pallas_call(
            functools.partial(_fwd_kernel, L=L, P=P, BS=BS),
            grid=(BH, QT),
            in_specs=[tap, tap, tap, tap] + vspecs,
            out_specs=ospec,
            out_shape=jax.ShapeDtypeStruct((BH, Lqp, Dh), jnp.float32),
        )(g0, g1, w0, w1, *vs)
        return out, (g0, g1, w0, w1) + tuple(vs)

    def core_bwd(res, dout):
        g0, g1, w0, w1 = res[:4]
        vs = res[4:]
        BH, K, Lqp = g0.shape
        QT, tap, vspecs, ospec = specs(Lqp)
        outs = pl.pallas_call(
            functools.partial(_bwd_kernel, L=L, P=P, BS=BS),
            grid=(BH, QT),
            in_specs=[tap, tap, tap, tap] + vspecs + [ospec],
            out_specs=tuple(vspecs) + (tap, tap),
            out_shape=tuple(
                jax.ShapeDtypeStruct(v.shape, jnp.float32) for v in vs
            ) + (jax.ShapeDtypeStruct((BH, K, Lqp), jnp.float32),) * 2,
        )(g0, g1, w0, w1, *vs, dout.astype(jnp.float32))
        dvs = outs[:L]
        dw0, dw1 = outs[L], outs[L + 1]
        return (None, None, dw0, dw1) + tuple(dvs)

    core.defvjp(core_fwd, core_bwd)
    return core


def ms_deform_attn_1d_banded(value: jnp.ndarray,
                             temporal_shapes: Sequence[int],
                             loc: jnp.ndarray,
                             attn: jnp.ndarray,
                             margin: int = 32) -> jnp.ndarray:
    """Banded encoder MSDA (see module docstring). Requires Lq == S."""
    B, S, H, Dh = value.shape
    _, Lq, _, L, P = loc.shape
    shapes = [int(t) for t in temporal_shapes]
    assert Lq == S == sum(shapes), "banded kernel is for token queries"
    shapes_pad = tuple(_round_up(t, 8) for t in shapes)

    g0, g1, w0, w1 = _prep_taps(shapes, loc, attn)
    starts = np.cumsum([0] + shapes)[:-1]
    starts_a = jnp.asarray(starts, jnp.int32)[None, None, None, :, None]
    g0l = g0 - starts_a
    g1l = g1 - starts_a

    # per-level padded f32 value planes (BH, T_l_pad, Dh)
    vf = value.astype(jnp.float32).transpose(0, 2, 1, 3).reshape(
        B * H, S, Dh)
    v_levels = []
    for l in range(L):
        vl = jax.lax.slice_in_dim(vf, int(starts[l]),
                                  int(starts[l]) + shapes[l], axis=1)
        if shapes_pad[l] != shapes[l]:
            vl = jnp.pad(vl, ((0, 0), (0, shapes_pad[l] - shapes[l]),
                              (0, 0)))
        v_levels.append(vl)

    outs = []
    qs = 0
    for lq, Tq in enumerate(shapes):
        Lqp = _round_up(max(Tq, _TQ), _TQ)

        def pack(x, dtype, fill=0):
            xl = jax.lax.slice_in_dim(x, qs, qs + Tq, axis=1)
            xl = xl.astype(dtype).transpose(0, 2, 3, 4, 1).reshape(
                B * H, L * P, Tq)
            return jnp.pad(xl, ((0, 0), (0, 0), (0, Lqp - Tq)),
                           constant_values=fill)

        BS = _band_sizes(shapes_pad, Tq, margin)
        core = _banded_core(L, P, BS, shapes_pad, Dh)
        out = core(pack(g0l, jnp.int32, _PAD_G), pack(g1l, jnp.int32, _PAD_G),
                   pack(w0, jnp.float32), pack(w1, jnp.float32), *v_levels)
        outs.append(out[:, :Tq])
        qs += Tq

    out = jnp.concatenate(outs, axis=1)                  # (BH, S, Dh)
    out = out.reshape(B, H, S, Dh).transpose(0, 2, 1, 3)
    return out.reshape(B, S, H * Dh).astype(value.dtype)
