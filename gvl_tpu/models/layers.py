"""Shared flax building blocks: MLP heads, attention-module init helpers,
and the deformable-attention flax module wrapping gvl_tpu.ops.

Behavioral spec: pdvc/pdvc.py:1166-1178 (MLP), pdvc/ops/modules/
ms_deform_attn.py (MSDeformAttn projections + directional offset init).
"""

from __future__ import annotations

import math
from typing import Callable, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from gvl_tpu.ops import ms_deform_attn_1d, ms_deform_attn_1d_sampled_values


class MLP(nn.Module):
    """ReLU MLP with `num_layers` Linear layers (last one un-activated)."""
    hidden_dim: int
    output_dim: int
    num_layers: int
    # optional init override for the final layer
    final_kernel_init: Optional[Callable] = None
    final_bias_init: Optional[Callable] = None

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers - 1):
            x = nn.relu(nn.Dense(self.hidden_dim, name=f"layers_{i}")(x))
        kw = {}
        if self.final_kernel_init is not None:
            kw["kernel_init"] = self.final_kernel_init
        if self.final_bias_init is not None:
            kw["bias_init"] = self.final_bias_init
        return nn.Dense(self.output_dim, name=f"layers_{self.num_layers - 1}", **kw)(x)


def _directional_offset_bias(n_heads: int, n_levels: int, n_points: int):
    """Initial sampling-offset biases: heads alternate ±1 direction, points
    step outward ×(p+1) — the 1-D reduction of Deformable-DETR's radial init
    (reference: pdvc/ops/modules/ms_deform_attn.py:62-71).
    """
    thetas = jnp.arange(n_heads, dtype=jnp.float32) * (2.0 * math.pi / n_heads)
    grid = jnp.stack([jnp.cos(thetas), jnp.sin(thetas)], -1)
    grid = grid / jnp.max(jnp.abs(grid), axis=-1, keepdims=True)
    dirs = grid[:, 0]                                     # (H,) in [-1, 1]
    bias = jnp.tile(dirs[:, None, None], (1, n_levels, n_points))
    bias = bias * (jnp.arange(n_points, dtype=jnp.float32) + 1.0)
    return bias.reshape(-1)


class MSDeformAttn1D(nn.Module):
    """Multi-scale deformable attention over a flattened temporal pyramid.

    query            (B, Lq, C)
    reference_points (B, Lq, L, 1) or (B, Lq, L, 2) (center [, length])
    memory           (B, S, C)  flattened levels
    memory_mask      (B, S) bool, True = valid
    temporal_shapes  static tuple of per-level lengths
    Returns (B, Lq, C).
    """
    d_model: int
    n_levels: int = 4
    n_heads: int = 8
    n_points: int = 4
    impl: str = "pallas"
    band_margin: int = 32   # banded-kernel halo (positions) for long-seq
                            # encoder self-attn; 0 disables the banded path
    # query dim multiplier for the captioner variant (reference:
    # ms_deform_attn_for_caption.py:54-59 uses 2*d or 3*d queries)
    return_sampled_values: bool = False
    center_offset_bias: bool = False  # captioner centers the point fan

    def setup(self):
        H, L, P = self.n_heads, self.n_levels, self.n_points
        bias0 = _directional_offset_bias(H, L, P)
        if self.center_offset_bias:
            b = bias0.reshape(H, L, P)
            bias0 = (b - b.mean(axis=2, keepdims=True)).reshape(-1)
        self.sampling_offsets = nn.Dense(
            H * L * P, kernel_init=nn.initializers.zeros,
            bias_init=lambda *_: bias0)
        self.attention_weights = nn.Dense(
            H * L * P, kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros)
        self.value_proj = nn.Dense(self.d_model,
                                   kernel_init=nn.initializers.xavier_uniform())
        if not self.return_sampled_values:
            self.output_proj = nn.Dense(
                self.d_model, kernel_init=nn.initializers.xavier_uniform())

    def __call__(self, query, reference_points, memory, memory_mask,
                 temporal_shapes: Sequence[int]):
        B, Lq, _ = query.shape
        H, L, P = self.n_heads, self.n_levels, self.n_points
        Dh = self.d_model // H

        value = self.value_proj(memory)
        if memory_mask is not None:
            value = jnp.where(memory_mask[..., None], value, 0.0)
        value = value.reshape(B, -1, H, Dh)

        offsets = self.sampling_offsets(query).reshape(B, Lq, H, L, P)
        attn = self.attention_weights(query).reshape(B, Lq, H, L * P)
        attn = jax.nn.softmax(attn, axis=-1).reshape(B, Lq, H, L, P)

        shapes = jnp.asarray(temporal_shapes, dtype=offsets.dtype)
        if reference_points.shape[-1] == 1:
            # absolute per-level normalized center + offset/T_l
            loc = (reference_points[:, :, None, :, None, 0]
                   + offsets / shapes[None, None, None, :, None])
        elif reference_points.shape[-1] == 2:
            # box-conditioned: offsets scale with the box length
            loc = (reference_points[:, :, None, :, None, 0]
                   + offsets / self.n_points
                   * reference_points[:, :, None, :, None, 1] * 0.5)
        else:
            raise ValueError("reference_points last dim must be 1 or 2")

        shapes_t = tuple(int(t) for t in temporal_shapes)
        if self.return_sampled_values:
            return ms_deform_attn_1d_sampled_values(value, shapes_t, loc,
                                                    attn)
        from gvl_tpu.parallel.sp import get_sp_context
        ctx = get_sp_context()
        if ctx is not None:
            # sequence-parallel routing: encoder self-attention (one query
            # per memory token) shards queries + halo-exchanges values;
            # decoder cross-attention replicates its few queries and psums
            # partial gathers (see ops/ms_deform_attn_sp.py)
            from gvl_tpu.ops.ms_deform_attn_sp import ms_deform_attn_1d_sp
            mode = "tokens" if Lq == sum(shapes_t) else "replicated"
            out = ms_deform_attn_1d_sp(
                value, shapes_t, loc, attn, mesh=ctx.mesh,
                sp_axis=ctx.sp_axis, dp_axis=ctx.dp_axis, queries=mode,
                halo_frac=ctx.halo_frac, impl=self.impl,
                return_clamp_count=ctx.clamp_monitor)
            if ctx.clamp_monitor:
                out, n_clamped = out
                # retrieve with apply(..., mutable=['sp_debug']); 0 == the
                # sp halo approximation was inactive for this layer's offsets
                self.sow("sp_debug", "halo_clamped", n_clamped,
                         reduce_fn=lambda a, b: a + b, init_fn=lambda:
                         jnp.int32(0))
        else:
            impl = self.impl
            if impl == "pallas" and Lq == sum(shapes_t) and \
                    sum(shapes_t) >= 512 and self.band_margin > 0:
                # long-sequence encoder self-attention: the dense kernel's
                # W build is O(K*S) per query tile; the banded kernel cuts
                # it to O(K*band) (DESIGN.md par.10). Taps beyond the margin
                # clamp to the band edge — set band_margin=0 to force the
                # exact dense kernel (e.g. models trained with very large
                # learned offsets).
                from gvl_tpu.ops.ms_deform_attn_banded import \
                    ms_deform_attn_1d_banded
                out = ms_deform_attn_1d_banded(value, shapes_t, loc, attn,
                                               margin=self.band_margin)
            else:
                out = ms_deform_attn_1d(value, shapes_t, loc, attn,
                                        impl=impl)
        return self.output_proj(out)
