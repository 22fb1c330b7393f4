"""Deformable transformer encoder/decoder over the temporal pyramid.

Behavioral spec: reference pdvc/deformable_transformer.py — encoder layers of
MSDeformAttn self-attention + FFN; decoder layers of standard multi-head
self-attention over queries + MSDeformAttn cross-attention into memory + FFN;
iterative box refinement driven by per-layer bbox heads.

Structure differs from the torch original on purpose: the decoder loop lives
in the top-level model (gvl.py) so that the per-layer bbox heads are plain
shared submodules instead of the reference's post-hoc attribute hack
(pdvc/pdvc.py:140). Everything here is static-shape and jit-friendly.
"""

from __future__ import annotations

import math
from typing import List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from gvl_tpu.models.layers import MSDeformAttn1D


def pyramid_shapes(T: int, num_levels: int):
    """Static per-level lengths of the stride-2 pyramid for frame count T."""
    shapes = [int(T)]
    for _ in range(1, num_levels):
        shapes.append((shapes[-1] + 1) // 2)
    return tuple(shapes)


def flatten_levels(srcs, masks, poses, level_embed):
    """Concatenate pyramid levels into one (B, S, C) sequence.

    Returns (src_flat, mask_flat, pos_flat, temporal_shapes, valid_ratios).
    Reference: prepare_encoder_inputs (deformable_transformer.py:85-115).
    """
    temporal_shapes = tuple(int(s.shape[1]) for s in srcs)
    src_flat = jnp.concatenate(srcs, axis=1)
    mask_flat = jnp.concatenate(masks, axis=1)
    pos_flat = jnp.concatenate(
        [p + level_embed[l][None, None, :] for l, p in enumerate(poses)], axis=1)
    valid_ratios = jnp.stack(
        [m.astype(jnp.float32).sum(1) / m.shape[1] for m in masks], axis=1)
    return src_flat, mask_flat, pos_flat, temporal_shapes, valid_ratios


def encoder_reference_points(temporal_shapes: Sequence[int],
                             valid_ratios: jnp.ndarray) -> jnp.ndarray:
    """Per-position normalized reference coordinate, per level: (B, S, L, 1).
    Reference: DeformableTransformerEncoder.get_reference_points
    (deformable_transformer.py:208-218)."""
    refs = []
    for lvl, T in enumerate(temporal_shapes):
        r = (jnp.arange(T, dtype=jnp.float32) + 0.5)[None, :]      # (1, T)
        r = r / (valid_ratios[:, None, lvl] * T)                   # (B, T)
        refs.append(r)
    ref = jnp.concatenate(refs, axis=1)                            # (B, S)
    ref = ref[:, :, None] * valid_ratios[:, None, :]               # (B, S, L)
    return ref[:, :, :, None]


def proposal_pos_embed(boxes_logit: jnp.ndarray, num_pos_feats: int = 256,
                       temperature: float = 10000.0) -> jnp.ndarray:
    """Sinusoidal embedding of (center, length) proposals (pre-sigmoid input).
    Reference: get_proposal_pos_embed (deformable_transformer.py:66-79).
    Returns (B, N, 2 * num_pos_feats)."""
    scale = 2 * math.pi
    i = jnp.arange(num_pos_feats, dtype=jnp.float32)
    dim_t = temperature ** (2 * jnp.floor(i / 2) / num_pos_feats)
    p = jax.nn.sigmoid(boxes_logit) * scale
    pos = p[..., None] / dim_t                                     # (B,N,2,F)
    pos = jnp.stack([jnp.sin(pos[..., 0::2]), jnp.cos(pos[..., 1::2])],
                    axis=-1)
    return pos.reshape(pos.shape[0], pos.shape[1], -1)


class FFN(nn.Module):
    d_model: int
    d_ffn: int
    dropout: float

    @nn.compact
    def __call__(self, x, deterministic: bool):
        h = nn.relu(nn.Dense(self.d_ffn, name="linear1")(x))
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = nn.Dense(self.d_model, name="linear2")(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        return nn.LayerNorm(epsilon=1e-5, name="norm")(x + h)


class DeformableEncoderLayer(nn.Module):
    d_model: int
    d_ffn: int
    n_levels: int
    n_heads: int
    n_points: int
    dropout: float = 0.1
    msda_impl: str = "pallas"
    band_margin: int = 32

    @nn.compact
    def __call__(self, src, pos, reference_points, mask_flat,
                 temporal_shapes, deterministic: bool = True):
        h = MSDeformAttn1D(self.d_model, self.n_levels, self.n_heads,
                           self.n_points, impl=self.msda_impl,
                           band_margin=self.band_margin,
                           name="self_attn")(
            src + pos, reference_points, src, mask_flat, temporal_shapes)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        src = nn.LayerNorm(epsilon=1e-5, name="norm1")(src + h)
        return FFN(self.d_model, self.d_ffn, self.dropout, name="ffn")(
            src, deterministic)


class DeformableEncoder(nn.Module):
    d_model: int
    d_ffn: int
    num_layers: int
    n_levels: int
    n_heads: int
    n_points: int
    dropout: float = 0.1
    msda_impl: str = "pallas"
    band_margin: int = 32
    remat: bool = False

    @nn.compact
    def __call__(self, src, pos, mask_flat, temporal_shapes, valid_ratios,
                 deterministic: bool = True):
        ref = encoder_reference_points(temporal_shapes, valid_ratios)
        # remat: recompute the layer in the backward pass instead of
        # storing its (B, S, C) intermediates — the encoder dominates
        # activation memory at long-video S (static argnums:
        # temporal_shapes tuple + deterministic flag)
        cls = nn.remat(DeformableEncoderLayer, static_argnums=(5, 6)) \
            if self.remat else DeformableEncoderLayer
        out = src
        for i in range(self.num_layers):
            out = cls(
                self.d_model, self.d_ffn, self.n_levels, self.n_heads,
                self.n_points, self.dropout, self.msda_impl,
                self.band_margin,
                name=f"layer_{i}")(out, pos, ref, mask_flat, temporal_shapes,
                                   deterministic)
        return out


class DeformableDecoderLayer(nn.Module):
    d_model: int
    d_ffn: int
    n_levels: int
    n_heads: int
    n_points: int
    dropout: float = 0.1
    msda_impl: str = "pallas"

    @nn.compact
    def __call__(self, tgt, query_pos, reference_points_input, memory,
                 mask_flat, temporal_shapes, query_mask,
                 deterministic: bool = True):
        # self attention over queries
        q = tgt + query_pos
        attn_mask = query_mask[:, None, None, :] if query_mask is not None else None
        h = nn.MultiHeadDotProductAttention(
            num_heads=self.n_heads, qkv_features=self.d_model,
            dropout_rate=self.dropout, deterministic=deterministic,
            name="self_attn")(q, q, tgt, mask=attn_mask)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        tgt = nn.LayerNorm(epsilon=1e-5, name="norm2")(tgt + h)

        # deformable cross attention into memory
        h = MSDeformAttn1D(self.d_model, self.n_levels, self.n_heads,
                           self.n_points, impl=self.msda_impl,
                           name="cross_attn")(
            tgt + query_pos, reference_points_input, memory, mask_flat,
            temporal_shapes)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        tgt = nn.LayerNorm(epsilon=1e-5, name="norm1")(tgt + h)

        return FFN(self.d_model, self.d_ffn, self.dropout, name="ffn")(
            tgt, deterministic)


def expand_reference_for_levels(reference_points: jnp.ndarray,
                                valid_ratios: jnp.ndarray) -> jnp.ndarray:
    """(B, Nq, 1|2) -> (B, Nq, L, 1|2) scaled by per-level valid ratios.
    Reference: deformable_transformer.py:301-306 / LSTM_DSA.py:74-78."""
    if reference_points.shape[-1] == 2:
        vr = jnp.stack([valid_ratios, valid_ratios], -1)      # (B, L, 2)
        return reference_points[:, :, None, :] * vr[:, None, :, :]
    return reference_points[:, :, None, :] * valid_ratios[:, None, :, None]
