"""Temporal multi-scale pyramid + positional encoding.

Behavioral spec: reference pdvc/base_encoder.py (stride-2 Conv1d pyramid with
GroupNorm(32)) and pdvc/position_encoding.py (normalized 1-D sine embedding
concatenated with a learned binary-duration embedding).

TPU notes: convs run as (B, T, C) lax.conv over a static T, so XLA maps them
onto the MXU; masks are computed with the same nearest-neighbor index rule
PyTorch's F.interpolate uses, but as a static gather.
"""

from __future__ import annotations

import math
from typing import List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class SineDurationPositionEncoding(nn.Module):
    """pos = [sine(cum-position, hidden//2) ; Linear(binary duration<=i)].

    Reference: pdvc/position_encoding.py:38-64. num_pos_feats = hidden//2 and
    max_duration = 256 so the output width is hidden//2 + 256 (= hidden for
    hidden=512).
    """
    num_pos_feats: int
    duration_feats: int  # reference uses 256 (= hidden - num_pos_feats at 512)
    temperature: float = 10000.0
    max_duration: int = 256

    @nn.compact
    def __call__(self, valid_mask: jnp.ndarray, duration: jnp.ndarray):
        # valid_mask (B, T) bool; duration (B,) float seconds
        scale = 2 * math.pi
        not_mask = valid_mask.astype(jnp.float32)
        x_embed = jnp.cumsum(not_mask, axis=1)
        x_embed = (x_embed - 0.5) / (x_embed[:, -1:] + 1e-6) * scale

        i = jnp.arange(self.num_pos_feats, dtype=jnp.float32)
        dim_t = self.temperature ** (2 * jnp.floor(i / 2) / self.num_pos_feats)
        pos = x_embed[:, :, None] / dim_t                    # (B, T, F)
        pos = jnp.stack([jnp.sin(pos[:, :, 0::2]),
                         jnp.cos(pos[:, :, 1::2])], axis=3).reshape(
                             pos.shape[0], pos.shape[1], -1)

        dur_onehot = (jnp.arange(self.max_duration)[None, :]
                      < duration.astype(jnp.int32)[:, None]).astype(jnp.float32)
        dur = nn.Dense(self.duration_feats, name="duration_embed")(dur_onehot)
        dur = jnp.broadcast_to(dur[:, None, :],
                               (pos.shape[0], pos.shape[1], self.duration_feats))
        return jnp.concatenate([pos, dur], axis=2)           # (B, T, hidden)


def nearest_downsample_mask(mask: jnp.ndarray, new_len: int) -> jnp.ndarray:
    """Downsample a (B, T) bool mask to (B, new_len) with the same index rule
    as F.interpolate(mode='nearest'): src = floor(dst * T / new_len)."""
    T = mask.shape[1]
    idx = jnp.floor(jnp.arange(new_len) * (T / new_len)).astype(jnp.int32)
    return mask[:, idx]


class BasePyramidEncoder(nn.Module):
    """Raw features -> L-level temporal pyramid of (features, mask, pos).

    Level 0: pointwise Conv + GroupNorm(32) projection to hidden_dim.
    Level l>=1: k=3 s=2 Conv (+GroupNorm) of raw features (l=1) or of the
    previous level (l>=2). Reference: pdvc/base_encoder.py:30-82.
    """
    num_feature_levels: int
    hidden_dim: int

    @nn.compact
    def __call__(self, feats: jnp.ndarray, valid_mask: jnp.ndarray,
                 duration: jnp.ndarray
                 ) -> Tuple[List[jnp.ndarray], List[jnp.ndarray], List[jnp.ndarray]]:
        # feats (B, T, D); valid_mask (B, T) bool; duration (B,)
        pos_enc = SineDurationPositionEncoding(
            self.hidden_dim // 2, self.hidden_dim - self.hidden_dim // 2,
            name="pos_embed")

        def proj(name, x, kernel, stride):
            x = nn.Conv(self.hidden_dim, kernel_size=(kernel,),
                        strides=(stride,), padding=[(kernel // 2, kernel // 2)],
                        kernel_init=nn.initializers.xavier_uniform(),
                        name=f"{name}_conv")(x)
            return nn.GroupNorm(num_groups=32, epsilon=1e-5, name=f"{name}_norm")(x)

        srcs = [proj("input_proj_0", feats, 1, 1)]
        masks = [valid_mask]
        poses = [pos_enc(valid_mask, duration)]
        for l in range(1, self.num_feature_levels):
            src = proj(f"input_proj_{l}", feats if l == 1 else srcs[-1], 3, 2)
            m = nearest_downsample_mask(valid_mask, src.shape[1])
            srcs.append(src)
            masks.append(m)
            poses.append(pos_enc(m, duration))
        return srcs, masks, poses
