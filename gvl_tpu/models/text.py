"""Text-side modeling: word-level pooling, sentence-level context, and the
contrastive text projections.

Behavioral spec: reference pdvc/pdvc.py:211-248 (text_encoding),
WordLevelContextModeling (pdvc.py:1092-1104) and SentenceLevelContextModeling
(pdvc.py:1107-1163, a 1-layer BERT-style block over each video's sentences
with optional cosine position embedding and optional cross-attention into the
video memory).

Layout: the reference flattens all captions of a batch into one ragged list;
here sentences are padded per video to (B, G, ...) so every op is static-shape
and batched — the per-video python loop (pdvc.py:227-243) becomes masked
tensor ops.
"""

from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


class WordAttentionPool(nn.Module):
    """alpha = softmax(w2(gelu(w1(x)))) over tokens; feat = sum alpha*x."""
    hidden_size: int

    @nn.compact
    def __call__(self, x, token_mask):
        # x (..., Ltok, D); token_mask (..., Ltok) bool
        # exact (erf) gelu: torch F.gelu default, reference pdvc.py:1100
        q = nn.gelu(nn.Dense(self.hidden_size, name="w1")(x),
                    approximate=False)
        alpha = nn.Dense(1, name="w2")(q)[..., 0]
        alpha = jnp.where(token_mask, alpha, -1e4)
        alpha = jax.nn.softmax(alpha, axis=-1)
        return jnp.einsum("...t,...td->...d", alpha, x)


def pool_words(kind: str, hidden_size: int, name: str):
    if kind == "attention_pool":
        return WordAttentionPool(hidden_size, name=name)
    if kind == "max_pool":
        return lambda x, m: jnp.max(jnp.where(m[..., None], x, -1e9), axis=-2)
    if kind == "mean_pool":
        return lambda x, m: ((x * m[..., None]).sum(-2)
                             / (1e-5 + m.sum(-1, keepdims=True)))
    raise ValueError(kind)


def bert_head_count(width: int) -> int:
    """BertConfig's default 12 attention heads, degrading to the largest
    divisor for tiny test widths (the reference, which always uses 12,
    would just crash there). Shared by the model builder and the
    checkpoint importer so the head split can never drift."""
    if width % 12 == 0:
        return 12
    return next(h for h in (8, 6, 4, 3, 2, 1) if width % h == 0)


def _cosine_pos_table(max_len: int, dim: int) -> jnp.ndarray:
    pos = jnp.arange(max_len, dtype=jnp.float32)[:, None]
    div = jnp.exp(jnp.arange(0, dim, 2, dtype=jnp.float32)
                  * -(math.log(10000.0) / dim))
    tab = jnp.zeros((max_len, dim))
    tab = tab.at[:, 0::2].set(jnp.sin(pos * div))
    tab = tab.at[:, 1::2].set(jnp.cos(pos * div))
    return tab


class SentenceContextBlock(nn.Module):
    """BERT-style transformer block(s) over each video's sentence features.

    hidden defaults follow BertConfig (12 heads, 4x FFN, gelu, post-LN),
    matching the reference's `BertEncoder(BertConfig(...))` instantiation.
    """
    hidden_dim: int
    num_layers: int = 1
    enable_pos_embedding: bool = False
    pos_embedding_type: str = "cosine"
    max_pos_num: int = 500
    cross_fusion: bool = False
    memory_dim: int = 512
    n_heads: int = 12
    dropout: float = 0.1
    # BertConfig defaults: intermediate_size is the CONSTANT 3072 (the
    # reference only overrides hidden_size, pdvc.py:1124-1131) and
    # layer_norm_eps is 1e-12
    ffn_dim: int = 3072
    ln_eps: float = 1e-12

    @nn.compact
    def __call__(self, sent_feat, sent_mask, memory=None, memory_mask=None,
                 deterministic: bool = True):
        # sent_feat (B, G, D); sent_mask (B, G) bool
        x = sent_feat
        if self.enable_pos_embedding:
            G = x.shape[1]
            if self.pos_embedding_type == "cosine":
                tab = _cosine_pos_table(self.max_pos_num, self.hidden_dim)[:G]
            else:
                tab = self.param("pos_table", nn.initializers.normal(0.02),
                                 (self.max_pos_num, self.hidden_dim))[:G]
            x = x + tab[None, :, :]

        attn_mask = sent_mask[:, None, None, :]
        cross_scores = None
        for i in range(self.num_layers):
            h = nn.MultiHeadDotProductAttention(
                num_heads=self.n_heads, qkv_features=self.hidden_dim,
                dropout_rate=self.dropout, deterministic=deterministic,
                name=f"self_attn_{i}")(x, x, x, mask=attn_mask)
            x = nn.LayerNorm(epsilon=self.ln_eps, name=f"norm1_{i}")(x + h)
            if self.cross_fusion and memory is not None:
                mem = nn.Dense(self.hidden_dim, name="memory_projection")(memory)
                cmask = (memory_mask[:, None, None, :]
                         if memory_mask is not None else None)
                h = nn.MultiHeadDotProductAttention(
                    num_heads=self.n_heads, qkv_features=self.hidden_dim,
                    dropout_rate=self.dropout, deterministic=deterministic,
                    name=f"cross_attn_{i}")(x, mem, mem, mask=cmask)
                x = nn.LayerNorm(epsilon=self.ln_eps,
                                 name=f"norm_cross_{i}")(x + h)
            h = nn.gelu(nn.Dense(self.ffn_dim, name=f"ffn1_{i}")(x),
                        approximate=False)
            h = nn.Dense(self.hidden_dim, name=f"ffn2_{i}")(h)
            x = nn.LayerNorm(epsilon=self.ln_eps, name=f"norm2_{i}")(x + h)
        return x, cross_scores
