"""Mixed-precision helpers (the reference's torch.cuda.amp.autocast
counterpart for the train_use_amp / eval_use_amp / eval_decode_bf16 paths:
pdvc.py:214-215)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def bf16_cast_tree(tree):
    """Cast every float32 leaf of a pytree to bfloat16 (ints, bools and
    non-arrays pass through)."""
    def cast(x):
        if hasattr(x, "dtype") and x.dtype == jnp.float32:
            return x.astype(jnp.bfloat16)
        return x
    return jax.tree_util.tree_map(cast, tree)
