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


def bf16_cast_caption_params(params):
    """Cast only the caption-head subtree(s) of a model param dict to
    bfloat16 (train_caption_bf16): keeps the trunk/criterion params f32 in
    the same `model.apply` tree and keeps the traced jaxpr free of dead
    casts for the other ~hundreds of leaves."""
    inner = dict(params["params"])
    for k in list(inner):
        if k.startswith("caption_head"):
            inner[k] = bf16_cast_tree(inner[k])
    out = dict(params)
    out["params"] = inner
    return out
