"""Device mesh + sharding utilities.

The reference has no multi-device training in its main trainer (its only
torch.distributed use is the optional TSP backbone; see SURVEY.md §2.9). The
TPU-native scaling story is pure SPMD:

- axes: 'dp' (data/batch) x optional 'sp' (sequence — the flattened temporal
  axis of video features/memory, for videos beyond per-chip HBM);
- batches are placed with NamedSharding over 'dp' (and 'sp' on the frame
  axis when the mesh has one); parameters are replicated;
- elementwise/matmul work is XLA's job (the contrastive loss's cross-video
  negatives become a logical all-gather over 'dp'); the deformable-attention
  gathers across 'sp' shards are NOT left to the partitioner (XLA would
  all-gather the sharded memory for arbitrary gather indices) — they run
  through an explicit shard_map op with per-level halo exchange / psum
  (gvl_tpu/ops/ms_deform_attn_sp.py, enabled via gvl_tpu/parallel/sp.py).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, shape: str = "dp") -> Mesh:
    """shape: 'dp' (1-D data parallel) or 'dp,sp' (2-D with sequence axis;
    sp gets the trailing factor of 2 when the device count allows)."""
    devices = jax.devices()[:n_devices] if n_devices else jax.devices()
    n = len(devices)
    if shape == "dp" or n < 4:
        return Mesh(np.asarray(devices), ("dp",))
    if shape in ("dp,sp", "dp_sp"):
        sp = 2
        if n % sp != 0:
            # odd device count (e.g. batch-divisibility picked dp=5):
            # a 2-D reshape is impossible — fall back to data parallel
            return Mesh(np.asarray(devices), ("dp",))
        return Mesh(np.asarray(devices).reshape(n // sp, sp), ("dp", "sp"))
    raise ValueError(f"unknown mesh shape {shape}")


def make_mesh_for_batch(batch_size: int, shape: str = "dp") -> Mesh:
    """Largest mesh (<= all devices) whose 'dp' axis divides batch_size.

    Warns loudly when the batch size forces fewer devices than available —
    silent degradation to dp=1 means paying for chips that idle."""
    n = len(jax.devices())
    dp = n
    while dp > 1 and batch_size % dp != 0:
        dp -= 1
    if dp < n:
        import warnings
        warnings.warn(
            f"batch_size={batch_size} is not divisible by the {n} available "
            f"devices; using a dp={dp} mesh ({n - dp} devices idle). Pick a "
            f"batch size divisible by {n} to use the full mesh.",
            stacklevel=2)
    return make_mesh(dp, shape if dp >= 4 else "dp")


def batch_sharding(mesh: Mesh, array_ndim: int, seq_axis: Optional[int] = None
                   ) -> NamedSharding:
    spec = [None] * array_ndim
    spec[0] = "dp"
    if seq_axis is not None and "sp" in mesh.axis_names:
        spec[seq_axis] = "sp"
    return NamedSharding(mesh, P(*spec))


def shard_batch(batch: Dict, mesh: Mesh, seq_keys: Sequence[str] = ("video_feats",
                                                                    "video_mask")):
    """Place numpy batch arrays on the mesh: batch dim over 'dp', the frame
    dim of video tensors over 'sp' when present. Non-array (host) entries
    pass through."""
    out = {}
    for k, v in batch.items():
        if isinstance(v, np.ndarray) or hasattr(v, "shape"):
            seq_axis = 1 if (k in seq_keys and v.ndim >= 2) else None
            out[k] = jax.device_put(v, batch_sharding(mesh, v.ndim, seq_axis))
        else:
            out[k] = v
    return out


def replicate_tree(tree, mesh: Mesh):
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)
