"""GVL-TPU: a TPU-native (JAX/XLA/Pallas) framework for untrimmed-video understanding.

Re-designed from scratch with the capabilities of zjr2000/GVL (PDVC + text
contrastive learning): dense video captioning, paragraph captioning,
single/multi-sentence video grounding, temporal action localization, and
SCST reinforcement fine-tuning — built TPU-first:

- the multi-scale deformable attention CUDA op (reference: pdvc/ops/) is a
  fused Pallas kernel (`gvl_tpu.ops.ms_deform_attn`);
- the model is a pure-functional flax.linen module compiled by XLA with
  static shapes (`gvl_tpu.models`);
- Hungarian matching runs jit-compiled on device (`gvl_tpu.train.lap`);
- scaling is SPMD over a `jax.sharding.Mesh` (`gvl_tpu.parallel`), not NCCL.
"""

__version__ = "0.1.0"

from gvl_tpu.config import Config, load_config  # noqa: F401
