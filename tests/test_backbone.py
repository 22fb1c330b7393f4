"""R(2+1)D backbone + TSP model shape tests (tiny dims)."""

import jax
import jax.numpy as jnp
import numpy as np

from gvl_tpu.backbone.r2plus1d import R2Plus1D, TSPModel
from gvl_tpu.backbone.tsp import make_clips


def test_r2plus1d_feature_shape(rng):
    model = R2Plus1D(block_counts=(1, 1, 1, 1))
    x = jnp.asarray(rng.randn(2, 4, 32, 32, 3).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    feat = model.apply(variables, x, train=False)
    assert feat.shape == (2, 512)
    assert np.isfinite(np.asarray(feat)).all()


def test_tsp_model_heads(rng):
    model = TSPModel(num_classes_list=(5, 2), backbone="r3d_18")
    x = jnp.asarray(rng.randn(2, 4, 32, 32, 3).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    feat, logits = model.apply(variables, x, train=False)
    assert feat.shape == (2, 512)
    assert logits[0].shape == (2, 5) and logits[1].shape == (2, 2)


def test_make_clips():
    frames = np.arange(10)[:, None, None, None] * np.ones((10, 2, 2, 3),
                                                          np.float32)
    clips = make_clips(frames, clip_len=4, stride=4)
    assert clips.shape == (3, 4, 2, 2, 3)
    # last clip padded by repeating the final frame
    assert (clips[2, -1] == 9).all() and (clips[2, 0] == 8).all()
