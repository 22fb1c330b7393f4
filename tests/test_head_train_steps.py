"""Train-step smoke for the light and transformer caption heads: the fused
caption path is gated to standard/light (train/state.py:272-275), so these
exercise both the light fused fold and the transformer per-layer fallback —
plus a loss-decrease check that the heads actually learn."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gvl_tpu.models import build_model
from gvl_tpu.train.criterion import LossSpec, make_weight_dict
from gvl_tpu.train.state import (StepStatics, create_train_state,
                                 make_train_step)
from tests.test_train_smoke import add_text, build_world, device_batch


@pytest.mark.parametrize("head,extra", [
    ("light", {}),
    ("transformer", {"input_encoding_size": 64}),   # must equal hidden_dim
])
def test_head_train_step(tmp_path, rng, head, extra):
    cfg, ds, batcher, bundle, model = build_world(
        tmp_path, caption_decoder_type=head, **extra)
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
        disable_mid_caption_heads=False, enable_pos_emb_for_captioner=False,
        temporal_shapes=tuple(cfg.temporal_shapes()))
    state = create_train_state(cfg, model, params, bundle.params, 4, statics)
    step_fn, _, _ = make_train_step(model, bundle.apply_fn, cfg, statics)
    step_jit = jax.jit(step_fn)
    weights = {k: jnp.asarray(v, jnp.float32)
               for k, v in make_weight_dict(cfg).items()}

    hist = []
    for i in range(8):
        state, losses = step_jit(state, db, weights, jax.random.PRNGKey(i))
        hist.append(float(losses["total_loss"]))
    assert np.isfinite(hist).all(), hist
    assert "loss_caption" in losses
    assert float(losses["loss_caption"]) > 0
    # overfitting one batch must reduce the loss
    assert hist[-1] < hist[0], hist
