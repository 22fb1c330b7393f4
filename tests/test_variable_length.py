"""Variable-length mode (data_rescale=0): bucketed padding + shape-derived
pyramid in the train step."""

import jax
import jax.numpy as jnp
import numpy as np

from gvl_tpu.train.criterion import LossSpec, make_weight_dict
from gvl_tpu.train.state import (StepStatics, create_train_state,
                                 make_train_step)
from tests.test_train_smoke import add_text, build_world, device_batch


def test_bucketed_collate_and_step(tmp_path, rng):
    cfg, ds, batcher, bundle, model = build_world(
        tmp_path, data_rescale=0, length_bucket=32)
    batch = add_text(next(iter(batcher)), bundle, cfg)
    T = batch["video_feats"].shape[1]
    assert T % 32 == 0
    assert not np.all(batch["video_mask"])  # real padding present

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
        disable_mid_caption_heads=True, enable_pos_emb_for_captioner=False,
        # deliberately wrong static shapes: the step must derive the pyramid
        # from the batch, not from frame_embedding_num
        temporal_shapes=tuple(cfg.temporal_shapes()))
    assert sum(statics.temporal_shapes) != sum(
        cfg.temporal_shapes(T)), "test needs a different bucket than cfg T"
    state = create_train_state(cfg, model, params, bundle.params, 4, statics)
    step_fn, _, _ = make_train_step(model, bundle.apply_fn, cfg, statics)
    weights = {k: jnp.asarray(v, jnp.float32)
               for k, v in make_weight_dict(cfg).items()}
    state, losses = jax.jit(step_fn)(state, db, weights,
                                     jax.random.PRNGKey(0))
    assert np.isfinite(float(losses["total_loss"]))
