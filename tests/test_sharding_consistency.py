"""SPMD correctness: the jitted train step computes the same loss whether
the batch lives on one device or is sharded over the 8-device dp mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from gvl_tpu.parallel import make_mesh, replicate_tree, shard_batch
from gvl_tpu.train.criterion import LossSpec, make_weight_dict
from gvl_tpu.train.state import (StepStatics, create_train_state,
                                 make_train_step)
from tests.test_train_smoke import add_text, build_world, device_batch


def test_dp_sharding_matches_single_device(tmp_path, rng):
    cfg, ds, batcher, bundle, model = build_world(tmp_path, batch_size=8)
    batch = add_text(next(iter(batcher)), bundle, cfg)
    db = device_batch(batch)
    assert db["video_feats"].shape[0] == 8

    G = cfg.effective_max_gt_events
    word = jnp.zeros((8, G, cfg.max_text_input_len, bundle.hidden_size))
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
    weights = {k: jnp.asarray(v, jnp.float32)
               for k, v in make_weight_dict(cfg).items()}
    step_jit = jax.jit(step_fn)

    _, losses_single = step_jit(state, db, weights, jax.random.PRNGKey(0))

    mesh = make_mesh(8, "dp")
    state_r = replicate_tree(state, mesh)
    db_sharded = shard_batch({k: np.asarray(v) for k, v in db.items()}, mesh)
    _, losses_sharded = step_jit(state_r, db_sharded, weights,
                                 jax.random.PRNGKey(0))

    for k in losses_single:
        np.testing.assert_allclose(
            float(losses_single[k]), float(losses_sharded[k]),
            rtol=2e-4, atol=2e-5, err_msg=k)


def test_sp_sequence_sharding_matches(tmp_path, rng):
    """Sharding the FRAME axis over 'sp' (XLA inserts conv halo exchanges and
    gather collectives) must not change the trunk outputs."""
    cfg, ds, batcher, bundle, model = build_world(tmp_path, batch_size=8)
    batch = add_text(next(iter(batcher)), bundle, cfg)
    db = device_batch(batch)
    params = model.init(jax.random.PRNGKey(0), db["video_feats"],
                        db["video_mask"], db["duration"])

    def trunk(params, feats, mask, dur):
        out = model.apply(params, feats, mask, dur)
        return out["pred_logits"], out["pred_boxes"], out["memory"]

    fn = jax.jit(trunk)
    ref_out = fn(params, db["video_feats"], db["video_mask"], db["duration"])

    mesh = make_mesh(8, "dp,sp")
    assert mesh.shape == {"dp": 4, "sp": 2}
    params_r = replicate_tree(params, mesh)
    db_sharded = shard_batch({k: np.asarray(v) for k, v in db.items()}, mesh)
    sp_out = fn(params_r, db_sharded["video_feats"],
                db_sharded["video_mask"], db_sharded["duration"])
    for a, b, name in zip(ref_out, sp_out,
                          ["logits", "boxes", "memory"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-5, err_msg=name)
