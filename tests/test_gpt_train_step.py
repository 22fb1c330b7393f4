"""GPT-2 (ClipCap) caption head wired into the train step."""

import jax
import jax.numpy as jnp
import numpy as np

from gvl_tpu.train.criterion import LossSpec, make_weight_dict
from gvl_tpu.train.loop import make_gpt_tokenize
from gvl_tpu.train.state import (StepStatics, create_train_state,
                                 make_train_step)
from gvl_tpu.models import build_model
from tests.test_train_smoke import add_text, build_world, device_batch


def test_gpt2_train_step(tmp_path, rng):
    cfg, ds, batcher, bundle, _ = build_world(
        tmp_path, caption_decoder_type="gpt2", prefix_length=4,
        prefix_size=64, disable_mid_caption_heads=True)
    # prefix_size must equal hidden_dim (the event feature is the prefix)
    cfg.prefix_size = cfg.hidden_dim
    gpt_spec, add_gpt, gpt_decode = make_gpt_tokenize(cfg)
    assert gpt_spec is not None
    model = build_model(cfg, text_hidden_dim=bundle.hidden_size,
                        gpt_spec=gpt_spec)

    batch = add_gpt(add_text(next(iter(batcher)), bundle, cfg))
    db = device_batch(batch)
    assert db["gpt_tokens"].shape == db["captions"].shape

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
        temporal_shapes=tuple(cfg.temporal_shapes()), caption_gpt=True)
    state = create_train_state(cfg, model, params, bundle.params, 4, statics)
    step_fn, _, _ = make_train_step(model, bundle.apply_fn, cfg, statics)
    weights = {k: jnp.asarray(v, jnp.float32)
               for k, v in make_weight_dict(cfg).items()}
    state, losses = jax.jit(step_fn)(state, db, weights,
                                     jax.random.PRNGKey(0))
    assert np.isfinite(float(losses["total_loss"]))
    assert float(losses["loss_caption"]) > 0

    # greedy sampling interface
    out = model.apply(state.params, db["video_feats"], db["video_mask"],
                      db["duration"])
    toks, probs, mask = model.apply(
        state.params, cfg.dec_layers - 1, out["hs"][-1][:, :G],
        entry_length=5, method=model.caption_sample_gpt)
    assert toks.shape == (db["captions"].shape[0], G, 5)
