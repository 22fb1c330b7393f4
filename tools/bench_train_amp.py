#!/usr/bin/env python
"""A/B the train step with/without train_use_amp (bf16 text encoder) at
flagship shapes — the measurement VERDICT r2 item 8 asks for.

Run on the TPU: python tools/bench_train_amp.py
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from __graft_entry__ import _flagship_cfg

    out = {}
    for amp in (False, True):
        cfg = _flagship_cfg(tiny=False)
        cfg.msda_impl = "pallas"
        cfg.train_use_amp = amp
        t, _ = _bench_train_step_with_amp(cfg, amp)
        out["amp_ms" if amp else "f32_ms"] = round(t * 1e3, 3)
    out["speedup"] = round(out["f32_ms"] / out["amp_ms"], 3)
    print(json.dumps({"metric": "train_step_ms_text_amp_ab", **out}))


def _bench_train_step_with_amp(cfg, amp: bool):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from bench import _chain_time_flops
    from gvl_tpu.models import build_model
    from gvl_tpu.models.text_encoder import load_text_encoder
    from gvl_tpu.train.criterion import LossSpec, make_weight_dict
    from gvl_tpu.train.loop import init_params
    from gvl_tpu.train.state import (StepStatics, create_train_state,
                                     make_train_step)

    cfg.batch_size = 16
    bundle = load_text_encoder(cfg)
    model = build_model(cfg, text_hidden_dim=bundle.hidden_size)
    B, T, D = cfg.batch_size, cfg.frame_embedding_num, cfg.feature_dim
    G, Lc = cfg.effective_max_gt_events, cfg.max_caption_len
    rng = np.random.RandomState(0)
    batch = dict(
        video_feats=rng.randn(B, T, D).astype(np.float32),
        video_mask=np.ones((B, T), bool),
        duration=rng.uniform(30, 90, (B,)).astype(np.float32),
        gt_boxes=np.stack([np.full((B, G), 0.5), np.full((B, G), 0.3)],
                          -1).astype(np.float32),
        gt_labels=np.zeros((B, G), np.int32),
        gt_mask=np.ones((B, G), bool),
        captions=rng.randint(1, cfg.vocab_size, (B, G, Lc)).astype(np.int32),
        caption_mask=np.ones((B, G, Lc), bool),
        text_ids=rng.randint(3, 100, (B, G, cfg.max_text_input_len)
                             ).astype(np.int32),
        text_mask=np.ones((B, G, cfg.max_text_input_len), np.int32),
    )
    batch["captions"][..., 0] = 0
    params = init_params(model, cfg, bundle, batch)
    statics = StepStatics(
        spec=LossSpec.from_config(cfg), enable_contrastive=True,
        caption_loss=True, two_stage=False, train_text_encoder=False,
        disable_mid_caption_heads=False, enable_pos_emb_for_captioner=False,
        temporal_shapes=tuple(cfg.temporal_shapes()), text_bf16=amp)
    state = create_train_state(cfg, model, params, bundle.params, 100,
                               statics)
    step_fn, _, _ = make_train_step(model, bundle.apply_fn, cfg, statics)
    db = {k: jnp.asarray(v) for k, v in batch.items()}
    weights = {k: jnp.asarray(v, jnp.float32)
               for k, v in make_weight_dict(cfg).items()}

    def make_run(K):
        @jax.jit
        def run(state, db, weights):
            def body(i, carry):
                st, acc = carry
                st2, losses = step_fn(st, db, weights,
                                      jax.random.fold_in(
                                          jax.random.PRNGKey(0), i))
                return st2, acc + losses["total_loss"]
            _, acc = jax.lax.fori_loop(0, K, body, (state, 0.0))
            return acc
        return run

    return _chain_time_flops(make_run, (state, db, weights), k_small=2,
                             k_big=6, reps=2)


if __name__ == "__main__":
    main()
