#!/usr/bin/env python
"""Decompose the flagship train step (87 ms @ B=16, MFU 0.15) into its cost
centers by timing ablated variants on the real chip:

  full          the bench.py train step (caption + contrastive + matcher)
  no_caption    caption_loss off (isolates the per-layer teacher-forcing NLL)
  last_caption  disable_mid_caption_heads (caption NLL on the last layer only)
  no_contrast   contrastive stack off (text encoder + InfoNCE + cl cost)
  fixed_match   Jonker-Volgenant solve replaced by arange (cost build kept)
  unfused_caption  fuse_caption_layers off (per-layer teacher forcing)

Each variant is a separate chained-K compile (~2-4 min each through the
tunnel) — run with a generous timeout, background. Prints one JSON line.

Usage: python tools/bench_train_parts.py [--tiny] [variant ...]  (default:
all). --tiny runs the tiny config on CPU as a smoke test of the harness.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VARIANTS = ("full", "no_caption", "last_caption", "no_contrast",
            "fixed_match", "unfused_caption")
TINY = "--tiny" in sys.argv


def bench_variant(name: str):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from bench import _chain_time_flops
    from __graft_entry__ import _flagship_cfg
    from gvl_tpu.models import build_model
    from gvl_tpu.models.text_encoder import load_text_encoder
    from gvl_tpu.train.criterion import LossSpec, make_weight_dict
    from gvl_tpu.train.loop import init_params
    from gvl_tpu.train.state import (StepStatics, create_train_state,
                                     make_train_step)

    cfg = _flagship_cfg(tiny=TINY)
    cfg.msda_impl = "pallas" if jax.default_backend() != "cpu" else "ref"
    cfg.batch_size = 2 if TINY else 16
    if name == "no_contrast":
        cfg.enable_contrastive = False
    if name == "unfused_caption":
        cfg.fuse_caption_layers = False

    import gvl_tpu.train.criterion as crit
    orig_match = crit.match_layer
    if name == "fixed_match":
        def fake_match(cost, gt_mask, impl):
            B, Nq, G = cost.shape
            # consume the cost so its build isn't DCE'd out of the trace
            return (jnp.broadcast_to(jnp.arange(G, dtype=jnp.int32), (B, G))
                    + (0 * cost.sum()).astype(jnp.int32))
        crit.match_layer = fake_match

    try:
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
            captions=rng.randint(1, cfg.vocab_size,
                                 (B, G, Lc)).astype(np.int32),
            caption_mask=np.ones((B, G, Lc), bool),
            text_ids=rng.randint(3, 100, (B, G, cfg.max_text_input_len)
                                 ).astype(np.int32),
            text_mask=np.ones((B, G, cfg.max_text_input_len), np.int32),
        )
        batch["captions"][..., 0] = 0
        params = init_params(model, cfg, bundle, batch)
        statics = StepStatics(
            spec=LossSpec.from_config(cfg),
            enable_contrastive=(name != "no_contrast"),
            caption_loss=(name != "no_caption"),
            two_stage=False, train_text_encoder=False,
            disable_mid_caption_heads=(name == "last_caption"),
            enable_pos_emb_for_captioner=False,
            temporal_shapes=tuple(cfg.temporal_shapes()))
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

        dt, flops = _chain_time_flops(make_run, (state, db, weights),
                                      k_small=2, k_big=6, reps=2)
        return dt, flops
    finally:
        crit.match_layer = orig_match


def main():
    if TINY:
        import jax
        jax.config.update("jax_platforms", "cpu")
    names = [a for a in sys.argv[1:] if not a.startswith("-")] \
        or list(VARIANTS)
    out = {}
    for name in names:
        dt, flops = bench_variant(name)
        out[name + "_ms"] = round(dt * 1e3, 3)
        if flops:
            out[name + "_tflops"] = round(flops / 1e12, 4)
        print(f"# {name}: {dt * 1e3:.2f} ms", file=sys.stderr, flush=True)
    if "full_ms" in out:
        for name in names:
            if name != "full" and name + "_ms" in out:
                out["delta_" + name + "_ms"] = round(
                    out["full_ms"] - out[name + "_ms"], 3)
    print(json.dumps({"metric": "train_step_parts_b16", **out}))


if __name__ == "__main__":
    main()
