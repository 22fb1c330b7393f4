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
            "fixed_match", "unfused_caption", "anet_gt", "bf16_caption",
            "anet_gt_fixed_match")
TINY = "--tiny" in sys.argv


def bench_variant(name: str):
    import jax
    import jax.numpy as jnp
    from bench import _chain_time_flops, build_train_bench, train_chain_maker
    from __graft_entry__ import _flagship_cfg

    cfg = _flagship_cfg(tiny=TINY)
    cfg.msda_impl = "pallas" if jax.default_backend() != "cpu" else "ref"
    cfg.batch_size = 2 if TINY else 16
    if name == "no_contrast":
        cfg.enable_contrastive = False
    if name == "unfused_caption":
        cfg.fuse_caption_layers = False

    import gvl_tpu.train.criterion as crit
    orig_match = crit.match_layer
    if name in ("fixed_match", "anet_gt_fixed_match"):
        def fake_match(cost, gt_mask, impl):
            B, Nq, G = cost.shape
            # consume the cost so its build isn't DCE'd out of the trace
            return (jnp.broadcast_to(jnp.arange(G, dtype=jnp.int32), (B, G))
                    + (0 * cost.sum()).astype(jnp.int32))
        crit.match_layer = fake_match

    try:
        state, db, weights, step_fn = build_train_bench(
            cfg,
            enable_contrastive=(name != "no_contrast"),
            caption_loss=(name != "no_caption"),
            disable_mid_caption_heads=(name == "last_caption"),
            caption_bf16=(name == "bf16_caption"),
            gt_counts="anet" if name.startswith("anet_gt") else "full")
        return _chain_time_flops(train_chain_maker(step_fn),
                                 (state, db, weights), k_small=2, k_big=6,
                                 reps=2)
    finally:
        crit.match_layer = orig_match


def main():
    from gvl_tpu.utils.platform import apply_env_platform
    apply_env_platform()
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
