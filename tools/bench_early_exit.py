#!/usr/bin/env python
"""Measure eval_decode_early_exit on a realistic caption-length profile.

With random init, greedy argmax essentially never emits EOS (P ~ 1/V per
step), so bench.py's headline decode always runs all max_caption_len steps
and cannot show the early-exit win. Real trained captions average ~12
tokens (ActivityNet Captions GT mean is ~13.5 words). This tool biases the
caption head's EOS logit until the mean greedy caption length lands near a
target (default 12), then chain-times the flagship eval step with the fixed
30-step loop vs the while_loop early exit — same weights, identical tokens.

Prints one JSON line:
  {"metric": "eval_early_exit_b16", "mean_caption_len": ...,
   "fixed_ms": ..., "early_exit_ms": ..., "speedup": ...,
   "early_exit_random_init_ms": ...}

The last field re-times early-exit at the unbiased weights (captions never
terminate): its gap vs fixed_ms is the pure while_loop overhead when no
early exit happens.

Usage: python tools/bench_early_exit.py [--target-len N]
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from gvl_tpu.utils.platform import apply_env_platform
    apply_env_platform()
    import jax
    import jax.numpy as jnp
    import numpy as np
    from bench import _chain_time_flops
    from __graft_entry__ import _flagship_cfg
    from gvl_tpu.eval.postprocess import detection_outputs
    from gvl_tpu.models import build_model

    target_len = 12
    if "--target-len" in sys.argv:
        target_len = int(sys.argv[sys.argv.index("--target-len") + 1])

    cfg = _flagship_cfg(tiny=False)
    cfg.msda_impl = "pallas" if jax.default_backend() != "cpu" else "ref"
    model = build_model(cfg, text_hidden_dim=256)

    B, T, D = 16, cfg.frame_embedding_num, cfg.feature_dim
    rng = np.random.RandomState(0)
    feats = jnp.asarray(rng.randn(B, T, D).astype(np.float32))
    mask = jnp.ones((B, T), dtype=bool)
    duration = jnp.asarray(rng.uniform(30, 120, (B,)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), feats, mask, duration)
    shapes = tuple(cfg.temporal_shapes())
    probe = model.apply(params, feats, mask, duration)
    cap_params = model.init(
        jax.random.PRNGKey(1), cfg.dec_layers - 1, probe["hs"][-1],
        probe["layer_refs"][-1], probe["memory"], probe["mask_flat"], shapes,
        probe["valid_ratios"],
        jnp.zeros((B, cfg.num_queries, cfg.max_caption_len), jnp.int32),
        method=model.caption_train)
    merged = {"params": {**cap_params["params"], **params["params"]}}

    def with_eos_bias(p, c):
        p = jax.tree_util.tree_map(lambda x: x, p)
        head = p["params"]["caption_head_0"]
        head["logit"]["bias"] = head["logit"]["bias"].at[0].add(c)
        return p

    @jax.jit
    def mean_len(p):
        out = model.apply(p, feats, mask, duration)
        seq, _ = model.apply(
            p, cfg.dec_layers - 1, out["hs"][-1], out["layer_refs"][-1],
            out["memory"], out["mask_flat"], shapes, out["valid_ratios"],
            method=model.caption_sample)
        return (seq > 0).sum(-1).mean()

    # calibrate the EOS bias by bisection: larger bias -> shorter captions
    lo, hi = 0.0, 50.0
    biased = merged
    got = float(mean_len(merged))
    for _ in range(12):
        mid = 0.5 * (lo + hi)
        biased = with_eos_bias(merged, mid)
        got = float(mean_len(biased))
        if got > target_len:
            lo = mid
        else:
            hi = mid
        if abs(got - target_len) < 0.5:
            break
    print(f"# eos bias {0.5 * (lo + hi):.3f} -> mean len {got:.2f}",
          file=sys.stderr, flush=True)

    def make_eval(early_exit):
        def eval_step(p, f):
            out = model.apply(p, f, mask, duration)
            seq, lps = model.apply(
                p, cfg.dec_layers - 1, out["hs"][-1], out["layer_refs"][-1],
                out["memory"], out["mask_flat"], shapes, out["valid_ratios"],
                early_exit=early_exit, method=model.caption_sample)
            det = detection_outputs(out, duration)
            return det["scores"], seq, ((seq > 0) * lps).sum(-1)

        def chained(K):
            @jax.jit
            def run(p, f):
                def body(i, carry):
                    fc, acc = carry
                    scores, seq, lps = eval_step(p, fc)
                    fp = jnp.sum(scores) + jnp.sum(lps)
                    return f + 1e-9 * fp, acc + fp
                _, acc = jax.lax.fori_loop(0, K, body, (f, 0.0))
                return acc
            return run
        return chained

    out = {"metric": "eval_early_exit_b16", "target_len": target_len,
           "mean_caption_len": round(got, 2)}
    dt_fixed, _ = _chain_time_flops(make_eval(False), (biased, feats))
    out["fixed_ms"] = round(dt_fixed * 1e3, 3)
    print(f"# fixed: {out['fixed_ms']} ms", file=sys.stderr, flush=True)
    dt_ee, _ = _chain_time_flops(make_eval(True), (biased, feats))
    out["early_exit_ms"] = round(dt_ee * 1e3, 3)
    out["speedup"] = round(dt_fixed / dt_ee, 3)
    print(f"# early-exit: {out['early_exit_ms']} ms", file=sys.stderr,
          flush=True)
    # worst case: nothing terminates (unbiased random weights)
    dt_worst, _ = _chain_time_flops(make_eval(True), (merged, feats))
    out["early_exit_random_init_ms"] = round(dt_worst * 1e3, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
