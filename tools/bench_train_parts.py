#!/usr/bin/env python
"""Decompose the flagship train step (87 ms @ B=16, MFU 0.15) into its cost
centers by timing ablated variants on the real chip:

  full          the bench.py train step (caption + contrastive + matcher)
  no_caption    caption_loss off (isolates the per-layer teacher-forcing NLL)
  last_caption  disable_mid_caption_heads (caption NLL on the last layer only)
  no_contrast   contrastive stack off (text encoder + InfoNCE + cl cost)
  fixed_match   Jonker-Volgenant solve replaced by arange (cost build kept)
  unfused_caption  fuse_caption_layers off (per-layer teacher forcing)
  scst          SCST RL step (sampled+greedy rollouts, m2o matching, host
                reward via pure_callback) — reference cfgs/anet_tsp_dvc_rl;
                needs a backend with host-callback support (NOT the axon
                tunnel, which rejects host send/recv)
  scst_stub_reward  same step, reward callback replaced by on-device zeros
                (rollouts kept) — the device-side SCST cost, tunnel-safe
  scst_host_scorer  the Meteor+CiderD reward fn alone on host (no jax);
                scst step on a real TPU host ~= stub + this
  scst_bf16     scst_stub_reward with bf16 rollout chains (caption_bf16
                under RL: both decode chains at bf16, chosen-token logprobs
                accumulated f32 inside the head)
  scst_unfused  device-side A/B partner of scst_stub_reward: per-layer
                rollout chains + per-layer callbacks (pre-fusion structure)
  scst_nograd   diagnostic: scst_stub_reward with the policy-loss logprobs
                stop-gradiented — kills the BPTT through the sampled chain,
                isolating (trunk fwd+bwd + m2o match + 2 fwd-only chains)
                from the rollout backward

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
            "anet_gt_fixed_match", "scst", "scst_stub_reward",
            "scst_host_scorer", "scst_unfused", "scst_bf16", "scst_nograd")
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

    if name == "scst_host_scorer":
        return _bench_scst_host_scorer(cfg)

    scst = name.startswith("scst")
    if scst:
        # the shipped RL experiment's scorer mix (cfgs/anet_tsp_dvc_rl.yml);
        # the CiderD df-cache file is absent in-sandbox -> per-call df,
        # which only makes the host callback MORE expensive (honest upper
        # bound). scst_stub_reward replaces the pure_callback with zeros on
        # device (rollout args still consumed), isolating the device-side
        # rollout cost from the host reward boundary.
        cfg.rl_scorer_types = ["Meteor", "CiderD"]
        cfg.rl_scorer_weights = [0.95, 0.05]

    if name == "scst_unfused":
        # device-side A/B partner of scst_stub_reward: per-layer rollout
        # chains + per-layer callbacks (the pre-fusion SCST structure)
        cfg.fuse_caption_layers = False

    orig_callback = jax.pure_callback
    if name in ("scst_stub_reward", "scst_unfused", "scst_bf16",
                "scst_nograd"):
        def stub_callback(fn, sds, *args, **kw):
            keep = sum(jnp.sum(a).astype(jnp.float32) for a in args)
            return jnp.zeros(sds.shape, sds.dtype) + 0.0 * keep
        jax.pure_callback = stub_callback

    import gvl_tpu.train.rl as rl_mod
    orig_policy = rl_mod.rl_policy_loss
    if name == "scst_nograd":
        def nograd_policy(lps, seq, rewards, valid):
            return orig_policy(jax.lax.stop_gradient(lps), seq, rewards,
                               valid)
        rl_mod.rl_policy_loss = nograd_policy

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
            caption_bf16=(name in ("bf16_caption", "scst_bf16")),
            gt_counts="anet" if name.startswith("anet_gt") else "full",
            scst=scst)
        return _chain_time_flops(train_chain_maker(step_fn),
                                 (state, db, weights), k_small=2, k_big=6,
                                 reps=2)
    finally:
        crit.match_layer = orig_match
        jax.pure_callback = orig_callback
        rl_mod.rl_policy_loss = orig_policy


def _bench_scst_host_scorer(cfg):
    """Host-side SCST reward cost per step (no jax): the Meteor+CiderD
    token-id-string scoring that pure_callback runs between the sampled and
    greedy rollouts. Measured standalone because (a) on a real TPU host it
    overlaps nothing (the callback serializes the step), so
    scst_step ~= scst_stub_reward + this; (b) the axon tunnel rejects host
    callbacks outright (UNIMPLEMENTED: axon_pjrt host send/recv), so the
    in-graph variant can't run through the tunnel at all. Valid-pair counts
    follow the empirical ANet event distribution (the reference's SCST load:
    ~4 matched GT x m2o_rate rollouts per video), not the padded maximum."""
    import time as _time

    import numpy as np
    from gvl_tpu.train.criterion import COUNTER_CLASS_RATE
    from gvl_tpu.train.rl import init_scorer, rl_reward_callback

    scorers = init_scorer(["Meteor", "CiderD"], cfg.cached_tokens)
    rate = 4
    host = rl_reward_callback(scorers, {"Meteor": 0.95, "CiderD": 0.05},
                              cfg.cl_sent_ratio, cfg.cl_para_ratio,
                              m2o_rate=rate)
    B = 2 if TINY else 16
    G0, L = cfg.effective_max_gt_events, cfg.max_caption_len
    G = rate * G0
    rng = np.random.RandomState(0)
    gen = rng.randint(1, cfg.vocab_size, (B, G, L)).astype(np.int32)
    greedy = rng.randint(1, cfg.vocab_size, (B, G, L)).astype(np.int32)
    gt = rng.randint(1, cfg.vocab_size, (B, G0, L)).astype(np.int32)
    gt = np.tile(gt, (1, rate, 1))
    probs = np.asarray(COUNTER_CLASS_RATE)[:G0 + 1].astype(np.float64)
    probs = probs / probs.sum()
    counts = np.maximum(rng.choice(len(probs), size=B, p=probs), 1)
    valid = np.zeros((B, G), bool)
    for b in range(B):                      # m2o: rate slots per real event
        valid[b, :rate * counts[b]] = True
    host(gen, greedy, gt, valid)            # warm caches
    ts = []
    for _ in range(3):
        t0 = _time.perf_counter()
        host(gen, greedy, gt, valid)
        ts.append(_time.perf_counter() - t0)
    return min(ts), None


def main():
    if TINY:
        # force CPU BEFORE any backend touch: apply_env_platform would
        # eagerly init the tunneled TPU (JAX_PLATFORMS=axon) and a config
        # update after init does not reliably switch the default backend
        import jax
        jax.config.update("jax_platforms", "cpu")
        os.environ["JAX_PLATFORMS"] = "cpu"
    else:
        from gvl_tpu.utils.platform import apply_env_platform
        apply_env_platform()
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
