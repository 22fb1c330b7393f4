#!/usr/bin/env python
"""Benchmark: ANet-shaped eval throughput (clips/sec/chip) on real hardware.

Measures the full jitted eval forward — pyramid encoder, deformable
encoder/decoder (fused Pallas MSDA), heads, batched greedy LSTM-DSA caption
decode over all queries, and top-k postprocessing — at the flagship config's
shapes (hidden 512, 2+2 layers, 4 levels, Nq=30, T=100, vocab 8517, batch 16,
matching cfgs/anet_tsp_msvg_dvc.yml of the reference).

vs_baseline: the reference publishes no throughput numbers (BASELINE.md).
REF_GPU_CLIPS_PER_SEC below is our documented estimate of the PyTorch
reference's eval throughput on its original GPU setup (batch-16 eval with
autoregressive LSTM-DSA decoding over 30 queries dominates its step time);
the BASELINE.json north star is 8x that estimate. The estimate is
SUPERSEDED by the executable measurement procedure in
tools/make_goldens.sh + tools/bench_reference_gpu.py (needs a networked
GPU host): when goldens/reference_gpu_bench.json exists, its measured
value is used instead.
"""

import json
import os
import time

import numpy as np

REF_GPU_CLIPS_PER_SEC = 150.0  # documented estimate; see module docstring
_bench_json = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "goldens", "reference_gpu_bench.json")
if os.path.exists(_bench_json):
    with open(_bench_json) as _f:
        _v = json.load(_f).get("value")
    if _v:
        REF_GPU_CLIPS_PER_SEC = float(_v)


def _timed(fn, *args):
    t0 = time.perf_counter()
    _ = float(fn(*args))
    return time.perf_counter() - t0


def main():
    import jax
    import jax.numpy as jnp
    from __graft_entry__ import _flagship_cfg
    from gvl_tpu.models import build_model

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

    # init caption head params too
    probe = model.apply(params, feats, mask, duration)
    cap_params = model.init(
        jax.random.PRNGKey(1), cfg.dec_layers - 1, probe["hs"][-1],
        probe["layer_refs"][-1], probe["memory"], probe["mask_flat"], shapes,
        probe["valid_ratios"],
        jnp.zeros((B, cfg.num_queries, cfg.max_caption_len), jnp.int32),
        method=model.caption_train)
    merged = {"params": {**cap_params["params"], **params["params"]}}

    from gvl_tpu.eval.postprocess import detection_outputs

    @jax.jit
    def eval_step(params, feats, mask, duration):
        out = model.apply(params, feats, mask, duration)
        seq, lps = model.apply(
            params, cfg.dec_layers - 1, out["hs"][-1], out["layer_refs"][-1],
            out["memory"], out["mask_flat"], shapes, out["valid_ratios"],
            method=model.caption_sample)
        det = detection_outputs(out, duration)
        return det["scores"], det["boxes"], seq, ((seq > 0) * lps).sum(-1)

    # On the tunneled 'axon' platform block_until_ready does not actually
    # wait for remote execution and scalar-fetch RTT is large and noisy, so
    # we chain K eval steps inside ONE jit (with a data dependence between
    # iterations so XLA cannot CSE them), fetch one scalar, and difference
    # two K values to cancel the fixed RTT/dispatch overhead.
    def chained(K):
        @jax.jit
        def run(params, feats, mask, duration):
            def body(i, carry):
                f, acc = carry
                scores, boxes, seq, lps = eval_step_fn(params, f, mask,
                                                       duration)
                fp = jnp.sum(scores) + jnp.sum(lps)
                return feats + 1e-9 * fp, acc + fp
            _, acc = jax.lax.fori_loop(0, K, body, (feats, 0.0))
            return acc
        return run

    eval_step_fn = eval_step.__wrapped__ if hasattr(eval_step, "__wrapped__") \
        else eval_step
    k_small, k_big = 3, 13
    run_small, run_big = chained(k_small), chained(k_big)
    _ = float(run_small(merged, feats, mask, duration))   # compile
    _ = float(run_big(merged, feats, mask, duration))
    reps = 3
    t_small = min(_timed(run_small, merged, feats, mask, duration)
                  for _ in range(reps))
    t_big = min(_timed(run_big, merged, feats, mask, duration)
                for _ in range(reps))
    dt = max((t_big - t_small) / (k_big - k_small), 1e-9)
    clips_per_sec = B / dt

    print(json.dumps({
        "metric": "anet_eval_clips_per_sec_per_chip",
        "value": round(clips_per_sec, 2),
        "unit": "clips/s",
        "vs_baseline": round(clips_per_sec / REF_GPU_CLIPS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
