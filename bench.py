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


V5E_PEAK_BF16 = 197e12     # TPU v5e peak bf16 FLOP/s (public spec)
_T0 = time.perf_counter()


def _timed(fn, *args):
    t0 = time.perf_counter()
    _ = float(fn(*args))
    return time.perf_counter() - t0


def _compiled_flops(compiled):
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        f = float(ca.get("flops", 0.0))
        return f if f > 0 else None
    except Exception:
        return None


LAST_CHAIN_INFO = {}     # rep-time spread of the most recent chained measure
LAST_CHAIN_HANDLES = {}  # compiled chains of the most recent measure, kept
                         # so the headline f32 chain can be RE-timed later in
                         # the same process (VERDICT r4 #3: the 3213-vs-3269
                         # question needs repeated in-process measurements)


def _retime_chain(handles, args, reps=3):
    """Re-time previously compiled chains (no compilation) -> sec/step."""
    ts = [_timed(handles["c_small"], *args) for _ in range(reps)]
    tb = [_timed(handles["c_big"], *args) for _ in range(reps)]
    return max((min(tb) - min(ts)) / (handles["k_big"] - handles["k_small"]),
               1e-9)


def _chain_time_flops(make_run, args, k_small=3, k_big=13, reps=3):
    """Chained-K timing protocol (see main() comment). AOT-compiles the two
    chain lengths once each, times them, and differences both the wall time
    and the compiled-HLO flop counts — yielding (sec/step, flops/step or
    None) with no extra compilation. Side channel: LAST_CHAIN_INFO records
    the per-rep times of both chains so callers can report measurement
    noise (the tunnel is single-tenant but its host and link are not —
    run-to-run spread is the error bar on every number here)."""
    c_small = make_run(k_small).lower(*args).compile()
    c_big = make_run(k_big).lower(*args).compile()
    _ = float(c_small(*args))          # warm the execution path
    _ = float(c_big(*args))
    ts = [_timed(c_small, *args) for _ in range(reps)]
    tb = [_timed(c_big, *args) for _ in range(reps)]
    t_small, t_big = min(ts), min(tb)
    LAST_CHAIN_INFO.clear()
    LAST_CHAIN_INFO.update(
        reps_small_s=[round(t, 4) for t in ts],
        reps_big_s=[round(t, 4) for t in tb],
        spread_pct=round(100.0 * (max(tb) - min(tb)) / max(min(tb), 1e-9),
                         2))
    dt = max((t_big - t_small) / (k_big - k_small), 1e-9)
    LAST_CHAIN_HANDLES.clear()
    LAST_CHAIN_HANDLES.update(c_small=c_small, c_big=c_big,
                              k_small=k_small, k_big=k_big)
    flops = None
    fa, fb = _compiled_flops(c_small), _compiled_flops(c_big)
    if fa and fb:
        if fb > 1.5 * fa:              # backend unrolled the chain
            flops = (fb - fa) / (k_big - k_small)
        else:                          # XLA counts the while body ONCE, so
            flops = fa                 # the chain's count ~= one step's
    return dt, flops


def _probe_backend(timeout_s: float):
    """jax.default_backend() in a SUBPROCESS with a hard timeout. The axon
    tunnel has two failure modes: clean fall-back to CPU, and an indefinite
    HANG inside backend init — probing in-process would hang this process
    with it, and the driver would get no JSON at all."""
    import subprocess
    import sys
    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import sys; sys.path.insert(0, %r); "
             "from gvl_tpu.utils.platform import apply_env_platform; "
             "apply_env_platform(); "
             "import jax; print(jax.default_backend())"
             % os.path.dirname(os.path.abspath(__file__))],
            capture_output=True, text=True, timeout=timeout_s)
        if r.returncode != 0 or not r.stdout.strip():
            return None
        return r.stdout.strip().splitlines()[-1]
    except subprocess.TimeoutExpired:
        return None


def main():
    import sys

    if not os.environ.get("GVL_BENCH_ALLOW_CPU"):
        # the TPU tunnel sometimes drops; dropouts are often transient, so
        # probe (bounded) a few times before failing fast and honestly —
        # flagship shapes on CPU would run past any driver timeout
        retries = int(os.environ.get("GVL_BENCH_RETRIES", "3"))
        delay = float(os.environ.get("GVL_BENCH_RETRY_SLEEP", "60"))
        probe_t = float(os.environ.get("GVL_BENCH_PROBE_TIMEOUT", "150"))
        backend = None
        for attempt in range(retries + 1):
            backend = _probe_backend(probe_t)
            if backend and backend != "cpu":
                break
            if attempt < retries:
                print(f"# backend probe got {backend!r} (attempt "
                      f"{attempt + 1}/{retries + 1}); retrying in "
                      f"{delay:.0f}s", file=sys.stderr, flush=True)
                time.sleep(delay)
        if not backend or backend == "cpu":
            print(json.dumps({
                "metric": "anet_eval_clips_per_sec_per_chip", "value": 0.0,
                "unit": "clips/s", "vs_baseline": 0.0,
                "error": "no TPU backend available (tunnel down or hung); "
                         "set GVL_BENCH_ALLOW_CPU=1 to force a CPU run"}))
            return

    from gvl_tpu.utils.platform import (apply_env_platform,
                                        enable_compilation_cache)
    apply_env_platform()
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    from __graft_entry__ import _flagship_cfg
    from gvl_tpu.models import build_model

    if jax.default_backend() == "cpu" and \
            not os.environ.get("GVL_BENCH_ALLOW_CPU"):
        # the probe subprocess and the in-process backend can disagree
        # (plugin priority lists ignore the env var; the tunnel can drop
        # between probe and init) — never run flagship shapes on CPU
        print(json.dumps({
            "metric": "anet_eval_clips_per_sec_per_chip", "value": 0.0,
            "unit": "clips/s", "vs_baseline": 0.0,
            "error": "probe saw a TPU but in-process backend is cpu; "
                     "set GVL_BENCH_ALLOW_CPU=1 to force a CPU run"}))
        return

    def progress(msg):
        # stderr breadcrumbs: the tunnel can hang indefinitely inside a
        # single remote call — these pin down WHERE (driver-visible)
        print(f"# t+{time.perf_counter() - _T0:.0f}s {msg}",
              file=sys.stderr, flush=True)

    cfg = _flagship_cfg(tiny=False)
    cfg.msda_impl = "pallas" if jax.default_backend() != "cpu" else "ref"
    model = build_model(cfg, text_hidden_dim=256)
    progress("backend up, model built")

    B, T, D = 16, cfg.frame_embedding_num, cfg.feature_dim
    rng = np.random.RandomState(0)
    feats = jnp.asarray(rng.randn(B, T, D).astype(np.float32))
    mask = jnp.ones((B, T), dtype=bool)
    duration = jnp.asarray(rng.uniform(30, 120, (B,)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), feats, mask, duration)
    progress("trunk params initialized")

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
    progress("caption params initialized; compiling headline eval chains")

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
    dt, flops_eval = _chain_time_flops(
        chained, (merged, feats, mask, duration))
    clips_per_sec = B / dt
    eval_noise = dict(LAST_CHAIN_INFO)   # error bar for the headline
    eval_handles = dict(LAST_CHAIN_HANDLES)  # kept for f32 re-timing stages
    progress(f"headline eval measured: {clips_per_sec:.0f} clips/s")

    # ---- trunk-only eval time + MFU/roofline extras (VERDICT r3 item 3) --
    def trunk_chained(K):
        @jax.jit
        def run(params, feats, mask, duration):
            def body(i, carry):
                f, acc = carry
                out = model.apply(params, f, mask, duration)
                fp = jnp.sum(out["pred_logits"]) + jnp.sum(out["pred_boxes"])
                return feats + 1e-9 * fp, acc + fp
            _, acc = jax.lax.fori_loop(0, K, body, (feats, 0.0))
            return acc
        return run

    dt_trunk, _ = _chain_time_flops(trunk_chained,
                                    (merged, feats, mask, duration))

    extras = {
        "eval_step_ms": round(dt * 1e3, 3),
        "eval_trunk_ms": round(dt_trunk * 1e3, 3),
        "eval_chain_spread_pct": eval_noise.get("spread_pct"),
        "eval_chain_reps_s": eval_noise.get("reps_big_s"),
    }
    if flops_eval:
        extras["eval_tflops_per_step"] = round(flops_eval / 1e12, 4)
        extras["mfu_eval"] = round(flops_eval / dt / V5E_PEAK_BF16, 4)

    # ---- bf16 caption decode (the eval_decode_bf16 production knob;
    # trunk stays f32, only the decode loop casts — mirrors EvalRunner) ----
    from gvl_tpu.utils.amp import bf16_cast_tree

    def eval_step_bf16(params, feats, mask, duration):
        out = model.apply(params, feats, mask, duration)
        cap_params = bf16_cast_tree(params)
        seq, lps = model.apply(
            cap_params, cfg.dec_layers - 1,
            out["hs"][-1].astype(jnp.bfloat16), out["layer_refs"][-1],
            out["memory"].astype(jnp.bfloat16), out["mask_flat"], shapes,
            out["valid_ratios"], method=model.caption_sample)
        det = detection_outputs(out, duration)
        return det["scores"], det["boxes"], seq, \
            ((seq > 0) * lps.astype(jnp.float32)).sum(-1)

    def chained_bf16(K):
        @jax.jit
        def run(params, feats, mask, duration):
            def body(i, carry):
                f, acc = carry
                scores, boxes, seq, lps = eval_step_bf16(params, f, mask,
                                                         duration)
                fp = jnp.sum(scores) + jnp.sum(lps)
                return feats + 1e-9 * fp, acc + fp
            _, acc = jax.lax.fori_loop(0, K, body, (feats, 0.0))
            return acc
        return run

    # ---- full-bf16 eval (the eval_full_bf16 production knob: trunk AND
    # decode in bf16; norms/softmax accumulate f32 inside flax/Pallas).
    # Mirrors EvalRunner._eval_step exactly: trunk outputs recast to f32
    # (postprocess math unchanged in dtype), then only query/memory cast
    # back to bf16 for the decode — same graph the knob compiles in
    # production (ADVICE r3).
    def chained_full_bf16(K):
        @jax.jit
        def run(params, feats, mask, duration):
            p16 = bf16_cast_tree(params)
            f16 = feats.astype(jnp.bfloat16)

            def body(i, carry):
                f, acc = carry
                out = model.apply(p16, f, mask, duration)
                out = jax.tree_util.tree_map(
                    lambda x: x.astype(jnp.float32)
                    if hasattr(x, "dtype") and x.dtype == jnp.bfloat16
                    else x, out)
                seq, lps = model.apply(
                    p16, cfg.dec_layers - 1,
                    out["hs"][-1].astype(jnp.bfloat16),
                    out["layer_refs"][-1],
                    out["memory"].astype(jnp.bfloat16), out["mask_flat"],
                    shapes, out["valid_ratios"],
                    method=model.caption_sample)
                det = detection_outputs(out, duration)
                fp = (jnp.sum(det["scores"])
                      + jnp.sum(((seq > 0) * lps.astype(jnp.float32))))
                # 1e-6 scale keeps chained inputs in-distribution (fp is a
                # B*Nq*L log-prob sum, order -1e4 at random init; ADVICE r3)
                return f16 + (1e-6 * fp).astype(jnp.bfloat16), acc + fp
            _, acc = jax.lax.fori_loop(0, K, body, (f16, 0.0))
            return acc
        return run

    # ---- stage framework (VERDICT r4 #2: complete by construction) -------
    # Every stage below ALWAYS runs — there are no time-budget skips. The
    # budget only selects lower fidelity where a stage has a knob for it
    # (fewer e2e videos, fewer host-scorer reps); the chained-K stages are
    # compile-dominated and cannot be meaningfully shrunk, so they simply
    # run. Per-stage wall times land in stage_times_s, and a partial result
    # file (BENCH_partial.json) is rewritten after every stage so a hard
    # external kill still leaves the completed stages' numbers on disk.
    budget = float(os.environ.get("GVL_BENCH_TIME_BUDGET", "2400"))
    partial_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "BENCH_partial.json")
    stage_times: "OrderedDict[str, float]" = {}
    extras["stage_times_s"] = stage_times

    def run_stage(name, fn, est_s=150.0):
        import sys as _sys
        lowfi = (budget - (time.perf_counter() - _T0)) < est_s
        t0 = time.perf_counter()
        try:
            out = fn(lowfi)
            if out:
                extras.update(out)
        except Exception as e:                            # pragma: no cover
            extras[name + "_error"] = str(e)[:200]
        stage_times[name] = round(time.perf_counter() - t0, 1)
        print(f"# stage {name}: {stage_times[name]:.1f}s"
              f"{' (lowfi)' if lowfi else ''}", file=_sys.stderr, flush=True)
        try:
            with open(partial_path, "w") as f:
                json.dump(extras, f)
        except OSError:
            pass

    f32_runs = [round(B / dt, 2)]
    extras["eval_f32_runs_clips_per_sec"] = f32_runs

    def remeasure_f32(_):
        # VERDICT r4 #3: repeated in-process measurements of the SAME
        # compiled flagship f32 chain, spread across the run, so the
        # artifact itself shows whether the headline number is stable or
        # contention-dependent
        dt_r = _retime_chain(eval_handles, (merged, feats, mask, duration))
        f32_runs.append(round(B / dt_r, 2))
        return {"eval_f32_best_clips_per_sec": max(f32_runs)}

    # ---- train step throughput + MFU --------------------------------------
    def stage_train(_):
        t_train, flops_train = _bench_train_step(cfg)
        out = {"train_step_ms": round(t_train * 1e3, 3),
               "train_clips_per_sec": round(16 / t_train, 2)}
        if flops_train:
            out["train_tflops_per_step"] = round(flops_train / 1e12, 4)
            out["mfu_train"] = round(
                flops_train / t_train / V5E_PEAK_BF16, 4)
        return out

    def stage_train_variant(key, kw):
        def fn(_):
            t_v, _f = _bench_train_step(cfg, **kw)
            return {key: round(t_v * 1e3, 3)}
        return fn

    # ---- SCST (VERDICT r4 #4): device-side rollout cost + host reward ----
    def stage_scst(_lowfi):
        import sys as _sys
        _sys.path.insert(0, os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "tools"))
        from bench_train_parts import bench_variant
        out = {}
        dt_stub, _f = bench_variant("scst_stub_reward")
        out["scst_stub_reward_ms"] = round(dt_stub * 1e3, 3)
        # bf16 rollout chains (caption_bf16 under RL) — the production RL
        # speed knob. The fused-vs-unfused device A/B (scst_unfused) moved
        # to tools/bench_train_parts.py only: with the reward stubbed the
        # two are within noise on device (the fusion's win is one host
        # callback instead of len(layers)), so it isn't worth the driver
        # bench's compile time every round.
        dt_b16, _f = bench_variant("scst_bf16")
        out["scst_bf16_stub_ms"] = round(dt_b16 * 1e3, 3)
        t_host, _ = bench_variant("scst_host_scorer")
        out["scst_host_reward_ms"] = round(t_host * 1e3, 3)
        try:
            # in-graph host callback: works on a real TPU host, but the
            # axon tunnel rejects host send/recv — fall back to the
            # composed number (stub + host scorer), which is exactly how
            # the two costs serialize on a real host
            dt_full, _f = bench_variant("scst")
            out["scst_step_ms"] = round(dt_full * 1e3, 3)
            out["scst_step_ms_composed"] = False
        except Exception:
            out["scst_step_ms"] = round((dt_stub + t_host) * 1e3, 3)
            out["scst_step_ms_composed"] = True
        return out

    # ---- eval precision variants ------------------------------------------
    def stage_bf16_decode(_):
        dt_bf16, _f = _chain_time_flops(chained_bf16,
                                        (merged, feats, mask, duration))
        return {"eval_clips_per_sec_bf16_decode": round(B / dt_bf16, 2)}

    def stage_full_bf16(_):
        dt_fb16, _f = _chain_time_flops(chained_full_bf16,
                                        (merged, feats, mask, duration))
        return {"eval_clips_per_sec_full_bf16": round(B / dt_fb16, 2)}

    # ---- grounding workflow (TACoS ssvg shapes) ---------------------------
    def stage_grounding(_):
        import sys as _sys
        _sys.path.insert(0, os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "tools"))
        from bench_grounding import measure as _grounding_measure
        gr = _grounding_measure()
        return {"grounding_eval_clips_per_sec": gr["clips_per_sec"],
                "grounding_eval_sentences_per_sec": gr["sentences_per_sec"],
                "grounding_eval_step_ms": gr["full_ms"],
                "grounding_trunk_ms": gr["trunk_only_ms"]}

    # ---- long-video (YouMakeup shapes, T=800) ------------------------------
    def stage_longvideo(lowfi):
        import sys as _sys
        _sys.path.insert(0, os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "tools"))
        from bench_longvideo import measure as _lv_measure
        lv = _lv_measure(reps=1 if lowfi else 3)
        return {"longvideo_eval_clips_per_sec": lv["value"],
                "longvideo_eval_step_ms": lv["step_ms"],
                "longvideo_trunk_ms": lv["trunk_ms"]}

    # ---- end-to-end eval throughput (host + device) -----------------------
    def stage_e2e(lowfi):
        import sys as _sys
        _sys.path.insert(0, os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "tools"))
        from bench_eval_e2e import measure as _e2e_measure
        e2e = _e2e_measure(n_videos=16 if lowfi else 48, reps=1)
        return {
            "eval_e2e_clips_per_sec": e2e["pipelined"]["clips_per_sec"],
            "eval_e2e_steady_clips_per_sec":
                e2e["pipelined"].get("steady_clips_per_sec"),
            "eval_e2e_stages_s": e2e["pipelined"].get("stages_s", {}),
            "eval_e2e_deep_clips_per_sec": e2e["deep"]["clips_per_sec"],
            "eval_e2e_serial_clips_per_sec": e2e["serial"]["clips_per_sec"],
            "dispatch_rtt_ms": e2e["dispatch_rtt_ms"],
            "h2d_MBps": e2e.get("h2d_MBps"),
            "eval_e2e_videos": 16 if lowfi else 48}

    # Order: train + SCST first (the only unquantified costs r4 left), then
    # the eval variants, grounding, long-video, and the host-bound e2e.
    # f32 re-measurements are interleaved mid-run and at the very end.
    run_stage("train", stage_train, est_s=240)
    run_stage("train_anetgt",
              stage_train_variant("train_step_ms_anetgt",
                                  dict(gt_counts="anet")), est_s=240)
    run_stage("train_bf16cap",
              stage_train_variant("train_step_ms_bf16cap",
                                  dict(caption_bf16=True)), est_s=240)
    run_stage("scst", stage_scst, est_s=360)
    run_stage("eval_f32_remeasure_mid", remeasure_f32, est_s=30)
    run_stage("bf16_decode", stage_bf16_decode, est_s=150)
    run_stage("full_bf16", stage_full_bf16, est_s=150)
    run_stage("grounding", stage_grounding, est_s=200)
    run_stage("longvideo", stage_longvideo, est_s=240)
    run_stage("e2e", stage_e2e, est_s=300)
    run_stage("eval_f32_remeasure_end", remeasure_f32, est_s=30)

    # the headline value is the FIRST measurement (cold-cache, same
    # protocol every round — comparable to r1..r4); the repeated runs and
    # their max are in eval_f32_runs_clips_per_sec / eval_f32_best.
    print(json.dumps({
        "metric": "anet_eval_clips_per_sec_per_chip",
        "value": round(clips_per_sec, 2),
        "unit": "clips/s",
        "vs_baseline": round(clips_per_sec / REF_GPU_CLIPS_PER_SEC, 3),
        **extras,
    }))
    try:
        os.remove(partial_path)
    except OSError:
        pass


def build_train_bench(cfg, *, enable_contrastive=True, caption_loss=True,
                      disable_mid_caption_heads=False, text_bf16=False,
                      caption_bf16=False, gt_counts="full", scst=False):
    """Flagship-shaped train-step bench world, shared by the headline bench
    and tools/bench_train_{amp,parts}.py: synthetic batch -> params ->
    StepStatics -> jitted step. Returns (state, db, weights, step_fn).

    gt_counts: 'full' fills every GT slot (worst case for the matcher);
    'anet' samples per-video event counts from the empirical ActivityNet
    distribution (COUNTER_CLASS_RATE; mean ~3.7 of G slots) — the realistic
    load for the size-aware matcher and the caption teacher-forcing mask."""
    import jax.numpy as jnp
    from gvl_tpu.models import build_model
    from gvl_tpu.models.text_encoder import load_text_encoder
    from gvl_tpu.train.criterion import LossSpec, make_weight_dict
    from gvl_tpu.train.loop import init_params
    from gvl_tpu.train.state import (StepStatics, create_train_state,
                                     make_train_step)

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
    if gt_counts == "anet":
        from gvl_tpu.train.criterion import COUNTER_CLASS_RATE
        probs = np.asarray(COUNTER_CLASS_RATE)[:G + 1].astype(np.float64)
        probs = probs / probs.sum()
        counts = np.maximum(rng.choice(len(probs), size=B, p=probs), 1)
        batch["gt_mask"] = (np.arange(G)[None, :] < counts[:, None])
    params = init_params(model, cfg, bundle, batch)
    statics = StepStatics(
        spec=LossSpec.from_config(cfg), enable_contrastive=enable_contrastive,
        caption_loss=caption_loss, two_stage=False, train_text_encoder=False,
        disable_mid_caption_heads=disable_mid_caption_heads,
        enable_pos_emb_for_captioner=False,
        temporal_shapes=tuple(cfg.temporal_shapes()), text_bf16=text_bf16,
        caption_bf16=caption_bf16, caption_rl=scst)
    state = create_train_state(cfg, model, params, bundle.params, 100,
                               statics)
    step_fn, _, _ = make_train_step(model, bundle.apply_fn, cfg, statics)
    db = {k: jnp.asarray(v) for k, v in batch.items()}
    weights = {k: jnp.asarray(v, jnp.float32)
               for k, v in make_weight_dict(cfg).items()}
    return state, db, weights, step_fn


def train_chain_maker(step_fn):
    """Chained-K runner over a jitted train step (see _chain_time_flops)."""
    import jax

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
    return make_run


def _bench_train_step(cfg, **world_kw):
    """Chained-K timing of the full jitted train step (fwd+bwd+optimizer) at
    flagship shapes, B=16. Returns (sec/step, flops/step or None)."""
    cfg.batch_size = 16
    state, db, weights, step_fn = build_train_bench(cfg, **world_kw)
    return _chain_time_flops(train_chain_maker(step_fn),
                             (state, db, weights), k_small=2, k_big=6,
                             reps=3)


if __name__ == "__main__":
    main()
