#!/usr/bin/env python
"""Long-video eval benchmark: YouMakeup-shaped shapes (T=800 frames, 4-level
pyramid -> S=1500 memory tokens, Nq=100 queries, i3d 1024-d features) — the
longest-sequence configuration the reference ships (cfgs/ym_i3d_msvg_dvc.yml).

Uses the same chained-K protocol as bench.py. Run on the TPU:
    python tools/bench_longvideo.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def measure(bf16_decode=False, bf16_trunk=False, early_exit=False,
            eos_bias=None, k_small=2, k_big=8, reps=3, batch=8):
    """Chained-K long-video eval measurement; returns the result dict.
    Importable by bench.py's long-video stage (backend must already be
    initialized by the caller)."""
    import jax
    import jax.numpy as jnp

    from gvl_tpu.config import Config
    from gvl_tpu.eval.postprocess import detection_outputs
    from gvl_tpu.models import build_model

    cfg = Config()
    cfg.update(dict(
        hidden_dim=512, nheads=8, enc_layers=2, dec_layers=2,
        transformer_ff_dim=512, num_feature_levels=4, num_queries=100,
        feature_dim=1024, frame_embedding_num=800, vocab_size=1247,
        input_encoding_size=512, rnn_size=512, att_hid_size=512,
        max_caption_len=30, cap_nheads=1, cap_num_feature_levels=4,
        gt_proposal_sample_num=300, max_eseq_length=10,
        contrastive_hidden_size=128, max_text_input_len=32,
        with_box_refine=1, enable_contrastive=True,
        caption_decoder_type="standard",
        load_pretrained_language_model_from_config="offline",
        offline_text_encoder_hidden=256, offline_text_encoder_layers=1))
    cfg.msda_impl = "pallas" if jax.default_backend() != "cpu" else "ref"
    model = build_model(cfg, text_hidden_dim=256)
    shapes = tuple(cfg.temporal_shapes())

    B, T, D = batch, cfg.frame_embedding_num, cfg.feature_dim
    rng = np.random.RandomState(0)
    feats = jnp.asarray(rng.randn(B, T, D).astype(np.float32))
    mask = jnp.ones((B, T), bool)
    dur = jnp.asarray(rng.uniform(100, 300, (B,)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), feats, mask, dur)
    probe = model.apply(params, feats, mask, dur)
    cap = model.init(
        jax.random.PRNGKey(1), cfg.dec_layers - 1, probe["hs"][-1],
        probe["layer_refs"][-1], probe["memory"], probe["mask_flat"], shapes,
        probe["valid_ratios"],
        jnp.zeros((B, cfg.num_queries, cfg.max_caption_len), jnp.int32),
        method=model.caption_train)
    merged = {"params": {**cap["params"], **params["params"]}}

    bf16_decode = bf16_decode or bf16_trunk   # eval_full_bf16 implies decode
    if bf16_decode:
        cast = lambda x: x.astype(jnp.bfloat16) \
            if hasattr(x, "dtype") and x.dtype == jnp.float32 else x

    # early_exit [+ eos_bias C]: while_loop decode on a realistic
    # termination profile (random init never emits EOS; bias the EOS logit
    # to emulate trained caption lengths — see tools/bench_early_exit.py)
    if eos_bias is not None:
        merged = jax.tree_util.tree_map(lambda x: x, merged)
        head = merged["params"]["caption_head_0"]
        head["logit"]["bias"] = head["logit"]["bias"].at[0].add(eos_bias)

    def full(params, feats, mask, duration):
        if bf16_trunk:
            # the eval_full_bf16 path of EvalRunner: whole forward bf16
            params = jax.tree_util.tree_map(cast, params)
            feats = feats.astype(jnp.bfloat16)
        out = model.apply(params, feats, mask, duration)
        if bf16_trunk:
            out = jax.tree_util.tree_map(
                lambda x: x.astype(jnp.float32)
                if hasattr(x, "dtype") and x.dtype == jnp.bfloat16 else x,
                out)
        cap_params, query, memory = params, out["hs"][-1], out["memory"]
        if bf16_decode:
            # the eval_decode_bf16 path of EvalRunner: cast the caption-head
            # params + decode inputs; trunk stays f32
            import jax as _jax
            cap_params = _jax.tree_util.tree_map(cast, params)
            query = query.astype(jnp.bfloat16)
            memory = memory.astype(jnp.bfloat16)
        seq, lps = model.apply(
            cap_params, cfg.dec_layers - 1, query, out["layer_refs"][-1],
            memory, out["mask_flat"], shapes, out["valid_ratios"],
            early_exit=early_exit, method=model.caption_sample)
        det = detection_outputs(out, duration)
        return (jnp.sum(det["scores"]) + jnp.sum(lps.astype(jnp.float32))) \
            * 1e-6

    def chained(K):
        @jax.jit
        def run(params, feats, mask, duration):
            def body(i, carry):
                f, acc = carry
                fp = full(params, f, mask, duration)
                return feats + 1e-9 * fp, acc + fp
            _, acc = jax.lax.fori_loop(0, K, body, (feats, 0.0))
            return acc
        return run

    rs, rb = chained(k_small), chained(k_big)
    float(rs(merged, feats, mask, dur))
    float(rb(merged, feats, mask, dur))

    def t(f):
        best = 1e9
        for _ in range(reps):
            t0 = time.perf_counter()
            float(f(merged, feats, mask, dur))
            best = min(best, time.perf_counter() - t0)
        return best

    dt = (t(rb) - t(rs)) / (k_big - k_small)

    # trunk-only split (same protocol) for the roofline decomposition
    def trunk_chained(K):
        @jax.jit
        def run(params, feats, mask, duration):
            if bf16_trunk:
                params = jax.tree_util.tree_map(cast, params)
                feats = feats.astype(jnp.bfloat16)
            def body(i, carry):
                f, acc = carry
                out = model.apply(params, f, mask, duration)
                fp = jnp.sum(out["pred_logits"].astype(jnp.float32)) * 1e-6
                return feats + 1e-9 * fp.astype(feats.dtype), acc + fp
            _, acc = jax.lax.fori_loop(0, K, body, (feats, 0.0))
            return acc
        return run

    ts_, tb_ = trunk_chained(k_small), trunk_chained(k_big)
    float(ts_(merged, feats, mask, dur)); float(tb_(merged, feats, mask, dur))
    dt_trunk = (t(tb_) - t(ts_)) / (k_big - k_small)

    extra = {}
    if early_exit or eos_bias is not None:
        seq, _ = model.apply(
            merged, cfg.dec_layers - 1, probe["hs"][-1],
            probe["layer_refs"][-1], probe["memory"], probe["mask_flat"],
            shapes, probe["valid_ratios"], early_exit=early_exit,
            method=model.caption_sample)
        extra["mean_caption_len"] = round(
            float((seq > 0).sum(-1).mean()), 2)
        extra["early_exit"] = early_exit

    return {
        "metric": "ym_longvideo_eval_clips_per_sec_per_chip",
        "value": round(B / dt, 2), "unit": "clips/s",
        "step_ms": round(dt * 1e3, 2),
        "trunk_ms": round(dt_trunk * 1e3, 2),
        "decode_ms": round((dt - dt_trunk) * 1e3, 2),
        "shapes": dict(B=B, T=T, S=sum(shapes), Nq=cfg.num_queries),
        **extra}


def main():
    from gvl_tpu.utils.platform import apply_env_platform
    apply_env_platform()
    eos_bias = None
    if "--eos-bias" in sys.argv:
        eos_bias = float(sys.argv[sys.argv.index("--eos-bias") + 1])
    out = measure(bf16_decode="--bf16" in sys.argv,
                  bf16_trunk="--bf16-trunk" in sys.argv,
                  early_exit="--early-exit" in sys.argv, eos_bias=eos_bias)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
