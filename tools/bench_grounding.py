#!/usr/bin/env python
"""Device-side grounding-eval throughput at TACoS ssvg shapes.

The grounding workflow (scripts/eval_tacos_grounding.sh; reference
eval script densevid_eval3/eval_grounding usage via eval.py
--eval_enable_grounding --eval_disable_captioning) runs a different hot
path than the DVC headline bench: no autoregressive decode, but a
RoBERTa-shaped text encoder over B*G sentences, word-context attention
pooling, and TWO grounding_outputs passes (final + aux decoder layer,
reference pdvc.py:371-382) with maximum matching.

Variants (each its own chained-K compile):
  full        production grounding eval step (EvalRunner._eval_step with
              captioning disabled) — trunk + criterion + text + grounding
  trunk_only  the deformable trunk forward alone (same shapes)

Shapes mirror cfgs/tacos_c3d_ssvg.yml (T=200, D=4096, Nq=100, hidden 512,
enc/dec 2+2, G=64 padded sentences) at eval_batch_size 16; the text
encoder is the offline fallback (hidden 256) — same module tree the DVC
bench uses, so numbers compose. Prints one JSON line with clips/s and
sentences/s.

Usage: python tools/bench_grounding.py [--tiny]
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TINY = "--tiny" in sys.argv


def _tacos_cfg(tiny: bool):
    from gvl_tpu.config import Config
    cfg = Config()
    if tiny:
        cfg.update(dict(
            hidden_dim=64, nheads=4, enc_layers=1, dec_layers=2,
            transformer_ff_dim=64, num_feature_levels=3, num_queries=8,
            feature_dim=16, frame_embedding_num=16, vocab_size=100,
            input_encoding_size=32, rnn_size=32, att_hid_size=32,
            max_caption_len=6, cap_nheads=1, cap_num_feature_levels=3,
            gt_proposal_sample_num=3, max_eseq_length=6,
            contrastive_hidden_size=16, max_text_input_len=8,
            eval_batch_size=2))
    else:
        # tacos_c3d_ssvg-shaped (cfgs/tacos_c3d_ssvg.yml)
        cfg.update(dict(
            hidden_dim=512, nheads=8, enc_layers=2, dec_layers=2,
            transformer_ff_dim=512, num_feature_levels=4, num_queries=100,
            feature_dim=4096, frame_embedding_num=200, vocab_size=1569,
            input_encoding_size=512, rnn_size=512, att_hid_size=512,
            max_caption_len=30, cap_nheads=1, cap_num_feature_levels=4,
            gt_proposal_sample_num=1000, max_eseq_length=20,
            contrastive_hidden_size=128, max_text_input_len=32,
            eval_batch_size=16))
    cfg.update(dict(
        with_box_refine=1, enable_contrastive=True,
        enable_cross_video_cl=True, enable_word_context_modeling=True,
        caption_decoder_type="standard", caption_loss_coef=2.0,
        eval_disable_captioning=True, eval_enable_grounding=True,
        eval_enable_maximum_matching_for_grounding=True,
        set_cost_cl=2.0, set_cost_class=2.0, cls_loss_coef=2.0,
        giou_loss_coef=4.0, bbox_loss_coef=0.0, count_loss_coef=0.5,
        load_pretrained_language_model_from_config="offline",
        offline_text_encoder_hidden=64 if tiny else 256,
        offline_text_encoder_layers=1))
    return cfg


def measure(tiny: bool = False):
    """Time the grounding eval step (full + trunk-only) at TACoS ssvg
    shapes. Assumes the jax backend is already selected (bench.py and
    main() both handle platform setup before calling). Returns the
    result dict."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from bench import _chain_time_flops, V5E_PEAK_BF16
    from gvl_tpu.eval.evaluate import EvalRunner
    from gvl_tpu.models import build_model
    from gvl_tpu.models.text_encoder import load_text_encoder
    from gvl_tpu.train.loop import init_params

    cfg = _tacos_cfg(tiny)
    cfg.msda_impl = "pallas" if jax.default_backend() != "cpu" else "ref"
    bundle = load_text_encoder(cfg)
    model = build_model(cfg, text_hidden_dim=bundle.hidden_size)

    B = cfg.eval_batch_size
    T, D = cfg.frame_embedding_num, cfg.feature_dim
    G, Lc = cfg.effective_max_gt_events, cfg.max_caption_len
    Ltok = cfg.max_text_input_len
    rng = np.random.RandomState(0)
    batch = dict(
        video_feats=rng.randn(B, T, D).astype(np.float32),
        video_mask=np.ones((B, T), bool),
        duration=rng.uniform(60, 300, (B,)).astype(np.float32),
        gt_boxes=np.stack([np.full((B, G), 0.5), np.full((B, G), 0.3)],
                          -1).astype(np.float32),
        gt_labels=np.zeros((B, G), np.int32),
        gt_mask=np.ones((B, G), bool),
        captions=rng.randint(1, cfg.vocab_size, (B, G, Lc)).astype(np.int32),
        caption_mask=np.ones((B, G, Lc), bool),
        text_ids=rng.randint(3, 100, (B, G, Ltok)).astype(np.int32),
        text_mask=np.ones((B, G, Ltok), np.int32),
    )
    batch["captions"][..., 0] = 0
    params = init_params(model, cfg, bundle, batch)
    runner = EvalRunner(cfg, model, bundle, translator=None)
    db = {k: jnp.asarray(v) for k, v in batch.items()}
    text_params = bundle.params

    def chained_full(K):
        @jax.jit
        def run(params, text_params, db):
            def body(i, carry):
                f, acc = carry
                b = dict(db)
                b["video_feats"] = f
                res, _aux = runner._eval_step(params, text_params, b)
                fp = (jnp.sum(res["grounding"]["confs"])
                      + jnp.sum(res["grounding"]["boxes"])
                      + jnp.sum(res["grounding_aux"]["cl_scores"]))
                return db["video_feats"] + 1e-9 * fp, acc + fp
            _, acc = jax.lax.fori_loop(0, K, body, (db["video_feats"], 0.0))
            return acc
        return run

    def chained_trunk(K):
        @jax.jit
        def run(params, text_params, db):
            def body(i, carry):
                f, acc = carry
                out = model.apply(params, f, db["video_mask"],
                                  db["duration"], deterministic=True)
                fp = jnp.sum(out["pred_logits"]) + jnp.sum(out["pred_boxes"])
                return db["video_feats"] + 1e-9 * fp, acc + fp
            _, acc = jax.lax.fori_loop(0, K, body, (db["video_feats"], 0.0))
            return acc
        return run

    out = {}
    for name, maker in (("full", chained_full), ("trunk_only",
                                                 chained_trunk)):
        dt, flops = _chain_time_flops(maker, (params, text_params, db),
                                      k_small=2, k_big=6, reps=2)
        out[name + "_ms"] = round(dt * 1e3, 3)
        if name == "full":
            out["clips_per_sec"] = round(B / dt, 2)
            out["sentences_per_sec"] = round(B * G / dt, 1)
            if flops:
                out["tflops_per_step"] = round(flops / 1e12, 4)
                out["mfu"] = round(flops / dt / V5E_PEAK_BF16, 4)
        print(f"# {name}: {dt * 1e3:.2f} ms", file=sys.stderr, flush=True)
    return out


def main():
    if TINY:
        # force CPU BEFORE any backend touch: apply_env_platform would
        # eagerly init the tunneled TPU (JAX_PLATFORMS=axon) and a config
        # update after init does not reliably switch the default backend
        import jax
        jax.config.update("jax_platforms", "cpu")
        os.environ["JAX_PLATFORMS"] = "cpu"
    else:
        from gvl_tpu.utils.platform import (apply_env_platform,
                                            enable_compilation_cache)
        apply_env_platform()
        enable_compilation_cache()
    out = measure(TINY)
    print(json.dumps({"metric": "tacos_grounding_eval_b16", **out}))


if __name__ == "__main__":
    main()
