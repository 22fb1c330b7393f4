"""Opt-in bf16 caption decode: runs, produces valid sequences, and mostly
agrees with the f32 greedy decode."""

import jax
import jax.numpy as jnp
import numpy as np

from gvl_tpu.eval.evaluate import EvalRunner
from tests.test_train_smoke import add_text, build_world, device_batch


def test_bf16_decode_runs_and_agrees(tmp_path, rng):
    cfg, ds, batcher, bundle, model = build_world(tmp_path)
    batch = add_text(next(iter(batcher)), bundle, cfg)
    db = device_batch(batch)
    G = cfg.effective_max_gt_events
    word = jnp.zeros((db["captions"].shape[0], G, cfg.max_text_input_len,
                      bundle.hidden_size))
    params = model.init(
        jax.random.PRNGKey(0), db["video_feats"], db["video_mask"],
        db["duration"], word_embed=word,
        token_mask=db["text_mask"].astype(bool), gt_mask=db["gt_mask"],
        captions=db["captions"], method=model.init_all)

    outs = {}
    for bf16 in (False, True):
        cfg.set("eval_decode_bf16", bf16)
        runner = EvalRunner(cfg, model, bundle, ds.translator)
        runner.set_params(params, bundle.params)
        _, out_json, *_ = runner.run(batcher, str(tmp_path / f"p{bf16}.json"))
        outs[bf16] = out_json

    sents32 = [p["sentence"] for v in outs[False]["results"].values()
               for p in v]
    sents16 = [p["sentence"] for v in outs[True]["results"].values()
               for p in v]
    assert len(sents32) == len(sents16)
    # NOTE: with random-init weights the logits are near-uniform, so bf16
    # rounding flips most argmaxes — agreement with f32 can only be judged on
    # trained checkpoints (the flag is opt-in for exactly that reason). Here
    # we assert the path runs and produces well-formed strings.
    assert all(isinstance(s, str) for s in sents16)
    scores16 = [p["sentence_score"] for v in outs[True]["results"].values()
                for p in v]
    assert all(np.isfinite(s) for s in scores16)


def test_full_bf16_eval_runs(tmp_path, rng):
    """eval_full_bf16: whole forward in bf16 — pipeline completes, trunk
    detections stay close to the f32 ones (continuous outputs; unlike the
    argmax'd captions these are directly comparable at random init)."""
    cfg, ds, batcher, bundle, model = build_world(tmp_path)
    batch = add_text(next(iter(batcher)), bundle, cfg)
    db = device_batch(batch)
    G = cfg.effective_max_gt_events
    word = jnp.zeros((db["captions"].shape[0], G, cfg.max_text_input_len,
                      bundle.hidden_size))
    params = model.init(
        jax.random.PRNGKey(0), db["video_feats"], db["video_mask"],
        db["duration"], word_embed=word,
        token_mask=db["text_mask"].astype(bool), gt_mask=db["gt_mask"],
        captions=db["captions"], method=model.init_all)

    dets = {}
    for bf16 in (False, True):
        cfg.set("eval_full_bf16", bf16)
        runner = EvalRunner(cfg, model, bundle, ds.translator)
        runner.set_params(params, bundle.params)
        _, out_json, *_ = runner.run(batcher, str(tmp_path / f"f{bf16}.json"))
        dets[bf16] = out_json
    cfg.set("eval_full_bf16", False)

    for key, vids in dets[True]["results"].items():
        ref = dets[False]["results"][key]
        assert len(vids) == len(ref)
        # assembly order comes from top_k over near-tied random-init scores,
        # so bf16 rounding can swap ranks — pair by query_id, not position
        vids = sorted(vids, key=lambda p: p["query_id"])
        ref = sorted(ref, key=lambda p: p["query_id"])
        for p16, p32 in zip(vids, ref):
            assert np.isfinite(p16["proposal_score"])
            # box geometry within bf16 rounding of the f32 trunk
            # (timestamps are duration-scaled — tens of seconds — so the
            # bound is relative: bf16 has ~2-3 significant decimal digits)
            np.testing.assert_allclose(p16["timestamp"], p32["timestamp"],
                                       rtol=0.03, atol=0.2)


def test_full_bf16_two_stage_eval_runs(tmp_path, rng):
    """eval_full_bf16 x transformer_input_type=gt_proposals: the proposals
    fed to the bf16 trunk are cast to bf16 (ADVICE r3 #2 — otherwise the
    pos_trans / decoder queries silently promote back to f32 against bf16
    memory), and the pipeline completes with finite outputs."""
    cfg, ds, batcher, bundle, model = build_world(
        tmp_path, transformer_input_type="gt_proposals")
    batch = add_text(next(iter(batcher)), bundle, cfg)
    db = device_batch(batch)
    G = cfg.effective_max_gt_events
    word = jnp.zeros((db["captions"].shape[0], G, cfg.max_text_input_len,
                      bundle.hidden_size))
    params = model.init(
        jax.random.PRNGKey(0), db["video_feats"], db["video_mask"],
        db["duration"], word_embed=word,
        token_mask=db["text_mask"].astype(bool), gt_mask=db["gt_mask"],
        captions=db["captions"], proposals=db["gt_boxes"],
        proposals_mask=db["gt_mask"], method=model.init_all)

    cfg.set("eval_full_bf16", True)
    runner = EvalRunner(cfg, model, bundle, ds.translator)
    runner.set_params(params, bundle.params)
    _, out_json, *_ = runner.run(batcher, str(tmp_path / "ts16.json"))
    cfg.set("eval_full_bf16", False)
    scores = [p["proposal_score"] for v in out_json["results"].values()
              for p in v]
    assert scores and all(np.isfinite(s) for s in scores)
