"""End-to-end eval pipeline test: run EvalRunner on a tiny model + synthetic
data, validate the DVC/grounding JSON contracts and grounding metrics."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from gvl_tpu.eval.evaluate import EvalRunner
from gvl_tpu.eval.metrics.grounding import eval_grounding_result
from tests.test_train_smoke import add_text, build_world, device_batch


def test_eval_runner_contracts(tmp_path, rng):
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

    runner = EvalRunner(cfg, model, bundle, ds.translator)
    runner.set_params(params, bundle.params)
    dvc_path = str(tmp_path / "pred.json")
    out_path, out_json, out_g, aux_g, loss_sum = runner.run(
        batcher, dvc_path)

    # DVC contract
    with open(out_path) as f:
        saved = json.load(f)
    assert "results" in saved and saved.get("version", "VERSION 1.0")
    assert len(out_json["results"]) == len(ds)
    item = next(iter(out_json["results"].values()))[0]
    for k in ["timestamp", "raw_box", "label", "proposal_score", "sentence",
              "sentence_score", "cl_score", "query_id", "vid_duration",
              "pred_event_count"]:
        assert k in item, k
    assert isinstance(item["sentence"], str)
    assert len(item["timestamp"]) == 2

    # grounding contract + metrics pipeline
    g_path = out_path + ".grounding.json" if not out_path.endswith(
        ".grounding.json") else out_path
    grounding_gt = cfg.train_caption_file.replace("anno.json",
                                                  "grounding.json")
    scores = eval_grounding_result(g_path, grounding_gt)
    for k in ["mIOU", "R@1IOU0.5", "R@5IOU0.1"]:
        assert k in scores
        assert 0.0 <= scores[k] <= 1.0
    # the result keys must actually match the GT keys (both 'v_'-stripped):
    # random boxes yield a small-but-nonzero mean IoU
    assert scores["mIOU"] > 0.0
    # every GT sentence got exactly one prediction entry
    gt = json.load(open(cfg.train_caption_file))
    n_gt = sum(min(len(v["timestamps"]), cfg.effective_max_gt_events)
               for v in gt.values())
    assert len(out_g["results"]) == n_gt

    # losses accumulated
    assert "loss_ce" in loss_sum and np.isfinite(loss_sum["loss_ce"])

    # per-stage host-time attribution populated by the run
    timing = runner.last_timing
    for k in ("batcher", "upload", "dispatch", "fetch", "assemble",
              "finalize"):
        assert k in timing and timing[k] >= 0.0, k

    # the plot hook ran by default (reference parity, eval_utils.py:259)
    # and eval_disable_plot_hook skips it (same jitted step, no recompile)
    assert os.path.exists(str(tmp_path / "pred.png"))
    cfg.eval_disable_plot_hook = True
    out_path2, *_ = runner.run(batcher, str(tmp_path / "pred2.json"))
    assert os.path.exists(out_path2)
    assert not os.path.exists(str(tmp_path / "pred2.png"))
