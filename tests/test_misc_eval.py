"""Zero-shot TAL conversion, matching-score path, proposal plots."""

import json

import jax
import jax.numpy as jnp
import numpy as np

from gvl_tpu.eval.evaluate import EvalRunner
from gvl_tpu.eval.zeroshot_tal import convert_dvc_to_zeroshot_tal
from tests.test_train_smoke import add_text, build_world, device_batch


def test_zeroshot_tal_conversion(tmp_path):
    dvc = {"results": {"v_abc45678901234": [
        {"timestamp": [0, 5], "proposal_score": 0.8,
         "tal_cl_scores": [0.1, 0.9, 0.3]},
        {"timestamp": [5, 9], "proposal_score": 0.5,
         "tal_cl_scores": [0.7, 0.2, 0.1]},
    ]}}
    p = tmp_path / "d.json"
    p.write_text(json.dumps(dvc))
    out = convert_dvc_to_zeroshot_tal(str(p), ["run", "jump", "eat"])
    res = json.load(open(out))["results"]["abc45678901234"]
    assert res[0]["label"] == "jump" and res[1]["label"] == "run"
    assert abs(res[0]["score"] - 1.7) < 1e-6


def test_eval_with_matching_score(tmp_path, rng):
    cfg, ds, batcher, bundle, model = build_world(
        tmp_path, eval_enable_matching_score=True)
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
    out_path, out_json, *_ = runner.run(batcher, str(tmp_path / "p.json"))
    item = next(iter(out_json["results"].values()))[0]
    # matching scores are cosines in [-1, 1], and not all exactly zero
    all_scores = [p["cl_score"] for v in out_json["results"].values()
                  for p in v]
    assert all(-1.01 <= s <= 1.01 for s in all_scores)
    assert any(abs(s) > 1e-6 for s in all_scores)
