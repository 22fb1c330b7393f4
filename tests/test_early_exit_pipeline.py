"""Wiring test: EvalRunner with eval_decode_early_exit on vs off produces
identical captions and scores (the knob threads cfg ->
model.caption_sample(early_exit=...) -> the while_loop decode).
"""

import jax
import jax.numpy as jnp
import numpy as np

from gvl_tpu.eval.evaluate import EvalRunner
from tests.test_train_smoke import add_text, build_world, device_batch


def _run(tmp_path, early_exit: bool):
    cfg, ds, batcher, bundle, model = build_world(
        tmp_path, eval_decode_early_exit=early_exit)
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
    _, out_json, *_ = runner.run(batcher, str(tmp_path / "pred.json"))
    return out_json


def test_eval_runner_early_exit_equivalence(tmp_path):
    a = _run(tmp_path / "off", False)
    b = _run(tmp_path / "on", True)
    assert set(a["results"]) == set(b["results"])
    for vid in a["results"]:
        for ia, ib in zip(a["results"][vid], b["results"][vid]):
            assert ia["sentence"] == ib["sentence"], vid
            np.testing.assert_allclose(ia["sentence_score"],
                                       ib["sentence_score"], rtol=1e-5)
            np.testing.assert_allclose(ia["timestamp"], ib["timestamp"],
                                       rtol=1e-6)
