"""EvalRunner with the gpt2 (ClipCap) head end-to-end.

Two contracts of the decode site (eval/evaluate.py gpt branch):
- eval_decode_early_exit on/off produce identical captions and scores
  (the fixed loop keeps argmax'ing past the stop token, the while_loop
  leaves zeros there — the genmask prefix cut hides both);
- the ids handed to gpt_decode never include the stop token or anything
  after it (gpt2 id 0 is a real token, '!', so zero-masking the ids would
  corrupt tok.decode — the cut must come from the mask, not from the
  values; reference GPT.py generator breaks at the stop token).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from gvl_tpu.eval.evaluate import EvalRunner
from gvl_tpu.models import build_model
from gvl_tpu.train.loop import make_gpt_tokenize
from tests.test_train_smoke import add_text, build_world, device_batch


def _run(tmp_path, early_exit, stop_id=None, collect_ids=None):
    cfg, ds, batcher, bundle, _ = build_world(
        tmp_path, caption_decoder_type="gpt2", prefix_length=4,
        disable_mid_caption_heads=True, eval_decode_early_exit=early_exit,
        eval_batch_size=4)
    cfg.prefix_size = cfg.hidden_dim
    gpt_spec, add_gpt, _ = make_gpt_tokenize(cfg)
    if stop_id is not None:
        gpt_spec = dataclasses.replace(gpt_spec, stop_token_id=stop_id)
    model = build_model(cfg, text_hidden_dim=bundle.hidden_size,
                        gpt_spec=gpt_spec)

    batch = add_gpt(add_text(next(iter(batcher)), bundle, cfg))
    db = device_batch(batch)
    G = cfg.effective_max_gt_events
    word = jnp.zeros((db["captions"].shape[0], G, cfg.max_text_input_len,
                      bundle.hidden_size))
    params = model.init(
        jax.random.PRNGKey(0), db["video_feats"], db["video_mask"],
        db["duration"], word_embed=word,
        token_mask=db["text_mask"].astype(bool), gt_mask=db["gt_mask"],
        captions=db["captions"], method=model.init_all)

    def gpt_decode(ids):
        ids = [int(i) for i in ids]
        if collect_ids is not None:
            collect_ids.append(ids)
        return " ".join(str(i) for i in ids)

    runner = EvalRunner(cfg, model, bundle, ds.translator,
                        gpt_decode=gpt_decode)
    runner.set_params(params, bundle.params)
    _, out_json, *_ = runner.run(batcher, str(tmp_path / "pred.json"))
    return out_json


def test_gpt2_eval_early_exit_equivalence(tmp_path):
    a = _run(tmp_path / "off", False)
    b = _run(tmp_path / "on", True)
    assert set(a["results"]) == set(b["results"])
    n_sent = 0
    for vid in a["results"]:
        for ia, ib in zip(a["results"][vid], b["results"][vid]):
            assert ia["sentence"] == ib["sentence"], vid
            np.testing.assert_allclose(ia["sentence_score"],
                                       ib["sentence_score"], rtol=1e-5)
            n_sent += 1
    assert n_sent > 0


def test_gpt2_decode_sees_only_prestop_ids(tmp_path):
    # pass 1: stop token that never fires -> learn which ids the random
    # model actually argmaxes (full-length captions, and the probe for a
    # token id that certainly appears)
    probe = []
    _run(tmp_path / "probe", False, stop_id=-1, collect_ids=probe)
    assert probe and all(len(ids) == 8 for ids in probe)  # max_caption_len
    stop = int(np.bincount(np.concatenate(probe)).argmax())

    # pass 2: make that most-frequent id the stop token -> decode must now
    # receive strictly pre-stop prefixes, and at least one caption must
    # actually have been cut short
    for early_exit in (False, True):
        seen = []
        _run(tmp_path / f"cut{early_exit}", early_exit, stop_id=stop,
             collect_ids=seen)
        assert seen
        assert all(stop not in ids for ids in seen)
        assert any(len(ids) < 8 for ids in seen)


def test_gpt2_eval_amp_runs(tmp_path):
    """eval_use_amp autocasts the gpt2 sample (reference pdvc.py:913-915):
    the bf16 decode completes and scores stay finite f32."""
    cfg, ds, batcher, bundle, _ = build_world(
        tmp_path, caption_decoder_type="gpt2", prefix_length=4,
        disable_mid_caption_heads=True, eval_batch_size=4)
    cfg.prefix_size = cfg.hidden_dim
    cfg.set("eval_use_amp", True)
    gpt_spec, add_gpt, _ = make_gpt_tokenize(cfg)
    model = build_model(cfg, text_hidden_dim=bundle.hidden_size,
                        gpt_spec=gpt_spec)

    batch = add_gpt(add_text(next(iter(batcher)), bundle, cfg))
    db = device_batch(batch)
    G = cfg.effective_max_gt_events
    word = jnp.zeros((db["captions"].shape[0], G, cfg.max_text_input_len,
                      bundle.hidden_size))
    params = model.init(
        jax.random.PRNGKey(0), db["video_feats"], db["video_mask"],
        db["duration"], word_embed=word,
        token_mask=db["text_mask"].astype(bool), gt_mask=db["gt_mask"],
        captions=db["captions"], method=model.init_all)

    runner = EvalRunner(cfg, model, bundle, ds.translator,
                        gpt_decode=lambda ids: " ".join(
                            str(int(i)) for i in ids))
    runner.set_params(params, bundle.params)
    _, out_json, *_ = runner.run(batcher, str(tmp_path / "pred.json"))
    scores = [p["sentence_score"] for v in out_json["results"].values()
              for p in v]
    assert scores and all(np.isfinite(s) for s in scores)
