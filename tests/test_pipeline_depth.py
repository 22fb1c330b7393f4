"""The eval loop's in-flight pipelining (GVL_EVAL_PIPELINE_DEPTH, plus the
async device->host result copies issued at dispatch time) is a scheduling
change only: any depth must produce bit-identical prediction JSON and loss
aggregates to the fully serial loop (GVL_EVAL_SERIAL=1).

Reference behavior being preserved: the reference's eval loop is serial
(eval_utils.py evaluate()); pipelining is a TPU-serving addition that must
not change outputs.
"""

import os

import jax
import jax.numpy as jnp
import pytest

from gvl_tpu.eval.evaluate import EvalRunner
from tests.test_train_smoke import add_text, build_world, device_batch


def _run_mode(runner, batcher, tmp_path, tag, env):
    for k in ("GVL_EVAL_SERIAL", "GVL_EVAL_PIPELINE_DEPTH"):
        os.environ.pop(k, None)
    os.environ.update(env)
    try:
        _, out_json, out_g, aux_g, loss_sum = runner.run(
            batcher, str(tmp_path / f"pred_{tag}.json"))
    finally:
        for k in ("GVL_EVAL_SERIAL", "GVL_EVAL_PIPELINE_DEPTH"):
            os.environ.pop(k, None)
    return out_json, out_g, aux_g, dict(loss_sum)


@pytest.mark.core
def test_pipeline_depth_matches_serial(tmp_path, rng):
    cfg, _, _, bundle, model = build_world(tmp_path)
    from gvl_tpu.data.dataset import Batcher, DenseVideoDataset
    # eval-style loader: no shuffle, no training-time augmentation — each
    # runner.run() pass must see identical batches for the A/B to be exact
    ds = DenseVideoDataset(cfg.train_caption_file,
                           cfg.visual_feature_folder,
                           cfg.dict_file, False, cfg)
    batcher = Batcher(ds, cfg, cfg.batch_size, shuffle=False)
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

    serial = _run_mode(runner, batcher, tmp_path, "serial",
                       {"GVL_EVAL_SERIAL": "1"})
    deep = _run_mode(runner, batcher, tmp_path, "deep",
                     {"GVL_EVAL_PIPELINE_DEPTH": "4"})
    default = _run_mode(runner, batcher, tmp_path, "default", {})

    for got, tag in ((deep, "depth=4"), (default, "depth=1")):
        assert got[0] == serial[0], f"{tag}: DVC JSON differs"
        assert got[1] == serial[1], f"{tag}: grounding JSON differs"
        assert got[2] == serial[2], f"{tag}: aux grounding JSON differs"
        assert got[3] == serial[3], f"{tag}: loss aggregates differ"
