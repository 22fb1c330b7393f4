"""Zero-shot TAL end-to-end: class-name embeddings attach tal_cl_scores to
every prediction; the converter turns the DVC json into a TAL submission."""

import json

import jax
import jax.numpy as jnp

from gvl_tpu.eval.evaluate import EvalRunner
from gvl_tpu.eval.zeroshot_tal import convert_dvc_to_zeroshot_tal
from tests.test_train_smoke import add_text, build_world, device_batch


def test_zeroshot_tal_end_to_end(tmp_path, rng):
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
    classes = ["running", "jumping", "cooking"]
    runner.enable_zeroshot_tal(classes)
    out_path, out_json, *_ = runner.run(batcher, str(tmp_path / "p.json"))

    item = next(iter(out_json["results"].values()))[0]
    assert len(item["tal_cl_scores"]) == 3
    assert len(item["aux_tal_cl_scores"]) == 3

    tal_path = convert_dvc_to_zeroshot_tal(out_path, classes)
    tal = json.load(open(tal_path))
    items = next(iter(tal["results"].values()))
    assert items and items[0]["label"] in classes
