"""Data-parallel eval: batches sharded over a 'dp' mesh produce the same
results as single-device eval (runs on the 8-virtual-CPU-device mesh)."""

import jax
import jax.numpy as jnp
import numpy as np

from gvl_tpu.eval.evaluate import EvalRunner
from gvl_tpu.parallel import make_mesh
from tests.test_train_smoke import add_text, build_world, device_batch


def test_dp_eval_matches_single_device(tmp_path):
    cfg, ds, batcher, bundle, model = build_world(tmp_path,
                                                  eval_batch_size=4)
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

    def run(mesh):
        from gvl_tpu.data.dataset import Batcher
        b = Batcher(ds, cfg, cfg.eval_batch_size, shuffle=False)
        runner = EvalRunner(cfg, model, bundle, ds.translator, mesh=mesh)
        runner.set_params(params, bundle.params)
        _, out_json, out_g, _, loss = runner.run(
            b, str(tmp_path / f"pred_{'dp' if mesh else 'single'}.json"))
        return out_json, out_g, loss

    single_json, single_g, single_loss = run(None)
    mesh = make_mesh(4, "dp")
    assert mesh.shape["dp"] == 4
    dp_json, dp_g, dp_loss = run(mesh)

    assert sorted(dp_json["results"]) == sorted(single_json["results"])
    for vid in single_json["results"]:
        s_items, d_items = single_json["results"][vid], dp_json["results"][vid]
        assert len(s_items) == len(d_items)
        for s, d in zip(s_items, d_items):
            assert s["sentence"] == d["sentence"]
            np.testing.assert_allclose(s["timestamp"], d["timestamp"],
                                       atol=1e-3)
            assert abs(s["proposal_score"] - d["proposal_score"]) < 1e-4
    assert sorted(dp_g["results"]) == sorted(single_g["results"])
    for k in single_g["results"]:
        np.testing.assert_allclose(single_g["results"][k][0]["timestamp"],
                                   dp_g["results"][k][0]["timestamp"],
                                   atol=1e-3)
    for k in single_loss:
        assert abs(single_loss[k] - dp_loss[k]) < 5e-2, k
