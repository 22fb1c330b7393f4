"""Round-3 ergonomics fixes (VERDICT r2 item 5):

- compute_criterion(row_mask=...) must make a padded batch (repeated rows)
  score bit-identically to the unpadded batch — so eval loss logging and
  val-loss checkpoint selection are immune to partial-batch padding;
- make_mesh_for_batch warns when devices idle;
- eval_beam_size > 1 with a non-LSTM head is a config-time error;
- criteria_for_best_ckpt = 'val_loss' selects by (negated) total val loss.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from gvl_tpu.train.criterion import LossSpec, compute_criterion


def _fake_world(rng, B, Ld=2, Nq=10, G=3, K=1, D=8):
    f = lambda *s: jnp.asarray(rng.randn(*s).astype(np.float32))
    outputs = {
        "pred_logits": f(Ld, B, Nq, K),
        "pred_boxes": jnp.asarray(
            rng.uniform(0.1, 0.9, (Ld, B, Nq, 2)).astype(np.float32)),
        "pred_count": f(Ld, B, 6),
        "event_embed": f(Ld, B, Nq, D),
    }
    gt_boxes = jnp.asarray(rng.uniform(0.2, 0.8, (B, G, 2)).astype(np.float32))
    gt_labels = jnp.zeros((B, G), jnp.int32)
    gt_mask = jnp.asarray(rng.rand(B, G) < 0.8)
    gt_mask = gt_mask.at[:, 0].set(True)
    text = [f(B, G, D) for _ in range(Ld)]
    return outputs, gt_boxes, gt_labels, gt_mask, text


@pytest.mark.parametrize("cross_video,e2t,bg", [
    (True, False, False), (False, False, False),
    (True, True, True), (False, True, False)])
def test_row_mask_matches_unpadded(rng, cross_video, e2t, bg):
    B_real, B_pad = 3, 5
    out, gtb, gtl, gtm, text = _fake_world(rng, B_real)
    spec = LossSpec(enable_cross_video_cl=cross_video, enable_e2t_cl=e2t,
                    enable_bg_for_cl=bg)
    if e2t:
        out["background_embed"] = jnp.asarray(
            rng.randn(1, 8).astype(np.float32))

    losses_real, _ = compute_criterion(out, gtb, gtl, gtm, text, spec)

    # pad by repeating the last real row — exactly what EvalRunner.run does
    reps = [min(i, B_real - 1) for i in range(B_pad)]

    def pad(x, axis):
        return jnp.take(x, jnp.asarray(reps), axis=axis)

    out_p = {k: pad(v, 1) for k, v in out.items() if k != "background_embed"}
    if "background_embed" in out:
        out_p["background_embed"] = out["background_embed"]
    text_p = [pad(t, 0) for t in text]
    row_mask = jnp.arange(B_pad) < B_real

    losses_pad, _ = compute_criterion(
        out_p, pad(gtb, 0), pad(gtl, 0), pad(gtm, 0), text_p, spec,
        row_mask=row_mask)

    assert set(losses_real) == set(losses_pad)
    for k in losses_real:
        np.testing.assert_allclose(
            np.asarray(losses_pad[k]), np.asarray(losses_real[k]),
            rtol=2e-5, atol=1e-6, err_msg=k)


def test_row_mask_none_unchanged(rng):
    out, gtb, gtl, gtm, text = _fake_world(rng, 4)
    spec = LossSpec()
    l1, _ = compute_criterion(out, gtb, gtl, gtm, text, spec)
    l2, _ = compute_criterion(out, gtb, gtl, gtm, text, spec,
                              row_mask=jnp.ones(4, bool))
    for k in l1:
        np.testing.assert_allclose(np.asarray(l1[k]), np.asarray(l2[k]),
                                   rtol=2e-6, err_msg=k)


def test_mesh_fallback_warns():
    from gvl_tpu.parallel.mesh import make_mesh_for_batch
    with pytest.warns(UserWarning, match="not divisible"):
        mesh = make_mesh_for_batch(7)          # 8 virtual devices, batch 7
    assert mesh.shape["dp"] == 7
    import warnings
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        make_mesh_for_batch(8)                 # divisible: no warning


def test_beam_size_config_error(tmp_path):
    from gvl_tpu.config import load_config
    with pytest.raises(ValueError, match="eval_beam_size"):
        load_config(caption_decoder_type="light", eval_beam_size=4)
    cfg = load_config(caption_decoder_type="standard", eval_beam_size=4)
    assert cfg.eval_beam_size == 4


def test_early_exit_beam_config_error():
    from gvl_tpu.config import load_config
    with pytest.raises(ValueError, match="eval_decode_early_exit"):
        load_config(caption_decoder_type="standard", eval_beam_size=4,
                    eval_decode_early_exit=True)
    cfg = load_config(caption_decoder_type="standard", eval_beam_size=1,
                      eval_decode_early_exit=True)
    assert cfg.eval_decode_early_exit


def test_transformer_head_dim_config_error():
    from gvl_tpu.config import load_config
    with pytest.raises(ValueError, match="input_encoding_size"):
        load_config(caption_decoder_type="transformer",
                    input_encoding_size=256, hidden_dim=512)
    cfg = load_config(caption_decoder_type="transformer",
                      input_encoding_size=512, hidden_dim=512)
    assert cfg.caption_decoder_type == "transformer"


def test_val_loss_criteria():
    from gvl_tpu.train.loop import criteria_score
    lo = criteria_score("val_loss", {"val_loss_total": 1.5})
    hi = criteria_score("val_loss", {"val_loss_total": 9.0})
    assert lo > hi                     # lower loss ranks better
    assert criteria_score("val_loss", {}) == -1e18
