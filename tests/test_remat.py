"""remat_trunk: nn.remat over encoder/decoder layers — exact (same forward
and gradients) while cutting backward activation memory at long-video
shapes (compiled memory_analysis)."""

import jax
import jax.numpy as jnp
import numpy as np

from gvl_tpu.config import Config
from gvl_tpu.models import build_model


def _world(T, remat):
    cfg = Config()
    cfg.update(dict(
        hidden_dim=64, nheads=4, enc_layers=2, dec_layers=2,
        transformer_ff_dim=128, num_feature_levels=3, num_queries=8,
        feature_dim=16, frame_embedding_num=T, vocab_size=50,
        input_encoding_size=32, rnn_size=32, att_hid_size=32,
        max_caption_len=5, cap_nheads=1, cap_num_feature_levels=3,
        with_box_refine=1, enable_contrastive=False,
        caption_decoder_type="none", msda_impl="ref",
        remat_trunk=remat))
    model = build_model(cfg, text_hidden_dim=32)
    rng = np.random.RandomState(0)
    feats = jnp.asarray(rng.randn(2, T, 16).astype(np.float32))
    mask = jnp.ones((2, T), bool)
    dur = jnp.asarray([30.0, 60.0])
    return model, feats, mask, dur


def _loss_fn(model, feats, mask, dur):
    def loss(params):
        out = model.apply(params, feats, mask, dur, deterministic=True)
        return (jnp.sum(out["pred_logits"] ** 2)
                + jnp.sum(out["pred_boxes"] ** 2))
    return loss


def test_remat_exact():
    model_a, feats, mask, dur = _world(32, remat=False)
    model_b, *_ = _world(32, remat=True)
    params = model_a.init(jax.random.PRNGKey(0), feats, mask, dur)
    # identical param trees: remat only changes the autodiff schedule
    pb = model_b.init(jax.random.PRNGKey(0), feats, mask, dur)
    chex_equal = jax.tree_util.tree_all(jax.tree_util.tree_map(
        lambda x, y: jnp.array_equal(x, y), params, pb))
    assert chex_equal

    la, ga = jax.value_and_grad(_loss_fn(model_a, feats, mask, dur))(params)
    lb, gb = jax.value_and_grad(_loss_fn(model_b, feats, mask, dur))(params)
    np.testing.assert_allclose(float(la), float(lb), rtol=1e-6)
    flat_a = jax.tree_util.tree_leaves(ga)
    flat_b = jax.tree_util.tree_leaves(gb)
    for xa, xb in zip(flat_a, flat_b):
        # remat is mathematically exact; recompute changes XLA fusion order,
        # so allow float-reassociation noise
        np.testing.assert_allclose(np.asarray(xa), np.asarray(xb),
                                   rtol=1e-4, atol=1e-5)


def test_remat_composes_with_sp():
    """remat regions contain the shard_map'd sp-MSDA (ppermute halos) —
    jax.checkpoint must replay collectives; assert the grad compiles and
    runs on a dp x sp mesh."""
    from gvl_tpu.parallel import make_mesh, replicate_tree, batch_sharding
    from gvl_tpu.parallel.sp import sp_context

    model, feats, mask, dur = _world(64, remat=True)
    B = 8
    feats = jnp.tile(feats[:1], (B, 1, 1))
    mask = jnp.tile(mask[:1], (B, 1))
    dur = jnp.tile(dur[:1], (B,))
    params = model.init(jax.random.PRNGKey(0), feats[:1], mask[:1], dur[:1])
    mesh = make_mesh(8, "dp,sp")
    p = replicate_tree(params, mesh)
    f = jax.device_put(feats, batch_sharding(mesh, 3, seq_axis=1))
    m = jax.device_put(mask, batch_sharding(mesh, 2, seq_axis=1))
    d = jax.device_put(dur, batch_sharding(mesh, 1))

    def loss(params, f, m, d):
        out = model.apply(params, f, m, d, deterministic=True)
        return ((out["memory"] ** 2).mean()
                + (out["pred_logits"] ** 2).mean())

    with sp_context(mesh, halo_frac=0.25):
        g = jax.jit(jax.grad(loss))(p, f, m, d)
    assert np.isfinite(
        float(jnp.linalg.norm(jax.tree_util.tree_leaves(g)[0])))


def test_remat_engages_every_layer():
    """The remat primitive must wrap each enc/dec layer in the grad jaxpr.

    Note: CPU XLA's compiled memory_analysis does NOT reflect remat savings
    (verified with a textbook 8-block MLP: identical temp bytes with and
    without remat — the CPU scheduler already recomputes/fuses on its own),
    so the HBM claim is measured on the TPU backend
    (tools/sp_memory_report.py --remat_ab); here we assert engagement."""
    model, feats, mask, dur = _world(64, remat=True)
    params = model.init(jax.random.PRNGKey(0), feats, mask, dur)
    jxp = str(jax.make_jaxpr(jax.grad(_loss_fn(model, feats, mask, dur))
                             )(params))
    assert jxp.count("remat") >= 4          # 2 enc + 2 dec layers

    model_off, *_ = _world(64, remat=False)
    jxp_off = str(jax.make_jaxpr(
        jax.grad(_loss_fn(model_off, feats, mask, dur)))(params))
    assert "remat" not in jxp_off
