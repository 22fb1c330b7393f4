"""SCST RL training-path tests: reward math, policy loss, and a full RL
train step with frozen non-captioner params."""

import jax
import jax.numpy as jnp
import numpy as np

from gvl_tpu.train.rl import (array_to_str, array_to_str_para,
                              get_caption_reward, init_scorer,
                              rl_policy_loss)
from gvl_tpu.train.criterion import LossSpec, make_weight_dict
from gvl_tpu.train.state import (StepStatics, create_train_state,
                                 make_train_step)
from tests.test_train_smoke import add_text, build_world, device_batch


def test_array_to_str():
    assert array_to_str([5, 3, 0, 9]) == "5 3 0"
    assert array_to_str([1, 2]) == "1 2"
    assert array_to_str_para(np.array([[1, 2, 0, 0], [3, 0, 0, 0]])) == "1 2 3"


def test_reward_sign(rng):
    scorers = init_scorer(["Meteor"])
    gt = np.array([[0, 5, 6, 7, 0, 0]] * 2)
    perfect = np.array([[5, 6, 7, 0, 0, 0]] * 2)
    junk = np.array([[9, 9, 9, 9, 9, 9]] * 2)
    # sampled perfect vs greedy junk -> positive reward
    r = get_caption_reward(scorers, junk, gt, perfect, {"Meteor": 1.0})
    assert (r > 0).all()
    r2 = get_caption_reward(scorers, perfect, gt, junk, {"Meteor": 1.0})
    assert (r2 < 0).all()


def test_rl_policy_loss_direction():
    B, G, L = 1, 2, 4
    lps = jnp.log(jnp.full((B, G, L), 0.5))
    seq = jnp.ones((B, G, L), jnp.int32)
    valid = jnp.ones((B, G), bool)
    pos = rl_policy_loss(lps, seq, jnp.ones((B, G)), valid)
    neg = rl_policy_loss(lps, seq, -jnp.ones((B, G)), valid)
    assert float(pos) > 0 > float(neg)


def test_rl_train_step(tmp_path, rng):
    cfg, ds, batcher, bundle, model = build_world(
        tmp_path, caption_loss_type="rl", only_ft_captioner=True,
        rl_scorer_types=["Meteor"], rl_scorer_weights=[1.0],
        disable_mid_caption_heads=True)
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
    statics = StepStatics(
        spec=LossSpec.from_config(cfg), enable_contrastive=True,
        caption_loss=True, two_stage=False, train_text_encoder=False,
        disable_mid_caption_heads=True, enable_pos_emb_for_captioner=False,
        temporal_shapes=tuple(cfg.temporal_shapes()), caption_rl=True)
    state = create_train_state(cfg, model, params, bundle.params, 4, statics)
    step_fn, _, _ = make_train_step(model, bundle.apply_fn, cfg, statics)
    weights = {k: jnp.asarray(v, jnp.float32)
               for k, v in make_weight_dict(cfg).items()}
    old_params = jax.device_get(state.params)
    state, losses = jax.jit(step_fn)(state, db, weights, jax.random.PRNGKey(7))
    assert np.isfinite(float(losses["loss_caption"]))

    # frozen scheme: only caption-head params moved
    new_params = jax.device_get(state.params)
    import flax
    old_flat = flax.traverse_util.flatten_dict(old_params["params"])
    new_flat = flax.traverse_util.flatten_dict(new_params["params"])
    moved = {k[0] for k in old_flat
             if not np.allclose(old_flat[k], new_flat[k])}
    assert moved, "captioner should receive updates"
    assert all(m.startswith("caption_head") for m in moved), moved


def test_match_layer_m2o_vs_scipy(rng):
    """The m2o matcher reproduces scipy's rectangular LAP on the 4x-tiled
    cost (reference matcher.py:125-128)."""
    from scipy.optimize import linear_sum_assignment
    from gvl_tpu.train.criterion import match_layer_m2o
    B, Nq, G, rate = 3, 10, 4, 4
    rs = np.random.RandomState(0)
    cost = rs.randn(B, Nq, G).astype(np.float32)
    gt_mask = np.zeros((B, G), bool)
    sizes = [2, 4, 1]
    for b, s in enumerate(sizes):
        gt_mask[b, :s] = True
    cost = np.where(gt_mask[:, None, :], cost, 0.0)

    mq, valid = jax.jit(lambda c, m: match_layer_m2o(c, m, rate))(
        jnp.asarray(cost), jnp.asarray(gt_mask))
    mq, valid = np.asarray(mq), np.asarray(valid)

    for b, n in enumerate(sizes):
        rows, cols = linear_sum_assignment(
            np.concatenate([cost[b][:, :n]] * rate, -1))
        ref_pairs = {(int(r), int(c % n)) for r, c in zip(rows, cols)}
        got_pairs = {(int(mq[b, s]), int(s % G))
                     for s in np.nonzero(valid[b])[0]}
        # same number of rollout pairs and identical total cost
        assert len(got_pairs) == len(ref_pairs) == min(Nq, rate * n)
        ref_total = cost[b][rows, cols % n].sum()
        got_total = sum(cost[b][q, g] for q, g in got_pairs)
        assert abs(ref_total - got_total) < 1e-4
        # each GT receives up to `rate` distinct queries — and with
        # Nq >= rate*n, exactly `rate`
        if rate * n <= Nq:
            for g in range(n):
                qs = {q for q, gg in got_pairs if gg == g}
                assert len(qs) == rate


def test_ciderd_df_cache(tmp_path):
    """A cached-df corpus changes CIDEr-D scoring exactly as the cider
    package's df_mode='corpus' (reference rl_tool.py:15-31)."""
    import math
    import pickle
    from gvl_tpu.train.rl import CiderD
    # token-id sentences, as SCST feeds them (rl_tool.py:46-52)
    gts = {0: ["5 6 7"]}
    res = {0: ["5 6 7"]}
    # cache: unigram ('5',) very common (low idf), others rare
    df = {("5",): 50.0, ("6",): 1.0, ("7",): 1.0,
          ("5", "6"): 1.0, ("6", "7"): 1.0, ("5", "6", "7"): 1.0}
    blob = {"document_frequency": df, "ref_len": math.log(100.0)}
    p = tmp_path / "ngrams.p"
    with open(p, "wb") as f:
        pickle.dump(blob, f)

    cached = CiderD(df=str(p))
    assert cached.df_cache is not None
    fallback = CiderD(df=str(tmp_path / "missing"))
    assert fallback.df_cache is None
    s_cached, _ = cached.compute_score(gts, res)
    s_plain, _ = fallback.compute_score(gts, res)
    # single-doc per-call corpus: all idf vanish -> 0; cached corpus: > 0
    assert s_plain == 0.0
    assert s_cached > 0.0


def test_reward_callback_para_groups():
    """Layer-aware host reward fn (fused SCST): n_groups=2 rewards equal
    two independent per-layer callbacks on the sliced blocks — sentence
    rewards are per-slot, paragraph rewards per (video, layer) block."""
    from gvl_tpu.train.rl import rl_reward_callback
    scorers = init_scorer(["Meteor"])
    w = {"Meteor": 1.0}
    rs = np.random.RandomState(3)
    B, rate, G0, L = 2, 2, 3, 6
    Gg = rate * G0
    gen = rs.randint(0, 9, (B, 2 * Gg, L)).astype(np.int32)
    greedy = rs.randint(0, 9, (B, 2 * Gg, L)).astype(np.int32)
    gt = np.tile(rs.randint(0, 9, (B, G0, L)).astype(np.int32),
                 (1, 2 * rate, 1))
    valid = rs.rand(B, 2 * Gg) > 0.3
    fused = rl_reward_callback(scorers, w, 0.5, 0.5, m2o_rate=rate,
                               n_groups=2)
    single = rl_reward_callback(scorers, w, 0.5, 0.5, m2o_rate=rate,
                                n_groups=1)
    out = fused(gen, greedy, gt, valid)
    for g in range(2):
        sl = slice(g * Gg, (g + 1) * Gg)
        ref = single(gen[:, sl], greedy[:, sl], gt[:, sl], valid[:, sl])
        np.testing.assert_allclose(out[:, sl], ref, rtol=1e-6)


def test_caption_sample_ref_prepared_parity(tmp_path, rng):
    """The fused-SCST building block: caption_sample over the
    layer-concatenated (query, prepared-ref) event axis equals per-layer
    caption_sample calls sliced back apart (greedy, deterministic)."""
    from gvl_tpu.models.captioner import prepare_dsa_reference
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
    out = model.apply(params, db["video_feats"], db["video_mask"],
                      db["duration"], deterministic=True)
    shapes = tuple(cfg.temporal_shapes())
    Ld, take = cfg.dec_layers, 3
    per = []
    for l in range(Ld):
        seq, lps = model.apply(
            params, l, out["hs"][l][:, :take], out["layer_refs"][l][:, :take],
            out["memory"], out["mask_flat"], shapes, out["valid_ratios"],
            greedy=True, deterministic=True, method=model.caption_sample)
        per.append((np.asarray(seq), np.asarray(lps)))
    qf = jnp.concatenate([out["hs"][l][:, :take] for l in range(Ld)], 1)
    reff = jnp.concatenate(
        [prepare_dsa_reference(out["layer_refs"][l][:, :take],
                               out["valid_ratios"], shapes,
                               int(cfg.cap_num_feature_levels),
                               int(cfg.cap_dec_n_points))
         for l in range(Ld)], 1)
    seqf, lpsf = model.apply(
        params, Ld - 1, qf, reff, out["memory"], out["mask_flat"], shapes,
        out["valid_ratios"], greedy=True, deterministic=True,
        ref_prepared=True, method=model.caption_sample)
    seqf, lpsf = np.asarray(seqf), np.asarray(lpsf)
    for l in range(Ld):
        sl = slice(l * take, (l + 1) * take)
        np.testing.assert_array_equal(seqf[:, sl], per[l][0])
        np.testing.assert_allclose(lpsf[:, sl], per[l][1], atol=1e-5)


def test_rl_fused_train_step(tmp_path, rng):
    """Full RL train step over BOTH decoder layers through the fused
    rollout path (one sampled + one greedy chain, one reward callback):
    per-layer loss keys present and finite; captioner-only updates."""
    cfg, ds, batcher, bundle, model = build_world(
        tmp_path, caption_loss_type="rl", only_ft_captioner=True,
        rl_scorer_types=["Meteor"], rl_scorer_weights=[1.0])
    assert cfg.fuse_caption_layers is True or cfg.get(
        "fuse_caption_layers", True)
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
    statics = StepStatics(
        spec=LossSpec.from_config(cfg), enable_contrastive=True,
        caption_loss=True, two_stage=False, train_text_encoder=False,
        disable_mid_caption_heads=False, enable_pos_emb_for_captioner=False,
        temporal_shapes=tuple(cfg.temporal_shapes()), caption_rl=True)
    state = create_train_state(cfg, model, params, bundle.params, 4, statics)
    step_fn, _, _ = make_train_step(model, bundle.apply_fn, cfg, statics)
    weights = {k: jnp.asarray(v, jnp.float32)
               for k, v in make_weight_dict(cfg).items()}
    old_params = jax.device_get(state.params)
    state, losses = jax.jit(step_fn)(state, db, weights,
                                     jax.random.PRNGKey(7))
    assert np.isfinite(float(losses["loss_caption"]))
    assert np.isfinite(float(losses["loss_caption_0"]))

    new_params = jax.device_get(state.params)
    import flax
    old_flat = flax.traverse_util.flatten_dict(old_params["params"])
    new_flat = flax.traverse_util.flatten_dict(new_params["params"])
    moved = {k[0] for k in old_flat
             if not np.allclose(old_flat[k], new_flat[k])}
    assert moved, "captioner should receive updates"
    assert all(m.startswith("caption_head") for m in moved), moved


def test_rl_bf16_train_step(tmp_path, rng):
    """SCST with caption_bf16 (VERDICT r4 #4 'bf16 rollouts'): both rollout
    chains run at bf16 while chosen-token logprobs accumulate f32 inside the
    head — the step runs, the policy loss is finite and f32, and updates
    stay confined to the caption head (frozen scheme)."""
    cfg, ds, batcher, bundle, model = build_world(
        tmp_path, caption_loss_type="rl", only_ft_captioner=True,
        rl_scorer_types=["Meteor"], rl_scorer_weights=[1.0])
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
    statics = StepStatics(
        spec=LossSpec.from_config(cfg), enable_contrastive=True,
        caption_loss=True, two_stage=False, train_text_encoder=False,
        disable_mid_caption_heads=False, enable_pos_emb_for_captioner=False,
        temporal_shapes=tuple(cfg.temporal_shapes()), caption_rl=True,
        caption_bf16=True)
    state = create_train_state(cfg, model, params, bundle.params, 4, statics)
    step_fn, _, _ = make_train_step(model, bundle.apply_fn, cfg, statics)
    weights = {k: jnp.asarray(v, jnp.float32)
               for k, v in make_weight_dict(cfg).items()}
    old_params = jax.device_get(state.params)
    state, losses = jax.jit(step_fn)(state, db, weights,
                                     jax.random.PRNGKey(7))
    assert np.isfinite(float(losses["loss_caption"]))
    assert np.isfinite(float(losses["loss_caption_0"]))

    new_params = jax.device_get(state.params)
    import flax
    old_flat = flax.traverse_util.flatten_dict(old_params["params"])
    new_flat = flax.traverse_util.flatten_dict(new_params["params"])
    moved = {k[0] for k in old_flat
             if not np.allclose(old_flat[k], new_flat[k])}
    assert moved, "captioner should receive updates"
    assert all(m.startswith("caption_head") for m in moved), moved


def test_sample_bf16_logprobs_f32(tmp_path, rng):
    """sample() under bf16 inputs returns f32 chosen-token logprobs (the
    f32-logsumexp pin), and greedy tokens stay consistent with the f32 run
    on a tiny world (argmax robust at these scales)."""
    from gvl_tpu.utils.amp import bf16_cast_tree
    cfg, ds, batcher, bundle, model = build_world(tmp_path)
    batch = add_text(next(iter(batcher)), bundle, cfg)
    db = device_batch(batch)
    feats, mask, dur = db["video_feats"], db["video_mask"], db["duration"]
    params = model.init(jax.random.PRNGKey(0), feats, mask, dur)
    out = model.apply(params, feats, mask, dur)
    shapes = tuple(cfg.temporal_shapes())
    cap = model.init(
        jax.random.PRNGKey(1), cfg.dec_layers - 1, out["hs"][-1],
        out["layer_refs"][-1], out["memory"], out["mask_flat"], shapes,
        out["valid_ratios"], method=model.caption_sample)
    merged = {"params": {**cap["params"], **params["params"]}}
    seq32, lps32 = model.apply(
        merged, cfg.dec_layers - 1, out["hs"][-1], out["layer_refs"][-1],
        out["memory"], out["mask_flat"], shapes, out["valid_ratios"],
        method=model.caption_sample)
    p16 = bf16_cast_tree(merged)
    seq16, lps16 = model.apply(
        p16, cfg.dec_layers - 1, out["hs"][-1].astype(jnp.bfloat16),
        out["layer_refs"][-1], out["memory"].astype(jnp.bfloat16),
        out["mask_flat"], shapes, out["valid_ratios"],
        method=model.caption_sample)
    assert lps32.dtype == jnp.float32
    assert lps16.dtype == jnp.float32
    assert np.isfinite(np.asarray(lps16)).all()
    # same decode semantics: shapes agree, and where both emitted a token
    # the ids overwhelmingly agree (bf16 rounding may flip near-ties)
    assert seq16.shape == seq32.shape
    both = (np.asarray(seq32) > 0) & (np.asarray(seq16) > 0)
    if both.sum():
        agree = (np.asarray(seq32)[both] == np.asarray(seq16)[both]).mean()
        assert agree > 0.9, agree
