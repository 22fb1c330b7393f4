#!/usr/bin/env python
"""Decompose the caption teacher-forcing chain — now ~80% of the train step
(tools/bench_train_parts at round-4 HEAD: 42 of 53 ms) — on the real chip.

Variants (standalone LSTM-DSA head at the exact fused-train shapes:
B=16, Ne=dec_layers*G=60 events, Lc=30 tokens, vocab 8517, 4 levels):

  fwd          teacher-forcing forward only
  fwdbwd       + grad of the masked NLL wrt head params (the train cost)
  fwdbwd_nodsa DSA ablated to zeros (isolates the LSTM/embed/logit chain)
  fwdbwd_bf16  params+inputs bf16 (log-softmax pinned f32, as in training)

Prints one JSON line. Each variant is its own chained-K compile (~2-4 min
through the tunnel) — run with a generous timeout.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VARIANTS = ("fwd", "fwdbwd", "fwdbwd_nodsa", "fwdbwd_bf16")


def main():
    tiny = "--tiny" in sys.argv
    from gvl_tpu.utils.platform import (apply_env_platform,
                                        enable_compilation_cache)
    apply_env_platform()
    enable_compilation_cache()
    import jax
    if tiny:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    from bench import _chain_time_flops
    from __graft_entry__ import _flagship_cfg
    from gvl_tpu.models.captioner import (LSTMDSACaptioner, caption_nll,
                                          prepare_dsa_reference)

    cfg = _flagship_cfg(tiny=tiny)
    B, G, Lc = (2 if tiny else 16), cfg.effective_max_gt_events, \
        cfg.max_caption_len
    Ne = cfg.dec_layers * G                      # fused-layer event axis
    C = cfg.hidden_dim
    shapes = tuple(cfg.temporal_shapes())[:cfg.cap_num_feature_levels]
    S = sum(shapes)
    rng = np.random.RandomState(0)

    head = LSTMDSACaptioner(
        cfg.vocab_size, cfg.input_encoding_size, cfg.rnn_size, C,
        cfg.cap_num_feature_levels, cfg.cap_nheads, cfg.cap_dec_n_points,
        cfg.att_hid_size, Lc, cfg.drop_prob)

    query = jnp.asarray(rng.randn(B, Ne, C).astype(np.float32))
    raw_ref = jnp.asarray(rng.uniform(0.2, 0.8, (B, Ne, 2)).astype(np.float32))
    memory = jnp.asarray(rng.randn(B, S, C).astype(np.float32))
    mmask = jnp.ones((B, S), bool)
    vr = jnp.ones((B, cfg.cap_num_feature_levels), jnp.float32)
    ref = prepare_dsa_reference(raw_ref, vr, shapes,
                                cfg.cap_num_feature_levels,
                                cfg.cap_dec_n_points)
    seq = jnp.asarray(rng.randint(1, cfg.vocab_size, (B, Ne, Lc))
                      .astype(np.int32)).at[:, :, 0].set(0)
    cmask = jnp.ones((B, Ne, Lc), bool)
    params = head.init(jax.random.PRNGKey(0), query, ref, memory, mmask,
                       shapes, vr, seq, ref_prepared=True)

    def nll_of(p, q, m):
        lp = head.apply(p, q, ref, m, mmask, shapes, vr, seq,
                        deterministic=True, ref_prepared=True)
        return caption_nll(lp.reshape(B * Ne, Lc - 1, -1),
                           seq[:, :, 1:].reshape(B * Ne, -1),
                           cmask[:, :, 1:].reshape(B * Ne, -1)).sum()

    def chain(fn):
        def make_run(K):
            @jax.jit
            def run(p, q, m):
                def body(i, carry):
                    qq, acc = carry
                    v = fn(p, qq, m)
                    return q + (1e-9 * v).astype(q.dtype), acc + v
                _, acc = jax.lax.fori_loop(0, K, body, (q, 0.0))
                return acc
            return run
        return make_run

    grad_nll = jax.grad(nll_of)

    def fwdbwd(p, q, m):
        g = grad_nll(p, q, m)
        return sum(jnp.sum(x.astype(jnp.float32) ** 2)
                   for x in jax.tree_util.tree_leaves(g)) * 1e-12

    names = [a for a in sys.argv[1:] if not a.startswith("-")] \
        or list(VARIANTS)
    out = {}
    from gvl_tpu.models import captioner as cap_mod
    for name in names:
        orig = cap_mod.DeformableSoftAttention.__call__
        if name == "fwdbwd_nodsa":
            def zero_dsa(self, joint_query, h, ref_, value, shapes_):
                return jnp.zeros(h.shape[:-1] + (self.d_model,), h.dtype)
            cap_mod.DeformableSoftAttention.__call__ = zero_dsa
        try:
            if name == "fwd":
                dt, fl = _chain_time_flops(chain(nll_of), (params, query,
                                                           memory),
                                           k_small=2, k_big=6, reps=3)
            elif name == "fwdbwd_bf16":
                from gvl_tpu.utils.amp import bf16_cast_tree
                p16 = bf16_cast_tree(params)
                dt, fl = _chain_time_flops(
                    chain(fwdbwd), (p16, query.astype(jnp.bfloat16),
                                    memory.astype(jnp.bfloat16)),
                    k_small=2, k_big=6, reps=3)
            else:
                dt, fl = _chain_time_flops(chain(fwdbwd), (params, query,
                                                           memory),
                                           k_small=2, k_big=6, reps=3)
        finally:
            cap_mod.DeformableSoftAttention.__call__ = orig
        out[name + "_ms"] = round(dt * 1e3, 3)
        if fl:
            out[name + "_tflops"] = round(fl / 1e12, 4)
        print(f"# {name}: {dt * 1e3:.2f} ms", file=sys.stderr, flush=True)
    print(json.dumps({"metric": "caption_tf_parts_b16", "B": B, "Ne": Ne,
                      "Lc": Lc, **out}))


if __name__ == "__main__":
    main()
