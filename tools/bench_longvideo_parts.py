#!/usr/bin/env python
"""Decompose the long-video (YouMakeup: T=800, S=1500, Nq=100) eval step:
where does the time go, and which kernel variant wins at large S?

Times, with the chained-K protocol:
  - encoder-style MSDA (Lq=S) pallas vs ref     [the O(K*S*TQ) W build]
  - decoder MSDA (Lq=Nq) pallas vs ref
  - captioner sampled-values twohot vs gather   [O(R*S) one-hot rows]
  - the full trunk and the full eval step

Run on the TPU: python tools/bench_longvideo_parts.py [--t 800]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def chain_time(make_run, args, k_small=3, k_big=13, reps=3):
    def timed(f):
        best = 1e9
        for _ in range(reps):
            t0 = time.perf_counter()
            float(f(*args))
            best = min(best, time.perf_counter() - t0)
        return best

    rs, rb = make_run(k_small), make_run(k_big)
    float(rs(*args)); float(rb(*args))
    return max((timed(rb) - timed(rs)) / (k_big - k_small), 1e-9)


def main():
    from gvl_tpu.utils.platform import apply_env_platform
    apply_env_platform()
    ap = argparse.ArgumentParser()
    ap.add_argument("--t", type=int, default=800)
    ap.add_argument("--b", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from gvl_tpu.ops.ms_deform_attn import (ms_deform_attn_1d,
                                            ms_deform_attn_1d_sampled_values)
    from gvl_tpu.models.transformer import pyramid_shapes

    shapes = pyramid_shapes(args.t, 4)
    S = sum(shapes)
    B, H, Dh, L, P, Nq = args.b, 8, 64, 4, 4, 100
    rng = np.random.RandomState(0)
    value = jnp.asarray(rng.randn(B, S, H, Dh).astype(np.float32))
    out = {"shapes": dict(T=args.t, S=S, B=B, Nq=Nq)}

    def mk_chain(fn, *xs):
        def make_run(K):
            @jax.jit
            def run(*ys):
                def body(i, carry):
                    v0, acc = carry
                    s = fn(v0, *ys[1:]) * 1e-9
                    return ys[0] + 1e-12 * s, acc + s
                _, acc = jax.lax.fori_loop(0, K, body, (ys[0], 0.0))
                return acc
            return run
        return chain_time(make_run, xs)

    for name, Lq in (("enc_msda", S), ("dec_msda", Nq)):
        if Lq == S:
            # encoder-style queries: local taps (banded kernel's contract)
            refs = np.concatenate([(np.arange(T) + 0.5) / T for T in shapes])
            offs = rng.uniform(-4, 4, (B, S, H, L, P)).astype(np.float32)
            loc = jnp.asarray(
                refs[None, :, None, None, None]
                + offs / np.asarray(shapes, np.float32)[None, None, None, :,
                                                        None])
            impls = ("pallas", "banded", "ref")
        else:
            loc = jnp.asarray(rng.rand(B, Lq, H, L, P).astype(np.float32))
            impls = ("pallas", "ref")
        attn = jax.nn.softmax(jnp.asarray(
            rng.randn(B, Lq, H, L * P).astype(np.float32)), -1).reshape(
                B, Lq, H, L, P)
        for impl in impls:
            dt = mk_chain(
                lambda v, l, a, impl=impl: jnp.sum(
                    ms_deform_attn_1d(v, shapes, l, a, impl=impl)),
                value, loc, attn)
            out[f"{name}_{impl}_us"] = round(dt * 1e6, 1)

    # captioner raw-samples op at per-LSTM-step shapes (cap_nheads=1)
    v1 = jnp.asarray(rng.randn(B, S, 1, 512).astype(np.float32))
    locc = jnp.asarray(rng.rand(B, Nq, 1, L, P).astype(np.float32))
    attc = jnp.ones((B, Nq, 1, L, P), jnp.float32)
    for impl in ("twohot", "gather"):
        dt = mk_chain(
            lambda v, l, a, impl=impl: jnp.sum(
                ms_deform_attn_1d_sampled_values(v, shapes, l, a, impl=impl)),
            v1, locc, attc)
        out[f"sampled_{impl}_us"] = round(dt * 1e6, 1)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
