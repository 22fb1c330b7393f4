#!/usr/bin/env python
"""MSDeformAttn kernel microbenchmark: us/call for the fused Pallas kernel
vs the XLA take_along_axis reference, at the flagship encoder shapes
(B=16, S=188, H=8, Dh=64, Lq=S self-attention, L=4, P=4) — the BASELINE.md
'measured us/call' row. Chained-K protocol (see bench.py)."""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    from gvl_tpu.utils.platform import apply_env_platform
    apply_env_platform()
    import jax
    import jax.numpy as jnp

    from gvl_tpu.ops.ms_deform_attn import ms_deform_attn_1d

    shapes = (100, 50, 25, 13)
    B, H, Dh, L, P = 16, 8, 64, 4, 4
    S = sum(shapes)
    Lq = S  # encoder self-attention: every position queries
    rng = np.random.RandomState(0)
    value = jnp.asarray(rng.randn(B, S, H, Dh).astype(np.float32))
    loc = jnp.asarray(rng.rand(B, Lq, H, L, P).astype(np.float32))
    attn = jax.nn.softmax(jnp.asarray(
        rng.randn(B, Lq, H, L, P).astype(np.float32)).reshape(
            B, Lq, H, L * P), -1).reshape(B, Lq, H, L, P)

    out = {}
    for impl in ("pallas", "ref"):
        def one(v, l, a):
            return jnp.sum(ms_deform_attn_1d(v, shapes, l, a, impl=impl)) \
                * 1e-6

        def chained(K):
            @jax.jit
            def run(v, l, a):
                def body(i, carry):
                    vv, acc = carry
                    s = one(vv, l, a)
                    return v + 1e-12 * s, acc + s
                _, acc = jax.lax.fori_loop(0, K, body, (v, 0.0))
                return acc
            return run

        rs, rb = chained(4), chained(24)
        float(rs(value, loc, attn)); float(rb(value, loc, attn))

        def t(f):
            best = 1e9
            for _ in range(3):
                t0 = time.perf_counter()
                float(f(value, loc, attn))
                best = min(best, time.perf_counter() - t0)
            return best

        dt = (t(rb) - t(rs)) / 20
        out[impl] = round(dt * 1e6, 1)

    print(json.dumps({
        "metric": "msda_kernel_us_per_call",
        "pallas_us": out["pallas"], "xla_gather_us": out["ref"],
        "speedup": round(out["ref"] / max(out["pallas"], 1e-9), 2),
        "shapes": dict(B=B, S=S, Lq=Lq, H=H, Dh=Dh, taps=L * P)}))


if __name__ == "__main__":
    main()
