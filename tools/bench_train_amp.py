#!/usr/bin/env python
"""A/B the train step with/without train_use_amp (bf16 text encoder) at
flagship shapes — the measurement VERDICT r2 item 8 asks for.

Run on the TPU: python tools/bench_train_amp.py
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from gvl_tpu.utils.platform import apply_env_platform
    apply_env_platform()
    from __graft_entry__ import _flagship_cfg

    out = {}
    for amp in (False, True):
        cfg = _flagship_cfg(tiny=False)
        cfg.msda_impl = "pallas"
        cfg.train_use_amp = amp
        t, _ = _bench_train_step_with_amp(cfg, amp)
        out["amp_ms" if amp else "f32_ms"] = round(t * 1e3, 3)
    out["speedup"] = round(out["f32_ms"] / out["amp_ms"], 3)
    print(json.dumps({"metric": "train_step_ms_text_amp_ab", **out}))


def _bench_train_step_with_amp(cfg, amp: bool):
    from bench import _chain_time_flops, build_train_bench, train_chain_maker

    cfg.batch_size = 16
    state, db, weights, step_fn = build_train_bench(cfg, text_bf16=amp)
    return _chain_time_flops(train_chain_maker(step_fn),
                             (state, db, weights), k_small=2, k_big=6,
                             reps=2)


if __name__ == "__main__":
    main()
