#!/usr/bin/env python
"""Measure the PyTorch reference's GPU eval throughput (clips/sec) — the
denominator of bench.py's `vs_baseline` and the BASELINE.json >=8x target.

Run on a networked GPU host with the reference repo set up (its README
install steps + compiled pdvc/ops CUDA extension + features on disk). This
sandbox has no GPU/network, so the script validates its argument plumbing
with --self-test and otherwise documents the measurement protocol in code:
time the reference's eval loop (model forward + captioning + postprocess,
excluding the metric harness) over the val split, median of `--reps` runs.

Usage:
  python tools/bench_reference_gpu.py --ref /path/to/GVL \
      --run anet_tsp_msvg_dvc --out goldens/reference_gpu_bench.json
"""

import argparse
import json
import os
import sys
import time


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--ref", required=True, help="reference GVL checkout")
    p.add_argument("--run", required=True,
                   help="run folder under <ref>/save with model-best-*.pth")
    p.add_argument("--out", required=True, help="output json path")
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--self-test", action="store_true",
                   help="validate plumbing without torch/GPU")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    if args.self_test:
        out = dict(metric="reference_gpu_clips_per_sec", value=None,
                   note="self-test: no GPU in this environment",
                   protocol="median over reps of (n_clips / eval-loop "
                            "wall time), metric harness excluded")
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)
        print(json.dumps(out))
        return 0

    sys.path.insert(0, args.ref)
    os.chdir(args.ref)
    import torch  # noqa: deferred — GPU host only
    from eval import eval_parser  # reference eval.py
    import eval as ref_eval

    # build the reference's eval world exactly like its eval.py main(),
    # but time only the prediction loop (eval_utils.evaluate up to, not
    # including, eval_metrics) — mirroring bench.py's scope on TPU.
    argv_ref = ["--eval_folder", args.run,
                "--eval_batch_size", str(args.batch_size),
                "--eval_save_dir", "save"]
    opt = eval_parser().parse_args(argv_ref)

    times, n_clips = [], 0
    for _ in range(args.reps):
        torch.cuda.synchronize()
        t0 = time.perf_counter()
        # ref_eval.main runs the full eval; for the throughput number we
        # monkeypatch the metric harness to a no-op so only the model loop
        # is timed.
        import eval_utils
        orig = eval_utils.eval_metrics
        eval_utils.eval_metrics = lambda *a, **k: {}
        try:
            ref_eval.main(opt)
        finally:
            eval_utils.eval_metrics = orig
        torch.cuda.synchronize()
        times.append(time.perf_counter() - t0)

    # clip count: videos in the eval caption file
    with open(opt.eval_caption_file) as f:
        n_clips = len(json.load(f))
    med = sorted(times)[len(times) // 2]
    out = dict(metric="reference_gpu_clips_per_sec",
               value=round(n_clips / med, 2), n_clips=n_clips,
               median_wall_s=round(med, 2), batch_size=args.batch_size,
               gpu=torch.cuda.get_device_name(0))
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
