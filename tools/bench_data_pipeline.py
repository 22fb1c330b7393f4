#!/usr/bin/env python
"""Input-pipeline throughput bench (CPU-only; no TPU needed).

At the flagship eval rate (~3300 clips/s/chip) the host must read, resize,
and assemble ~650 MB/s of features to keep the chip fed. This measures the
Batcher end-to-end (npy read -> native C++ load/resize/normalize ->
fixed-shape batch assembly + caption/GT padding) on a synthetic flagship-
shaped dataset, for both the native loader and the pure-python fallback.

Prints one JSON line:
  {"metric": "data_pipeline_clips_per_sec", "native": ..., "python": ...,
   "native_speedup": ..., "chip_demand_clips_per_sec": 3300}

Usage: python tools/bench_data_pipeline.py [--videos N] [--dim D]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    # host-side pipeline bench: CPU-only by design (no device compute)
    import jax
    jax.config.update("jax_platforms", "cpu")
    import tempfile

    from gvl_tpu.config import Config
    from gvl_tpu.data.dataset import Batcher, DenseVideoDataset
    from gvl_tpu.data.synthetic import make_synthetic_dataset

    videos = int(sys.argv[sys.argv.index("--videos") + 1]) \
        if "--videos" in sys.argv else 256
    dim = int(sys.argv[sys.argv.index("--dim") + 1]) \
        if "--dim" in sys.argv else 512

    root = tempfile.mkdtemp(prefix="gvl_dbench_")
    anno, feats, vocab, vsize = make_synthetic_dataset(
        root, num_videos=videos, feat_dim=dim, max_events=6)

    cfg = Config()
    cfg.update(dict(
        train_caption_file=anno, visual_feature_folder=feats,
        visual_feature_type="npy", dict_file=vocab, vocab_size=vsize,
        feature_dim=dim, frame_embedding_num=100, data_rescale=1,
        gt_proposal_sample_num=10, max_caption_len=30, batch_size=16,
        max_text_input_len=32))

    def run(workers):
        cfg.num_workers = workers
        ds = DenseVideoDataset(anno, feats, vocab, True, cfg)
        batcher = Batcher(ds, cfg, cfg.batch_size, shuffle=False)
        # warm one epoch (page cache + vocab), then time one
        n = 0
        for b in batcher:
            n += b["video_feats"].shape[0]
        t0 = time.perf_counter()
        for b in batcher:
            pass
        dt = time.perf_counter() - t0
        return n / dt

    from gvl_tpu import native
    out = {"metric": "data_pipeline_clips_per_sec",
           "videos": videos, "dim": dim,
           "chip_demand_clips_per_sec": 3300}
    if native.get_lib() is not None:
        for w in (1, 4, 8):
            out[f"native_w{w}"] = round(run(w), 1)
    # force the python fallback
    native._lib, native._tried = None, True
    out["python_w1"] = round(run(1), 1)
    out["python_w8"] = round(run(8), 1)
    if "native_w1" in out:
        out["native_speedup_w1"] = round(out["native_w1"] / out["python_w1"],
                                         2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
