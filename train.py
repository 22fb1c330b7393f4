#!/usr/bin/env python
"""Training entry point (reference-parity CLI: same flags as the reference's
train.py/opts.py; cfg YAMLs overlay via --cfg_path)."""

from gvl_tpu.cli import parse_opts
from gvl_tpu.train.loop import train

if __name__ == "__main__":
    cfg = parse_opts()
    print(f"run id: {cfg.id}")
    train(cfg)
