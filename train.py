#!/usr/bin/env python
"""Training entry point (reference-parity CLI: same flags as the reference's
train.py/opts.py; cfg YAMLs overlay via --cfg_path)."""

from gvl_tpu.cli import parse_opts


def main():
    cfg = parse_opts()
    from gvl_tpu.utils.platform import (apply_env_platform,
                                        enable_compilation_cache)
    apply_env_platform("cpu" if cfg.device == "cpu" else None)
    enable_compilation_cache()
    print(f"run id: {cfg.id}")
    from gvl_tpu.train.loop import train
    train(cfg)


if __name__ == "__main__":
    main()
