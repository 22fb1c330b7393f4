#!/usr/bin/env python
"""Training entry point (reference-parity CLI: same flags as the reference's
train.py/opts.py; cfg YAMLs overlay via --cfg_path)."""

from gvl_tpu.cli import parse_opts


def main():
    cfg = parse_opts()
    if cfg.device == "cpu":
        import jax
        jax.config.update("jax_platforms", "cpu")
    print(f"run id: {cfg.id}")
    from gvl_tpu.train.loop import train
    train(cfg)


if __name__ == "__main__":
    main()
