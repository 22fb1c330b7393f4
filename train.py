#!/usr/bin/env python
"""Training entry point (reference-parity CLI: same flags as the reference's
train.py/opts.py; cfg YAMLs overlay via --cfg_path)."""

from gvl_tpu.cli import parse_opts


def main():
    import os

    cfg = parse_opts()
    plat = os.environ.get("JAX_PLATFORMS")   # TPU plugin configs silently
    if cfg.device == "cpu":                  # override the env var; re-apply
        plat = "cpu"                         # it so subprocess callers work
    if plat:
        import jax
        jax.config.update("jax_platforms", plat)
    print(f"run id: {cfg.id}")
    from gvl_tpu.train.loop import train
    train(cfg)


if __name__ == "__main__":
    main()
