"""Platform selection helper.

TPU plugin packages can register a platform priority list (e.g. "axon,cpu")
that silently OVERRIDES the JAX_PLATFORMS environment variable — a
subprocess launched with JAX_PLATFORMS=cpu still tries the TPU first, and a
half-up TPU tunnel then hangs backend init indefinitely. Every CLI /
standalone tool calls apply_env_platform() before touching jax so the env
contract works as documented. (In-process test code uses
jax.config.update directly via tests/conftest.py.)
"""

from __future__ import annotations

import os


# The tunneled-TPU plugin registers its platform as 'axon' or 'tpu'
# depending on the plugin build the sandbox booted with; the driver's env
# may name the other one. Requesting the missing alias fails backend init
# instantly ("not in the list of known backends" — raised before any tunnel
# contact, so retrying is hang-safe).
_TPU_ALIASES = {"axon": "tpu", "tpu": "axon"}


def apply_env_platform(override: str | None = None) -> str | None:
    """Re-apply JAX_PLATFORMS (or an explicit CLI `override`, which wins)
    via jax.config so it beats any plugin-registered priority list. Must run
    before the first jax.devices() / backend touch; orbax initializes the
    backend at import, so call this before importing
    gvl_tpu.train.checkpoint. Returns the platform applied (None = jax's
    own default resolution). TPU-ish names resolve across the axon<->tpu
    plugin rename (see _TPU_ALIASES)."""
    plat = override or os.environ.get("JAX_PLATFORMS")
    if not plat:
        return None
    import jax
    jax.config.update("jax_platforms", plat)
    parts = [p.strip() for p in plat.split(",") if p.strip()]
    swapped = [_TPU_ALIASES.get(p, p) for p in parts]
    if swapped != parts:
        # eager-resolve only when a TPU-ish platform was requested (the
        # caller is about to init that backend anyway); cpu-only requests
        # stay lazy
        try:
            jax.default_backend()
        except RuntimeError as e:
            if "not in the list of known backends" in str(e):
                plat = ",".join(swapped)
                jax.config.update("jax_platforms", plat)
                os.environ["JAX_PLATFORMS"] = plat
    return plat


def enable_compilation_cache(path: str | None = None) -> str | None:
    """Persistent XLA compilation cache. TPU compiles through a tunneled
    chip run minutes per trace; caching makes repeat runs of the same
    shapes near-instant. Set GVL_XLA_CACHE_DIR=0 to disable; default is
    ~/.cache/gvl_tpu_xla."""
    path = path or os.environ.get(
        "GVL_XLA_CACHE_DIR", os.path.expanduser("~/.cache/gvl_tpu_xla"))
    if not path or path == "0":
        return None
    try:
        os.makedirs(path, exist_ok=True)
        import jax
        jax.config.update("jax_compilation_cache_dir", path)
        # only persist traces worth keeping (skip tiny test jits)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
        return path
    except Exception:                                    # pragma: no cover
        return None
