"""Test harness configuration.

Forces CPU with 8 virtual devices so multi-chip sharding tests run anywhere
(the TPU-world substitute for multi-node test clusters — see SURVEY.md §4).

Note: this environment pre-sets JAX_PLATFORMS=axon (a remote-tunneled TPU);
merely setting the env var is not enough because the plugin re-registers, so
we also force the platform through jax.config before any backend is touched.
"""

import os

# No egress in this sandbox: without these, every transformers
# from_pretrained attempt (gpt2 tokenizer in the ClipCap worlds) burns ~54 s
# in DNS retries before falling back to the offline spec. Offline mode makes
# the fallback instant; tests that DO have a local HF cache still load it.
os.environ.setdefault("HF_HUB_OFFLINE", "1")
os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent XLA compilation cache for the test suite: the full suite's wall
# time is dominated by CPU compiles of flagship-shaped models, and XLA:CPU
# executables serialize fine (verified cross-process). Keyed on HLO, so
# code changes invalidate exactly the affected traces. GVL_TEST_XLA_CACHE=0
# disables (e.g. to measure a cold run).
_cache = os.environ.get("GVL_TEST_XLA_CACHE",
                        os.path.expanduser("~/.cache/gvl_tpu_xla_tests"))
if _cache and _cache != "0":
    os.makedirs(_cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

assert jax.devices()[0].platform == "cpu"


@pytest.fixture
def rng():
    return np.random.RandomState(0)


# ---- fast "core" subset -----------------------------------------------------
# `pytest -m core` runs a <2-minute high-signal slice (kernel parity, matcher
# vs scipy, losses, metric fixtures, config suite, plots) so the full
# ~20-minute CPU suite isn't the only gate (VERDICT round-1 item 9).
CORE_MODULES = {
    "test_ms_deform_attn", "test_lap", "test_criterion", "test_metrics",
    "test_meteor_ptb", "test_configs", "test_qualitative_plots",
    "test_metric_harness_parity", "test_e2e_cross_run",
}


def pytest_configure(config):
    config.addinivalue_line("markers",
                            "core: fast high-signal subset (< 2 min)")


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.module.__name__.split(".")[-1] in CORE_MODULES:
            item.add_marker(pytest.mark.core)
