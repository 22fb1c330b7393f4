"""Test harness configuration.

Forces CPU with 8 virtual devices so multi-chip sharding tests run anywhere
(the TPU-world substitute for multi-node test clusters — see SURVEY.md §4).

Note: this environment pre-sets JAX_PLATFORMS=axon (a remote-tunneled TPU);
merely setting the env var is not enough because the plugin re-registers, so
we also force the platform through jax.config before any backend is touched.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

assert jax.devices()[0].platform == "cpu"


@pytest.fixture
def rng():
    return np.random.RandomState(0)
