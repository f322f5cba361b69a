"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip behavior is tested with the standard JAX host-platform trick
(SURVEY.md §4); Pallas kernels run in interpreter mode off-TPU
(tcnn_tpu.ops.pallas_utils.interpret_mode). Set TCNN_TPU_TEST_BACKEND=tpu
to run the suite on real hardware instead.
"""

import os

if os.environ.get("TCNN_TPU_TEST_BACKEND", "cpu") == "cpu":
    # Force CPU. Env vars are NOT enough here: this machine's
    # sitecustomize.py registers the tunneled-TPU ("axon") backend and pins
    # it with jax.config.update("jax_platforms", "axon,cpu"), which
    # overrides JAX_PLATFORMS. A later config.update wins, so do that.
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(1337)


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: long-running test")
