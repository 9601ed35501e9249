"""Test configuration: force the CPU backend with 8 virtual devices so
multi-chip sharding logic runs (and is validated) without TPU hardware —
the strategy SURVEY.md §4 prescribes for the from-scratch test suite."""

import os

# Force-override: the surrounding environment registers the axon TPU platform
# via sitecustomize and pins jax_platforms to it; tests must never touch the
# TPU tunnel (each remote compile is 20-40 s). Both the env var and the jax
# config (which the axon register() call overwrites) are forced to cpu.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE_DATA = "/root/reference/data"


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def sf1_wav():
    """First bundled SF1 utterance, if the reference checkout is present."""
    path = os.path.join(REFERENCE_DATA, "SF1", "100001.wav")
    if not os.path.isfile(path):
        pytest.skip("reference data not available")
    from exemplars_vc_tpu.io import read_wav

    return read_wav(path)
