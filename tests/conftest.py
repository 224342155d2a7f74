"""Test configuration.

Tests run on a virtual 8-device CPU mesh so the multi-chip sharding
paths compile and execute without TPU hardware.  These env vars must be
set before jax initializes its backends.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Some accelerator plugins force jax_platforms at import, overriding
# the env var — pin the config explicitly so the suite always runs on
# an 8-device virtual CPU mesh.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

# Persistent compilation cache: the interpreted Pallas CM kernels are
# multi-minute XLA:CPU compiles; caching makes suite re-runs fast.
try:
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(__file__), "..", ".pytest_cache", "jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
except Exception:
    pass

sys.path.insert(0, os.path.dirname(__file__))

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def text_data():
    from fixtures import sample_text

    return sample_text()


@pytest.fixture(scope="session")
def mixed_data():
    from fixtures import sample_mixed

    return sample_mixed()


DATA_DIR = os.path.join(os.path.dirname(__file__), "data")


@pytest.fixture(scope="session")
def golden_text_bz3():
    with open(os.path.join(DATA_DIR, "sample_text.bin.bz3"), "rb") as f:
        return f.read()


@pytest.fixture(scope="session")
def golden_mixed_bz3():
    with open(os.path.join(DATA_DIR, "sample_mixed.bin.bz3"), "rb") as f:
        return f.read()
