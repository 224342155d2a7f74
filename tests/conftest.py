"""Test configuration.

Tests run on a virtual 8-device CPU mesh so the multi-chip sharding
paths compile and execute without TPU hardware.  These env vars must be
set before jax initializes its backends.

ON-CHIP LANE: BZ3_TPU_ON_CHIP=1 leaves the real TPU visible and runs
ONLY tests/test_on_chip.py (kernel parity + one e2e round trip,
Mosaic-compiled on the chip — the regressions interpret mode provably
does not model: DMA drains, watchdog, Mosaic lowering).  Everything
else is skipped in that mode because the rest of the suite assumes the
8-device CPU mesh.  `make test-chip` wraps it.
"""

import os
import sys

ON_CHIP = os.environ.get("BZ3_TPU_ON_CHIP", "0") == "1"

if not ON_CHIP:
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

if not ON_CHIP:
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


def pytest_collection_modifyitems(config, items):
    if ON_CHIP:
        skip = pytest.mark.skip(
            reason="BZ3_TPU_ON_CHIP=1 runs only the on-chip lane"
        )
        for it in items:
            if "test_on_chip" not in it.nodeid:
                it.add_marker(skip)
    else:
        skip = pytest.mark.skip(reason="on-chip lane needs BZ3_TPU_ON_CHIP=1")
        for it in items:
            if "test_on_chip" in it.nodeid:
                it.add_marker(skip)


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
