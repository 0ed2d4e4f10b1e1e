"""Test harness: force JAX onto 8 virtual CPU devices.

Must run before any jax import — pytest loads conftest first, so setting
the env here covers every test module.  Multi-chip sharding tests use
the 8-device mesh; real-TPU behavior is exercised by bench.py and the
driver's dryrun, not the unit suite.

TPU tier: `ZS3_TEST_PLATFORM=tpu pytest tests/test_zero_shot_acceptance.py`
leaves JAX on the real chip so the platform-tiered acceptance bars
(recorded TPU transfer curves, stricter than the CPU-variance bars) are
asserted on hardware.  Intended for the acceptance/e2e tests; tests that
require the 8-device mesh skip (mesh8) or fail on a single chip.
"""

import os
import sys

_TEST_PLATFORM = os.environ.get("ZS3_TEST_PLATFORM", "cpu")
if _TEST_PLATFORM == "cpu":
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

if _TEST_PLATFORM == "cpu":
    # The axon sitecustomize pins JAX_PLATFORMS=axon from within python
    # startup, so the env var alone is not enough — override via
    # jax.config as well.
    jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the suite compiles the same small models
# across many tests/processes; caching cuts wall time dramatically.
_cache_dir = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".jax_compile_cache",
)
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

if _TEST_PLATFORM == "cpu":
    assert jax.devices()[0].platform == "cpu", "tests must run on CPU"
    assert len(jax.devices()) == 8, "expected 8 virtual CPU devices"

# Cyclic-GC tuning: one pytest process holds every compiled executable,
# tracer cache and fixture object for 200+ tests, so CPython's default
# gen-2 collections end up scanning hundreds of thousands of live
# objects more and more often as the suite proceeds — measured on the
# 1-core driver box as late tests running 3-4x their isolated time
# (test_gmmn_trainer_end_to_end: 63 s in-suite vs 17 s alone).  Raising
# the gen-0 threshold and gen-2 multiplier keeps collections rare while
# still bounding leak growth; RAM is plentiful (the suite peaks <4 GB).
import gc  # noqa: E402

gc.set_threshold(50_000, 50, 100)


@pytest.fixture(scope="session")
def mesh8():
    from zs3_tpu.core.mesh import make_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices (run on the CPU tier)")
    return make_mesh((("data", 8),))


@pytest.fixture()
def rng():
    return np.random.default_rng(0)
