"""Test harness configuration.

Tests run on the CPU backend with 8 virtual devices so that multi-chip
sharding (mesh/pjit/shard_map code paths) can be exercised without TPU
hardware, mirroring SURVEY.md section 4.3. Environment variables must be set
before JAX is imported anywhere in the test process.
"""

import os

# Force-set (not setdefault): the environment pins JAX_PLATFORMS to the TPU
# plugin; tests must run on the virtual-device CPU backend regardless.
os.environ["JAX_PLATFORMS"] = "cpu"
# CLI mains enable the persistent compilation cache; keep the suite from
# writing XLA executables into $HOME (the dedicated unit test opts back in
# with a tmp dir).
os.environ.setdefault("SE3DIFF_NO_COMPILATION_CACHE", "1")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

# A pytest plugin may import jax before this conftest runs, in which case the
# env var above was captured too late; force the platform through the config
# as well (backends initialize lazily, so this still wins).
jax.config.update("jax_platforms", "cpu")

# Math-oracle tests compare against scipy in double precision; library code
# requests float32 explicitly on its hot paths, so enabling x64 here only
# widens the tests' own arrays.
jax.config.update("jax_enable_x64", True)


@pytest.fixture
def rng() -> np.random.Generator:
    return np.random.default_rng(0)
