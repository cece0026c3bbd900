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


# --------------------------------------------------------------------- #
# Fast core / slow tail split                                            #
# --------------------------------------------------------------------- #
# The full suite is ~50 min on this box; `-m "not slow"` keeps a <10-min
# core of parity anchors + unit math that MUST run before every commit
# (CLAUDE.md). The slow tail (8-device mesh scans, trainer loops, CLI
# chains, interpret-mode Pallas at model scale, distributional moment
# tests) runs at least once per session and on one CI matrix entry.
# Central nodeid-pattern list so test files stay unannotated; timings from
# the round-4 `--durations` profile.
_SLOW_PATTERNS = (
    # whole files
    "tests/test_parallel.py",          # 8-device mesh fwd/grad scans
    "tests/test_train_cli.py",         # end-to-end training CLI runs
    "tests/test_cli_chain.py",         # sample->eval CLI chains
    "tests/test_training_loop.py",     # trainer loops + orbax resume
    "tests/test_training_data.py",     # sharded multi-ensemble training
    "tests/test_finetune_cli.py",      # finetune CLI end-to-end
    "tests/test_finetune_trainer.py",  # PPFT path-gen + grads
    "tests/test_solver_quality.py",    # evaluator-metric solver equivalence
    "tests/test_bench_real_samples.py",  # benchmark CLI on ref fixtures
    # classes / individual tests
    "TestToyMixture",                  # toy SO(3) train/finetune loops
    "TestFusedGradients",              # interpret-mode kernel backward
    "test_model_fused",                # model-scale interpret kernels
    "test_rowsplit",                   # 320x320 interpret kernels
    "test_fullsize_checkpoint_layout_roundtrip",
    "test_igso3_sample_angle_distribution",
    "recovers_moments",                # sampler distributional tests
)


def pytest_collection_modifyitems(config, items):
    for item in items:
        if any(p in item.nodeid for p in _SLOW_PATTERNS):
            item.add_marker(pytest.mark.slow)
