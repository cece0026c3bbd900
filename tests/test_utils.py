"""Utility layer: step timer, logger, traceback decorator."""

import logging
import time

import pytest

from se3diff_tpu.utils import StepTimer, get_logger, print_traceback_on_exception


def test_step_timer_summary():
    timer = StepTimer()
    for _ in range(3):
        with timer.step():
            time.sleep(0.01)
    s = timer.summary(skip_first=1)
    assert s["steps"] == 2
    assert s["mean_s"] >= 0.009
    assert s["steps_per_s"] > 0


def test_step_timer_sync_handles_pytrees():
    import jax.numpy as jnp

    timer = StepTimer()
    with timer.step():
        timer.sync({"a": jnp.ones(3), "b": [jnp.zeros(2), 1.0]})
    assert len(timer.times) == 1


def test_get_logger_idempotent():
    lg1 = get_logger("se3diff_test_logger")
    lg2 = get_logger("se3diff_test_logger")
    assert lg1 is lg2
    assert len(lg1.handlers) == 1


def test_traceback_decorator_reraises(capsys):
    @print_traceback_on_exception
    def boom(x):
        local_var = x * 2  # noqa: F841 - should appear in the dump
        raise ValueError("nope")

    with pytest.raises(ValueError):
        boom(21)
    err = capsys.readouterr().err
    assert "local_var" in err and "42" in err


def test_solver_step_defaults():
    """Per-solver production step defaults: 40 for dpm_2m (quality-matched
    NFE), 30 for the reference-protocol dpm; explicit steps always win."""
    from se3diff_tpu.diffusion.denoise import resolve_steps

    assert resolve_steps(None, "dpm_2m") == 30
    assert resolve_steps(None, "dpm") == 30
    assert resolve_steps(None, "heun") == 30
    assert resolve_steps(17, "dpm_2m") == 17
    assert resolve_steps(17, "dpm") == 17


def test_collect_device_profile(tmp_path):
    """The trace-based profiler aggregates per-op rows with source
    attribution (works on the CPU backend too; device rows may be host-side
    there, so only structural properties are asserted)."""
    import jax
    import jax.numpy as jnp

    from se3diff_tpu.utils.profiling import (
        collect_device_profile,
        format_device_profile,
    )

    @jax.jit
    def f(x):
        return jnp.tanh(x @ x).sum()

    x = jnp.ones((256, 256))
    f(x).block_until_ready()  # compile outside the trace
    rows = collect_device_profile(lambda: f(x), str(tmp_path / "trace"))
    assert isinstance(rows, list)
    text = format_device_profile(rows)
    assert "total device time" in text
    for r in rows:
        assert r.total_ms >= 0 and r.count >= 1


class TestCompilationCache:
    def test_enable_populates_cache_dir(self, tmp_path, monkeypatch):
        """enable_compilation_cache writes content-addressed executables a
        second process can reuse (spot check: entries appear after a jit)."""
        import jax
        import jax.numpy as jnp
        import numpy as np

        from se3diff_tpu.utils.compile_cache import enable_compilation_cache

        monkeypatch.delenv("SE3DIFF_NO_COMPILATION_CACHE", raising=False)
        d = enable_compilation_cache(tmp_path / "xla")
        try:
            assert d == str(tmp_path / "xla")
            x = jnp.full((64, 64), 1.5)
            np.asarray(jax.jit(lambda a: jnp.tanh(a) @ a.T)(x))
            import os

            assert os.listdir(d)
        finally:
            jax.config.update("jax_compilation_cache_dir", None)

    def test_opt_out_env(self, monkeypatch):
        from se3diff_tpu.utils.compile_cache import enable_compilation_cache

        monkeypatch.setenv("SE3DIFF_NO_COMPILATION_CACHE", "1")
        assert enable_compilation_cache() is None
