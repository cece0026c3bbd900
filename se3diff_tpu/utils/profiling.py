"""Profiling hooks: XLA trace capture + per-step timing.

The reference has no profiling support (SURVEY.md section 5.1, tqdm only);
on TPU these are the two tools that matter: ``jax.profiler`` traces for
xprof/tensorboard, and wall-clock step timing with explicit
``block_until_ready`` so the async dispatch queue doesn't hide device time.
"""

from __future__ import annotations

import contextlib
import logging
import time
from dataclasses import dataclass, field

import jax

logger = logging.getLogger(__name__)


@contextlib.contextmanager
def trace_profile(logdir: str, host_tracer_level: int = 2):
    """Capture a jax.profiler trace viewable in xprof/tensorboard."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        logger.info("Wrote profiler trace to %s", logdir)


@dataclass
class StepTimer:
    """Wall-clock step statistics with device synchronization.

    Usage::

        timer = StepTimer()
        for step in range(n):
            with timer.step():
                out = train_step(...)
                timer.sync(out)
        print(timer.summary())
    """

    times: list[float] = field(default_factory=list)
    _t0: float = 0.0

    @contextlib.contextmanager
    def step(self):
        self._t0 = time.perf_counter()
        yield
        self.times.append(time.perf_counter() - self._t0)

    def sync(self, pytree) -> None:
        """Block on all arrays in a pytree (call inside ``step``)."""
        for leaf in jax.tree.leaves(pytree):
            if hasattr(leaf, "block_until_ready"):
                leaf.block_until_ready()

    def summary(self, skip_first: int = 1) -> dict[str, float]:
        ts = self.times[skip_first:] or self.times
        if not ts:
            return {}
        return {
            "steps": len(ts),
            "mean_s": sum(ts) / len(ts),
            "min_s": min(ts),
            "max_s": max(ts),
            "steps_per_s": len(ts) / sum(ts),
        }


def print_traceback_on_exception(fn):
    """Decorator: print an expanded traceback with local variables on
    uncaught exceptions (counterpart of the reference's stackprinter
    decorator, utils.py:54-65; stdlib-only)."""
    import functools
    import traceback

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        try:
            return fn(*args, **kwargs)
        except Exception:
            import sys

            tb = sys.exc_info()[2]
            traceback.print_exc()
            for frame, _ in traceback.walk_tb(tb):
                name = frame.f_code.co_name
                loc = {
                    k: repr(v)[:120]
                    for k, v in frame.f_locals.items()
                    if not k.startswith("__")
                }
                if loc:
                    print(f"  locals in {name}: {loc}", file=sys.stderr)
            raise

    return wrapper
