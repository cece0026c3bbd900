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


# --------------------------------------------------------------------- #
# Device-op profiles with source attribution                             #
# --------------------------------------------------------------------- #


@dataclass
class OpRow:
    """One aggregated device-op row from a captured trace."""

    source: str          # "path/to/file.py:123" of the op's jaxpr origin
    category: str        # HLO category ("loop fusion", "convolution fusion", ...)
    total_ms: float      # summed device time across occurrences
    count: int
    bytes_accessed: int

    @property
    def gb_per_s(self) -> float:
        if self.total_ms <= 0:
            return 0.0
        return (self.bytes_accessed / 1e9) / (self.total_ms / 1e3)


def collect_device_profile(run, tmpdir: str) -> list[OpRow]:
    """Run ``run()`` under ``jax.profiler.trace`` and aggregate device ops
    by (source line, HLO category), sorted by total device time.

    This is the tool that matters on this stack: per-op ``source``
    attribution, ``bytes_accessed``, and the HLO layout strings in the
    trace are the only trustworthy performance signals (wall-clock
    micro-benchmarks are distorted by loop-invariant hoisting and transfer
    floors — see CLAUDE.md). Works over remote-device tunnels.
    """
    import glob
    import gzip
    import json
    from collections import defaultdict

    with trace_profile(tmpdir):
        out = run()
        jax.block_until_ready(out)

    files = sorted(glob.glob(f"{tmpdir}/plugins/profile/*/*.trace.json.gz"))
    if not files:
        return []
    data = json.load(gzip.open(files[-1]))
    pids = {
        e["pid"]: e["args"].get("name", "")
        for e in data.get("traceEvents", [])
        if e.get("ph") == "M" and e.get("name") == "process_name"
    }
    agg: dict = defaultdict(lambda: [0.0, 0, 0])
    for e in data.get("traceEvents", []):
        if e.get("ph") != "X":
            continue
        if not pids.get(e.get("pid"), "").startswith("/device"):
            continue
        name = e.get("name", "")
        if name.startswith("jit_"):  # parent program span, not an op
            continue
        args = e.get("args", {})
        key = (args.get("source", "?"), args.get("hlo_category", "?"))
        row = agg[key]
        row[0] += e.get("dur", 0) / 1e3
        row[1] += 1
        row[2] += int(args.get("bytes_accessed", 0))
    rows = [
        OpRow(source=s, category=c, total_ms=v[0], count=v[1], bytes_accessed=v[2])
        for (s, c), v in agg.items()
    ]
    rows.sort(key=lambda r: -r.total_ms)
    return rows


def format_device_profile(rows: list[OpRow], top: int = 20) -> str:
    lines = [f"{'ms':>9} {'count':>6} {'GB/s':>7}  source | category"]
    for r in rows[:top]:
        lines.append(
            f"{r.total_ms:9.3f} {r.count:6d} {r.gb_per_s:7.0f}  "
            f"{r.source} | {r.category}"
        )
    total = sum(r.total_ms for r in rows)
    lines.append(f"(total device time: {total:.2f} ms)")
    return "\n".join(lines)
