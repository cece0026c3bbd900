"""Benchmark evaluation suite (multiconf, local unfolding, folding free
energies, MD emulation) — counterpart of the bioemu-benchmarks package."""

from se3diff_tpu.benchmarks.core import ALL_BENCHMARKS, MULTICONF_BENCHMARKS, Benchmark
from se3diff_tpu.benchmarks.samples import (
    IndexedSamples,
    SequenceSample,
    filter_unphysical_samples,
    find_samples_in_dir,
)

__all__ = [
    "ALL_BENCHMARKS",
    "MULTICONF_BENCHMARKS",
    "Benchmark",
    "IndexedSamples",
    "SequenceSample",
    "filter_unphysical_samples",
    "find_samples_in_dir",
]
