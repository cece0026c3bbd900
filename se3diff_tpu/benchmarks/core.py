"""Benchmark registry + vendored asset paths.

Counterpart of `bioemu-benchmarks/bioemu_benchmarks/benchmarks.py` and
`paths.py`. The benchmark asset data (reference PDBs, testcases.csv,
projection matrices) is vendored under ``assets/benchmarks`` with the
reference's directory layout, so sample sets prepared for either stack
evaluate identically.
"""

from __future__ import annotations

import os
from enum import Enum
from functools import cached_property

ASSET_DIR = os.environ.get(
    "SE3DIFF_BENCHMARK_ASSETS",
    os.path.normpath(
        os.path.join(os.path.dirname(__file__), "..", "..", "assets", "benchmarks")
    ),
)
MULTICONF_ASSET_DIR = os.path.join(ASSET_DIR, "multiconf_benchmark_0.1")
FOLDING_FREE_ENERGY_ASSET_DIR = os.path.join(
    ASSET_DIR, "folding_free_energies_benchmark_0.1"
)
MD_EMULATION_ASSET_DIR = os.path.join(ASSET_DIR, "md_emulation_benchmark_0.1")


class Benchmark(str, Enum):
    """The seven benchmarks (benchmarks.py:17-80)."""

    MULTICONF_OOD60 = "multiconf_ood60"
    MULTICONF_OODVAL = "multiconf_oodval"
    MULTICONF_DOMAINMOTION = "multiconf_domainmotion"
    MULTICONF_CRYPTICPOCKET = "multiconf_crypticpocket"
    SINGLECONF_LOCALUNFOLDING = "singleconf_localunfolding"
    FOLDING_FREE_ENERGIES = "folding_free_energies"
    MD_EMULATION = "md_emulation"

    @cached_property
    def asset_dir(self) -> str:
        if self in MULTICONF_BENCHMARKS or self == Benchmark.SINGLECONF_LOCALUNFOLDING:
            return os.path.join(MULTICONF_ASSET_DIR, self.value.split("_")[1])
        if self == Benchmark.FOLDING_FREE_ENERGIES:
            return os.path.join(FOLDING_FREE_ENERGY_ASSET_DIR, "folding_free_energies")
        if self == Benchmark.MD_EMULATION:
            return os.path.join(MD_EMULATION_ASSET_DIR, "md_emulation")
        raise ValueError(f"benchmark not recognised: {self}")

    @cached_property
    def metadata(self):
        import pandas as pd

        return pd.read_csv(os.path.join(self.asset_dir, "testcases.csv"))

    @cached_property
    def default_samplesize(self) -> list[int]:
        """Recommended samples per test case (benchmarks.py:49-72)."""
        import pandas as pd

        if self in MULTICONF_BENCHMARKS or self == Benchmark.SINGLECONF_LOCALUNFOLDING:
            return [4000] * len(self.metadata)
        if self == Benchmark.MD_EMULATION:
            return [10000] * len(self.metadata)
        info = pd.read_csv(os.path.join(self.asset_dir, "system_info.csv"))
        info = info.set_index("sequence")
        return [
            int(info.loc[info.index == seq].num_samples.iloc[0])
            for seq in self.metadata["sequence"]
        ]


MULTICONF_BENCHMARKS: list[Benchmark] = [
    Benchmark.MULTICONF_OOD60,
    Benchmark.MULTICONF_OODVAL,
    Benchmark.MULTICONF_DOMAINMOTION,
    Benchmark.MULTICONF_CRYPTICPOCKET,
]

ALL_BENCHMARKS: list[Benchmark] = list(Benchmark)


def benchmark_specs_frame():
    """Specs table for the CLI (benchmarks.py:83-112)."""
    import pandas as pd

    rows = []
    for bm in ALL_BENCHMARKS:
        md = bm.metadata.copy()
        md["benchmark"] = bm.value
        md["default_samplesize"] = bm.default_samplesize
        cols = ["benchmark", "test_case", "sequence", "default_samplesize"]
        rows.append(md[[c for c in cols if c in md.columns]])
    return pd.concat(rows, ignore_index=True)


class BenchmarkResults:
    """Shared results behavior (results.py:10-64): pickle round-trip plus the
    ``save_results`` / ``plot`` / ``get_aggregate_metrics`` contract the
    benchmark runners implement. The concrete classes are dataclasses; pickle
    preserves their numpy payloads exactly."""

    def to_pickle(self, outfile) -> None:
        import pickle

        with open(outfile, "wb") as f:
            pickle.dump(self, f)

    @classmethod
    def from_pickle(cls, infile):
        import pickle

        with open(infile, "rb") as f:
            obj = pickle.load(f)
        if not isinstance(obj, cls):
            raise TypeError(f"{infile} holds {type(obj).__name__}, not {cls.__name__}")
        return obj
