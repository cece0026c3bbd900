"""Full benchmark CLI on the reference's real miniature sample sets.

`tests/test_data/samples_example/` is the reference's own end-to-end CLI
fixture (`bioemu-benchmarks/tests/test_data/samples_example/`): real small
pdb+xtc ensembles per benchmark. Running our CLI over the exact data the
reference tests itself with is the strongest available integration check
(the reference's expectations: exit 0 + expected output file sets,
tests/scripts/test_bioemu_bench.py:119-156).
"""

import json
from pathlib import Path

import numpy as np
import pytest

from se3diff_tpu.benchmarks.cli import run_benchmarks
from se3diff_tpu.benchmarks.core import Benchmark

SAMPLES = Path(__file__).parent / "test_data" / "samples_example"


@pytest.mark.parametrize(
    "benchmark,expected_files",
    [
        (Benchmark.FOLDING_FREE_ENERGIES,
         ["results_systems.csv", "results_metrics.csv", "contact_scores.npz"]),
        (Benchmark.MD_EMULATION,
         ["results_metrics.csv", "results_projections.npz"]),
        (Benchmark.SINGLECONF_LOCALUNFOLDING,
         ["summary.json", "multiconf_results.npz", "results.h5"]),
    ],
)
def test_cli_on_reference_fixture(tmp_path, benchmark, expected_files):
    agg = run_benchmarks(
        [benchmark],
        samples_dir=str(SAMPLES / benchmark.value),
        output_dir=str(tmp_path),
        skip_filtering=False,
        plot=False,
    )
    assert benchmark.value in agg, agg
    out = tmp_path / benchmark.value
    for f in expected_files:
        assert (out / f).exists(), f
    assert (out / "filter_statistics.json").exists()
    vals = [v for v in agg[benchmark.value].values() if isinstance(v, float)]
    assert vals and all(np.isfinite(v) or np.isnan(v) for v in vals)


@pytest.mark.parametrize(
    "benchmark", [Benchmark.MULTICONF_OOD60, Benchmark.MULTICONF_DOMAINMOTION]
)
def test_cli_multiconf_on_reference_fixture(tmp_path, benchmark):
    """Multiconf benchmarks on the real fixture ensembles, restricted to the
    cheap metrics (TM-score over thousands of frames is the expensive one)."""
    from se3diff_tpu.benchmarks.cli import run_benchmark
    from se3diff_tpu.benchmarks.multiconf import MetricType
    from se3diff_tpu.benchmarks.samples import (
        IndexedSamples,
        find_samples_in_dir,
    )

    found = find_samples_in_dir(SAMPLES / benchmark.value)
    indexed = IndexedSamples.from_benchmark(benchmark, found)
    # Keep the two smallest test cases for runtime.
    items = sorted(
        indexed.test_case_to_sequencesamples.items(),
        key=lambda kv: len(kv[1][0].get_traj().sequence),
    )[:2]
    indexed.test_case_to_sequencesamples = dict(items)

    from se3diff_tpu.benchmarks.multiconf import (
        compute_coverage_and_k_recall,
        evaluate_multiconf,
    )

    local = benchmark == Benchmark.MULTICONF_OOD60
    evals = evaluate_multiconf(
        indexed,
        references_dir=str(Path(benchmark.asset_dir) / "reference"),
        metric_types=[MetricType.RMSD, MetricType.DSSP_ACC],
        references_localresidinfo_dir=(
            str(Path(benchmark.asset_dir) / "local_residinfo") if local else None
        ),
    )
    results = compute_coverage_and_k_recall(evals, benchmark)
    for tc, res in results.per_system.items():
        arr = res.metrics_against_references[MetricType.RMSD]
        assert arr.ndim == 2 and np.isfinite(arr).all()
        # Real BioEmu samples of real proteins: RMSDs in a sane range.
        assert 0.0 < np.median(arr) < 50.0
        acc = res.metrics_against_references[MetricType.DSSP_ACC]
        assert 0.0 <= acc.min() and acc.max() <= 1.0
    results.save_results(tmp_path)
    assert (tmp_path / "summary.json").exists()

    # H5 key-set parity with the reference contract (results.py:43-92,
    # key expectations mirrored from tests/test_multiconf_evaluator.py:40-62
    # and tests/scripts/test_bioemu_bench.py:119-156).
    import h5py

    with h5py.File(tmp_path / "results.h5", "r") as h5:
        label = benchmark.value
        for metric in ("rmsd", "dssp_acc"):
            assert f"coverage_{label}_{metric}" in h5
            assert f"krecall_{label}_{metric}" in h5
            cov = h5[f"coverage_{label}_{metric}"]
            assert set(cov.keys()) == {"thresholds", "values"}
        assert "sample_metrics" in h5
        assert "reference_metrics" in h5
        for tc, res in results.per_system.items():
            assert f"sample_metrics/{tc}/rmsd" in h5
            np.testing.assert_array_equal(
                h5[f"sample_metrics/{tc}/rmsd"][()],
                res.metrics_against_references[MetricType.RMSD],
            )
            assert f"reference_metrics/{tc}/references_names" in h5


def test_reference_recorded_values_ood60():
    """Reproduce the reference's own recorded expectations on its fixture
    (tests/test_multiconf_evaluator.py:16,100-105): coverage at the last
    RMSD threshold must match exactly; E1C7U0's 1-recall within 10%
    (both stacks pick an optimal alignment register; the gap-first traceback
    matches Biopython's to within one residue pair)."""
    from se3diff_tpu.benchmarks.multiconf import (
        MetricType,
        coverage,
        evaluate_multiconf,
        k_recall,
    )
    from se3diff_tpu.benchmarks.samples import IndexedSamples, find_samples_in_dir

    found = find_samples_in_dir(SAMPLES / "multiconf_ood60")
    indexed = IndexedSamples.from_benchmark(Benchmark.MULTICONF_OOD60, found)
    asset = Path(Benchmark.MULTICONF_OOD60.asset_dir)
    evals = evaluate_multiconf(
        indexed,
        references_dir=str(asset / "reference"),
        metric_types=[MetricType.RMSD],
        references_localresidinfo_dir=str(asset / "local_residinfo"),
    )
    res = {tc: e.metrics_against_references[MetricType.RMSD] for tc, e in evals.items()}
    _, cov = coverage(res, MetricType.RMSD)
    assert cov[-1] == pytest.approx(0.8157894736842105, abs=1e-12)
    kr = k_recall(res, MetricType.RMSD, k=1)
    assert kr["E1C7U0"] == pytest.approx(6.0333076, rel=0.01)


def test_crypticpocket_holo_apo_on_reference_fixture(tmp_path):
    """Crypticpocket on real fixture ensembles: local evaluation + holo/apo
    split with per-group coverage/k-recall and the benchmark-specific 1.5 A
    RMSD threshold (evaluate.py:685-719, results.py:20-22)."""
    from se3diff_tpu.benchmarks.multiconf import (
        BENCHMARK_SPECIFIC_SUCCESS_THRESHOLDS,
        MetricType,
        compute_coverage_and_k_recall,
        evaluate_multiconf,
        split_holo_apo,
    )
    from se3diff_tpu.benchmarks.samples import IndexedSamples, find_samples_in_dir

    bm = Benchmark.MULTICONF_CRYPTICPOCKET
    found = find_samples_in_dir(SAMPLES / bm.value)
    indexed = IndexedSamples.from_benchmark(bm, found)
    keep = [tc for tc in ("P79345", "P0DP23") if tc in indexed.test_case_to_sequencesamples]
    assert keep
    indexed.test_case_to_sequencesamples = {
        tc: indexed.test_case_to_sequencesamples[tc] for tc in keep
    }
    asset = Path(bm.asset_dir)
    evals = evaluate_multiconf(
        indexed,
        references_dir=str(asset / "reference"),
        metric_types=[MetricType.RMSD],
        references_localresidinfo_dir=str(asset / "local_residinfo"),
    )
    res = evals[keep[0]]
    holo, apo = split_holo_apo(res)
    assert holo.metrics_against_references[MetricType.RMSD].shape[1] == 1
    assert apo.metrics_against_references[MetricType.RMSD].shape[1] == 1
    # Holo and apo pick different reference columns.
    assert not np.array_equal(
        holo.metrics_against_references[MetricType.RMSD],
        apo.metrics_against_references[MetricType.RMSD],
    )

    results = compute_coverage_and_k_recall(evals, bm)
    assert set(results.coverage) == {
        f"{bm.value}_holo", f"{bm.value}_apo"
    }
    assert BENCHMARK_SPECIFIC_SUCCESS_THRESHOLDS[bm][MetricType.RMSD] == 1.5
    results.save_results(tmp_path)
    with open(tmp_path / "summary.json") as f:
        summary = json.load(f)
    thr = summary["coverage_at_threshold"][f"{bm.value}_holo"]["rmsd"]["threshold"]
    assert thr == pytest.approx(1.5, abs=0.06)  # nearest grid point to 1.5 A


def test_ffe_and_md_plots(tmp_path):
    """Plot functions of the folding-dG and MD-emulation results render."""
    from se3diff_tpu.benchmarks.folding_free_energies import (
        evaluate_folding_free_energies,
    )
    from se3diff_tpu.benchmarks.md_emulation import (
        DistributionMetricSettings,
        evaluate_md_emulation,
    )
    from se3diff_tpu.benchmarks.samples import IndexedSamples, find_samples_in_dir

    found = find_samples_in_dir(SAMPLES / "folding_free_energies")
    indexed = IndexedSamples.from_benchmark(Benchmark.FOLDING_FREE_ENERGIES, found)
    ffe = evaluate_folding_free_energies(indexed)
    ffe.plot(tmp_path / "ffe")
    assert (tmp_path / "ffe" / "scatter_dG.png").exists()

    found = find_samples_in_dir(SAMPLES / "md_emulation")
    indexed = IndexedSamples.from_benchmark(Benchmark.MD_EMULATION, found)
    md = evaluate_md_emulation(
        indexed, settings=DistributionMetricSettings(n_resample=20000)
    )
    md.plot(tmp_path / "md")
    assert (tmp_path / "md" / "projections.png").exists()


def test_specs_cli_csv(tmp_path):
    from se3diff_tpu.benchmarks.cli import main as bench_cli

    out = tmp_path / "specs.csv"
    bench_cli(["specs", "--output_csv", str(out)])
    import pandas as pd

    df = pd.read_csv(out)
    assert {"benchmark", "test_case", "sequence", "default_samplesize"} <= set(df.columns)
    # All 7 benchmarks; 292 metadata rows straight from the vendored
    # testcases.csv files (md_emulation ships 17 rows).
    assert df.benchmark.nunique() == 7
    assert len(df) == 292


def test_cli_accepts_multiple_sample_dirs(tmp_path):
    """The reference's --sample_dirs takes several directories; samples from
    all of them are pooled before indexing (bioemu_bench.py:90-110)."""
    bench = Benchmark.MD_EMULATION
    d = str(SAMPLES / bench.value)
    agg = run_benchmarks(
        [bench],
        samples_dir=[d, d],  # pooled: same dir twice -> doubled sample list
        output_dir=str(tmp_path),
        skip_filtering=True,
        plot=False,
    )
    assert bench.value in agg, agg
