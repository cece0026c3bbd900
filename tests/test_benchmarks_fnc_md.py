"""Folding-free-energy + MD-emulation benchmarks, and the eval CLI."""

import json
from pathlib import Path

import numpy as np
import pytest

from se3diff_tpu.benchmarks import folding_free_energies as ffe
from se3diff_tpu.benchmarks import md_emulation as mde
from se3diff_tpu.benchmarks.cli import run_benchmarks
from se3diff_tpu.benchmarks.core import Benchmark
from se3diff_tpu.benchmarks.samples import IndexedSamples, find_samples_in_dir
from tests.test_benchmarks_multiconf import _extended_backbone, _write_sample_set


class TestFoldingFreeEnergyMath:
    def test_compute_dg_signs(self):
        # Mostly folded ensemble -> negative dG; mostly unfolded -> positive.
        folded = np.asarray([0.9] * 90 + [0.1] * 10)
        unfolded = np.asarray([0.9] * 10 + [0.1] * 90)
        dg_f = ffe._compute_dg(folded, 0.5, 295.0)
        dg_u = ffe._compute_dg(unfolded, 0.5, 295.0)
        assert dg_f < 0 < dg_u
        assert dg_f == pytest.approx(-dg_u)
        # Exact value: -kT ln(9).
        assert dg_f == pytest.approx(-ffe.K_BOLTZMANN * 295.0 * np.log(9.0))

    def test_threshold_separates_bimodal(self, rng):
        fnc = np.concatenate(
            [rng.normal(0.25, 0.03, 400), rng.normal(0.85, 0.03, 400)]
        ).clip(0, 1)
        thr = ffe._compute_threshold(fnc)
        assert 0.45 <= thr <= 0.80  # clamped to [min_abs, max_abs] window

    def test_clopper_pearson_interval_brackets(self):
        up, lo = ffe._clopper_pearson_confidence_interval(
            np.asarray([0.0]), np.asarray([100]), np.asarray([295.0])
        )
        assert lo[0] < 0.0 < up[0]

    def test_fnc_reference_high(self):
        ref = ffe.load_reference("1EM7_L7A")
        fnc = ffe.get_fnc_from_samples_trajectory(ref, ref)
        assert fnc.shape == (1,)
        assert fnc[0] > 0.9

    def test_fnc_extreme_distances_no_overflow(self):
        """The soft-FNC logistic must be overflow-safe: blow the sample up
        1000x so every contact distance argument is huge and positive."""
        import warnings

        from se3diff_tpu.benchmarks.trajectory import BackboneTraj

        ref = ffe.load_reference("1EM7_L7A")
        far = BackboneTraj(ref.coords * 1000.0, ref.resseq, ref.sequence)
        with warnings.catch_warnings():
            warnings.simplefilter("error", RuntimeWarning)
            fnc = ffe.get_fnc_from_samples_trajectory(far, ref)
        assert np.all(np.isfinite(fnc))
        assert fnc[0] < 1e-6  # fully unfolded: q saturates to 0


@pytest.fixture(scope="module")
def ffe_sampleset(tmp_path_factory):
    """Synthetic bimodal ensembles for one wildtype + one mutant."""
    import pandas as pd

    rng = np.random.default_rng(0)
    root = tmp_path_factory.mktemp("ffe_samples")
    si = pd.read_csv(
        Path(Benchmark.FOLDING_FREE_ENERGIES.asset_dir) / "system_info.csv"
    )
    for i, name in enumerate(["1EM7_L7A", "1EM7_L7A__T44V"]):
        seq = si.loc[si.name == name].sequence.iloc[0]
        ref = ffe.load_reference(name)
        # Map reference coords onto the full sequence length.
        from se3diff_tpu.benchmarks.align import matching_positions

        base = _extended_backbone(len(seq))
        for a, b in matching_positions(seq, ref.sequence):
            base[a] = ref.coords[0][b]
        # folded-like frames (small noise) + unfolded-like (extended chain)
        folded = base[None] + rng.standard_normal((30, len(seq), 4, 3)) * 0.05
        unfolded = _extended_backbone(len(seq))[None] + rng.standard_normal(
            (10 + 15 * i, len(seq), 4, 3)
        ) * 0.05
        _write_sample_set(root / name, seq, np.concatenate([folded, unfolded]))
    return root


class TestFoldingFreeEnergyEndToEnd:
    def test_evaluator(self, ffe_sampleset, tmp_path):
        found = find_samples_in_dir(ffe_sampleset)
        indexed = IndexedSamples.from_benchmark(
            Benchmark.FOLDING_FREE_ENERGIES, found
        )
        results = ffe.evaluate_folding_free_energies(indexed)
        df = results.free_energies_per_system
        assert set(df.index) == {"1EM7_L7A", "1EM7_L7A__T44V"}
        assert "ddg_pred" in df.columns
        ddg = df.loc["1EM7_L7A__T44V"].ddg_pred
        assert np.isfinite(float(ddg))
        agg = results.get_aggregate_metrics()
        assert "ddG_mae" in agg
        results.save_results(tmp_path)
        assert (tmp_path / "results_systems.csv").exists()
        assert (tmp_path / "contact_scores.npz").exists()


class TestMDEmulation:
    def test_features_shape_and_range(self, rng):
        from se3diff_tpu.benchmarks.trajectory import BackboneTraj

        R = 60
        coords = _extended_backbone(R)[None] + rng.standard_normal((3, R, 4, 3))
        traj = BackboneTraj(coords, np.arange(1, R + 1), "A" * R)
        feats = mde.compute_features(traj)
        n = R - 4
        assert feats.shape == (3, n * (n + 1) // 2)
        assert np.all((feats >= 0) & (feats <= 1))

    def test_distribution_metric_identical_is_zero(self, rng):
        proj = rng.standard_normal((2000, 2))
        metric = mde.DistributionMetrics2D(
            proj, n_resample=20000, random_seed=1
        )
        mae, rmse, cov = metric.score_nonzero(proj)
        assert mae < 0.15 and rmse < 0.25
        assert cov > 0.95

    def test_distribution_metric_shifted_is_large(self, rng):
        proj = rng.standard_normal((2000, 2))
        metric = mde.DistributionMetrics2D(proj, n_resample=20000, random_seed=1)
        mae, rmse, cov = metric.score_nonzero(proj + 4.0)
        assert cov < 0.6

    def test_evaluator_on_synthetic(self, tmp_path):
        import pandas as pd

        md = Benchmark.MD_EMULATION.metadata
        tc = "cath1_1bl0A02"
        seq = md.loc[md.test_case == tc].sequence.iloc[0]
        rng = np.random.default_rng(3)
        frames = _extended_backbone(len(seq))[None] + rng.standard_normal(
            (40, len(seq), 4, 3)
        ) * 0.3
        _write_sample_set(tmp_path / tc, seq, frames)
        found = find_samples_in_dir(tmp_path)
        indexed = IndexedSamples.from_benchmark(Benchmark.MD_EMULATION, found)
        settings = mde.DistributionMetricSettings(n_resample=20000)
        results = mde.evaluate_md_emulation(indexed, settings=settings)
        assert tc in results.sample_projections
        assert results.sample_projections[tc].shape == (40, 2)
        agg = results.get_aggregate_metrics()
        assert np.isfinite(agg["mae"])
        assert 0.0 <= agg["coverage"] <= 1.0


class TestEvalCLI:
    def test_run_benchmarks_end_to_end(self, ffe_sampleset, tmp_path):
        agg = run_benchmarks(
            [Benchmark.FOLDING_FREE_ENERGIES],
            samples_dir=str(ffe_sampleset),
            output_dir=str(tmp_path),
            skip_filtering=True,
            plot=False,
        )
        assert "folding_free_energies" in agg
        with open(tmp_path / "benchmark_metrics.json") as f:
            saved = json.load(f)
        assert saved.keys() == agg.keys()
        assert saved["folding_free_energies"]["dG_mae"] == pytest.approx(
            agg["folding_free_energies"]["dG_mae"], nan_ok=True
        )
        assert (tmp_path / "folding_free_energies" / "results_systems.csv").exists()
