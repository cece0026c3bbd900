"""Plot library: figures render, files save, numerics behave.

Counterpart of the reference's eval/*/plot.py modules (untested upstream);
here each helper is smoke-tested and the histogram/smoothing math checked.
"""

import numpy as np
import pytest

from se3diff_tpu.benchmarks import plots
from se3diff_tpu.benchmarks.multiconf import MetricType

matplotlib = pytest.importorskip("matplotlib")
matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402


@pytest.fixture(autouse=True)
def _close_figures():
    yield
    plt.close("all")


def test_free_energy_histogram_basic(rng):
    x = rng.standard_normal((2000, 2))
    gx, gy, e = plots.free_energy_histogram_2d(x, numbins=30, max_energy=8.0)
    assert gx.shape == gy.shape == e.shape == (30, 30)
    assert e.min() == 0.0  # shifted to min 0
    assert e.max() <= 9.0  # clamped at max_energy + 1
    # The densest region (origin) should be the minimum-energy region.
    center = e[12:18, 12:18].min()
    assert center < e[0, 0]


def test_free_energy_histogram_kT_scales(rng):
    x = rng.standard_normal((500, 2))
    _, _, e1 = plots.free_energy_histogram_2d(x, kT=1.0, max_energy=1e9)
    _, _, e2 = plots.free_energy_histogram_2d(x, kT=0.5, max_energy=1e9)
    np.testing.assert_allclose(e2, 0.5 * e1, rtol=1e-12)


def test_plot_free_energy_with_threshold(rng, tmp_path):
    x = np.abs(rng.standard_normal((400, 2))) * 3
    ax = plots.plot_free_energy_with_threshold(
        x, success_threshold=3.0, max_range=8.0, x_range=(0, 8), y_range=(0, 8)
    )
    assert ax.get_xlim() == (0.0, 8.0)
    ax.figure.savefig(tmp_path / "fe.png")
    assert (tmp_path / "fe.png").stat().st_size > 0


def test_landscape_grid(rng, tmp_path):
    results = {
        f"case{i}": np.abs(rng.standard_normal((100, 2))) * 4 + 0.5
        for i in range(4)
    }
    fig = plots.plot_2d_free_energy_landscapes_in_grid(results, MetricType.RMSD)
    # 4 systems in a 3-wide grid -> 2 rows x 3 cols of axes.
    assert len(fig.axes) == 6
    fig.savefig(tmp_path / "grid.png")


def test_smoothed_1d_free_energy_deterministic(rng):
    x = rng.uniform(0.2, 0.8, 50)
    c1, y1 = plots.smoothed_1d_free_energy(x, rng=np.random.default_rng(3))
    c2, y2 = plots.smoothed_1d_free_energy(x, rng=np.random.default_rng(3))
    np.testing.assert_array_equal(y1, y2)
    assert c1.shape == y1.shape == (100,)
    # Probability mass concentrates inside the sampled interval.
    mid = (c1 > 0.2) & (c1 < 0.8)
    assert np.nanmin(y1[mid]) < np.nanmin(y1[~mid] if (~mid).any() else np.inf)


def test_fnc_grid(rng, tmp_path):
    results = {f"sys{i}": rng.uniform(0, 1, 80) for i in range(3)}
    fig = plots.plot_free_energy_landscapes_by_fnc_in_grid(results)
    fig.savefig(tmp_path / "fnc.png")


def test_coverage_bootstrap_returns_threshold_value():
    thr = np.linspace(0, 10, 101)
    cov = np.tile(np.clip(thr / 5.0, 0, 1), (20, 1))  # deterministic ramp
    fig, ax = plt.subplots()
    v = plots.plot_coverage_bootstrap(thr, cov, MetricType.RMSD, ax=ax)
    # success threshold for RMSD is 3.0 -> coverage 3/5 = 0.6
    assert abs(v - 0.6) < 1e-9
    assert ax.get_ylim() == (0.0, 1.05)


def test_md_projection_grid(rng, tmp_path):
    samples = {"a": rng.standard_normal((300, 2)), "b": rng.standard_normal((200, 2)) + 1}
    refs = {"a": rng.standard_normal((400, 2)), "b": rng.standard_normal((400, 2)) + 1}
    fig = plots.plot_md_projection_grid(samples, refs, num_bins=25)
    # 2 systems x (ref, model, colorbar) columns.
    assert len(fig.axes) == 6
    fig.savefig(tmp_path / "proj.png")


def test_metric_strip(tmp_path):
    metrics = {
        "caseA": {"mae": 0.5, "rmse": 0.8, "coverage": 0.9},
        "caseB": {"mae": 1.5, "rmse": 2.0, "coverage": 0.7},
    }
    fig = plots.plot_metric_strip(
        metrics, {"mae": "MAE", "rmse": "RMSE", "coverage": "cov"}
    )
    assert len(fig.axes) == 3
    fig.savefig(tmp_path / "strip.png")
