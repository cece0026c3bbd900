"""Parity + speed sanity of the native TM-score/RMSD core against the
numpy oracle (`benchmarks/align.py`)."""

import numpy as np
import pytest

from se3diff_tpu.benchmarks import align


@pytest.fixture(scope="module")
def lib():
    lib = align._load_tmlib()
    if lib is None:
        pytest.skip("native toolchain unavailable")
    return lib


def _frames(rng, F, L, noise):
    """Target plus noisy/rotated copies — a realistic mix of good and bad
    superpositions."""
    target = np.cumsum(rng.standard_normal((L, 3)) * 2.0, axis=0)
    out = np.empty((F, L, 3))
    for f in range(F):
        th = rng.uniform(0, 2 * np.pi)
        c, s = np.cos(th), np.sin(th)
        R = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1.0]])
        out[f] = (target + rng.standard_normal((L, 3)) * noise) @ R.T
        out[f] += rng.standard_normal(3) * 5.0
    return out, target


@pytest.mark.parametrize("L,noise", [(30, 0.5), (75, 2.0), (120, 6.0)])
def test_tm_score_matches_numpy(lib, L, noise):
    """Frame-for-frame parity in the typical case; the fragment-seeded
    iteration may legitimately diverge on a frame when an ill-conditioned
    small-fragment Kabsch rotation differs between the Jacobi and LAPACK
    SVDs (both trajectories are valid heuristic outcomes), so rare bounded
    divergence is tolerated."""
    rng = np.random.default_rng(L)
    frames, target = _frames(rng, 6, L, noise)
    got = align.tm_score_fixed_pairing_batch(frames, target)
    ref = np.array([align.tm_score_fixed_pairing(f, target) for f in frames])
    diff = np.abs(got - ref)
    assert np.median(diff) < 1e-9, (got, ref)
    assert (diff < 1e-9).sum() >= len(diff) - 1, (got, ref)
    assert diff.max() < 0.05, (got, ref)


def test_rmsd_matches_numpy(lib):
    rng = np.random.default_rng(0)
    frames, target = _frames(rng, 8, 64, 1.5)
    got = align.rmsd_optimal_native(frames, target)
    ref = align.rmsd_optimal(frames, target)
    np.testing.assert_allclose(got, ref, atol=1e-9)


def test_rmsd_degenerate_collinear(lib):
    """Collinear point sets give a rank-1 cross-covariance (two zero singular
    values). The native Kabsch must complete U from the one valid column
    instead of reading uninitialized memory — parity with the LAPACK oracle."""
    rng = np.random.default_rng(7)
    t = np.linspace(-1.0, 1.0, 20)[:, None]
    axis_t = np.array([1.0, 0.3, -0.2])
    target = t * axis_t
    axis_m = np.array([0.1, 1.0, 0.5])
    frames = np.stack(
        [t * axis_m + rng.standard_normal(3) * 2.0 for _ in range(4)]
    )
    got = align.rmsd_optimal_native(frames, target)
    ref = align.rmsd_optimal(frames, target)
    assert np.all(np.isfinite(got)), got
    # Jacobi vs LAPACK conditioning on a rank-1 covariance: ~1e-8 apart.
    np.testing.assert_allclose(got, ref, atol=1e-6)


def test_rmsd_degenerate_single_point_spread(lib):
    """All-identical mobile points (rank-0 covariance): valid zero rotation,
    RMSD equals the target's centered spread."""
    target = np.random.default_rng(9).standard_normal((10, 3))
    frames = np.tile(np.array([1.0, 2.0, 3.0]), (2, 10, 1))
    got = align.rmsd_optimal_native(frames, target)
    ref = align.rmsd_optimal(frames, target)
    assert np.all(np.isfinite(got)), got
    np.testing.assert_allclose(got, ref, atol=1e-9)


def test_single_frame_shapes(lib):
    rng = np.random.default_rng(3)
    frames, target = _frames(rng, 1, 40, 1.0)
    tm = align.tm_score_fixed_pairing_batch(frames[0], target)
    assert np.isscalar(tm) or tm.ndim == 0
    r = align.rmsd_optimal_native(frames[0], target)
    assert np.asarray(r).ndim == 0
