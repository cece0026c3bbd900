"""Benchmark suite: alignment, metrics, multiconf + unfolding end-to-end.

Uses the vendored benchmark assets with small synthetic sample sets
(reference conformations + noise), mirroring the reference's
miniature-sample test strategy (SURVEY.md section 4.2).
"""

import os
from glob import glob
from pathlib import Path

import numpy as np
import pytest

from se3diff_tpu.benchmarks import metrics as M
from se3diff_tpu.benchmarks.align import (
    matching_positions,
    nw_align,
    rmsd_optimal,
    superpose,
    tm_score_fixed_pairing,
)
from se3diff_tpu.benchmarks.core import Benchmark
from se3diff_tpu.benchmarks.multiconf import (
    MetricType,
    compute_coverage_and_k_recall,
    coverage,
    evaluate_multiconf,
    evaluate_singleconf_unfolding,
    k_recall,
)
from se3diff_tpu.benchmarks.samples import (
    IndexedSamples,
    find_samples_in_dir,
    filter_unphysical_samples,
)
from se3diff_tpu.benchmarks.trajectory import load_reference_pdb
from se3diff_tpu.struct import xtc
from se3diff_tpu.struct.pdb import Structure, read_pdb, write_pdb
from se3diff_tpu.struct.residues import RESTYPES

ASSETS = Path(__file__).parent.parent / "assets" / "benchmarks"
MC = ASSETS / "multiconf_benchmark_0.1"


class TestAlign:
    def test_nw_identical(self):
        a, b = nw_align("ACDEFG", "ACDEFG")
        assert a == b == "ACDEFG"

    def test_nw_insertion(self):
        a, b = nw_align("ACDEFG", "ACDXEFG")
        assert a.replace("-", "") == "ACDEFG"
        assert b == "ACDXEFG"
        pairs = matching_positions("ACDEFG", "ACDXEFG")
        assert len(pairs) == 6

    def test_nw_prefix_suffix(self):
        pairs = matching_positions("MKVLA", "KVL")
        # K, V, L must be paired.
        assert (1, 0) in pairs and (2, 1) in pairs and (3, 2) in pairs

    def test_rmsd_optimal_invariance(self, rng):
        from scipy.spatial.transform import Rotation

        P = rng.standard_normal((30, 3))
        R = Rotation.random(random_state=0).as_matrix()
        Q = P @ R.T + 3.0
        assert rmsd_optimal(Q[None], P)[0] < 1e-6
        # Known displacement: one atom moved by 1 in a 30-atom cloud cannot
        # have RMSD more than sqrt(1/30).
        Q2 = P.copy()
        Q2[0] += [1.0, 0, 0]
        assert 0 < rmsd_optimal(Q2[None], P)[0] <= np.sqrt(1.0 / 30) + 1e-9

    def test_tm_score_self_is_one(self, rng):
        from scipy.spatial.transform import Rotation

        P = np.cumsum(rng.standard_normal((40, 3)) * 2, axis=0)  # chain-like
        R = Rotation.random(random_state=1).as_matrix()
        moved = P @ R.T - 5.0
        assert tm_score_fixed_pairing(moved, P) > 0.999

    def test_tm_score_noise_degrades(self, rng):
        P = np.cumsum(rng.standard_normal((40, 3)) * 2, axis=0)
        noisy = P + rng.standard_normal(P.shape) * 6.0
        tm = tm_score_fixed_pairing(noisy, P)
        assert tm < 0.7


@pytest.fixture(scope="module")
def q2fyi5_refs():
    pdbs = sorted(glob(str(MC / "ood60" / "reference" / "Q2FYI5" / "*.pdb")))
    return [load_reference_pdb(p) for p in pdbs]


class TestMetricsOnRealRefs:
    def test_self_metrics_perfect(self, q2fyi5_refs):
        t = q2fyi5_refs[0]
        pairs = [(int(r), int(r)) for r in t.resseq]
        assert M.rmsd(t, t, pairs)[0] < 1e-5
        assert M.tm_score(t, t, pairs)[0] == pytest.approx(1.0, abs=1e-6)
        assert M.lddt(t, t, pairs)[0] == 1.0
        assert M.dssp_match_accuracy(t, t, pairs)[0] == 1.0
        assert M.fraction_native_contacts(t, t, pairs)[0] == 1.0
        assert M.contact_distances(t, t, pairs)[0] == 0.0

    def test_cross_reference_metrics_sane(self, q2fyi5_refs):
        t1, t2 = q2fyi5_refs[:2]
        pairs = M.matching_resids(t1, t2)
        assert len(pairs) > 50
        r = M.rmsd(t1, t2, pairs)[0]
        tm = M.tm_score(t1, t2, pairs)[0]
        assert 0.0 < r < 30.0
        assert 0.2 < tm <= 1.0
        assert 0.3 < M.dssp_match_accuracy(t1, t2, pairs)[0] <= 1.0
        assert 0.3 < M.lddt(t1, t2, pairs)[0] <= 1.0

    def test_dssp_finds_structure(self, q2fyi5_refs):
        ss = M.dssp_simplified(q2fyi5_refs[0])
        frac_structured = float((ss != "C").mean())
        assert frac_structured > 0.2  # real protein has secondary structure


def _extended_backbone(R: int) -> np.ndarray:
    """Physically plausible extended-chain backbone [R, 4, 3]: Ca-Ca 3.8 A,
    C(i)-N(i+1) 1.33 A, O offset to avoid clashes."""
    base = np.zeros((R, 4, 3))
    x = np.arange(R) * 3.8
    base[:, 0, 0] = x  # N
    base[:, 1, 0] = x + 1.46  # CA
    base[:, 2, 0] = x + 2.47  # C
    base[:, 2, 1] = 0.3
    base[:, 3, 0] = x + 2.47  # O
    base[:, 3, 1] = 1.53
    return base


def _write_sample_set(tmpdir: Path, sequence: str, coords_ang: np.ndarray):
    """Write topology.pdb + samples.xtc for backbone-only frames
    [F, R, 4, 3] (N, CA, C, O)."""
    from se3diff_tpu.struct.residues import (
        ATOM37_C, ATOM37_CA, ATOM37_N, ATOM37_O,
    )

    F, R = coords_ang.shape[:2]
    atom37 = np.zeros((F, R, 37, 3), np.float32)
    mask = np.zeros((R, 37), bool)
    for k, a in enumerate([ATOM37_N, ATOM37_CA, ATOM37_C, ATOM37_O]):
        atom37[:, :, a] = coords_ang[:, :, k]
        mask[:, a] = True
    aatype = np.asarray([RESTYPES.index(c) for c in sequence])
    tmpdir.mkdir(parents=True, exist_ok=True)
    write_pdb(
        Structure(atom37=atom37[:1], mask=mask, aatype=aatype),
        str(tmpdir / "topology.pdb"),
    )
    flat = atom37[:, mask]  # [F, A, 3]
    xtc.write_xtc(str(tmpdir / "samples.xtc"), flat / 10.0)


@pytest.fixture(scope="module")
def ood60_sampleset(tmp_path_factory, q2fyi5_refs):
    """Synthetic samples for Q2FYI5: both references plus noisy copies."""
    tmpdir = tmp_path_factory.mktemp("ood60_samples")
    md = Benchmark.MULTICONF_OOD60.metadata
    seq = md.loc[md.test_case == "Q2FYI5"].sequence.iloc[0]
    ref = q2fyi5_refs[0]
    rng = np.random.default_rng(0)
    # The sampled sequence must match testcases.csv exactly; build frames
    # by perturbing reference coords mapped onto the full sequence (refs may
    # be shorter; just tile reference coords with noise at matched length).
    pairs = matching_positions(seq, ref.sequence)
    R = len(seq)
    base = _extended_backbone(R)
    for a, b in pairs:
        base[a] = ref.coords[0][b]
    frames = base[None] + rng.standard_normal((6, R, 4, 3)) * 0.05
    _write_sample_set(tmpdir, seq, frames)
    return tmpdir


class TestMulticonfEndToEnd:
    def test_full_flow(self, ood60_sampleset):
        found = find_samples_in_dir(ood60_sampleset)
        assert len(found) == 1
        indexed = IndexedSamples.from_benchmark(Benchmark.MULTICONF_OOD60, found)
        assert "Q2FYI5" in indexed.test_case_to_sequencesamples

        results = evaluate_multiconf(
            indexed,
            references_dir=str(MC / "ood60" / "reference"),
            metric_types=[MetricType.RMSD, MetricType.TMSCORE, MetricType.DSSP_ACC],
        )
        res = results["Q2FYI5"]
        n_refs = len(res.references_names)
        assert res.metrics_against_references[MetricType.RMSD].shape == (6, n_refs)
        # Samples were built around reference 0 -> small RMSD to at least
        # one reference.
        best = res.metrics_against_references[MetricType.RMSD].min()
        assert best < 3.0
        assert res.metrics_between_references[MetricType.RMSD]

        summary = compute_coverage_and_k_recall(results, Benchmark.MULTICONF_OOD60)
        thr, curves = summary.coverage[Benchmark.MULTICONF_OOD60.value][MetricType.RMSD]
        assert curves.shape == (20, 100)
        assert curves[:, -1].mean() > 0.9  # coverage at 10 A ~ 1 for RMSD<3

    def test_coverage_k_recall_math(self):
        results = {"a": np.asarray([[1.0], [2.0], [9.0]])}
        thr, cov = coverage(results, MetricType.RMSD)
        # At threshold just above 2.0, at least one sample < thr -> covered.
        assert cov[np.searchsorted(thr, 2.5)] == 1.0
        assert cov[0] == 0.0
        kr = k_recall(results, MetricType.RMSD, k=2)
        assert kr["a"] == pytest.approx(1.5)
        kr_gt = k_recall({"a": np.asarray([[0.1], [0.9]])}, MetricType.TMSCORE, k=1)
        assert kr_gt["a"] == pytest.approx(0.9)


@pytest.fixture(scope="module")
def trpcage_sampleset(tmp_path_factory):
    tmpdir = tmp_path_factory.mktemp("unfold_samples")
    md = Benchmark.SINGLECONF_LOCALUNFOLDING.metadata
    seq = md.loc[md.test_case == "trp-cage-cage"].sequence.iloc[0]
    ref_pdb = sorted(
        glob(str(MC / "localunfolding" / "reference" / "trp-cage-cage" / "*.pdb"))
    )[0]
    ref = load_reference_pdb(ref_pdb)
    rng = np.random.default_rng(1)
    pairs = matching_positions(seq, ref.sequence)
    R = len(seq)
    base = _extended_backbone(R)
    for a, b in pairs:
        base[a] = ref.coords[0][b]
    frames = base[None] + rng.standard_normal((5, R, 4, 3)) * 0.05
    _write_sample_set(tmpdir, seq, frames)
    return tmpdir


class TestLocalUnfolding:
    def test_unfolding_flow(self, trpcage_sampleset):
        found = find_samples_in_dir(trpcage_sampleset)
        indexed = IndexedSamples.from_benchmark(
            Benchmark.SINGLECONF_LOCALUNFOLDING, found
        )
        # Only keep the test case our synthetic samples belong to.
        indexed.test_case_to_sequencesamples = {
            "trp-cage-cage": indexed.test_case_to_sequencesamples["trp-cage-cage"]
        }
        results = evaluate_singleconf_unfolding(
            indexed,
            references_dir=str(MC / "localunfolding" / "reference"),
            references_localresidinfo_dir=str(
                MC / "localunfolding" / "local_residinfo"
            ),
        )
        fnc = results["trp-cage-cage"].metrics_against_references[
            MetricType.FNC_UNFOLD_F
        ]
        assert fnc.shape == (5, 1)
        # Near-reference samples keep most native contacts.
        assert fnc.mean() > 0.7


class TestFiltering:
    def test_filter_unphysical(self, tmp_path):
        """Physical extended-chain frames pass; a frame with a chain break
        and a frame with a clash are dropped."""
        md = Benchmark.MULTICONF_OOD60.metadata
        seq = md.loc[md.test_case == "Q2FYI5"].sequence.iloc[0]
        R = len(seq)
        rng = np.random.default_rng(5)
        good = _extended_backbone(R)[None] + rng.standard_normal((4, R, 4, 3)) * 0.03
        broken = good[0].copy()
        broken[R // 2 :, :, 0] += 30.0  # chain break: C-N >> 2 A
        clash = good[1].copy()
        clash[10] = clash[40]  # residue overlap: inter-residue dist < 1 A
        frames = np.concatenate([good, broken[None], clash[None]])
        _write_sample_set(tmp_path, seq, frames)
        found = find_samples_in_dir(tmp_path)
        indexed = IndexedSamples.from_benchmark(Benchmark.MULTICONF_OOD60, found)
        filtered, stats = filter_unphysical_samples(indexed)
        assert stats["Q2FYI5"][0] == pytest.approx(4 / 6)
        kept = filtered.test_case_to_sequencesamples["Q2FYI5"][0]
        assert kept.frames_to_include == (0, 1, 2, 3)


class TestLocalMetrics:
    def test_local_evaluation_path(self, tmp_path):
        """ood60-style local evaluation: align + measure on the residue
        ranges from local_residinfo (Q699R5, ranges [20, 69])."""
        md = Benchmark.MULTICONF_OOD60.metadata
        tc = "Q699R5"
        seq = md.loc[md.test_case == tc].sequence.iloc[0]
        ref_pdbs = sorted(
            glob(str(MC / "ood60" / "reference" / tc / "*.pdb"))
        )
        ref = load_reference_pdb(ref_pdbs[0])
        rng = np.random.default_rng(7)
        base = _extended_backbone(len(seq))
        for a, b in matching_positions(seq, ref.sequence):
            base[a] = ref.coords[0][b]
        frames = base[None] + rng.standard_normal((4, len(seq), 4, 3)) * 0.05
        _write_sample_set(tmp_path / tc, seq, frames)

        found = find_samples_in_dir(tmp_path)
        indexed = IndexedSamples.from_benchmark(Benchmark.MULTICONF_OOD60, found)
        results = evaluate_multiconf(
            indexed,
            references_dir=str(MC / "ood60" / "reference"),
            metric_types=[MetricType.RMSD, MetricType.TMSCORE],
            references_localresidinfo_dir=str(MC / "ood60" / "local_residinfo"),
        )
        res = results[tc]
        rmsd = res.metrics_against_references[MetricType.RMSD]
        tm = res.metrics_against_references[MetricType.TMSCORE]
        assert rmsd.shape == (4, len(ref_pdbs))
        # Samples built around reference 0's local region: near-zero local
        # RMSD and high local TM against it.
        assert rmsd.min() < 1.0
        assert tm.max() > 0.8
        # Local metrics differ from global ones for the same samples.
        results_global = evaluate_multiconf(
            indexed,
            references_dir=str(MC / "ood60" / "reference"),
            metric_types=[MetricType.RMSD],
        )
        g = results_global[tc].metrics_against_references[MetricType.RMSD]
        assert not np.allclose(g, rmsd)

    def test_closest_sample_written(self, tmp_path, ood60_sampleset):
        found = find_samples_in_dir(ood60_sampleset)
        indexed = IndexedSamples.from_benchmark(Benchmark.MULTICONF_OOD60, found)
        results = evaluate_multiconf(
            indexed,
            references_dir=str(MC / "ood60" / "reference"),
            metric_types=[MetricType.RMSD],
        )
        res = results["Q2FYI5"]
        closest = res.closest_samples[MetricType.RMSD]
        assert len(closest) == len(res.references_names)
        closest[0].save_to_pdb("Q2FYI5", tmp_path)
        written = list(tmp_path.glob("Q2FYI5/rmsd/*.pdb"))
        assert len(written) == 1
        assert read_pdb(str(written[0])).num_residues > 10


def test_results_plotting(tmp_path, ood60_sampleset):
    found = find_samples_in_dir(ood60_sampleset)
    indexed = IndexedSamples.from_benchmark(Benchmark.MULTICONF_OOD60, found)
    results = evaluate_multiconf(
        indexed,
        references_dir=str(MC / "ood60" / "reference"),
        metric_types=[MetricType.RMSD],
    )
    summary = compute_coverage_and_k_recall(results, Benchmark.MULTICONF_OOD60)
    summary.plot(tmp_path)
    names = {p.name for p in tmp_path.glob("*.png")}
    assert "coverage_multiconf_ood60.png" in names
    assert "krecall_multiconf_ood60_rmsd.png" in names
    assert "landscape_rmsd.png" in names
    summary.save_results(tmp_path)
    assert (tmp_path / "summary.json").exists()


class TestDSSPFoldClasses:
    def test_sh3_is_beta_rich(self):
        """GRB2-SH3 is a beta-barrel: DSSP must find sheet >> helix."""
        from se3diff_tpu.benchmarks.trajectory import load_reference_pdb

        t = load_reference_pdb(
            Path(__file__).parent.parent / "assets" / "structures" /
            "2vwf_trimmed_SH3.pdb"
        )
        ss = M.dssp_simplified(t)[0]
        frac_e = float((ss == "E").mean())
        frac_h = float((ss == "H").mean())
        assert frac_e > 0.25
        assert frac_e > 2 * frac_h

    def test_pdz3_has_helix_and_sheet(self):
        """PSD95-PDZ3 is an alpha/beta fold: both classes present."""
        from se3diff_tpu.benchmarks.trajectory import load_reference_pdb

        t = load_reference_pdb(
            Path(__file__).parent.parent / "assets" / "structures" /
            "1be9_trimmed.pdb"
        )
        ss = M.dssp_simplified(t)[0]
        assert (ss == "E").mean() > 0.1
        assert (ss == "H").mean() > 0.1

    def test_extended_chain_is_coil(self):
        from se3diff_tpu.benchmarks.trajectory import BackboneTraj

        R = 30
        t = BackboneTraj(
            _extended_backbone(R)[None], np.arange(1, R + 1), "A" * R
        )
        ss = M.dssp_simplified(t)[0]
        assert (ss == "C").mean() > 0.9  # no H-bond network in a strand alone


def test_results_pickle_roundtrip_and_aggregate(tmp_path, ood60_sampleset):
    """BenchmarkResults contract (reference results.py:10-64): pickle
    round-trip preserves arrays; get_aggregate_metrics includes both
    k-recall means and coverage-at-threshold."""
    from se3diff_tpu.benchmarks.multiconf import MulticonfResults

    found = find_samples_in_dir(ood60_sampleset)
    indexed = IndexedSamples.from_benchmark(Benchmark.MULTICONF_OOD60, found)
    results = evaluate_multiconf(
        indexed,
        references_dir=str(MC / "ood60" / "reference"),
        metric_types=[MetricType.RMSD],
    )
    res = compute_coverage_and_k_recall(results, Benchmark.MULTICONF_OOD60)
    p = tmp_path / "res.pkl"
    res.to_pickle(p)
    back = MulticonfResults.from_pickle(p)
    assert back.benchmark == res.benchmark
    for label, covs in res.coverage.items():
        for mt, (thr, vals) in covs.items():
            np.testing.assert_array_equal(back.coverage[label][mt][0], thr)
            np.testing.assert_array_equal(back.coverage[label][mt][1], vals)
    agg = back.get_aggregate_metrics()
    assert any(k.endswith("/coverage") for k in agg)
    assert any(k.endswith("/k_recall_mean") for k in agg)
