"""Observables: Kabsch alignment, FNC contacts, h-functions, h* loading."""

from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from se3diff_tpu.ppft import observables as obs
from se3diff_tpu.ppft.h_functions import (
    DEFAULT_PDZ3_REF,
    DEFAULT_SH3_REF,
    FoldingBinding,
    FoldingStability,
    compute_folded_proportion,
)

ASSETS = Path(__file__).parent.parent / "assets"


class TestWeightedRigidAlign:
    def test_exact_recovery_under_rigid_motion(self, rng):
        ref = rng.standard_normal((20, 3)).astype(np.float32)
        R = Rotation.random(random_state=1).as_matrix().astype(np.float32)
        moved = ref @ R.T + np.asarray([1.0, -2.0, 0.5], np.float32)
        aligned = obs.weighted_rigid_align(jnp.asarray(moved), jnp.asarray(ref))
        np.testing.assert_allclose(np.asarray(aligned), ref, atol=1e-4)

    def test_reflection_not_allowed(self, rng):
        # Mirror image cannot be aligned by a proper rotation: the det
        # correction must keep det(R) = +1 and leave residual error.
        ref = rng.standard_normal((20, 3)).astype(np.float32)
        mirrored = ref * np.asarray([-1.0, 1.0, 1.0], np.float32)
        aligned = obs.weighted_rigid_align(jnp.asarray(mirrored), jnp.asarray(ref))
        rmsd = float(np.sqrt(((np.asarray(aligned) - ref) ** 2).sum(-1).mean()))
        assert rmsd > 0.1

    def test_weights_focus_alignment(self, rng):
        ref = rng.standard_normal((30, 3)).astype(np.float32)
        moved = ref.copy()
        moved[20:] += 5.0  # corrupt unweighted region
        w = np.zeros(30, np.float32)
        w[:20] = 1.0
        aligned = obs.weighted_rigid_align(
            jnp.asarray(moved)[None], jnp.asarray(ref)[None], jnp.asarray(w)[None]
        )[0]
        np.testing.assert_allclose(np.asarray(aligned)[:20], ref[:20], atol=1e-4)

    def test_batched_matches_loop(self, rng):
        ref = rng.standard_normal((12, 3)).astype(np.float32)
        batch = rng.standard_normal((5, 12, 3)).astype(np.float32)
        out_b = np.asarray(obs.weighted_rigid_align(jnp.asarray(batch), jnp.asarray(ref)))
        for i in range(5):
            out_i = np.asarray(
                obs.weighted_rigid_align(jnp.asarray(batch[i]), jnp.asarray(ref))
            )
            np.testing.assert_allclose(out_b[i], out_i, atol=1e-5)


class TestFNC:
    def test_dense_mask_matches_pair_list(self, rng):
        """The dense-mask formulation must equal the reference's explicit
        symmetric pair-list mean (observables.py:60-113,199-232)."""
        ref = (rng.standard_normal((15, 3)) * 4).astype(np.float64)
        samples = (ref[None] + rng.standard_normal((3, 15, 3))).astype(np.float64)
        s = obs.FNCSettings()

        # Reference-style: explicit pair list.
        pairs = []
        for i in range(15):
            for j in range(i + s.sequence_separation + 1, 15):
                pairs.append((i, j))
                pairs.append((j, i))
        pairs = np.asarray(pairs)
        dref = np.linalg.norm(ref[pairs[:, 0]] - ref[pairs[:, 1]], axis=-1)
        keep = dref <= s.contact_cutoff
        pairs, dref = pairs[keep], dref[keep]
        dsamp = np.linalg.norm(
            samples[:, pairs[:, 0]] - samples[:, pairs[:, 1]], axis=-1
        )
        q = 1.0 / (
            1.0 + np.exp(s.contact_beta * (dsamp - s.contact_lambda * (dref + s.contact_delta)))
        )
        expected = q.mean(axis=-1)

        got = np.asarray(
            obs.get_fnc_from_coords(jnp.asarray(samples, jnp.float32), ref, s)
        )
        np.testing.assert_allclose(got, expected, atol=1e-5)

    def test_reference_scores_high(self):
        ref_nm = obs.load_ref(str(ASSETS / "structures" / "2vwf_trimmed_SH3.pdb"))
        fnc = obs.get_fnc_from_coords(
            jnp.asarray(ref_nm[None] * 10.0), ref_nm * 10.0
        )
        assert float(fnc[0]) > 0.9

    def test_h_binary_on_reference_is_folded_and_bound(self):
        ref_nm = obs.load_ref(str(ASSETS / "structures" / "2vwf_trimmed_SH3.pdb"))
        h = np.asarray(
            obs.compute_h_binary(jnp.asarray(ref_nm[None]), DEFAULT_SH3_REF)
        )
        np.testing.assert_array_equal(h, [[1.0, 1.0]])

    def test_h_binary_random_is_unfolded(self, rng):
        ref_nm = obs.load_ref(str(ASSETS / "structures" / "2vwf_trimmed_SH3.pdb"))
        coords = rng.standard_normal((2, ref_nm.shape[0], 3)).astype(np.float32) * 3
        h = np.asarray(obs.compute_h_binary(jnp.asarray(coords), DEFAULT_SH3_REF))
        np.testing.assert_array_equal(h[:, 0], [0.0, 0.0])


class TestHFunctions:
    def test_folding_stability_on_reference(self):
        h_func = FoldingStability()
        ref_nm = obs.load_ref(DEFAULT_SH3_REF)
        h = np.asarray(h_func(jnp.asarray(ref_nm[None]), "X"))
        assert h.shape == (1, 1)
        assert h[0, 0] > 0.999  # drmsd = 0 -> sigmoid(9.6)

    def test_folding_stability_on_noise(self, rng):
        h_func = FoldingStability()
        ref_nm = obs.load_ref(DEFAULT_SH3_REF)
        noise = rng.standard_normal((3, ref_nm.shape[0], 3)).astype(np.float32) * 2
        h = np.asarray(h_func(jnp.asarray(noise), "X"))
        assert np.all(h < 0.01)

    def test_folding_binding_shape_and_order(self):
        h_func = FoldingBinding()
        ref_nm = obs.load_ref(DEFAULT_SH3_REF)
        h = np.asarray(h_func(jnp.asarray(ref_nm[None]), "X"))
        assert h.shape == (1, 2)
        assert np.all(h > 0.99)

    def test_pdz3_reference_loads(self):
        ref = obs.load_ref(DEFAULT_PDZ3_REF)
        assert ref.ndim == 2 and ref.shape[1] == 3 and ref.shape[0] > 50

    def test_folded_proportion_sigmoid_midpoint(self):
        # drmsd == d_0 -> p = 0.5 regardless of k.
        ref = jnp.zeros((4, 3))
        # Construct coords with known drmsd: cdist zeros vs cdist(coords).
        # Use identical coords -> drmsd 0 -> p = sigmoid(-k d_0) ~ 1.
        p = compute_folded_proportion(ref[None], ref)
        assert float(p[0]) > 0.999


class TestHStars:
    def test_h_star_from_csv_grb2(self):
        seqs, h = obs.h_star_from_csv(
            str(ASSETS / "reference_h" / "GRB2_SH3_high_confidence.csv")
        )
        assert len(seqs) == h.shape[0] and h.shape[1] == 2
        assert np.all((h > 0) & (h < 1))
        assert all(isinstance(s, str) and len(s) > 10 for s in seqs[:5])


class TestRawObservable:
    def test_raw_on_reference_structure(self):
        from se3diff_tpu.ppft.observables import compute_h_for_grb2_sh3_raw

        ref_nm = obs.load_ref(DEFAULT_SH3_REF)
        h = np.asarray(
            compute_h_for_grb2_sh3_raw(
                jnp.asarray(ref_nm[None]), None, DEFAULT_SH3_REF
            )
        )
        assert h.shape == (1, 2)
        assert h[0, 0] > 0.9   # FNC of the reference against itself
        assert h[0, 1] < 1e-3  # interface RMSD ~ 0

    def test_raw_continuous_vs_binary(self, rng):
        from se3diff_tpu.ppft.observables import (
            compute_h_binary,
            compute_h_for_grb2_sh3_raw,
        )

        ref_nm = obs.load_ref(DEFAULT_SH3_REF)
        noisy = ref_nm[None] + rng.standard_normal((3, *ref_nm.shape)).astype(
            np.float32
        ) * 0.05
        raw = np.asarray(
            compute_h_for_grb2_sh3_raw(jnp.asarray(noisy), None, DEFAULT_SH3_REF)
        )
        binary = np.asarray(compute_h_binary(jnp.asarray(noisy), DEFAULT_SH3_REF))
        # Raw values are continuous; binary applies the 0.7 / 0.2 thresholds.
        assert np.all((raw[:, 0] > 0) & (raw[:, 0] < 1))
        np.testing.assert_array_equal(binary[:, 0], (raw[:, 0] > 0.7).astype(float))
