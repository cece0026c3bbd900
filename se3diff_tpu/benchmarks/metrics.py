"""Structural metrics: RMSD, TM-score, DSSP accuracy, LDDT, contacts.

From-scratch counterparts of
`bioemu-benchmarks/bioemu_benchmarks/eval/multiconf/metrics.py`, with the
external native dependencies replaced:

* mdtraj QCP RMSD -> Kabsch (align.rmsd_optimal)
* USalign TM-score subprocess -> native iterative TM-score
  (align.tm_score_fixed_pairing); a USalign adapter remains for hosts that
  have the binary
* mdtraj DSSP (C library) -> from-scratch Kabsch–Sander hydrogen-bond DSSP
  (simplified 3-class H/E/C output, matching mdtraj's ``simplified=True``)
"""

from __future__ import annotations

import os
import shutil
import subprocess
from itertools import combinations

import numpy as np

from se3diff_tpu.benchmarks.align import (
    matching_positions,
    rmsd_optimal_native,
    superpose,
    tm_d0,
    tm_score_fixed_pairing_batch,
)
from se3diff_tpu.benchmarks.trajectory import CA_IN_BACKBONE, BackboneTraj

# ------------------------------------------------------------------ #
# Residue matching                                                    #
# ------------------------------------------------------------------ #


def matching_resids(traj_i: BackboneTraj, traj_j: BackboneTraj) -> list[tuple[int, int]]:
    """Pairs of matching resSeq ids via global sequence alignment
    (align.py:109-137 in the reference uses Biopython globalxx)."""
    pairs = matching_positions(traj_i.sequence, traj_j.sequence)
    return [(int(traj_i.resseq[a]), int(traj_j.resseq[b])) for a, b in pairs]


def _indices_for(traj: BackboneTraj, resids: list[int]) -> np.ndarray:
    m = traj.resseq_to_index()
    return np.asarray([m[r] for r in resids], int)


# ------------------------------------------------------------------ #
# RMSD / TM                                                            #
# ------------------------------------------------------------------ #


def rmsd(
    ref: BackboneTraj, sample: BackboneTraj, pairs: list[tuple[int, int]]
) -> np.ndarray:
    """Optimal backbone RMSD (Angstrom) per sample frame vs ref frame 0
    (evaluate.py:236-249)."""
    ri = _indices_for(ref, [p[0] for p in pairs])
    si = _indices_for(sample, [p[1] for p in pairs])
    target = ref.coords[0, ri].reshape(-1, 3)
    mobile = sample.coords[:, si].reshape(sample.n_frames, -1, 3)
    return rmsd_optimal_native(mobile, target)


def tm_score(
    ref: BackboneTraj, sample: BackboneTraj, pairs: list[tuple[int, int]]
) -> np.ndarray:
    """TM-score per frame over matched CA atoms (metrics.py:20-45).

    The reference runs USalign per frame and takes max(TM_i, TM_j) of the
    two normalizations; here we compute the fixed-pairing TM under both
    normalizations natively (alignment-free pairs come from the sequence
    alignment, which is what USalign converges to for these highly similar
    chains).
    """
    ri = _indices_for(ref, [p[0] for p in pairs])
    si = _indices_for(sample, [p[1] for p in pairs])
    ref_ca = ref.coords[0, ri, CA_IN_BACKBONE]
    sam_all = sample.coords[:, si, CA_IN_BACKBONE]
    # Normalization i batches all frames against the fixed reference; j
    # swaps roles per frame (the target changes, so it cannot batch).
    tm_i = tm_score_fixed_pairing_batch(sam_all, ref_ca)
    tm_j = np.array([
        float(tm_score_fixed_pairing_batch(ref_ca, sam_all[f]))
        for f in range(sample.n_frames)
    ])
    return np.maximum(tm_i, tm_j)


def tm_score_local(pairwise_distances: np.ndarray) -> np.ndarray:
    """Local-region TM from per-atom deviations [F, n_res*4]
    (metrics.py:48-65): CA deviations are every 4th column starting at 1."""
    assert pairwise_distances.ndim == 2
    ca = pairwise_distances[:, CA_IN_BACKBONE::4]
    ltarget = ca.shape[1]
    d0 = 1.24 * np.cbrt(ltarget - 15) - 1.8
    return np.mean(1.0 / (1.0 + (ca / d0) ** 2), axis=-1)


def tm_score_usalign(
    ref_pdb: str, sample_pdb: str, us_align_exec: str | None = None
) -> float:
    """Optional USalign subprocess adapter (align.py:42-81). Raises
    FileNotFoundError when the binary is unavailable (no auto-download in
    hermetic environments)."""
    exe = us_align_exec or shutil.which("USalign")
    if exe is None or not os.path.exists(exe):
        raise FileNotFoundError("USalign binary not found")
    res = subprocess.run(
        [exe, sample_pdb, ref_pdb, "-outfmt", "2"],
        capture_output=True, check=True,
    )
    line = res.stdout.decode().splitlines()[1].split()
    return max(float(line[2]), float(line[3]))


# ------------------------------------------------------------------ #
# DSSP (from scratch, Kabsch–Sander)                                  #
# ------------------------------------------------------------------ #

_Q1Q2_F = 0.084 * 332.0  # kcal/mol, Kabsch & Sander (1983)
_HB_CUTOFF = -0.5


def _hbond_matrix(coords: np.ndarray) -> np.ndarray:
    """Kabsch–Sander backbone H-bonds for one frame ``[R, 4, 3]``.

    ``hb[d, a]`` True when the N-H of residue d donates to the C=O of
    residue a. The amide H is placed 1.01 A from N along the previous
    residue's C->O opposite direction (standard DSSP reconstruction).
    """
    N, CA, C, O = coords[:, 0], coords[:, 1], coords[:, 2], coords[:, 3]
    R = coords.shape[0]
    co = C[:-1] - O[:-1]
    co /= np.linalg.norm(co, axis=-1, keepdims=True) + 1e-12
    H = N.copy()
    H[1:] = N[1:] + 1.01 * co  # residue 0 (no preceding C=O) keeps H = N

    def dist(a, b):
        # [d, a] distances between donor-side atoms and acceptor-side atoms.
        return np.linalg.norm(a[:, None, :] - b[None, :, :], axis=-1) + 1e-9

    r_ON = dist(N, O)  # |N_d - O_a|
    r_CH = dist(H, C)  # |H_d - C_a|
    r_OH = dist(H, O)  # |H_d - O_a|
    r_CN = dist(N, C)  # |N_d - C_a|
    E = _Q1Q2_F * (1.0 / r_ON + 1.0 / r_CH - 1.0 / r_OH - 1.0 / r_CN)
    hb = E < _HB_CUTOFF
    np.fill_diagonal(hb, False)
    hb[0] = False  # first residue has no amide H
    return hb


def dssp_simplified(traj: BackboneTraj) -> np.ndarray:
    """3-class secondary structure ('H'/'E'/'C') per frame and residue.

    From-scratch DSSP variant: n-turns from i+3/4/5 H-bonds give G/H/I
    helices (all mapped to 'H'), Kabsch–Sander bridges give 'E', the rest
    'C' — the same simplification mdtraj applies to full DSSP output
    (metrics.py:70-106 compares these classes for agreement).
    """
    F, R = traj.n_frames, traj.n_residues
    out = np.full((F, R), "C", dtype="U1")
    for f in range(F):
        hb = _hbond_matrix(traj.coords[f])
        ss = out[f]

        # Bridges -> E. Antiparallel: hb(i,j) & hb(j,i) or hb(i-1,j+1) & hb(j-1,i+1);
        # parallel: hb(i-1,j) & hb(j,i+1) or hb(j-1,i) & hb(i,j+1).
        is_e = np.zeros(R, bool)
        hbp = np.zeros((R + 2, R + 2), bool)
        hbp[1 : R + 1, 1 : R + 1] = hb
        for i in range(1, R + 1):
            for j in range(i + 3, R + 1):  # |i-j| >= 3 for bridges
                anti = (hbp[i, j] and hbp[j, i]) or (
                    hbp[i - 1, j + 1] and hbp[j - 1, i + 1]
                )
                para = (hbp[i - 1, j] and hbp[j, i + 1]) or (
                    hbp[j - 1, i] and hbp[i, j + 1]
                )
                if anti or para:
                    is_e[i - 1] = True
                    is_e[j - 1] = True

        # n-turns: hb(i+n, i) is an n-turn at i; two consecutive turns ->
        # helix from i+1 to i+n.
        for n in (4, 3, 5):  # H > G > I priority
            turn = np.zeros(R, bool)
            for i in range(R - n):
                if hb[i + n, i]:
                    turn[i] = True
            for i in range(1, R - n):
                if turn[i] and turn[i - 1]:
                    ss[i + 1 : i + n + 1] = "H"

        ss[(is_e) & (ss == "C")] = "E"
    return out


def dssp_match_accuracy(
    ref: BackboneTraj, sample: BackboneTraj, pairs: list[tuple[int, int]]
) -> np.ndarray:
    """Fraction of matched residues with equal 3-class SS per frame
    (metrics.py:70-106)."""
    ri = _indices_for(ref, [p[0] for p in pairs])
    si = _indices_for(sample, [p[1] for p in pairs])
    d_ref = dssp_simplified(ref)[:, ri]
    d_sam = dssp_simplified(sample)[:, si]
    if d_ref.shape[0] == 1 and d_sam.shape[0] > 1:
        d_ref = np.repeat(d_ref, d_sam.shape[0], axis=0)
    return np.mean(d_ref == d_sam, axis=1)


# ------------------------------------------------------------------ #
# LDDT                                                                 #
# ------------------------------------------------------------------ #


def lddt(
    ref: BackboneTraj,
    sample: BackboneTraj,
    pairs: list[tuple[int, int]],
    inclusion_radius: float = 15.0,
    thresholds: tuple[float, ...] = (0.5, 1.0, 2.0, 4.0),
) -> np.ndarray:
    """Backbone LDDT per frame (Mariani et al. 2013; metrics.py:109-187):
    all inter-residue backbone atom pairs of the matched residues whose
    reference distance is within the inclusion radius."""
    ri = _indices_for(ref, [p[0] for p in pairs])
    si = _indices_for(sample, [p[1] for p in pairs])
    n_res = len(ri)
    ref_atoms = ref.coords[0, ri].reshape(-1, 3)  # [n_res*4, 3]
    sam_atoms = sample.coords[:, si].reshape(sample.n_frames, -1, 3)

    # Pairs of atoms not in the same residue.
    atom_res = np.repeat(np.arange(n_res), 4)
    ii, jj = np.triu_indices(n_res * 4, k=1)
    keep = atom_res[ii] != atom_res[jj]
    ii, jj = ii[keep], jj[keep]

    d_ref = np.linalg.norm(ref_atoms[ii] - ref_atoms[jj], axis=-1)
    within = d_ref <= inclusion_radius
    ii, jj, d_ref = ii[within], jj[within], d_ref[within]

    d_sam = np.linalg.norm(sam_atoms[:, ii] - sam_atoms[:, jj], axis=-1)  # [F, P]
    diff = np.abs(d_sam - d_ref[None])
    th = np.asarray(thresholds)
    return (diff[None] < th[:, None, None]).mean(axis=-1).mean(axis=0)


# ------------------------------------------------------------------ #
# Contacts                                                             #
# ------------------------------------------------------------------ #


def _contact_maps(
    ref: BackboneTraj,
    sample: BackboneTraj,
    pairs: list[tuple[int, int]],
    reference_resid_pairs: list[tuple[int, int]] | None = None,
    threshold: float = 8.0,
    exclude_n_neighbours: int = 0,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """CA contact maps over matched residue combinations
    (metrics.py:190-280). Returns (contacts_ref [1|F, P], contacts_sample
    [F, P], resid_pairs [P, 2] in ref resSeq)."""
    resids_i = [p[0] for p in pairs]
    map_ij = dict(pairs)
    combs = [
        (r, l)
        for r, l in combinations(resids_i, 2)
        if abs(r - l) >= exclude_n_neighbours
    ]
    if reference_resid_pairs is not None:
        allowed = set(reference_resid_pairs) | {
            (l, r) for r, l in reference_resid_pairs
        }
        combs = [c for c in combs if c in allowed]
    combs_arr = np.asarray(combs, int)

    ref_map = ref.resseq_to_index()
    sam_map = sample.resseq_to_index()
    ref_idx = np.asarray([[ref_map[r], ref_map[l]] for r, l in combs])
    sam_idx = np.asarray([[sam_map[map_ij[r]], sam_map[map_ij[l]]] for r, l in combs])

    ref_ca = ref.coords[:, :, CA_IN_BACKBONE]
    sam_ca = sample.coords[:, :, CA_IN_BACKBONE]
    d_ref = np.linalg.norm(
        ref_ca[:, ref_idx[:, 0]] - ref_ca[:, ref_idx[:, 1]], axis=-1
    )
    d_sam = np.linalg.norm(
        sam_ca[:, sam_idx[:, 0]] - sam_ca[:, sam_idx[:, 1]], axis=-1
    )
    return (d_ref < threshold).astype(int), (d_sam < threshold).astype(int), combs_arr


def fraction_native_contacts(
    ref: BackboneTraj,
    sample: BackboneTraj,
    pairs: list[tuple[int, int]],
    reference_resid_pairs: list[tuple[int, int]] | None = None,
    threshold: float = 8.0,
    exclude_n_neighbours: int = 0,
) -> np.ndarray:
    """Fraction of the reference's positive contacts matched per frame
    (metrics.py:283-317)."""
    c_ref, c_sam, _ = _contact_maps(
        ref, sample, pairs, reference_resid_pairs, threshold, exclude_n_neighbours
    )
    native = np.where(c_ref[0] == 1)[0]
    return np.mean(c_ref[:, native] == c_sam[:, native], axis=1)


def contact_distances(
    ref: BackboneTraj,
    sample: BackboneTraj,
    pairs: list[tuple[int, int]],
    threshold: float = 8.0,
) -> np.ndarray:
    """Per-residue-averaged mismatched-contact counts (metrics.py:320-356)."""
    c_ref, c_sam, combs = _contact_maps(ref, sample, pairs, threshold=threshold)
    unmatched = np.abs(c_ref - c_sam).astype(np.float64)  # [F, P]
    resids = sorted({int(r) for pair in combs for r in pair})
    rmap = {r: k for k, r in enumerate(resids)}
    # Pair -> residue accumulation as an incidence matmul (BLAS) instead of
    # a python loop over every residue pair.
    P = len(combs)
    inc = np.zeros((P, len(resids)))
    rows = np.arange(P)
    inc[rows, [rmap[int(r)] for r, _ in combs]] += 1.0
    inc[rows, [rmap[int(l)] for _, l in combs]] += 1.0
    per_res = inc.T @ unmatched.T  # [R, F]
    return per_res.mean(axis=0)
