"""Analysis observables: FNC, rigid alignment, h-functions for PPFT targets.

TPU-native counterpart of `bioemu/src/bioemu/observables.py` (and its
near-duplicate `observables_ddr.py`). Design difference for XLA: native
contacts are a dense boolean ``[L, L]`` mask + reference distance matrix
(static shapes, jit-friendly) instead of the reference's dynamic index list
(`observables.py:60-113`) — the masked mean over the full grid equals the
reference's mean over its (symmetrized) contact list.

Units follow the reference: model coordinates in nm, contact geometry in
Angstroms (`observables.py:508-513` multiplies by 10).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from se3diff_tpu.struct.pdb import read_pdb
from se3diff_tpu.struct.residues import ATOM37_CA


@dataclass(frozen=True)
class FNCSettings:
    """Fraction-of-native-contacts settings (observables.py:24-42)."""

    sequence_separation: int = 3
    contact_cutoff: float = 10.0  # Angstrom
    contact_beta: float = 5.0
    contact_delta: float = 0.0
    contact_lambda: float = 1.2


# --------------------------------------------------------------------- #
# Reference loading                                                      #
# --------------------------------------------------------------------- #


@lru_cache(maxsize=16)
def load_ref(structure_file: str) -> np.ndarray:
    """C-alpha coordinates (nm) of a PDB/mmCIF reference (observables.py:417-455)."""
    if str(structure_file).endswith(".cif"):
        from se3diff_tpu.struct.cif import read_cif

        struct = read_cif(str(structure_file))
    elif str(structure_file).endswith(".pdb"):
        struct = read_pdb(str(structure_file))
    else:
        raise ValueError(
            "Unsupported file format. Please provide a .cif or .pdb file."
        )
    ca = struct.atom37[0, :, ATOM37_CA, :]  # Angstrom
    present = struct.mask[:, ATOM37_CA].astype(bool)
    return np.asarray(ca[present], np.float32) / 10.0


# --------------------------------------------------------------------- #
# Native contacts (dense-mask formulation)                               #
# --------------------------------------------------------------------- #


def reference_contact_map(
    ref_coords_ang: np.ndarray,
    sequence_separation: int = FNCSettings.sequence_separation,
    contact_cutoff: float = FNCSettings.contact_cutoff,
) -> tuple[np.ndarray, np.ndarray]:
    """Dense native-contact mask + reference distances (observables.py:60-113).

    Args:
        ref_coords_ang: ``[L, 3]`` reference coordinates in Angstrom.

    Returns:
        ``mask [L, L]`` bool (symmetric, |i-j| > sequence_separation, within
        cutoff) and ``dist [L, L]`` reference distances in Angstrom.
    """
    ref = np.asarray(ref_coords_ang, np.float64)
    dist = np.linalg.norm(ref[:, None] - ref[None, :], axis=-1)
    L = ref.shape[0]
    sep = np.abs(np.arange(L)[:, None] - np.arange(L)[None, :])
    mask = (sep > sequence_separation) & (dist <= contact_cutoff)
    return mask, dist.astype(np.float32)


def contact_score(
    coords_ang: jax.Array,
    ref_dist_ang: jax.Array,
    contact_mask: jax.Array,
    settings: FNCSettings = FNCSettings(),
) -> jax.Array:
    """Soft FNC per sample (observables.py:199-232).

    ``q = mean_c sigmoid(-beta (d_c - lambda (d_ref_c + delta)))`` over the
    contact set; ``coords_ang [B, L, 3]`` -> ``[B]``.
    """
    d = jnp.linalg.norm(
        coords_ang[:, :, None, :] - coords_ang[:, None, :, :] + 1e-12, axis=-1
    )
    q = jax.nn.sigmoid(
        -settings.contact_beta
        * (d - settings.contact_lambda * (ref_dist_ang + settings.contact_delta))
    )
    w = contact_mask.astype(q.dtype)
    return jnp.sum(q * w, axis=(-1, -2)) / jnp.maximum(jnp.sum(w), 1.0)


def get_fnc_from_coords(
    samples_coords_ang: jax.Array,
    reference_coords_ang: np.ndarray,
    settings: FNCSettings = FNCSettings(),
) -> jax.Array:
    """FNC for samples against a reference (observables.py:235-317), assuming
    identical residue ordering (the aligned-map variant lives in the
    benchmark suite)."""
    mask, dist = reference_contact_map(
        reference_coords_ang, settings.sequence_separation, settings.contact_cutoff
    )
    return contact_score(
        samples_coords_ang, jnp.asarray(dist), jnp.asarray(mask), settings
    )


# --------------------------------------------------------------------- #
# Weighted Kabsch alignment                                              #
# --------------------------------------------------------------------- #


def weighted_rigid_align(
    coords: jax.Array,
    ref_coords: jax.Array,
    weights: jax.Array | None = None,
) -> jax.Array:
    """Weighted SVD (Kabsch) alignment of ``coords`` onto ``ref_coords``
    (observables.py:320-415; adapted there from Boltz-1).

    ``coords [B, N, 3]`` or ``[N, 3]``; returns coords rotated into the
    reference frame and translated to the reference centroid.
    """
    batched = coords.ndim > 2
    if not batched:
        coords = coords[None]
        ref_coords = ref_coords[None]
    elif ref_coords.ndim == 2:
        ref_coords = jnp.broadcast_to(ref_coords[None], coords.shape)

    B, N, dim = coords.shape
    if weights is None:
        weights = jnp.ones((B, N), coords.dtype)
    elif weights.ndim == 1:
        weights = jnp.broadcast_to(weights[None], (B, N))
    w = weights[..., None]

    c_centroid = jnp.sum(coords * w, axis=1, keepdims=True) / jnp.sum(
        w, axis=1, keepdims=True
    )
    r_centroid = jnp.sum(ref_coords * w, axis=1, keepdims=True) / jnp.sum(
        w, axis=1, keepdims=True
    )
    cc = coords - c_centroid
    rc = ref_coords - r_centroid

    cov = jnp.einsum("bni,bnj->bij", (w * rc).astype(jnp.float32), cc.astype(jnp.float32))
    U, _, Vt = jnp.linalg.svd(cov)
    rot = jnp.einsum("bij,bkj->bik", U, jnp.swapaxes(Vt, -1, -2))
    det = jnp.linalg.det(rot)
    F = jnp.broadcast_to(jnp.eye(dim, dtype=jnp.float32), (B, dim, dim))
    F = F.at[:, -1, -1].set(det)
    rot = jnp.einsum("bij,bjk,blk->bil", U, F, jnp.swapaxes(Vt, -1, -2))

    aligned = jnp.einsum("bni,bji->bnj", cc, rot.astype(coords.dtype)) + r_centroid
    return aligned[0] if not batched else aligned


# --------------------------------------------------------------------- #
# h* targets and h functions                                             #
# --------------------------------------------------------------------- #


def h_star_from_csv(info_path: str) -> tuple[list[str], np.ndarray]:
    """(sequences, h* [n, 2]) from a mutant-scan CSV (observables.py:457-480).

    ``h*[:, 0] = sigmoid(-f_dg_pred)`` (p_folded, Faure et al. 2022 Fig 2),
    ``h*[:, 1] = sigmoid(-b_dg_pred)`` (p_bound).
    """
    import pandas as pd

    df = pd.read_csv(info_path)
    seqs = list(df["seq"])
    h = np.zeros((len(seqs), 2), np.float32)
    h[:, 0] = 1.0 / (1.0 + np.exp(df["f_dg_pred"].to_numpy(np.float64)))
    h[:, 1] = 1.0 / (1.0 + np.exp(df["b_dg_pred"].to_numpy(np.float64)))
    return seqs, h


h_star_for_grb2_sh3 = h_star_from_csv  # reference name (observables.py:457)

# Hard fold/bind classification thresholds (observables.py:525-541).
PROTEIN_FOLDED_Q_THRESHOLD = 0.7
LOOP_FOLDED_RMSD_NM = 0.2
LOOP_REGION = slice(6, 21)


def compute_h_binary(
    pos_nm: jax.Array,
    ref_path: str,
    settings: FNCSettings = FNCSettings(),
) -> jax.Array:
    """Binary (fold, loop-bound) observables ``[B, 2]``: FNC > 0.7 and
    aligned loop RMSD < 0.2 nm (observables.py:484-541; identical math is
    used for GRB2-SH3 and PSD95-PDZ3, :565-622)."""
    ref_nm = jnp.asarray(load_ref(str(ref_path)))
    fnc = get_fnc_from_coords(pos_nm * 10.0, np.asarray(ref_nm) * 10.0, settings)

    aligned = weighted_rigid_align(pos_nm, ref_nm)
    loop = aligned[:, LOOP_REGION, :]
    loop_rmsd = jnp.sqrt(
        jnp.mean(jnp.sum((loop - ref_nm[LOOP_REGION]) ** 2, axis=-1), axis=-1)
    )
    return jnp.stack(
        [
            (fnc > PROTEIN_FOLDED_Q_THRESHOLD).astype(jnp.float32),
            (loop_rmsd < LOOP_FOLDED_RMSD_NM).astype(jnp.float32),
        ],
        axis=-1,
    )


def compute_h_raw(
    pos_nm: jax.Array,
    ref_path: str,
    settings: FNCSettings = FNCSettings(),
) -> jax.Array:
    """Continuous counterparts of :func:`compute_h_binary` ``[B, 2]``:
    the soft FNC score and the aligned loop RMSD (nm), unthresholded.

    The quantities the thresholds are applied to — useful for histogramming
    the ensembles the way observations_pdz3.ipynb does for PSD95-PDZ3."""
    ref_nm = jnp.asarray(load_ref(str(ref_path)))
    fnc = get_fnc_from_coords(pos_nm * 10.0, np.asarray(ref_nm) * 10.0, settings)
    aligned = weighted_rigid_align(pos_nm, ref_nm)
    loop = aligned[:, LOOP_REGION, :]
    loop_rmsd = jnp.sqrt(
        jnp.mean(jnp.sum((loop - ref_nm[LOOP_REGION]) ** 2, axis=-1), axis=-1)
    )
    return jnp.stack([fnc, loop_rmsd], axis=-1)


def compute_h_for_grb2_sh3(pos, node_orientations, ref_path):
    """Reference-signature wrapper (observables.py:484-541)."""
    del node_orientations
    return compute_h_binary(pos, ref_path)


# GRB2-SH3 binding-interface residues (observables_ddr.py:598).
SH3_INTERFACE_RESIDUES = (6, 8, 11, 12, 15, 31, 33, 34, 36, 45, 47, 49, 50)


def compute_h_for_grb2_sh3_raw(
    pos: jax.Array,
    node_orientations,
    ref_path: str,
    settings: FNCSettings = FNCSettings(),
) -> jax.Array:
    """Continuous (FNC score, interface RMSD) observables ``[B, 2]``
    (observables_ddr.py:554-622, minus its stray debug print): the soft
    contact score unthresholded, and the RMSD of the binding-interface
    residues after aligning ON the interface."""
    del node_orientations
    ref_nm = jnp.asarray(load_ref(str(ref_path)))
    fnc = get_fnc_from_coords(pos * 10.0, np.asarray(ref_nm) * 10.0, settings)

    idx = jnp.asarray(SH3_INTERFACE_RESIDUES)
    aligned = weighted_rigid_align(pos[:, idx], ref_nm[idx])
    rmsd = jnp.sqrt(
        jnp.mean(jnp.sum((aligned - ref_nm[idx]) ** 2, axis=-1), axis=-1)
    )
    return jnp.stack([fnc, rmsd], axis=-1)


def compute_h_for_psd95_pdz3(pos, node_orientations, ref_path):
    """Reference-signature wrapper (observables.py:565-622)."""
    del node_orientations
    return compute_h_binary(pos, ref_path)
