"""Physicality filtering of sampled backbone structures.

Counterpart of the reference filter (`bioemu/src/bioemu/convert_chemgraph.py:296-395`
and the optimized duplicate `bioemu_benchmarks/utils.py:125-296`), without
mdtraj: operates directly on batched atom37 arrays. Criteria (Angstroms):

1. CA(i)-CA(i+1) < 4.5 for all sequential pairs,
2. C(i)-N(i+1) < 2.0 for all sequential pairs,
3. closest-heavy-atom distance between residues more than 2 apart in
   sequence > 1.0 (no clashes).
"""

from __future__ import annotations

import numpy as np

from se3diff_tpu.struct.residues import ATOM37_C, ATOM37_CA, ATOM37_N


def filter_unphysical_masks(
    atom37: np.ndarray,
    mask: np.ndarray,
    max_ca_seq_distance: float = 4.5,
    max_cn_seq_distance: float = 2.0,
    clash_distance: float = 1.0,
    sequence_separation: int = 2,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Per-frame physicality masks.

    Args:
        atom37: ``[M, N, 37, 3]`` coordinates in Angstroms.
        mask: ``[N, 37]`` atom presence.

    Returns:
        Three boolean arrays ``[M]``: ca-distance ok, c-n distance ok,
        no clashes.
    """
    atom37 = np.asarray(atom37)
    mask = np.asarray(mask, bool)
    M, N = atom37.shape[:2]

    ca = atom37[:, :, ATOM37_CA]
    ca_seq = np.linalg.norm(ca[:, 1:] - ca[:, :-1], axis=-1)
    ok_ca = np.all(ca_seq < max_ca_seq_distance, axis=1)

    cn_seq = np.linalg.norm(
        atom37[:, :-1, ATOM37_C] - atom37[:, 1:, ATOM37_N], axis=-1
    )
    ok_cn = np.all(cn_seq < max_cn_seq_distance, axis=1)

    # Clash check: closest heavy-atom distance between residue pairs with
    # |i - j| > sequence_separation.
    flat_mask = mask.reshape(-1)  # [N*37]
    coords = atom37.reshape(M, N * 37, 3)
    res_idx = np.repeat(np.arange(N), 37)

    valid = np.where(flat_mask)[0]
    coords_v = coords[:, valid]  # [M, A, 3]
    res_v = res_idx[valid]  # [A]

    sep = np.abs(res_v[:, None] - res_v[None, :])  # [A, A]
    pair_mask = sep > sequence_separation

    ok_clash = np.ones(M, bool)
    if pair_mask.any():
        # Chunk over frames to bound memory: [A, A] distance matrix per frame.
        for m in range(M):
            d = np.linalg.norm(
                coords_v[m, :, None, :] - coords_v[m, None, :, :], axis=-1
            )
            ok_clash[m] = bool(np.all(d[pair_mask] > clash_distance))
    return ok_ca, ok_cn, ok_clash


def get_physical_frame_indices(
    atom37: np.ndarray,
    mask: np.ndarray,
    max_ca_seq_distance: float = 4.5,
    max_cn_seq_distance: float = 2.0,
    clash_distance: float = 1.0,
    strict: bool = False,
) -> np.ndarray:
    """Indices of frames passing all three criteria
    (convert_chemgraph.py:348-371)."""
    ok_ca, ok_cn, ok_clash = filter_unphysical_masks(
        atom37, mask, max_ca_seq_distance, max_cn_seq_distance, clash_distance
    )
    matches_all = ok_ca & ok_cn & ok_clash
    if strict:
        assert matches_all.sum() > 0, "Ended up with empty trajectory"
    return np.where(matches_all)[0]
