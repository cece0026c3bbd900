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


def filter_unphysical_masks_device(
    atom37,
    mask: np.ndarray,
    max_ca_seq_distance: float = 4.5,
    max_cn_seq_distance: float = 2.0,
    clash_distance: float = 1.0,
    sequence_separation: int = 2,
    frame_chunk: int = 32,
):
    """Jitted on-device counterpart of :func:`filter_unphysical_masks`.

    The numpy version's clash check is a python loop allocating an [A, A]
    distance matrix per frame — a multi-second host tail at production
    sample counts. On device the whole check is ~1.6 GFLOP of fused
    pairwise math; frames stream through ``lax.map`` in chunks so the
    [chunk, A, A] intermediate stays small. Returns the combined [M] keep
    mask as a device array. ``mask`` must be a host array (the valid-atom
    gather pattern is built at trace time).
    """
    import jax
    import jax.numpy as jnp

    mask = np.asarray(mask, bool)
    key = (
        mask.tobytes(), max_ca_seq_distance, max_cn_seq_distance,
        clash_distance, sequence_separation, frame_chunk,
    )
    cached = _DEVICE_FILTER_CACHE.get(key)
    if cached is not None:
        return cached(jnp.asarray(atom37))

    N = mask.shape[0]
    valid = np.where(mask.reshape(-1))[0]
    res_v = np.repeat(np.arange(N), 37)[valid]
    sep = np.abs(res_v[:, None] - res_v[None, :])
    pair_mask = jnp.asarray(sep > sequence_separation)

    @jax.jit
    def run(atom37):
        ca = atom37[:, :, ATOM37_CA]
        ok_ca = jnp.all(
            jnp.linalg.norm(ca[:, 1:] - ca[:, :-1], axis=-1)
            < max_ca_seq_distance,
            axis=1,
        )
        ok_cn = jnp.all(
            jnp.linalg.norm(
                atom37[:, :-1, ATOM37_C] - atom37[:, 1:, ATOM37_N], axis=-1
            )
            < max_cn_seq_distance,
            axis=1,
        )
        coords_v = atom37.reshape(atom37.shape[0], N * 37, 3)[:, valid]

        def frame_ok(c):  # [A, 3] -> bool
            d2 = jnp.sum((c[:, None] - c[None, :]) ** 2, axis=-1)
            d2 = jnp.where(pair_mask, d2, jnp.inf)
            return jnp.min(d2) > clash_distance**2

        ok_clash = jax.lax.map(frame_ok, coords_v, batch_size=frame_chunk)
        return ok_ca & ok_cn & ok_clash

    _DEVICE_FILTER_CACHE[key] = run
    return run(jnp.asarray(atom37))


# One jitted filter per (mask, thresholds): the sampling loop calls it once
# per batch and must not retrace each time.
_DEVICE_FILTER_CACHE: dict = {}


def get_physical_frame_indices(
    atom37: np.ndarray,
    mask: np.ndarray,
    max_ca_seq_distance: float = 4.5,
    max_cn_seq_distance: float = 2.0,
    clash_distance: float = 1.0,
    strict: bool = False,
    device: bool = False,
) -> np.ndarray:
    """Indices of frames passing all three criteria
    (convert_chemgraph.py:348-371). ``device=True`` runs the jitted
    accelerator path (same criteria, tested against this numpy oracle)."""
    if device:
        matches_all = np.asarray(
            filter_unphysical_masks_device(
                atom37, mask, max_ca_seq_distance, max_cn_seq_distance,
                clash_distance,
            )
        )
    else:
        ok_ca, ok_cn, ok_clash = filter_unphysical_masks(
            atom37, mask, max_ca_seq_distance, max_cn_seq_distance, clash_distance
        )
        matches_all = ok_ca & ok_cn & ok_clash
    if strict:
        assert matches_all.sum() > 0, "Ended up with empty trajectory"
    return np.where(matches_all)[0]
