"""Frames -> backbone atom37 coordinates (vectorized, batched).

TPU-native counterpart of `bioemu/src/bioemu/convert_chemgraph.py:19-293`.
The reference routes backbone reconstruction through the full 8-rigid-group
torsion machinery with psi=0 and then overwrites the oxygen from adjacent
frames anyway; since only group-0 atoms survive that path, this
implementation places N/CA/C/CB directly from the backbone frame
(``global = R @ local + t``) and imputes O identically — same outputs,
one gather + one einsum instead of frame composition over 8 groups.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from se3diff_tpu.struct.residues import (
    ATOM37_C,
    ATOM37_CA,
    ATOM37_CB,
    ATOM37_N,
    ATOM37_O,
    BACKBONE_ATOM_MASK,
    BACKBONE_LOCAL_POSITIONS,
    C_O_BOND_LENGTH,
    sequence_to_aatype,
)

NM_TO_ANG = 10.0


def atom37_mask(aatype) -> np.ndarray:
    """Host-side ``[N, 37]`` atom-existence mask.

    Identical to the mask returned by :func:`atom37_from_frames` but computed
    in numpy from ``aatype`` alone, so pipelines can build filter/topology
    plumbing without waiting on any device work.
    """
    aatype = np.asarray(aatype)
    local_mask = np.asarray(BACKBONE_ATOM_MASK)[aatype]
    mask = np.zeros((len(aatype), 37), bool)
    mask[:, [ATOM37_N, ATOM37_CA, ATOM37_C, ATOM37_O]] = True
    mask[:, ATOM37_CB] = local_mask[:, 3] > 0
    return mask


def atom37_from_frames(
    pos: jax.Array, rot: jax.Array, aatype: jax.Array
) -> tuple[jax.Array, jax.Array]:
    """Place idealized backbone atoms from rigid frames.

    Args:
        pos: ``[..., N, 3]`` frame translations in nm (model convention).
        rot: ``[..., N, 3, 3]`` frame rotations.
        aatype: ``[N]`` restype indices.

    Returns:
        ``atom37 [..., N, 37, 3]`` in Angstroms (N/CA/C/CB/O filled) and
        ``mask [N, 37]`` (O marked present; CB absent for GLY).
    """
    local = jnp.asarray(BACKBONE_LOCAL_POSITIONS)[aatype]  # [N, 4, 3]
    local_mask = jnp.asarray(BACKBONE_ATOM_MASK)[aatype]  # [N, 4]

    global_pos = (
        jnp.einsum("...nij,naj->...nai", rot, local)
        + pos[..., :, None, :] * NM_TO_ANG
    )
    global_pos = global_pos * local_mask[..., None]

    n_res = aatype.shape[0]
    atom37 = jnp.zeros((*global_pos.shape[:-2], 37, 3), global_pos.dtype)
    # local ordering is (N, CA, C, CB) -> atom37 slots 0, 1, 2, 3.
    atom37 = atom37.at[..., ATOM37_N, :].set(global_pos[..., 0, :])
    atom37 = atom37.at[..., ATOM37_CA, :].set(global_pos[..., 1, :])
    atom37 = atom37.at[..., ATOM37_C, :].set(global_pos[..., 2, :])
    atom37 = atom37.at[..., ATOM37_CB, :].set(global_pos[..., 3, :])
    atom37 = adjust_oxygen_pos(atom37)

    mask = jnp.zeros((n_res, 37), bool)
    mask = mask.at[:, jnp.array([ATOM37_N, ATOM37_CA, ATOM37_C, ATOM37_O])].set(True)
    mask = mask.at[:, ATOM37_CB].set(local_mask[:, 3] > 0)
    return atom37, mask


def frames_from_backbone(
    n: np.ndarray, ca: np.ndarray, c: np.ndarray, tol: float = 1e-8
) -> tuple[np.ndarray, np.ndarray]:
    """Rigid frames from global backbone atoms — the inverse of
    :func:`atom37_from_frames`.

    Gram-Schmidt with CA at the origin, C on the +x axis and N in the
    xy-plane: the openfold ``Rigid.from_3_points`` convention the reference
    builds its backbone rigids with (convert_chemgraph.py:12 via
    openfold rigid_utils), and the convention of
    ``BACKBONE_LOCAL_POSITIONS`` (residues.py:48), so
    ``atom37_from_frames(*frames_from_backbone(n, ca, c))`` reproduces
    idealized backbones exactly and real (non-ideal) backbones up to the
    idealized-geometry residual.

    Host-side numpy (data pipelines); any leading batch shape.

    Args:
        n, ca, c: ``[..., 3]`` global atom positions in Angstroms.

    Returns:
        ``pos [..., 3]`` frame translations in nm (model convention) and
        ``rot [..., 3, 3]`` rotations, with ``global = R @ local + t``.
    """
    n = np.asarray(n, np.float64)
    ca = np.asarray(ca, np.float64)
    c = np.asarray(c, np.float64)

    def unit(v):
        return v / (np.linalg.norm(v, axis=-1, keepdims=True) + tol)

    e1 = unit(c - ca)
    u = n - ca
    e2 = unit(u - np.sum(u * e1, axis=-1, keepdims=True) * e1)
    e3 = np.cross(e1, e2)
    rot = np.stack([e1, e2, e3], axis=-1)  # columns = image of x, y, z
    return (ca / NM_TO_ANG).astype(np.float32), rot.astype(np.float32)


def frames_from_atom37(atom37: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """:func:`frames_from_backbone` on ``[..., N, 37, 3]`` atom37 arrays."""
    atom37 = np.asarray(atom37)
    return frames_from_backbone(
        atom37[..., ATOM37_N, :],
        atom37[..., ATOM37_CA, :],
        atom37[..., ATOM37_C, :],
    )


def adjust_oxygen_pos(atom37: jax.Array, tol: float = 1e-7) -> jax.Array:
    """Impute carbonyl O from adjacent frames (convert_chemgraph.py:214-293).

    Interior residues: O lies in the CA/C/N(next) plane, along the bisector
    of CA->C and N(next)->C, 1.23 A from C. The terminal residue uses the
    bisector of CA->C and CA->N of its own frame.

    Accepts ``[..., N, 37, 3]`` (batched over leading axes).
    """
    ca, c, n = atom37[..., 1, :], atom37[..., 2, :], atom37[..., 0, :]

    def unit(v):
        return v / (jnp.linalg.norm(v, axis=-1, keepdims=True) + tol)

    # Interior: current C, CA and next residue's N.
    calpha_to_c = unit(c[..., :-1, :] - ca[..., :-1, :])
    nnext_to_c = unit(c[..., :-1, :] - n[..., 1:, :])
    o_dir_interior = unit(calpha_to_c + nnext_to_c)
    o_interior = c[..., :-1, :] + o_dir_interior * C_O_BOND_LENGTH

    # Terminal fallback for the last residue.
    calpha_to_c_t = unit(c[..., -1:, :] - ca[..., -1:, :])
    calpha_to_n_t = unit(n[..., -1:, :] - ca[..., -1:, :])
    o_dir_term = unit(calpha_to_c_t + calpha_to_n_t)
    o_term = c[..., -1:, :] + o_dir_term * C_O_BOND_LENGTH

    o_all = jnp.concatenate([o_interior, o_term], axis=-2)
    return atom37.at[..., 4, :].set(o_all)


def get_atom37_from_frames(
    pos: jax.Array, rot: jax.Array, sequence: str
) -> tuple[jax.Array, jax.Array, np.ndarray]:
    """Reference-signature wrapper (convert_chemgraph.py:139-185).

    ``pos [N, 3]`` nm, ``rot [N, 3, 3]``, returns ``(atom37 [N, 37, 3]`` in
    Angstroms, ``mask [N, 37]``, ``aatype [N])``.
    """
    aatype = sequence_to_aatype(sequence)
    atom37, mask = atom37_from_frames(pos, rot, jnp.asarray(aatype))
    return atom37, mask, aatype
