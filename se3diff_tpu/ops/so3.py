"""Rotation algebra on SO(3) as vectorized JAX ops.

Functional equivalents of the reference rotation utilities
(`bioemu/src/bioemu/so3_sde.py:406-911`), re-derived for JAX:

* rotvec <-> rotmat via Rodrigues' formula with Taylor fallbacks near 0,
* log map with the outer-product branch near pi,
* quaternion conversions, geodesics and skew-matrix helpers.

All functions are shape-polymorphic over leading batch dimensions and operate
on trailing ``[..., 3]`` (vectors) / ``[..., 3, 3]`` (matrices) axes. They are
jit/vmap/grad-compatible: every branch is expressed with ``jnp.where`` masks
(no data-dependent Python control flow).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "vector_to_skew_matrix",
    "skew_matrix_to_vector",
    "skew_matrix_exponential_map",
    "rotvec_to_rotmat",
    "angle_from_rotmat",
    "rotmat_to_rotvec",
    "rotquat_to_rotvec",
    "rotquat_to_rotmat",
    "apply_rotvec_to_rotmat",
    "scale_rotmat",
    "rot_transpose",
    "rot_mult",
    "rotmat_to_skew_matrix",
    "skew_matrix_to_rotmat",
    "local_log",
    "geodesic_dist",
    "rot_vf",
    "geodesic_t",
    "random_rotmat",
]


def vector_to_skew_matrix(vectors: jax.Array) -> jax.Array:
    """Map ``[..., 3]`` vectors into the skew-symmetric so(3) basis.

    ``[x, y, z] -> [[0, -z, y], [z, 0, -x], [-y, x, 0]]``
    (reference: so3_sde.py:679-705).
    """
    x, y, z = vectors[..., 0], vectors[..., 1], vectors[..., 2]
    zero = jnp.zeros_like(x)
    rows = jnp.stack(
        [
            jnp.stack([zero, -z, y], axis=-1),
            jnp.stack([z, zero, -x], axis=-1),
            jnp.stack([-y, x, zero], axis=-1),
        ],
        axis=-2,
    )
    return rows


def skew_matrix_to_vector(skew_matrices: jax.Array) -> jax.Array:
    """Extract the so(3) vector from a skew matrix (reference: so3_sde.py:708-722)."""
    return jnp.stack(
        [
            skew_matrices[..., 2, 1],
            skew_matrices[..., 0, 2],
            skew_matrices[..., 1, 0],
        ],
        axis=-1,
    )


def skew_matrix_exponential_map(
    angles: jax.Array, skew_matrices: jax.Array, tol: float = 1e-7
) -> jax.Array:
    """Rodrigues' formula ``exp(K) = I + sin(t)/t K + (1-cos(t))/t^2 K^2``.

    The skew matrix already contains the angle factor; coefficients switch to
    second-order Taylor expansions for ``|angle| < tol`` so the map is smooth
    and differentiable at the identity (reference: so3_sde.py:478-530).
    """
    angles = angles[..., None, None]
    angles_sq = jnp.square(angles)
    # Guard the denominators so that the unselected branch does not produce
    # NaNs (which would otherwise poison gradients through jnp.where).
    safe_angles = jnp.where(jnp.abs(angles) < tol, jnp.ones_like(angles), angles)
    sin_coeff = jnp.sin(safe_angles) / safe_angles
    cos_coeff = (1.0 - jnp.cos(safe_angles)) / jnp.square(safe_angles)
    sin_coeff_small = 1.0 - angles_sq / 6.0
    cos_coeff_small = 0.5 - angles_sq / 24.0

    mask_zero = jnp.abs(angles) < tol
    sin_coeff = jnp.where(mask_zero, sin_coeff_small, sin_coeff)
    cos_coeff = jnp.where(mask_zero, cos_coeff_small, cos_coeff)

    eye = jnp.eye(3, dtype=skew_matrices.dtype)
    skew_sq = jnp.einsum("...ik,...kj->...ij", skew_matrices, skew_matrices)
    return eye + sin_coeff * skew_matrices + cos_coeff * skew_sq


def rotvec_to_rotmat(rotation_vectors: jax.Array, tol: float = 1e-7) -> jax.Array:
    """Exponential map so(3) -> SO(3): ``[..., 3] -> [..., 3, 3]``.

    Unlike the reference (which computes ``|v|`` first, so3_sde.py:533-554),
    the small-angle branch here is written as a polynomial in ``|v|^2`` so the
    gradient is finite at exactly ``v = 0`` (norm has a NaN gradient there).
    """
    sq = jnp.sum(jnp.square(rotation_vectors), axis=-1)[..., None, None]
    skew = vector_to_skew_matrix(rotation_vectors)

    safe_sq = jnp.where(sq < tol**2, jnp.ones_like(sq), sq)
    angles = jnp.sqrt(safe_sq)
    sin_coeff = jnp.sin(angles) / angles
    cos_coeff = (1.0 - jnp.cos(angles)) / safe_sq
    mask_zero = sq < tol**2
    sin_coeff = jnp.where(mask_zero, 1.0 - sq / 6.0, sin_coeff)
    cos_coeff = jnp.where(mask_zero, 0.5 - sq / 24.0, cos_coeff)

    eye = jnp.eye(3, dtype=skew.dtype)
    skew_sq = jnp.einsum("...ik,...kj->...ij", skew, skew)
    return eye + sin_coeff * skew + cos_coeff * skew_sq


def angle_from_rotmat(
    rotation_matrices: jax.Array,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Rotation angle (plus its sin/cos) from rotation matrices via atan2.

    Uses ``|R - R^T|^\\vee = 2 sin(theta)`` and ``tr R = 1 + 2 cos(theta)``
    (reference: so3_sde.py:651-676).
    """
    skew = rotation_matrices - jnp.swapaxes(rotation_matrices, -2, -1)
    skew_vec = skew_matrix_to_vector(skew)
    angles_sin = jnp.linalg.norm(skew_vec, axis=-1) / 2.0
    angles_cos = (jnp.trace(rotation_matrices, axis1=-2, axis2=-1) - 1.0) / 2.0
    angles = jnp.arctan2(angles_sin, angles_cos)
    return angles, angles_sin, angles_cos


def rotmat_to_rotvec(rotation_matrices: jax.Array) -> jax.Array:
    """Log map SO(3) -> so(3) with three numerically-stable branches.

    1. ``theta ~ 0``: Taylor expansion ``1/2 (1 + theta^2/6)^-1 ~`` of the
       ``theta / (2 sin theta)`` prefactor,
    2. generic ``theta``: standard ``theta/(2 sin theta) [R - R^T]^\\vee``,
    3. ``theta ~ pi`` (within 1e-2): outer-product relation
       ``w w^T = (I + R)/2`` with signs recovered from the largest-norm row.

    (reference: so3_sde.py:557-648).
    """
    dtype = rotation_matrices.dtype
    angles, angles_sin, _ = angle_from_rotmat(rotation_matrices)
    vector = skew_matrix_to_vector(
        rotation_matrices - jnp.swapaxes(rotation_matrices, -2, -1)
    )

    # Branch masks (float, like the reference, so overlapping cases blend the
    # same way).
    eps_zero = 1e-8 if dtype == jnp.float64 else 1e-6
    mask_zero = (jnp.abs(angles) < eps_zero).astype(dtype)
    mask_pi = (jnp.abs(angles - np.pi) < 1e-2).astype(dtype)
    mask_else = (1.0 - mask_zero) * (1.0 - mask_pi)

    numerator = mask_zero / 2.0 + angles * mask_else
    # Inverse-of-Taylor-of-sin(x)/x trick for better wide-range accuracy.
    denominator = (
        (1.0 - jnp.square(angles) / 6.0) * mask_zero
        + 2.0 * angles_sin * mask_else
        + mask_pi
    )
    prefactor = numerator / denominator
    vector = vector * prefactor[..., None]

    # pi-branch: recover |w_i| from the diagonal of (I + R)/2, signs from the
    # largest-norm row of the outer product.
    eye = jnp.eye(3, dtype=dtype)
    skew_outer = (eye + rotation_matrices) / 2.0
    diag = jnp.clip(jnp.diagonal(skew_outer, axis1=-2, axis2=-1), min=1e-8)
    vector_pi = jnp.sqrt(diag)

    signs_line_idx = jnp.argmax(jnp.linalg.norm(skew_outer, axis=-1), axis=-1)
    signs_line = jnp.take_along_axis(
        skew_outer, signs_line_idx[..., None, None], axis=-2
    )[..., 0, :]
    signs = jnp.sign(signs_line)

    vector_pi = vector_pi * angles[..., None] * signs
    return vector + vector_pi * mask_pi[..., None]


def _rotquat_to_axis_angle(
    rotation_quaternions: jax.Array, tol: float = 1e-7
) -> tuple[jax.Array, jax.Array]:
    """Angle/axis from unit quaternions in [r, i, j, k] format."""
    axes = rotation_quaternions[..., 1:]
    axes_norms = jnp.linalg.norm(axes, axis=-1)
    angles = 2.0 * jnp.arctan2(axes_norms, rotation_quaternions[..., 0])
    axes = axes / (axes_norms[..., None] + tol)
    return angles, axes


def rotquat_to_rotvec(rotation_quaternions: jax.Array) -> jax.Array:
    """Unit quaternion [r,i,j,k] -> rotation vector (reference: so3_sde.py:751-764)."""
    angles, axes = _rotquat_to_axis_angle(rotation_quaternions)
    return axes * angles[..., None]


def rotquat_to_rotmat(rotation_quaternions: jax.Array) -> jax.Array:
    """Unit quaternion [r,i,j,k] -> rotation matrix (reference: so3_sde.py:767-779)."""
    angles, axes = _rotquat_to_axis_angle(rotation_quaternions)
    skew = vector_to_skew_matrix(axes * angles[..., None])
    return skew_matrix_exponential_map(angles, skew)


def apply_rotvec_to_rotmat(
    rotation_matrices: jax.Array, rotation_vectors: jax.Array, tol: float = 1e-7
) -> jax.Array:
    """Right-compose a rotation-vector increment: ``R <- R exp(v)``.

    This is the SO(3) SDE integrator update (reference: so3_sde.py:782-802).
    """
    rmat_right = rotvec_to_rotmat(rotation_vectors, tol=tol)
    return jnp.einsum("...ij,...jk->...ik", rotation_matrices, rmat_right)


def scale_rotmat(
    rotation_matrix: jax.Array, scalar: jax.Array, tol: float = 1e-7
) -> jax.Array:
    """Scale a rotation by shrinking its rotation-vector length (so3_sde.py:406-425)."""
    return rotvec_to_rotmat(rotmat_to_rotvec(rotation_matrix) * scalar, tol=tol)


def rot_transpose(mat: jax.Array) -> jax.Array:
    """Transpose of the trailing two axes."""
    return jnp.swapaxes(mat, -1, -2)


def rot_mult(mat_1: jax.Array, mat_2: jax.Array) -> jax.Array:
    """Batched 3x3 matrix product."""
    return jnp.einsum("...ij,...jk->...ik", mat_1, mat_2)


def rotmat_to_skew_matrix(mat: jax.Array) -> jax.Array:
    """Log map returning the skew-matrix representation."""
    return vector_to_skew_matrix(rotmat_to_rotvec(mat))


def skew_matrix_to_rotmat(skew: jax.Array) -> jax.Array:
    """Exp map from the skew-matrix representation."""
    return rotvec_to_rotmat(skew_matrix_to_vector(skew))


def local_log(point: jax.Array, base_point: jax.Array) -> jax.Array:
    """Left-invariant log of ``point`` at ``base_point`` (skew matrix)."""
    return rotmat_to_skew_matrix(rot_mult(rot_transpose(base_point), point))


def geodesic_dist(mat_1: jax.Array, mat_2: jax.Array) -> jax.Array:
    """Geodesic distance ``|Log(R1^T R2)|_F`` (reference: so3_sde.py:848-860)."""
    a = rotmat_to_skew_matrix(rot_mult(rot_transpose(mat_1), mat_2))
    return jnp.sqrt(jnp.einsum("...ii->...", rot_mult(a, rot_transpose(a))))


def rot_vf(mat_t: jax.Array, mat_1: jax.Array) -> jax.Array:
    """Vector field ``Log_{mat_t}(mat_1)`` as a rotation vector."""
    return rotmat_to_rotvec(rot_mult(rot_transpose(mat_t), mat_1))


def geodesic_t(t: float | jax.Array, mat: jax.Array, base_mat: jax.Array) -> jax.Array:
    """Geodesic interpolation ``Exp_{base}(t Log_{base}(mat))`` (so3_sde.py:886-911)."""
    vec_vf = rot_vf(base_mat, mat)
    mat_t = rotvec_to_rotmat(t * vec_vf)
    return rot_mult(base_mat, mat_t)


def random_rotmat(key: jax.Array, shape: tuple[int, ...] = ()) -> jax.Array:
    """Haar-uniform random rotation matrices via normalized quaternions."""
    quats = jax.random.normal(key, (*shape, 4))
    quats = quats / jnp.linalg.norm(quats, axis=-1, keepdims=True)
    return rotquat_to_rotmat(quats)
