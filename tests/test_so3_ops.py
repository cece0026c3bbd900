"""Rotation-algebra unit tests against scipy oracles.

Mirrors the reference test taxonomy (bioemu/tests/test_so3_utils.py): every
conversion is checked against scipy.spatial.transform.Rotation, including the
hard branches (angles near 0 and near pi).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from se3diff_tpu.ops import so3


def _random_rotvecs(rng: np.random.Generator, n: int = 64) -> np.ndarray:
    axes = rng.normal(size=(n, 3))
    axes /= np.linalg.norm(axes, axis=-1, keepdims=True)
    angles = rng.uniform(1e-3, np.pi - 1e-3, size=(n, 1))
    return axes * angles


def _edge_rotvecs(rng: np.random.Generator) -> np.ndarray:
    """Rotation vectors at the numerically hard branches."""
    axes = rng.normal(size=(8, 3))
    axes /= np.linalg.norm(axes, axis=-1, keepdims=True)
    small = axes[:4] * np.array([[0.0], [1e-8], [1e-5], [1e-3]])
    near_pi = axes[4:] * np.array([[np.pi], [np.pi - 1e-6], [np.pi - 1e-3], [np.pi - 5e-3]])
    return np.concatenate([small, near_pi])


def _assert_rotation_matrix(r: np.ndarray, atol: float = 1e-5) -> None:
    eye = np.broadcast_to(np.eye(3), r.shape)
    np.testing.assert_allclose(r @ np.swapaxes(r, -1, -2), eye, atol=atol)
    np.testing.assert_allclose(np.linalg.det(r), 1.0, atol=atol)


class TestConversions:
    def test_rotvec_to_rotmat_vs_scipy(self, rng):
        vecs = np.concatenate([_random_rotvecs(rng), _edge_rotvecs(rng)])
        ours = np.asarray(so3.rotvec_to_rotmat(jnp.asarray(vecs, jnp.float64)))
        oracle = Rotation.from_rotvec(vecs).as_matrix()
        np.testing.assert_allclose(ours, oracle, atol=1e-6)
        _assert_rotation_matrix(ours)

    def test_rotmat_to_rotvec_vs_scipy(self, rng):
        vecs = _random_rotvecs(rng)
        mats = Rotation.from_rotvec(vecs).as_matrix()
        ours = np.asarray(so3.rotmat_to_rotvec(jnp.asarray(mats, jnp.float64)))
        np.testing.assert_allclose(ours, vecs, atol=1e-6)

    def test_rotmat_to_rotvec_roundtrip_edges(self, rng):
        vecs = _edge_rotvecs(rng)
        mats = Rotation.from_rotvec(vecs).as_matrix()
        rec = np.array(so3.rotmat_to_rotvec(jnp.asarray(mats, jnp.float64)))
        # Near pi the sign of the vector is only defined up to a global flip at
        # exactly pi; compare rotation matrices instead of vectors.
        rec_mats = Rotation.from_rotvec(rec).as_matrix()
        # The outer-product pi-branch is an O(pi - theta) approximation inside
        # its 1e-2 switching window (same as the reference); allow that error.
        np.testing.assert_allclose(rec_mats, mats, atol=2e-3)

    def test_angle_from_rotmat(self, rng):
        vecs = _random_rotvecs(rng)
        mats = Rotation.from_rotvec(vecs).as_matrix()
        angles, s, c = so3.angle_from_rotmat(jnp.asarray(mats, jnp.float64))
        np.testing.assert_allclose(
            np.asarray(angles), np.linalg.norm(vecs, axis=-1), atol=1e-7
        )
        np.testing.assert_allclose(np.asarray(s), np.sin(angles), atol=1e-7)
        np.testing.assert_allclose(np.asarray(c), np.cos(angles), atol=1e-7)

    def test_quat_conversions_vs_scipy(self, rng):
        quats_xyzw = Rotation.from_rotvec(_random_rotvecs(rng)).as_quat()
        # Our convention is [r, i, j, k]; scipy's is [i, j, k, r].
        quats = np.concatenate([quats_xyzw[:, 3:], quats_xyzw[:, :3]], axis=-1)
        oracle_mat = Rotation.from_quat(quats_xyzw).as_matrix()
        oracle_vec = Rotation.from_quat(quats_xyzw).as_rotvec()
        q = jnp.asarray(quats, jnp.float64)
        np.testing.assert_allclose(np.asarray(so3.rotquat_to_rotmat(q)), oracle_mat, atol=1e-6)
        got_vec = np.array(so3.rotquat_to_rotvec(q))
        got_mats = Rotation.from_rotvec(got_vec).as_matrix()
        np.testing.assert_allclose(got_mats, Rotation.from_rotvec(oracle_vec).as_matrix(), atol=1e-6)

    def test_skew_roundtrip(self, rng):
        vecs = rng.normal(size=(32, 3))
        skew = so3.vector_to_skew_matrix(jnp.asarray(vecs))
        np.testing.assert_allclose(
            np.asarray(so3.skew_matrix_to_vector(skew)), vecs, atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(skew), -np.swapaxes(np.asarray(skew), -1, -2), atol=1e-6
        )


class TestComposition:
    def test_apply_rotvec_to_rotmat(self, rng):
        r0 = Rotation.from_rotvec(_random_rotvecs(rng, 16))
        dv = _random_rotvecs(rng, 16) * 0.1
        ours = so3.apply_rotvec_to_rotmat(
            jnp.asarray(r0.as_matrix(), jnp.float64), jnp.asarray(dv, jnp.float64)
        )
        oracle = (r0 * Rotation.from_rotvec(dv)).as_matrix()
        np.testing.assert_allclose(np.asarray(ours), oracle, atol=1e-6)

    def test_scale_rotmat(self, rng):
        vecs = _random_rotvecs(rng, 16)
        scaled = so3.scale_rotmat(
            jnp.asarray(Rotation.from_rotvec(vecs).as_matrix(), jnp.float64),
            jnp.asarray(0.25),
        )
        oracle = Rotation.from_rotvec(vecs * 0.25).as_matrix()
        np.testing.assert_allclose(np.asarray(scaled), oracle, atol=1e-5)

    def test_geodesic_t_endpoints(self, rng):
        a = Rotation.from_rotvec(_random_rotvecs(rng, 8)).as_matrix()
        b = Rotation.from_rotvec(_random_rotvecs(rng, 8)).as_matrix()
        aj, bj = jnp.asarray(a, jnp.float64), jnp.asarray(b, jnp.float64)
        np.testing.assert_allclose(np.asarray(so3.geodesic_t(0.0, bj, aj)), a, atol=1e-6)
        np.testing.assert_allclose(np.asarray(so3.geodesic_t(1.0, bj, aj)), b, atol=1e-5)

    def test_geodesic_dist(self, rng):
        vecs = _random_rotvecs(rng, 16)
        eye = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float64), (16, 3, 3))
        mats = jnp.asarray(Rotation.from_rotvec(vecs).as_matrix(), jnp.float64)
        d = np.asarray(so3.geodesic_dist(eye, mats))
        # |Log|_F = sqrt(2) * angle for the skew-matrix representation.
        np.testing.assert_allclose(
            d, np.sqrt(2.0) * np.linalg.norm(vecs, axis=-1), atol=1e-5
        )


class TestRandomAndGrad:
    def test_random_rotmat_is_rotation(self):
        r = np.asarray(so3.random_rotmat(jax.random.key(0), (128,)))
        _assert_rotation_matrix(r)

    def test_random_rotmat_uniform_angles(self):
        # Angle density of Haar measure is (1 - cos w)/pi; check the mean.
        r = so3.random_rotmat(jax.random.key(1), (20000,))
        angles = np.asarray(so3.angle_from_rotmat(r)[0])
        # E[w] = pi/2 + 2/pi for the Haar angle distribution.
        assert abs(angles.mean() - (np.pi / 2 + 2 / np.pi)) < 0.02

    def test_exp_map_grad_finite_at_zero(self):
        def f(v):
            return jnp.sum(so3.rotvec_to_rotmat(v))

        g = jax.grad(f)(jnp.zeros(3))
        assert np.all(np.isfinite(np.asarray(g)))

    def test_log_map_grad_finite(self, rng):
        mats = jnp.asarray(
            Rotation.from_rotvec(_random_rotvecs(rng, 4)).as_matrix(), jnp.float32
        )

        def f(m):
            return jnp.sum(jnp.square(so3.rotmat_to_rotvec(m)))

        g = jax.grad(f)(mats)
        assert np.all(np.isfinite(np.asarray(g)))

    @pytest.mark.parametrize("dtype", [jnp.float32, jnp.float64])
    def test_dtype_preserved(self, rng, dtype):
        vecs = jnp.asarray(_random_rotvecs(rng, 4), dtype)
        assert so3.rotvec_to_rotmat(vecs).dtype == dtype
        assert so3.rotmat_to_rotvec(so3.rotvec_to_rotmat(vecs)).dtype == dtype
