"""SDE-layer tests: CosineVPSDE contract and SO3SDE sampling/score statistics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.stats import wasserstein_distance

from se3diff_tpu.ops import igso3 as igso3_ops
from se3diff_tpu.ops import so3 as so3_ops
from se3diff_tpu.sde.so3_sde import DiGSO3SDE
from se3diff_tpu.sde.vpsde import CosineVPSDE


@pytest.fixture(scope="module")
def so3sde() -> DiGSO3SDE:
    # Small tables for speed; sigma range matching the default config.
    return DiGSO3SDE(num_sigma=100, num_omega=500, l_max=500, eps_t=0.001)


class TestCosineVPSDE:
    def test_marginal_mean_coeff_limits(self):
        sde = CosineVPSDE()
        t = jnp.asarray([0.0, 1.0])
        coeff = sde._marginal_mean_coeff(t)
        np.testing.assert_allclose(np.asarray(coeff), [1.0, 0.0], atol=1e-6)

    def test_marginal_prob_shapes(self):
        sde = CosineVPSDE()
        x = jnp.ones((4, 10, 3))
        t = jnp.full((4,), 0.5)
        mean, std = sde.marginal_prob(x, t)
        assert mean.shape == x.shape and std.shape == x.shape
        np.testing.assert_allclose(
            np.asarray(mean**2 + std**2), 1.0, atol=1e-6
        )

    def test_sde_drift_relation(self):
        # drift = -1/2 beta x, diffusion = sqrt(beta).
        sde = CosineVPSDE()
        x = jnp.full((2, 5, 3), 2.0)
        t = jnp.full((2,), 0.3)
        drift, diffusion = sde.sde(x, t)
        np.testing.assert_allclose(
            np.asarray(drift), np.asarray(-0.5 * diffusion**2 * x), rtol=1e-5
        )

    def test_beta_is_dlog_alpha(self):
        # beta(t) = -2 d/dt log alpha(t), checked by finite differences.
        sde = CosineVPSDE()
        t = jnp.linspace(0.1, 0.8, 16)
        eps = 1e-4
        log_a = lambda tt: jnp.log(sde._marginal_mean_coeff(tt))
        fd = -(2.0) * (log_a(t + eps) - log_a(t - eps)) / (2 * eps)
        np.testing.assert_allclose(np.asarray(sde.beta(t)), np.asarray(fd), rtol=1e-3)

    def test_sample_marginal_statistics(self):
        sde = CosineVPSDE()
        key = jax.random.key(0)
        x = jnp.full((20000, 1, 1), 3.0)
        t = jnp.full((20000,), 0.5)
        samples = np.asarray(sde.sample_marginal(key, x, t))
        alpha = float(sde._marginal_mean_coeff(jnp.asarray(0.5)))
        assert abs(samples.mean() - 3.0 * alpha) < 0.02
        assert abs(samples.std() - np.sqrt(1 - alpha**2)) < 0.02


class TestDiGSO3SDE:
    def test_schedule(self, so3sde):
        t = jnp.asarray([0.0, 1.0])
        sigma = np.asarray(so3sde._marginal_std(t))
        np.testing.assert_allclose(sigma, [0.02, 1.65], rtol=1e-5)

    def test_prior_is_haar_uniform(self, so3sde):
        r = so3sde.prior_sampling(jax.random.key(0), (4000, 3, 3))
        r_np = np.asarray(r)
        eye = np.broadcast_to(np.eye(3), r_np.shape)
        np.testing.assert_allclose(r_np @ np.swapaxes(r_np, -1, -2), eye, atol=1e-4)
        angles = np.asarray(so3_ops.angle_from_rotmat(r)[0])
        assert abs(angles.mean() - (np.pi / 2 + 2 / np.pi)) < 0.03

    def test_igso3_sample_angle_distribution(self, so3sde):
        # Empirical angle histogram must match the tabulated pdf.
        sigma = jnp.full((40000,), 0.8)
        r = so3sde.sample_igso3(jax.random.key(1), sigma)
        angles = np.asarray(so3_ops.angle_from_rotmat(r)[0])

        omega = jnp.linspace(1e-3, np.pi - 1e-3, 2000)
        l_grid = jnp.arange(501, dtype=jnp.float64)
        pdf = np.asarray(
            igso3_ops.igso3_expansion(omega, jnp.full_like(omega, 0.8), l_grid)
            * igso3_ops.uniform_so3_density(omega)
        )
        # Compare empirical vs analytic samples through Wasserstein distance.
        cdf = np.cumsum(pdf)
        cdf /= cdf[-1]
        analytic_samples = np.interp(
            np.random.default_rng(0).uniform(size=40000), cdf, np.asarray(omega)
        )
        assert wasserstein_distance(angles, analytic_samples) < 0.02

    def test_sample_marginal_composes_mean(self, so3sde):
        # With sigma -> 0 (t ~ 0), sample_marginal returns ~ the mean itself.
        key = jax.random.key(2)
        mean = so3_ops.random_rotmat(jax.random.key(3), (64,))
        t = jnp.full((64,), 0.001)
        out = so3sde.sample_marginal(key, mean, t)
        angles = np.asarray(
            so3_ops.angle_from_rotmat(
                jnp.einsum("...ji,...jk->...ik", mean, out)
            )[0]
        )
        assert angles.max() < 0.15

    def test_score_series_vs_table(self, so3sde):
        # Compare in the bulk of the distribution (|q| ~ sigma(t)); in the far
        # tail both evaluations are dominated by the tol offset and disagree.
        key = jax.random.key(4)
        vecs = jax.random.normal(key, (256, 3), jnp.float32) * 0.5
        t = jnp.full((256,), 1.0, jnp.float32)  # sigma = 1.65
        s_series = np.asarray(so3sde.compute_score(vecs, t, method="series"))
        s_table = np.asarray(so3sde.compute_score(vecs, t, method="table"))
        np.testing.assert_allclose(s_series, s_table, rtol=0.05, atol=0.05)

    def test_score_points_toward_origin(self, so3sde):
        # IGSO(3) score is anti-parallel to the rotation vector (density
        # decreases with angle for moderate sigma).
        vecs = jnp.asarray([[0.5, 0.0, 0.0], [0.0, 1.2, 0.0]])
        t = jnp.full((2,), 0.4)
        score = np.asarray(so3sde.compute_score(vecs, t))
        assert np.all(np.sum(score * np.asarray(vecs), axis=-1) < 0)

    def test_score_scaling_lookup(self, so3sde):
        t = jnp.asarray([0.01, 0.5, 0.99])
        lam = np.asarray(so3sde.get_score_scaling(t))
        sigma = np.asarray(so3sde._marginal_std(t))
        # lambda ~ 1/sigma in the small-sigma regime; decreasing in sigma.
        assert lam[0] > lam[1] > lam[2]
        np.testing.assert_allclose(lam[0], 1.0 / sigma[0], rtol=0.2)

    def test_sampling_jits_and_vmaps(self, so3sde):
        # The table lookups must be jit-compatible with fixed shapes.
        f = jax.jit(lambda k, s: so3sde.sample_igso3(k, s))
        out = f(jax.random.key(0), jnp.full((8, 10), 0.5))
        assert out.shape == (8, 10, 3, 3)
