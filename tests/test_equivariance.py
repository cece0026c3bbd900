"""Equivariance contract of the score model (models.py:177-184):

under a global rotation G of the input pose, the translation score rotates
(equivariant) and the rotation score is invariant.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from se3diff_tpu.models.dig import DiGConditionalScoreModel


@pytest.fixture(scope="module")
def model_and_inputs():
    rng = np.random.default_rng(0)
    kw = dict(num_layers=2, dim_model=16, dim_pair=8, num_heads=2,
              dim_hidden=16, dropout=0.0)
    model = DiGConditionalScoreModel(**kw)
    B, L = 2, 10
    pos = jnp.asarray(rng.standard_normal((B, L, 3)), jnp.float32)
    rots = Rotation.random(B * L, random_state=1).as_matrix().reshape(B, L, 3, 3)
    rot = jnp.asarray(rots, jnp.float32)
    t = jnp.full((B,), 0.4, jnp.float32)
    single = jnp.asarray(rng.standard_normal((B, L, 384)), jnp.float32)
    pair = jnp.asarray(rng.standard_normal((B, L, L, 128)), jnp.float32)
    params = model.init(jax.random.key(0), pos, rot, t, single, pair)
    return model, params, (pos, rot, t, single, pair)


def test_rotation_equivariance(model_and_inputs):
    model, params, (pos, rot, t, single, pair) = model_and_inputs
    G = jnp.asarray(
        Rotation.from_euler("xyz", [0.3, -1.1, 2.0]).as_matrix(), jnp.float32
    )
    pos_g = jnp.einsum("xy,bly->blx", G, pos)
    rot_g = jnp.einsum("xy,blyz->blxz", G, rot)

    T_eps, R_eps = model.apply(params, pos, rot, t, single, pair)
    T_eps_g, R_eps_g = model.apply(params, pos_g, rot_g, t, single, pair)

    # Translation score is equivariant: score(G x) = G score(x).
    np.testing.assert_allclose(
        np.asarray(T_eps_g),
        np.asarray(jnp.einsum("xy,bly->blx", G, T_eps)),
        atol=2e-4,
    )
    # Rotation score (axis-angle) is invariant.
    np.testing.assert_allclose(
        np.asarray(R_eps_g), np.asarray(R_eps), atol=2e-4
    )


def test_translation_invariance(model_and_inputs):
    """DiG scores depend on relative geometry: translating all positions
    shifts nothing (point attention uses frame-relative coordinates)."""
    model, params, (pos, rot, t, single, pair) = model_and_inputs
    shift = jnp.asarray([1.5, -0.7, 2.2], jnp.float32)
    T_eps, R_eps = model.apply(params, pos, rot, t, single, pair)
    T_eps_s, R_eps_s = model.apply(params, pos + shift, rot, t, single, pair)
    np.testing.assert_allclose(np.asarray(T_eps_s), np.asarray(T_eps), atol=2e-4)
    np.testing.assert_allclose(np.asarray(R_eps_s), np.asarray(R_eps), atol=2e-4)
