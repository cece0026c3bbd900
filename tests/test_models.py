"""Score-network tests: shapes, SE(3) equivariance contract, masking.

The equivariance test enforces the documented contract (reference
models.py:177-184): under a global rotation R of the input frames the
translation score rotates (T_out' = R T_out) and the rotation score is
invariant; under a global translation both are invariant.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from se3diff_tpu.models.dig import DiGConditionalScoreModel, count_params
from se3diff_tpu.ops import so3 as so3_ops

B, L = 2, 10


@pytest.fixture(scope="module")
def model_and_params():
    model = DiGConditionalScoreModel(
        dim_model=64, dim_pair=32, num_layers=2, num_heads=4, dim_hidden=128
    )
    key = jax.random.key(0)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    pos = jax.random.normal(k1, (B, L, 3), jnp.float32)
    rot = so3_ops.random_rotmat(k2, (B, L)).astype(jnp.float32)
    t = jnp.full((B,), 0.5, jnp.float32)
    single = jax.random.normal(k3, (B, L, 384), jnp.float32) * 0.5
    pair = jax.random.normal(k4, (B, L, L, 128), jnp.float32) * 0.2
    params = model.init(jax.random.key(1), pos, rot, t, single, pair)
    return model, params, (pos, rot, t, single, pair)


class TestDiGModel:
    def test_forward_shapes_finite(self, model_and_params):
        model, params, (pos, rot, t, single, pair) = model_and_params
        pos_out, rot_out = model.apply(params, pos, rot, t, single, pair)
        assert pos_out.shape == (B, L, 3)
        assert rot_out.shape == (B, L, 3)
        assert np.all(np.isfinite(np.asarray(pos_out)))
        assert np.all(np.isfinite(np.asarray(rot_out)))

    def test_param_count_matches_reference_formula(self, model_and_params):
        model, params, _ = model_and_params
        d, p, h, ff, nl = 64, 32, 4, 128, 2
        # Per-layer: 2 LN (2d each) + IPA + FFN.
        ipa = (
            3 * d * d  # scalar qkv
            + p * h  # pair_bias
            + d * h * 12 + d * h * 12 + d * h * 24  # point q/k/v
            + h  # trained_point_weight
            + p * d  # pair_value
            + (2 * d + 32 * h) * d + d  # fc_out
        )
        ffn = d * ff + ff + ff * d + d
        layer = 2 * 2 * d + ipa + ffn
        # Projections + heads + rel-pos embedding.
        x1d = 2 * 384 + 384 * d
        x2d = 2 * 128 + 128 * p
        rp = 64 * p
        head = 2 * (2 * d + d * d + d + d * 3 + 3)
        expected = nl * layer + x1d + x2d + rp + head
        assert count_params(params) == expected

    def test_rotation_equivariance(self, model_and_params):
        model, params, (pos, rot, t, single, pair) = model_and_params
        R = so3_ops.random_rotmat(jax.random.key(5), ()).astype(jnp.float32)

        pos_out, rot_out = model.apply(params, pos, rot, t, single, pair)
        pos_r = jnp.einsum("xy,bly->blx", R, pos)
        rot_r = jnp.einsum("xy,blyz->blxz", R, rot)
        pos_out_r, rot_out_r = model.apply(params, pos_r, rot_r, t, single, pair)

        np.testing.assert_allclose(
            np.asarray(pos_out_r),
            np.asarray(jnp.einsum("xy,bly->blx", R, pos_out)),
            atol=2e-4,
        )
        np.testing.assert_allclose(
            np.asarray(rot_out_r), np.asarray(rot_out), atol=2e-4
        )

    def test_translation_invariance(self, model_and_params):
        model, params, (pos, rot, t, single, pair) = model_and_params
        shift = jnp.asarray([1.0, -2.0, 0.5], jnp.float32)
        pos_out, rot_out = model.apply(params, pos, rot, t, single, pair)
        pos_out_s, rot_out_s = model.apply(params, pos + shift, rot, t, single, pair)
        np.testing.assert_allclose(np.asarray(pos_out_s), np.asarray(pos_out), atol=2e-4)
        np.testing.assert_allclose(np.asarray(rot_out_s), np.asarray(rot_out), atol=2e-4)

    def test_mask_blocks_padded_residues(self, model_and_params):
        model, params, (pos, rot, t, single, pair) = model_and_params
        mask = jnp.ones((B, L), bool).at[:, L // 2 :].set(False)
        out1 = model.apply(params, pos, rot, t, single, pair, mask)
        # Perturb the masked region only; valid outputs must not change.
        pos2 = pos.at[:, L // 2 :].add(5.0)
        single2 = single.at[:, L // 2 :].add(1.0)
        out2 = model.apply(params, pos2, rot, t, single2, pair, mask)
        np.testing.assert_allclose(
            np.asarray(out1[0][:, : L // 2]),
            np.asarray(out2[0][:, : L // 2]),
            atol=1e-5,
        )

    def test_time_changes_output(self, model_and_params):
        model, params, (pos, rot, t, single, pair) = model_and_params
        out1, _ = model.apply(params, pos, rot, t, single, pair)
        out2, _ = model.apply(params, pos, rot, t * 0.1, single, pair)
        assert np.abs(np.asarray(out1 - out2)).max() > 1e-4

    def test_jit_and_grad(self, model_and_params):
        model, params, (pos, rot, t, single, pair) = model_and_params

        @jax.jit
        def loss(p):
            pos_out, rot_out = model.apply(p, pos, rot, t, single, pair)
            return jnp.sum(pos_out**2) + jnp.sum(rot_out**2)

        g = jax.grad(loss)(params)
        leaves = jax.tree.leaves(g)
        assert all(np.all(np.isfinite(np.asarray(x))) for x in leaves)

    def test_conditioning_cache_path_matches_call(self, model_and_params):
        """embed_conditioning + score_from_cache == the one-shot __call__.

        The cache path is what the denoising loop uses to hoist the
        t-invariant pair stack out of the scan; it must be numerically
        identical to the reference-parity forward."""
        model, params, (pos, rot, t, single, pair) = model_and_params
        ref_pos, ref_rot = model.apply(params, pos, rot, t, single, pair)
        cache = model.apply(params, single, pair, method="embed_conditioning")
        got_pos, got_rot = model.apply(
            params, pos, rot, t, cache, method="score_from_cache"
        )
        np.testing.assert_array_equal(np.asarray(ref_pos), np.asarray(got_pos))
        np.testing.assert_array_equal(np.asarray(ref_rot), np.asarray(got_rot))

    def test_conditioning_cache_with_mask(self, model_and_params):
        model, params, (pos, rot, t, single, pair) = model_and_params
        mask = jnp.ones((B, L), bool).at[:, L - 3 :].set(False)
        ref = model.apply(params, pos, rot, t, single, pair, mask)
        cache = model.apply(params, single, pair, mask, method="embed_conditioning")
        got = model.apply(params, pos, rot, t, cache, method="score_from_cache")
        np.testing.assert_array_equal(np.asarray(ref[0]), np.asarray(got[0]))
        np.testing.assert_array_equal(np.asarray(ref[1]), np.asarray(got[1]))
