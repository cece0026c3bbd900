"""Fused Pallas IPA kernel vs the jnp oracle (interpreter mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from se3diff_tpu.ops.pallas_ipa import fused_ipa_attention, ipa_attention_reference

H, DK, CP = 4, 8, 32
SCALAR_W = 1.0 / np.sqrt(3 * DK)
PAIR_W = 1.0 / np.sqrt(3)


def _inputs(B, L, rng, masked_cols=0):
    def g(*shape, scale=1.0):
        return jnp.asarray(rng.standard_normal(shape) * scale, jnp.float32)

    qs, ks, vs = g(B, L, H * DK), g(B, L, H * DK), g(B, L, H * DK)
    qp, kp = g(B, L, H * 12, scale=2.0), g(B, L, H * 12, scale=2.0)
    vp = g(B, L, H * 24)
    x2d = g(B, L, L, CP, scale=0.5)
    w_pb = g(CP, H, scale=0.3)
    point_w = jnp.asarray(np.abs(rng.standard_normal(H)) * 0.2, jnp.float32)
    bias = jnp.zeros((B, L), jnp.float32)
    if masked_cols:
        bias = bias.at[:, -masked_cols:].set(-1e30)
    return (qs, ks, vs, qp, kp, vp, x2d, w_pb, point_w, bias)


@pytest.mark.parametrize("B,L,ti,tj", [(2, 16, 8, 8), (1, 24, 8, 16), (1, 10, 8, 8)])
def test_fused_matches_reference(rng, B, L, ti, tj):
    args = _inputs(B, L, rng)
    ref = ipa_attention_reference(
        *args, n_head=H, scalar_w=SCALAR_W, pair_w=PAIR_W
    )
    got = fused_ipa_attention(
        *args, n_head=H, scalar_w=SCALAR_W, pair_w=PAIR_W,
        ti=ti, tj=tj, interpret=True,
    )
    for g, r, name in zip(got, ref, ["scalar", "point", "wx2d"]):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(r), atol=2e-5, rtol=2e-5, err_msg=name
        )


def test_fused_respects_mask(rng):
    """Masked key columns must not contribute: result equals the unpadded
    computation on the unmasked prefix."""
    B, L, keep = 1, 16, 12
    args = list(_inputs(B, L, rng, masked_cols=L - keep))
    got = fused_ipa_attention(
        *args, n_head=H, scalar_w=SCALAR_W, pair_w=PAIR_W,
        ti=8, tj=8, interpret=True,
    )
    # Truncate all key-side inputs to the kept prefix.
    t_args = list(_inputs(B, L, rng))  # regenerate is wrong; slice instead
    qs, ks, vs, qp, kp, vp, x2d, w_pb, point_w, bias = args
    ref = ipa_attention_reference(
        qs, ks[:, :keep], vs[:, :keep], qp, kp[:, :keep], vp[:, :keep],
        x2d[:, :, :keep], w_pb, point_w, jnp.zeros((B, keep)),
        n_head=H, scalar_w=SCALAR_W, pair_w=PAIR_W,
    )
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(ref[0]), atol=2e-5)
    np.testing.assert_allclose(np.asarray(got[1]), np.asarray(ref[1]), atol=2e-5)


def test_fused_bf16_inputs(rng):
    B, L = 1, 16
    args = list(_inputs(B, L, rng))
    for i in (0, 1, 2, 6):  # scalar qkv + x2d in bf16 like the bench path
        args[i] = args[i].astype(jnp.bfloat16)
    ref = ipa_attention_reference(
        *args, n_head=H, scalar_w=SCALAR_W, pair_w=PAIR_W
    )
    got = fused_ipa_attention(
        *args, n_head=H, scalar_w=SCALAR_W, pair_w=PAIR_W,
        ti=8, tj=8, interpret=True,
    )
    for g, r in zip(got, ref):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r), atol=3e-2)


def test_model_fused_matches_unfused(rng):
    """Full DiG model with use_pallas=True (interpreter) == jnp path."""
    from se3diff_tpu.models.dig import DiGConditionalScoreModel

    kw = dict(num_layers=2, dim_model=16, dim_pair=8, num_heads=2,
              dim_hidden=16, dropout=0.0)
    B, L = 2, 12
    args = (
        jnp.asarray(rng.standard_normal((B, L, 3)), jnp.float32),
        jnp.broadcast_to(jnp.eye(3), (B, L, 3, 3)),
        jnp.full((B,), 0.3, jnp.float32),
        jnp.asarray(rng.standard_normal((B, L, 384)), jnp.float32),
        jnp.asarray(rng.standard_normal((B, L, L, 128)), jnp.float32),
    )
    m_ref = DiGConditionalScoreModel(**kw)
    m_fused = DiGConditionalScoreModel(use_pallas=True, **kw)
    params = m_ref.init(jax.random.key(0), *args)
    ref = m_ref.apply(params, *args)
    got = m_fused.apply(params, *args)
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(ref[0]), atol=1e-4)
    np.testing.assert_allclose(np.asarray(got[1]), np.asarray(ref[1]), atol=1e-4)
