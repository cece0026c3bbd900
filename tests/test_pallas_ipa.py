"""Fused Pallas IPA kernel vs the jnp oracle (interpreter mode on CPU).

The kernel takes pre-padded head-major operands (see ops/pallas_ipa.py's
layout contract); `_to_kernel_layout` performs the same transformation the
model does, so these tests cover both the kernel math and the layout
plumbing.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from se3diff_tpu.ops.pallas_ipa import (
    NEG_INF,
    fused_ipa_attention,
    ipa_attention_reference,
    pad_axis,
)

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
    w_pv = g(CP, H * DK, scale=0.3)
    point_w = jnp.asarray(np.abs(rng.standard_normal(H)) * 0.2, jnp.float32)
    bias = jnp.zeros((B, L), jnp.float32)
    if masked_cols:
        bias = bias.at[:, -masked_cols:].set(NEG_INF)
    return (qs, ks, vs, qp, kp, vp, x2d, w_pb, w_pv, point_w, bias)


def _to_kernel_layout(args, Lp):
    """Flat [B, L, H*c] inputs -> the kernel's padded head-major contract
    (mirrors the SAAttention pallas branch)."""
    qs, ks, vs, qp, kp, vp, x2d, w_pb, w_pv, point_w, bias = args
    B, L = qs.shape[:2]

    def hm(x, c):
        x = pad_axis(x, 1, Lp)
        return jnp.transpose(x.reshape(B, Lp, H, c), (0, 2, 1, 3))

    def planes(p):
        p = pad_axis(p, 1, Lp)
        p = jnp.transpose(p.reshape(B, Lp, H * 4, 3), (0, 3, 2, 1))
        return p * jnp.repeat(point_w, 4)[None, None, :, None]

    return (
        hm(qs, DK), hm(ks, DK), hm(vs, DK),
        planes(qp), planes(kp), hm(vp, 24),
        pad_axis(pad_axis(x2d, 1, Lp), 2, Lp),
        w_pb,
        jnp.transpose(w_pv.reshape(CP, H, DK), (1, 0, 2)),
        pad_axis(bias, 1, Lp, value=NEG_INF),
    )


def _to_kernel_layout_rect(args, Lq, Lk):
    """Rectangular variant: q-side rows pad to Lq, k/v-side columns to Lk
    (mirrors the model's ROW_PAD contract: rows 64-aligned, columns 128)."""
    qs, ks, vs, qp, kp, vp, x2d, w_pb, w_pv, point_w, bias = args
    B, L = qs.shape[:2]

    def hm(x, c, Lp):
        x = pad_axis(x, 1, Lp)
        return jnp.transpose(x.reshape(B, Lp, H, c), (0, 2, 1, 3))

    def planes(p, Lp):
        p = pad_axis(p, 1, Lp)
        p = jnp.transpose(p.reshape(B, Lp, H * 4, 3), (0, 3, 2, 1))
        return p * jnp.repeat(point_w, 4)[None, None, :, None]

    return (
        hm(qs, DK, Lq), hm(ks, DK, Lk), hm(vs, DK, Lk),
        planes(qp, Lq), planes(kp, Lk), hm(vp, 24, Lk),
        pad_axis(pad_axis(x2d, 1, Lq), 2, Lk),
        w_pb,
        jnp.transpose(w_pv.reshape(CP, H, DK), (1, 0, 2)),
        pad_axis(bias, 1, Lk, value=NEG_INF),
    )


def _reference(args):
    """Oracle outputs in flat layout, pair-value projection applied."""
    qs, ks, vs, qp, kp, vp, x2d, w_pb, w_pv, point_w, bias = args
    out_s, out_p, wx2d = ipa_attention_reference(
        qs, ks, vs, qp, kp, vp, x2d, w_pb, point_w, bias,
        n_head=H, scalar_w=SCALAR_W, pair_w=PAIR_W,
    )
    out_pair = jnp.einsum(
        "bihp,phc->bihc", wx2d, w_pv.reshape(CP, H, DK)
    )
    return out_s, out_p, out_pair


def _run_fused(args, Lp, ti, tj):
    kargs = _to_kernel_layout(args, Lp)
    os_hm, op_hm, opr = fused_ipa_attention(
        *kargs, scalar_w=SCALAR_W, pair_w=PAIR_W, ti=ti, tj=tj, interpret=True
    )
    B, L = args[0].shape[:2]
    back = lambda x: jnp.transpose(x, (0, 2, 1, 3)).reshape(B, Lp, -1)[:, :L]
    return back(os_hm), back(op_hm), back(opr)


@pytest.mark.parametrize("B,L,Lp,ti,tj", [
    (2, 16, 16, 8, 8),    # exact fit, multiple tiles
    (1, 24, 32, 8, 16),   # rectangular tiles + padded rows/cols
    (1, 10, 16, 8, 8),    # ragged L
])
def test_fused_matches_reference(rng, B, L, Lp, ti, tj):
    args = _inputs(B, L, rng)
    ref = _reference(args)
    got = _run_fused(args, Lp, ti, tj)
    for g, r, name in zip(got, ref, ["scalar", "point", "pair"]):
        r = np.asarray(r).reshape(np.asarray(g).shape)
        np.testing.assert_allclose(
            np.asarray(g), r, atol=2e-5, rtol=2e-5, err_msg=name
        )


def test_fused_respects_mask(rng):
    """Masked key columns must not contribute: result equals the unpadded
    computation on the unmasked prefix."""
    B, L, keep = 1, 16, 12
    args = list(_inputs(B, L, rng, masked_cols=L - keep))
    got = _run_fused(args, 16, 8, 8)
    qs, ks, vs, qp, kp, vp, x2d, w_pb, w_pv, point_w, bias = args
    trunc = (qs, ks[:, :keep], vs[:, :keep], qp, kp[:, :keep], vp[:, :keep],
             x2d[:, :, :keep], w_pb, w_pv, point_w, jnp.zeros((B, keep)))
    ref = _reference(trunc)
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(ref[0]), atol=2e-5)
    np.testing.assert_allclose(np.asarray(got[1]), np.asarray(ref[1]), atol=2e-5)


def test_fused_bf16_inputs(rng):
    B, L = 1, 16
    args = list(_inputs(B, L, rng))
    for i in (0, 1, 2, 6, 8):  # scalar qkv + x2d + w_pv in bf16 (bench path)
        args[i] = args[i].astype(jnp.bfloat16)
    ref = _reference(args)
    got = _run_fused(args, 16, 8, 8)
    for g, r in zip(got, ref):
        r = np.asarray(r, np.float32).reshape(np.asarray(g).shape)
        np.testing.assert_allclose(
            np.asarray(g, np.float32), r, atol=3e-2
        )


def test_fused_streamed_pair_bias_matches_in_kernel(rng):
    """Streaming the precomputed pair bias (pa input) must match the
    in-kernel x2d @ w_pb computation bit-for-bit in f32."""
    B, L, Lp = 1, 16, 16
    args = _inputs(B, L, rng)
    kargs = _to_kernel_layout(args, Lp)
    x2d, w_pb = kargs[6], kargs[7]
    pa = jnp.einsum("bijp,ph->bhij", x2d, w_pb.astype(x2d.dtype))
    base = fused_ipa_attention(
        *kargs, scalar_w=SCALAR_W, pair_w=PAIR_W, ti=8, tj=8, interpret=True
    )
    got = fused_ipa_attention(
        *kargs, pa, scalar_w=SCALAR_W, pair_w=PAIR_W, ti=8, tj=8,
        interpret=True,
    )
    for g, b, name in zip(got, base, ["scalar", "point", "pair"]):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(b), atol=1e-6, err_msg=name
        )


def test_resolve_use_pallas_auto():
    """"auto" dispatches on the measured-anchor throughput model: the fused
    kernel is charged for its PADDED shape, so it must lose not only below
    the short-L crossover but also in the padding-waste dead zones just past
    each 128-column boundary (L=300 pads to 384x384: measured ratio 0.76 —
    the flat round-2 `L >= 256` rule silently picked the 24% slower path)."""
    from se3diff_tpu.ops.pallas_ipa import (
        predicted_fused_advantage, resolve_use_pallas,
    )

    assert resolve_use_pallas(True, 8) is True
    assert resolve_use_pallas(False, 10_000) is False
    on_tpu = jax.default_backend() == "tpu"
    # Measured anchors reproduce exactly (both curves pass through them).
    assert predicted_fused_advantage(256) == pytest.approx(42_100 / 33_700)
    assert predicted_fused_advantage(192) == pytest.approx(58_550 / 56_099)
    assert predicted_fused_advantage(384) == pytest.approx(21_723 / 13_643)
    for L, wins in [
        # Below the smallest anchors the model must NOT extrapolate: the
        # fused curve's first segment is much steeper than XLA's, and
        # backward power-law extension once predicted fused wins at L<=64
        # (inverting every short-L measurement). Flat-clamped, XLA wins.
        (8, False), (32, False), (56, False), (64, False),
        (100, False), (128, False), (150, False),   # short-L: XLA
        (192, True),    # full-column 192x192 window (measured +4%)
        (200, False),                                # 256-pad dead zone
        (256, True),                                 # next winning band
        (300, False), (320, False),                  # 384-pad dead zone
        (384, True),
        (400, True),    # old 512-pad dead zone: gone once XLA's measured
                        # L=384 anchor (13.6k) replaced the interpolation
        (512, True), (1024, True), (2048, True), (4096, True),
    ]:
        assert predicted_fused_advantage(L) > 1.0 if wins else \
            predicted_fused_advantage(L) < 1.0, L
        assert resolve_use_pallas("auto", L) is (wins and on_tpu), L

    # Above the largest anchor the ratio floors at the last measured anchor
    # ratio (~1.82 at L=2048): raw end-segment extrapolation decays and
    # would silently flip "auto" to XLA near L~16k, exactly where the fused
    # kernel's O(L^2) HBM savings matter most.
    anchor_ratio = 1_178 / 647
    for L in (4096, 8192, 16_384, 32_768):
        assert predicted_fused_advantage(L) >= anchor_ratio * (1 - 1e-9), L
        assert resolve_use_pallas("auto", L) is on_tpu, L


def test_dispatch_occupancy_correction():
    """The anchors sit on the B*L ~= 2048 bench schedule; below it the
    kernel's grid is too small to pipeline and "auto" must fall back to
    XLA. Round-4 dispatch-stress cells (dpm-30, L=256, v5e —
    bench_r4_queue.json): B=1 fused/XLA = 0.667 (the uncorrected model
    said 1.25 — a silent 33% regression); B=16 = 1.49."""
    from se3diff_tpu.ops.pallas_ipa import (
        predicted_fused_advantage, resolve_use_pallas,
    )

    on_tpu = jax.default_backend() == "tpu"
    # batch=None keeps the anchor-occupancy behavior bit-for-bit.
    assert predicted_fused_advantage(256) == pytest.approx(42_100 / 33_700)
    # The measured B=1 cell: corrected prediction within 2% of 0.667, and
    # "auto" picks XLA.
    assert predicted_fused_advantage(256, batch=1) == pytest.approx(
        0.667, rel=0.02
    )
    assert resolve_use_pallas("auto", 256, batch=1) is False
    # At and above the anchor occupancy the correction is exactly 1 (never
    # a boost): B=8 reproduces the anchor ratio; B=16 too.
    assert predicted_fused_advantage(256, batch=8) == pytest.approx(
        42_100 / 33_700
    )
    assert predicted_fused_advantage(256, batch=16) == pytest.approx(
        42_100 / 33_700
    )
    assert resolve_use_pallas("auto", 256, batch=16) is on_tpu
    # The L=2048 anchor WAS measured at B=1 (occ = 2048): no correction.
    assert predicted_fused_advantage(2048, batch=1) == pytest.approx(
        1_178 / 647
    )
    # Monotone in batch, flat-clamped below the measured occupancy floor.
    assert predicted_fused_advantage(512, batch=1) <= predicted_fused_advantage(
        512, batch=2
    )
    assert predicted_fused_advantage(200, batch=1) == predicted_fused_advantage(
        200, batch=256 // 200
    )


def test_train_kernel_dispatch():
    """Train-path "auto": XLA below the measured ~L=146 crossover,
    fused+chunked above, flat-clamped outside the anchors (anchors:
    fused-chunked/XLA = 0.920 at L=100, 1.063 at 192, 1.030 at 256, 1.108
    at 384 — v5e cells, docs/artifacts/bench_r4_queue.json +
    bench_r5_fixes.json)."""
    from se3diff_tpu.ops.pallas_ipa import (
        predicted_train_fused_advantage,
        resolve_train_kernel,
        resolve_use_pallas,
    )

    assert predicted_train_fused_advantage(100) == pytest.approx(0.920, abs=0.001)
    assert predicted_train_fused_advantage(192) == pytest.approx(1.063, abs=0.001)
    assert predicted_train_fused_advantage(256) == pytest.approx(1.030, abs=0.001)
    assert predicted_train_fused_advantage(384) == pytest.approx(1.108, abs=0.001)
    # Flat clamps outside the anchors — no backward/forward extrapolation.
    assert predicted_train_fused_advantage(24) == predicted_train_fused_advantage(100)
    assert predicted_train_fused_advantage(2048) == predicted_train_fused_advantage(384)
    # Measured-table crossover sits near L=146.
    assert predicted_train_fused_advantage(140) < 1.0
    assert predicted_train_fused_advantage(152) > 1.0

    on_tpu = jax.default_backend() == "tpu"
    assert resolve_use_pallas("train_auto", 100) is False
    assert resolve_use_pallas("train_auto", 192) is on_tpu
    assert resolve_use_pallas("train_auto", 256) is on_tpu

    assert resolve_train_kernel("auto") == {
        "use_pallas": "train_auto", "fused_backward": "chunked",
    }
    assert resolve_train_kernel("xla") == {"use_pallas": False}
    assert resolve_train_kernel("fused") == {
        "use_pallas": True, "fused_backward": "chunked",
    }
    with pytest.raises(ValueError):
        resolve_train_kernel("mosaic")


def test_dispatch_charges_sharded_row_padding():
    """Under sequence parallelism rows pad differently (L=385 on 8 shards
    runs 448 rows, not 512; L=300 runs 320, not 384), so the dispatch model
    must charge the kernel for the shape it will actually run."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from se3diff_tpu.ops.pallas_ipa import (
        col_padded_len, predicted_fused_advantage, row_padded_len,
    )

    mesh = Mesh(np.array(jax.devices()[:8]).reshape(8), ("model",))
    sh = NamedSharding(mesh, P(None, "model", None, None))
    for L in (300, 385):
        assert row_padded_len(L, sh) < row_padded_len(L), L
        # Less padded work -> the sharded prediction is strictly more
        # favorable to the fused kernel than the single-chip one.
        assert predicted_fused_advantage(L, sh) > predicted_fused_advantage(L), L
    # Effective shape check: the prediction equals the single-chip model
    # evaluated at the sharded padded geometry.
    import math

    from se3diff_tpu.ops.pallas_ipa import _FUSED_MEAS, _XLA_MEAS, _loglog_interp

    L = 385
    eff = math.sqrt(row_padded_len(L, sh) * col_padded_len(L))
    expect = _loglog_interp(_FUSED_MEAS, eff) / _loglog_interp(_XLA_MEAS, L)
    assert predicted_fused_advantage(L, sh) == pytest.approx(expect)


def test_model_auto_matches_unfused(rng):
    """use_pallas="auto" must produce identical results to the XLA path at
    short L on any backend (it resolves to the unfused path off-TPU)."""
    from se3diff_tpu.models.dig import DiGConditionalScoreModel

    kw = dict(num_layers=1, dim_model=16, dim_pair=8, num_heads=2,
              dim_hidden=16, dropout=0.0)
    B, L = 1, 6
    args = (
        jnp.asarray(rng.standard_normal((B, L, 3)), jnp.float32),
        jnp.broadcast_to(jnp.eye(3), (B, L, 3, 3)),
        jnp.full((B,), 0.3, jnp.float32),
        jnp.asarray(rng.standard_normal((B, L, 384)), jnp.float32),
        jnp.asarray(rng.standard_normal((B, L, L, 128)), jnp.float32),
    )
    m_ref = DiGConditionalScoreModel(**kw)
    m_auto = DiGConditionalScoreModel(use_pallas="auto", **kw)
    params = m_ref.init(jax.random.key(0), *args)
    ref = m_ref.apply(params, *args)
    got = m_auto.apply(params, *args)
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(ref[0]))
    np.testing.assert_allclose(np.asarray(got[1]), np.asarray(ref[1]))


def test_model_fused_matches_unfused(rng):
    """Full DiG model with use_pallas=True (interpreter) == jnp path.

    L=12 forces the model's pad-to-128 path, so this also covers the
    StructureModule pad-once plumbing and padded-row slicing."""
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


def test_model_fused_rectangular_padding(rng):
    """L=150: rows pad to 192 (row tile 64) and columns run one full
    192-column block (FULL_COL_MAX) instead of padding to 256 — through the
    direct forward AND the conditioning cache (whose pair stack and pa
    biases are born [192, 192])."""
    from se3diff_tpu.models.dig import DiGConditionalScoreModel
    from se3diff_tpu.ops.pallas_ipa import (
        ROW_PAD, col_padded_len, col_tile, padded_len, row_tile,
    )

    L = 150
    assert padded_len(L, ROW_PAD) == 192 and col_padded_len(L) == 192
    assert row_tile(192) == 192  # full-row block (Mosaic-legal sub-128-mult)
    assert col_tile(192) == 192  # full-column block (same exception)

    kw = dict(num_layers=1, dim_model=16, dim_pair=8, num_heads=2,
              dim_hidden=16, dropout=0.0)
    B = 1
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

    cache = m_fused.apply(params, args[3], args[4], method="embed_conditioning")
    assert cache["x2d"].shape[1:3] == (192, 192)
    assert cache["pa"].shape[-2:] == (192, 192)
    got_c = m_fused.apply(
        params, args[0], args[1], args[2], cache, method="score_from_cache"
    )
    np.testing.assert_allclose(
        np.asarray(got_c[0]), np.asarray(ref[0]), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(got_c[1]), np.asarray(ref[1]), atol=1e-4
    )


def test_row_tile_and_row_padded_len():
    """Tile-selection rules: every (row_padded_len, row_tile) pair must be
    legal under Mosaic's block-shape constraint — the last dim of the
    [B, 3, H*4, Lq] coordinate-plane blocks is the row tile, so ti must be
    a 128-multiple or the FULL (local) row count. The round-3 sub-128
    divisor rule (ti=96 at Lq=192) passed interpret-mode tests but was
    rejected by the real TPU lowering."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from se3diff_tpu.ops.pallas_ipa import (
        FULL_ROW_MAX, row_padded_len, row_tile,
    )

    assert row_tile(192) == 192  # full-row block (largest allowed)
    assert row_tile(128) == 128
    assert row_tile(512) == 128
    assert row_tile(24) == 24    # SP slab: full-slab block
    with pytest.raises(ValueError):
        row_tile(12)
    # The VMEM contract is self-enforcing: a full-row block beyond
    # FULL_ROW_MAX raises here instead of an opaque Mosaic VMEM error.
    with pytest.raises(ValueError, match="FULL_ROW_MAX"):
        row_tile(320)

    assert row_padded_len(150) == 192
    assert row_padded_len(150, None) == 192
    # 320 > FULL_ROW_MAX (a 320-row full block measures 126 MB of scoped
    # VMEM on v5e — over the 128 MB chip), so L=300 pads rows to 128s.
    assert row_padded_len(300) == 384
    assert row_padded_len(385) == 512   # 448 > FULL_ROW_MAX -> pad to 128s
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(1, 8), ("data", "model"))
    sh = NamedSharding(mesh, P(None, "model", None, None))
    # 8 shards need Lq % 64 == 0 -> 192 already qualifies.
    assert row_padded_len(150, sh) == 192
    unsharded = NamedSharding(mesh, P(None, None, None, None))
    assert row_padded_len(150, unsharded) == 192

    # Mosaic legality sweep: single-chip and sharded, every true length.
    for L in range(1, 2500, 13):
        for sharding, n in ((None, 1), (sh, 8)):
            Lp = row_padded_len(L, sharding)
            assert Lp >= L and Lp % (n * 8) == 0
            slab = Lp // n
            ti = row_tile(slab)
            assert slab % ti == 0
            assert ti % 128 == 0 or ti == slab, (L, Lp, slab, ti)
            # VMEM guard: full-row tiles stay within the measured budget.
            if ti % 128 != 0:
                assert ti <= FULL_ROW_MAX, (L, ti)


def test_col_tile_and_col_padded_len():
    """Column-side full-block rule: key/value columns pad to 128-multiples
    in general, but short sequences run one Mosaic-legal full-column block
    (L<=64 -> 64 columns; 128 < Lpad <= FULL_COL_MAX -> Lpad columns),
    skipping the pad to the next 128 boundary."""
    from se3diff_tpu.ops.pallas_ipa import (
        FULL_COL_MAX, col_padded_len, col_tile,
    )

    assert col_padded_len(56) == 64      # GRB2-SH3 finetune shape: 64x64
    assert col_padded_len(100) == 128    # 128-multiple -> regular tiling
    assert col_padded_len(150) == 192
    assert col_padded_len(192) == 192
    assert col_padded_len(200) == 256
    assert col_padded_len(300) == 384    # 320 > FULL_COL_MAX -> 128s
    assert col_tile(64) == 64
    assert col_tile(192) == 192
    assert col_tile(256) == 128
    with pytest.raises(ValueError):
        col_tile(12)
    # Round 4: a 320-column full block at ti<=128 fits the VMEM budget
    # (the ragged plan's dead-zone shape); larger full columns still raise.
    assert col_tile(320, ti=128) == 320
    with pytest.raises(ValueError, match="VMEM budget"):
        col_tile(448, ti=128)
    with pytest.raises(ValueError, match="VMEM budget"):
        col_tile(320, ti=256)

    for L in range(1, 2500, 13):
        Lk = col_padded_len(L)
        tj = col_tile(Lk)
        assert Lk >= L and Lk % tj == 0
        assert tj % 128 == 0 or tj == Lk, (L, Lk, tj)
        if tj % 128 != 0:
            # The default (non-ragged) planner only emits short full blocks.
            assert tj <= FULL_COL_MAX, (L, tj)


class TestChunkedBackward:
    """`_fused_backward_chunked` (flash-style row-chunked recompute) must
    reproduce the one-shot autodiff VJP of `_fused_semantics_jnp` on every
    input cotangent."""

    def _kernel_args(self, rng, B, Lq, Lk, dtype=jnp.float32, with_pa=False):
        args = _inputs(B, min(Lq, Lk), rng, masked_cols=3)
        kargs = list(_to_kernel_layout_rect(args, Lq, Lk))
        if dtype != jnp.float32:
            # scalar q/k/v and x2d run in the model dtype; points/bias f32.
            for i in (0, 1, 2, 6):
                kargs[i] = kargs[i].astype(dtype)
        if with_pa:
            pa = jnp.einsum(
                "bijp,ph->bhij", kargs[6].astype(jnp.float32),
                kargs[7].astype(jnp.float32),
            )
            kargs.append(pa)
        return tuple(kargs)

    def _compare(self, kargs, rng, atol, row_chunk=16):
        from se3diff_tpu.ops.pallas_ipa import (
            _fused_backward_chunked, _fused_semantics_jnp,
        )

        out, vjp = jax.vjp(
            lambda *a: _fused_semantics_jnp(
                *a[:10], a[10] if len(a) == 11 else None,
                scalar_w=SCALAR_W, pair_w=PAIR_W,
            ),
            *kargs,
        )
        ct = tuple(
            jnp.asarray(rng.standard_normal(o.shape), jnp.float32).astype(
                o.dtype
            )
            for o in out
        )
        want = vjp(ct)
        got = _fused_backward_chunked(
            kargs, ct, scalar_w=SCALAR_W, pair_w=PAIR_W, row_chunk=row_chunk
        )
        assert len(got) == len(want)
        names = ["q_s", "k_s", "v_s", "q_p", "k_p", "v_p", "x2d", "w_pb",
                 "w_pv", "bias", "pa"]
        for n, g, w in zip(names, got, want):
            assert g.shape == w.shape and g.dtype == w.dtype, n
            np.testing.assert_allclose(
                np.asarray(g, np.float32), np.asarray(w, np.float32),
                atol=atol, rtol=1e-3, err_msg=n,
            )

    def test_square_in_kernel_bias(self, rng):
        self._compare(self._kernel_args(rng, 2, 32, 32), rng, atol=1e-4)

    def test_rectangular_streamed_pa(self, rng):
        self._compare(
            self._kernel_args(rng, 1, 16, 48, with_pa=True), rng, atol=1e-4
        )

    def test_bf16_scalars(self, rng):
        # The CPU backend can't run the twin's bf16 x bf16 -> f32 dots, so
        # compare the chunked backward on bf16 inputs against itself on the
        # f32 copies of the same values (grads must match to bf16-level
        # tolerance; shapes/dtypes must follow the primals).
        from se3diff_tpu.ops.pallas_ipa import _fused_backward_chunked

        k16 = self._kernel_args(rng, 1, 32, 32, dtype=jnp.bfloat16)
        k32 = tuple(
            a.astype(jnp.float32) if a.dtype == jnp.bfloat16 else a
            for a in k16
        )
        ct = tuple(
            jnp.asarray(rng.standard_normal(s), jnp.float32)
            for s in [(1, H, 32, DK), (1, H, 32, 24), (1, H, 32, DK)]
        )
        kw = dict(scalar_w=SCALAR_W, pair_w=PAIR_W, row_chunk=16)
        g16 = _fused_backward_chunked(
            k16, (ct[0].astype(jnp.bfloat16), ct[1],
                  ct[2].astype(jnp.bfloat16)), **kw
        )
        g32 = _fused_backward_chunked(k32, ct, **kw)
        for a16, a32, p16 in zip(g16, g32, k16):
            assert a16.dtype == p16.dtype
            np.testing.assert_allclose(
                np.asarray(a16, np.float32), np.asarray(a32, np.float32),
                atol=5e-2, rtol=5e-2,
            )

    def test_coincident_points_bounded_grads(self, rng):
        """bf16-quantized coincident q_p/k_p pairs (d2 clamps to exactly 0)
        must yield bounded, finite point grads — the clamp's subgradient is
        zero there. The pre-fix ds/sqrt(1e-24) spelling injected ~1e5-scale
        cancellation garbage, which is what nan'd the round-4 on-chip
        `--train --fused --bwd chunked` runs (chip_master_r4.log)."""
        from se3diff_tpu.ops.pallas_ipa import _fused_backward_chunked

        kargs = list(self._kernel_args(rng, 1, 32, 32, dtype=jnp.bfloat16))
        q_p = kargs[3]
        # Two full point-heads of exact (bf16-identical) coincidences.
        kargs[4] = kargs[4].at[:, :, :2, :].set(q_p[:, :, :2, :])
        ct = tuple(
            jnp.ones(s, d) for s, d in [
                ((1, H, 32, DK), jnp.bfloat16),
                ((1, H, 32, 24), jnp.float32),
                ((1, H, 32, DK), jnp.bfloat16),
            ]
        )
        g = _fused_backward_chunked(
            tuple(kargs), ct, scalar_w=SCALAR_W, pair_w=PAIR_W, row_chunk=16
        )
        for name, arr in zip(["q_s", "k_s", "v_s", "q_p", "k_p"], g[:5]):
            a = np.asarray(arr, np.float32)
            assert np.isfinite(a).all(), name
            assert np.abs(a).max() < 1e3, (name, np.abs(a).max())

    def test_single_chunk_equals_multi_chunk(self, rng):
        from se3diff_tpu.ops.pallas_ipa import _fused_backward_chunked

        kargs = self._kernel_args(rng, 1, 32, 32)
        ct = tuple(
            jnp.asarray(rng.standard_normal(s), jnp.float32)
            for s in [(1, H, 32, DK), (1, H, 32, 24), (1, H, 32, DK)]
        )
        kw = dict(scalar_w=SCALAR_W, pair_w=PAIR_W)
        a = _fused_backward_chunked(kargs, ct, row_chunk=32, **kw)
        b = _fused_backward_chunked(kargs, ct, row_chunk=8, **kw)
        for x, y in zip(a, b):
            np.testing.assert_allclose(
                np.asarray(x), np.asarray(y), atol=1e-5
            )

    def test_diff_wrapper_auto_dispatch(self, rng):
        """backward="chunked" through fused_ipa_attention_diff's grad equals
        backward="full" (same inputs, same cotangent seeding via a scalar
        loss)."""
        from se3diff_tpu.ops.pallas_ipa import fused_ipa_attention_diff

        kargs = self._kernel_args(rng, 1, 16, 16)

        def loss(mode):
            def f(*a):
                o = fused_ipa_attention_diff(
                    *a, scalar_w=SCALAR_W, pair_w=PAIR_W, ti=8, tj=8,
                    interpret=True, backward=mode,
                )
                return sum(jnp.sum(x.astype(jnp.float32) ** 2) for x in o)
            return jax.grad(f, argnums=tuple(range(10)))(*kargs)

        full = loss("full")
        chunked = loss("chunked")
        for f_, c in zip(full, chunked):
            np.testing.assert_allclose(
                np.asarray(f_, np.float32), np.asarray(c, np.float32),
                atol=1e-4, rtol=1e-3,
            )


def test_model_fused_respects_mask(rng):
    """use_pallas with a real column mask (padding + masked residues) ==
    jnp path with the same mask."""
    from se3diff_tpu.models.dig import DiGConditionalScoreModel

    kw = dict(num_layers=1, dim_model=16, dim_pair=8, num_heads=2,
              dim_hidden=16, dropout=0.0)
    B, L = 1, 10
    mask = jnp.asarray([[1, 1, 1, 1, 1, 1, 1, 0, 0, 0]], bool)
    args = (
        jnp.asarray(rng.standard_normal((B, L, 3)), jnp.float32),
        jnp.broadcast_to(jnp.eye(3), (B, L, 3, 3)),
        jnp.full((B,), 0.3, jnp.float32),
        jnp.asarray(rng.standard_normal((B, L, 384)), jnp.float32),
        jnp.asarray(rng.standard_normal((B, L, L, 128)), jnp.float32),
        mask,
    )
    m_ref = DiGConditionalScoreModel(**kw)
    m_fused = DiGConditionalScoreModel(use_pallas=True, **kw)
    params = m_ref.init(jax.random.key(0), *args)
    ref = m_ref.apply(params, *args)
    got = m_fused.apply(params, *args)
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(ref[0]), atol=1e-4)
    np.testing.assert_allclose(np.asarray(got[1]), np.asarray(ref[1]), atol=1e-4)


class TestSequenceParallelFused:
    """SP x fused: the kernel on row slabs with full columns
    (`sp_fused_ipa_attention`) must reproduce the single-chip kernel."""

    def _mesh_sharding(self, mp):
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        mesh = Mesh(
            np.array(jax.devices()[:8]).reshape(8 // mp, mp),
            ("data", "model"),
        )
        return NamedSharding(mesh, P(None, "model", None, None))

    @pytest.mark.parametrize("mp", [2, 4])
    def test_sp_matches_single_chip_kernel(self, rng, mp):
        from se3diff_tpu.ops.pallas_ipa import sp_fused_ipa_attention

        args = _inputs(2, 256, rng, masked_cols=5)
        kargs = _to_kernel_layout(args, 256)
        ref = fused_ipa_attention(
            *kargs, scalar_w=SCALAR_W, pair_w=PAIR_W, interpret=True
        )
        got = sp_fused_ipa_attention(
            self._mesh_sharding(mp), *kargs,
            scalar_w=SCALAR_W, pair_w=PAIR_W, interpret=True,
        )
        for r, g in zip(ref, got):
            np.testing.assert_allclose(np.asarray(g), np.asarray(r), atol=1e-5)

    def test_sp_with_streamed_pair_bias(self, rng):
        """The conditioning-cache variant: pa rows shard with the queries."""
        from se3diff_tpu.ops.pallas_ipa import sp_fused_ipa_attention

        args = _inputs(1, 256, rng)
        kargs = _to_kernel_layout(args, 256)
        x2d_p, w_pb = kargs[6], kargs[7]
        pa = jnp.einsum("bijp,ph->bhij", x2d_p, w_pb)
        ref = fused_ipa_attention(
            *kargs, pa, scalar_w=SCALAR_W, pair_w=PAIR_W, interpret=True
        )
        got = sp_fused_ipa_attention(
            self._mesh_sharding(2), *kargs, pa,
            scalar_w=SCALAR_W, pair_w=PAIR_W, interpret=True,
        )
        for r, g in zip(ref, got):
            np.testing.assert_allclose(np.asarray(g), np.asarray(r), atol=1e-5)

    def test_sp_unsharded_axis_fallback_rectangular(self, rng):
        """spec[1]=None falls back to the single-chip kernel; with
        rectangular ROW_PAD rows (Lq=192, Lk=256) the fallback must pick
        ti=row_tile(192)=192 (full-row block) — the default ti=128 fails
        the kernel's divisibility assert."""
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        from se3diff_tpu.ops.pallas_ipa import sp_fused_ipa_attention

        args = _inputs(1, 150, rng)
        kargs = _to_kernel_layout_rect(args, 192, 256)
        ref = fused_ipa_attention(
            *kargs, scalar_w=SCALAR_W, pair_w=PAIR_W, ti=192, interpret=True
        )
        mesh = Mesh(np.array(jax.devices()[:8]).reshape(8, 1), ("data", "model"))
        unsharded = NamedSharding(mesh, P(None, None, None, None))
        got = sp_fused_ipa_attention(
            unsharded, *kargs,
            scalar_w=SCALAR_W, pair_w=PAIR_W, interpret=True,
        )
        for r, g in zip(ref, got):
            np.testing.assert_allclose(np.asarray(g), np.asarray(r), atol=1e-5)

    def test_model_sp_fused_rectangular_rows(self, rng):
        """Model-level SP at a ROW_PAD length (L=150 -> Lq=192, slabs of 48
        over mp=4): the shard-divisibility gate must accept the rectangular
        row count and match the unsharded fused forward."""
        from se3diff_tpu.models.dig import DiGConditionalScoreModel

        kw = dict(num_layers=1, dim_model=16, dim_pair=8, num_heads=2,
                  dim_hidden=16, dropout=0.0)
        B, L = 1, 150
        args = (
            jnp.asarray(rng.standard_normal((B, L, 3)), jnp.float32),
            jnp.broadcast_to(jnp.eye(3), (B, L, 3, 3)),
            jnp.full((B,), 0.3, jnp.float32),
            jnp.asarray(rng.standard_normal((B, L, 384)), jnp.float32),
            jnp.asarray(rng.standard_normal((B, L, L, 128)), jnp.float32),
        )
        m_fused = DiGConditionalScoreModel(use_pallas=True, **kw)
        m_sp = DiGConditionalScoreModel(
            use_pallas=True, pair_sharding=self._mesh_sharding(4), **kw
        )
        params = m_fused.init(jax.random.key(0), *args)
        ref = m_fused.apply(params, *args)
        got = m_sp.apply(params, *args)
        np.testing.assert_allclose(
            np.asarray(got[0]), np.asarray(ref[0]), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(got[1]), np.asarray(ref[1]), atol=1e-5
        )

    def test_model_sp_fused_matches_unsharded_fused(self, rng):
        """Model level: pair_sharding + use_pallas routes through the SP
        kernel and matches the unsharded fused forward."""
        from se3diff_tpu.models.dig import DiGConditionalScoreModel

        kw = dict(num_layers=1, dim_model=16, dim_pair=8, num_heads=2,
                  dim_hidden=16, dropout=0.0)
        B, L = 2, 12  # pads to 128; 4-way shard -> 32-row slabs
        args = (
            jnp.asarray(rng.standard_normal((B, L, 3)), jnp.float32),
            jnp.broadcast_to(jnp.eye(3), (B, L, 3, 3)),
            jnp.full((B,), 0.3, jnp.float32),
            jnp.asarray(rng.standard_normal((B, L, 384)), jnp.float32),
            jnp.asarray(rng.standard_normal((B, L, L, 128)), jnp.float32),
        )
        m_fused = DiGConditionalScoreModel(use_pallas=True, **kw)
        m_sp = DiGConditionalScoreModel(
            use_pallas=True,
            pair_sharding=self._mesh_sharding(4).update(
                spec=jax.sharding.PartitionSpec(None, "model")
            ),
            **kw,
        )
        params = m_fused.init(jax.random.key(0), *args)
        ref = m_fused.apply(params, *args)
        got = m_sp.apply(params, *args)
        np.testing.assert_allclose(np.asarray(got[0]), np.asarray(ref[0]), atol=1e-5)
        np.testing.assert_allclose(np.asarray(got[1]), np.asarray(ref[1]), atol=1e-5)


class TestFusedGradients:
    """The fused path is differentiable via a recompute custom-VJP
    (fused_ipa_attention_diff): grads match the XLA path, so training and
    finetuning can run with the kernel forward."""

    def _setup(self, rng):
        from se3diff_tpu.models.dig import DiGConditionalScoreModel

        kw = dict(num_layers=1, dim_model=16, dim_pair=8, num_heads=2,
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
        return m_ref, m_fused, params, args

    def test_model_grads_match_xla_path(self, rng):
        m_ref, m_fused, params, args = self._setup(rng)

        def loss(m):
            def f(p):
                o1, o2 = m.apply(p, *args)
                return jnp.sum(o1**2) + jnp.sum(o2**2)
            return f

        g_ref = jax.grad(loss(m_ref))(params)
        g_fused = jax.grad(loss(m_fused))(params)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(b), np.asarray(a),
                atol=1e-4 * max(1.0, float(jnp.abs(a).max())),
            ),
            g_ref, g_fused,
        )

    def test_dsm_train_step_runs_fused(self, rng):
        """One DSM loss+grad+AdamW step with the fused forward."""
        import optax

        from se3diff_tpu.diffusion.denoise import SDEs
        from se3diff_tpu.sde.so3_sde import DiGSO3SDE
        from se3diff_tpu.sde.vpsde import CosineVPSDE
        from se3diff_tpu.training.dsm import make_dsm_train_step

        _, m_fused, params, args = self._setup(rng)
        pos, rot, _, single, pair = args
        batch = {"pos": pos, "rot": rot, "single": single, "pair": pair}
        sdes = SDEs(
            pos=CosineVPSDE(),
            node_orientations=DiGSO3SDE(num_sigma=24, num_omega=128, l_max=100),
        )
        opt = optax.adamw(1e-3)
        step = make_dsm_train_step(sdes, m_fused.apply, opt)
        opt_state = opt.init(params)
        _, _, loss = step(params, opt_state, jax.random.key(2), batch)
        assert np.isfinite(float(loss))

    @pytest.mark.parametrize("fused_backward", ["auto", "chunked"])
    def test_sp_fused_grads_match(self, rng, fused_backward):
        """Gradients flow through the SP shard_map dispatch too — via both
        the one-shot twin backward ("auto" at this tiny L) and the forced
        row-chunked recompute backward."""
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
        from se3diff_tpu.models.dig import DiGConditionalScoreModel

        m_ref, _, params, args = self._setup(rng)
        mesh = Mesh(
            np.array(jax.devices()[:8]).reshape(2, 4), ("data", "model")
        )
        m_sp = DiGConditionalScoreModel(
            num_layers=1, dim_model=16, dim_pair=8, num_heads=2,
            dim_hidden=16, dropout=0.0, use_pallas=True,
            fused_backward=fused_backward,
            pair_sharding=NamedSharding(mesh, P(None, "model")),
        )

        def loss(m):
            def f(p):
                o1, o2 = m.apply(p, *args)
                return jnp.sum(o1**2) + jnp.sum(o2**2)
            return f

        g_ref = jax.grad(loss(m_ref))(params)
        g_sp = jax.grad(loss(m_sp))(params)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(b), np.asarray(a),
                atol=1e-4 * max(1.0, float(jnp.abs(a).max())),
            ),
            g_ref, g_sp,
        )


def test_sp_slab_not_multiple_of_128(rng):
    """Lp=384 over 2 shards gives 192-row slabs: the tile must be a
    divisor of the slab (96), not min(128, slab) — regression for the
    L in (256, 384] sequence-parallel band."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from se3diff_tpu.ops.pallas_ipa import sp_fused_ipa_attention

    args = _inputs(1, 384, rng)
    kargs = _to_kernel_layout(args, 384)
    ref = fused_ipa_attention(
        *kargs, scalar_w=SCALAR_W, pair_w=PAIR_W, interpret=True
    )
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(4, 2), ("data", "model"))
    got = sp_fused_ipa_attention(
        NamedSharding(mesh, P(None, "model", None, None)), *kargs,
        scalar_w=SCALAR_W, pair_w=PAIR_W, interpret=True,
    )
    for r, g in zip(ref, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r), atol=1e-5)


# --------------------------------------------------------------------- #
# Round-4 ragged plan: 64-granular padding + rowsplit kernel calls       #
# --------------------------------------------------------------------- #


def test_ragged_plan_shapes():
    """The ragged planner's shape rules: 64-granular ROWS split into a
    128-tile main call plus one 64-row full block; COLUMNS stay
    128-multiples under every plan (ragged full columns past FULL_COL_MAX
    are a measured on-chip negative — stage-1 probe, docs/PERF.md); legacy
    128-multiple rules on both axes when off."""
    from se3diff_tpu.ops.pallas_ipa import (
        FULL_BLOCK_VMEM_BUDGET, col_padded_len, col_tile, fused_vmem_bytes,
        row_padded_len, row_segments,
    )

    # Short-L full-block rules are plan-independent.
    for ragged in (False, True):
        assert col_padded_len(150, ragged=ragged) == 192
        assert row_padded_len(150, ragged=ragged) == 192

    # Dead-zone lengths: 320x384 instead of 384x384 (rows ragged, columns
    # plan-independent).
    assert row_padded_len(300, ragged=True) == 320
    assert col_padded_len(300, ragged=True) == 384
    assert row_padded_len(300, ragged=False) == 384
    assert col_padded_len(300, ragged=False) == 384

    # Rows stay 64-granular at any length (rowsplit legalizes any
    # 64-multiple); columns are 128-multiples regardless.
    assert col_padded_len(385, ragged=True) == 512
    assert row_padded_len(385, ragged=True) == 448

    # col_tile retains VMEM-gated full-column capability for direct
    # callers (the planner itself no longer emits >FULL_COL_MAX blocks).
    assert fused_vmem_bytes(128, 320) <= FULL_BLOCK_VMEM_BUDGET
    assert fused_vmem_bytes(128, 448) > FULL_BLOCK_VMEM_BUDGET
    assert col_tile(320, ti=128) == 320
    with pytest.raises(ValueError, match="VMEM budget"):
        col_tile(448, ti=128)

    # Segment rules.
    assert row_segments(128) == (128,)
    assert row_segments(192) == (192,)  # single full-row block
    assert row_segments(320) == (256, 64)
    assert row_segments(448) == (384, 64)


def test_vmem_estimator_anchors():
    """The structural VMEM estimate must stay consistent with the two
    on-chip measurements that calibrate the budget: 192x192 compiled at
    115.8 MiB (OK against the 120 MiB limit), 320x128 failed at 126.2 MB.
    The estimate is known to sit 2-5% UNDER the measurement."""
    from se3diff_tpu.ops.pallas_ipa import fused_vmem_bytes

    from se3diff_tpu.ops.pallas_ipa import FULL_BLOCK_VMEM_BUDGET

    est_ok = fused_vmem_bytes(192, 192)
    est_bad = fused_vmem_bytes(320, 128)
    # Within 8% of each measurement (recorded as 115.8 MiB / 126.2 MB; the
    # exact unit of the second is historical, so the window covers both).
    assert abs(est_ok - 115.8 * 2**20) <= 0.08 * 115.8 * 2**20
    assert abs(est_bad - 126.2 * 1e6) <= 0.08 * 126.2 * 1e6
    # And the budget separates known-good from known-bad.
    assert est_ok <= FULL_BLOCK_VMEM_BUDGET < est_bad


def test_rowsplit_matches_reference(rng):
    """The rowsplit path (main 128-tile call + 64-row full-block call with
    a full-column 320 block) must match the oracle exactly like the
    single-call kernel does — covering the L in [257, 320] ragged shape."""
    from se3diff_tpu.ops.pallas_ipa import fused_ipa_attention_rowsplit

    B, L, Lp = 1, 300, 320
    args = _inputs(B, L, rng)
    ref = _reference(args)
    kargs = _to_kernel_layout(args, Lp)
    os_hm, op_hm, opr = fused_ipa_attention_rowsplit(
        *kargs, scalar_w=SCALAR_W, pair_w=PAIR_W, interpret=True
    )
    back = lambda x: jnp.transpose(x, (0, 2, 1, 3)).reshape(B, Lp, -1)[:, :L]
    got = (back(os_hm), back(op_hm), back(opr))
    for g, r, name in zip(got, ref, ["scalar", "point", "pair"]):
        r = np.asarray(r).reshape(np.asarray(g).shape)
        np.testing.assert_allclose(
            np.asarray(g), r, atol=3e-5, rtol=3e-5, err_msg=name
        )


def test_rowsplit_grads_match_twin(rng):
    """Gradients through the rowsplit wrapper (two custom-VJP segments +
    slice/concat) must match one jax.vjp over the jnp twin."""
    from se3diff_tpu.ops.pallas_ipa import (
        _fused_semantics_jnp, fused_ipa_attention_rowsplit,
    )

    B, L, Lp = 1, 300, 320
    args = _inputs(B, L, rng)
    kargs = _to_kernel_layout(args, Lp)

    def loss_fused(qs, x2d):
        a = (qs,) + kargs[1:6] + (x2d,) + kargs[7:]
        o1, o2, o3 = fused_ipa_attention_rowsplit(
            *a, scalar_w=SCALAR_W, pair_w=PAIR_W, interpret=True
        )
        return jnp.sum(o1**2) + jnp.sum(o2**2) + jnp.sum(o3**2)

    def loss_twin(qs, x2d):
        a = (qs,) + kargs[1:6] + (x2d,) + kargs[7:]
        o1, o2, o3 = _fused_semantics_jnp(
            *a, scalar_w=SCALAR_W, pair_w=PAIR_W
        )
        return jnp.sum(o1**2) + jnp.sum(o2**2) + jnp.sum(o3**2)

    g_f = jax.grad(loss_fused, argnums=(0, 1))(kargs[0], kargs[6])
    g_t = jax.grad(loss_twin, argnums=(0, 1))(kargs[0], kargs[6])
    for a, b, name in zip(g_f, g_t, ["qs", "x2d"]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b),
            atol=1e-4 * max(1.0, float(jnp.abs(b).max())), err_msg=name,
        )
