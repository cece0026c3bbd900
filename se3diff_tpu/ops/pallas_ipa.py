"""Fused IPA (DiG SAAttention) kernel in Pallas — flash-style.

The IPA layer's cost on TPU is HBM traffic on L^2 intermediates (attention
logits, point distances, softmax weights, weighted pair tensors), not FLOPs.
This kernel streams (j-)tiles of keys/values/pair features through VMEM and
keeps every L^2 intermediate on-chip, with online softmax (running max /
denominator) in the canonical flash-attention pattern.

Fused math (one pass over j per query tile):

    s[h,i,j] = w_s * <q_s, k_s> - pw[h] * sum_p ||q_p - k_p||
               + w_pair * (x2d @ w_pb) + bias[j]
    a        = softmax_j(s)
    out_scalar[h,i,:] = sum_j a v_s            (bf16 in, f32 accum)
    out_point[h,i,:]  = sum_j a v_p            (f32 — the reference's fp32
                                                island, structure_module.py:193)
    out_pair[h,i,:]   = (sum_j a x2d[i,j,:]) @ w_pv[h]
                                               (pair-value projection fused
                                                into the kernel finalize: the
                                                [B,L,H,Cp] aggregate never
                                                touches HBM)

Layout contract (designed so the caller's projections EMIT these layouts
directly and nothing is transposed or padded per layer):

    qs/ks/vs  [B, H, Lp, dk]      x1d dtype
    qp/kp     [B, 3, H*4, Lp]     f32 coordinate planes, PRE-SCALED by the
                                  per-head point weight (||w q - w k|| =
                                  w ||q - k||; avoids an in-kernel per-head
                                  broadcast, a Mosaic-unsupported relayout)
    vp        [B, H, Lp, 24]      f32
    x2d       [B, Lp, Lp, Cp]     x1d dtype — padded ONCE per forward at the
                                  StructureModule boundary (layer-invariant)
    w_pb      [Cp, H]             f32 pair-bias projection
    w_pv      [H, Cp, dk]         pair-value projection (fused finalize)
    bias      [B, Lp]             f32 additive column bias; -inf at pad cols

``Lp`` must be a multiple of the tile size (the model pads L -> Lp once per
forward; all per-layer operands are born padded). All three accumulators
live in f32 VMEM scratch across the j loop and are written to HBM exactly
once, in the finalize step.

Point distances run on the MXU via a homogeneous-coordinate lift: the
whole |q|^2+|k|^2-2q.k expansion is ONE batched (over the H*4 point
channels) K=8 matmul,

    Q8[c] = [qx, qy, qz, |q|^2, 1, 0, 0, 0]
    K8[c] = [-2kx, -2ky, -2kz, 1, |k|^2, 0, 0, 0]   ->  d2 = Q8 . K8

leaving only sqrt + the 4-point reduction on the VPU. This replaced the
round-2 VPU broadcast-FMA spelling and cut the kernel from 12.7 ms to
5.4 ms/layer at L=2048 (the "VPU floor" claimed for point distances in
round 2 was a construction/layout bound, not a sqrt bound; f32 dots lower
to bf16x3 MXU passes at ~1e-6 relative error). The [H*4, TI, TJ] distance
tile never leaves VMEM.

When the caller holds a conditioning cache, the t-invariant pair bias
``x2d @ w_pb`` is precomputed once per sample and STREAMED into the kernel
(``pa`` input) instead of being recomputed from x2d every NFE — the same
hoist XLA's loop-invariant code motion performs automatically for the
unfused path; measured −2.1 ms/layer at L=2048. With ``pa=None`` the
kernel computes the bias from x2d in-kernel (used at init time and by
callers without a cache).

The jnp implementation (`ipa_attention_reference`) is the oracle;
`tests/test_pallas_ipa.py` checks both paths in interpreter mode.
Training/finetuning through the fused path works via
`fused_ipa_attention_diff` (custom VJP: kernel forward, recompute
backward from `_fused_semantics_jnp`); sequence-parallel forwards via
`sp_fused_ipa_attention` (row-slab shard_map; see SCALING.md). On-device
numerics: with the full checkpoint-sized model at L=256, the fused-bf16
output deviates from the f32 XLA path by 0.9-1.0e-2 relative, *less* than
the bf16 XLA path's own 1.1e-2 — the kernel adds no error beyond bf16
compute (f32 VMEM accumulators; Mosaic lowers the f32 d2 dot multi-pass).

Measured status (round 3, v5e, end-to-end reference protocol dpm-30,
structures/hr/chip, fused vs XLA path):
L=100 122k vs 163k; L=128 116k vs 137k; L=192 58.5k vs 56.1k (+4% —
full-row AND full-column 192x192 blocks; the earlier rectangular 192x256
shape measured 50.9k); L=256 42.1k vs 33.7k (+25%); L=300 22.4k vs
29.6k (pads to 384x384 — 39% wasted work); L=384 21.7k vs 13.6k (+59%);
L=512 13.9k vs 7.9k (+76%); L=1024 4196 vs 1880 (+123%); L=2048 1178 vs
647 (+82%).
The round-2 long-L regression (495 vs 647 at L=2048) was the in-kernel
VPU point-distance emit + the per-NFE pair-bias recompute; the MXU lift
and the streamed bias fix both. ``use_pallas="auto"`` dispatches on
``predicted_fused_advantage`` (below) — a log-log interpolation of these
anchors that charges the kernel for its padded shape — so the fused path
is never a silent regression, including in the padding-waste dead zones
just past each 128-column boundary (L=300 is the measured example).

Counterpart of the reference's torch/CUDA IPA (structure_module.py:56-220).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30

# On-device end-to-end anchors behind the ``use_pallas="auto"`` dispatch
# model (v5e, reference-protocol dpm-30, structures/hr/chip: the README
# long-L table plus the round-3 rectangular re-measurements). The fused
# kernel's cost depends only on its PADDED shape — every (row, col) tile
# runs regardless of the true length — so _FUSED_MEAS is keyed by the
# effective padded length sqrt(Lq_pad * Lk_pad); the XLA path compiles
# exact shapes, so _XLA_MEAS is keyed by true L. Between (and beyond) the
# anchors both curves interpolate log-log (throughput is near power-law in
# L, ~L^-1.5..-2.5 across the range; the model reproduces each held-out
# rectangular anchor from the square ones within 2%).
_FUSED_MEAS = (
    (128.0, 116_000.0),   # L=128, kernel 128x128
    (192.0, 58_550.0),    # L=192, kernel 192x192 (full-row AND full-column
                          # block — the round-3 column rule); corroborated
                          # by L=150 (same padded kernel): 57.2k, within 3%
    (221.7, 50_886.0),    # L=192 pre-column-rule, kernel 192x256 (kept: a
                          # valid padded-area anchor)
    (256.0, 42_100.0),
    (384.0, 21_723.0),    # L=384, B=6; corroborated by L=300 (same padded
                          # 384x384 kernel, rows 128-padded past
                          # FULL_ROW_MAX): 22.4k — within 3%
    (512.0, 13_900.0),
    (1024.0, 4_196.0),
    (2048.0, 1_178.0),
)
_XLA_MEAS = (
    (100.0, 163_000.0),
    (128.0, 137_000.0),
    (192.0, 56_099.0),
    (256.0, 33_700.0),
    (300.0, 29_599.0),
    (384.0, 13_643.0),   # B=6; the XLA path's own L^2 cliff past 300 —
                         # the round-3 interpolation (16.1k) was optimistic
    (512.0, 7_900.0),
    (1024.0, 1_880.0),
    (2048.0, 647.0),
)


def _loglog_interp(table, x: float) -> float:
    """Piecewise-linear in log-log space; end-segment extrapolation ABOVE
    the anchors, flat clamp BELOW them. Backward power-law extrapolation is
    wrong at small sizes (dispatch floors flatten the curve, and the two
    paths' first segments have very different slopes — extrapolating once
    predicted the fused kernel wins at L<=64, inverting every short-L
    measurement); the flat clamp keeps sub-anchor ratios anchored to the
    measured short end, where XLA wins."""
    import math

    if x <= table[0][0]:
        return table[0][1]
    lx = math.log(x)
    pts = [(math.log(a), math.log(t)) for a, t in table]
    i = max((j for j in range(len(pts) - 1) if pts[j][0] <= lx), default=0)
    (x0, y0), (x1, y1) = pts[i], pts[i + 1]
    return math.exp(y0 + (y1 - y0) * (lx - x0) / (x1 - x0))


# Occupancy correction for the dispatch model (round 5, fitted on the
# round-4 dispatch-stress cells — docs/artifacts/bench_r4_queue.json).
# Every anchor in _FUSED_MEAS/_XLA_MEAS was measured on the bench batch
# schedule, B*L ~= 2048 (L=256@B=8, L=512@B=4, ..., L=2048@B=1), so the
# base ratio is only valid AT that occupancy. Below it the kernel's grid
# is too small to pipeline (at L=256/B=1 the fused path measured 0.667x
# XLA while the B=8-anchored model said 1.25x — a silent 33% regression
# for an explicit --batch_size 1 user). Measured ratios at L=256:
# B=1 -> 0.667, B=8 -> 1.249 (anchor), B=16 -> 1.490; in log-log those
# sit on (B*L/2048)^0.30 within 1% at B=1 and 4% at B=16. The correction
# PENALIZES sub-anchor occupancy and never boosts above 1.0 (so every
# boundary quoted at the anchor schedule is unchanged), and flat-clamps
# below the smallest measured occupancy per the no-backward-extrapolation
# rule (_loglog_interp's docstring).
_OCC_ANCHOR = 2048.0
_OCC_EXP = 0.30
_OCC_MIN = 256.0  # smallest measured occupancy (L=256, B=1)


def _occupancy_correction(L: int, batch: int | None) -> float:
    if batch is None:
        return 1.0
    occ = max(float(batch) * float(L), _OCC_MIN)
    return min(1.0, (occ / _OCC_ANCHOR) ** _OCC_EXP)


def predicted_fused_advantage(
    L: int, pair_sharding=None, batch: int | None = None
) -> float:
    """Predicted fused/XLA end-to-end throughput ratio at true length ``L``
    (>1 means the fused kernel should win — the quantity "auto" dispatches
    on). Fused throughput is looked up at the padded kernel shape, XLA's
    at the exact length, so the model charges the kernel for padding waste
    the flat round-2 ``L >= 256`` threshold ignored: at L=300 (pads to
    384x384, ratio 0.76 measured) that threshold silently picked the 24%
    slower path. Round-3 anchor boundaries: fused wins on [189, 192]
    (full-column 192x192 blocks), [226, 256], and everywhere from 332 up;
    XLA wins below 189, on [193, 225], and on the 384-pad dead zone
    [257, 331] (the old [385, 407] dead zone vanished when the measured
    XLA L=384 anchor came in far below its interpolation).

    ``pair_sharding`` (a sequence-parallel NamedSharding, or None) changes
    how rows pad — L=385 on 8 shards runs 448 rows, not 512 — so the model
    charges the kernel for the shape it will actually run. The anchors
    themselves are single-chip measurements; under SP the ratio is an
    approximation (per-slab kernel cost tracks the same padded area, but
    the XLA curve was not re-measured sharded).

    Above the largest anchor (L=2048) the ratio is floored at the last
    measured anchor ratio (~1.82): raw end-segment extrapolation has the
    fused slope steeper than XLA's, so the extrapolated ratio decays and
    crosses below 1.0 near L~16k — exactly the regime where the kernel's
    O(L^2) HBM savings matter most (and where XLA may simply OOM).

    ``batch`` (the run batch size, if the caller knows it) applies the
    occupancy correction ``_occupancy_correction`` — the anchors sit on
    the B*L ~= 2048 bench schedule and the kernel underperforms them when
    the grid is smaller (measured 33% at L=256/B=1). ``None`` keeps the
    anchor-occupancy assumption. Under sequence parallelism ``batch``
    should stay the global batch: the occupancy fit is single-chip and
    per-shard grids were not re-measured."""
    eff = (row_padded_len(L, pair_sharding) * col_padded_len(L)) ** 0.5
    r = _loglog_interp(_FUSED_MEAS, eff) / _loglog_interp(_XLA_MEAS, L)
    if L > _XLA_MEAS[-1][0]:
        r = max(r, _FUSED_MEAS[-1][1] / _XLA_MEAS[-1][1])
    return r * _occupancy_correction(L, batch)


def resolve_use_pallas(
    flag: bool | str, L: int, pair_sharding=None, batch: int | None = None
) -> bool:
    """Resolve a ``use_pallas`` setting (True/False/"auto") for length ``L``.

    "auto" picks the predicted-faster path per ``predicted_fused_advantage``
    on TPU, the XLA lowering otherwise (including on every non-TPU backend,
    where the kernel would run in the slow interpreter). ``pair_sharding``
    lets sequence-parallel callers charge the kernel for its sharded row
    padding, and ``batch`` charges it for sub-anchor occupancy (see
    ``predicted_fused_advantage``).
    """
    if flag == "train_auto":
        return (
            jax.default_backend() == "tpu"
            and predicted_train_fused_advantage(L) > 1.0
        )
    if flag == "auto":
        return (
            jax.default_backend() == "tpu"
            and predicted_fused_advantage(L, pair_sharding, batch) > 1.0
        )
    return bool(flag)


# DSM train-step anchors (examples/hr, bf16, 31.3M-param net, v5e —
# `bench.py --train`; round-4 campaign + round-5 post-NaN-fix reruns +
# round-5 crossover cells: docs/artifacts/bench_r4_queue.json,
# bench_r5_fixes.json. B=16 except L=384 at B=6). Value = fused-chunked /
# XLA throughput ratio at true L. fused+full lost to fused+chunked at
# every measured length, so the train dispatch only ever chooses between
# XLA and fused+chunked. The sampling advantage model does NOT transfer
# to training: the backward roughly doubles both paths' costs but shifts
# the balance (recompute vs L^2 HBM cotangents), so the measured
# crossover (~L=146) sits well below sampling's L=332 upper boundary.
# The ratio is NOT monotone (the 192 full-block kernel shape out-ratios
# 256) — piecewise interpolation, not a power-law fit.
_TRAIN_RATIO_MEAS = (
    (100.0, 761_423.8 / 827_638.6),   # 0.920 — XLA wins
    (192.0, 366_368.6 / 344_728.8),   # 1.063 — fused-chunked wins
    (256.0, 262_188.5 / 254_594.3),   # 1.030 — fused-chunked wins
    (384.0, 127_351.5 / 114_949.6),   # 1.108 — fused-chunked wins
)


def predicted_train_fused_advantage(L: int) -> float:
    """Predicted fused-chunked/XLA train-step throughput ratio at true
    length ``L`` (>1 means the fused path should win — the quantity
    "train_auto" dispatches on). Log-log interpolation between the measured
    anchors, flat-clamped at BOTH ends: below the smallest anchor for the
    usual backward-extrapolation reason (`_loglog_interp`), and above the
    largest because the non-monotone ratio curve is not trustworthy for
    power-law extrapolation — the flat clamp keeps long-L training on the
    fused path (where sampling's measured L^2 HBM advantage only grows)
    without overclaiming its margin."""
    import math

    pts = _TRAIN_RATIO_MEAS
    if L <= pts[0][0]:
        return pts[0][1]
    if L >= pts[-1][0]:
        return pts[-1][1]
    lx = math.log(L)
    lpts = [(math.log(a), math.log(t)) for a, t in pts]
    i = max(j for j in range(len(lpts) - 1) if lpts[j][0] <= lx)
    (x0, y0), (x1, y1) = lpts[i], lpts[i + 1]
    return math.exp(y0 + (y1 - y0) * (lx - x0) / (x1 - x0))


def resolve_train_kernel(kernel: str) -> dict:
    """Map a train-CLI kernel choice to score-model kwargs.

    ``kernel``: "auto" (measured-table dispatch per
    ``predicted_train_fused_advantage`` — the no-silent-regression
    default), "xla", or "fused" (fused + chunked backward, the better
    fused backward at every measured length). Returns kwargs for
    ``DiGConditionalScoreModel``.
    """
    if kernel == "auto":
        # "train_auto" resolves per trace-time L inside the model, so one
        # model instance serves mixed-length bucketed training correctly.
        return {"use_pallas": "train_auto", "fused_backward": "chunked"}
    if kernel == "xla":
        return {"use_pallas": False}
    if kernel == "fused":
        return {"use_pallas": True, "fused_backward": "chunked"}
    raise ValueError(f"unknown train kernel {kernel!r}")


def _kernel(
    # inputs
    qs_ref, ks_ref, vs_ref,          # [1, H, TI|TJ, dk]
    qp_ref, kp_ref,                  # [1, 3, H*4, TI|TJ] coordinate planes
    vp_ref,                          # [1, H, TJ, 24]
    x2d_ref,                         # [1, TI, TJ, Cp]
    pb_ref,                          # pa streamed: [1, H, TI, TJ] precomputed
                                     #   pair bias; else [Cp, H] projection
    wpv_ref,                         # [H, Cp, dk]
    bias_ref,                        # [1, 1, Lp] (full bias row; j-tile
                                     #   sliced in-kernel — a (1, 1, tj)
                                     #   block of [B, nj, tj] would violate
                                     #   Mosaic's block-divisibility rule
                                     #   whenever nj > 1)
    # outputs (written once, in finalize)
    os_ref,                          # [1, H, TI, dk] x dtype
    op_ref,                          # [1, H, TI, 24] f32
    opr_ref,                         # [1, H, TI, dk] x dtype
    # scratch (f32 accumulators, persistent across the j loop)
    m_ref, l_ref,                    # [H, TI]
    accs_ref,                        # [H, TI, dk]
    accp_ref,                        # [H, TI, 24]
    accw_ref,                        # [TI, H, Cp]
    *,
    scalar_w: float,
    pair_w: float,
    has_pa: bool,
):
    j = pl.program_id(2)
    nj = pl.num_programs(2)
    H = qs_ref.shape[1]
    TI = qs_ref.shape[2]
    TJ = ks_ref.shape[2]

    @pl.when(j == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        accs_ref[:] = jnp.zeros_like(accs_ref)
        accp_ref[:] = jnp.zeros_like(accp_ref)
        accw_ref[:] = jnp.zeros_like(accw_ref)

    qs = qs_ref[0]                               # [H, TI, dk]
    ks = ks_ref[0]                               # [H, TJ, dk]
    s = jnp.einsum(
        "hic,hjc->hij", qs, ks, preferred_element_type=jnp.float32
    ) * scalar_w                                 # [H, TI, TJ]

    # Point distances on the MXU: homogeneous-coordinate lift so the whole
    # |q|^2+|k|^2-2q.k expansion is one batched K=8 dot (see module
    # docstring). concatenate (not jnp.stack) — stack's gather lowering
    # captures an empty i32 constant Mosaic rejects.
    qp = qp_ref[0].astype(jnp.float32)           # [3, H*4, TI]
    kp = kp_ref[0].astype(jnp.float32)           # [3, H*4, TJ]
    q2 = jnp.sum(qp * qp, axis=0)                # [H*4, TI]
    k2 = jnp.sum(kp * kp, axis=0)                # [H*4, TJ]
    zq = jnp.zeros_like(q2)
    zk = jnp.zeros_like(k2)
    Q8 = jnp.concatenate(
        [qp[0][:, None], qp[1][:, None], qp[2][:, None],
         q2[:, None], jnp.full_like(q2, 1.0)[:, None],
         zq[:, None], zq[:, None], zq[:, None]],
        axis=1)                                  # [H*4, 8, TI]
    K8 = jnp.concatenate(
        [(-2.0 * kp[0])[:, None], (-2.0 * kp[1])[:, None],
         (-2.0 * kp[2])[:, None], jnp.full_like(k2, 1.0)[:, None],
         k2[:, None], zk[:, None], zk[:, None], zk[:, None]],
        axis=1)                                  # [H*4, 8, TJ]
    d2 = jax.lax.dot_general(
        Q8, K8, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)      # [H*4, TI, TJ]
    pdist = jnp.sum(
        jnp.sqrt(jnp.maximum(d2, 0.0) + 1e-24).reshape(H, 4, TI, TJ), axis=1
    )                                            # [H, TI, TJ]
    s = s - pdist

    x2d = x2d_ref[0]                             # [TI, TJ, Cp]
    if has_pa:
        s = s + pair_w * pb_ref[0].astype(jnp.float32)
    else:
        pa = jnp.einsum(
            "ijp,ph->ijh", x2d, pb_ref[:].astype(x2d.dtype),
            preferred_element_type=jnp.float32,
        )
        s = s + pair_w * jnp.transpose(pa, (2, 0, 1))
    # Full-column blocks (TJ == Lk) read the whole bias row at a static
    # offset: the dynamic j*TJ form is Mosaic-illegal when TJ is not a
    # 128-multiple (the lane-offset divisibility proof fails even though
    # the only j is 0).
    if bias_ref.shape[-1] == TJ:
        s = s + bias_ref[0, 0, :][None, None, :]
    else:
        s = s + bias_ref[0, 0, pl.ds(j * TJ, TJ)][None, None, :]

    # Online softmax update.
    m_prev = m_ref[:]                            # [H, TI]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1))
    corr = jnp.exp(m_prev - m_new)               # [H, TI]
    p = jnp.exp(s - m_new[:, :, None])           # [H, TI, TJ]
    m_ref[:] = m_new
    l_ref[:] = l_ref[:] * corr + jnp.sum(p, axis=-1)

    p16 = p.astype(vs_ref.dtype)
    acc_s = jnp.einsum(
        "hij,hjc->hic", p16, vs_ref[0], preferred_element_type=jnp.float32
    )
    accs_ref[:] = accs_ref[:] * corr[:, :, None] + acc_s

    vp = vp_ref[0].astype(jnp.float32)           # [H, TJ, 24]
    acc_p = jnp.einsum("hij,hjc->hic", p, vp, preferred_element_type=jnp.float32)
    accp_ref[:] = accp_ref[:] * corr[:, :, None] + acc_p

    p_i = jnp.transpose(p16, (1, 0, 2))          # [TI, H, TJ]
    acc_w = jnp.einsum("ihj,ijp->ihp", p_i, x2d, preferred_element_type=jnp.float32)
    accw_ref[:] = accw_ref[:] * jnp.transpose(corr)[:, :, None] + acc_w

    @pl.when(j == nj - 1)
    def _finalize():
        inv_l = 1.0 / l_ref[:]                   # [H, TI]
        os_ref[0] = (accs_ref[:] * inv_l[:, :, None]).astype(os_ref.dtype)
        op_ref[0] = accp_ref[:] * inv_l[:, :, None]
        # Fused pair-value projection: Cp -> dk per head, on the normalized
        # aggregate — the [TI, H, Cp] tensor never leaves VMEM. Batch-h
        # matmul (Mosaic requires equal batch dims on both operands, so the
        # aggregate is transposed to head-major once per i-tile); f32 x f32
        # is tiny here and avoids mixed bf16 dots the interpreter can't run.
        wx2d = jnp.transpose(accw_ref[:], (1, 0, 2)) * inv_l[:, :, None]
        opr_ref[0] = jnp.einsum(
            "hip,hpd->hid",
            wx2d, wpv_ref[:].astype(jnp.float32),
            preferred_element_type=jnp.float32,
        ).astype(opr_ref.dtype)


def pad_axis(x: jax.Array, axis: int, size: int, value=0.0) -> jax.Array:
    """Zero/value-pad ``axis`` up to ``size`` (no-op when already there)."""
    pad = size - x.shape[axis]
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


def padded_len(L: int, tile: int = 128) -> int:
    return -(-L // tile) * tile


# Query-row padding granularity. Rows (sublane-sized) only need fine
# alignment; columns (lane-sized) need 128. Padding rows to 64 instead of
# 128 cuts the rectangular work at non-128-multiple lengths (L=192: 192
# rows instead of 256 = -25%; under the ragged plan L=300 runs 320 rows
# via row_segments instead of 384 = -17%).
ROW_PAD = 64

# Mosaic's block-shape rule: the last two dims of every block must be
# divisible by (8, 128) respectively OR equal the array dims. The q-side
# coordinate planes put the row axis MINOR ([B, 3, H*4, Lq]), so a row tile
# that properly blocks them must be a 128-multiple — the only legal sub-128
# alternative is a FULL-row block (ti == Lq). Full-row blocks are
# VMEM-bounded (the [H*4, ti, 128] f32 distance tile and the [ti, 128, Cp]
# x2d block scale with ti): measured on v5e with the checkpoint-sized model
# (Cp=256, H=32), ti=320 allocates 126.2 MB of scoped VMEM (OOM vs the
# 128 MB chip); ti=192 fits (~76 MB). Beyond FULL_ROW_MAX,
# non-128-multiple row counts fall back to 128-padding in
# ``row_padded_len`` so ``row_tile`` can always return a legal tile.
FULL_ROW_MAX = 192


def row_tile(Lq: int) -> int:
    """Row-tile size for a padded (local) row count ``Lq``.

    Mosaic-legal by construction: 128 when ``Lq`` is a 128-multiple, the
    full ``Lq`` otherwise (a block minor dim equal to the array dim is the
    one sub-128 shape the TPU lowering accepts — see FULL_ROW_MAX). The
    round-3 "largest sub-128 divisor" rule (ti=96 at Lq=192) compiled in
    interpret mode but was rejected by the real Mosaic lowering.

    Raises when the full block would exceed FULL_ROW_MAX: that tile is
    documented to blow the VMEM cap (ti=320 measured 126.2 MB vs the
    120 MiB scope), and without the guard a direct caller bypassing
    ``row_padded_len`` would hit an opaque Mosaic VMEM error instead."""
    if Lq % 8 != 0:
        raise ValueError(f"row count {Lq} must be a multiple of 8")
    if Lq % 128 == 0:
        return 128
    if Lq > FULL_ROW_MAX:
        raise ValueError(
            f"row count {Lq} is not a 128-multiple and a full-row block "
            f"would exceed FULL_ROW_MAX={FULL_ROW_MAX} (VMEM); pad rows via "
            "row_padded_len"
        )
    return Lq


# Columns get the same Mosaic full-block exception as rows: a j-block equal
# to the full (padded) column count is legal at any 8-multiple, so short
# sequences need not pad columns to the next 128 boundary. A full-column
# block must fit VMEM *jointly* with the row tile — the x2d block is
# [ti, tj, Cp] — which bounds tj exactly like FULL_ROW_MAX bounds ti.
# Measured on v5e with the checkpoint-sized model (Cp=256, H=32):
# ti=tj=192 compiles at 115.8 MiB scoped VMEM under the 120 MiB cap —
# batched grids double-buffer the [ti, tj, Cp] x2d block, so the joint
# budget is ~2x the single-step footprint. Capped at the same 192 the
# row side measured.
#
# MODEL-SIZE ASSUMPTION: both 192 caps (and the 120 MiB vmem_limit, and the
# dispatch-model anchors) were validated against the checkpoint-sized model
# only — Cp=256, H=32, dk=16, bf16 x1d. The dominant term scales as
# 2 * ti * tj * Cp * itemsize (double-buffered x2d block) plus the f32
# [H*4, ti, tj] distance tile; a configuration with larger Cp or H that
# lands on a full 192-block will exceed VMEM at compile time. Such callers
# should scale the caps down ~proportionally to Cp*itemsize + 2*H bytes per
# (i, j) cell, or simply keep lengths at 128-multiples (full blocks are an
# optimization for short ragged lengths, never a correctness requirement).
FULL_COL_MAX = 192

# --------------------------------------------------------------------- #
# Round-4 ragged plan: 64-granular ROW padding past the 192 full-block   #
# zone (columns stay 128-multiples — measured negative, see below)       #
# --------------------------------------------------------------------- #
#
# The [257, 331] dead zone (and every non-128-multiple length) pays for
# 128-multiple padding on BOTH axes: L=300 runs a 384x384 kernel, 39% of it
# masked. The Mosaic-legal lever that survives measurement is ROW
# raggedness: rows need not pad to 128-multiples — a 64-multiple row count
# splits into one 128-tile main call plus one 64-row full-block call
# (``row_segments`` / ``fused_ipa_attention_rowsplit``); each call's sliced
# operands make the remainder block's array dim equal its block dim, which
# is the legal sub-128 shape. L=300 then runs 320x384 instead of 384x384.
#
# On-chip stage-1 probe (v5e, checkpoint dims, B=6, one fused layer at the
# L=300 shapes — scripts/probe_deadzone_r4.py, round 4):
#   legacy    384x384 t128:      144.7 ms   (163.6 ns/cell)
#   rowsplit  320x384 t128 cols: 108.1 ms   (146.6 ns/cell)  <- -25% wall
#   fullcol   384x320 tj=320:    143.4 ms   (194.5 ns/cell)  — no win
#   rowsplit  320x320 tj=320:    156.5 ms   (254.7 ns/cell)  — WORSE than
#                                                               legacy
# Ragged COLUMNS (full-column tj blocks past FULL_COL_MAX, VMEM-gated) are
# therefore a recorded NEGATIVE: the single giant j-block forfeits the
# flash j-loop's grid pipelining, costing more than the 17% of streamed
# bytes it saves — and combined with rowsplit it UNDOES the row win.
# Columns always pad to 128-multiples past the short full-block zone.
#
# Gated by RAGGED_PLAN until the end-to-end measurement lands (the dispatch
# anchors are re-fit from the same run); SE3DIFF_RAGGED_PLAN=0/1 overrides.
RAGGED_PLAN = os.environ.get("SE3DIFF_RAGGED_PLAN", "0") == "1"

# Scoped-VMEM budget for the ragged full-block feasibility check. The
# structural estimate below reproduces both measured anchors within 2-5%
# UNDER (192x192 joint block: est 110.6 vs 115.8 MiB measured-OK; 320x128:
# est 123.6 vs 126.2 MiB measured-OOM against the 120 MiB limit), so the
# budget sits between the known-good and known-bad estimates: it admits
# (128, 320) — the L in [257, 320] dead-zone shape, est 113.5 MiB — and
# rejects (128, 384) at 125.5.
FULL_BLOCK_VMEM_BUDGET = 114 * 1024 * 1024


def fused_vmem_bytes(
    ti: int,
    tj: int,
    Lk: int | None = None,
    *,
    cp: int = 256,
    h: int = 32,
    dk: int = 16,
    x_itemsize: int = 2,
    has_pa: bool = True,
) -> int:
    """Structural estimate of the kernel's scoped VMEM footprint for a
    (``ti``, ``tj``) block with model dims (``cp``, ``h``, ``dk``).

    Sums the per-grid-step input/output blocks (doubled: Mosaic
    double-buffers blocks whose index map varies over the grid — with a
    batch grid that is all of them) plus the single-buffered scratch
    accumulators and the in-kernel [H*4, ti, tj] distance temporary, with
    minor dims lane-rounded to 128. Validated against the two measured
    anchors (see FULL_BLOCK_VMEM_BUDGET): 2-5% UNDER the real footprint,
    which the budget's placement accounts for."""
    r128 = lambda n: -(-n // 128) * 128
    Lk = tj if Lk is None else Lk
    h4 = h * 4
    blocks = (
        3 * h * ti * r128(dk) * x_itemsize      # qs + outputs os/opr
        + 2 * h * tj * r128(dk) * x_itemsize    # ks, vs
        + 3 * h4 * r128(ti) * 4                 # qp planes (rows minor)
        + 3 * h4 * r128(tj) * 4                 # kp planes
        + h * tj * r128(24) * 4                 # vp
        + ti * tj * r128(cp) * x_itemsize       # x2d block (the big one)
        + (h * ti * r128(tj) * x_itemsize if has_pa else cp * r128(h) * 4)
        + h * cp * r128(dk) * x_itemsize        # w_pv
        + r128(Lk) * 4                          # bias row
        + h * ti * r128(24) * 4                 # out_point
    )
    scratch = (
        2 * h * r128(ti) * 4                    # m, l
        + h * ti * r128(dk) * 4                 # acc_scalar
        + h * ti * r128(24) * 4                 # acc_point
        + ti * h * r128(cp) * 4                 # acc_pair (head-minor rows)
        + h4 * ti * r128(tj) * 4                # distance tile d2/pdist
    )
    return 2 * blocks + scratch


def col_tile(Lk: int, ti: int = 128) -> int:
    """Column-tile size for a padded column count ``Lk``: 128 when ``Lk``
    is a 128-multiple, the full ``Lk`` otherwise (full-block exception).
    Like ``row_tile``, raises rather than return a VMEM-infeasible full
    block — the contract is enforced here, not just in ``col_padded_len``,
    so direct callers fail with a clear error. ``ti`` is the row-tile the
    block will run with (the VMEM footprint is joint)."""
    if Lk % 8 != 0:
        raise ValueError(f"column count {Lk} must be a multiple of 8")
    if Lk % 128 == 0:
        return 128
    if Lk > FULL_COL_MAX and (
        fused_vmem_bytes(ti, Lk) > FULL_BLOCK_VMEM_BUDGET
    ):
        raise ValueError(
            f"column count {Lk} is not a 128-multiple and a full-column "
            f"block at ti={ti} would exceed the VMEM budget "
            f"({fused_vmem_bytes(ti, Lk) >> 20} MiB est > "
            f"{FULL_BLOCK_VMEM_BUDGET >> 20} MiB); pad columns via "
            "col_padded_len"
        )
    return Lk


def col_padded_len(L: int, ragged: bool | None = None) -> int:
    """Padded key/value-column count for a true length ``L``.

    128-multiples in general; short sequences whose ROW_PAD-aligned count
    is within FULL_COL_MAX and not a 128-multiple run one full-column
    block instead (L=192: 192 columns instead of 256 — 25% less streamed
    x2d/pa HBM traffic, and the flash j-loop collapses to a single step;
    L<=64: 64 columns instead of 128). ``ragged`` is accepted for symmetry
    with ``row_padded_len`` but does NOT change columns: ragged full-column
    blocks past FULL_COL_MAX are a measured on-chip negative (L=300 shapes,
    stage-1 probe — the single giant j-block forfeits grid pipelining;
    rowsplit 320x320 ran 156.5 ms vs legacy 144.7 vs rowsplit-with-128-cols
    108.1). The column count is sharding-independent: a sequence-parallel
    caller shards rows only and replicates the key/value side."""
    del ragged  # columns are plan-independent (see docstring)
    Lp = padded_len(L, ROW_PAD)
    if Lp % 128 != 0 and Lp <= FULL_COL_MAX:
        return Lp
    return padded_len(L)


def row_padded_len(
    L: int, pair_sharding=None, ragged: bool | None = None
) -> int:
    """Padded query-row count for a true length ``L``: ROW_PAD-aligned, and
    additionally divisible by ``n_shards * 8`` when a sequence-parallel
    ``pair_sharding`` (NamedSharding with the row axis at spec[1]) is given,
    so ``sp_fused_ipa_attention`` can split it into >=8-row slabs.

    Guarantees the per-device row count (``Lp / n_shards``) admits a legal
    row tiling: when it is not a 128-multiple and exceeds FULL_ROW_MAX (a
    full-row block would blow VMEM), rows are padded up to per-shard
    128-multiples — unless the ragged plan is on (RAGGED_PLAN, or
    ``ragged=True``) and the caller is single-chip, in which case the
    64-multiple count stands and ``fused_ipa_attention_rowsplit`` runs it
    as a 128-tile main call plus one 64-row full-block call
    (``row_segments``)."""
    import math as _math

    n = 1
    g = ROW_PAD
    if pair_sharding is not None and pair_sharding.spec[1] is not None:
        n = pair_sharding.mesh.shape[pair_sharding.spec[1]]
        g = _math.lcm(g, n * 8)
    Lp = padded_len(L, g)
    if ragged is None:
        ragged = RAGGED_PLAN
    if ragged and n == 1:
        return Lp  # any 64-multiple is runnable via row_segments
    if (Lp // n) % 128 != 0 and Lp // n > FULL_ROW_MAX:
        Lp = padded_len(L, _math.lcm(g, n * 128))
    return Lp


def row_segments(Lq: int) -> tuple[int, ...]:
    """Split a padded row count into per-pallas-call segments, each of which
    admits a legal ``row_tile``: one segment when ``Lq`` is a 128-multiple
    or small enough for a single full-row block, else a 128-multiple main
    segment plus the 64-row remainder (ROW_PAD guarantees the remainder is
    exactly 64). Each segment runs as its own kernel call on row-sliced
    operands, so the remainder's block dim equals its array dim — the
    Mosaic-legal sub-128 shape."""
    if Lq % 128 == 0 or Lq <= FULL_ROW_MAX:
        return (Lq,)
    rem = Lq % 128
    if rem % ROW_PAD != 0:
        raise ValueError(
            f"row count {Lq} is not ROW_PAD({ROW_PAD})-aligned past the "
            "full-block zone; pad rows via row_padded_len"
        )
    return (Lq - rem, rem)


@functools.partial(
    jax.jit,
    static_argnames=("scalar_w", "pair_w", "ti", "tj", "interpret"),
)
def fused_ipa_attention(
    q_s: jax.Array,     # [B, H, Lq, dk]
    k_s: jax.Array,     # [B, H, Lk, dk]
    v_s: jax.Array,     # [B, H, Lk, dk]
    q_p: jax.Array,     # [B, 3, H*4, Lq] f32, pre-scaled by pw[h]
    k_p: jax.Array,     # [B, 3, H*4, Lk]
    v_p: jax.Array,     # [B, H, Lk, 24] f32
    x2d: jax.Array,     # [B, Lq, Lk, Cp]
    w_pb: jax.Array,    # [Cp, H] f32
    w_pv: jax.Array,    # [H, Cp, dk]
    bias: jax.Array,    # [B, Lk] additive column bias (0 / -inf at pads)
    pa: jax.Array | None = None,  # [B, H, Lq, Lk] precomputed pair bias
                                  # (x2d @ w_pb, unscaled); when given, the
                                  # in-kernel bias matmul is skipped and w_pb
                                  # is unused
    *,
    scalar_w: float,
    pair_w: float,
    ti: int = 128,
    tj: int = 128,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Head-major fused IPA core. All operands must already be padded to
    tile multiples — see the module docstring for the layout contract.
    ``Lq`` (query rows) and ``Lk`` (key/value columns) may differ: the
    single-chip path pads rows to ROW_PAD(=64)-multiples and columns per
    ``col_padded_len`` (128-multiples, or one Mosaic-legal full-column
    block for short sequences — true L=192 runs 192x192 with
    ``ti=row_tile(192)=192, tj=col_tile(192)=192``), and a
    sequence-parallel caller passes its local row slab with the full column
    set (the kernel body is row/column symmetric). Returns ``(out_scalar
    [B,H,Lq,dk], out_point [B,H,Lq,24] f32, out_pair [B,H,Lq,dk])``.
    """
    B, H, Lq, dk = q_s.shape
    Lk = k_s.shape[2]
    Cp = x2d.shape[-1]
    assert Lq % ti == 0 and Lk % tj == 0, (Lq, Lk, ti, tj)
    assert x2d.shape[1] == Lq and x2d.shape[2] == Lk, (x2d.shape, Lq, Lk)
    assert bias.shape[-1] == Lk, (bias.shape, Lk)

    bias_rows = bias[:, None, :]  # [B, 1, Lk]

    has_pa = pa is not None
    grid = (B, Lq // ti, Lk // tj)
    kernel = functools.partial(
        # Plain python floats: np scalars would promote f32 math to f64
        # under jax_enable_x64.
        _kernel, scalar_w=float(scalar_w), pair_w=float(pair_w),
        has_pa=has_pa,
    )
    out_shapes = (
        jax.ShapeDtypeStruct((B, H, Lq, dk), q_s.dtype),
        jax.ShapeDtypeStruct((B, H, Lq, 24), jnp.float32),
        jax.ShapeDtypeStruct((B, H, Lq, dk), q_s.dtype),
    )
    vmem = pltpu.VMEM

    if has_pa:
        pb_arg = pa
        pb_spec = pl.BlockSpec(
            (1, H, ti, tj), lambda b, i, j: (b, 0, i, j), memory_space=vmem
        )
    else:
        pb_arg = w_pb
        pb_spec = pl.BlockSpec((Cp, H), lambda b, i, j: (0, 0), memory_space=vmem)

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, H, ti, dk), lambda b, i, j: (b, 0, i, 0), memory_space=vmem),
            pl.BlockSpec((1, H, tj, dk), lambda b, i, j: (b, 0, j, 0), memory_space=vmem),
            pl.BlockSpec((1, H, tj, dk), lambda b, i, j: (b, 0, j, 0), memory_space=vmem),
            pl.BlockSpec((1, 3, H * 4, ti), lambda b, i, j: (b, 0, 0, i), memory_space=vmem),
            pl.BlockSpec((1, 3, H * 4, tj), lambda b, i, j: (b, 0, 0, j), memory_space=vmem),
            pl.BlockSpec((1, H, tj, 24), lambda b, i, j: (b, 0, j, 0), memory_space=vmem),
            pl.BlockSpec((1, ti, tj, Cp), lambda b, i, j: (b, i, j, 0), memory_space=vmem),
            pb_spec,
            pl.BlockSpec((H, Cp, dk), lambda b, i, j: (0, 0, 0), memory_space=vmem),
            pl.BlockSpec((1, 1, Lk), lambda b, i, j: (b, 0, 0), memory_space=vmem),
        ],
        out_specs=(
            pl.BlockSpec((1, H, ti, dk), lambda b, i, j: (b, 0, i, 0), memory_space=vmem),
            pl.BlockSpec((1, H, ti, 24), lambda b, i, j: (b, 0, i, 0), memory_space=vmem),
            pl.BlockSpec((1, H, ti, dk), lambda b, i, j: (b, 0, i, 0), memory_space=vmem),
        ),
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((H, ti), jnp.float32),
            pltpu.VMEM((H, ti), jnp.float32),
            pltpu.VMEM((H, ti, dk), jnp.float32),
            pltpu.VMEM((H, ti, 24), jnp.float32),
            pltpu.VMEM((ti, H, Cp), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            # Lane padding of the narrow point/value tiles inflates VMEM;
            # allow the kernel to use most of the 128 MiB physical VMEM.
            # 120 MiB admits the joint full-row/full-column 192x192 block
            # (115.8 MiB with the checkpoint-sized model once the batch
            # grid double-buffers the x2d block; a single-step B=1 grid
            # needed only ~94 MiB).
            vmem_limit_bytes=120 * 1024 * 1024,
        ),
        interpret=interpret,
    )(q_s, k_s, v_s, q_p, k_p, v_p, x2d, pb_arg, w_pv, bias_rows)


def ipa_attention_reference(
    q_s, k_s, v_s, q_p, k_p, v_p, x2d, w_pb, point_w, bias,
    *, n_head: int, scalar_w: float, pair_w: float,
):
    """Pure-jnp oracle in the *flat* layout ([B, L, H*c] inputs; same math as
    models/dig.py SAAttention, minus the projections and output transforms).
    Returns (out_scalar, out_point, wx2d) — the pair-value projection is NOT
    applied, so tests compose it with w_pv explicitly."""
    B, L = q_s.shape[:2]
    H = n_head
    Lk = k_s.shape[1]  # key length may differ from L (mask tests)
    scalar_w, pair_w = float(scalar_w), float(pair_w)
    qs = q_s.reshape(B, L, H, -1)
    ks = k_s.reshape(B, Lk, H, -1)
    vs = v_s.reshape(B, Lk, H, -1)
    s = jnp.einsum("bihc,bjhc->bhij", qs, ks).astype(jnp.float32) * scalar_w

    qp = q_p.reshape(B, L, H, 4, 3).astype(jnp.float32)
    kp = k_p.reshape(B, Lk, H, 4, 3).astype(jnp.float32)
    qk = jnp.einsum("bihpx,bjhpx->bijhp", qp, kp)
    q2 = jnp.sum(qp**2, axis=-1)
    k2 = jnp.sum(kp**2, axis=-1)
    d2 = jnp.maximum(q2[:, :, None] + k2[:, None] - 2.0 * qk, 0.0)
    pdist = jnp.sum(jnp.sqrt(d2 + 1e-12), axis=-1)  # [B, L, Lk, H]
    s = s - point_w[None, :, None, None] * jnp.transpose(pdist, (0, 3, 1, 2))

    pa = jnp.einsum("bijp,ph->bhij", x2d, w_pb.astype(x2d.dtype)).astype(jnp.float32)
    s = s + pair_w * pa + bias[:, None, None, :]

    a = jax.nn.softmax(s, axis=-1)
    a16 = a.astype(v_s.dtype)
    out_s = jnp.einsum("bhij,bjhc->bihc", a16, vs).reshape(B, L, -1)
    out_p = jnp.einsum(
        "bhij,bjhk->bihk", a, v_p.reshape(B, Lk, H, -1).astype(jnp.float32)
    ).reshape(B, L, -1)
    wx2d = jnp.einsum("bhij,bijp->bihp", a16, x2d)
    return out_s.astype(jnp.float32), out_p, wx2d.astype(jnp.float32)


def sp_fused_ipa_attention(
    sharding,           # NamedSharding of the pair tensor: P(None, axis, ...)
    q_s: jax.Array,     # [B, H, Lq, dk]  (global shapes; rows shard inside)
    k_s: jax.Array,     # [B, H, Lk, dk]  — Lq and Lk may differ: rows pad
    v_s: jax.Array,     #   per row_padded_len (ROW_PAD + shard divisibility),
                        #   columns per col_padded_len (e.g. L=385 on 8
                        #   shards: Lq=448, Lk=512)
    q_p: jax.Array,     # [B, 3, H*4, Lq]
    k_p: jax.Array,     # [B, 3, H*4, Lk]
    v_p: jax.Array,     # [B, H, Lk, 24]
    x2d: jax.Array,     # [B, Lq, Lk, Cp]
    w_pb: jax.Array,
    w_pv: jax.Array,
    bias: jax.Array,    # [B, Lk]
    pa: jax.Array | None = None,  # [B, H, Lq, Lk]
    *,
    scalar_w: float,
    pair_w: float,
    interpret: bool = False,
    backward: str = "auto",
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Sequence-parallel fused IPA: each device runs the flash kernel on its
    row slab of queries with the full key/value columns.

    The pair tensor's row axis is sharded over ``sharding``'s mesh axis
    (the model's SP layout, dig.py ``pair_sharding``); the q-side tensors
    and the precomputed pair bias shard the same rows, while keys/values/
    column bias are replicated (they are O(L*d) — the O(L^2) tensors are
    the ones that matter, SURVEY.md section 5.7). No collectives run in
    steady state: the row partition makes every device's output rows
    disjoint (the flash j-loop already streams all columns).

    Falls back to the single-chip kernel when the axis is unsharded.
    Row-tile size drops to the local slab when a shard is narrower than
    128 rows.
    """
    from jax.sharding import PartitionSpec as P

    mesh = sharding.mesh
    axis = sharding.spec[1]
    tj = col_tile(k_s.shape[2])
    if axis is None:
        return fused_ipa_attention_diff(
            q_s, k_s, v_s, q_p, k_p, v_p, x2d, w_pb, w_pv, bias, pa,
            scalar_w=scalar_w, pair_w=pair_w, ti=row_tile(q_s.shape[2]),
            tj=tj, interpret=interpret, backward=backward,
        )
    n = mesh.shape[axis]
    Lp = q_s.shape[2]
    if Lp % (n * 8) != 0:
        raise ValueError(
            f"padded length {Lp} must split into {n} shards of >=8-row tiles"
        )
    # Row-tile: must divide the local slab AND be Mosaic-legal (128-multiple
    # or the full slab) — row_tile guarantees both; row_padded_len keeps the
    # slab within FULL_ROW_MAX whenever it is not a 128-multiple.
    slab = Lp // n
    ti = row_tile(slab)

    # The projections are explicit (replicated) arguments, not closure
    # captures, so parameter gradients flow through shard_map.
    def local(qs, ks, vs, qp, kp, vp, x2d_l, wpb_l, wpv_l, bias_l, pa_l):
        return fused_ipa_attention_diff(
            qs, ks, vs, qp, kp, vp, x2d_l, wpb_l, wpv_l, bias_l,
            pa_l if pa is not None else None,
            scalar_w=scalar_w, pair_w=pair_w, ti=ti, tj=tj,
            interpret=interpret, backward=backward,
        )

    row3 = P(None, None, axis, None)     # [B, H, Lq, *] and pa
    rowlast = P(None, None, None, axis)  # [B, 3, H*4, Lq]
    repl = P()
    # pa is optional, but shard_map specs are positional: pass a dummy
    # scalar-broadcast when absent (never read — has_pa is static False).
    pa_arg = pa if pa is not None else jnp.zeros((), q_s.dtype)
    out = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(
            row3, repl, repl,
            rowlast, repl, repl,
            P(None, axis, None, None),
            repl, repl, repl,
            row3 if pa is not None else repl,
        ),
        out_specs=(row3, row3, row3),
        check_vma=False,  # pallas_call output varying-axes are untracked
    )(q_s, k_s, v_s, q_p, k_p, v_p, x2d, w_pb, w_pv, bias, pa_arg)
    return out


def _fused_semantics_jnp(
    q_s, k_s, v_s, q_p, k_p, v_p, x2d, w_pb, w_pv, bias, pa=None,
    *, scalar_w: float, pair_w: float,
):
    """jnp twin of the kernel, in the kernel's own layout contract
    (head-major, pre-scaled planes). Used as the differentiable semantics
    for the custom-VJP backward and as an additional oracle."""
    # Plain python floats: np scalars would promote f32 math to f64 under
    # jax_enable_x64 (out_p/out_pair have no dtype-pinning cast).
    scalar_w, pair_w = float(scalar_w), float(pair_w)
    B, H, Lq, dk = q_s.shape
    s = jnp.einsum(
        "bhid,bhjd->bhij", q_s, k_s, preferred_element_type=jnp.float32
    ) * scalar_w

    qp = q_p.astype(jnp.float32)                    # [B, 3, H*4, Lq]
    kp = k_p.astype(jnp.float32)
    q2 = jnp.sum(qp * qp, axis=1)                   # [B, H*4, Lq]
    k2 = jnp.sum(kp * kp, axis=1)
    qk = jnp.einsum("bxpi,bxpj->bpij", qp, kp)      # [B, H*4, Lq, Lk]
    d2 = q2[:, :, :, None] + k2[:, :, None, :] - 2.0 * qk
    # where() instead of maximum(d2, 0) + 1e-24: same forward values (to
    # well below bf16 resolution), but autodiff then gives the clamp's true
    # zero subgradient wherever it binds. maximum()'s tie-gradient at
    # d2 == 0 routes through sqrt'(1e-24) ~ 5e11 — and exactly-coincident
    # bf16 q_p/k_p pairs are common, not measure-zero (the round-4 fused
    # train cells' loss anomalies; see _fused_backward_chunked's note).
    pdist = jnp.sum(
        jnp.sqrt(jnp.where(d2 > 0.0, d2, 1e-24)).reshape(B, H, 4, Lq, -1),
        axis=2,
    )                                               # [B, H, Lq, Lk]
    s = s - pdist

    if pa is None:
        pa = jnp.einsum(
            "bijp,ph->bhij", x2d, w_pb.astype(x2d.dtype),
            preferred_element_type=jnp.float32,
        )
    s = s + pair_w * pa.astype(jnp.float32) + bias[:, None, None, :]

    a = jax.nn.softmax(s, axis=-1)                  # f32
    a16 = a.astype(v_s.dtype)
    out_s = jnp.einsum(
        "bhij,bhjd->bhid", a16, v_s, preferred_element_type=jnp.float32
    ).astype(q_s.dtype)
    out_p = jnp.einsum("bhij,bhjc->bhic", a, v_p.astype(jnp.float32))
    wx2d = jnp.einsum(
        "bhij,bijp->bhip", a16, x2d, preferred_element_type=jnp.float32
    )
    out_pair = jnp.einsum(
        "bhip,hpd->bhid", wx2d, w_pv.astype(jnp.float32)
    ).astype(q_s.dtype)
    return out_s, out_p, out_pair


def _row_chunk(Lq: int, target: int = 128) -> int:
    """Largest divisor of ``Lq`` that is <= target — the backward's
    row-chunk size (any divisor works; this is a VMEM/HBM-transient knob,
    not a Mosaic tiling constraint)."""
    return max(d for d in range(1, min(Lq, target) + 1) if Lq % d == 0)


# ``backward="auto"`` switches fused_ipa_attention_diff to the chunked
# backward once the attention matrix reaches this many elements per
# (batch, head): below it the one-shot autodiff twin is cheap and
# bit-identical to the historical behavior; above it the twin's residuals
# (s, a, qk, d2 — ~5 [B,H(*4),Lq,Lk] f32 tensors live at once) dominate
# peak memory and the chunked recompute wins.
CHUNKED_BWD_MIN_ELEMS = 512 * 512


def _fused_backward_chunked(arrs, ct, *, scalar_w, pair_w, row_chunk=128):
    """Flash-style backward for the fused IPA semantics: recompute the
    attention chunk-of-rows at a time and accumulate input cotangents, so
    no [B, H(*4), Lq, Lk] tensor larger than one row chunk is ever alive
    (the unavoidable exception is d_x2d — the cotangent of an O(L^2)
    *input* is itself O(L^2)).

    Exact calculus on `_fused_semantics_jnp`'s math with two deliberate
    deviations: the attention weights stay f32 where the forward casts
    them to the value dtype (a16, at most 1 bf16 ulp), and the gradient
    of ``maximum(d2, 0)`` is taken as zero wherever the clamp binds
    (``d2 <= 0``) — the clamp's true subgradient. The autodiff twin's
    tie-gradient at d2 == 0 routes through ``sqrt'(1e-24) ~ 5e11``
    instead; at bf16, where coincident q_p/k_p pairs are common, that
    produced the round-4 on-chip training nans.

    Returns cotangents for the positional args of ``fused_ipa_attention``
    (10 arrays, 11 with ``pa``), dtypes matching the primals.
    """
    has_pa = len(arrs) == 11
    q_s, k_s, v_s, q_p, k_p, v_p, x2d, w_pb, w_pv, bias = arrs[:10]
    pa = arrs[10] if has_pa else None
    ct_s, ct_p, ct_pr = ct
    B, H, Lq, dk = q_s.shape
    Lk = k_s.shape[2]
    H4 = q_p.shape[2]
    f32 = jnp.float32
    scalar_w, pair_w = float(scalar_w), float(pair_w)

    ks = k_s.astype(f32)
    vs = v_s.astype(f32)
    kp = k_p.astype(f32)                              # [B, 3, H4, Lk]
    vp = v_p.astype(f32)
    k2 = jnp.sum(kp * kp, axis=1)                     # [B, H4, Lk]
    wpv_f = w_pv.astype(f32)
    wpb_f = w_pb.astype(f32)
    bias_row = bias.astype(f32)[:, None, None, :]

    R = _row_chunk(Lq, row_chunk)
    nI = Lq // R

    def body(carry, i):
        d_ks, d_kp, d_vs, d_vp, d_bias, d_wpb, d_wpv = carry
        r0 = i * R
        sl = lambda x, ax: jax.lax.dynamic_slice_in_dim(x, r0, R, axis=ax)
        qs_i = sl(q_s, 2).astype(f32)                 # [B, H, R, dk]
        qp_i = sl(q_p, 3).astype(f32)                 # [B, 3, H4, R]
        x2f_i = sl(x2d, 1).astype(f32)                # [B, R, Lk, Cp]
        ct_s_i = sl(ct_s, 2).astype(f32)
        ct_p_i = sl(ct_p, 2).astype(f32)
        ct_pr_i = sl(ct_pr, 2).astype(f32)

        # Recompute the chunk's attention row block.
        s = jnp.einsum("bhid,bhjd->bhij", qs_i, ks) * scalar_w
        q2_i = jnp.sum(qp_i * qp_i, axis=1)           # [B, H4, R]
        qk = jnp.einsum("bxpi,bxpj->bpij", qp_i, kp)  # [B, H4, R, Lk]
        d2 = jnp.maximum(
            q2_i[:, :, :, None] + k2[:, :, None, :] - 2.0 * qk, 0.0
        )
        dist = jnp.sqrt(d2 + 1e-24)                   # [B, H4, R, Lk]
        s = s - jnp.sum(dist.reshape(B, H, 4, R, Lk), axis=2)
        if has_pa:
            pa_i = sl(pa, 2).astype(f32)
        else:
            pa_i = jnp.einsum("bijp,ph->bhij", x2f_i, wpb_f)
        s = s + pair_w * pa_i + bias_row
        a = jax.nn.softmax(s, axis=-1)                # [B, H, R, Lk] f32

        # Pair-value path: wx2d for d_w_pv; g_wx2d = d(out_pair)/d(wx2d).
        wx2d_i = jnp.einsum("bhij,bijp->bhip", a, x2f_i)
        g_wx2d = jnp.einsum("bhid,hpd->bhip", ct_pr_i, wpv_f)
        d_wpv = d_wpv + jnp.einsum("bhip,bhid->hpd", wx2d_i, ct_pr_i)

        # Softmax backward over a's three consumers.
        dphat = (
            jnp.einsum("bhid,bhjd->bhij", ct_s_i, vs)
            + jnp.einsum("bhic,bhjc->bhij", ct_p_i, vp)
            + jnp.einsum("bhip,bijp->bhij", g_wx2d, x2f_i)
        )
        ds = a * (dphat - jnp.sum(dphat * a, axis=-1, keepdims=True))

        d_qs_i = scalar_w * jnp.einsum("bhij,bhjd->bhid", ds, ks)
        d_ks = d_ks + scalar_w * jnp.einsum("bhij,bhid->bhjd", ds, qs_i)

        # Point-distance backward in matmul form: d dist/d qp_x =
        # (qp_x - kp_x)/dist, summed against w = d_pdist/dist — spelled as
        # qp_x*rowsum(w) - w@kp_x so the [.., R, Lk, 3] difference tensor
        # never materializes. Where the forward's maximum(d2, 0) clamp
        # binds (d2 <= 0), the distance is locally constant and the true
        # subgradient is zero; dividing by dist = sqrt(1e-24) there instead
        # injects 1e12-scale terms whose cancellation noise is ~1e5 garbage
        # gradient. At bf16, exactly coincident q_p/k_p pairs are NOT
        # measure-zero — this where() is what keeps bf16 training finite
        # (round-4 on-chip `--bwd chunked` runs nan'd without it).
        inv_dist = jnp.where(d2 > 0.0, 1.0 / dist, 0.0)
        w = (-ds)[:, :, None, :, :] * inv_dist.reshape(B, H, 4, R, Lk)
        w = w.reshape(B, H4, R, Lk)
        row_w = jnp.sum(w, axis=-1)                   # [B, H4, R]
        col_w = jnp.sum(w, axis=-2)                   # [B, H4, Lk]
        d_qp_i = qp_i * row_w[:, None] - jnp.einsum("bpij,bxpj->bxpi", w, kp)
        d_kp = d_kp + (
            kp * col_w[:, None] - jnp.einsum("bpij,bxpi->bxpj", w, qp_i)
        )

        # Pair-bias branch: streamed pa gets its own cotangent; the
        # in-kernel variant routes through x2d and w_pb instead.
        ds_pw = pair_w * ds
        d_x2d_i = jnp.einsum("bhip,bhij->bijp", g_wx2d, a)
        if has_pa:
            d_pa_i = ds_pw.astype(pa.dtype)
        else:
            d_wpb = d_wpb + jnp.einsum("bhij,bijp->ph", ds_pw, x2f_i)
            d_x2d_i = d_x2d_i + jnp.einsum("bhij,ph->bijp", ds_pw, wpb_f)

        d_vs = d_vs + jnp.einsum("bhij,bhid->bhjd", a, ct_s_i)
        d_vp = d_vp + jnp.einsum("bhij,bhic->bhjc", a, ct_p_i)
        d_bias = d_bias + jnp.sum(ds, axis=(1, 2))

        ys = (
            d_qs_i.astype(q_s.dtype),
            d_qp_i.astype(q_p.dtype),
            d_x2d_i.astype(x2d.dtype),
        ) + ((d_pa_i,) if has_pa else ())
        return (d_ks, d_kp, d_vs, d_vp, d_bias, d_wpb, d_wpv), ys

    carry0 = (
        jnp.zeros_like(ks), jnp.zeros_like(kp), jnp.zeros_like(vs),
        jnp.zeros_like(vp), jnp.zeros((B, Lk), f32),
        jnp.zeros_like(wpb_f), jnp.zeros_like(wpv_f),
    )
    (d_ks, d_kp, d_vs, d_vp, d_bias, d_wpb, d_wpv), ys = jax.lax.scan(
        body, carry0, jnp.arange(nI)
    )
    d_qs = jnp.moveaxis(ys[0], 0, 2).reshape(B, H, Lq, dk)
    d_qp = jnp.moveaxis(ys[1], 0, 3).reshape(B, 3, H4, Lq)
    d_x2d = jnp.moveaxis(ys[2], 0, 1).reshape(B, Lq, Lk, *x2d.shape[3:])
    grads = (
        d_qs, d_ks.astype(k_s.dtype), d_vs.astype(v_s.dtype),
        d_qp, d_kp.astype(k_p.dtype), d_vp.astype(v_p.dtype),
        d_x2d, d_wpb.astype(w_pb.dtype), d_wpv.astype(w_pv.dtype),
        d_bias.astype(bias.dtype),
    )
    if has_pa:
        d_pa = jnp.moveaxis(ys[3], 0, 2).reshape(B, H, Lq, Lk)
        grads = grads + (d_pa,)
    return grads


def fused_ipa_attention_diff(
    q_s, k_s, v_s, q_p, k_p, v_p, x2d, w_pb, w_pv, bias, pa=None,
    *, scalar_w: float, pair_w: float, ti: int = 128, tj: int = 128,
    interpret: bool = False, backward: str = "auto",
):
    """Differentiable fused IPA: the Pallas kernel forward with a
    recompute-based backward.

    `pallas_call` defines no VJP, so `jax.grad` through the raw kernel is
    an error — training/finetuning could not use the fused path at all.
    This wrapper runs the kernel forward unchanged and, on the backward
    pass, differentiates recomputed semantics from the saved inputs.
    ``backward`` selects how:

    - ``"full"`` — one jax.vjp over `_fused_semantics_jnp` (bit-compatible
      math in the same layout). Peak memory holds ~5 [B, H(*4), Lq, Lk]
      f32 residuals at once — fine at moderate L.
    - ``"chunked"`` — `_fused_backward_chunked`: flash-style recompute
      over row chunks; the only L^2 tensor alive is d_x2d itself. The
      long-L training completion.
    - ``"auto"`` (default) — "chunked" once Lq*Lk >= CHUNKED_BWD_MIN_ELEMS
      (512^2), "full" below.
    """
    if backward not in ("auto", "full", "chunked"):
        raise ValueError(
            f"backward={backward!r}: expected 'auto', 'full', or 'chunked'"
        )
    statics = dict(scalar_w=scalar_w, pair_w=pair_w)
    has_pa = pa is not None
    use_chunked = backward == "chunked" or (
        backward == "auto"
        and q_s.shape[2] * k_s.shape[2] >= CHUNKED_BWD_MIN_ELEMS
    )

    @jax.custom_vjp
    def f(*arrs):
        return fused_ipa_attention(
            *arrs[:10], arrs[10] if has_pa else None,
            ti=ti, tj=tj, interpret=interpret, **statics,
        )

    def f_fwd(*arrs):
        return f(*arrs), arrs

    def f_bwd(arrs, ct):
        if use_chunked:
            return _fused_backward_chunked(arrs, ct, **statics)
        _, vjp = jax.vjp(
            lambda *a: _fused_semantics_jnp(
                *a[:10], a[10] if has_pa else None, **statics
            ),
            *arrs,
        )
        return vjp(ct)

    f.defvjp(f_fwd, f_bwd)
    args = (q_s, k_s, v_s, q_p, k_p, v_p, x2d, w_pb, w_pv, bias)
    if has_pa:
        args = args + (pa,)
    return f(*args)


def fused_ipa_attention_rowsplit(
    q_s, k_s, v_s, q_p, k_p, v_p, x2d, w_pb, w_pv, bias, pa=None,
    *, scalar_w: float, pair_w: float, interpret: bool = False,
    backward: str = "auto",
):
    """Single-chip fused IPA entry point for ANY ``row_padded_len`` /
    ``col_padded_len`` shape, including the ragged ones: derives the tiling
    from the operand shapes and, when the padded row count is a
    non-128-multiple past the full-block zone (ragged plan), runs the
    kernel as one 128-tile main call plus one 64-row full-block call over
    row-sliced operands, concatenating the outputs (``row_segments``).

    The row slices are contiguous and layer-invariant, so XLA CSEs them
    across the encoder stack; the k/v-side operands and the column bias are
    shared by both calls. Differentiable exactly like
    ``fused_ipa_attention_diff`` (each segment carries its own custom VJP;
    slice/concat transpose to concat/slice)."""
    Lq = q_s.shape[2]
    Lk = k_s.shape[2]
    segs = row_segments(Lq)
    tj = col_tile(Lk, ti=max(row_tile(s) for s in segs))
    kw = dict(
        scalar_w=scalar_w, pair_w=pair_w, interpret=interpret,
        backward=backward,
    )
    if len(segs) == 1:
        return fused_ipa_attention_diff(
            q_s, k_s, v_s, q_p, k_p, v_p, x2d, w_pb, w_pv, bias, pa,
            ti=row_tile(Lq), tj=tj, **kw,
        )
    outs = []
    off = 0
    for seg in segs:
        sl = slice(off, off + seg)
        outs.append(
            fused_ipa_attention_diff(
                q_s[:, :, sl], k_s, v_s,
                q_p[:, :, :, sl], k_p, v_p,
                x2d[:, sl], w_pb, w_pv, bias,
                None if pa is None else pa[:, :, sl],
                ti=row_tile(seg), tj=tj, **kw,
            )
        )
        off += seg
    return tuple(
        jnp.concatenate([o[i] for o in outs], axis=2) for i in range(3)
    )
