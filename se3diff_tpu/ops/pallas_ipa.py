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
    out_scalar[i,h,:] = sum_j a v_s          (bf16 in, f32 accum)
    out_point[i,h,:]  = sum_j a v_p          (f32 — the reference's fp32
                                              island, structure_module.py:193)
    wx2d[i,h,:]       = sum_j a x2d[i,j,:]   (pair-value aggregation pushed
                                              before the Cp->dk projection)

Point distances use the |q|^2+|k|^2-2qk expansion; the [TI,TJ,H,4]
distance tile never leaves VMEM.

The jnp reference implementation (`ipa_attention_reference`) is the oracle;
`tests/test_pallas_ipa.py` checks both paths in interpreter mode.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _kernel(
    # inputs
    qs_ref, ks_ref, vs_ref,          # [1, TI|TJ, H*dk]
    qp_ref, kp_ref, vp_ref,          # [1, TI|TJ, H*12], vp [1, TJ, H*24]
    x2d_ref,                         # [1, TI, TJ, Cp]
    wpb_ref,                         # [Cp, H]
    pw_ref,                          # [1, H] (0.5 * point_weight * softplus(gamma))
    bias_ref,                        # [1, 1, Lp_j] (full padded row)
    # outputs
    os_ref,                          # [1, TI, H*dk] f32
    op_ref,                          # [1, TI, H*24] f32
    ow_ref,                          # [1, TI, H, Cp] f32
    # scratch
    m_ref, l_ref,                    # [H, TI] f32
    *,
    n_head: int,
    scalar_w: float,
    pair_w: float,
):
    j = pl.program_id(2)
    nj = pl.num_programs(2)
    TI = qs_ref.shape[1]
    TJ = ks_ref.shape[1]
    H = n_head

    @pl.when(j == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        os_ref[:] = jnp.zeros_like(os_ref)
        op_ref[:] = jnp.zeros_like(op_ref)
        ow_ref[:] = jnp.zeros_like(ow_ref)

    qs = qs_ref[0].reshape(TI, H, -1)          # [TI, H, dk] bf16
    ks = ks_ref[0].reshape(TJ, H, -1)
    s = jnp.einsum(
        "ihc,jhc->hij", qs, ks, preferred_element_type=jnp.float32
    ) * scalar_w                                # [H, TI, TJ]

    # (h, p) folded into one batch axis: Mosaic matmuls support a single
    # batch dimension.
    qp = qp_ref[0].reshape(TI, H * 4, 3).astype(jnp.float32)
    kp = kp_ref[0].reshape(TJ, H * 4, 3).astype(jnp.float32)
    qk = jnp.einsum("ibx,jbx->bij", qp, kp, preferred_element_type=jnp.float32)
    q2 = jnp.transpose(jnp.sum(qp * qp, axis=-1))  # [H*4, TI]
    k2 = jnp.transpose(jnp.sum(kp * kp, axis=-1))  # [H*4, TJ]
    d2 = q2[:, :, None] + k2[:, None, :] - 2.0 * qk  # [H*4, TI, TJ]
    pdist = jnp.sum(
        jnp.sqrt(jnp.maximum(d2, 0.0) + 1e-12).reshape(H, 4, TI, TJ), axis=1
    )  # [H, TI, TJ]
    s = s - pw_ref[0][:, None, None] * pdist

    x2d = x2d_ref[0]                             # [TI, TJ, Cp]
    pa = jnp.einsum(
        "ijp,ph->hij", x2d, wpb_ref[:].astype(x2d.dtype),
        preferred_element_type=jnp.float32,
    )
    bias_tile = bias_ref[0, 0, pl.ds(j * TJ, TJ)]
    s = s + pair_w * pa + bias_tile[None, None, :]

    # Online softmax update.
    m_prev = m_ref[:]                            # [H, TI]
    m_cur = jnp.max(s, axis=-1)                  # [H, TI]
    m_new = jnp.maximum(m_prev, m_cur)
    corr = jnp.exp(m_prev - m_new)               # [H, TI]
    p = jnp.exp(s - m_new[:, :, None])           # [H, TI, TJ]
    m_ref[:] = m_new
    l_ref[:] = l_ref[:] * corr + jnp.sum(p, axis=-1)

    p16 = p.astype(vs_ref.dtype)
    vs = vs_ref[0].reshape(TJ, H, -1)
    acc_s = jnp.einsum("hij,jhc->ihc", p16, vs, preferred_element_type=jnp.float32)
    os_ref[0] = (
        os_ref[0].reshape(TI, H, -1) * jnp.transpose(corr)[:, :, None] + acc_s
    ).reshape(TI, -1)

    vp = vp_ref[0].reshape(TJ, H, -1).astype(jnp.float32)
    acc_p = jnp.einsum("hij,jhk->ihk", p, vp, preferred_element_type=jnp.float32)
    op_ref[0] = (
        op_ref[0].reshape(TI, H, -1) * jnp.transpose(corr)[:, :, None] + acc_p
    ).reshape(TI, -1)

    acc_w = jnp.einsum("hij,ijp->ihp", p16, x2d, preferred_element_type=jnp.float32)
    ow_ref[0] = ow_ref[0] * jnp.transpose(corr)[:, :, None] + acc_w

    @pl.when(j == nj - 1)
    def _finalize():
        inv_l = jnp.transpose(1.0 / l_ref[:])[:, :, None]  # [TI, H, 1]
        os_ref[0] = (os_ref[0].reshape(TI, H, -1) * inv_l).reshape(TI, -1)
        op_ref[0] = (op_ref[0].reshape(TI, H, -1) * inv_l).reshape(TI, -1)
        ow_ref[0] = ow_ref[0] * inv_l


def _pad_to(x: jax.Array, axis: int, size: int, value=0.0) -> jax.Array:
    pad = size - x.shape[axis]
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


@functools.partial(
    jax.jit,
    static_argnames=("n_head", "scalar_w", "pair_w", "ti", "tj", "interpret"),
)
def fused_ipa_attention(
    q_s: jax.Array,     # [B, L, H*dk]
    k_s: jax.Array,
    v_s: jax.Array,
    q_p: jax.Array,     # [B, L, H*12] global-frame query points
    k_p: jax.Array,
    v_p: jax.Array,     # [B, L, H*24]
    x2d: jax.Array,     # [B, L, L, Cp]
    w_pb: jax.Array,    # [Cp, H]
    point_w: jax.Array,  # [H] = 0.5 * point_weight * softplus(gamma)
    bias: jax.Array,    # [B, L] additive column bias (0 / -inf mask)
    *,
    n_head: int,
    scalar_w: float,
    pair_w: float,
    ti: int = 64,
    tj: int = 64,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Returns (out_scalar [B,L,H*dk] f32, out_point [B,L,H*24] f32,
    wx2d [B,L,H,Cp] f32)."""
    B, L = q_s.shape[:2]
    Cp = x2d.shape[-1]
    H = n_head

    Lp_i = -(-L // ti) * ti
    Lp_j = -(-L // tj) * tj
    qs = _pad_to(q_s, 1, Lp_i)
    qp = _pad_to(q_p, 1, Lp_i)
    ks = _pad_to(k_s, 1, Lp_j)
    vs = _pad_to(v_s, 1, Lp_j)
    kp = _pad_to(k_p, 1, Lp_j)
    vp = _pad_to(v_p, 1, Lp_j)
    x2 = _pad_to(_pad_to(x2d, 1, Lp_i), 2, Lp_j)
    # Padded key columns are masked out; padded query rows produce garbage
    # that is sliced away.
    bias_cols = _pad_to(bias, 1, Lp_j, value=NEG_INF)

    grid = (B, Lp_i // ti, Lp_j // tj)
    kernel = functools.partial(
        # Plain python floats: np scalars would promote f32 math to f64
        # under jax_enable_x64.
        _kernel, n_head=H, scalar_w=float(scalar_w), pair_w=float(pair_w)
    )
    out_shapes = (
        jax.ShapeDtypeStruct((B, Lp_i, qs.shape[-1]), jnp.float32),
        jax.ShapeDtypeStruct((B, Lp_i, vp.shape[-1]), jnp.float32),
        jax.ShapeDtypeStruct((B, Lp_i, H, Cp), jnp.float32),
    )
    vmem = pltpu.VMEM

    os_, op_, ow_ = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, ti, qs.shape[-1]), lambda b, i, j: (b, i, 0), memory_space=vmem),
            pl.BlockSpec((1, tj, ks.shape[-1]), lambda b, i, j: (b, j, 0), memory_space=vmem),
            pl.BlockSpec((1, tj, vs.shape[-1]), lambda b, i, j: (b, j, 0), memory_space=vmem),
            pl.BlockSpec((1, ti, qp.shape[-1]), lambda b, i, j: (b, i, 0), memory_space=vmem),
            pl.BlockSpec((1, tj, kp.shape[-1]), lambda b, i, j: (b, j, 0), memory_space=vmem),
            pl.BlockSpec((1, tj, vp.shape[-1]), lambda b, i, j: (b, j, 0), memory_space=vmem),
            pl.BlockSpec((1, ti, tj, Cp), lambda b, i, j: (b, i, j, 0), memory_space=vmem),
            pl.BlockSpec((Cp, H), lambda b, i, j: (0, 0), memory_space=vmem),
            pl.BlockSpec((1, H), lambda b, i, j: (0, 0), memory_space=vmem),
            pl.BlockSpec((1, 1, Lp_j), lambda b, i, j: (b, 0, 0), memory_space=vmem),
        ],
        out_specs=(
            pl.BlockSpec((1, ti, qs.shape[-1]), lambda b, i, j: (b, i, 0), memory_space=vmem),
            pl.BlockSpec((1, ti, vp.shape[-1]), lambda b, i, j: (b, i, 0), memory_space=vmem),
            pl.BlockSpec((1, ti, H, Cp), lambda b, i, j: (b, i, 0, 0), memory_space=vmem),
        ),
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((H, ti), jnp.float32),
            pltpu.VMEM((H, ti), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(qs, ks, vs, qp, kp, vp, x2, w_pb, point_w.reshape(1, H), bias_cols[:, None, :])

    return os_[:, :L], op_[:, :L], ow_[:, :L]


def ipa_attention_reference(
    q_s, k_s, v_s, q_p, k_p, v_p, x2d, w_pb, point_w, bias,
    *, n_head: int, scalar_w: float, pair_w: float,
):
    """Pure-jnp oracle with identical inputs/outputs (same math as
    models/dig.py SAAttention, minus the projections and output transforms)."""
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
    pdist = jnp.sum(jnp.sqrt(d2 + 1e-12), axis=-1)  # [B, L, L, H]
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
