"""Distributional-Graphormer score network (DiG) in flax.linen.

TPU-native re-implementation of the reference score model
(`bioemu/src/bioemu/models.py`, `bioemu/src/bioemu/structure_module.py`),
operating on dense ``[B, L, ...]`` batches from the start (no sparse
torch_geometric batching; SURVEY.md section 7).

Architecture parity notes (each mirrors a documented reference behavior):

* ``SAAttention`` is the DiG variant of AF2 IPA Alg 22
  (structure_module.py:56-220): scalar qkv, 4 query/key points, 8 value
  points, pair bias, learned per-head point weight ``softplus(gamma)``, an
  extra ``pair_value`` projection AF2 does not have, and point-attention
  logits that sum Euclidean *norms* (not squared distances) over points.
* Point aggregation runs in float32 regardless of the compute dtype
  (structure_module.py:193-196's autocast-disable island).
* The translation score is made equivariant via ``IR_perturbed^T @ T_eps``
  (models.py:305) and the wrapper feeds *inverse* rotations and ``t * 1000``
  (models.py:359-384).

Checkpoint note: torch ``nn.Linear`` stores ``weight [out, in]``; flax
kernels are ``[in, out]`` — the converter in ``se3diff_tpu.models.convert``
transposes accordingly.
"""

from __future__ import annotations

import math
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

# Evoformer embedding dims (models.py:15-16).
EVOFORMER_NODE_DIM = 384
EVOFORMER_EDGE_DIM = 128


class SinusoidalPositionEmbedder(nn.Module):
    """DiG-style sinusoidal time embedding (models.py:19-69).

    The input scalar is rescaled to [0, 1000] (the DiG integer-step range).
    """

    dim: int
    max_period: int = 10_000
    min_input: float = 0.0
    max_input: float = 1000.0

    @nn.compact
    def __call__(self, time: jax.Array) -> jax.Array:
        half_dim = self.dim // 2
        factor = -math.log(self.max_period) / (half_dim - 1)
        time = (time - self.min_input) * 1000.0 / (self.max_input - self.min_input)
        freqs = jnp.exp(jnp.arange(half_dim, dtype=jnp.float32) * factor)
        args = time[:, None].astype(jnp.float32) * freqs[None, :]
        return jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)


def relative_position_bucket(
    relative_position: jax.Array, num_buckets: int, max_distance: int
) -> jax.Array:
    """DiG bucketing of relative sequence offsets (models.py:95-126).

    Half the buckets encode sign; within each half, near offsets get exact
    buckets and far offsets log-spaced ones.
    """
    num_buckets //= 2
    ret = (relative_position < 0).astype(jnp.int32) * num_buckets
    rp = jnp.abs(relative_position)
    max_exact = num_buckets // 2
    is_small = rp < max_exact

    # Guard log(0); the value is unused where is_small.
    rp_safe = jnp.maximum(rp, 1)
    val_if_large = max_exact + (
        jnp.log(rp_safe.astype(jnp.float32) / max_exact)
        / math.log(max_distance / max_exact)
        * (num_buckets - max_exact)
    ).astype(jnp.int32)
    val_if_large = jnp.minimum(val_if_large, num_buckets - 1)

    return ret + jnp.where(is_small, rp, val_if_large)


class RelativePositionBias(nn.Module):
    """Learnable embedding of bucketed relative positions (models.py:72-145)."""

    num_buckets: int = 64
    max_distance: int = 256
    out_dim: int = 2

    @nn.compact
    def __call__(self, relative_position: jax.Array) -> jax.Array:
        bucket = relative_position_bucket(
            relative_position, self.num_buckets, self.max_distance
        )
        emb = nn.Embed(self.num_buckets, self.out_dim, name="relative_attention_bias")
        return emb(bucket)


class FeedForward(nn.Module):
    """Single-hidden-layer MLP with GELU + dropout (structure_module.py:12-26)."""

    d_model: int
    dim_feedforward: int
    dropout: float
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        x = nn.Dense(self.dim_feedforward, dtype=self.dtype, name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        x = nn.Dense(self.d_model, dtype=self.dtype, name="fc2")(x)
        return nn.Dropout(self.dropout, deterministic=deterministic)(x)


class DiffHead(nn.Module):
    """Two [LN, Linear, ReLU, Linear] heads -> (T_eps, IR_eps)
    (structure_module.py:29-53)."""

    ninp: int

    @nn.compact
    def __call__(self, x: jax.Array) -> tuple[jax.Array, jax.Array]:
        def head(name: str) -> jax.Array:
            h = nn.LayerNorm(epsilon=1e-5, use_fast_variance=False, name=f"{name}_ln")(x)
            h = nn.Dense(self.ninp, name=f"{name}_fc1")(h)
            h = nn.relu(h)
            return nn.Dense(3, name=f"{name}_fc2")(h)

        return head("fc_t"), head("fc_eps")


class HeadwiseLinear(nn.Module):
    """Per-head slice of a Dense kernel: input ``[..., H, Cin]`` -> output
    ``[..., H, features/H]`` where head h uses kernel columns
    ``[h*dk : (h+1)*dk]``. Parameter-compatible with ``nn.Dense(features)``
    (kernel ``[Cin, features]``, no bias)."""

    features: int
    n_head: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (x.shape[-1], self.features),
        )
        k = kernel.astype(self.dtype).reshape(x.shape[-1], self.n_head, -1)
        return jnp.einsum("...hp,phc->...hc", x.astype(self.dtype), k)


class DenseKernel(nn.Module):
    """Bare no-bias Dense kernel (param-compatible with nn.Dense); returned
    raw so fused kernels can consume it directly."""

    in_features: int
    features: int

    @nn.compact
    def __call__(self) -> jax.Array:
        return self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (self.in_features, self.features),
        )


class SAAttention(nn.Module):
    """DiG invariant point attention (structure_module.py:56-220).

    ``use_pallas`` (True/False/"auto") routes the attention core (logits +
    online softmax + scalar/point/pair aggregation) through the fused
    flash-style TPU kernel in ops/pallas_ipa.py; the jnp path is its
    oracle. "auto" picks the measured-faster path by sequence length
    (fused on TPU where ops.pallas_ipa.predicted_fused_advantage > 1).
    """

    d_model: int
    d_pair: int
    n_head: int
    dropout: float = 0.1
    dtype: Any = jnp.float32
    use_pallas: bool | str = False
    # NamedSharding of the pair tensor when running sequence-parallel: the
    # fused branch then runs the kernel on each device's row slab with the
    # full column set (ops/pallas_ipa.py::sp_fused_ipa_attention).
    pair_sharding: Any = None
    # Backward strategy for the fused path: "auto" (chunked recompute
    # at Lq*Lk >= 512^2, one-shot twin below), "full", or "chunked"
    # (ops/pallas_ipa.py::fused_ipa_attention_diff).
    fused_backward: str = "auto"
    # Run batch size, if the caller knows it: charges the "auto" dispatch
    # for sub-anchor occupancy (B*L below the ~2048 anchor schedule the
    # throughput model was measured on — at L=256/B=1 the fused path loses
    # 33% where the uncorrected model picked it). None = anchor occupancy.
    dispatch_batch: int | None = None

    @nn.compact
    def __call__(
        self,
        x1d: jax.Array,  # [B, L, C]
        x2d: jax.Array,  # [B, L, L, Cp]
        pose: tuple[jax.Array, jax.Array],  # (T [B, L, 3], IR [B, L, 3, 3])
        bias: jax.Array,  # [B, 1, 1, L] additive mask
        deterministic: bool = True,
        pa: jax.Array | None = None,  # [B, H, L, L] precomputed pair bias
                                      # (x2d @ pair_bias kernel, unscaled)
    ) -> jax.Array:
        if self.d_model % self.n_head != 0:
            raise ValueError("d_model must be a multiple of n_head")
        H, dk = self.n_head, self.d_model // self.n_head
        B, L, _ = x1d.shape
        # The module receives inverse rotations; transpose back to rotations.
        T, R = pose[0], jnp.swapaxes(pose[1], -1, -2)

        dense = lambda feats, name: nn.Dense(
            feats, use_bias=False, dtype=self.dtype, name=name
        )

        q_scalar = dense(self.d_model, "scalar_query")(x1d).reshape(B, L, H, dk)
        k_scalar = dense(self.d_model, "scalar_key")(x1d).reshape(B, L, H, dk)
        v_scalar = dense(self.d_model, "scalar_value")(x1d).reshape(B, L, H, dk)

        scalar_weight = 1.0 / math.sqrt(3 * dk)

        # Point tensors live in coordinate-plane ("x-major") layout
        # [B, L, 3, P] with P = H*npts: the checkpoint kernel's
        # (head, point, xyz)-minor columns are permuted at trace time so the
        # minor dim of every point tensor is the lane-wide P, never the
        # width-3 xyz axis. TPU fusions over the [B, L, L, P] distance block
        # are lane-dense this way; with xyz minor they run ~10x slower
        # (width-3/4 lanes). The param tree is unchanged (DenseKernel is
        # nn.Dense-compatible), so checkpoint conversion is untouched.
        def point_planes(name: str, npts: int) -> jax.Array:
            # P is packed point-major (p*H + h) so reductions over the point
            # index read contiguous lane blocks.
            P = H * npts
            w = DenseKernel(self.d_model, P * 3, name=name)()
            wx = jnp.transpose(w.reshape(self.d_model, H, npts, 3), (0, 3, 2, 1))
            wx = wx.reshape(self.d_model, 3 * P).astype(self.dtype)
            return (x1d @ wx).reshape(B, L, 3, P)

        q_point = point_planes("point_query", 4)
        k_point = point_planes("point_key", 4)
        v_point = point_planes("point_value", 8)

        def apply_affine(p: jax.Array) -> jax.Array:
            # x -> R x + T on planes: out[b,l,x,p] = sum_y R[b,l,x,y] p[b,l,y,p].
            return jnp.einsum("blxy,blyp->blxp", R, p) + T[..., None]

        q_point_g = apply_affine(q_point)  # [B, L, 3, H*4] float32
        k_point_g = apply_affine(k_point)
        v_point_g = apply_affine(v_point)  # [B, L, 3, H*8] float32

        gamma = self.param(
            "trained_point_weight",
            lambda key, shape: jax.random.uniform(key, shape),
            (H,),
        )
        point_weight = (1.0 / math.sqrt(3 * 4 * 9 / 2)) * jax.nn.softplus(gamma)
        pair_weight = 1.0 / math.sqrt(3)
        w_pb = DenseKernel(self.d_pair, H, name="pair_bias")()

        from se3diff_tpu.ops.pallas_ipa import resolve_use_pallas

        if resolve_use_pallas(self.use_pallas, L, self.pair_sharding, self.dispatch_batch):
            # Layout contract of ops/pallas_ipa.py: L is already padded to a
            # tile multiple (StructureModule pads once per forward), qkv go
            # in head-major, points as pre-scaled coordinate planes, and the
            # pair-value projection is fused into the kernel finalize (its
            # [B, L, H, Cp] aggregate never reaches HBM). The per-layer
            # relayouts below touch only [B, L, ~512]-sized tensors.
            from se3diff_tpu.ops.pallas_ipa import (
                NEG_INF, fused_ipa_attention_rowsplit, pad_axis,
            )

            head_major = lambda x: jnp.transpose(x, (0, 2, 1, 3))
            pw = (0.5 * point_weight).astype(jnp.float32)
            # Rectangular padding: x2d/bias columns may exceed the row count
            # (rows pad to ROW_PAD, columns to 128). The k/v-side operands
            # are tiny [B, H, L, <=24] tensors; the padded columns are
            # killed by the NEG_INF bias.
            Lk = x2d.shape[2]
            pad_k = (lambda a, ax: pad_axis(a, ax, Lk)) if Lk != L else (
                lambda a, ax: a
            )

            def planes(p):
                # [B, L, 3, 4*H] point-major -> the kernel's head-major
                # [B, 3, H*4, L], pw-scaled.
                p = jnp.transpose(p.reshape(B, L, 3, 4, H), (0, 2, 4, 3, 1))
                p = p.reshape(B, 3, H * 4, L)
                return p.astype(jnp.float32) * jnp.repeat(pw, 4)[None, None, :, None]

            v_point_hcx = jnp.transpose(
                v_point_g.astype(jnp.float32).reshape(B, L, 3, 8, H),
                (0, 1, 4, 3, 2),
            ).reshape(B, L, H, 24)
            w_pv = DenseKernel(self.d_pair, self.d_model, name="pair_value")()
            kernel_args = (
                head_major(q_scalar),
                pad_k(head_major(k_scalar), 2),
                pad_k(head_major(v_scalar), 2),
                planes(q_point_g),
                pad_k(planes(k_point_g), 3),
                pad_k(head_major(v_point_hcx), 2),
                x2d,
                w_pb.astype(jnp.float32),
                jnp.transpose(
                    w_pv.astype(x1d.dtype).reshape(self.d_pair, H, dk), (1, 0, 2)
                ),
                jnp.maximum(bias[:, 0, 0, :].astype(jnp.float32), NEG_INF),
                pa,
            )
            kernel_kw = dict(
                scalar_w=scalar_weight,
                pair_w=pair_weight,
                # Interpreter fallback keeps the fused path testable on CPU.
                interpret=jax.default_backend() != "tpu",
                backward=self.fused_backward,
            )
            if self.pair_sharding is not None:
                # Sequence-parallel: the kernel runs on this device's query
                # rows against all columns (pair rows already sharded).
                from se3diff_tpu.ops.pallas_ipa import sp_fused_ipa_attention

                os_hm, op_hm, out_pair_hd = sp_fused_ipa_attention(
                    self.pair_sharding, *kernel_args, **kernel_kw
                )
            else:
                # Derives tiling from the padded shapes; under the ragged
                # plan a non-128-multiple row count runs as a 128-tile main
                # call plus one 64-row full-block call (ops/pallas_ipa.py
                # row_segments).
                os_hm, op_hm, out_pair_hd = fused_ipa_attention_rowsplit(
                    *kernel_args, **kernel_kw
                )
            out_scalar = head_major(os_hm).reshape(B, L, -1).astype(x1d.dtype)
            out_point_g = head_major(op_hm)  # [B, L, H, 24] float32
            out_pair = head_major(out_pair_hd).reshape(B, L, -1).astype(x1d.dtype)
        else:
            scalar_attn = jnp.einsum(
                "bihc,bjhc->bhij", q_scalar * scalar_weight, k_scalar
            )

            # DiG sums Euclidean norms over the 4 query points (NOT squared
            # distances as in AF2) — structure_module.py:166-173. The squared
            # distances come from the |q|^2 + |k|^2 - 2 q.k expansion on the
            # x-major planes: the hot [B, L, L, H*4] block is built from
            # three lane-dense broadcast FMAs (per xyz plane) instead of a
            # K=3 batched matmul or a [B, L, L, H, 4, 3] difference tensor,
            # and the point index stays minor so the sqrt fusion is
            # lane-dense.
            # |q|^2 + |k|^2 - 2 q.k expansion on FLAT (head, point, xyz)-
            # minor f32 tensors, exactly the spelling XLA compiles to a
            # VPU-peak fused dot+sqrt+reduce when its operands sit at
            # standard layouts (the optimization barrier pins that
            # materialization; without it, layout assignment propagates a
            # transposed layout from the affine transform into the fusion
            # and the emitter runs ~10x slower).
            def flat_hpx(p, npts):
                # [B, L, 3, npts*H] point-major planes -> [B, L, H, npts, 3]
                f = jnp.transpose(
                    p.astype(jnp.float32).reshape(B, L, 3, npts, H),
                    (0, 1, 4, 3, 2),
                ).reshape(B, L, -1)
                return jax.lax.optimization_barrier(f).reshape(B, L, H, npts, 3)

            qp = flat_hpx(q_point_g, 4)
            kp = flat_hpx(k_point_g, 4)
            qk = jnp.einsum("bihpx,bjhpx->bijhp", qp, kp)
            q2 = jnp.sum(jnp.square(qp), axis=-1)  # [B, L, H, 4]
            k2 = jnp.sum(jnp.square(kp), axis=-1)
            d2 = jnp.maximum(q2[:, :, None] + k2[:, None] - 2.0 * qk, 0.0)
            point_dist = jnp.sqrt(d2 + 1e-12)  # [B, L, L, H, 4]
            point_attn = -0.5 * point_weight[:, None, None] * jnp.transpose(
                jnp.sum(point_dist, axis=-1), (0, 3, 1, 2)
            )

            if pa is not None:
                pair_attn = pair_weight * pa
            else:
                pair_attn = pair_weight * jnp.transpose(
                    jnp.einsum("bijp,ph->bijh", x2d, w_pb.astype(x2d.dtype)),
                    (0, 3, 1, 2),
                )

            attn_logits = scalar_attn + point_attn + pair_attn + bias
            attn = jax.nn.softmax(
                attn_logits.astype(jnp.float32), axis=-1
            ).astype(x1d.dtype)

            out_scalar = jnp.einsum("bhij,bjhc->bihc", attn, v_scalar)

            # fp32 island for point aggregation (structure_module.py:193-196).
            # The aggregation wants head-batched values: one small transpose
            # of the [B, L, 3, H*8] planes to (head, point, xyz)-minor.
            v_point_hcx = jnp.transpose(
                v_point_g.astype(jnp.float32).reshape(B, L, 3, 8, H),
                (0, 1, 4, 3, 2),
            ).reshape(B, L, H, 24)
            out_point_g = jnp.einsum(
                "bhij,bjhc->bihc", attn.astype(jnp.float32), v_point_hcx
            )  # [B, L, H, 24] float32, (point, xyz)-minor per head
            wx2d = jnp.einsum("bhij,bijp->bihp", attn, x2d)

            # out_pair = attn . pair_value(x2d); projecting AFTER the
            # attention contraction is algebraically identical (both linear)
            # but replaces the [B, L, L, H*dk] pair-value tensor with a
            # [B, L, H, Cp] intermediate — the single largest HBM saving in
            # the layer. The parameter keeps the reference's Dense layout
            # (kernel [Cp, H*dk]) so checkpoint conversion is unchanged.
            out_pair = HeadwiseLinear(
                features=self.d_model, n_head=H, dtype=self.dtype,
                name="pair_value",
            )(wx2d).reshape(B, L, -1)

        out_scalar = out_scalar.reshape(B, L, -1)

        # Back to planes for the global -> local inverse transform (R^T(x-T));
        # norms reduce over the xyz plane axis, lane-dense.
        og = jnp.transpose(
            out_point_g.reshape(B, L, H, 8, 3), (0, 1, 4, 3, 2)
        ).reshape(B, L, 3, H * 8)  # point-major planes, float32
        out_point_local = jnp.einsum(
            "blxy,blxp->blyp", R.astype(jnp.float32), og - T[..., None]
        ).astype(x1d.dtype)

        # Back to the reference's (head, point[, xyz])-minor flat orders for
        # the output head; these touch only [B, L, ~768] tensors.
        out_point_norm = jnp.transpose(
            jnp.sqrt(jnp.sum(jnp.square(out_point_local), axis=2) + 1e-12)
            .reshape(B, L, 8, H),
            (0, 1, 3, 2),
        ).reshape(B, L, -1)
        out_point_flat = jnp.transpose(
            out_point_local.reshape(B, L, 3, 8, H), (0, 1, 4, 3, 2)
        ).reshape(B, L, -1)

        out_feat = jnp.concatenate(
            [out_scalar, out_point_flat, out_pair, out_point_norm], axis=-1
        )
        x = nn.Dense(self.d_model, use_bias=True, dtype=self.dtype, name="fc_out")(out_feat)
        return nn.Dropout(self.dropout, deterministic=deterministic)(x)


class SAEncoderLayer(nn.Module):
    """Pre-LN IPA + MLP residual block (structure_module.py:223-249)."""

    d_model: int
    d_pair: int
    n_head: int
    dim_feedforward: int
    dropout: float
    dtype: Any = jnp.float32
    use_pallas: bool | str = False
    pair_sharding: Any = None
    # Backward strategy for the fused path: "auto" (chunked recompute
    # at Lq*Lk >= 512^2, one-shot twin below), "full", or "chunked"
    # (ops/pallas_ipa.py::fused_ipa_attention_diff).
    fused_backward: str = "auto"
    # Run batch size, if the caller knows it: charges the "auto" dispatch
    # for sub-anchor occupancy (B*L below the ~2048 anchor schedule the
    # throughput model was measured on — at L=256/B=1 the fused path loses
    # 33% where the uncorrected model picked it). None = anchor occupancy.
    dispatch_batch: int | None = None

    @nn.compact
    def __call__(
        self, x1d, x2d, pose, bias, deterministic: bool = True, pa=None
    ):
        attn = SAAttention(
            d_model=self.d_model,
            d_pair=self.d_pair,
            n_head=self.n_head,
            dropout=self.dropout,
            dtype=self.dtype,
            use_pallas=self.use_pallas,
            pair_sharding=self.pair_sharding,
            fused_backward=self.fused_backward,
            dispatch_batch=self.dispatch_batch,
            name="attn",
        )
        ffn = FeedForward(
            d_model=self.d_model,
            dim_feedforward=self.dim_feedforward,
            dropout=self.dropout,
            dtype=self.dtype,
            name="ffn",
        )
        x1d = x1d + attn(
            nn.LayerNorm(epsilon=1e-5, use_fast_variance=False, dtype=self.dtype, name="norm1")(x1d),
            x2d, pose, bias, deterministic, pa,
        )
        x1d = x1d + ffn(nn.LayerNorm(epsilon=1e-5, use_fast_variance=False, dtype=self.dtype, name="norm2")(x1d), deterministic)
        return x1d


class StructureModule(nn.Module):
    """IPA encoder stack + diff head (structure_module.py:252-287)."""

    d_model: int
    d_pair: int
    n_layer: int
    n_head: int
    dim_feedforward: int
    dropout: float
    dtype: Any = jnp.float32
    use_pallas: bool | str = False
    pair_sharding: Any = None
    # Backward strategy for the fused path: "auto" (chunked recompute
    # at Lq*Lk >= 512^2, one-shot twin below), "full", or "chunked"
    # (ops/pallas_ipa.py::fused_ipa_attention_diff).
    fused_backward: str = "auto"
    # Run batch size, if the caller knows it: charges the "auto" dispatch
    # for sub-anchor occupancy (B*L below the ~2048 anchor schedule the
    # throughput model was measured on — at L=256/B=1 the fused path loses
    # 33% where the uncorrected model picked it). None = anchor occupancy.
    dispatch_batch: int | None = None

    @nn.compact
    def __call__(
        self,
        pose,
        x1d,
        x2d,
        bias,
        deterministic: bool = True,
        true_len: int | None = None,
        pa: jax.Array | None = None,  # [n_layer, B, H, Lq, Lk] precomputed
                                      # per-layer pair biases (fused path;
                                      # rectangular — rows pad to ROW_PAD,
                                      # columns to 128)
    ):
        from se3diff_tpu.ops.pallas_ipa import resolve_use_pallas

        L_in = x1d.shape[1]
        L = L_in if true_len is None else true_len
        if resolve_use_pallas(self.use_pallas, L, self.pair_sharding, self.dispatch_batch):
            # Pad to the kernel tile multiple ONCE for the whole stack: x2d
            # is layer-invariant, so padding here instead of per layer
            # removes 2*n_layer copies of the [B, L, L, Cp] tensor — the
            # dominant cost of the round-1 fused path. Padded columns are
            # masked via the bias (finite NEG_INF so the online softmax
            # never sees inf-inf); padded rows are sliced off before the
            # score heads. Callers holding a conditioning cache pass inputs
            # already padded (with ``true_len`` marking the real length) and
            # skip this.
            from se3diff_tpu.ops.pallas_ipa import (
                NEG_INF, col_padded_len, pad_axis, row_padded_len,
            )

            Lq = row_padded_len(L_in, self.pair_sharding)
            Lk = col_padded_len(L_in)
            # Guard on the actual shapes to pad: cache callers pass
            # already-rectangular (Lq, Lk) tensors and skip this block
            # entirely; raw callers enter it whenever any axis is short.
            if x2d.shape[1] != Lq or x2d.shape[2] != Lk:
                pose = (pad_axis(pose[0], 1, Lq), pad_axis(pose[1], 1, Lq))
                x1d = pad_axis(x1d, 1, Lq)
                x2d = pad_axis(pad_axis(x2d, 1, Lq), 2, Lk)
                bias = pad_axis(bias, 3, Lk, value=NEG_INF)
        for i in range(self.n_layer):
            x1d = SAEncoderLayer(
                d_model=self.d_model,
                d_pair=self.d_pair,
                n_head=self.n_head,
                dim_feedforward=self.dim_feedforward,
                dropout=self.dropout,
                dtype=self.dtype,
                use_pallas=self.use_pallas,
                pair_sharding=self.pair_sharding,
                fused_backward=self.fused_backward,
                dispatch_batch=self.dispatch_batch,
                name=f"layer_{i}",
            )(x1d, x2d, pose, bias, deterministic,
              None if pa is None else pa[i])
        # Score heads always run in float32.
        return DiffHead(ninp=self.d_model, name="diff_head")(
            x1d[:, :L].astype(jnp.float32)
        )


class DistributionalGraphormer(nn.Module):
    """Dense-batch DiG model (models.py:148-322).

    Inputs: noisy translations ``T_perturbed [B, L, 3]``, *inverse* rotations
    ``IR_perturbed [B, L, 3, 3]``, diffusion times ``t [B]`` (already scaled
    by 1000), Evoformer ``single [B, L, 384]`` / ``pair [B, L, L, 128]``
    conditioning, and a validity ``mask [B, L]`` (True = real residue,
    combining padding and pos_is_known, models.py:255-269).

    Returns ``(T_eps, IR_eps)``, both ``[B, L, 3]``; T_eps is equivariant and
    IR_eps invariant under global rotations (models.py:177-184).
    """

    dim_model: int = 512
    dim_pair: int = 256
    num_layers: int = 8
    num_heads: int = 32
    dim_single_rep: int = 64  # unused; Evoformer dims are fixed (models.py:196-198)
    dim_hidden: int = 1024
    num_buckets: int = 64
    max_distance_relative: int = 128
    dropout: float = 0.1
    dtype: Any = jnp.float32
    use_pallas: bool | str = False
    # Optional NamedSharding for the [B, L, L, Cp] pair activation: sharding
    # its first L axis over a mesh axis is sequence parallelism for the
    # O(L^2) memory bottleneck (SURVEY.md section 5.7) — each chip holds a
    # row-slab of the pair tensor and the row-wise attention that consumes it.
    pair_sharding: Any = None
    # Backward strategy for the fused path: "auto" (chunked recompute
    # at Lq*Lk >= 512^2, one-shot twin below), "full", or "chunked"
    # (ops/pallas_ipa.py::fused_ipa_attention_diff).
    fused_backward: str = "auto"
    # Run batch size, if the caller knows it: charges the "auto" dispatch
    # for sub-anchor occupancy (B*L below the ~2048 anchor schedule the
    # throughput model was measured on — at L=256/B=1 the fused path loses
    # 33% where the uncorrected model picked it). None = anchor occupancy.
    dispatch_batch: int | None = None

    def setup(self):
        self.x1d_ln = nn.LayerNorm(
            epsilon=1e-5, use_fast_variance=False, dtype=self.dtype
        )
        self.x1d_proj = nn.Dense(self.dim_model, use_bias=False, dtype=self.dtype)
        self.step_emb = SinusoidalPositionEmbedder(self.dim_model)
        self.x2d_ln = nn.LayerNorm(
            epsilon=1e-5, use_fast_variance=False, dtype=self.dtype
        )
        self.x2d_proj = nn.Dense(self.dim_pair, use_bias=False, dtype=self.dtype)
        self.rp_proj = RelativePositionBias(
            num_buckets=self.num_buckets,
            max_distance=self.max_distance_relative,
            out_dim=self.dim_pair,
        )
        self.st_module = StructureModule(
            d_model=self.dim_model,
            d_pair=self.dim_pair,
            n_layer=self.num_layers,
            n_head=self.num_heads,
            dim_feedforward=self.dim_hidden,
            dropout=self.dropout,
            dtype=self.dtype,
            use_pallas=self.use_pallas,
            pair_sharding=self.pair_sharding,
            fused_backward=self.fused_backward,
            dispatch_batch=self.dispatch_batch,
        )

    def embed_conditioning(
        self,
        single_repr: jax.Array,
        pair_repr: jax.Array,
        mask: jax.Array | None = None,
    ) -> dict:
        """Everything the score net needs that does NOT depend on ``t`` or the
        pose: the projected single/pair conditioning and the attention bias.

        The denoising loop calls this ONCE per sample and replays only
        ``score_from_cache`` per step — the [B, L, L, *] pair stack (LN +
        projection + relative-position bias, plus the pad-to-tile copy on the
        fused path) is hoisted out of the scan entirely. The reference
        recomputes it inside every forward (models.py:271-284).
        """
        B, L = pair_repr.shape[:2]
        if mask is None:
            mask = jnp.ones((B, L), bool)

        single_repr = single_repr.astype(jnp.float32)
        pair_repr = pair_repr.astype(jnp.float32)

        # x1d base: LN + linear projection of single (time embedding is added
        # per step in score_from_cache).
        x1d = self.x1d_proj(self.x1d_ln(single_repr))

        # x2d: LN + linear projection of pair + relative position bias.
        x2d = self.x2d_proj(self.x2d_ln(pair_repr))
        pos_seq = jnp.arange(L)
        rel_pos = pos_seq[:, None] - pos_seq[None, :]
        x2d = (x2d + self.rp_proj(rel_pos)[None]).astype(self.dtype)
        from se3diff_tpu.ops.pallas_ipa import resolve_use_pallas as _rup

        use_fused = _rup(self.use_pallas, L, self.pair_sharding, self.dispatch_batch)
        if self.pair_sharding is not None and not use_fused:
            x2d = jax.lax.with_sharding_constraint(x2d, self.pair_sharding)
        # (fused path: the constraint is applied after row padding below —
        # a ragged true L need not divide the shard count, but the padded
        # row count always does via row_padded_len.)

        # Attention bias: -inf at masked columns; a fully-masked row falls
        # back to no masking to keep the softmax finite (models.py:286-291).
        attn_mask = ~mask  # True = masked out
        z = jnp.sum(mask.astype(jnp.int32), axis=-1, keepdims=True)
        filled_mask = jnp.where(z == 0, False, attn_mask)
        bias = jnp.where(filled_mask, -jnp.inf, 0.0).astype(jnp.float32)
        bias = bias[:, None, None, :]  # [B, 1, 1, L]

        cache = {"x1d": x1d, "x2d": x2d, "bias": bias, "len": L}
        from se3diff_tpu.ops.pallas_ipa import (
            NEG_INF, pad_axis, resolve_use_pallas,
        )

        if resolve_use_pallas(self.use_pallas, L, self.pair_sharding, self.dispatch_batch):
            # Born-padded for the fused kernel's tile contract: the big
            # [B, L, L, Cp] copy happens once per sample, not once per step.
            # Rectangular: query rows need only ROW_PAD(=64)-alignment
            # (plus shard divisibility under sequence parallelism);
            # key/value columns pad to 128-multiples in general but run one
            # full-column block for short sequences — at L=192 this is
            # 192x192 work instead of 256x256 (ops/pallas_ipa.py
            # ROW_PAD/FULL_COL_MAX notes).
            from se3diff_tpu.ops.pallas_ipa import col_padded_len, row_padded_len

            Lq = row_padded_len(L, self.pair_sharding)
            Lk = col_padded_len(L)
            x1d = pad_axis(x1d, 1, Lq)
            x2d = pad_axis(pad_axis(x2d, 1, Lq), 2, Lk)
            bias = pad_axis(bias, 3, Lk, value=NEG_INF)
            if self.pair_sharding is not None:
                x2d = jax.lax.with_sharding_constraint(x2d, self.pair_sharding)
            cache = {"x1d": x1d, "x2d": x2d, "bias": bias, "len": L}

            if not self.is_initializing():
                # Per-layer pair bias x2d @ w_pb is t-invariant: precompute
                # it once per sample and stream it into the kernel every
                # step (measured -2.1 ms/layer at L=2048 — the same hoist
                # XLA's loop-invariant code motion performs for the unfused
                # path automatically). Unscaled; the kernel applies pair_w.
                layers = self.variables["params"]["st_module"]
                pas = [
                    jnp.einsum(
                        "bijp,ph->bhij",
                        x2d,
                        layers[f"layer_{i}"]["attn"]["pair_bias"][
                            "kernel"
                        ].astype(x2d.dtype),
                    )
                    for i in range(self.st_module.n_layer)
                ]
                cache["pa"] = jnp.stack(pas)  # [n_layer, B, H, Lq, Lk]

        return cache

    def score_from_cache(
        self,
        T_perturbed: jax.Array,
        IR_perturbed: jax.Array,
        t: jax.Array,
        cache: dict,
        deterministic: bool = True,
        trunk_fn=None,
    ) -> tuple[jax.Array, jax.Array]:
        """Per-step score evaluation against a conditioning cache.

        ``trunk_fn`` optionally replaces the IPA stack (same call contract
        as ``self.st_module``) so alternative execution schedules — e.g.
        the pipeline-parallel trunk (`parallel/pipeline.py`) — reuse this
        method's DiG conventions instead of duplicating them.
        """
        L = cache["len"]
        x1d = (cache["x1d"] + self.step_emb(t)[:, None]).astype(self.dtype)

        pose = (T_perturbed, IR_perturbed)
        Lp = cache["x2d"].shape[1]
        if Lp != T_perturbed.shape[1]:
            from se3diff_tpu.ops.pallas_ipa import pad_axis

            pose = (pad_axis(pose[0], 1, Lp), pad_axis(pose[1], 1, Lp))

        trunk = self.st_module if trunk_fn is None else trunk_fn
        T_eps, IR_eps = trunk(
            pose, x1d, cache["x2d"], cache["bias"], deterministic, true_len=L,
            pa=cache.get("pa"),
        )

        # Orientation dependence of the translation score (models.py:305).
        T_eps = jnp.einsum("blyx,bly->blx", IR_perturbed, T_eps)
        return T_eps, IR_eps

    def __call__(
        self,
        T_perturbed: jax.Array,
        IR_perturbed: jax.Array,
        t: jax.Array,
        single_repr: jax.Array,
        pair_repr: jax.Array,
        mask: jax.Array | None = None,
        deterministic: bool = True,
    ) -> tuple[jax.Array, jax.Array]:
        cache = self.embed_conditioning(single_repr, pair_repr, mask)
        return self.score_from_cache(
            T_perturbed, IR_perturbed, t, cache, deterministic
        )


class DiGConditionalScoreModel(nn.Module):
    """ChemGraph-free wrapper with the DiG conventions (models.py:325-384).

    Call signature: ``(pos [B, L, 3], rot [B, L, 3, 3], t [B], single, pair,
    mask)``; internally scales ``t`` by 1000 and feeds transposed (inverse)
    rotations. Returns raw ``(pos_out, rot_out)`` — the translation output
    predicts score*std and the rotation output predicts score/score_scaling,
    matching the denoiser's `get_score` conversion.
    """

    dim_model: int = 512
    dim_pair: int = 256
    num_layers: int = 8
    num_heads: int = 32
    dim_single_rep: int = 64
    dim_hidden: int = 1024
    num_buckets: int = 64
    max_distance_relative: int = 128
    dropout: float = 0.1
    dtype: Any = jnp.float32
    # True / False / "auto": "auto" picks the fused Pallas kernel on TPU
    # where the measured throughput model says it wins
    # (ops.pallas_ipa.predicted_fused_advantage > 1), XLA otherwise.
    use_pallas: bool | str = False
    pair_sharding: Any = None
    # Backward strategy for the fused path: "auto" (chunked recompute
    # at Lq*Lk >= 512^2, one-shot twin below), "full", or "chunked"
    # (ops/pallas_ipa.py::fused_ipa_attention_diff).
    fused_backward: str = "auto"
    # Run batch size, if the caller knows it: charges the "auto" dispatch
    # for sub-anchor occupancy (B*L below the ~2048 anchor schedule the
    # throughput model was measured on — at L=256/B=1 the fused path loses
    # 33% where the uncorrected model picked it). None = anchor occupancy.
    dispatch_batch: int | None = None

    def setup(self):
        self.model_nn = DistributionalGraphormer(
            dim_model=self.dim_model,
            dim_pair=self.dim_pair,
            num_layers=self.num_layers,
            num_heads=self.num_heads,
            dim_single_rep=self.dim_single_rep,
            dim_hidden=self.dim_hidden,
            num_buckets=self.num_buckets,
            max_distance_relative=self.max_distance_relative,
            dropout=self.dropout,
            dtype=self.dtype,
            use_pallas=self.use_pallas,
            pair_sharding=self.pair_sharding,
            fused_backward=self.fused_backward,
            dispatch_batch=self.dispatch_batch,
        )

    def embed_conditioning(
        self,
        single_repr: jax.Array,
        pair_repr: jax.Array,
        mask: jax.Array | None = None,
    ) -> dict:
        """Hoist the t-invariant conditioning stack out of the denoise loop;
        pass the result to ``score_from_cache`` (``apply(..., method=...)``)."""
        return self.model_nn.embed_conditioning(single_repr, pair_repr, mask)

    def score_from_cache(
        self,
        pos: jax.Array,
        rot: jax.Array,
        t: jax.Array,
        cache: dict,
        deterministic: bool = True,
        trunk_fn=None,
    ) -> tuple[jax.Array, jax.Array]:
        return self.model_nn.score_from_cache(
            pos, jnp.swapaxes(rot, -1, -2), t * 1000.0, cache, deterministic,
            trunk_fn,
        )

    def __call__(
        self,
        pos: jax.Array,
        rot: jax.Array,
        t: jax.Array,
        single_repr: jax.Array,
        pair_repr: jax.Array,
        mask: jax.Array | None = None,
        deterministic: bool = True,
    ) -> tuple[jax.Array, jax.Array]:
        time_effective = t * 1000.0
        ir = jnp.swapaxes(rot, -1, -2)
        return self.model_nn(
            pos, ir, time_effective, single_repr, pair_repr, mask, deterministic
        )


def count_params(params: Any) -> int:
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
