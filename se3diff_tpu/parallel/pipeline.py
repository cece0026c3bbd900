"""GPipe-style pipeline parallelism (PP) for the DiG trunk.

The score network's trunk is ``n_layer`` identical pre-LN IPA blocks
(`models/dig.py` SAEncoderLayer; reference structure_module.py:223-249).
PP splits them into contiguous *stages* over a ``"pipe"`` mesh axis and
streams *microbatches* through the stages, one `lax.ppermute` hop per
schedule tick, all inside a single `jax.shard_map` — the TPU-native
circular pipeline (XLA collectives over ICI; no NCCL/MPI process groups).

The reference is a single-GPU codebase (SURVEY.md §2.10: it implements
none of DP/TP/PP/SP); PP is the scaling axis for trunks whose *weights*
exceed one chip, and it composes with data parallelism on a
``("data", "pipe")`` mesh: every data-row of the mesh pipelines its own
shard of the batch, gradients all-reduce over "data" as usual.

Schedule
--------
With S stages and M microbatches, ticks ``t = 0 .. M+S-2``:

* stage ``d`` processes microbatch ``m = t - d`` when ``0 <= m < M``;
* stage 0 loads a fresh microbatch each tick while any remain;
* the last stage collects finished microbatches;
* one ``ppermute`` per tick hands activations to the next stage.

Bubble fraction is ``(S-1)/(M+S-1)`` — the standard GPipe fill/drain
overhead; amortize with ``M >> S``. Activations crossing stages are the
small ``[mB, L, d_model]`` stream; the quadratic pair conditioning stays
device-local (each stage indexes its own copy of the microbatched pair
stack), so ICI traffic per tick is O(mB * L * d_model) only.

Autodiff flows through the schedule unchanged (`ppermute` transposes to
the inverse permutation), so `make_pp_score_fn`'s output is a drop-in
``model_apply`` for `training/dsm.py` train steps: PP training works by
composition, no bespoke backward schedule.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from se3diff_tpu.models.dig import (
    DiffHead,
    DiGConditionalScoreModel,
    SAEncoderLayer,
)

__all__ = [
    "stack_layer_params",
    "make_pp_score_fn",
    "pp_stage_param_specs",
]


def stack_layer_params(st_params: dict, n_layer: int):
    """Stack ``layer_0 .. layer_{n-1}`` subtrees along a new leading axis.

    The per-layer trees are structurally identical (same SAEncoderLayer),
    so the stack is a pytree whose leaves carry a leading ``n_layer`` axis
    — the form `lax.scan` and stage-sharding consume.
    """
    layers = [st_params[f"layer_{i}"] for i in range(n_layer)]
    return jax.tree.map(lambda *ls: jnp.stack(ls), *layers)


def pp_stage_param_specs(staged_params, pipe_axis: str = "pipe") -> Any:
    """PartitionSpec tree sharding the leading stage axis over ``pipe_axis``."""
    return jax.tree.map(
        lambda leaf: P(pipe_axis, *([None] * (leaf.ndim - 1))), staged_params
    )


def _microbatch(x: jax.Array, m: int) -> jax.Array:
    b = x.shape[0]
    return x.reshape((m, b // m) + x.shape[1:])


def make_pp_score_fn(
    model: DiGConditionalScoreModel,
    mesh: Mesh,
    n_microbatches: int,
    pipe_axis: str = "pipe",
    data_axis: str | None = "data",
):
    """Build a pipeline-parallel ``model_apply`` for ``model``.

    Returns ``fn(params, pos, rot, t, single, pair, mask) -> (pos_raw,
    rot_raw)`` numerically matching ``model.apply`` (dig.py
    DiGConditionalScoreModel.__call__) with the trunk executed as an
    S-stage pipeline over ``mesh[pipe_axis]``. ``params`` is the ordinary
    (unstacked) checkpoint tree; stage stacking happens inside the jitted
    computation, where GSPMD materializes only each device's stage slice.

    Constraints: ``model.num_layers % S == 0``; the per-data-shard batch
    must divide ``n_microbatches``; dropout is always off (sampling /
    deterministic-finetune semantics); the XLA (unfused) attention path is
    used inside the pipeline body.
    """
    S = mesh.shape[pipe_axis]
    n_layer = model.num_layers
    if n_layer % S != 0:
        raise ValueError(f"num_layers={n_layer} not divisible by {S} stages")
    layers_per_stage = n_layer // S
    M = n_microbatches

    # The pipeline body runs the plain XLA attention path: the fused
    # Pallas kernel's tile padding is an orthogonal concern handled by the
    # single-chip paths (dig.py StructureModule), not re-entered here.
    model = model.clone(use_pallas=False, pair_sharding=None)
    layer_mod = SAEncoderLayer(
        d_model=model.dim_model,
        d_pair=model.dim_pair,
        n_head=model.num_heads,
        dim_feedforward=model.dim_hidden,
        dropout=model.dropout,
        dtype=model.dtype,
        use_pallas=False,
    )
    batch_spec = P(data_axis) if data_axis is not None else P()
    # Pre-built: flax forbids constructing Modules inside another module's
    # apply (pp_trunk runs inside score_from_cache).
    diff_head_mod = DiffHead(ninp=model.dim_model)

    def trunk_body(staged, x1d_mb, x2d_mb, pose_t_mb, pose_ir_mb, bias_mb):
        """shard_map body: local microbatched arrays -> trunk output."""
        d = lax.axis_index(pipe_axis)
        # Local stage slice: shard_map gives [1, layers_per_stage, ...].
        staged_local = jax.tree.map(lambda a: a[0], staged)

        # Remat each stage: the backward pass recomputes the stage's layers
        # from its input instead of storing every tick's intermediate
        # activations — GPipe's standard memory trade, which keeps PP
        # training memory at O(microbatch) per stage rather than
        # O(ticks * layer internals).
        @jax.checkpoint
        def run_stage(x, x2d_l, pose_l, bias_l):
            def layer_step(h, lp):
                h = layer_mod.apply(
                    {"params": lp}, h, x2d_l, pose_l, bias_l, True, None
                )
                return h, None
            x, _ = lax.scan(layer_step, x, staged_local)
            return x

        # The carries start as literal zeros (device-invariant) but become
        # pipe-varying after the first tick; mark them varying up front so
        # the scan carry type is stable.
        state0 = lax.pcast(
            jnp.zeros_like(x1d_mb[0]), (pipe_axis,), to="varying"
        )
        outbuf0 = lax.pcast(jnp.zeros_like(x1d_mb), (pipe_axis,), to="varying")

        def tick(carry, t):
            state, outbuf = carry
            m = t - d  # microbatch this stage works on at tick t
            valid = (m >= 0) & (m < M)
            idx = jnp.clip(m, 0, M - 1)

            # Stage 0 starts a fresh microbatch each tick.
            fresh = lax.dynamic_index_in_dim(
                x1d_mb, jnp.clip(t, 0, M - 1), 0, keepdims=False
            )
            state = jnp.where(d == 0, fresh, state)

            x2d_l = lax.dynamic_index_in_dim(x2d_mb, idx, 0, keepdims=False)
            pose_l = (
                lax.dynamic_index_in_dim(pose_t_mb, idx, 0, keepdims=False),
                lax.dynamic_index_in_dim(pose_ir_mb, idx, 0, keepdims=False),
            )
            bias_l = lax.dynamic_index_in_dim(bias_mb, idx, 0, keepdims=False)

            y = run_stage(state, x2d_l, pose_l, bias_l)

            # Last stage collects the finished microbatch.
            write = valid & (d == S - 1)
            outbuf = jnp.where(
                write, lax.dynamic_update_index_in_dim(outbuf, y, idx, 0),
                outbuf,
            )

            # Hand activations to the next stage.
            state = lax.ppermute(
                y, pipe_axis, [(i, (i + 1) % S) for i in range(S)]
            )
            return (state, outbuf), None

        (_, outbuf), _ = lax.scan(
            tick, (state0, outbuf0), jnp.arange(M + S - 1)
        )
        # Replicate the result over the pipe axis (only stage S-1 wrote it).
        return lax.psum(jnp.where(d == S - 1, outbuf, 0.0), pipe_axis)

    mb_spec = lambda extra: P(None, *batch_spec, *([None] * extra))  # noqa: E731

    def pp_apply(params, pos, rot, t, single, pair, mask=None):
        st = params["params"]["model_nn"]["st_module"]
        staged = jax.tree.map(
            lambda a: a.reshape((S, layers_per_stage) + a.shape[1:]),
            stack_layer_params(st, n_layer),
        )
        B = pos.shape[0]
        n_data = mesh.shape[data_axis] if data_axis is not None else 1
        if B % (M * n_data) != 0:
            raise ValueError(
                f"batch {B} must be a multiple of n_microbatches*data = "
                f"{M}*{n_data}: each data shard pipelines its own "
                f"microbatches"
            )

        def pp_trunk(pose, x1d, x2d, bias, deterministic=True,
                     true_len=None, pa=None):
            """st_module stand-in: pipelined layers + DiffHead."""
            x1d_out = jax.shard_map(
                trunk_body,
                mesh=mesh,
                in_specs=(
                    pp_stage_param_specs(staged, pipe_axis),
                    mb_spec(2),  # x1d [M, mB, L, D]
                    mb_spec(3),  # x2d [M, mB, L, L, C]
                    mb_spec(2),  # pose T [M, mB, L, 3]
                    mb_spec(3),  # pose IR [M, mB, L, 3, 3]
                    mb_spec(3),  # bias [M, mB, 1, 1, L]
                ),
                out_specs=mb_spec(2),
            )(
                staged,
                _microbatch(x1d, M),
                _microbatch(x2d, M),
                _microbatch(pose[0], M),
                _microbatch(pose[1], M),
                _microbatch(bias, M),
            )
            x1d_out = x1d_out.reshape((B,) + x1d_out.shape[2:])
            return diff_head_mod.apply(
                {"params": st["diff_head"]}, x1d_out.astype(jnp.float32)
            )

        # The DiG conventions (t*1000, inverse rotations, f32 score heads,
        # translation-score orientation einsum) all live in ONE place —
        # score_from_cache — with the trunk swapped for the pipeline.
        cache = model.apply(
            params, single, pair, mask, method="embed_conditioning"
        )
        return model.apply(
            params, pos, rot, t, cache, method="score_from_cache",
            trunk_fn=pp_trunk,
        )

    return pp_apply
