"""Denoising score matching for SE(3) rigid-frame batches.

The reference ships the pretrained score model and only trains the small
finetune net, but its toy prototype trains by DSM on SO(3)
(`se3diff/train.py:109-143`). This module generalizes that loss to full
SE(3) frames (translations + rotations) so the framework can train score
networks from scratch, and provides mesh-sharded (DP over "data", TP over
"model") train steps as the TPU-native scaling path (SURVEY.md section 7).

Targets follow the DiG output parameterization (models.py:359-384):
``pos_raw`` predicts score*std = -z for the VP marginal, and ``rot_raw``
predicts score/score_scaling where the score is the IGSO(3) table score of
the relative rotation Log(x0^T x_t).
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from se3diff_tpu.diffusion.denoise import SDEs
from se3diff_tpu.ops import so3 as so3_ops
from se3diff_tpu.parallel.sharding import dig_tp_param_specs
from se3diff_tpu.sde.base import bcast_right

# model_apply(params, pos, rot, t, single, pair, mask) -> (pos_raw, rot_raw)
ModelApply = Callable[..., tuple[jax.Array, jax.Array]]


def dsm_loss(
    params: Any,
    key: jax.Array,
    batch: dict[str, jax.Array],
    sdes: SDEs,
    model_apply: ModelApply,
    min_t: float = 0.001,
) -> jax.Array:
    """Masked MSE between model raw outputs and closed-form DSM targets.

    ``batch``: ``pos [B,L,3]``, ``rot [B,L,3,3]`` clean frames, ``single``,
    ``pair`` conditioning, optional ``mask [B,L]``.

    ``single``/``pair``/``mask`` may also arrive WITHOUT the batch axis
    (``[L,S]``/``[L,L,P]``/``[L]``): conditioning is per-sequence, so the
    data layer can keep one device-resident copy per system and let the
    batch broadcast happen here, inside jit, where it is free — instead of
    materializing a [B,L,L,P] host tensor into every H2D transfer (51 MB
    per step at B=32/L=56; ~200 MB at B=40/L=100 — tunnel-bound, 20-50x
    the step's real device time). See `training/data.py` ``device_cond``.
    """
    pos0, rot0 = batch["pos"], batch["rot"]
    B, L = pos0.shape[:2]
    single, pair = batch["single"], batch["pair"]
    if single.ndim == 2:
        single = jnp.broadcast_to(single, (B, *single.shape))
    if pair.ndim == 3:
        pair = jnp.broadcast_to(pair, (B, *pair.shape))
    mask = batch.get("mask")
    if mask is None:
        mask = jnp.ones((B, L), bool)
    elif mask.ndim == 1:
        mask = jnp.broadcast_to(mask, (B, L))

    k_t, k_pos, k_rot = jax.random.split(key, 3)
    t = jax.random.uniform(k_t, (B,), pos0.dtype, min_t, 1.0)

    # Positions: x_t = a x0 + std z; score*std = -z.
    a, std = sdes.pos.mean_coeff_and_std(pos0, t)
    z = jax.random.normal(k_pos, pos0.shape, pos0.dtype)
    pos_t = a * pos0 + std * z
    pos_target = -z

    # Rotations: x_t ~ IGSO3(x0, sigma_t); target = score(Log(x0^T x_t))/lambda.
    rot_t = sdes.node_orientations.sample_marginal(k_rot, rot0, t)
    q_t = so3_ops.rotmat_to_rotvec(
        jnp.einsum("...ji,...jk->...ik", rot0, rot_t)
    )
    score = sdes.node_orientations.compute_score(q_t, t, method="series")
    scaling = sdes.node_orientations.get_score_scaling(t)
    rot_target = score / bcast_right(scaling, score)

    pos_raw, rot_raw = model_apply(
        params, pos_t, rot_t, t, single, pair, mask
    )

    w = mask.astype(pos0.dtype)[..., None]
    denom = jnp.maximum(jnp.sum(w), 1.0) * 3.0
    loss_pos = jnp.sum(w * (pos_raw - pos_target) ** 2) / denom
    loss_rot = jnp.sum(w * (rot_raw - rot_target) ** 2) / denom
    return loss_pos + loss_rot


def make_dsm_train_step(
    sdes: SDEs,
    model_apply: ModelApply,
    optimizer: optax.GradientTransformation,
    min_t: float = 0.001,
):
    """Plain (single-device or auto-sharded) jitted train step."""

    @jax.jit
    def train_step(params, opt_state, key, batch):
        loss, grads = jax.value_and_grad(dsm_loss)(
            params, key, batch, sdes, model_apply, min_t
        )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return train_step


def make_sharded_dsm_train_step(
    sdes: SDEs,
    model_apply: ModelApply,
    optimizer: optax.GradientTransformation,
    mesh: Mesh,
    params: Any,
    min_t: float = 0.001,
):
    """DP+TP train step: batch sharded over "data", params per the DiG TP
    rules over "model". XLA inserts the gradient all-reduce over "data" and
    the per-layer TP collectives; optimizer state inherits param shardings.

    Returns ``(train_step, shard_params_fn, shard_batch_fn)``.
    """
    param_specs = dig_tp_param_specs(params)
    param_sh = jax.tree.map(lambda s: NamedSharding(mesh, s), param_specs)
    batch_sh = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())

    def place_params(p):
        return jax.tree.map(jax.device_put, p, param_sh)

    def place_batch(b):
        # Unbatched conditioning ([L,S]/[L,L,P]/[L] from a device_cond
        # batch_fn) has no batch axis to shard over "data" — device_put
        # with P("data") would either fail opaquely or silently shard L.
        # dsm_loss keys the broadcast on single.ndim == 2, so use the same
        # test here and fail loud with the fix.
        if b["single"].ndim == 2:
            raise ValueError(
                "mesh-sharded training needs batched conditioning "
                "(single [B,L,S]): build the batch_fn with "
                "device_cond=False when a mesh is set"
            )
        return jax.tree.map(lambda x: jax.device_put(x, batch_sh), b)

    def step(params, opt_state, key, batch):
        loss, grads = jax.value_and_grad(dsm_loss)(
            params, key, batch, sdes, model_apply, min_t
        )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    opt_sh = jax.eval_shape(optimizer.init, params)
    # Optimizer-state sharding: reuse the param spec where leaf shapes match
    # a param (adam mu/nu), replicate scalars (step counts).
    flat_param_specs = {
        tuple(p.key if hasattr(p, "key") else str(p) for p in path): spec
        for path, spec in jax.tree_util.tree_flatten_with_path(param_specs)[0]
    }

    def opt_leaf_sharding(path, leaf):
        keys = tuple(p.key if hasattr(p, "key") else str(p) for p in path)
        for pkeys, spec in flat_param_specs.items():
            if keys[-len(pkeys):] == pkeys:
                return NamedSharding(mesh, spec)
        return repl

    opt_state_sh = jax.tree_util.tree_map_with_path(opt_leaf_sharding, opt_sh)

    train_step = jax.jit(
        step,
        in_shardings=(param_sh, opt_state_sh, repl, batch_sh),
        out_shardings=(param_sh, opt_state_sh, repl),
        donate_argnums=(0, 1),
    )
    return train_step, place_params, place_batch
