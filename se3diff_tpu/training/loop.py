"""From-scratch DSM training loop with checkpointing and exact resume.

The reference ships no from-scratch trainer — its toy trains only an SO(3)
score net in a notebook loop (se3diff/train.py:109-143) and the production
checkpoint arrives pretrained (sample.py:54-105). This module completes
the framework's training subsystem around `training/dsm.py`'s step
factories: warmup+cosine LR, periodic validation, orbax checkpoints of
``(params, opt_state)`` keyed by step, and exact resume (the per-step RNG
is ``fold_in(base_key, step)``, so a resumed run replays the identical
key sequence — resumed == uninterrupted, bit-for-bit, which the tests
assert). Pass a mesh to train DP+TP-sharded (`make_sharded_dsm_train_step`);
pipeline parallelism composes by passing `make_pp_score_fn`'s output as
``model_apply``.
"""

from __future__ import annotations

import dataclasses
import json
import logging
import os
import time
from pathlib import Path
from typing import Any, Callable, Iterator

import jax
import jax.numpy as jnp
import optax

from se3diff_tpu.diffusion.denoise import SDEs
from se3diff_tpu.training.dsm import (
    ModelApply,
    make_dsm_train_step,
    make_sharded_dsm_train_step,
)

logger = logging.getLogger(__name__)


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Hyperparameters, defaulting to the reference finetune regime's
    optimizer family (config/finetune/finetune.yaml: AdamW + cosine)."""

    num_steps: int = 1000
    lr: float = 1e-4
    weight_decay: float = 0.0
    warmup_steps: int = 0
    eta_min_ratio: float = 0.01  # cosine floor as a fraction of lr
    grad_clip: float | None = 1.0
    ckpt_every: int = 0          # 0 = no checkpointing
    ckpt_dir: str | None = None
    max_ckpts_kept: int = 3
    val_every: int = 0           # 0 = no validation
    log_every: int = 50
    min_t: float = 0.001
    seed: int = 0
    # Training observability: one JSON line per log_every step (step, loss,
    # lr, wall seconds). Defaults to {ckpt_dir}/train_log.jsonl when
    # checkpointing; set explicitly to log without checkpoints.
    metrics_path: str | None = None


def make_schedule(cfg: TrainConfig) -> optax.Schedule:
    if cfg.warmup_steps > 0:
        return optax.warmup_cosine_decay_schedule(
            init_value=0.0,
            peak_value=cfg.lr,
            warmup_steps=cfg.warmup_steps,
            decay_steps=max(cfg.num_steps, 1),
            end_value=cfg.lr * cfg.eta_min_ratio,
        )
    # warmup_cosine_decay_schedule divides by warmup_steps; build the
    # plain cosine directly when there is no warmup.
    return optax.cosine_decay_schedule(
        init_value=cfg.lr,
        decay_steps=max(cfg.num_steps, 1),
        alpha=cfg.eta_min_ratio,
    )


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    tx = optax.adamw(make_schedule(cfg), weight_decay=cfg.weight_decay)
    if cfg.grad_clip is not None:
        tx = optax.chain(optax.clip_by_global_norm(cfg.grad_clip), tx)
    return tx


def _ckpt_manager(cfg: TrainConfig):
    import orbax.checkpoint as ocp

    options = ocp.CheckpointManagerOptions(
        max_to_keep=cfg.max_ckpts_kept,
        save_interval_steps=cfg.ckpt_every,
        # Synchronous saves: a checkpoint reported written IS written, so
        # an interrupt right after a step never loses it.
        enable_async_checkpointing=False,
    )
    return ocp.CheckpointManager(
        Path(cfg.ckpt_dir).absolute(), options=options
    )


def train_dsm(
    sdes: SDEs,
    model_apply: ModelApply,
    params: Any,
    batch_iter: Iterator[dict] | Callable[[int], dict],
    cfg: TrainConfig,
    mesh=None,
    val_batch: dict | None = None,
) -> tuple[Any, list[float]]:
    """Run ``cfg.num_steps`` DSM steps; returns ``(params, loss_history)``.

    ``batch_iter`` is either an iterator of batch dicts or a callable
    ``step -> batch`` (the callable form is required for exact resume:
    data must be re-derivable from the step index). With ``ckpt_dir`` set,
    the latest checkpoint is restored before training and steps already
    done are skipped, so an interrupted run continues identically.
    """
    import orbax.checkpoint as ocp

    optimizer = make_optimizer(cfg)
    if mesh is not None:
        step_fn, place_params, place_batch = make_sharded_dsm_train_step(
            sdes, model_apply, optimizer, mesh, params, min_t=cfg.min_t
        )
        # The sharded step donates params/opt_state, and device_put may
        # alias the caller's buffers — train on a private copy so the
        # caller's param tree survives.
        params = place_params(jax.tree.map(jnp.array, params))
    else:
        step_fn = make_dsm_train_step(
            sdes, model_apply, optimizer, min_t=cfg.min_t
        )
        place_batch = lambda b: b  # noqa: E731
    opt_state = optimizer.init(params)

    start_step = 0
    mngr = None
    if cfg.ckpt_every and cfg.ckpt_dir:
        mngr = _ckpt_manager(cfg)
        latest = mngr.latest_step()
        if latest is not None:
            abstract = jax.tree.map(
                ocp.utils.to_shape_dtype_struct, {"params": params,
                                                  "opt_state": opt_state},
            )
            restored = mngr.restore(
                latest, args=ocp.args.StandardRestore(abstract)
            )
            params, opt_state = restored["params"], restored["opt_state"]
            start_step = latest
            logger.info("resumed from checkpoint at step %d", latest)

    base_key = jax.random.key(cfg.seed)
    get_batch = (
        batch_iter if callable(batch_iter)
        else (lambda it: (lambda step: next(it)))(iter(batch_iter))
    )

    metrics_path = cfg.metrics_path or (
        os.path.join(cfg.ckpt_dir, "train_log.jsonl")
        if cfg.ckpt_dir and cfg.ckpt_every else None
    )
    metrics_f = None
    if metrics_path:
        os.makedirs(os.path.dirname(metrics_path) or ".", exist_ok=True)
        metrics_f = open(metrics_path, "a")  # append across resumes
    sched = make_schedule(cfg)
    t_start = time.perf_counter()

    history: list[float] = []
    loss = None
    val_loss_fn = None
    for step in range(start_step, cfg.num_steps):
        batch = place_batch(get_batch(step))
        key = jax.random.fold_in(base_key, step)
        params, opt_state, loss = step_fn(params, opt_state, key, batch)
        if cfg.log_every and (step + 1) % cfg.log_every == 0:
            loss_f = float(loss)
            history.append(loss_f)
            logger.info("step %d: dsm loss %.5f", step + 1, loss_f)
            if metrics_f is not None:
                metrics_f.write(json.dumps({
                    "step": step + 1,
                    "loss": loss_f,
                    "lr": float(sched(step)),
                    "seconds": round(time.perf_counter() - t_start, 3),
                }) + "\n")
                metrics_f.flush()
        if val_batch is not None and cfg.val_every and (
            (step + 1) % cfg.val_every == 0
        ):
            if val_loss_fn is None:
                from se3diff_tpu.training.dsm import dsm_loss

                val_loss_fn = jax.jit(
                    lambda p, k, b: dsm_loss(
                        p, k, b, sdes, model_apply, cfg.min_t
                    )
                )
                val_placed = place_batch(val_batch)
                # A step index no training step uses (steps are < num_steps
                # and fold_in rejects negatives).
                val_key = jax.random.fold_in(base_key, 2**32 - 1)
            vl = float(val_loss_fn(params, val_key, val_placed))
            logger.info("step %d: val dsm loss %.5f", step + 1, vl)
        if mngr is not None:
            mngr.save(
                step + 1,
                args=ocp.args.StandardSave(
                    {"params": params, "opt_state": opt_state}
                ),
            )
    if mngr is not None:
        mngr.wait_until_finished()
    if metrics_f is not None:
        metrics_f.close()
    if not history and loss is not None:
        history.append(float(loss))
    return params, history
