"""Toy PPFT fine-tuning on the IGSO(3) mixture.

TPU-native counterpart of `se3diff/finetune.py`: record a controlled reverse
path without gradients, then re-evaluate the finetune model over the saved
path *in one batched call* (the reference loops over timesteps) and assemble
the EV + KL stochastic-control loss from `se3diff_tpu.ppft`.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import optax

from se3diff_tpu.diffusion.predictors import EulerMaruyamaPredictor
from se3diff_tpu.ops import igso3 as igso3_ops
from se3diff_tpu.ops import so3 as so3_ops
from se3diff_tpu.ppft.integrals import compute_int_dws, compute_int_u_u_dt
from se3diff_tpu.ppft.losses import compute_ev_loss, compute_kl_loss
from se3diff_tpu.sde.so3_sde import SO3SDE
from se3diff_tpu.toy.train import ToyModelFn, get_so3_score


def reverse_finetune_diffusion(
    key: jax.Array,
    sde: SO3SDE,
    model_fn: ToyModelFn,
    finetune_model_fn: ToyModelFn,
    batch_size: int = 4096,
    num_steps: int = 200,
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Controlled EM reverse sampling recording (xs, us, dWs)
    (se3diff/finetune.py:17-65)."""
    key, prior_key = jax.random.split(key)
    x_t = sde.prior_sampling(prior_key, (batch_size, 3, 3))
    predictor = EulerMaruyamaPredictor(sde, 1.0, 1.0)
    timesteps = jnp.linspace(1.0, 0.0, num_steps + 1, dtype=jnp.float32)
    dts = jnp.diff(timesteps)

    def body(carry, idx):
        x, key = carry
        key, k = jax.random.split(key)
        t = jnp.full((batch_size,), timesteps[idx], jnp.float32)
        score = get_so3_score(x, sde, model_fn, t)
        u = finetune_model_fn(x, t)
        x, _, dW = predictor.update_given_score(
            k, x, t, dts[idx], score, finetune_score=u
        )
        return (x, key), (x, u, dW)

    (_, _), (xs, us, dWs) = jax.lax.scan(body, (x_t, key), jnp.arange(num_steps))
    xs = jnp.concatenate([x_t[None], xs], axis=0)  # [T+1, B, 3, 3]
    return xs, timesteps, us, dWs


def assign_igso3(
    x_0: jax.Array,
    mus: jax.Array,
    sigmas: jax.Array,
    weights: jax.Array,
    l_max: int = 1000,
    tol: float = 1e-7,
) -> jax.Array:
    """Posterior component responsibilities under the IGSO(3) mixture
    (se3diff/finetune.py:68-92). Returns ``[B, K]``."""
    x_rel = jnp.einsum("kij,bil->bkjl", mus, x_0)  # [B, K, 3, 3]
    angle = so3_ops.angle_from_rotmat(x_rel)[0]  # [B, K]
    l_grid = jnp.arange(l_max, dtype=angle.dtype)
    pdf = igso3_ops.igso3_expansion(angle, sigmas[None, :], l_grid, tol=tol) * weights
    return pdf / (jnp.sum(pdf, axis=-1, keepdims=True) + tol)


def compute_finetune_loss(
    key: jax.Array,
    sde: SO3SDE,
    model_fn: ToyModelFn,
    finetune_model_fn: ToyModelFn,
    mus: jax.Array,
    sigmas: jax.Array,
    h_stars: jax.Array,
    lambda_: float = 0.1,
    batch_size: int = 4096,
    num_steps: int = 200,
    l_max: int = 1000,
    tol: float = 1e-7,
) -> jax.Array:
    """EV + lambda * KL stochastic-control loss (se3diff/finetune.py:95-143).

    The path is generated under stop-gradient; gradients flow only through
    the batched re-evaluation of the finetune model on the saved states.
    """
    xs, timesteps, us_sg, dWs = jax.lax.stop_gradient(
        reverse_finetune_diffusion(
            key, sde, model_fn, finetune_model_fn, batch_size, num_steps
        )
    )

    # Re-forward WITH gradients over the whole path in one call:
    # [T, B, 3, 3] -> [T*B, 3, 3] (the reference loops over T).
    T = num_steps
    x_flat = xs[:-1].reshape(T * batch_size, 3, 3)
    t_flat = jnp.repeat(timesteps[:-1], batch_size)
    us = finetune_model_fn(x_flat, t_flat).reshape(T, batch_size, 3)

    hs = assign_igso3(xs[-1], mus, sigmas, h_stars, l_max=l_max, tol=tol)
    dts = jnp.diff(timesteps)

    int_u_u_dt = compute_int_u_u_dt(us=us, dts=dts)
    int_u_u_dt_sg = compute_int_u_u_dt(us=us_sg, dts=dts)
    int_dws = compute_int_dws(us=us, dWs=dWs)

    loss_ev = compute_ev_loss(ws=int_dws, hs=hs, h_stars=h_stars, tol=tol)
    loss_kl = compute_kl_loss(
        ws=int_dws, int_u_u_dt=int_u_u_dt, int_u_u_dt_sg=int_u_u_dt_sg
    )
    return loss_ev + lambda_ * loss_kl


def finetune_toy(
    key: jax.Array,
    sde: SO3SDE,
    model_fn: ToyModelFn,
    finetune_model,
    mus: jax.Array,
    sigmas: jax.Array,
    h_stars: jax.Array,
    num_steps_opt: int = 100,
    lambda_: float = 0.1,
    batch_size: int = 1024,
    num_steps: int = 100,
    learning_rate: float = 1e-3,
    l_max: int = 1000,
):
    """AdamW fine-tuning loop for the toy; returns (params, losses)."""
    key, init_key = jax.random.split(key)
    ft_params = finetune_model.init(
        init_key, jnp.broadcast_to(jnp.eye(3), (1, 3, 3)), jnp.zeros((1,))
    )
    tx = optax.adamw(learning_rate)
    opt_state = tx.init(ft_params)

    @jax.jit
    def step(params, opt_state, key):
        def loss_fn(p):
            ft_fn = lambda x, t: finetune_model.apply(p, x, t)
            return compute_finetune_loss(
                key,
                sde,
                model_fn,
                ft_fn,
                mus,
                sigmas,
                h_stars,
                lambda_=lambda_,
                batch_size=batch_size,
                num_steps=num_steps,
                l_max=l_max,
            )

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for _ in range(num_steps_opt):
        key, k = jax.random.split(key)
        ft_params, opt_state, loss = step(ft_params, opt_state, k)
        losses.append(loss)
    return ft_params, jnp.stack(losses)
