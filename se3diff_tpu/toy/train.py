"""Toy SO(3) diffusion training: DSM loss and reverse sampling.

TPU-native counterpart of `se3diff/train.py`. The reverse sampler is a
single ``lax.scan`` (vs the reference's Python loop) and the training step is
fully jitted with optax.
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import optax

from se3diff_tpu.diffusion.predictors import EulerMaruyamaPredictor
from se3diff_tpu.ops import igso3 as igso3_ops
from se3diff_tpu.ops import so3 as so3_ops
from se3diff_tpu.sde.so3_sde import SO3SDE
from se3diff_tpu.toy.models import DiGMixSO3SDE

# score_model_fn(rot [B,3,3], t [B]) -> raw score [B,3]
ToyModelFn = Callable[[jax.Array, jax.Array], jax.Array]


def get_so3_score(
    x_t: jax.Array, sde: SO3SDE, model_fn: ToyModelFn, t: jax.Array
) -> jax.Array:
    """Raw model output * score scaling -> true score (se3diff/train.py:20-37)."""
    return model_fn(x_t, t) * sde.get_score_scaling(t)[..., None]


def reverse_diffusion(
    key: jax.Array,
    sde: SO3SDE,
    model_fn: ToyModelFn,
    batch_size: int = 4096,
    num_steps: int = 200,
) -> tuple[jax.Array, jax.Array]:
    """EM reverse sampling on SO(3) only; returns the full trajectory
    ``xs [T+1, B, 3, 3]`` and ``timesteps [T+1]`` (se3diff/train.py:40-75)."""
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
        x = predictor.update_given_score(k, x, t, dts[idx], score)[0]
        return (x, key), x

    (_, _), xs = jax.lax.scan(body, (x_t, key), jnp.arange(num_steps))
    return jnp.concatenate([x_t[None], xs], axis=0), timesteps


def igso3_mixture_marginal_pdf(
    mus: jax.Array,
    sigmas: jax.Array,
    weights: jax.Array,
    l_max: int = 1000,
    num_points: int = 1000,
    tol: float = 1e-7,
) -> tuple[jax.Array, jax.Array]:
    """Analytic angle-marginal pdf of the mixture for plots/tests
    (se3diff/train.py:78-106)."""
    omega = jnp.linspace(0.0, jnp.pi, num_points)
    l_grid = jnp.arange(l_max, dtype=omega.dtype)
    omega_0 = so3_ops.angle_from_rotmat(mus)[0]  # [K]
    pdfs = igso3_ops.igso3_marginal_pdf(
        omega[None, :], omega_0[:, None], sigmas[:, None], l_grid, tol=tol
    )
    pdf = jnp.sum(weights[:, None] * pdfs, axis=0)
    return omega, jnp.clip(pdf, min=0.0)


def compute_train_loss(
    key: jax.Array,
    sde: DiGMixSO3SDE,
    model_fn: ToyModelFn,
    mus: jax.Array,
    sigmas: jax.Array,
    weights: jax.Array,
    batch_size: int = 4096,
    tol: float = 1e-7,
) -> jax.Array:
    """Denoising score-matching loss on the mixture (se3diff/train.py:109-143).

    Draw x0 from the mixture, noise to x_t ~ p_t(.|x0), compute the relative
    rotation vector q_t = Log(x0^T x_t), and regress
    ``model(x_t, t) ~ score(q_t, t) / lambda(t)``.
    """
    k0, kt, km = jax.random.split(key, 3)
    x_0 = sde.sample_multiple_igso3(k0, mus, sigmas, weights, batch_size)
    t = jax.random.uniform(kt, (batch_size,))
    x_t = sde.sample_marginal(km, x_0, t)
    q_t = so3_ops.rotmat_to_rotvec(jnp.einsum("...ki,...kj->...ij", x_0, x_t))
    true_score = sde.compute_score(q_t, t, method="table")
    pred_score = model_fn(x_t, t)
    target = true_score / (sde.get_score_scaling(t)[..., None] + tol)
    return jnp.mean(jnp.square(pred_score - target))


def train_toy(
    key: jax.Array,
    sde: DiGMixSO3SDE,
    model,
    mus: jax.Array,
    sigmas: jax.Array,
    weights: jax.Array,
    num_steps: int = 500,
    batch_size: int = 4096,
    learning_rate: float = 5e-3,
):
    """Small AdamW training loop; returns (params, losses [num_steps])."""
    key, init_key = jax.random.split(key)
    params = model.init(
        init_key, jnp.broadcast_to(jnp.eye(3), (1, 3, 3)), jnp.zeros((1,))
    )
    tx = optax.adamw(learning_rate)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, key):
        def loss_fn(p):
            model_fn = lambda x, t: model.apply(p, x, t)
            return compute_train_loss(
                key, sde, model_fn, mus, sigmas, weights, batch_size
            )

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for i in range(num_steps):
        key, k = jax.random.split(key)
        params, opt_state, loss = step(params, opt_state, k)
        losses.append(loss)
    return params, jnp.stack(losses)
