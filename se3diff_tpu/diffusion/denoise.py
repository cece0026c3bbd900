"""Reverse-diffusion samplers compiled as single ``jax.lax.scan`` loops.

TPU-native counterpart of `bioemu/src/bioemu/denoiser.py:206-777`. The
reference runs a Python loop with one host round-trip per step; here the
whole denoising trajectory (Euler–Maruyama, Heun, DPM-solver, and the
path-recording finetune variants) is one jitted ``lax.scan``, which is the
single most important throughput lever on TPU (SURVEY.md section 7).

Model interface: ``model_fn(pos, rot, t) -> (pos_raw, rot_raw)`` where
``pos [B, L, 3]`` (nm), ``rot [B, L, 3, 3]``, ``t [B]``. Outputs follow the
reference parameterization (models.py:359-384): ``pos_raw`` predicts
``score * std`` and ``rot_raw`` predicts ``score / score_scaling``;
:func:`get_score` converts both to true scores (denoiser.py:169-203).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from se3diff_tpu.diffusion.predictors import EulerMaruyamaPredictor
from se3diff_tpu.ops import so3 as so3_ops
from se3diff_tpu.sde.base import bcast_right
from se3diff_tpu.sde.so3_sde import SO3SDE
from se3diff_tpu.sde.vpsde import CosineVPSDE

ModelFn = Callable[[jax.Array, jax.Array, jax.Array], tuple[jax.Array, jax.Array]]


@dataclass(frozen=True)
class SDEs:
    """The two corruption processes (denoiser.py:18-21)."""

    pos: CosineVPSDE
    node_orientations: SO3SDE


class DenoisedSDEPath(NamedTuple):
    """Recorded finetune path (denoiser.py:23-27), densely stacked.

    ``pos_path [T+1, B, L, 3]``, ``rot_path [T+1, B, L, 3, 3]`` include the
    prior sample at index 0. ``us``/``dWs`` are dicts with keys ``pos`` and
    ``node_orientations``, each ``[T, B, L, 3]``.
    """

    pos_path: jax.Array
    rot_path: jax.Array
    timesteps: jax.Array
    us: dict[str, jax.Array]
    dWs: dict[str, jax.Array]


def get_score(
    sdes: SDEs,
    model_fn: ModelFn,
    pos: jax.Array,
    rot: jax.Array,
    t: jax.Array,
) -> tuple[jax.Array, jax.Array]:
    """Convert raw model outputs to true scores (denoiser.py:169-203)."""
    pos_raw, rot_raw = model_fn(pos, rot, t)
    rot_score = rot_raw * bcast_right(
        sdes.node_orientations.get_score_scaling(t), rot_raw
    )
    _, pos_std = sdes.pos.marginal_prob(jnp.ones_like(pos_raw), t)
    pos_score = pos_raw / pos_std
    return pos_score, rot_score


# Per-solver production step counts: 30 for DPM-Solver-2 (the reference's
# production schedule, BIOEMU_RESULTS.md:4), 30 for DPM-Solver++(2M) (1
# NFE/step — half the reference NFE; validated against dpm-30 on the
# analytic model's exact terminal law, the golden-checkpoint
# distribution/evaluator-metric nulls, and per-sample ODE-endpoint
# convergence — tests/test_solver_quality.py, tests/test_denoise.py).
SOLVER_DEFAULT_STEPS = {"dpm": 30, "dpm_2m": 30}


def resolve_steps(steps: int | None, solver: str) -> int:
    """Step count for a solver: explicit ``steps`` wins, else the per-solver
    production default (30 unless registered otherwise)."""
    if steps is not None:
        return steps
    return SOLVER_DEFAULT_STEPS.get(solver, 30)


def _prior(key: jax.Array, sdes: SDEs, batch: int, length: int, dtype=jnp.float32):
    key_pos, key_rot = jax.random.split(key)
    pos = sdes.pos.prior_sampling(key_pos, (batch, length, 3)).astype(dtype)
    rot = sdes.node_orientations.prior_sampling(key_rot, (batch, length, 3, 3))
    return pos, rot.astype(dtype)


def _timegrid(num_steps: int, max_t: float, min_t: float, dtype=jnp.float32):
    if num_steps < 1:
        raise ValueError(f"num_steps must be >= 1, got {num_steps}")
    timesteps = jnp.linspace(max_t, min_t, num_steps + 1, dtype=dtype)
    return timesteps, jnp.diff(timesteps)


def euler_maruyama(
    key: jax.Array,
    sdes: SDEs,
    model_fn: ModelFn,
    batch: int,
    length: int,
    num_steps: int = 200,
    max_t: float = 0.99,
    min_t: float = 0.001,
    noise_weight: float = 1.0,
    marginal_concentration_factor: float = 1.0,
    dtype=jnp.float32,
) -> tuple[jax.Array, jax.Array]:
    """Prior sample + N reverse EM steps as one scan (denoiser.py:206-264).

    Returns final ``(pos [B, L, 3], rot [B, L, 3, 3])``.
    """
    key, prior_key = jax.random.split(key)
    pos, rot = _prior(prior_key, sdes, batch, length, dtype)
    timesteps, dts = _timegrid(num_steps, max_t, min_t, dtype)

    em_pos = EulerMaruyamaPredictor(
        sdes.pos, noise_weight, marginal_concentration_factor
    )
    em_rot = EulerMaruyamaPredictor(
        sdes.node_orientations, noise_weight, marginal_concentration_factor
    )

    def body(carry, idx):
        pos, rot, key = carry
        key, k_pos, k_rot = jax.random.split(key, 3)
        t = jnp.full((batch,), timesteps[idx], dtype)
        pos_score, rot_score = get_score(sdes, model_fn, pos, rot, t)
        pos = em_pos.update_given_score(k_pos, pos, t, dts[idx], pos_score)[0]
        rot = em_rot.update_given_score(k_rot, rot, t, dts[idx], rot_score)[0]
        return (pos, rot, key), None

    (pos, rot, _), _ = jax.lax.scan(body, (pos, rot, key), jnp.arange(num_steps))
    return pos, rot


def euler_maruyama_finetune(
    key: jax.Array,
    sdes: SDEs,
    model_fn: ModelFn,
    finetune_model_fn: ModelFn,
    batch: int,
    length: int,
    num_steps: int = 200,
    max_t: float = 0.99,
    min_t: float = 0.001,
    dtype=jnp.float32,
) -> DenoisedSDEPath:
    """EM sampling with the finetune control in the drift, recording the path.

    Counterpart of denoiser.py:267-348: per step the control ``u_t`` (raw
    finetune-model output) and Brownian increment ``dW_t`` are recorded for
    both channels, plus the full state trajectory.
    """
    key, prior_key = jax.random.split(key)
    pos0, rot0 = _prior(prior_key, sdes, batch, length, dtype)
    timesteps, dts = _timegrid(num_steps, max_t, min_t, dtype)

    em_pos = EulerMaruyamaPredictor(sdes.pos, 1.0, 1.0)
    em_rot = EulerMaruyamaPredictor(sdes.node_orientations, 1.0, 1.0)

    def body(carry, idx):
        pos, rot, key = carry
        key, k_pos, k_rot = jax.random.split(key, 3)
        t = jnp.full((batch,), timesteps[idx], dtype)
        pos_score, rot_score = get_score(sdes, model_fn, pos, rot, t)
        u_pos, u_rot = finetune_model_fn(pos, rot, t)

        pos, _, dW_pos = em_pos.update_given_score(
            k_pos, pos, t, dts[idx], pos_score, finetune_score=u_pos
        )
        rot, _, dW_rot = em_rot.update_given_score(
            k_rot, rot, t, dts[idx], rot_score, finetune_score=u_rot
        )
        ys = (pos, rot, u_pos, u_rot, dW_pos, dW_rot)
        return (pos, rot, key), ys

    (_, _, _), ys = jax.lax.scan(body, (pos0, rot0, key), jnp.arange(num_steps))
    pos_steps, rot_steps, u_pos, u_rot, dW_pos, dW_rot = ys

    pos_path = jnp.concatenate([pos0[None], pos_steps], axis=0)
    rot_path = jnp.concatenate([rot0[None], rot_steps], axis=0)
    return DenoisedSDEPath(
        pos_path=pos_path,
        rot_path=rot_path,
        timesteps=timesteps,
        us={"pos": u_pos, "node_orientations": u_rot},
        dWs={"pos": dW_pos, "node_orientations": dW_rot},
    )


def heun(
    key: jax.Array,
    sdes: SDEs,
    model_fn: ModelFn,
    batch: int,
    length: int,
    num_steps: int = 100,
    max_t: float = 0.99,
    min_t: float = 0.001,
    noise: float = 0.5,
    dtype=jnp.float32,
) -> tuple[jax.Array, jax.Array]:
    """Karras-style 2nd-order deterministic sampler with noise churn.

    Counterpart of denoiser.py:351-461: re-noise to ``t_hat``, first-order
    probability-flow step to ``t_next``, then average the drift with the one
    evaluated at the endpoint.
    """
    key, prior_key = jax.random.split(key)
    pos, rot = _prior(prior_key, sdes, batch, length, dtype)
    timesteps, dts = _timegrid(num_steps, max_t, min_t, dtype)

    ode_pos = EulerMaruyamaPredictor(sdes.pos, 0.0, 1.0)
    ode_rot = EulerMaruyamaPredictor(sdes.node_orientations, 0.0, 1.0)
    em_pos = EulerMaruyamaPredictor(sdes.pos, 1.0, 1.0)
    em_rot = EulerMaruyamaPredictor(sdes.node_orientations, 1.0, 1.0)

    def body(carry, idx):
        pos, rot, key = carry
        key, k_pos, k_rot = jax.random.split(key, 3)
        t_val = timesteps[idx]
        t = jnp.full((batch,), t_val, dtype)
        t_next = t + dts[idx]

        churn = (idx > 0) & (t_val > 0.0) & (t_val < 1.0)
        t_hat = jnp.where(churn, t - noise * dts[idx], t)
        dt_fwd = (t_hat - t)[0]

        pos_hat = em_pos.forward_sde_step(k_pos, pos, t, dt_fwd)[0]
        rot_hat = em_rot.forward_sde_step(k_rot, rot, t, dt_fwd)[0]

        pos_score, rot_score = get_score(sdes, model_fn, pos_hat, rot_hat, t_hat)
        drift_pos, _ = ode_pos.reverse_drift_and_diffusion(pos_hat, t_hat, pos_score)
        drift_rot, _ = ode_rot.reverse_drift_and_diffusion(rot_hat, t_hat, rot_score)

        dt_step = (t_next - t_hat)[0]
        pos_1 = ode_pos.mean_update(pos_hat, dt_step, drift_pos)
        rot_1 = ode_rot.mean_update(rot_hat, dt_step, drift_rot)

        # 2nd-order correction (skipped when t_next == 0).
        pos_score_n, rot_score_n = get_score(sdes, model_fn, pos_1, rot_1, t_next)
        drift_pos_n, _ = ode_pos.reverse_drift_and_diffusion(pos_1, t_next, pos_score_n)
        drift_rot_n, _ = ode_rot.reverse_drift_and_diffusion(rot_1, t_next, rot_score_n)
        pos_2 = ode_pos.mean_update(pos_hat, dt_step, (drift_pos + drift_pos_n) / 2)
        rot_2 = ode_rot.mean_update(rot_hat, dt_step, (drift_rot + drift_rot_n) / 2)

        correct = t_next[0] > 0.0
        pos = jnp.where(correct, pos_2, pos_1)
        rot = jnp.where(correct, rot_2, rot_1)
        return (pos, rot, key), None

    (pos, rot, _), _ = jax.lax.scan(body, (pos, rot, key), jnp.arange(num_steps))
    return pos, rot


def heun_finetune(
    key: jax.Array,
    sdes: SDEs,
    model_fn: ModelFn,
    finetune_model_fn: ModelFn,
    batch: int,
    length: int,
    num_steps: int = 100,
    max_t: float = 0.99,
    min_t: float = 0.001,
    noise: float = 0.5,
    dtype=jnp.float32,
) -> DenoisedSDEPath:
    """Heun sampling with finetune control and path recording.

    Counterpart of denoiser.py:464-620. The Brownian increments are recovered
    with `traceback_brownian_motion` against the EM reverse drift at the
    pre-churn state ``(x, t)``, exactly as the reference does. Where the
    reference reuses ``score_hat`` at step 0 (no churn), ``(x_hat, t_hat) ==
    (x, t)`` so always evaluating at ``(x, t)`` is equivalent.
    """
    key, prior_key = jax.random.split(key)
    pos0, rot0 = _prior(prior_key, sdes, batch, length, dtype)
    timesteps, dts = _timegrid(num_steps, max_t, min_t, dtype)

    ode_pos = EulerMaruyamaPredictor(sdes.pos, 0.0, 1.0)
    ode_rot = EulerMaruyamaPredictor(sdes.node_orientations, 0.0, 1.0)
    em_pos = EulerMaruyamaPredictor(sdes.pos, 1.0, 1.0)
    em_rot = EulerMaruyamaPredictor(sdes.node_orientations, 1.0, 1.0)

    def body(carry, idx):
        pos, rot, key = carry
        key, k_pos, k_rot = jax.random.split(key, 3)
        t_val = timesteps[idx]
        t = jnp.full((batch,), t_val, dtype)
        t_next = t + dts[idx]

        churn = (idx > 0) & (t_val > 0.0) & (t_val < 1.0)
        t_hat = jnp.where(churn, t - noise * dts[idx], t)
        dt_fwd = (t_hat - t)[0]

        pos_hat = em_pos.forward_sde_step(k_pos, pos, t, dt_fwd)[0]
        rot_hat = em_rot.forward_sde_step(k_rot, rot, t, dt_fwd)[0]

        pos_score_hat, rot_score_hat = get_score(sdes, model_fn, pos_hat, rot_hat, t_hat)
        u_pos_hat, u_rot_hat = finetune_model_fn(pos_hat, rot_hat, t_hat)

        # Scores/controls at the pre-churn state for the dW traceback.
        pos_score_pre, rot_score_pre = get_score(sdes, model_fn, pos, rot, t)
        u_pos_pre, u_rot_pre = finetune_model_fn(pos, rot, t)

        drift_pos, _ = ode_pos.reverse_drift_and_diffusion(
            pos_hat, t_hat, pos_score_hat, finetune_score=u_pos_hat
        )
        drift_rot, _ = ode_rot.reverse_drift_and_diffusion(
            rot_hat, t_hat, rot_score_hat, finetune_score=u_rot_hat
        )
        dt_step = (t_next - t_hat)[0]
        pos_1 = ode_pos.mean_update(pos_hat, dt_step, drift_pos)
        rot_1 = ode_rot.mean_update(rot_hat, dt_step, drift_rot)

        pos_score_n, rot_score_n = get_score(sdes, model_fn, pos_1, rot_1, t_next)
        u_pos_n, u_rot_n = finetune_model_fn(pos_1, rot_1, t_next)
        drift_pos_n, _ = ode_pos.reverse_drift_and_diffusion(
            pos_1, t_next, pos_score_n, finetune_score=u_pos_n
        )
        drift_rot_n, _ = ode_rot.reverse_drift_and_diffusion(
            rot_1, t_next, rot_score_n, finetune_score=u_rot_n
        )
        pos_2 = ode_pos.mean_update(pos_hat, dt_step, (drift_pos + drift_pos_n) / 2)
        rot_2 = ode_rot.mean_update(rot_hat, dt_step, (drift_rot + drift_rot_n) / 2)

        correct = t_next[0] > 0.0
        pos_new = jnp.where(correct, pos_2, pos_1)
        rot_new = jnp.where(correct, rot_2, rot_1)

        dW_pos = em_pos.traceback_brownian_motion(
            pos_new, pos, t, dts[idx], pos_score_pre, finetune_score=u_pos_pre
        )
        dW_rot = em_rot.traceback_brownian_motion(
            rot_new, rot, t, dts[idx], rot_score_pre, finetune_score=u_rot_pre
        )
        ys = (pos_new, rot_new, u_pos_pre, u_rot_pre, dW_pos, dW_rot)
        return (pos_new, rot_new, key), ys

    (_, _, _), ys = jax.lax.scan(body, (pos0, rot0, key), jnp.arange(num_steps))
    pos_steps, rot_steps, u_pos, u_rot, dW_pos, dW_rot = ys

    return DenoisedSDEPath(
        pos_path=jnp.concatenate([pos0[None], pos_steps], axis=0),
        rot_path=jnp.concatenate([rot0[None], rot_steps], axis=0),
        timesteps=timesteps,
        us={"pos": u_pos, "node_orientations": u_rot},
        dWs={"pos": dW_pos, "node_orientations": dW_rot},
    )


def _t_from_lambda(sde: CosineVPSDE, lambda_t: jax.Array) -> jax.Array:
    """Invert the cosine schedule in lambda = log(alpha/sigma) space.

    DPM-solver Appendix D.4 (denoiser.py:623-631).
    """
    f_lambda = -0.5 * jnp.log(jnp.exp(-2.0 * lambda_t) + 1.0)
    exponent = f_lambda + jnp.log(
        jnp.cos(jnp.asarray(jnp.pi * sde.s / 2.0 / (1.0 + sde.s), lambda_t.dtype))
    )
    return 2.0 * (1.0 + sde.s) / jnp.pi * jnp.arccos(jnp.exp(exponent)) - sde.s


def dpm_solver(
    key: jax.Array,
    sdes: SDEs,
    model_fn: ModelFn,
    batch: int,
    length: int,
    num_steps: int = 50,
    max_t: float = 0.99,
    min_t: float = 0.001,
    dtype=jnp.float32,
) -> tuple[jax.Array, jax.Array]:
    """DPM-Solver-2 for positions; 1st-order ODE + 2nd-order score correction
    for rotations (denoiser.py:634-764).
    """
    assert max_t < 1.0
    key, prior_key = jax.random.split(key)
    pos, rot = _prior(prior_key, sdes, batch, length, dtype)
    timesteps, dts = _timegrid(num_steps, max_t, min_t, dtype)

    ode_rot = EulerMaruyamaPredictor(sdes.node_orientations, 0.0, 1.0)
    pos_sde = sdes.pos

    def body(carry, idx):
        pos, rot, key = carry
        t = jnp.full((batch,), timesteps[idx], dtype)
        t_next = t + dts[idx]

        pos_score, rot_score = get_score(sdes, model_fn, pos, rot, t)

        alpha_t, sigma_t = pos_sde.mean_coeff_and_std(pos, t)
        lambda_t = jnp.log(alpha_t / sigma_t)
        alpha_t_next, sigma_t_next = pos_sde.mean_coeff_and_std(pos, t_next)
        lambda_t_next = jnp.log(alpha_t_next / sigma_t_next)
        h_t = lambda_t_next - lambda_t

        lambda_mid = (lambda_t + lambda_t_next) / 2.0
        t_lambda_full = _t_from_lambda(pos_sde, lambda_mid)
        t_lambda = jnp.full((batch,), t_lambda_full.reshape(-1)[0], dtype)
        alpha_t_lambda, sigma_t_lambda = pos_sde.mean_coeff_and_std(pos, t_lambda)

        # Half step in lambda space for positions.
        pos_u = (
            alpha_t_lambda / alpha_t * pos
            + sigma_t_lambda * sigma_t * jnp.expm1(h_t / 2.0) * pos_score
        )

        # Rotations: 1st-order ODE step from t to t_lambda.
        drift_rot, _ = ode_rot.reverse_drift_and_diffusion(rot, t, rot_score)
        rot_u = ode_rot.mean_update(rot, (t_lambda - t)[0], drift_rot)

        # Correction step at the midpoint.
        pos_score_u, rot_score_u = get_score(sdes, model_fn, pos_u, rot_u, t_lambda)

        pos_next = (
            alpha_t_next / alpha_t * pos
            + sigma_t_next * sigma_t_lambda * jnp.expm1(h_t) * pos_score_u
        )

        # 2nd-order score correction for rotations.
        rot_score_corr = rot_score_u + 0.5 * (rot_score_u - rot_score) / (
            t_lambda - t
        )[0] * dts[idx]
        drift_rot_c, _ = ode_rot.reverse_drift_and_diffusion(rot_u, t_lambda, rot_score_corr)
        rot_next = ode_rot.mean_update(rot, dts[idx], drift_rot_c)

        return (pos_next, rot_next, key), None

    (pos, rot, _), _ = jax.lax.scan(body, (pos, rot, key), jnp.arange(num_steps))
    return pos, rot


def dpm_solver_pp2m(
    key: jax.Array,
    sdes: SDEs,
    model_fn: ModelFn,
    batch: int,
    length: int,
    num_steps: int = 30,
    max_t: float = 0.99,
    min_t: float = 0.001,
    dtype=jnp.float32,
) -> tuple[jax.Array, jax.Array]:
    """Multistep DPM-Solver++(2M): second-order accuracy at ONE model
    evaluation per step.

    Beyond-reference solver (the reference's `dpm_solver`, denoiser.py:634-764,
    is single-step DPM-Solver-2 and costs TWO evaluations per step — at equal
    step count this halves the NFE and roughly doubles sampling throughput).
    Positions follow DPM-Solver++(2M) in data-prediction form (Lu et al. 2022,
    arXiv:2211.01095, Algorithm 2): with ``h_i = lambda_{i+1} - lambda_i`` and
    ``r = h_{i-1} / h_i``,

        x0_i   = (x + sigma_i^2 * score) / alpha_i
        D_i    = (1 + 1/(2r)) x0_i - 1/(2r) x0_{i-1}
        x_{i+1} = (sigma_{i+1}/sigma_i) x - alpha_{i+1} (e^{-h_i} - 1) D_i

    Rotations take a first-order probability-flow ODE step on the manifold
    (``mean_update``). Measured on the analytic-score model against an
    EM-1000 ground truth (mean angle 0.0336 rad): first-order rotations land
    at 0.044 at 30 steps, essentially matching DPM-Solver-2's 0.040, while an
    Adams–Bashforth extrapolation of the drift overshoots to 0.054 — the
    score scaling is stiff as t -> 0, so extrapolating it hurts; hence no
    multistep correction for the rotation field. The first position step
    falls back to first order (DDIM).
    """
    assert max_t < 1.0
    key, prior_key = jax.random.split(key)
    pos, rot = _prior(prior_key, sdes, batch, length, dtype)
    timesteps, dts = _timegrid(num_steps, max_t, min_t, dtype)

    ode_rot = EulerMaruyamaPredictor(sdes.node_orientations, 0.0, 1.0)
    pos_sde = sdes.pos

    def body(carry, idx):
        pos, rot, x0_prev, h_prev = carry
        t = jnp.full((batch,), timesteps[idx], dtype)
        t_next = t + dts[idx]

        pos_score, rot_score = get_score(sdes, model_fn, pos, rot, t)

        alpha_t, sigma_t = pos_sde.mean_coeff_and_std(pos, t)
        alpha_next, sigma_next = pos_sde.mean_coeff_and_std(pos, t_next)
        h_t = jnp.log(alpha_next / sigma_next) - jnp.log(alpha_t / sigma_t)
        h_scalar = h_t.reshape(-1)[0]

        x0 = (pos + sigma_t**2 * pos_score) / alpha_t
        r = jnp.where(idx == 0, 1.0, h_prev / jnp.where(h_scalar == 0, 1.0, h_scalar))
        c = 1.0 / (2.0 * r)
        D = jnp.where(idx == 0, x0, (1.0 + c) * x0 - c * x0_prev)
        pos_next = (
            sigma_next / sigma_t * pos
            - alpha_next * jnp.expm1(-h_t) * D
        )

        # Rotations: first-order geometric ODE step (see docstring).
        drift_rot, _ = ode_rot.reverse_drift_and_diffusion(rot, t, rot_score)
        rot_next = ode_rot.mean_update(rot, dts[idx], drift_rot)

        return (pos_next, rot_next, x0, h_scalar), None

    init = (pos, rot, jnp.zeros_like(pos), jnp.asarray(1.0, dtype))
    (pos, rot, _, _), _ = jax.lax.scan(body, init, jnp.arange(num_steps))
    return pos, rot


def sde_dpm_solver_finetune(
    key: jax.Array,
    sdes: SDEs,
    model_fn: ModelFn,
    finetune_model_fn: ModelFn,
    batch: int,
    length: int,
    num_steps: int = 30,
    max_t: float = 0.99,
    min_t: float = 0.001,
    dtype=jnp.float32,
) -> DenoisedSDEPath:
    """DPM-Solver-2 sampling with finetune control and path recording.

    The reference ships only this function's signature — `denoiser.py:767-777`
    is an empty (``...``) stub next to a config file that names it. This is a
    working implementation, completing the API: the `dpm_solver` update
    (denoiser.py:634-764) is run with the control ``u`` folded into the
    probability-flow drift, and the Brownian increment that the recorded
    transition *implies under the controlled EM reverse SDE* is recovered
    with `traceback_brownian_motion` — exactly the mechanism `heun_finetune`
    uses (denoiser.py:464-620), which is integrator-agnostic: the PPFT
    replay gradient only needs ``(x_path, u, dW)`` to be consistent with
    ``x_next = mean_EM(x; score, u) + g dW``.

    Control enters the position update through the effective score: the
    controlled flow drift is ``f - g^2/2 (score - u/g)``, so the DPM
    lambda-space step is unchanged with ``score <- score - u/g``. Rotations
    add the control via ``reverse_drift_and_diffusion(finetune_score=u)``
    as in the other finetune paths. The payoff is path generation at the
    production solver's step count (~30 vs heun's 100 / EM's 200 model
    evaluations per path).
    """
    assert max_t < 1.0
    key, prior_key = jax.random.split(key)
    pos0, rot0 = _prior(prior_key, sdes, batch, length, dtype)
    timesteps, dts = _timegrid(num_steps, max_t, min_t, dtype)

    ode_rot = EulerMaruyamaPredictor(sdes.node_orientations, 0.0, 1.0)
    em_pos = EulerMaruyamaPredictor(sdes.pos, 1.0, 1.0)
    em_rot = EulerMaruyamaPredictor(sdes.node_orientations, 1.0, 1.0)
    pos_sde = sdes.pos

    def ctrl_score(pos, rot, t):
        """(score, u, score - u/g) for both channels at (x, t)."""
        pos_score, rot_score = get_score(sdes, model_fn, pos, rot, t)
        u_pos, u_rot = finetune_model_fn(pos, rot, t)
        _, g = pos_sde.sde(x=pos, t=t)
        return pos_score, rot_score, u_pos, u_rot, pos_score - u_pos / g

    def body(carry, idx):
        pos, rot, key = carry
        t = jnp.full((batch,), timesteps[idx], dtype)
        t_next = t + dts[idx]

        pos_score, rot_score, u_pos, u_rot, pos_eff = ctrl_score(pos, rot, t)

        alpha_t, sigma_t = pos_sde.mean_coeff_and_std(pos, t)
        lambda_t = jnp.log(alpha_t / sigma_t)
        alpha_t_next, sigma_t_next = pos_sde.mean_coeff_and_std(pos, t_next)
        lambda_t_next = jnp.log(alpha_t_next / sigma_t_next)
        h_t = lambda_t_next - lambda_t

        lambda_mid = (lambda_t + lambda_t_next) / 2.0
        t_lambda_full = _t_from_lambda(pos_sde, lambda_mid)
        t_lambda = jnp.full((batch,), t_lambda_full.reshape(-1)[0], dtype)
        alpha_t_lambda, sigma_t_lambda = pos_sde.mean_coeff_and_std(pos, t_lambda)

        # Half step in lambda space with the controlled score.
        pos_u = (
            alpha_t_lambda / alpha_t * pos
            + sigma_t_lambda * sigma_t * jnp.expm1(h_t / 2.0) * pos_eff
        )

        # Rotations: 1st-order controlled ODE step from t to t_lambda.
        drift_rot, _ = ode_rot.reverse_drift_and_diffusion(
            rot, t, rot_score, finetune_score=u_rot
        )
        rot_u = ode_rot.mean_update(rot, (t_lambda - t)[0], drift_rot)

        # Correction at the midpoint, controls re-evaluated there.
        _, rot_score_u, u_pos_u, u_rot_u, pos_eff_u = ctrl_score(
            pos_u, rot_u, t_lambda
        )
        pos_next = (
            alpha_t_next / alpha_t * pos
            + sigma_t_next * sigma_t_lambda * jnp.expm1(h_t) * pos_eff_u
        )

        # 2nd-order score correction for rotations (controlled field).
        rot_score_corr = rot_score_u + 0.5 * (rot_score_u - rot_score) / (
            t_lambda - t
        )[0] * dts[idx]
        drift_rot_c, _ = ode_rot.reverse_drift_and_diffusion(
            rot_u, t_lambda, rot_score_corr, finetune_score=u_rot_u
        )
        rot_next = ode_rot.mean_update(rot, dts[idx], drift_rot_c)

        # Brownian increments implied under the controlled EM reverse SDE
        # at the pre-step state — the contract the replay gradient needs.
        dW_pos = em_pos.traceback_brownian_motion(
            pos_next, pos, t, dts[idx], pos_score, finetune_score=u_pos
        )
        dW_rot = em_rot.traceback_brownian_motion(
            rot_next, rot, t, dts[idx], rot_score, finetune_score=u_rot
        )
        ys = (pos_next, rot_next, u_pos, u_rot, dW_pos, dW_rot)
        return (pos_next, rot_next, key), ys

    (_, _, _), ys = jax.lax.scan(body, (pos0, rot0, key), jnp.arange(num_steps))
    pos_steps, rot_steps, u_pos, u_rot, dW_pos, dW_rot = ys

    return DenoisedSDEPath(
        pos_path=jnp.concatenate([pos0[None], pos_steps], axis=0),
        rot_path=jnp.concatenate([rot0[None], rot_steps], axis=0),
        timesteps=timesteps,
        us={"pos": u_pos, "node_orientations": u_rot},
        dWs={"pos": dW_pos, "node_orientations": dW_rot},
    )


def parallel_picard_em(
    key: jax.Array,
    sdes: SDEs,
    model_fn: ModelFn,
    batch: int,
    length: int,
    num_steps: int = 30,
    num_sweeps: int | None = None,
    max_t: float = 0.99,
    min_t: float = 0.001,
    noise_weight: float = 1.0,
    marginal_concentration_factor: float = 1.0,
    dtype=jnp.float32,
) -> tuple[jax.Array, jax.Array]:
    """Parallel-in-time Euler-Maruyama sampling via Picard iteration.

    Instead of N sequential model calls, each sweep evaluates the drift at
    ALL timesteps at once (one model call on a [N*B] batch) and rebuilds the
    trajectory by prefix aggregation: cumulative sums for translations and a
    cumulative right-product of rotation increments via
    ``jax.lax.associative_scan`` on SO(3). With the noise sequence fixed,
    sweep m reproduces the sequential trajectory exactly up to step m, so
    ``num_sweeps == num_steps`` equals :func:`euler_maruyama` (same key) and
    small ``num_sweeps`` trades accuracy for wall-clock (cf. Shih et al.
    2023, arXiv:2305.16317, and the SO(3) variant arXiv:2507.10347).

    Measured verdict (v5e, B=1, L=100, em-200, bf16 — round-4 campaign,
    docs/PERF.md "Round-4 Picard verdict"): **loses at every sweep count
    on one chip** — 8.08x slower than the sequential scan at 8 sweeps,
    24.3x at 25, 46.4x at 50. Each sweep is a sequential-equivalent
    full-trajectory model eval and the single-chip MXU is already
    saturated, so there is no parallel resource to exploit. Therefore
    NOT re-exported from `se3diff_tpu.diffusion`; kept for the
    multi-chip time-sharded regime (or tiny dispatch-bound models).
    """
    num_sweeps = num_steps if num_sweeps is None else num_sweeps
    key, prior_key = jax.random.split(key)
    pos0, rot0 = _prior(prior_key, sdes, batch, length, dtype)
    timesteps, dts = _timegrid(num_steps, max_t, min_t, dtype)

    em_pos = EulerMaruyamaPredictor(
        sdes.pos, noise_weight, marginal_concentration_factor
    )
    em_rot = EulerMaruyamaPredictor(
        sdes.node_orientations, noise_weight, marginal_concentration_factor
    )

    # Reproduce the sequential sampler's key chain so the Brownian increments
    # are identical draw-for-draw.
    ks_pos, ks_rot = [], []
    for _ in range(num_steps):
        key, k_pos, k_rot = jax.random.split(key, 3)
        ks_pos.append(k_pos)
        ks_rot.append(k_rot)
    z_pos = jax.vmap(
        lambda k: jax.random.normal(k, (batch, length, 3), dtype)
    )(jnp.stack(ks_pos))
    z_rot = jax.vmap(
        lambda k: jax.random.normal(k, (batch, length, 3), dtype)
    )(jnp.stack(ks_rot))
    sqdt = jnp.sqrt(jnp.abs(dts)).reshape(-1, 1, 1, 1)
    dW_pos = noise_weight * sqdt * z_pos  # [N, B, L, 3]
    dW_rot = noise_weight * sqdt * z_rot

    T = num_steps
    t_all = jnp.broadcast_to(timesteps[:T, None], (T, batch)).astype(dtype)
    t_flat = t_all.reshape(T * batch)
    dts_b = dts.reshape(T, 1, 1, 1)

    def sweep(carry, _):
        pos_traj, rot_traj = carry  # states BEFORE each step: [N, B, L, ...]
        pos_score, rot_score = get_score(
            sdes,
            model_fn,
            pos_traj.reshape(T * batch, length, 3),
            rot_traj.reshape(T * batch, length, 3, 3),
            t_flat,
        )
        pos_score = pos_score.reshape(T, batch, length, 3)
        rot_score = rot_score.reshape(T, batch, length, 3)

        drift_pos, diff_pos = em_pos.reverse_drift_and_diffusion(
            pos_traj, t_all.reshape(T, batch), pos_score
        )
        drift_rot, diff_rot = em_rot.reverse_drift_and_diffusion(
            rot_traj, t_all.reshape(T, batch), rot_score
        )

        pos_inc = drift_pos * dts_b + bcast_right(diff_pos, dW_pos) * dW_pos
        cum_pos = jnp.cumsum(pos_inc, axis=0)
        new_pos_traj = jnp.concatenate(
            [pos0[None], pos0[None] + cum_pos[:-1]], axis=0
        )

        tol = sdes.node_orientations.tol
        E = jnp.einsum(
            "...ij,...jk->...ik",
            so3_ops.rotvec_to_rotmat(drift_rot * dts_b[..., 0][..., None], tol=tol),
            so3_ops.rotvec_to_rotmat(
                bcast_right(diff_rot, dW_rot) * dW_rot, tol=tol
            ),
        )  # [N, B, L, 3, 3] per-step increments
        P = jax.lax.associative_scan(
            lambda a, b: jnp.einsum("...ij,...jk->...ik", a, b), E, axis=0
        )
        new_rot_traj = jnp.concatenate(
            [
                rot0[None],
                jnp.einsum("blij,nbljk->nblik", rot0, P[:-1]),
            ],
            axis=0,
        )
        final = (
            pos0 + cum_pos[-1],
            jnp.einsum("blij,bljk->blik", rot0, P[-1]),
        )
        return (new_pos_traj, new_rot_traj), final

    init = (
        jnp.broadcast_to(pos0[None], (T, batch, length, 3)).astype(dtype),
        jnp.broadcast_to(rot0[None], (T, batch, length, 3, 3)).astype(dtype),
    )
    (_, _), finals = jax.lax.scan(sweep, init, None, length=num_sweeps)
    return finals[0][-1], finals[1][-1]
