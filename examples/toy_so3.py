"""Worked example: the SO(3) IGSO(3)-mixture toy (reference se3diff.ipynb).

Trains a score network on a 3-component IGSO(3) mixture by denoising score
matching, samples it back with the Euler–Maruyama reverse SDE, then
PPFT-fine-tunes the component weights toward a new target (the paper's
Milestone 1-2; mixture parameters from se3diff.ipynb cell 2, finetune target
w* = (0.4, 0.2, 0.4)).

Run:  python examples/toy_so3.py [--quick]
Writes ``toy_so3_marginals.png`` comparing the analytic angle-marginal pdf
against histograms of base and fine-tuned samples.

Reference result (full settings, CPU, ~15 min): trained component weights
recover the target mixture to ~0.01 ([0.289, 0.400, 0.310] vs
[0.3, 0.4, 0.3]) and PPFT fine-tuning moves them to the new target
([0.385, 0.248, 0.367] vs h* = [0.4, 0.2, 0.4]) — the paper's
Milestone-1/2 experiment (tex/example_paper.tex:112).
"""

from __future__ import annotations

import argparse
import os
import sys

# Allow running straight from a repo checkout: python examples/toy_so3.py
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from se3diff_tpu.ops import so3 as so3_ops
from se3diff_tpu.toy.finetune import assign_igso3, finetune_toy, reverse_finetune_diffusion
from se3diff_tpu.toy.models import DiGMixSO3SDE, ScoreNet
from se3diff_tpu.toy.train import (
    igso3_mixture_marginal_pdf,
    reverse_diffusion,
    train_toy,
)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true", help="tiny settings for smoke runs")
    p.add_argument("--out", default="toy_so3_marginals.png")
    args = p.parse_args()

    # Mixture: components at I, R_y(pi/2), R_z(pi) (se3diff.ipynb cell 2).
    mus = jnp.stack([
        jnp.eye(3),
        jnp.asarray([[0.0, 0.0, 1.0], [0.0, 1.0, 0.0], [-1.0, 0.0, 0.0]]),
        jnp.asarray([[-1.0, 0.0, 0.0], [0.0, -1.0, 0.0], [0.0, 0.0, 1.0]]),
    ])
    sigmas = jnp.asarray([0.2, 0.1, 0.3])
    weights = jnp.asarray([0.3, 0.4, 0.3])
    h_stars = jnp.asarray([0.4, 0.2, 0.4])  # finetune target weights

    so3_kwargs = (
        dict(num_sigma=32, num_omega=256, l_max=200)
        if args.quick
        else dict(num_sigma=100, num_omega=1000, l_max=1000)
    )
    sde = DiGMixSO3SDE(**so3_kwargs)
    model = ScoreNet()

    key = jax.random.key(0)
    key, k_train = jax.random.split(key)
    train_steps = 50 if args.quick else 1500
    params, losses = train_toy(
        k_train, sde, model, mus, sigmas, weights,
        num_steps=train_steps, batch_size=1024 if args.quick else 4096,
    )
    print(f"train: loss {float(losses[0]):.3f} -> {float(losses[-1]):.3f}")

    model_fn = lambda x, t: model.apply(params, x, t)
    key, k_sample = jax.random.split(key)
    xs, _ = jax.jit(
        lambda k: reverse_diffusion(k, sde, model_fn, batch_size=4096,
                                    num_steps=64 if args.quick else 200)
    )(k_sample)
    base_samples = xs[-1]

    # Component responsibilities of the sampled ensemble.
    resp = assign_igso3(base_samples, mus, sigmas, weights, l_max=200)
    base_weights = jnp.mean(resp, axis=0)
    print("sampled component weights:", np.round(np.asarray(base_weights), 3),
          "target:", np.asarray(weights))

    # PPFT fine-tune toward h*.
    key, k_ft = jax.random.split(key)
    ft_model = ScoreNet()
    ft_params, ft_losses = finetune_toy(
        k_ft, sde, model_fn, ft_model, mus, sigmas, h_stars,
        num_steps_opt=20 if args.quick else 150,
        batch_size=512 if args.quick else 1024,
        num_steps=32 if args.quick else 100,
        l_max=200,
    )
    print(f"finetune: loss {float(ft_losses[0]):.4f} -> {float(ft_losses[-1]):.4f}")

    ft_fn = lambda x, t: ft_model.apply(ft_params, x, t)
    key, k_s2 = jax.random.split(key)
    path = jax.jit(
        lambda k: reverse_finetune_diffusion(
            k, sde, model_fn, ft_fn, batch_size=4096,
            num_steps=64 if args.quick else 200,
        )
    )(k_s2)
    ft_samples = path[0][-1]
    ft_weights = jnp.mean(
        assign_igso3(ft_samples, mus, sigmas, weights, l_max=200), axis=0
    )
    print("fine-tuned component weights:", np.round(np.asarray(ft_weights), 3),
          "target h*:", np.asarray(h_stars))

    # Plot angle marginals.
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    omega, pdf = igso3_mixture_marginal_pdf(mus, sigmas, weights, l_max=200)
    fig, ax = plt.subplots(figsize=(6, 4))
    ax.plot(np.asarray(omega), np.asarray(pdf), label="analytic mixture pdf")
    for name, samples in [("base", base_samples), ("fine-tuned", ft_samples)]:
        angles = np.asarray(so3_ops.angle_from_rotmat(samples)[0])
        ax.hist(angles, bins=80, density=True, alpha=0.4, label=f"{name} samples")
    ax.set_xlabel("rotation angle")
    ax.set_ylabel("density")
    ax.legend()
    fig.tight_layout()
    fig.savefig(args.out, dpi=120)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
