"""PPFT learning run THROUGH the product trainer (`ppft/trainer.py:finetune`).

Round-4's learning evidence (docs/PPFT_LEARNING.md) used a bespoke loop
(`scripts/ppft_learning_run.py`: fixed lr, no best-val tracking); its run B
descended 5x and then traversed an importance-weight degeneracy (path-KL
~200 nats, val-loss spike at step 75) — exactly the failure mode the
reference's best-val loop (finetune.py:517-692) exists to manage. This
script runs the SAME problem (in-repo SH3 prior, 2L/d64 near-zero control,
L=56 GRB2-SH3 mutants, path batch 256, EM-200 recorder) through the product
trainer: epoch-0 validation, per-epoch validation + best-val tracking,
per-epoch checkpoints, committed history.json — and optionally the
beyond-reference `kl_guard` trust region for an A/B against the unguarded
reference behavior.

The data split reproduces run B's (seed-0 permutation: first 4 = held-out
validation mutants) with a --train_mutants-sized train subset so one epoch
= that many optimizer updates (data_batch_size=1); lr is flat at run B's
2e-3 (eta_min == lr) so the degeneracy regime is reachable.

    python scripts/ppft_trainer_run_r5.py --prior_params /tmp/sh3_prior/params.npz \
        --output_dir /tmp/ppft_trainer_r5 [--kl_guard 80]
    python scripts/ppft_trainer_run_r5.py --tiny --platform cpu   # CPU smoke
"""

from __future__ import annotations

import argparse
import sys
from functools import partial
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--train_mutants", type=int, default=25,
                   help="train-subset size; 1 epoch = this many updates")
    p.add_argument("--val_size", type=int, default=4)
    p.add_argument("--num_epochs", type=int, default=5)
    p.add_argument("--batch", type=int, default=256, help="path batch size")
    p.add_argument("--num_steps", type=int, default=200,
                   help="EM recorder diffusion steps")
    p.add_argument("--lr", type=float, default=2e-3,
                   help="flat (eta_min == lr), matching run B's hot rate")
    p.add_argument("--lambda_", type=float, default=2e-5)
    p.add_argument("--kl_guard", type=float, default=None,
                   help="trust-region threshold in nats (None = reference "
                        "behavior; run B degenerated at ~200)")
    p.add_argument("--seed", type=int, default=0,
                   help="split seed 0 reproduces run B's val mutants; the "
                        "trainer key stream is seeded separately below")
    p.add_argument("--trainer_seed", type=int, default=1)
    p.add_argument("--csv", default=str(
        REPO / "assets" / "reference_h" / "GRB2_SH3_high_confidence.csv"))
    p.add_argument("--prior_params",
                   default="/tmp/sh3_prior/params.npz",
                   help="frozen prior (scripts/pretrain_sh3_prior.py export)")
    p.add_argument("--init_control", default=None,
                   help="keystr-flattened npz (ppft_learning_run.py "
                        "--save_control format) to continue a control from")
    p.add_argument("--output_dir", default="/tmp/ppft_trainer_r5")
    p.add_argument("--tiny", action="store_true",
                   help="tiny score net + small batch/steps (CPU smoke)")
    p.add_argument("--platform", default=None, choices=["cpu", "axon", "tpu"])
    args = p.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    import jax.numpy as jnp
    import numpy as np
    import pandas as pd

    from se3diff_tpu.diffusion import denoise
    from se3diff_tpu.models.dig import DiGConditionalScoreModel
    from se3diff_tpu.ppft.h_functions import FoldingStability
    from se3diff_tpu.ppft.trainer import (
        FinetuneBundle, FinetuneConfig, finetune,
    )
    from se3diff_tpu.sampling.bundle import (
        Bundle, initialize_weights_to_near_zero,
    )
    from se3diff_tpu.sde.so3_sde import DiGSO3SDE
    from se3diff_tpu.sde.vpsde import CosineVPSDE

    if args.tiny:
        args.batch = min(args.batch, 16)
        args.num_steps = min(args.num_steps, 8)
        args.num_epochs = min(args.num_epochs, 2)
        args.train_mutants = min(args.train_mutants, 3)
        args.val_size = min(args.val_size, 2)

    out = Path(args.output_dir)
    out.mkdir(parents=True, exist_ok=True)

    # Run-B-compatible split: seed-0 permutation, first val_size = held-out.
    df = pd.read_csv(args.csv)
    df["h_star"] = 1.0 / (1.0 + np.exp(df["f_dg_pred"].to_numpy(np.float64)))
    rng = np.random.default_rng(args.seed)
    order = rng.permutation(len(df))
    val_idx = order[: args.val_size]
    train_idx = order[args.val_size : args.val_size + args.train_mutants]
    csv_train = out / "train.csv"
    csv_val = out / "val.csv"
    df.iloc[train_idx][["id", "seq", "h_star"]].to_csv(csv_train, index=False)
    df.iloc[val_idx][["id", "seq", "h_star"]].to_csv(csv_val, index=False)
    L = len(df["seq"].iloc[0])

    sdes = denoise.SDEs(
        pos=CosineVPSDE(), node_orientations=DiGSO3SDE(sigma_max=2.33)
    )
    score_kw = (
        dict(num_layers=1, dim_model=16, dim_pair=8, num_heads=2,
             dim_hidden=16, dropout=0.0)
        if args.tiny else dict(dtype=jnp.bfloat16)
    )
    score_model = DiGConditionalScoreModel(**score_kw)
    ft_model = DiGConditionalScoreModel(
        dim_model=64, dim_pair=32, num_layers=2, num_heads=4,
        dim_hidden=128, dropout=0.1,
    )
    pos0 = jnp.zeros((1, L, 3), jnp.float32)
    rot0 = jnp.broadcast_to(jnp.eye(3), (1, L, 3, 3))
    init_args = (pos0, rot0, jnp.ones((1,), jnp.float32),
                 jnp.zeros((1, L, 384), jnp.float32),
                 jnp.zeros((1, L, L, 128), jnp.float32))
    if args.prior_params and not args.tiny and Path(args.prior_params).exists():
        from se3diff_tpu.models.convert import load_torch_checkpoint

        base_params = load_torch_checkpoint(args.prior_params)
        print(f"prior loaded from {args.prior_params}", file=sys.stderr)
    else:
        if not args.tiny:
            raise SystemExit(
                f"prior {args.prior_params} missing — re-run "
                "scripts/pretrain_sh3_prior.py first (random-init priors "
                "saturate h~0; useless for learning evidence)"
            )
        base_params = score_model.init(jax.random.key(1), *init_args)

    ft_params = initialize_weights_to_near_zero(
        ft_model.init(jax.random.key(2), *init_args)
    )
    if args.init_control:
        saved = np.load(args.init_control)
        paths, treedef = jax.tree_util.tree_flatten_with_path(ft_params)
        leaves = []
        for kp, leaf in paths:
            arr = saved[jax.tree_util.keystr(kp)]
            assert arr.shape == leaf.shape, (kp, arr.shape, leaf.shape)
            leaves.append(jnp.asarray(arr))
        ft_params = jax.tree_util.tree_unflatten(treedef, leaves)
        print(f"control continued from {args.init_control}", file=sys.stderr)

    bundle = FinetuneBundle(
        base=Bundle(model=score_model, params=base_params, sdes=sdes,
                    denoiser=None, config={}),
        finetune_model=ft_model,
        finetune_params=ft_params,
        denoiser=partial(
            denoise.euler_maruyama_finetune, num_steps=args.num_steps
        ),
        h_func=FoldingStability(),
    )
    config = FinetuneConfig(
        data_batch_size=1,
        lambda_=args.lambda_,
        batch_size=args.batch,
        num_epochs=args.num_epochs,
        save_every_n_epochs=1,
        val_every_n_epochs=1,
        lr=args.lr,
        eta_min=args.lr,  # flat schedule: run B's regime
        kl_guard=args.kl_guard,
    )
    finetune(
        csv_train, csv_val, "seq", ["h_star"], bundle,
        config=config, output_dir=out,
        cache_embeds_dir=str(REPO / ".embeds_cache_ppft"),
        embeds_backend="dummy",
        seed=args.trainer_seed,
    )
    print(f"done; history at {out/'history.json'}", file=sys.stderr)


if __name__ == "__main__":
    main()
