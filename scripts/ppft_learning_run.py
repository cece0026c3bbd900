"""On-chip PPFT learning run at the reference fine-tune shape.

Demonstrates the fine-tuning stack LEARNING (not just timed): EV+KL loss
descending and the importance-weighted E[h] moving toward h* on real TPU
hardware, at the reference shape — frozen checkpoint-sized score net
(8L/512d, bf16), 2L/d64 control net, L=56 GRB2-SH3 mutants from the real
`assets/reference_h/GRB2_SH3_high_confidence.csv`, path batch 256,
euler_maruyama-200 recorder, ~50 AdamW steps with epoch-0-style validation
(reference loop: finetune.py:517-692).

The frozen prior is a random-init score net of the production architecture:
the real bioemu-v1.0 weights are network-gated in this environment
(docs/WEIGHTS_FETCH.md), and the PPFT estimator's learning dynamics — the
quantity demonstrated here — do not depend on the prior being trained. The
conditioning embeddings use the deterministic dummy backend for the same
reason (ColabFold needs a network-installed venv).

Writes a JSON artifact (per-step train metrics + validation rounds) and
prints a summary; docs/PPFT_LEARNING.md records the committed run.

    python scripts/ppft_learning_run.py --output docs/ppft_learning_r4.json
    python scripts/ppft_learning_run.py --tiny --platform cpu  # CPU smoke
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from functools import partial
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=50, help="optimizer steps")
    p.add_argument("--batch", type=int, default=256, help="path batch size")
    p.add_argument("--val_every", type=int, default=10)
    p.add_argument("--val_size", type=int, default=4,
                   help="held-out mutants per validation round")
    p.add_argument("--num_steps", type=int, default=200,
                   help="EM recorder diffusion steps (reference default 200)")
    p.add_argument("--lr", type=float, default=5e-4)
    p.add_argument("--lambda_", type=float, default=2e-5)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--csv", default=str(
        REPO / "assets" / "reference_h" / "GRB2_SH3_high_confidence.csv"))
    p.add_argument("--output", default=None, help="JSON artifact path")
    p.add_argument("--prior_params", default=None,
                   help="npz/torch checkpoint for the frozen prior (e.g. "
                        "scripts/pretrain_sh3_prior.py's export). Without "
                        "it the prior is random-init, whose coil samples "
                        "saturate h~0 and leave the EV term gradient-free "
                        "— fine for timing, useless for learning evidence.")
    p.add_argument("--save_control", default=None,
                   help="npz path to save the final control-net params "
                        "(keystr-flattened pytree; --init_control loads it)")
    p.add_argument("--init_control", default=None,
                   help="NOTE: restores control-net params only — the "
                        "AdamW moments and LR-warmup step restart from "
                        "scratch, so a continued run is not equivalent to "
                        "one uninterrupted longer run (fine for this "
                        "script's A/B probes; the product trainer's orbax "
                        "resume in ppft/trainer.py is the exact one). "
                        "npz from a previous --save_control: continue "
                        "training that control instead of near-zero init")
    p.add_argument("--tiny", action="store_true",
                   help="tiny score net + small batch/steps (CPU smoke)")
    p.add_argument("--platform", default=None, choices=["cpu", "axon", "tpu"])
    args = p.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp
    import numpy as np
    import optax
    import pandas as pd

    from se3diff_tpu.diffusion import denoise
    from se3diff_tpu.models.dig import DiGConditionalScoreModel, count_params
    from se3diff_tpu.ppft.h_functions import FoldingStability
    from se3diff_tpu.ppft.losses import compute_ev_loss, compute_kl_loss
    from se3diff_tpu.ppft.trainer import (
        FinetuneBundle,
        make_finetune_step_fns,
        make_path_sampler,
    )
    from se3diff_tpu.sampling.bundle import Bundle
    from se3diff_tpu.sampling.embeds import get_embeds, load_embeds
    from se3diff_tpu.sde.so3_sde import DiGSO3SDE
    from se3diff_tpu.sde.vpsde import CosineVPSDE

    if args.tiny:
        args.batch = min(args.batch, 16)
        args.steps = min(args.steps, 4)
        args.num_steps = min(args.num_steps, 8)
        args.val_every = 2
        args.val_size = 2

    # Real mutant data: h* = sigmoid(-dG_fold) (observables.py:457-480 via
    # the finetune CLI's --h_stars_from_dg).
    df = pd.read_csv(args.csv)
    seqs = df["seq"].tolist()
    h_stars_all = 1.0 / (1.0 + np.exp(df["f_dg_pred"].to_numpy(np.float64)))
    L = len(seqs[0])
    assert all(len(s) == L for s in seqs), "mutants must share one length"
    rng = np.random.default_rng(args.seed)
    order = rng.permutation(len(seqs))
    val_idx = order[: args.val_size]
    train_idx = order[args.val_size :]

    # Models at the reference fine-tune shape (finetune.yaml + the
    # bioemu-v1.0 config's finetune_model block: 2 layers, d64).
    sdes = denoise.SDEs(
        pos=CosineVPSDE(), node_orientations=DiGSO3SDE(sigma_max=2.33)
    )
    score_kw = (
        dict(num_layers=1, dim_model=16, dim_pair=8, num_heads=2,
             dim_hidden=16, dropout=0.0)
        if args.tiny
        else dict(dtype=jnp.bfloat16)
    )
    score_model = DiGConditionalScoreModel(**score_kw)
    ft_model = DiGConditionalScoreModel(
        dim_model=64, dim_pair=32, num_layers=2, num_heads=4,
        dim_hidden=128, dropout=0.1,
    )

    pos0 = jnp.zeros((1, L, 3), jnp.float32)
    rot0 = jnp.broadcast_to(jnp.eye(3), (1, L, 3, 3))
    t0 = jnp.ones((1,), jnp.float32)
    s0 = jnp.zeros((1, L, 384), jnp.float32)
    p0 = jnp.zeros((1, L, L, 128), jnp.float32)
    if args.prior_params:
        from se3diff_tpu.models.convert import load_torch_checkpoint

        base_params = load_torch_checkpoint(args.prior_params)
        print(f"prior loaded from {args.prior_params}", file=sys.stderr)
    else:
        base_params = score_model.init(
            jax.random.key(1), pos0, rot0, t0, s0, p0
        )
    from se3diff_tpu.sampling.bundle import initialize_weights_to_near_zero

    # Near-zero control (reference finetune.py:163 via load_finetune_bundle):
    # epoch-0 controlled paths start at the prior's distribution.
    ft_params = initialize_weights_to_near_zero(
        ft_model.init(jax.random.key(2), pos0, rot0, t0, s0, p0)
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

    denoiser = partial(
        denoise.euler_maruyama_finetune, num_steps=args.num_steps
    )
    bundle = FinetuneBundle(
        base=Bundle(model=score_model, params=base_params, sdes=sdes,
                    denoiser=None, config={}),
        finetune_model=ft_model,
        finetune_params=ft_params,
        denoiser=denoiser,
        h_func=FoldingStability(),  # real 2vwf SH3 reference structure
    )
    sampler = make_path_sampler(bundle, args.batch, L)
    grad_fn, _ = make_finetune_step_fns(bundle, lambda_=args.lambda_)
    h_apply = jax.jit(lambda pos: bundle.h_func(pos, ""))

    optimizer = optax.adamw(args.lr)
    opt_state = optimizer.init(ft_params)

    @jax.jit
    def apply_grads(params, opt_state, grads):
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state

    @jax.jit
    def path_metrics(path, hs, h_star):
        """Reference validation quantities + the importance-weighted E[h]
        from the recorded controls (no model re-evaluation needed)."""
        dts = jnp.diff(path.timesteps)
        int_uudt = sum(
            jnp.sum(jnp.sum(u**2, axis=(-1, -2)) * (-dts)[:, None], axis=0)
            for u in path.us.values()
        )
        ws_lin = sum(
            jnp.sum(u * -dw, axis=(0, -1, -2))
            for u, dw in zip(path.us.values(), path.dWs.values())
        )
        ones = jnp.ones_like(int_uudt)
        ev = compute_ev_loss(ws=ones, hs=hs, h_stars=h_star,
                             from_int_dws=False, use_stab=False)
        kl = compute_kl_loss(ws=ones, int_u_u_dt=int_uudt,
                             int_u_u_dt_sg=int_uudt,
                             from_int_dws=False, use_rloo=False)
        iw = jax.nn.softmax(ws_lin)
        return ev, kl, jnp.mean(hs), jnp.sum(iw * hs[:, 0])

    cache_dir = str(REPO / ".embeds_cache_ppft")

    def embeds_for(seq: str):
        sf, pf = get_embeds(seq, cache_dir, backend="dummy")
        s, pr = load_embeds(sf, pf)
        return jnp.asarray(s), jnp.asarray(pr)

    def run_one(params, idx: int, key, for_grad: bool):
        seq, h_star = seqs[idx], float(h_stars_all[idx])
        single, pair = embeds_for(seq)
        path = sampler(key, base_params, params, single, pair)
        hs = h_apply(path.pos_path[-1])
        hstar_b = jnp.full((args.batch, 1), h_star, jnp.float32)
        ev, kl, mean_h, iw_h = path_metrics(path, hs, hstar_b)
        rec = {
            "mutant": str(df["id"].iloc[idx]),
            "h_star": round(h_star, 4),
            "ev": float(ev), "kl": float(kl),
            "val_loss": float(ev) + args.lambda_ * float(kl),
            "mean_h": float(mean_h), "iw_h": float(iw_h),
            "iw_gap": abs(float(iw_h) - h_star),
        }
        if for_grad:
            grads, _ = grad_fn(params, path, single, pair, hs, hstar_b)
            return grads, rec
        return None, rec

    key = jax.random.key(args.seed)

    def validate(params, step, key):
        rows = []
        for i in val_idx:
            key, k = jax.random.split(key)
            _, rec = run_one(params, int(i), k, for_grad=False)
            rows.append(rec)
        out = {
            "step": step,
            "val_loss": float(np.mean([r["val_loss"] for r in rows])),
            "val_ev": float(np.mean([r["ev"] for r in rows])),
            "val_kl": float(np.mean([r["kl"] for r in rows])),
            "val_iw_gap": float(np.mean([r["iw_gap"] for r in rows])),
            "mutants": rows,
        }
        print(f"[val @ step {step}] loss={out['val_loss']:.5f} "
              f"ev={out['val_ev']:.5f} kl={out['val_kl']:.3f} "
              f"iw_gap={out['val_iw_gap']:.4f}", file=sys.stderr)
        return out, key

    t_start = time.time()
    train_log, val_log = [], []
    val0, key = validate(ft_params, 0, key)  # epoch-0-style validation
    val_log.append(val0)
    params = ft_params
    for step in range(1, args.steps + 1):
        idx = int(train_idx[(step - 1) % len(train_idx)])
        key, k = jax.random.split(key)
        t0s = time.time()
        grads, rec = run_one(params, idx, k, for_grad=True)
        params, opt_state = apply_grads(params, opt_state, grads)
        rec.update(step=step, wall_s=round(time.time() - t0s, 2))
        train_log.append(rec)
        print(f"[step {step}/{args.steps}] {rec['mutant']} "
              f"loss={rec['val_loss']:.5f} ev={rec['ev']:.5f} "
              f"kl={rec['kl']:.3f} iw_h={rec['iw_h']:.4f} "
              f"h*={rec['h_star']:.3f} ({rec['wall_s']}s)", file=sys.stderr)
        if step % args.val_every == 0 and step < args.steps:
            v, key = validate(params, step, key)
            val_log.append(v)
    vfinal, key = validate(params, args.steps, key)
    val_log.append(vfinal)

    def win(log, k, head):
        xs = [r[k] for r in log]
        n = max(1, min(head, len(xs) // 2))
        return float(np.mean(xs[:n])), float(np.mean(xs[-n:]))

    ev_first, ev_last = win(train_log, "ev", 10)
    loss_first, loss_last = win(train_log, "val_loss", 10)
    gap_first, gap_last = win(train_log, "iw_gap", 10)
    summary = {
        "shape": {
            "L": L, "path_batch": args.batch, "recorder":
            f"euler_maruyama_{args.num_steps}",
            "score_params_M": round(count_params(base_params) / 1e6, 2),
            "control_params_M": round(count_params(params) / 1e6, 3),
            "train_mutants": int(len(train_idx)), "val_mutants":
            int(len(val_idx)), "optimizer_steps": args.steps,
            "device": jax.devices()[0].device_kind,
        },
        "train_loss_first10_vs_last10": [round(loss_first, 5), round(loss_last, 5)],
        "train_ev_first10_vs_last10": [round(ev_first, 5), round(ev_last, 5)],
        "iw_gap_first10_vs_last10": [round(gap_first, 5), round(gap_last, 5)],
        "val_loss_trajectory": [round(v["val_loss"], 5) for v in val_log],
        "val_ev_trajectory": [round(v["val_ev"], 5) for v in val_log],
        "val_iw_gap_trajectory": [round(v["val_iw_gap"], 5) for v in val_log],
        "wall_minutes": round((time.time() - t_start) / 60.0, 1),
    }
    artifact = {"summary": summary, "val": val_log, "train": train_log,
                "args": vars(args)}
    print(json.dumps(summary, indent=2))
    if args.output:
        Path(args.output).write_text(json.dumps(artifact, indent=1))
        print(f"wrote {args.output}", file=sys.stderr)
    if args.save_control:
        flat = {
            jax.tree_util.keystr(kp): np.asarray(leaf)
            for kp, leaf in jax.tree_util.tree_flatten_with_path(params)[0]
        }
        np.savez(args.save_control, **flat)
        print(f"saved control params to {args.save_control}", file=sys.stderr)


if __name__ == "__main__":
    main()
