"""Pretrain an SH3 prior on-chip for the PPFT learning run.

The PPFT learning demonstration (scripts/ppft_learning_run.py) needs a
prior whose samples land inside the FoldingStability sigmoid's dynamic
range: with a random-init prior the paths are coil, dRMSD >> d_0 = 0.4 nm,
h saturates at ~0 and the EV term has no gradient (measured: validation EV
bit-identical across rounds). The reference fine-tunes from the trained
bioemu-v1.0 prior, which is network-gated here (docs/WEIGHTS_FETCH.md) —
so this script trains a stand-in prior with the repo's own DSM trainer
(`training/loop.py::train_dsm`, the same engine as `python -m
se3diff_tpu.train`):

* Data: a synthetic frame-space ensemble around the real 2vwf SH3 backbone
  (`assets/structures/2vwf_trimmed_SH3.pdb`): per conformer, CA translations
  get iid Gaussian noise with sigma drawn uniform in [0.15, 0.42] nm and
  rotations a proportional rotvec kick. Measured h(sigma) on the real
  reference: sigma 0.15 -> h~0.99, 0.30 -> ~0.40, 0.42 -> ~0.01 — the
  ensemble's h spans (0, 1), bracketing every CSV h* target (0.10..0.82).
* Conditioning: the dummy-backend embeddings of exactly the mutant
  sequences the learning run will visit (same CSV, seed and split logic),
  so the PPFT run's conditioning is in-distribution for the prior.
* Model: the production DiG architecture (31M params, bf16 compute) —
  the same class/shape the learning run freezes as its base.

Writes ``{ckpt_dir}/params.npz`` (torch key layout, `models/convert.py`)
plus a loss-history JSON; the learning run loads it via ``--prior_params``.

    python scripts/pretrain_sh3_prior.py --ckpt_dir /tmp/sh3_prior \
        --output docs/sh3_prior_train_r4.json
    python scripts/pretrain_sh3_prior.py --tiny --platform cpu   # smoke
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def mutant_sequences(csv_path: str, seed: int, val_size: int,
                     train_steps: int) -> list[str]:
    """The sequences scripts/ppft_learning_run.py visits: its val split plus
    the first ``train_steps`` train mutants, under the same permutation."""
    import numpy as np
    import pandas as pd

    df = pd.read_csv(csv_path)
    seqs = df["seq"].tolist()
    rng = np.random.default_rng(seed)
    order = rng.permutation(len(seqs))
    val_idx = order[:val_size]
    train_idx = order[val_size:]
    visit = list(val_idx) + [
        train_idx[i % len(train_idx)] for i in range(train_steps)
    ]
    seen, out = set(), []
    for i in visit:
        if seqs[i] not in seen:
            seen.add(seqs[i])
            out.append(seqs[i])
    return out


def make_ensemble(ref_pos, ref_rot, frames: int, rng, sigma_lo: float,
                  sigma_hi: float):
    """Perturbed rigid frames around the reference: iid CA noise with a
    per-conformer sigma (uniform in [lo, hi] nm) plus a proportional
    random rotvec on each residue frame."""
    import numpy as np

    from se3diff_tpu.ops import so3 as so3_ops

    L = ref_pos.shape[0]
    sig = rng.uniform(sigma_lo, sigma_hi, size=(frames, 1, 1))
    pos = ref_pos[None] + rng.standard_normal((frames, L, 3)) * sig
    pos = (pos - pos.mean(axis=1, keepdims=True)).astype(np.float32)
    # Rotation kick: angle scale ~ 1.5 rad at sigma_hi, proportional below.
    ang = rng.standard_normal((frames, L, 3)) * (sig * 3.5)
    import jax.numpy as jnp

    dR = np.asarray(so3_ops.rotvec_to_rotmat(jnp.asarray(
        ang, jnp.float32)))
    rot = np.einsum("flij,fljk->flik", dR, np.broadcast_to(
        ref_rot[None], dR.shape)).astype(np.float32)
    return pos, rot


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=3000)
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--frames", type=int, default=256,
                   help="ensemble conformers per mutant sequence")
    p.add_argument("--sigma_lo", type=float, default=0.15)
    p.add_argument("--sigma_hi", type=float, default=0.42)
    p.add_argument("--lr", type=float, default=2e-4)
    p.add_argument("--warmup_steps", type=int, default=200)
    p.add_argument("--seed", type=int, default=0,
                   help="must match the learning run's --seed (split logic)")
    p.add_argument("--val_size", type=int, default=4)
    p.add_argument("--covered_steps", type=int, default=60,
                   help="learning-run optimizer steps whose mutants to cover")
    p.add_argument("--csv", default=str(
        REPO / "assets" / "reference_h" / "GRB2_SH3_high_confidence.csv"))
    p.add_argument("--ckpt_dir", default="/tmp/sh3_prior")
    p.add_argument("--output", default=None, help="JSON artifact path")
    p.add_argument("--sample_check", type=int, default=64,
                   help="post-train: sample this many WT structures and "
                        "report their h distribution (0 = skip)")
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--platform", default=None, choices=["cpu", "axon", "tpu"])
    args = p.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    from se3diff_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    import jax.numpy as jnp
    import numpy as np

    from se3diff_tpu.diffusion import denoise
    from se3diff_tpu.models.convert import flax_to_torch_state_dict
    from se3diff_tpu.models.dig import DiGConditionalScoreModel, count_params
    from se3diff_tpu.ppft.h_functions import (
        DEFAULT_SH3_REF, compute_folded_proportion,
    )
    from se3diff_tpu.sampling.embeds import get_embeds, load_embeds
    from se3diff_tpu.sde.so3_sde import DiGSO3SDE
    from se3diff_tpu.sde.vpsde import CosineVPSDE
    from se3diff_tpu.struct.atoms import frames_from_atom37
    from se3diff_tpu.struct.pdb import read_pdb
    from se3diff_tpu.training.data import EnsembleDataset, MultiEnsembleDataset
    from se3diff_tpu.training.loop import TrainConfig, train_dsm

    if args.tiny:
        args.steps = min(args.steps, 6)
        args.batch = 4
        args.frames = 16
        args.covered_steps = 2
        args.val_size = 1
        args.sample_check = min(args.sample_check, 4)
        args.warmup_steps = 2

    # Reference frames from the real SH3 backbone.
    struct = read_pdb(DEFAULT_SH3_REF)
    ref_pos, ref_rot = frames_from_atom37(struct.atom37[0])
    ref_pos = (ref_pos - ref_pos.mean(0, keepdims=True)).astype(np.float32)
    ref_ca = jnp.asarray(ref_pos)  # CA positions == frame translations (nm)
    L = ref_pos.shape[0]

    seqs = mutant_sequences(args.csv, args.seed, args.val_size,
                            args.covered_steps)
    assert all(len(s) == L for s in seqs), "mutant length != reference"
    print(f"{len(seqs)} mutant sequences, L={L}", file=sys.stderr)

    cache_dir = str(REPO / ".embeds_cache_ppft")
    rng = np.random.default_rng(args.seed + 1)
    datasets = []
    h_all = []
    for seq in seqs:
        pos, rot = make_ensemble(ref_pos, ref_rot, args.frames, rng,
                                 args.sigma_lo, args.sigma_hi)
        sf, pf = get_embeds(seq, cache_dir, backend="dummy")
        single, pair = load_embeds(sf, pf)
        datasets.append(EnsembleDataset(
            pos=pos, rot=rot, single=np.asarray(single, np.float32),
            pair=np.asarray(pair, np.float32), sequence=seq,
        ))
        h_all.append(np.asarray(
            compute_folded_proportion(jnp.asarray(pos), ref_ca)))
    h_all = np.concatenate(h_all)
    data_h = {
        "mean": float(h_all.mean()),
        "quantiles": [round(float(q), 4) for q in np.quantile(
            h_all, [0.05, 0.25, 0.5, 0.75, 0.95])],
    }
    print(f"ensemble h: mean={data_h['mean']:.3f} "
          f"q={data_h['quantiles']}", file=sys.stderr)

    mds = MultiEnsembleDataset(datasets=tuple(datasets), bucket=L)
    # device_cond: stage each mutant's conditioning on device once; without
    # it every step re-transfers a materialized [B, L, L, 128] pair stack
    # (51 MB at B=32/L=56 — measured 3.4 s/step tunnel-bound vs the chip's
    # sub-100 ms step).
    batch_fn = mds.batch_fn(args.batch, seed=args.seed, device_cond=True)

    model_kw = (dict(num_layers=1, dim_model=16, dim_pair=8, num_heads=2,
                     dim_hidden=16, dropout=0.0)
                if args.tiny else dict(dtype=jnp.bfloat16))
    model = DiGConditionalScoreModel(**model_kw)
    sdes = denoise.SDEs(
        pos=CosineVPSDE(), node_orientations=DiGSO3SDE(sigma_max=2.33)
    )
    b0 = batch_fn(0)
    params = model.init(
        jax.random.key(args.seed), b0["pos"][:1], b0["rot"][:1],
        np.ones((1,), np.float32), b0["single"][None], b0["pair"][None],
        b0["mask"][None],
    )
    print(f"score net: {count_params(params) / 1e6:.1f}M params",
          file=sys.stderr)

    cfg = TrainConfig(
        num_steps=args.steps, lr=args.lr, warmup_steps=args.warmup_steps,
        min_t=0.05 if args.tiny else 0.001,  # tiny tables: igso3 validity
        ckpt_every=500 if args.ckpt_dir else 0, ckpt_dir=args.ckpt_dir,
        log_every=50, seed=args.seed,
    )
    t0 = time.time()
    params, history = train_dsm(sdes, model.apply, params, batch_fn, cfg)
    wall_min = (time.time() - t0) / 60.0

    out = Path(args.ckpt_dir)
    out.mkdir(parents=True, exist_ok=True)
    np.savez(out / "params.npz",
             **flax_to_torch_state_dict(jax.device_get(params)))

    # Post-train check: does the prior sample inside h's dynamic range?
    sample_h = None
    if args.sample_check:
        wt_sf, wt_pf = get_embeds(seqs[0], cache_dir, backend="dummy")
        single, pair = load_embeds(wt_sf, wt_pf)
        B = args.sample_check

        @jax.jit
        def draw(key):
            s = jnp.broadcast_to(jnp.asarray(single), (B, L, single.shape[-1]))
            pr = jnp.broadcast_to(jnp.asarray(pair),
                                  (B, L, L, pair.shape[-1]))
            cache = model.apply(params, s, pr, method="embed_conditioning")

            def model_fn(pos, rot, t):
                return model.apply(params, pos, rot, t, cache,
                                   method="score_from_cache")

            return denoise.dpm_solver(key, sdes, model_fn, batch=B,
                                      length=L, num_steps=30)

        pos_s, _ = draw(jax.random.key(7))
        hs = np.asarray(compute_folded_proportion(pos_s, ref_ca))
        sample_h = {
            "mean": float(hs.mean()),
            "quantiles": [round(float(q), 4) for q in np.quantile(
                hs, [0.05, 0.25, 0.5, 0.75, 0.95])],
        }
        print(f"sampled h (WT, {B} structures): mean={sample_h['mean']:.3f} "
              f"q={sample_h['quantiles']}", file=sys.stderr)

    summary = {
        "loss_first50_mean": float(np.mean(history[:50])),
        "loss_last50_mean": float(np.mean(history[-50:])),
        "steps": args.steps,
        "batch": args.batch,
        "systems": len(seqs),
        "frames_per_system": args.frames,
        "params_M": round(count_params(params) / 1e6, 2),
        "device": jax.devices()[0].device_kind,
        "wall_minutes": round(wall_min, 1),
        "ensemble_h": data_h,
        "sampled_h": sample_h,
        "params_npz": str(out / "params.npz"),
    }
    print(json.dumps(summary, indent=2))
    if args.output:
        artifact = {"summary": summary, "loss_history": [
            round(float(x), 5) for x in history], "args": vars(args)}
        Path(args.output).write_text(json.dumps(artifact, indent=1))
        print(f"wrote {args.output}", file=sys.stderr)


if __name__ == "__main__":
    main()
