"""CLI: train an SE(3) score network on structure ensembles.

Beyond-reference entry point (the reference ships no trainer for its
production model — bioemu-v1.0 arrives pretrained, sample.py:54-105): DSM
training over PDB/XTC ensembles via `training/data.py`, the warmup+cosine
trainer loop with orbax checkpoints and bit-exact resume
(`training/loop.py`), optionally DP+TP-sharded over a device mesh.

    python -m se3diff_tpu.train \\
        --trajectory sys1.xtc --topology sys1.pdb \\
        --trajectory sys2.xtc --topology sys2.pdb \\
        --steps 10000 --batch_size 8 --ckpt_dir ckpts/ [--mesh data=4,model=2]

Re-running with the same --ckpt_dir resumes from the latest checkpoint and
reproduces the uninterrupted run exactly (batches are deterministic
functions of the step index). The final params are exported as
``{ckpt_dir}/params.npz`` in the torch state-dict key layout
(`models/convert.py`), loadable by the sample CLI via --ckpt_path.
"""

from __future__ import annotations

import argparse
import logging

logger = logging.getLogger(__name__)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="python -m se3diff_tpu.train", description=__doc__,
        formatter_class=argparse.RawDescriptionHelpFormatter,
    )
    p.add_argument("--trajectory", action="append", required=True,
                   help=".xtc (with --topology) or multi-model .pdb; repeat "
                        "for multi-system training (length-bucketed, "
                        "masked batches)")
    p.add_argument("--topology", action="append", default=None,
                   help="topology .pdb per .xtc --trajectory (same order)")
    p.add_argument("--steps", type=int, default=1000)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--bucket", type=int, default=32,
                   help="pad lengths to multiples of this (compiled shapes "
                        "= occupied buckets)")
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--warmup_steps", type=int, default=0)
    p.add_argument("--weight_decay", type=float, default=0.0)
    p.add_argument("--min_t", type=float, default=0.001,
                   help="needs l_max*sigma(min_t) >> 3; the default matches "
                        "the production tables (l_max=2000)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--ckpt_dir", default=None,
                   help="orbax checkpoint dir; reuse to resume exactly")
    p.add_argument("--ckpt_every", type=int, default=500)
    p.add_argument("--log_every", type=int, default=50)
    p.add_argument("--model_config_path", default=None,
                   help="reference-format config.yaml defining the score "
                        "net (default: the bioemu-v1.0 architecture)")
    p.add_argument("--init_ckpt_path", default=None,
                   help="warm-start from a torch/npz checkpoint instead of "
                        "random init (continued training)")
    p.add_argument("--mesh", default=None,
                   help="e.g. data=4,model=2 — DP+TP shard the train step "
                        "over the first data*model devices")
    p.add_argument("--kernel", default="auto",
                   choices=["auto", "xla", "fused"],
                   help="attention kernel for the train step: 'auto' "
                        "dispatches per the measured train-throughput "
                        "table (ops/pallas_ipa.py::resolve_train_kernel — "
                        "XLA below the ~L=146 crossover, fused Pallas + "
                        "chunked backward above), 'xla'/'fused' force one")
    p.add_argument("--dtype", default="float32",
                   choices=["float32", "bfloat16"],
                   help="model compute dtype (params stay fp32)")
    p.add_argument("--so3_cache_dir", default=None)
    p.add_argument("--embeds_backend", default="dummy",
                   choices=["colabfold", "dummy"],
                   help="conditioning embeddings for the training sequences")
    p.add_argument("--cache_embeds_dir", default=None)
    return p


def _default_config_yaml(model, sdes) -> str:
    """Reference-format config.yaml for the trained model (the key layout
    load_bundle reads: score_model + sdes, checkpoints/bioemu-v1.0).

    Emitted via yaml.safe_dump so every float round-trips: a bare f-string
    ``{1e-07}`` prints ``1e-07``, which YAML 1.1 parses back as a STRING
    (its float regex requires a dot before the exponent) and crashes the
    table build downstream."""
    import yaml

    so3 = sdes.node_orientations
    cfg = {
        "score_model": {
            "_target_": "bioemu.shortcuts.DiGConditionalScoreModel",
            "dim_hidden": model.dim_hidden,
            "dim_model": model.dim_model,
            "dim_pair": model.dim_pair,
            "dropout": model.dropout,
            "num_heads": model.num_heads,
            "num_layers": model.num_layers,
        },
        "sdes": {
            "node_orientations": {
                "_target_": "bioemu.shortcuts.DiGSO3SDE",
                "eps_t": float(so3.eps_t),
                "l_max": int(so3.l_max),
                "num_omega": len(so3.omega_grid),
                "num_sigma": len(so3.sigma_grid),
                "sigma_max": float(so3.sigma_max),
                "sigma_min": float(so3.sigma_min),
                "tol": float(so3.tol),
            },
            "pos": {
                "_target_": "bioemu.shortcuts.CosineVPSDE",
                "s": float(sdes.pos.s),
            },
        },
    }
    return yaml.safe_dump(cfg, sort_keys=False)


def main(argv: list[str] | None = None) -> None:
    logging.basicConfig(level=logging.INFO)
    args = build_parser().parse_args(argv)

    from se3diff_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import numpy as np

    from se3diff_tpu.diffusion.denoise import SDEs
    from se3diff_tpu.models.dig import DiGConditionalScoreModel, count_params
    from se3diff_tpu.sde.vpsde import CosineVPSDE
    from se3diff_tpu.training.data import MultiEnsembleDataset
    from se3diff_tpu.training.loop import TrainConfig, train_dsm

    tops = args.topology or [None] * len(args.trajectory)
    if len(tops) != len(args.trajectory):
        raise SystemExit("--topology count must match --trajectory count")
    mds = MultiEnsembleDataset.from_trajectories(
        list(zip(args.trajectory, tops)),
        bucket=args.bucket,
        embeds_backend=args.embeds_backend,
        cache_embeds_dir=args.cache_embeds_dir,
    )
    logger.info(
        "%d ensembles, %d frames, buckets %s",
        len(mds.datasets), mds.num_frames, mds.occupied_buckets(),
    )
    # Single-device runs keep per-system conditioning device-resident and
    # unbatched (dsm_loss broadcasts inside jit) — the steady-state H2D is
    # then the frame batch, not a materialized [B, L, L, P] stack. The mesh
    # path shards batches along the batch axis, so it keeps batched host
    # batches.
    batch_fn = mds.batch_fn(
        args.batch_size, seed=args.seed, device_cond=not args.mesh
    )

    import jax.numpy as jnp

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    from se3diff_tpu.ops.pallas_ipa import resolve_train_kernel

    kernel_kw = resolve_train_kernel(args.kernel)
    if args.model_config_path:
        import yaml

        from se3diff_tpu.sampling.bundle import instantiate

        with open(args.model_config_path) as f:
            cfg = yaml.safe_load(f)
        model = instantiate(cfg["score_model"], dtype=dtype, **kernel_kw)
        sdes = SDEs(
            pos=instantiate(cfg["sdes"]["pos"]),
            node_orientations=instantiate(
                cfg["sdes"]["node_orientations"],
                **({"cache_dir": args.so3_cache_dir}
                   if args.so3_cache_dir else {}),
            ),
        )
    else:
        from se3diff_tpu.sde.so3_sde import DiGSO3SDE

        model = DiGConditionalScoreModel(dtype=dtype, **kernel_kw)
        sdes = SDEs(
            pos=CosineVPSDE(),
            node_orientations=DiGSO3SDE(
                sigma_max=2.33,
                **({"cache_dir": args.so3_cache_dir}
                   if args.so3_cache_dir else {}),
            ),
        )

    b0 = batch_fn(0)
    if args.init_ckpt_path:
        from se3diff_tpu.models.convert import load_torch_checkpoint

        params = load_torch_checkpoint(args.init_ckpt_path)
        logger.info("warm start from %s", args.init_ckpt_path)
    else:
        batched = b0["single"].ndim == 3  # device_cond serves unbatched
        cond = (
            (b0["single"][:1], b0["pair"][:1], b0["mask"][:1]) if batched
            else (b0["single"][None], b0["pair"][None], b0["mask"][None])
        )
        params = model.init(
            jax.random.key(args.seed), b0["pos"][:1], b0["rot"][:1],
            np.ones((1,), np.float32), *cond,
        )
    logger.info("score net: %.1fM params", count_params(params) / 1e6)

    mesh = None
    if args.mesh:
        from se3diff_tpu.parallel.mesh import make_mesh

        spec = dict(kv.split("=") for kv in args.mesh.split(","))
        mesh = make_mesh(
            int(spec.get("data", 1)) * int(spec.get("model", 1)),
            model_parallel=int(spec.get("model", 1)),
        )
        logger.info("mesh: %s", dict(mesh.shape))

    cfg = TrainConfig(
        num_steps=args.steps, lr=args.lr, warmup_steps=args.warmup_steps,
        weight_decay=args.weight_decay, min_t=args.min_t,
        ckpt_every=args.ckpt_every if args.ckpt_dir else 0,
        ckpt_dir=args.ckpt_dir, log_every=args.log_every,
    )
    params, history = train_dsm(
        sdes, model.apply, params, batch_fn, cfg, mesh=mesh,
    )
    logger.info("loss: %.4f -> %.4f", history[0], history[-1])

    if args.ckpt_dir:
        import shutil
        from pathlib import Path

        from se3diff_tpu.models.convert import flax_to_torch_state_dict

        out = Path(args.ckpt_dir) / "params.npz"
        # The orbax manager only mkdirs when ckpt_every > 0; the final
        # export must not depend on that.
        out.parent.mkdir(parents=True, exist_ok=True)
        np.savez(out, **flax_to_torch_state_dict(jax.device_get(params)))
        # A sibling config.yaml makes the export directly loadable by the
        # sample CLI (load_bundle defaults to it) with no extra flags.
        cfg_out = out.parent / "config.yaml"
        if args.model_config_path:
            if Path(args.model_config_path).resolve() != cfg_out.resolve():
                shutil.copy(args.model_config_path, cfg_out)
        else:
            cfg_out.write_text(_default_config_yaml(model, sdes))
        logger.info(
            "exported %s + config.yaml (torch state-dict layout; loadable "
            "via --ckpt_path)", out,
        )


if __name__ == "__main__":
    main()
