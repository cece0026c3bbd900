"""CLI: property-guided PPFT fine-tuning.

Counterpart of `python -m bioemu.finetune` (`bioemu/src/bioemu/finetune.py:695-781`):

    python -m se3diff_tpu.finetune --csv_path train.csv --csv_path_val val.csv \\
        --sequence_col seq --h_stars_cols f_dg_pred_p \\
        --ckpt_path /path/checkpoint.ckpt --output_dir finetune_out/

The CSVs follow the ``reference_h/*_high_confidence.csv`` format; pass the
already-sigmoid h* columns, or ``--h_stars_from_dg`` to apply
``sigmoid(-dg)`` to free-energy columns (observables.py:457-480).
"""

from __future__ import annotations

import argparse
import logging


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="python -m se3diff_tpu.finetune", description=__doc__
    )
    p.add_argument("--csv_path", required=True)
    p.add_argument("--csv_path_val", required=True)
    p.add_argument("--sequence_col", default="seq")
    p.add_argument("--h_stars_cols", nargs="+", required=True)
    p.add_argument("--h_stars_from_dg", action="store_true",
                   help="columns are free energies; use sigmoid(-dg) targets")
    p.add_argument("--ckpt_path", default=None,
                   help="score-model torch checkpoint (required unless "
                        "--model_name is given)")
    p.add_argument("--model_name", default=None,
                   help="pretrained model to fetch from the HuggingFace hub "
                        "(reference finetune.py:696-736); requires network "
                        "egress. Ignored when --ckpt_path is given.")
    p.add_argument("--model_config_path", default=None)
    p.add_argument("--finetune_ckpt_path", default=None)
    p.add_argument("--finetune_config_path", default=None,
                   help="YAML of trainer hyperparameters "
                        "(config/finetune/finetune.yaml format); explicit "
                        "flags below override its values")
    p.add_argument("--denoiser_config_path", default=None,
                   help="finetune-denoiser YAML "
                        "(config/denoiser/*_finetune.yaml format); overrides "
                        "--denoiser_type")
    p.add_argument("--h_func_config_path", default=None,
                   help="h-function YAML (config/h_func/*.yaml format); "
                        "overrides --h_func")
    p.add_argument("--denoiser_type", default="heun_finetune",
                   choices=["heun_finetune", "euler_maruyama_finetune",
                            "sde_dpm_solver_finetune"])
    p.add_argument("--h_func", default="folding_stability",
                   choices=["folding_stability", "folding_binding"])
    p.add_argument("--h_func_ref_path", default=None,
                   help="reference PDB for the h function")
    p.add_argument("--output_dir", default="finetune_out")
    p.add_argument("--cache_embeds_dir", default=None)
    p.add_argument("--embeds_backend", default="colabfold",
                   choices=["colabfold", "dummy"])
    p.add_argument("--msa_file", default=None,
                   help="wild-type A3M MSA reused for every mutant in the "
                        "CSV (query row swapped per sequence; "
                        "finetune.py:299-322)")
    p.add_argument("--msa_host_url", default=None)
    p.add_argument("--so3_cache_dir", default=None)
    p.add_argument("--batch_size", type=int, default=None)
    p.add_argument("--num_steps", type=int, default=None,
                   help="override the denoiser's diffusion step count")
    p.add_argument("--num_epochs", type=int, default=None)
    p.add_argument("--lr", type=float, default=None)
    p.add_argument("--lambda_", type=float, default=None)
    p.add_argument("--debug_dump_dir", default=None,
                   help="refresh this dir with each training path's "
                        "endpoint batch (npz + topology.pdb + samples.xtc) "
                        "— the reference's always-on ddr_debug dump, gated "
                        "(finetune.py:419-448)")
    p.add_argument("--seed", type=int, default=0)
    return p


def main(argv: list[str] | None = None) -> None:
    logging.basicConfig(level=logging.INFO)
    args = build_parser().parse_args(argv)

    from se3diff_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()

    import tempfile

    from se3diff_tpu.ppft.trainer import (
        FinetuneConfig,
        finetune,
        load_finetune_bundle,
    )

    if args.ckpt_path is None:
        if args.model_name is None:
            raise SystemExit("pass --ckpt_path or --model_name")
        from se3diff_tpu.sampling.bundle import maybe_download_checkpoint

        # An explicitly passed --model_config_path wins over the hub config
        # (the reference's maybe_download_checkpoint honors both).
        ckpt, hub_cfg = maybe_download_checkpoint(model_name=args.model_name)
        args.ckpt_path = ckpt
        if args.model_config_path is None:
            args.model_config_path = hub_cfg

    h_func = args.h_func
    h_func_kwargs = {}
    if args.h_func_config_path:
        # config/h_func/*.yaml: _target_ class + constructor kwargs.
        import dataclasses

        import yaml

        from se3diff_tpu.ppft.h_functions import H_FUNCTIONS

        with open(args.h_func_config_path) as f:
            h_cfg = yaml.safe_load(f) or {}
        by_class = {cls.__name__: name for name, cls in H_FUNCTIONS.items()}
        if "_target_" not in h_cfg:
            raise SystemExit(
                f"--h_func_config_path {args.h_func_config_path}: missing "
                f"_target_ (expected one of {sorted(by_class)})"
            )
        target = h_cfg.pop("_target_").rsplit(".", 1)[-1]
        if target not in by_class:
            raise SystemExit(
                f"--h_func_config_path: unknown _target_ {target!r}; "
                f"known h functions: {sorted(by_class)}"
            )
        h_func = by_class[target]
        # The reference yamls carry cache_embeds_dir, which is an embeds-layer
        # concern (get_embeds caching), not a constructor kwarg.
        h_cfg.pop("cache_embeds_dir", None)
        fields = {f.name for f in dataclasses.fields(H_FUNCTIONS[h_func])}
        unknown = set(h_cfg) - fields
        if unknown:
            raise SystemExit(
                f"--h_func_config_path: unknown kwargs {sorted(unknown)} for "
                f"{target} (accepts {sorted(fields)})"
            )
        h_func_kwargs.update(h_cfg)
    if args.h_func_ref_path:
        h_func_kwargs["ref_path"] = args.h_func_ref_path

    bundle = load_finetune_bundle(
        ckpt_path=args.ckpt_path,
        model_config_path=args.model_config_path,
        finetune_ckpt_path=args.finetune_ckpt_path,
        denoiser_type=args.denoiser_type,
        h_func=h_func,
        h_func_kwargs=h_func_kwargs,
        so3_cache_dir=args.so3_cache_dir,
        seed=args.seed,
    )
    if args.denoiser_config_path:
        import functools

        import yaml

        from se3diff_tpu.sampling.bundle import make_denoiser

        with open(args.denoiser_config_path) as f:
            den = make_denoiser(yaml.safe_load(f))
        # Fine-tuning needs a path *recorder*; a plain sampling denoiser has
        # a different interface and would only fail deep inside the jitted
        # path sampler.
        fn = den.func if isinstance(den, functools.partial) else den
        if not fn.__name__.endswith("_finetune"):
            raise SystemExit(
                f"--denoiser_config_path must name a *_finetune path "
                f"recorder (euler_maruyama_predictor_finetune, "
                f"heun_denoiser_finetune, sde_dpm_solver_finetune); "
                f"got {fn.__name__}"
            )
        bundle = bundle._replace(denoiser=den)
    if args.num_steps is not None:
        import functools

        bundle = bundle._replace(
            denoiser=functools.partial(bundle.denoiser, num_steps=args.num_steps)
        )

    config = FinetuneConfig()
    if args.finetune_config_path:
        import yaml

        # Reference finetune.yaml keys without an equivalent here:
        # _target_ (hydra) and num_workers (torch DataLoader).
        skip = {"_target_", "num_workers"}
        with open(args.finetune_config_path) as f:
            for k, v in (yaml.safe_load(f) or {}).items():
                if k in skip:
                    continue
                if not hasattr(config, k):
                    raise SystemExit(
                        f"--finetune_config_path: unknown key {k!r} "
                        f"(valid: {sorted(vars(config))})"
                    )
                setattr(
                    config, k,
                    tuple(v) if isinstance(v, list) else v,
                )
    for name in ("batch_size", "num_epochs", "lr", "lambda_", "debug_dump_dir"):
        val = getattr(args, name)
        if val is not None:
            setattr(config, name, val)

    csv_path, csv_path_val = args.csv_path, args.csv_path_val
    if args.h_stars_from_dg:
        # Pre-transform dg columns -> sigmoid(-dg) in temp CSVs.
        import numpy as np
        import pandas as pd

        tmpdir = tempfile.mkdtemp(prefix="se3diff_hstars_")
        new_paths = []
        for src in (csv_path, csv_path_val):
            df = pd.read_csv(src)
            for col in args.h_stars_cols:
                df[col] = 1.0 / (1.0 + np.exp(df[col].to_numpy(np.float64)))
            dst = f"{tmpdir}/{len(new_paths)}.csv"
            df.to_csv(dst, index=False)
            new_paths.append(dst)
        csv_path, csv_path_val = new_paths

    finetune(
        csv_path=csv_path,
        csv_path_val=csv_path_val,
        sequence_col=args.sequence_col,
        h_stars_cols=args.h_stars_cols,
        bundle=bundle,
        config=config,
        output_dir=args.output_dir,
        cache_embeds_dir=args.cache_embeds_dir,
        embeds_backend=args.embeds_backend,
        msa_file=args.msa_file,
        msa_host_url=args.msa_host_url,
        seed=args.seed,
    )


if __name__ == "__main__":
    main()
