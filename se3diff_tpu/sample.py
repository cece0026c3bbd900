"""CLI: sample protein conformational ensembles from sequence.

Counterpart of `python -m bioemu.sample` (`bioemu/src/bioemu/sample.py:330-397`):

    python -m se3diff_tpu.sample --sequence <seq-or-fasta> --num_samples 100 \\
        --output_dir out/ --ckpt_path /path/checkpoint.ckpt

Checkpoints are local paths (no hub download in hermetic environments); the
same bioemu-v1.0 ``config.yaml`` format drives model/SDE construction.
``--embeds_backend dummy`` substitutes deterministic embeddings when no
ColabFold install is available.
"""

from __future__ import annotations

import argparse
import logging

from se3diff_tpu.sampling.bundle import load_bundle, random_bundle
from se3diff_tpu.sampling.pipeline import sample


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="python -m se3diff_tpu.sample", description=__doc__
    )
    p.add_argument("--sequence", required=True, help="amino-acid sequence, or fasta path")
    p.add_argument("--num_samples", type=int, required=True)
    p.add_argument("--output_dir", required=True)
    p.add_argument("--batch_size_100", type=int, default=10,
                   help="batch size at L=100; scaled by (100/L)^2 (sample.py:279)")
    p.add_argument("--ckpt_path", default=None, help="torch checkpoint path")
    p.add_argument("--model_name", default=None,
                   help="pretrained model to fetch from the HuggingFace hub "
                        "(reference sample.py:331-358 defaults to "
                        "bioemu-v1.0); requires network egress. Ignored when "
                        "--ckpt_path is given.")
    p.add_argument("--model_config_path", default=None,
                   help="config.yaml (default: alongside the checkpoint)")
    p.add_argument("--denoiser", default="dpm",
                   choices=["dpm", "dpm_fast", "dpm_2m", "heun", "euler_maruyama"],
                   help="denoiser config (config/denoiser/*.yaml defaults; "
                        "dpm_2m = faster multistep DPM++(2M), see bench.py)")
    p.add_argument("--denoiser_config_path", default=None,
                   help="reference-format denoiser yaml overriding --denoiser")
    p.add_argument("--cache_embeds_dir", default=None)
    p.add_argument("--embeds_backend", default="colabfold",
                   choices=["colabfold", "dummy"])
    p.add_argument("--msa_file", default=None,
                   help="A3M MSA to use instead of querying an MSA server; "
                        "its query row is replaced by --sequence "
                        "(get_embeds.py:225-235)")
    p.add_argument("--msa_host_url", default=None)
    p.add_argument("--so3_cache_dir", default=None)
    p.add_argument("--filter_samples", action=argparse.BooleanOptionalAction,
                   default=True, help="drop unphysical frames before writing")
    # Named so the historical abbreviation "--batch_size" still resolves to
    # --batch_size_100 (an exact-match --batch_size flag would silently
    # capture it with a different meaning).
    p.add_argument("--exact_batch_size", type=int, default=None,
                   help="exact per-batch sample count, overriding the "
                        "quadratic --batch_size_100 heuristic (which cannot "
                        "express every (batch, length) pair)")
    p.add_argument("--length_bucket", type=int, default=None,
                   help="pad L to this multiple (masked) so multi-system "
                        "sweeps share compilations")
    p.add_argument("--dtype", default="float32", choices=["float32", "bfloat16"])
    p.add_argument("--use_pallas", default="auto", choices=["auto", "on", "off"],
                   help="fused Pallas IPA attention kernel: auto (default) "
                        "picks it on TPU wherever the measured throughput "
                        "model (ops.pallas_ipa.predicted_fused_advantage) "
                        "says it wins end-to-end; on/off force the choice")
    p.add_argument("--sp", type=int, default=0,
                   help="sequence-parallel degree: shard the LxL pair "
                        "tensors (and, on the fused path, the attention row "
                        "slabs) over the first N devices — for proteins "
                        "whose pair stack exceeds one chip's HBM "
                        "(docs/SCALING.md)")
    return p


def main(argv: list[str] | None = None) -> None:
    logging.basicConfig(level=logging.INFO)
    args = build_parser().parse_args(argv)

    from se3diff_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()

    import jax.numpy as jnp

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    use_pallas = {"auto": "auto", "on": True, "off": False}[args.use_pallas]

    pair_sharding = None
    if args.sp and args.sp > 1:
        import jax
        import numpy as np
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        devices = jax.devices()
        if len(devices) < args.sp:
            raise SystemExit(
                f"--sp {args.sp} requested but only {len(devices)} devices "
                "are visible"
            )
        mesh = Mesh(
            np.array(devices[: args.sp]).reshape(args.sp), ("model",)
        )
        pair_sharding = NamedSharding(mesh, P(None, "model"))
        logging.info("sequence parallelism over %d devices", args.sp)

    denoiser: str | dict = args.denoiser
    if args.denoiser_config_path:
        import yaml

        with open(args.denoiser_config_path) as f:
            denoiser = yaml.safe_load(f)

    if args.ckpt_path is None and args.model_name is not None:
        from se3diff_tpu.sampling.bundle import maybe_download_checkpoint

        # An explicitly passed --model_config_path wins over the hub config
        # (the reference's maybe_download_checkpoint honors both).
        ckpt, hub_cfg = maybe_download_checkpoint(model_name=args.model_name)
        args.ckpt_path = ckpt
        if args.model_config_path is None:
            args.model_config_path = hub_cfg

    if args.ckpt_path is None:
        logging.warning(
            "No --ckpt_path given: using a randomly initialized finetune-sized "
            "model (useful only for smoke tests; pass --model_name "
            "bioemu-v1.0 to fetch the reference weights when networked)."
        )
        bundle = random_bundle(
            denoiser=args.denoiser, dtype=dtype,
            model_cfg={"use_pallas": use_pallas,
                       "pair_sharding": pair_sharding},
        )
        if not isinstance(denoiser, str):
            from se3diff_tpu.sampling.bundle import make_denoiser

            bundle.denoiser = make_denoiser(denoiser)
    else:
        bundle = load_bundle(
            args.ckpt_path,
            config_path=args.model_config_path,
            denoiser=denoiser,
            so3_cache_dir=args.so3_cache_dir,
            dtype=dtype,
            use_pallas=use_pallas,
            pair_sharding=pair_sharding,
        )

    sample(
        sequence=args.sequence,
        num_samples=args.num_samples,
        output_dir=args.output_dir,
        bundle=bundle,
        batch_size_100=args.batch_size_100,
        cache_embeds_dir=args.cache_embeds_dir,
        embeds_backend=args.embeds_backend,
        msa_file=args.msa_file,
        msa_host_url=args.msa_host_url,
        filter_samples=args.filter_samples,
        length_bucket=args.length_bucket,
        batch_size=args.exact_batch_size,
    )


if __name__ == "__main__":
    main()
