"""Headline benchmark: structures/hour at L=100 on one chip.

Mirrors the reference's headline number (`bioemu/README.md:53-58`): 1000
samples at L=100 in 4 min on an A100 80GB with the production 30-step
DPM-solver schedule (BIOEMU_RESULTS.md:4) and the checkpoint-sized DiG score
net (8 layers, d_model 512, d_pair 256, 32 heads). Baseline = 15,000
structures/hr.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import argparse
import json
import logging
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_STRUCTURES_PER_HR = 15_000.0  # A100 80GB, reference implementation


def bench_finetune(args) -> None:
    """PPFT fine-tune step throughput on the real chip.

    Production shape per the reference finetune defaults
    (`bioemu/src/bioemu/config/finetune/finetune.yaml`, finetune.py:69-91):
    GRB2-SH3 (L=56), path batch 256, heun finetune denoiser (100 steps),
    checkpoint-sized frozen score net (8L/512d, bf16) + 2L/d64 finetune net
    (f32). One "step" = record one controlled path + h(x0) + replay
    gradient + AdamW update — exactly `run_one` + `apply_grads` in
    `ppft/trainer.py` (reference finetune.py:291-393).
    """
    import optax

    from se3diff_tpu.diffusion import denoise
    from se3diff_tpu.models.dig import DiGConditionalScoreModel, count_params
    from se3diff_tpu.ppft.h_functions import (
        FoldingStability,
        compute_folded_proportion,
    )
    from se3diff_tpu.ppft.trainer import (
        FinetuneBundle,
        make_finetune_step_fns,
        make_path_sampler,
    )
    from se3diff_tpu.sampling.bundle import Bundle
    from se3diff_tpu.sde.so3_sde import DiGSO3SDE
    from se3diff_tpu.sde.vpsde import CosineVPSDE

    B = args.batch if args.batch_set else 256  # finetune.yaml batch_size
    L = args.length if args.length != 100 else 56  # GRB2-SH3
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32

    sdes = denoise.SDEs(
        pos=CosineVPSDE(), node_orientations=DiGSO3SDE(sigma_max=2.33)
    )
    score_model = DiGConditionalScoreModel(dtype=dtype, use_pallas=args.fused)
    # Finetune net: checkpoints/bioemu-v1.0/config.yaml:12-22; f32 (tiny).
    ft_model = DiGConditionalScoreModel(
        dim_model=64, dim_pair=32, num_layers=2, num_heads=4,
        dim_hidden=128, dropout=0.1,
    )

    rng = np.random.default_rng(0)
    single = jnp.asarray(rng.standard_normal((L, 384)) * 0.5, jnp.float32)
    pair = jnp.asarray(rng.standard_normal((L, L, 128)) * 0.2, jnp.float32)

    pos0 = jnp.zeros((1, L, 3), jnp.float32)
    rot0 = jnp.broadcast_to(jnp.eye(3), (1, L, 3, 3))
    t0 = jnp.ones((1,), jnp.float32)
    base_params = score_model.init(
        jax.random.key(0), pos0, rot0, t0, single[None], pair[None]
    )
    ft_params = ft_model.init(
        jax.random.key(1), pos0, rot0, t0, single[None], pair[None]
    )

    from functools import partial

    if args.ft_denoiser == "heun":
        num_steps = args.steps or 100  # config/denoiser/heun.yaml
        denoiser = partial(denoise.heun_finetune, num_steps=num_steps, noise=0.5)
    elif args.ft_denoiser == "dpm":
        # sde_dpm_finetune.yaml (empty stub in the reference; implemented
        # here) — 50 steps, 2 score evals/step.
        num_steps = args.steps or 50
        denoiser = partial(denoise.sde_dpm_solver_finetune, num_steps=num_steps)
    else:  # the reference finetune default (euler_maruyama.yaml, 200 steps)
        num_steps = args.steps or 200
        denoiser = partial(denoise.euler_maruyama_finetune, num_steps=num_steps)
    if L == 56:
        h_func = FoldingStability()  # real SH3 reference structure
    else:  # non-SH3 L: synthetic reference coordinates, same math
        ref = jnp.asarray(rng.standard_normal((L, 3)) * 0.3, jnp.float32)
        h_func = lambda pos, seq: compute_folded_proportion(pos, ref)[:, None]
    bundle = FinetuneBundle(
        base=Bundle(model=score_model, params=base_params, sdes=sdes,
                    denoiser=None, config={}),
        finetune_model=ft_model,
        finetune_params=ft_params,
        denoiser=denoiser,
        h_func=h_func,
    )

    sampler = make_path_sampler(bundle, B, L)
    grad_fn, _ = make_finetune_step_fns(bundle)
    h_apply = jax.jit(lambda pos: bundle.h_func(pos, ""))
    optimizer = optax.adamw(5e-4)
    opt_state = optimizer.init(ft_params)

    @jax.jit
    def apply_grads(params, opt_state, grads):
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state

    h_stars = jnp.full((B, 1), 0.7, jnp.float32)

    def one_step(key, ft_params, opt_state):
        path = sampler(key, base_params, ft_params, single, pair)
        hs = h_apply(path.pos_path[-1])
        grads, val_loss = grad_fn(ft_params, path, single, pair, hs, h_stars)
        ft_params, opt_state = apply_grads(ft_params, opt_state, grads)
        return ft_params, opt_state, val_loss

    # Warmup / compile all four programs.
    ft_params_w, _, loss = one_step(jax.random.key(0), ft_params, opt_state)
    np.asarray(loss)
    np.asarray(jax.tree.leaves(ft_params_w)[0])

    path_times, grad_times, step_times = [], [], []
    for i in range(args.iters):
        key = jax.random.key(i + 1)
        t_all = time.perf_counter()
        # Path generation + h, synced by transferring hs [B, 1] to host.
        path = sampler(key, base_params, ft_params, single, pair)
        hs = h_apply(path.pos_path[-1])
        np.asarray(hs)
        t_path = time.perf_counter() - t_all
        # Replay gradient + optimizer update, synced via a param transfer.
        t0 = time.perf_counter()
        grads, val_loss = grad_fn(ft_params, path, single, pair, hs, h_stars)
        ft_params, opt_state = apply_grads(ft_params, opt_state, grads)
        np.asarray(val_loss)
        # block_until_ready can return early over the axon tunnel; a real
        # host transfer of a param leaf is the only trustworthy sync.
        np.asarray(jax.tree.leaves(ft_params)[0])
        t_grad = time.perf_counter() - t0
        path_times.append(t_path)
        grad_times.append(t_grad)
        step_times.append(time.perf_counter() - t_all)

    best_path, best_grad = min(path_times), min(grad_times)
    best_step = min(step_times)
    steps_per_hr = 3600.0 / best_step
    print(
        f"# device={jax.devices()[0].device_kind} "
        f"score={count_params(base_params)/1e6:.1f}M "
        f"ft={count_params(ft_params)/1e6:.2f}M B={B} L={L} "
        f"T={num_steps} {args.ft_denoiser}_finetune dtype={args.dtype} "
        f"path_gen={best_path:.2f}s grad_step={best_grad:.2f}s "
        f"step={best_step:.2f}s",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": (
                    f"finetune_steps_per_hour_L{L}_B{B}_"
                    f"{args.ft_denoiser}{num_steps}"
                ),
                "value": round(steps_per_hr, 1),
                "unit": "finetune steps/hr/chip",
                "vs_baseline": None,
            }
        )
    )


def bench_train(args) -> None:
    """DSM training-step throughput on the real chip.

    One step = masked SE(3) DSM loss (translations + IGSO(3) rotation
    targets) on the checkpoint-sized score net + AdamW update —
    `training/dsm.py:make_dsm_train_step`, the from-scratch training path
    the reference lacks (its toy trains only SO(3), se3diff/train.py:109).
    Reports steps/hr and examples/hr (B x steps/hr).
    """
    import optax

    from se3diff_tpu.diffusion import denoise
    from se3diff_tpu.models.dig import DiGConditionalScoreModel, count_params
    from se3diff_tpu.ops import so3 as so3_ops
    from se3diff_tpu.sde.so3_sde import DiGSO3SDE
    from se3diff_tpu.sde.vpsde import CosineVPSDE
    from se3diff_tpu.training.dsm import make_dsm_train_step

    B = args.batch or 16
    L = args.length
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32

    sdes = denoise.SDEs(
        pos=CosineVPSDE(), node_orientations=DiGSO3SDE(sigma_max=2.33)
    )
    if args.kernel is not None:
        from se3diff_tpu.ops.pallas_ipa import resolve_train_kernel

        kernel_kw = resolve_train_kernel(args.kernel)
    else:
        kernel_kw = dict(use_pallas=args.fused, fused_backward=args.bwd)
    model = DiGConditionalScoreModel(
        dtype=dtype, dispatch_batch=B, **kernel_kw
    )

    rng = np.random.default_rng(0)
    pos0 = jnp.asarray(rng.standard_normal((B, L, 3)) * 0.5, jnp.float32)
    rot0 = so3_ops.rotvec_to_rotmat(
        jnp.asarray(rng.standard_normal((B, L, 3)) * 0.4, jnp.float32)
    )
    batch = {
        "pos": pos0,
        "rot": rot0,
        "single": jnp.asarray(rng.standard_normal((B, L, 384)) * 0.5, jnp.float32),
        "pair": jnp.asarray(
            rng.standard_normal((B, L, L, 128)) * 0.2, jnp.float32
        ),
    }
    params = model.init(
        jax.random.key(0), pos0[:1], rot0[:1], jnp.ones((1,), jnp.float32),
        batch["single"][:1], batch["pair"][:1],
    )

    def model_apply(p, pos, rot, t, single, pair, mask):
        return model.apply(p, pos, rot, t, single, pair, mask)

    optimizer = optax.adamw(1e-4)
    opt_state = optimizer.init(params)
    train_step = make_dsm_train_step(sdes, model_apply, optimizer)

    params, opt_state, loss = train_step(
        params, opt_state, jax.random.key(1), batch
    )
    np.asarray(loss)  # compile + warm

    times = []
    for i in range(args.iters):
        t0 = time.perf_counter()
        params, opt_state, loss = train_step(
            params, opt_state, jax.random.key(i + 2), batch
        )
        # Host transfer is the only trustworthy sync over the axon tunnel.
        np.asarray(loss)
        times.append(time.perf_counter() - t0)

    best = min(times)
    steps_per_hr = 3600.0 / best
    print(
        f"# device={jax.devices()[0].device_kind} "
        f"params={count_params(params)/1e6:.1f}M B={B} L={L} "
        f"dtype={args.dtype} dsm_step={best*1e3:.1f}ms "
        f"loss={float(np.asarray(loss)):.4f}",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": f"dsm_train_examples_per_hour_L{L}_B{B}",
                "value": round(B * steps_per_hr, 1),
                "unit": "training examples/hr/chip",
                "vs_baseline": None,
            }
        )
    )


def bench_picard(args) -> None:
    """Parallel-in-time Picard EM vs the sequential EM scan, same model.

    The sequential sampler is one compiled `lax.scan` (no host round-trips),
    so Picard wins only if `num_sweeps` full-trajectory batched model evals
    cost less than `num_steps` single-batch evals — measured here at the
    shape most favorable to it (B=1, long step grid) so the win/loss record
    in docs/PERF.md is the strongest available. Quality note: sweeps==steps
    is EXACTLY the sequential trajectory (tests/test_denoise.py::
    TestParallelPicard); small sweep counts trade accuracy.
    """
    from se3diff_tpu.diffusion import denoise
    from se3diff_tpu.models.dig import DiGConditionalScoreModel
    from se3diff_tpu.sde.so3_sde import DiGSO3SDE
    from se3diff_tpu.sde.vpsde import CosineVPSDE

    B = args.batch or 1
    L = args.length
    steps = args.steps or 200  # the EM reference grid
    sweeps = args.sweeps
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32

    sdes = denoise.SDEs(
        pos=CosineVPSDE(), node_orientations=DiGSO3SDE(sigma_max=2.33)
    )
    model = DiGConditionalScoreModel(
        dtype=dtype, use_pallas=args.fused, dispatch_batch=B
    )
    rng = np.random.default_rng(0)
    single = jnp.asarray(rng.standard_normal((1, L, 384)) * 0.5, jnp.float32)
    pair = jnp.asarray(rng.standard_normal((1, L, L, 128)) * 0.2, jnp.float32)
    pos0 = jnp.zeros((1, L, 3), jnp.float32)
    rot0 = jnp.broadcast_to(jnp.eye(3), (1, L, 3, 3))
    params = model.init(
        jax.random.key(0), pos0, rot0, jnp.ones((1,), jnp.float32), single, pair
    )

    def make_sampler(fn, eval_batch, **kw):
        @jax.jit
        def run(key):
            s = jnp.broadcast_to(single, (eval_batch,) + single.shape[-2:])
            p = jnp.broadcast_to(pair, (eval_batch,) + pair.shape[-3:])
            cache = model.apply(params, s, p, method="embed_conditioning")

            def model_fn(pos, rot, t):
                return model.apply(
                    params, pos, rot, t, cache, method="score_from_cache"
                )

            return fn(key, sdes, model_fn, batch=B, length=L,
                      num_steps=steps, **kw)

        return run

    seq_run = make_sampler(denoise.euler_maruyama, B)
    # Picard evaluates the model on the whole [steps*B] trajectory per sweep.
    pic_run = make_sampler(denoise.parallel_picard_em, steps * B,
                           num_sweeps=sweeps)

    def timed(run):
        np.asarray(run(jax.random.key(0))[0])  # compile + warm
        ts = []
        for i in range(args.iters):
            t0 = time.perf_counter()
            np.asarray(run(jax.random.key(i + 1))[0])
            ts.append(time.perf_counter() - t0)
        return min(ts)

    t_seq = timed(seq_run)
    t_pic = timed(pic_run)
    print(
        f"# device={jax.devices()[0].device_kind} B={B} L={L} "
        f"em_steps={steps} sweeps={sweeps} dtype={args.dtype} "
        f"sequential={t_seq*1e3:.1f}ms picard={t_pic*1e3:.1f}ms "
        f"ratio={t_pic/t_seq:.2f}x",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": f"picard_vs_sequential_em{steps}_L{L}_B{B}_s{sweeps}",
                "value": round(t_pic / t_seq, 3),
                "unit": "picard/sequential wall ratio (<1 = picard wins)",
                "vs_baseline": None,
            }
        )
    )


def bench_e2e(args) -> None:
    """End-to-end sample-CLI throughput: the full product path.

    Runs `sampling.pipeline.sample` (the CLI's engine) — denoise batches +
    npz writes + frames->atom37 + physicality filter + XTC encode — and
    reports end-to-end structures/hr next to the device-only headline.
    The reference's 4-min/1000-sample A100 figure is end-to-end
    (`bioemu/README.md:53-58`), so this is the apples-to-apples number.
    """
    import shutil
    import tempfile
    from functools import partial

    from se3diff_tpu.diffusion import denoise
    from se3diff_tpu.models.dig import DiGConditionalScoreModel
    from se3diff_tpu.sampling import pipeline
    from se3diff_tpu.sampling.bundle import Bundle
    from se3diff_tpu.sde.so3_sde import DiGSO3SDE
    from se3diff_tpu.sde.vpsde import CosineVPSDE

    B = args.batch or 40
    L = args.length
    steps = denoise.resolve_steps(args.steps, args.solver)
    n_samples = args.samples
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32

    sdes = denoise.SDEs(
        pos=CosineVPSDE(), node_orientations=DiGSO3SDE(sigma_max=2.33)
    )
    model = DiGConditionalScoreModel(
        dtype=dtype, use_pallas=args.fused, dispatch_batch=B
    )
    rng = np.random.default_rng(0)
    single1 = jnp.asarray(rng.standard_normal((1, L, 384)) * 0.5, jnp.float32)
    pair1 = jnp.asarray(rng.standard_normal((1, L, L, 128)) * 0.2, jnp.float32)
    pos0 = jnp.zeros((1, L, 3), jnp.float32)
    rot0 = jnp.broadcast_to(jnp.eye(3), (1, L, 3, 3))
    params = model.init(
        jax.random.key(0), pos0, rot0, jnp.ones((1,), jnp.float32), single1, pair1
    )
    solver = (
        denoise.dpm_solver_pp2m if args.solver == "dpm_2m" else denoise.dpm_solver
    )
    bundle = Bundle(
        model=model, params=params, sdes=sdes,
        denoiser=partial(solver, num_steps=steps), config={},
    )

    seq = ("GYDPETGTWG" * ((L + 9) // 10))[:L]
    tmp = tempfile.mkdtemp(prefix="se3diff_e2e_")
    # Surface the pipeline's per-run wall breakdown (stage/loop/write)
    # for the long-L fixed-cost accounting.
    if not logging.getLogger().handlers:
        logging.basicConfig(stream=sys.stderr)
    logging.getLogger("se3diff_tpu.sampling.pipeline").setLevel(logging.DEBUG)
    # Random-init weights produce unphysical frames, so the filter would
    # drop everything and skip the write tail. Pay the filter's full
    # compute, but keep all frames so the XTC/centering tail is timed too.
    orig_filter = pipeline.filter_unphysical_masks_device
    if not args.no_filter:
        def _filter_keep_all(atom37, mask, **kw):
            m = orig_filter(atom37, mask, **kw)
            return jnp.ones_like(m)

        pipeline.filter_unphysical_masks_device = _filter_keep_all
    try:
        # Warmup/compile run into a throwaway dir (same shapes).
        pipeline.sample(
            seq, B, f"{tmp}/warm", bundle, batch_size=B,
            cache_embeds_dir=f"{tmp}/embeds", embeds_backend="dummy",
            filter_samples=not args.no_filter,
        )
        walls = []
        for i in range(args.iters):
            run_dir = f"{tmp}/run{i}"
            t0 = time.perf_counter()
            pipeline.sample(
                seq, n_samples, run_dir, bundle, batch_size=B,
                cache_embeds_dir=f"{tmp}/embeds", embeds_backend="dummy",
                filter_samples=not args.no_filter,
            )
            walls.append(time.perf_counter() - t0)
    finally:
        pipeline.filter_unphysical_masks_device = orig_filter
        shutil.rmtree(tmp, ignore_errors=True)

    best = min(walls)
    e2e_per_hr = n_samples / best * 3600.0
    print(
        f"# device={jax.devices()[0].device_kind} e2e B={B} L={L} "
        f"{args.solver}{steps} n={n_samples} filter={not args.no_filter} "
        f"walls={['%.2f' % w for w in walls]}",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": f"e2e_structures_per_hour_L{L}_{args.solver}{steps}",
                "value": round(e2e_per_hr, 1),
                "unit": "structures/hr/chip",
                "vs_baseline": round(e2e_per_hr / BASELINE_STRUCTURES_PER_HR, 3),
            }
        )
    )


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--length", type=int, default=100)
    # Throughput-optimal on v5e (ref used 20 on A100). Post layout-rework
    # sweep at L=100/30-step/bf16: B=40 163.1k, B=56 154.9k, B=64 152.9k
    # structures/hr — B=40 stays the optimum.
    p.add_argument("--batch", type=int, default=None,
                   help="default: 40 (sampling), 256 (--finetune, per "
                        "config/finetune/finetune.yaml)")
    p.add_argument("--steps", type=int, default=None,
                   help="default: 30 for dpm (the reference's production "
                        "schedule), 30 for dpm_2m (quality-matched at half "
                        "the NFE), 100 for --finetune (heun)")
    p.add_argument("--iters", type=int, default=3)
    p.add_argument("--dtype", default="bfloat16", choices=["float32", "bfloat16"])
    p.add_argument("--fused", action="store_true",
                   help="force the fused Pallas IPA attention kernel "
                        "(equivalent to --use_pallas on)")
    p.add_argument("--use_pallas", default=None, choices=["auto", "on", "off"],
                   help="fused-kernel dispatch: auto = by the measured "
                        "throughput model "
                        "(ops.pallas_ipa.predicted_fused_advantage); "
                        "default off so the two columns of the README "
                        "long-L table stay separately reproducible")
    p.add_argument("--solver", default="dpm_2m", choices=["dpm", "dpm_2m"],
                   help="dpm = reference-parity DPM-Solver-2 (2 NFE/step); "
                        "dpm_2m = multistep DPM-Solver++(2M) (1 NFE/step; at 30 steps "
                        "its ensembles match dpm-30 on every instrument — "
                        "analytic terminal law, golden-checkpoint nulls, "
                        "ODE-endpoint convergence; tests/test_solver_quality.py "
                        "— the default)")
    p.add_argument("--finetune", action="store_true",
                   help="benchmark the PPFT fine-tune step (path record + "
                        "replay gradient + AdamW) instead of sampling")
    p.add_argument("--train", action="store_true",
                   help="benchmark the SE(3) DSM training step (loss + grad "
                        "+ AdamW on the checkpoint-sized net) instead of "
                        "sampling")
    p.add_argument("--bwd", default="auto", choices=["auto", "full", "chunked"],
                   help="--train --fused: backward strategy for the fused "
                        "path (fused_ipa_attention_diff backward=)")
    p.add_argument("--kernel", default=None, choices=["auto", "xla", "fused"],
                   help="--train: kernel via resolve_train_kernel (the "
                        "train CLI's dispatch); overrides --fused/--bwd")
    p.add_argument("--picard", action="store_true",
                   help="measure parallel_picard_em vs the sequential EM "
                        "scan (same model/shape; see docs/PERF.md)")
    p.add_argument("--sweeps", type=int, default=8,
                   help="--picard: Picard sweep count")
    p.add_argument("--e2e", action="store_true",
                   help="measure the full sample pipeline (denoise + npz + "
                        "atom37 + filter + XTC) instead of device-only")
    p.add_argument("--samples", type=int, default=400,
                   help="--e2e: samples per timed run")
    p.add_argument("--no_filter", action="store_true",
                   help="--e2e: skip the physicality filter")
    p.add_argument("--ft_denoiser", default="heun",
                   choices=["heun", "em", "dpm"],
                   help="--finetune path recorder: heun (100 steps, 3 score "
                        "evals/step), em (200 steps, 1 eval/step — the "
                        "reference finetune default), or dpm (50 steps, 2 "
                        "evals/step — implemented here; empty stub in the "
                        "reference)")
    p.add_argument("--platform", default=None, choices=["cpu", "axon", "tpu"],
                   help="force a jax platform in-process (the axon "
                        "sitecustomize overrides the JAX_PLATFORMS env var, "
                        "so CPU smokes of this script need this flag)")
    args = p.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    # Opt-in only (the driver runs bench unattended; a user who wants
    # cross-process compile reuse for sweeps sets the dir explicitly).
    import os

    if os.environ.get("SE3DIFF_COMPILATION_CACHE_DIR"):
        from se3diff_tpu.utils.compile_cache import enable_compilation_cache

        enable_compilation_cache()
    if args.use_pallas is not None:
        args.fused = {"auto": "auto", "on": True, "off": False}[args.use_pallas]

    if args.finetune:
        args.batch_set = args.batch is not None
        bench_finetune(args)
        return
    if args.train:
        bench_train(args)
        return
    if args.picard:
        bench_picard(args)
        return
    if args.e2e:
        bench_e2e(args)
        return
    if args.batch is None:
        args.batch = 40

    from se3diff_tpu.diffusion import denoise

    args.steps = denoise.resolve_steps(args.steps, args.solver)
    from se3diff_tpu.models.dig import DiGConditionalScoreModel, count_params
    from se3diff_tpu.sde.so3_sde import DiGSO3SDE
    from se3diff_tpu.sde.vpsde import CosineVPSDE

    B, L = args.batch, args.length
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32

    sdes = denoise.SDEs(
        pos=CosineVPSDE(),
        node_orientations=DiGSO3SDE(sigma_max=2.33),  # checkpoint config
    )

    model = DiGConditionalScoreModel(
        dtype=dtype, use_pallas=args.fused, dispatch_batch=B
    )
    rng = np.random.default_rng(0)
    single = jnp.asarray(rng.standard_normal((B, L, 384)) * 0.5, jnp.float32)
    pair = jnp.asarray(rng.standard_normal((B, L, L, 128)) * 0.2, jnp.float32)

    pos0 = jnp.zeros((1, L, 3), jnp.float32)
    rot0 = jnp.broadcast_to(jnp.eye(3), (1, L, 3, 3))
    t0 = jnp.ones((1,), jnp.float32)
    params = model.init(
        jax.random.key(0), pos0, rot0, t0, single[:1], pair[:1]
    )
    n_params = count_params(params)

    # Conditioning enters as jit arguments: closure constants would be
    # embedded in the program (100s of MB at large batch) and can exceed
    # remote-compile payload limits.
    @jax.jit
    def sample(key, single, pair):
        # t-invariant conditioning (the [B, L, L, *] pair stack) is embedded
        # once per sample batch; the denoise scan replays only the per-step
        # score evaluation.
        cache = model.apply(params, single, pair, method="embed_conditioning")

        def model_fn(pos, rot, t):
            return model.apply(params, pos, rot, t, cache, method="score_from_cache")

        solver = (
            denoise.dpm_solver_pp2m if args.solver == "dpm_2m" else denoise.dpm_solver
        )
        return solver(
            key, sdes, model_fn, batch=B, length=L, num_steps=args.steps,
        )

    # Warmup/compile; time through a full host transfer (block_until_ready
    # can return early over remote-device tunnels).
    np.asarray(sample(jax.random.key(0), single, pair)[0])

    times = []
    for i in range(args.iters):
        t_start = time.perf_counter()
        np.asarray(sample(jax.random.key(i + 1), single, pair)[0])
        times.append(time.perf_counter() - t_start)

    best = min(times)
    structures_per_hr = B / best * 3600.0
    nfe_per_step = 1 if args.solver == "dpm_2m" else 2
    model_fwd_ms = best / (args.steps * nfe_per_step) * 1000.0

    print(
        f"# device={jax.devices()[0].device_kind} params={n_params/1e6:.1f}M "
        f"B={B} L={L} steps={args.steps} dtype={args.dtype} "
        f"times={['%.3f' % t for t in times]} fwd={model_fwd_ms:.1f}ms/batch",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": f"structures_per_hour_L{L}_{args.solver}{args.steps}",
                "value": round(structures_per_hr, 1),
                "unit": "structures/hr/chip",
                "vs_baseline": round(structures_per_hr / BASELINE_STRUCTURES_PER_HR, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
