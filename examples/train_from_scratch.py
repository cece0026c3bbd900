"""Worked example: train an SE(3) score network from scratch.

The reference never trains its production model in-repo (the bioemu-v1.0
checkpoint arrives pretrained, sample.py:54-105; its toy trains SO(3)
only, se3diff/train.py:109-143). This example exercises the framework's
own training subsystem end-to-end: a small DiG score net learns, by
denoising score matching (`training/dsm.py`), the SE(3) marginals of a
synthetic "protein" dataset — noisy copies of one backbone conformation —
with the trainer loop's warmup+cosine schedule, orbax checkpoints, and
exact resume (`training/loop.py`). With ``--mesh`` the same run shards
DP+TP over the 8-virtual-device CPU mesh.

Run:  python examples/train_from_scratch.py [--steps 500] [--mesh]

After training, reverse-diffusion samples from the learned score are
compared against the data distribution: their mean pairwise Ca distance
(translation-invariant; the diffused center of mass is unpinned) contracts
from the prior's ~2.4 toward the dataset's 0.64 — ~1.0 after 500 steps
(~10 min CPU).
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# Force the CPU backend before jax initializes (the axon sitecustomize
# otherwise pins the TPU platform even with JAX_PLATFORMS=cpu exported).
if "xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
    ).strip()
import jax  # noqa: E402

# CPU by default (the example is sized for it); opt into the real chip
# with SE3DIFF_EXAMPLE_TPU=1. Do NOT probe jax.default_backend() here —
# that would initialize the TPU backend just to ask.
if not os.environ.get("SE3DIFF_EXAMPLE_TPU"):
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from se3diff_tpu.diffusion import denoise  # noqa: E402
from se3diff_tpu.models.dig import DiGConditionalScoreModel  # noqa: E402
from se3diff_tpu.ops import so3 as so3_ops  # noqa: E402
from se3diff_tpu.sde.so3_sde import DiGSO3SDE  # noqa: E402
from se3diff_tpu.sde.vpsde import CosineVPSDE  # noqa: E402
from se3diff_tpu.training.loop import TrainConfig, train_dsm  # noqa: E402

L = 8


def make_dataset(rng: np.random.Generator):
    """One reference conformation; batches are small SE(3) perturbations of
    it (so the score net has a learnable, low-entropy target)."""
    theta = np.linspace(0, 2.5 * np.pi, L)
    ref_pos = np.stack(
        [np.cos(theta), np.sin(theta), np.linspace(0, 1.2, L)], axis=-1
    ).astype(np.float32) * 0.4
    ref_rotvec = rng.standard_normal((L, 3)).astype(np.float32) * 0.4

    # Fixed conditioning, like a real system's cached embeddings: the same
    # single/pair accompany every batch (random per-step conditioning would
    # just be noise the score net must average over).
    single = rng.standard_normal((L, 384)).astype(np.float32) * 0.1
    pair = rng.standard_normal((L, L, 128)).astype(np.float32) * 0.1

    def batch_fn(step: int) -> dict:
        r = np.random.default_rng(step)
        B = 8
        pos = ref_pos[None] + r.standard_normal((B, L, 3)).astype(np.float32) * 0.05
        rotvec = ref_rotvec[None] + r.standard_normal((B, L, 3)).astype(np.float32) * 0.05
        return {
            "pos": jnp.asarray(pos),
            "rot": so3_ops.rotvec_to_rotmat(jnp.asarray(rotvec)),
            "single": jnp.asarray(np.broadcast_to(single, (B, L, 384))),
            "pair": jnp.asarray(np.broadcast_to(pair, (B, L, L, 128))),
        }

    return ref_pos, batch_fn


def mean_pairwise_dist(pos: np.ndarray) -> float:
    d = np.linalg.norm(pos[..., None, :, :] - pos[..., :, None, :], axis=-1)
    iu = np.triu_indices(pos.shape[-2], k=1)
    return float(d[..., iu[0], iu[1]].mean())


def main(argv=None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=500)
    ap.add_argument("--mesh", action="store_true",
                    help="train DP+TP-sharded on an 8-device mesh")
    ap.add_argument("--ckpt_dir", default=None)
    ap.add_argument("--trajectory", action="append", default=None,
                    help="train on a real ensemble: .xtc (with --topology) "
                         "or multi-model .pdb (training/data.py) instead of "
                         "the synthetic dataset; repeat for multi-system "
                         "training (length-bucketed, masked batches)")
    ap.add_argument("--topology", action="append", default=None,
                    help="topology .pdb for an .xtc --trajectory (repeat "
                         "in the same order)")
    ap.add_argument("--batch_size", type=int, default=8)
    args = ap.parse_args(argv)

    rng = np.random.default_rng(0)
    if args.trajectory and len(args.trajectory) > 1:
        from se3diff_tpu.training.data import MultiEnsembleDataset

        tops = args.topology or [None] * len(args.trajectory)
        mds = MultiEnsembleDataset.from_trajectories(
            list(zip(args.trajectory, tops)), embeds_backend="dummy"
        )
        length = max(mds.padded_length(i) for i in range(len(mds.datasets)))
        print(
            f"{len(mds.datasets)} ensembles, {mds.num_frames} frames, "
            f"buckets {mds.occupied_buckets()}"
        )
        batch_fn = mds.batch_fn(args.batch_size)
    elif args.trajectory:
        from se3diff_tpu.training.data import EnsembleDataset

        ds = EnsembleDataset.from_trajectory(
            args.trajectory[0],
            args.topology[0] if args.topology else None,
            embeds_backend="dummy",
        )
        length = ds.num_residues
        print(
            f"ensemble: {ds.num_frames} frames x {length} residues "
            f"({ds.sequence[:20]}{'...' if length > 20 else ''})"
        )
        batch_fn = ds.batch_fn(min(args.batch_size, ds.num_frames))
    else:
        length = L
        _, batch_fn = make_dataset(rng)

    model = DiGConditionalScoreModel(
        num_layers=2, dim_model=32, dim_pair=16, num_heads=4, dim_hidden=64,
        dropout=0.0,
    )
    sdes = denoise.SDEs(
        pos=CosineVPSDE(),
        node_orientations=DiGSO3SDE(num_sigma=32, num_omega=256, l_max=500),
    )
    b0 = batch_fn(0)
    params = model.init(
        jax.random.key(0), b0["pos"][:1], b0["rot"][:1],
        jnp.ones((1,), jnp.float32), b0["single"][:1], b0["pair"][:1],
    )

    mesh = None
    if args.mesh:
        from se3diff_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(8, model_parallel=4)
        print(f"training on mesh {dict(mesh.shape)}")

    ckpt_dir = args.ckpt_dir or tempfile.mkdtemp(prefix="se3diff_train_")
    cfg = TrainConfig(
        num_steps=args.steps, lr=2e-3, warmup_steps=min(20, args.steps // 4),
        min_t=0.05,  # small tables: IGSO(3) series valid for l_max*sigma >> 3
        ckpt_every=max(args.steps // 4, 1), ckpt_dir=ckpt_dir,
        log_every=max(args.steps // 10, 1),
    )
    params, history = train_dsm(
        sdes, model.apply, params, batch_fn, cfg, mesh=mesh,
        val_batch=batch_fn(10_000),
    )
    print(f"loss: {history[0]:.4f} -> {history[-1]:.4f} "
          f"(checkpoints in {ckpt_dir})")

    # Sample the learned score and compare a translation-invariant geometry
    # statistic against the data (the global center of mass stays diffusive
    # — nothing pins it — so absolute coordinates are not comparable).
    # Euler–Maruyama here: the multistep production solvers extrapolate the
    # score and are brittle on a briefly-trained net.
    b = batch_fn(0)
    B = b["pos"].shape[0]
    length = b["pos"].shape[1]  # multi-system: b's own bucket length

    @jax.jit
    def run_sample(k, cond_single, cond_pair):
        # Conditioning as jit ARGUMENTS: closed-over arrays become program
        # constants that XLA slowly constant-folds at compile time.
        def model_fn(pos, rot, t):
            return model.apply(params, pos, rot, t, cond_single, cond_pair)

        return denoise.euler_maruyama(
            k, sdes, model_fn, batch=B, length=length, num_steps=100,
            min_t=0.05,
        )

    pos, _ = run_sample(
        jax.random.key(42), jnp.asarray(b["single"]), jnp.asarray(b["pair"])
    )
    d_model = mean_pairwise_dist(np.asarray(pos))
    d_data = mean_pairwise_dist(np.asarray(b["pos"]))
    prior = jax.random.normal(jax.random.key(7), (B, length, 3))
    d_prior = mean_pairwise_dist(np.asarray(prior))
    print(
        f"mean pairwise distance: samples {d_model:.3f} vs data {d_data:.3f} "
        f"(prior {d_prior:.3f}) — 500 steps reaches ~1.0"
    )


if __name__ == "__main__":
    main()
