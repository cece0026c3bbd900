"""Training data pipeline: structure ensembles -> DSM batches.

The reference never trains its production model in-repo (the bioemu-v1.0
checkpoint arrives pretrained, sample.py:54-105); this module is the
framework's own data layer for the from-scratch / continued-training DSM
trainer (`training/dsm.py`, `training/loop.py`): load a structure ensemble
(topology PDB + XTC trajectory via the native codec, or a multi-model PDB),
convert backbone atoms to the model's SE(3) rigid-frame state space
(`struct/atoms.py::frames_from_backbone`), attach conditioning embeddings
(`sampling/embeds.py` cache, any backend), and serve shuffled static-shape
batches.

TPU-shaped by construction:

* all conversion happens once, host-side, in numpy — no device chatter in
  the steady state;
* batches are deterministic functions of the *step index*
  (:meth:`EnsembleDataset.batch_fn`), the contract `training/loop.py`
  requires for bit-exact checkpoint resume;
* per-batch conditioning is served as broadcast views (the [B, L, L, P]
  pair stack is never copied on host — the H2D transfer materializes it).
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import numpy as np

__all__ = ["EnsembleDataset", "MultiEnsembleDataset"]


@dataclasses.dataclass(frozen=True)
class EnsembleDataset:
    """A conformational ensemble of ONE sequence as DSM training data.

    ``pos [F, R, 3]`` frame translations in nm (centered per frame),
    ``rot [F, R, 3, 3]`` frame rotations, ``single [R, S]`` /
    ``pair [R, R, P]`` conditioning embeddings, one-letter ``sequence``.
    """

    pos: np.ndarray
    rot: np.ndarray
    single: np.ndarray
    pair: np.ndarray
    sequence: str

    @property
    def num_frames(self) -> int:
        return self.pos.shape[0]

    @property
    def num_residues(self) -> int:
        return self.pos.shape[1]

    @classmethod
    def from_trajectory(
        cls,
        trajectory_file,
        topology_file=None,
        *,
        single: np.ndarray | None = None,
        pair: np.ndarray | None = None,
        embeds_backend: str = "dummy",
        cache_embeds_dir=None,
        msa_file=None,
        center: bool = True,
    ) -> "EnsembleDataset":
        """Load ``topology.pdb + .xtc`` (or a multi-model PDB when
        ``topology_file`` is None) and build frames + conditioning.

        Conditioning comes from explicit ``single``/``pair`` arrays when
        given, otherwise from the embeddings cache for the topology's
        sequence (``embeds_backend="dummy"`` needs no network/colabfold).
        """
        from se3diff_tpu.benchmarks.trajectory import (
            load_reference_pdb,
            load_sample_traj,
        )

        if topology_file is None:
            suffix = str(trajectory_file).rsplit(".", 1)[-1].lower()
            if suffix not in ("pdb", "cif"):
                raise ValueError(
                    f"a .{suffix} trajectory needs a topology PDB "
                    "(topology_file=...); only multi-model .pdb/.cif "
                    "files stand alone"
                )
            traj = load_reference_pdb(trajectory_file)
        else:
            traj = load_sample_traj(trajectory_file, topology_file)

        from se3diff_tpu.struct.atoms import frames_from_backbone

        # BackboneTraj layout: [F, R, 4, 3] Angstroms, (N, CA, C, O).
        pos, rot = frames_from_backbone(
            traj.coords[:, :, 0], traj.coords[:, :, 1], traj.coords[:, :, 2]
        )
        if center:
            pos = pos - pos.mean(axis=1, keepdims=True)

        if single is None or pair is None:
            from se3diff_tpu.sampling.embeds import get_embeds

            single_path, pair_path = get_embeds(
                traj.sequence,
                cache_embeds_dir=cache_embeds_dir,
                backend=embeds_backend,
                msa_file=msa_file,
            )
            if single is None:
                single = np.load(single_path)
            if pair is None:
                pair = np.load(pair_path)
        single = np.asarray(single, np.float32)
        pair = np.asarray(pair, np.float32)
        R = pos.shape[1]
        if single.shape[0] != R or pair.shape[:2] != (R, R):
            raise ValueError(
                f"conditioning shapes {single.shape}/{pair.shape} do not "
                f"match the trajectory's {R} residues"
            )
        return cls(
            pos=pos, rot=rot, single=single, pair=pair, sequence=traj.sequence
        )

    def batch(self, idx: np.ndarray) -> dict[str, np.ndarray]:
        """DSM batch dict for the given frame indices (mask-free: ensembles
        are dense single-sequence data)."""
        B = len(idx)
        return {
            "pos": self.pos[idx],
            "rot": self.rot[idx],
            # Broadcast views: no host copy; H2D materializes them.
            "single": np.broadcast_to(
                self.single, (B, *self.single.shape)
            ),
            "pair": np.broadcast_to(self.pair, (B, *self.pair.shape)),
        }

    def batch_fn(
        self, batch_size: int, seed: int = 0, device_cond: bool = False
    ) -> Callable[[int], dict[str, np.ndarray]]:
        """Deterministic ``step -> batch`` (the `training/loop.py` resume
        contract): each epoch is an independent seeded permutation of the
        frames; a resumed run at step k re-derives exactly batch k.

        ``device_cond=True`` stages the (step-invariant) conditioning on
        device ONCE and serves it unbatched (``single [L,S]``,
        ``pair [L,L,P]``); `dsm_loss` broadcasts it inside jit. The
        steady-state H2D transfer then shrinks from O(B·L²·P) to the frame
        batch (KBs) — on a tunnel-attached chip that is the difference
        between tunnel-bound and device-bound training. Single-device /
        auto-sharded steps only (the mesh path's ``place_batch`` shards
        along the batch axis, which unbatched conditioning does not have).
        """
        F = self.num_frames
        if batch_size > F:
            raise ValueError(f"batch_size {batch_size} > {F} frames")
        per_epoch = F // batch_size
        # Staged lazily on first call (mirroring MultiEnsembleDataset's
        # stage()): an eager device_put here would commit the conditioning
        # to whatever device is default at *construction* time, even if the
        # fn is never called or the platform is flipped before training.
        cond: list | None = [] if device_cond else None

        def fn(step: int) -> dict[str, np.ndarray]:
            epoch, k = divmod(step, per_epoch)
            perm = np.random.default_rng((seed, epoch)).permutation(F)
            idx = perm[k * batch_size : (k + 1) * batch_size]
            if cond is None:
                return self.batch(idx)
            if not cond:
                import jax

                cond.extend(
                    (jax.device_put(self.single), jax.device_put(self.pair))
                )
            return {
                "pos": self.pos[idx],
                "rot": self.rot[idx],
                "single": cond[0],
                "pair": cond[1],
            }

        return fn


@dataclasses.dataclass(frozen=True)
class MultiEnsembleDataset:
    """Many single-sequence ensembles as one DSM training stream.

    Batches are homogeneous in system (one protein per batch — conditioning
    is per-sequence) and padded up to the system's *length bucket*, so the
    number of distinct compiled train-step shapes is the number of occupied
    buckets, not the number of systems (the same static-shape discipline as
    the sampling pipeline's length bucketing). Padding carries ``mask=False``
    rows, zero positions/conditioning and identity rotations; `dsm_loss`
    masks them out of the loss.
    """

    datasets: tuple[EnsembleDataset, ...]
    bucket: int = 32
    # Per-system padded (single, pair), built once on first use: a fresh
    # [B, L, L, P] pad per step would cross this box's host-allocation
    # cliff (CLAUDE.md); cached + broadcast views never re-copy.
    _padded: dict = dataclasses.field(
        default_factory=dict, repr=False, compare=False
    )

    @classmethod
    def from_trajectories(
        cls,
        pairs,
        *,
        bucket: int = 32,
        **kwargs,
    ) -> "MultiEnsembleDataset":
        """``pairs``: iterable of (trajectory_file, topology_file_or_None);
        ``kwargs`` forwarded to :meth:`EnsembleDataset.from_trajectory`."""
        datasets = tuple(
            EnsembleDataset.from_trajectory(traj, top, **kwargs)
            for traj, top in pairs
        )
        if not datasets:
            raise ValueError("no ensembles given")
        return cls(datasets=datasets, bucket=bucket)

    @property
    def num_frames(self) -> int:
        return sum(d.num_frames for d in self.datasets)

    def padded_length(self, i: int) -> int:
        R = self.datasets[i].num_residues
        return -(-R // self.bucket) * self.bucket

    def occupied_buckets(self) -> list[int]:
        return sorted({self.padded_length(i) for i in range(len(self.datasets))})

    def _padded_cond(self, system: int) -> tuple[np.ndarray, np.ndarray]:
        if system not in self._padded:
            ds = self.datasets[system]
            R, L = ds.num_residues, self.padded_length(system)
            single = np.zeros((L, ds.single.shape[-1]), np.float32)
            pair = np.zeros((L, L, ds.pair.shape[-1]), np.float32)
            single[:R] = ds.single
            pair[:R, :R] = ds.pair
            self._padded[system] = (single, pair)
        return self._padded[system]

    def batch(self, system: int, idx: np.ndarray) -> dict[str, np.ndarray]:
        """Padded, masked batch of frames ``idx`` from ``system``."""
        ds = self.datasets[system]
        idx = np.asarray(idx)
        B, R = len(idx), ds.num_residues
        L = self.padded_length(system)
        if L == R:
            b = ds.batch(idx)
            b["mask"] = np.broadcast_to(np.ones((), bool), (B, R))
            return b
        pad = L - R
        single, pair = self._padded_cond(system)
        mask = np.zeros((L,), bool)
        mask[:R] = True
        return {
            "pos": np.concatenate(
                [ds.pos[idx], np.zeros((B, pad, 3), np.float32)], axis=1
            ),
            "rot": np.concatenate(
                [
                    ds.rot[idx],
                    np.broadcast_to(np.eye(3, dtype=np.float32), (B, pad, 3, 3)),
                ],
                axis=1,
            ),
            "single": np.broadcast_to(single, (B, *single.shape)),
            "pair": np.broadcast_to(pair, (B, *pair.shape)),
            "mask": np.broadcast_to(mask, (B, L)),
        }

    def batch_fn(
        self, batch_size: int, seed: int = 0, device_cond: bool = False
    ) -> Callable[[int], dict[str, np.ndarray]]:
        """Deterministic ``step -> batch`` (resume contract): each step
        draws one system (frame-count-weighted) and ``batch_size`` frames
        from it with replacement — per-step seeding keeps a resumed run
        bit-exact. For epoch-exact single-system iteration use
        :meth:`EnsembleDataset.batch_fn` on a member directly.

        ``device_cond=True``: per-system padded conditioning is device_put
        once (first use) and served unbatched (``single [L,S]``,
        ``pair [L,L,P]``, ``mask [L]``); `dsm_loss` broadcasts inside jit.
        Cuts the steady-state H2D from O(B·L²·P) to the frame batch — see
        :meth:`EnsembleDataset.batch_fn`. Single-device steps only."""
        weights = np.array([d.num_frames for d in self.datasets], np.float64)
        weights /= weights.sum()
        staged: dict[int, tuple] = {}

        def stage(system: int):
            if system not in staged:
                import jax

                ds = self.datasets[system]
                R, L = ds.num_residues, self.padded_length(system)
                single, pair = (
                    (ds.single, ds.pair) if L == R
                    else self._padded_cond(system)
                )
                mask = np.zeros((L,), bool)
                mask[:R] = True
                staged[system] = (
                    jax.device_put(single), jax.device_put(pair),
                    jax.device_put(mask),
                )
            return staged[system]

        def fn(step: int) -> dict[str, np.ndarray]:
            r = np.random.default_rng((seed, step))
            system = int(r.choice(len(self.datasets), p=weights))
            F = self.datasets[system].num_frames
            idx = r.choice(F, size=batch_size, replace=batch_size > F)
            if not device_cond:
                return self.batch(system, idx)
            ds = self.datasets[system]
            R, L = ds.num_residues, self.padded_length(system)
            single, pair, mask = stage(system)
            pos, rot = ds.pos[idx], ds.rot[idx]
            if L != R:
                B, pad = len(idx), L - R
                pos = np.concatenate(
                    [pos, np.zeros((B, pad, 3), np.float32)], axis=1
                )
                rot = np.concatenate(
                    [rot, np.broadcast_to(
                        np.eye(3, dtype=np.float32), (B, pad, 3, 3))],
                    axis=1,
                )
            return {"pos": pos, "rot": rot, "single": single, "pair": pair,
                    "mask": mask}

        return fn
