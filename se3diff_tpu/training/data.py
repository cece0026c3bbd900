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

__all__ = ["EnsembleDataset"]


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
        self, batch_size: int, seed: int = 0
    ) -> Callable[[int], dict[str, np.ndarray]]:
        """Deterministic ``step -> batch`` (the `training/loop.py` resume
        contract): each epoch is an independent seeded permutation of the
        frames; a resumed run at step k re-derives exactly batch k."""
        F = self.num_frames
        if batch_size > F:
            raise ValueError(f"batch_size {batch_size} > {F} frames")
        per_epoch = F // batch_size

        def fn(step: int) -> dict[str, np.ndarray]:
            epoch, k = divmod(step, per_epoch)
            perm = np.random.default_rng((seed, epoch)).permutation(F)
            return self.batch(perm[k * batch_size : (k + 1) * batch_size])

        return fn
