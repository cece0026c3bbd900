"""Differentiable h-functions for PPFT fine-tuning targets.

Counterparts of `bioemu/src/bioemu/observables/folding_stability.py` and
`observables/folding_binding.py`: smooth (sigmoid-of-dRMSD) fold/bind
probabilities evaluated on the final denoised batch. Unlike the reference,
the reference-structure path is a constructor argument instead of a
hardcoded relative path (folding_stability.py:170-173) — pass
``assets/structures/2vwf_trimmed_SH3.pdb`` to reproduce it.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from se3diff_tpu.ppft.observables import load_ref

K_BOLTZMANN = 0.001987203599772605  # kcal / mol / K (free_energies.py:11)

_ASSETS = os.path.join(os.path.dirname(__file__), "..", "..", "assets")
DEFAULT_SH3_REF = os.path.normpath(
    os.path.join(_ASSETS, "structures", "2vwf_trimmed_SH3.pdb")
)
DEFAULT_PDZ3_REF = os.path.normpath(
    os.path.join(_ASSETS, "structures", "1be9_trimmed.pdb")
)

# GRB2-SH3 binding-interface residues (folding_binding.py:199-201).
SH3_INTERFACE_RESIDUES = (6, 8, 11, 12, 15, 31, 33, 34, 36, 45, 47, 49, 50)


def compute_folded_proportion(
    coords: jax.Array,
    ref_coords: jax.Array,
    k: float = -24.0,
    d_0: float = 0.4,
    tol: float = 1e-7,
) -> jax.Array:
    """p_folded via the f_dRMSD sigmoid (folding_stability.py:52-81).

    ``coords [B, L, 3]`` nm, ``ref_coords [L, 3]`` nm -> ``[B]``.
    """

    def cdist(x):
        return jnp.linalg.norm(x[..., :, None, :] - x[..., None, :, :] + 1e-12, axis=-1)

    delta = cdist(coords) - cdist(ref_coords[None])
    drmsd = jnp.sqrt(jnp.mean(delta**2, axis=(-1, -2)))
    p = jax.nn.sigmoid(k * (drmsd - d_0))
    return jnp.clip(p, tol, 1.0 - tol)


def compute_dg(p_folded: jax.Array, temperature: float = 298.0, tol: float = 1e-7):
    """Folding free energy from ensemble-mean p_folded
    (folding_stability.py:84-100); kcal/mol."""
    p = jnp.clip(jnp.mean(p_folded), tol, 1.0 - tol)
    return -K_BOLTZMANN * temperature * jnp.log(p / (1.0 - p))


def compute_folded_proportion_from_dg(dg: jax.Array, temperature: float = 298.0):
    """Inverse Boltzmann relation (folding_stability.py:103-116)."""
    return jax.nn.sigmoid(-dg / (K_BOLTZMANN * temperature))


@dataclass(frozen=True)
class FoldingStability:
    """h(x) = p_folded(x) in [B, 1] (folding_stability.py:120-194)."""

    k: float = -24.0
    d_0: float = 0.4
    tol: float = 1e-7
    ref_path: str = DEFAULT_SH3_REF

    @property
    def num_observables(self) -> int:
        return 1

    def __call__(self, pos: jax.Array, sequence: str) -> jax.Array:
        del sequence  # reference structure is per-system, not per-mutant
        ref = jnp.asarray(load_ref(self.ref_path))
        p = compute_folded_proportion(pos, ref, self.k, self.d_0, self.tol)
        return p[:, None]


@dataclass(frozen=True)
class FoldingBinding:
    """h(x) = (p_folded, p_bound) in [B, 2] (folding_binding.py:119-205).

    p_bound applies the same dRMSD sigmoid restricted to the
    binding-interface residues.
    """

    k: float = -24.0
    d_0: float = 0.4
    tol: float = 1e-7
    ref_path: str = DEFAULT_SH3_REF
    interface_residues: tuple[int, ...] = SH3_INTERFACE_RESIDUES

    @property
    def num_observables(self) -> int:
        return 2

    def __call__(self, pos: jax.Array, sequence: str) -> jax.Array:
        del sequence
        ref = jnp.asarray(load_ref(self.ref_path))
        idx = jnp.asarray(self.interface_residues)
        p_folded = compute_folded_proportion(pos, ref, self.k, self.d_0, self.tol)
        p_bound = compute_folded_proportion(
            pos[:, idx], ref[idx], self.k, self.d_0, self.tol
        )
        return jnp.stack([p_folded, p_bound], axis=-1)


H_FUNCTIONS = {
    "folding_stability": FoldingStability,
    "folding_binding": FoldingBinding,
}
