"""Mesh construction helpers.

The canonical layout is a 2D ``("data", "model")`` mesh (SURVEY.md section 7):
sampling is pure data parallelism (batch sharded over every chip, zero
steady-state communication), training adds tensor parallelism over attention
heads / MLP hidden units along "model".
"""

from __future__ import annotations

import math

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(
    n_devices: int | None = None,
    model_parallel: int = 1,
    axis_names: tuple[str, str] = ("data", "model"),
) -> Mesh:
    """Build a ``(data, model)`` mesh over the first ``n_devices`` devices.

    ``model_parallel`` chips per model group (must divide ``n_devices``);
    the rest is the data axis. Device order follows ``jax.devices()``, which
    on TPU enumerates ICI-adjacent chips contiguously, so model groups ride
    ICI neighbors.
    """
    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    if n_devices > len(devices):
        raise ValueError(f"requested {n_devices} devices, have {len(devices)}")
    if n_devices % model_parallel != 0:
        raise ValueError(
            f"model_parallel={model_parallel} must divide n_devices={n_devices}"
        )
    grid = np.asarray(devices[:n_devices]).reshape(
        n_devices // model_parallel, model_parallel
    )
    return Mesh(grid, axis_names)


def pick_model_parallel(n_devices: int, n_heads: int) -> int:
    """Largest power-of-two model-parallel degree that divides both the
    device count and the head count (TP shards attention heads)."""
    mp = 1
    while (
        mp * 2 <= n_devices
        and n_devices % (mp * 2) == 0
        and n_heads % (mp * 2) == 0
    ):
        mp *= 2
    return mp


def good_batch_size(n_data: int, per_device: int) -> int:
    """Global batch divisible by the data axis."""
    return n_data * per_device


def largest_pow2_leq(n: int) -> int:
    return 1 << (int(math.log2(n)) if n > 0 else 0)
