"""Data-parallel ensemble sampling over a device mesh.

Sampling is embarrassingly parallel (SURVEY.md section 7): the batch axis is
sharded over every chip via NamedSharding and the whole denoising scan runs
SPMD with zero steady-state communication — the pod-scale path the reference
lacks entirely (section 2.10). Conditioning (single/pair) is replicated;
per-chip randomness comes from the single key (XLA partitions the
batch-indexed normal draws).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from se3diff_tpu.diffusion import denoise
from se3diff_tpu.sampling.bundle import Bundle


def round_up_batch(batch: int, n_data: int) -> int:
    """Smallest multiple of the data-axis size >= batch."""
    return -(-batch // n_data) * n_data


def make_sharded_sampler(
    bundle: Bundle,
    mesh: Mesh,
    batch: int,
    length: int,
    denoiser: Callable | None = None,
) -> Callable:
    """Build ``sampler(key, params, single, pair) -> (pos, rot)`` with the
    batch sharded over the mesh's "data" axis; params/conditioning are
    arguments (replicated), not embedded program constants.

    ``batch`` must be divisible by the data-axis size (use
    :func:`round_up_batch`); excess samples can be discarded by the caller.
    """
    n_data = mesh.shape["data"]
    if batch % n_data != 0:
        raise ValueError(f"batch {batch} not divisible by data axis {n_data}")
    denoiser = denoiser or bundle.denoiser

    batch_sh = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())

    def sampler(key, params, single, pair):
        # Conditioning embed runs once, outside the denoise scan.
        s = jnp.broadcast_to(single, (batch,) + single.shape[-2:])
        p = jnp.broadcast_to(pair, (batch,) + pair.shape[-3:])
        cache = bundle.model.apply(params, s, p, method="embed_conditioning")

        def model_fn(pos, rot, t):
            return bundle.model.apply(
                params, pos, rot, t, cache, method="score_from_cache"
            )

        return denoiser(
            key, bundle.sdes, model_fn, batch=batch, length=length
        )

    return jax.jit(
        sampler,
        in_shardings=(repl, repl, repl, repl),
        out_shardings=(batch_sh, batch_sh),
    )


def sample_batch_sharded(
    bundle: Bundle,
    mesh: Mesh,
    single: np.ndarray,
    pair: np.ndarray,
    batch: int,
    seed: int = 0,
) -> dict[str, np.ndarray]:
    """DP-sharded counterpart of ``sampling.pipeline.generate_batch``;
    rounds the batch up to the mesh and trims the surplus.

    One-shot helper: loop callers should ``jnp.asarray`` single/pair ONCE
    outside the loop (a no-op here when already device-resident) — a host
    ``pair`` is an O(L²) H2D payload per call, the long-L pipeline
    collapse mechanism (`sampling.pipeline.stage_conditioning`)."""
    L = single.shape[0]
    n_data = mesh.shape["data"]
    padded = round_up_batch(batch, n_data)
    sampler = make_sharded_sampler(bundle, mesh, padded, L)
    pos, rot = sampler(
        jax.random.key(seed), bundle.params,
        jnp.asarray(single), jnp.asarray(pair),
    )
    return {
        "pos": np.asarray(pos)[:batch],
        "node_orientations": np.asarray(rot)[:batch],
    }
