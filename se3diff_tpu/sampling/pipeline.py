"""End-to-end sampling pipeline: sequence -> conformational ensemble files.

Counterpart of `bioemu/src/bioemu/sample.py`. Orchestration (host side):

1. parse/validate sequence, fetch Evoformer embeddings (cached),
2. pick a batch size with the quadratic memory heuristic
   ``batch_size_100 * (100/L)^2`` (sample.py:279),
3. run resumable batches: existing ``batch_{start:07d}_{end:07d}.npz`` files
   are counted and sampling continues from there with seed = start index
   (sample.py:285-308),
4. denoise each batch with a single jitted ``lax.scan`` on the accelerator,
5. concatenate, convert frames -> backbone atom37, filter unphysical frames,
   and write ``topology.pdb`` + ``samples.xtc`` (+ multi-model
   ``samples.pdb`` fallback when the native XTC codec is unavailable).
"""

from __future__ import annotations

import logging
from dataclasses import dataclass, field
from functools import partial
from pathlib import Path
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from se3diff_tpu.diffusion import denoise
from se3diff_tpu.sampling.bundle import Bundle
from se3diff_tpu.sampling.embeds import get_embeds, load_embeds
from se3diff_tpu.sampling.seq_io import check_protein_valid, parse_sequence
from se3diff_tpu.struct.atoms import atom37_from_frames
from se3diff_tpu.struct.pdb import Structure, write_pdb
from se3diff_tpu.struct.physics import filter_unphysical_masks_device
from se3diff_tpu.struct.residues import sequence_to_aatype

logger = logging.getLogger(__name__)

def format_npz_samples_filename(start_id: int, num_samples: int) -> str:
    """``batch_{start:07d}_{end:07d}.npz`` (utils.py:13-16)."""
    return f"batch_{start_id:07d}_{start_id + num_samples:07d}.npz"


def count_samples_in_output_dir(output_dir: Path) -> int:
    """Total samples across existing batch files (utils.py:19-28)."""
    return sum(
        int(pair[1]) - int(pair[0])
        for p in Path(output_dir).glob("batch_*.npz")
        for pair in [p.stem.split("_")[1:]]
    )


def batch_size_heuristic(batch_size_100: int, seq_len: int) -> int:
    """Quadratic memory heuristic with a floor of 1 (sample.py:279-282)."""
    batch = int(batch_size_100 * (100 / seq_len) ** 2)
    if batch == 0:
        logger.warning(
            "Sequence length %d is very large; using batch_size=1.", seq_len
        )
        batch = 1
    return batch


def round_to_bucket(length: int, bucket: int) -> int:
    """Smallest multiple of ``bucket`` >= length."""
    return -(-length // bucket) * bucket


def generate_batch(
    bundle: Bundle,
    single: np.ndarray,
    pair: np.ndarray,
    seed: int,
    batch_size: int,
    length_bucket: int | None = None,
) -> dict[str, np.ndarray]:
    """Denoise one batch; returns ``{"pos" [B, L, 3], "node_orientations"
    [B, L, 3, 3]}`` (sample.py:186-238). The whole batch is one jitted scan;
    conditioning is broadcast inside the model fn.

    ``length_bucket`` pads L up to a bucket multiple with attention-masked
    padding so different-length sequences share compilations (the reference,
    being eager, has no compile cost to amortize; on TPU this is the lever
    that keeps multi-system sweeps from recompiling per length).
    """
    pos, rot = generate_batch_async(
        bundle, single, pair, seed, batch_size, length_bucket
    )
    return {
        "pos": np.asarray(pos),
        "node_orientations": np.asarray(rot),
    }


def generate_batch_async(
    bundle: Bundle,
    single: np.ndarray,
    pair: np.ndarray,
    seed: int,
    batch_size: int,
    length_bucket: int | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Dispatch one denoise batch WITHOUT materializing to host.

    JAX dispatch is asynchronous: the returned device arrays are futures,
    so the caller can overlap host work (npz writes, conversion of the
    previous batch) with this batch's device time and only pay the
    transfer when it calls ``np.asarray``.
    """
    L = single.shape[0]
    if length_bucket:
        Lp = round_to_bucket(L, length_bucket)
        pad = Lp - L
        single_p = np.pad(single, ((0, pad), (0, 0)))
        pair_p = np.pad(pair, ((0, pad), (0, pad), (0, 0)))
        mask = np.zeros(Lp, bool)
        mask[:L] = True
        run = bundle.sampler(batch_size, Lp)
        pos, rot = run(
            jax.random.key(seed), bundle.params,
            jnp.asarray(single_p), jnp.asarray(pair_p), jnp.asarray(mask),
        )
        pos, rot = pos[:, :L], rot[:, :L]
    else:
        run = bundle.sampler(batch_size, L)
        pos, rot = run(
            jax.random.key(seed), bundle.params,
            jnp.asarray(single), jnp.asarray(pair),
        )
    return pos, rot


def sample(
    sequence: str,
    num_samples: int,
    output_dir: str,
    bundle: Bundle,
    batch_size_100: int = 10,
    cache_embeds_dir: str | None = None,
    embeds_backend: str = "colabfold",
    msa_file: str | None = None,
    msa_host_url: str | None = None,
    filter_samples: bool = True,
    length_bucket: int | None = None,
) -> Path:
    """Sample a conformational ensemble for ``sequence`` (sample.py:241-327).

    Resumable: re-running with the same output_dir continues from existing
    batch files (seed = start index, so results are reproducible regardless
    of interruption points).
    """
    out = Path(output_dir)
    out.mkdir(parents=True, exist_ok=True)

    seq = parse_sequence(sequence)
    check_protein_valid(seq)
    L = len(seq)

    single_file, pair_file = get_embeds(
        seq, cache_embeds_dir, backend=embeds_backend,
        msa_file=msa_file, msa_host_url=msa_host_url,
    )
    single, pair = load_embeds(single_file, pair_file)

    batch_size = batch_size_heuristic(batch_size_100, L)

    existing = count_samples_in_output_dir(out)
    if existing >= num_samples:
        logger.info("Found %d samples >= requested %d; skipping.", existing, num_samples)

    # Double-buffered batch loop: batch N+1 is dispatched (async) BEFORE
    # batch N's device->host transfer and npz write, so the host tail runs
    # while the accelerator denoises the next batch.
    starts = list(range(existing, num_samples, batch_size))
    pending: tuple[int, int, tuple] | None = None
    for i, start in enumerate(starts):
        n = min(batch_size, num_samples - start)
        logger.info("Sampling batch %d..%d", start, start + n)
        arrays = generate_batch_async(
            bundle, single, pair, seed=start, batch_size=n,
            length_bucket=length_bucket,
        )
        if pending is not None:
            _write_batch_npz(out, seq, *pending)
        pending = (start, n, arrays)
    if pending is not None:
        _write_batch_npz(out, seq, *pending)

    return write_structure_outputs(out, seq, filter_samples=filter_samples)


def _write_batch_npz(out: Path, seq: str, start: int, n: int, arrays: tuple) -> None:
    pos, rot = arrays
    np.savez(
        out / format_npz_samples_filename(start, n),
        sequence=seq, pos=np.asarray(pos), node_orientations=np.asarray(rot),
    )


def write_structure_outputs(
    output_dir: Path, sequence: str, filter_samples: bool = True
) -> Path:
    """All batch npz files -> topology.pdb + trajectory
    (sample.py:310-327, convert_chemgraph.py:398-458).

    Processes one batch file at a time: frames->atom37 and the physicality
    filter run jitted on the accelerator per chunk, and only kept frames
    transfer to host. Chunking keeps every host working set small — fresh
    numpy allocations beyond ~32 MB page-fault at ~0.1 GB/s on some hosts,
    so one [M, L, 37, 3] concatenation can cost more than the sampling."""
    output_dir = Path(output_dir)
    files = sorted(output_dir.glob("batch_*.npz"))

    aatype = sequence_to_aatype(sequence)
    a37 = jax.jit(atom37_from_frames)
    mask = None
    kept_chunks: list[np.ndarray] = []  # centered [m, N, 37, 3] per file
    total = 0
    for f in files:
        with np.load(f) as data:
            assert str(data["sequence"]) == sequence, "sequence mismatch in batches"
            pos = jnp.asarray(data["pos"])  # [m, L, 3] nm
            rot = jnp.asarray(data["node_orientations"])
        total += pos.shape[0]
        atom37_d, mask_d = a37(pos, rot, jnp.asarray(aatype))
        if mask is None:
            mask = np.asarray(mask_d)
        if filter_samples:
            keep_mask = np.asarray(
                filter_unphysical_masks_device(atom37_d, mask)
            )
            chunk = np.asarray(atom37_d[np.where(keep_mask)[0]])
        else:
            chunk = np.asarray(atom37_d)
        if len(chunk):
            # Center each frame (convert_chemgraph.py:430-436).
            flat_mask = mask.reshape(-1).astype(bool)
            coords = chunk.reshape(len(chunk), -1, 3)
            center = coords[:, flat_mask].mean(axis=1, keepdims=True)
            kept_chunks.append((coords - center).reshape(chunk.shape))

    kept = sum(len(c) for c in kept_chunks)
    if filter_samples:
        logger.info("Physicality filter kept %d / %d frames", kept, total)
    if kept == 0:
        raise RuntimeError("all sampled frames were filtered out as unphysical")

    struct_top = Structure(atom37=kept_chunks[0][:1], mask=mask, aatype=aatype)
    write_pdb(struct_top, str(output_dir / "topology.pdb"))

    from se3diff_tpu.struct import xtc

    mask_b = mask.astype(bool)
    traj_coords = np.concatenate(
        [c[:, mask_b] for c in kept_chunks]
    )  # [M, A, 3] Angstrom — A = real atoms only, ~10x below full atom37
    xtc_path = output_dir / "samples.xtc"
    try:
        xtc.write_xtc(str(xtc_path), traj_coords / 10.0)  # nm
        logger.info("Wrote %s", xtc_path)
    except xtc.XTCUnavailableError:
        pdb_path = output_dir / "samples.pdb"
        write_pdb(
            Structure(
                atom37=np.concatenate(kept_chunks), mask=mask, aatype=aatype
            ),
            str(pdb_path),
        )
        logger.warning("native XTC codec unavailable; wrote %s instead", pdb_path)
    return output_dir
