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
import time
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
from se3diff_tpu.struct.atoms import atom37_from_frames, atom37_mask
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


def stage_conditioning(
    single: np.ndarray,
    pair: np.ndarray,
    length_bucket: int | None = None,
) -> tuple[jax.Array, jax.Array, jax.Array | None, int]:
    """Pad (if bucketed) and device-stage the per-sequence conditioning ONCE.

    The conditioning is batch-invariant, but it is also the only big H2D
    payload in the sampling loop: ``pair`` is [L, L, 128] f32 — 5 MB at
    L=100 but **134 MB at L=512** — and a per-batch ``jnp.asarray`` of a
    host array pays both the >32 MB host-memory-cliff copy and the tunnel
    transfer every batch. That per-batch re-upload was the round-4 long-L
    end-to-end collapse (L=512 e2e at 13.6% of device-only,
    docs/artifacts/bench_r4_queue.json): ~3.5 s/batch of host tail against
    0.56 s of device work. Staging once per `sample()` call makes the
    steady-state H2D just the RNG key.

    Upload spelling (measured, round 5): ONE bulk ``jnp.asarray`` of the
    mmap that `load_embeds` returns. Slab-chunked ``jax.device_put``
    uploads (32x 16 MB at L=1024) are a measured NEGATIVE over the axon
    tunnel — the L=1024 e2e cell dropped 4,983 -> 3,436 structures/hr,
    ~25 s/run of per-device_put overhead against the host-cliff copy it
    avoids (`docs/artifacts/bench_r5_longL.json`). The bulk upload of a
    memmap also skips the eager-load cliff: jnp.asarray(memmap) costs
    ~0.07 s host-side at 512 MB vs ~12 s for an eager np.load + astype.

    Returns ``(single_d, pair_d, mask_d_or_None, true_len)``.
    """
    L = single.shape[0]
    single_d = jnp.asarray(single)
    pair_d = jnp.asarray(pair)
    if length_bucket:
        Lp = round_to_bucket(L, length_bucket)
        pad = Lp - L
        # Pad on device: np.pad would materialize a full padded host copy
        # (another >32 MB cliff allocation at long L).
        single_d = jnp.pad(single_d, ((0, pad), (0, 0)))
        pair_d = jnp.pad(pair_d, ((0, pad), (0, pad), (0, 0)))
        mask = np.zeros(Lp, bool)
        mask[:L] = True
        return single_d, pair_d, jnp.asarray(mask), L
    return single_d, pair_d, None, L


def _dispatch_batch(
    bundle: Bundle,
    single_d: jax.Array,
    pair_d: jax.Array,
    mask_d: jax.Array | None,
    true_len: int,
    seed: int,
    batch_size: int,
) -> tuple[jax.Array, jax.Array]:
    """Dispatch one denoise batch on pre-staged conditioning WITHOUT
    materializing to host. JAX dispatch is asynchronous: the returned
    device arrays are futures, so the caller can overlap host work (npz
    writes, conversion of the previous batch) with this batch's device
    time and only pay the transfer when it calls ``np.asarray``."""
    run = bundle.sampler(batch_size, single_d.shape[0])
    if mask_d is not None:
        pos, rot = run(
            jax.random.key(seed), bundle.params, single_d, pair_d, mask_d
        )
        return pos[:, :true_len], rot[:, :true_len]
    pos, rot = run(jax.random.key(seed), bundle.params, single_d, pair_d)
    return pos, rot


def generate_batch_async(
    bundle: Bundle,
    single: np.ndarray,
    pair: np.ndarray,
    seed: int,
    batch_size: int,
    length_bucket: int | None = None,
) -> tuple[jax.Array, jax.Array]:
    """One-shot stage + dispatch (see `stage_conditioning` /
    `_dispatch_batch`). Loop callers should stage once and dispatch per
    batch instead — staging here repeats the big pair upload per call."""
    single_d, pair_d, mask_d, L = stage_conditioning(
        single, pair, length_bucket
    )
    return _dispatch_batch(
        bundle, single_d, pair_d, mask_d, L, seed, batch_size
    )


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
    batch_size: int | None = None,
) -> Path:
    """Sample a conformational ensemble for ``sequence`` (sample.py:241-327).

    Resumable: re-running with the same output_dir continues from existing
    batch files (seed = start index, so results are reproducible regardless
    of interruption points). ``batch_size`` overrides the quadratic
    ``batch_size_100`` heuristic with an exact per-batch count (benchmarks
    and memory-tuned runs; the heuristic cannot express every (B, L)).
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

    if batch_size is None:
        batch_size = batch_size_heuristic(batch_size_100, L)
    elif batch_size < 1:
        raise ValueError(f"batch_size must be >= 1, got {batch_size}")

    existing = count_samples_in_output_dir(out)
    if existing >= num_samples:
        logger.info("Found %d samples >= requested %d; skipping.", existing, num_samples)

    aatype = sequence_to_aatype(seq)
    mask = atom37_mask(aatype)  # host-only; no device sync
    aatype_j = jnp.asarray(aatype)
    a37 = jax.jit(atom37_from_frames)

    # Resume case: convert any pre-existing batch files first so frame order
    # in the trajectory stays batch order.
    kept_chunks: list[np.ndarray] = []
    total = 0
    for f in sorted(out.glob("batch_*.npz")):
        total += _append_npz_chunk(
            kept_chunks, f, seq, a37, aatype_j, mask, filter_samples
        )

    # Double-buffered batch loop: batch N's full device chain (denoise ->
    # atom37 -> physicality filter) is dispatched asynchronously, then the
    # host finalizes batch N-1 (transfer, npz write, select + center) while
    # the accelerator works on N. Only the LAST batch's host tail is serial.
    starts = list(range(existing, num_samples, batch_size))
    # Stage the (batch-invariant) conditioning on device ONCE: the [L,L,128]
    # pair tensor is the loop's only big H2D payload (134 MB at L=512) and
    # re-uploading it per batch was the long-L end-to-end collapse.
    t0 = time.perf_counter()
    single_d, pair_d, mask_d, true_len = stage_conditioning(
        single, pair, length_bucket
    )
    jax.block_until_ready(pair_d)
    t_stage = time.perf_counter()
    pending: tuple | None = None
    for start in starts:
        n = min(batch_size, num_samples - start)
        logger.info("Sampling batch %d..%d", start, start + n)
        pos_d, rot_d = _dispatch_batch(
            bundle, single_d, pair_d, mask_d, true_len, seed=start,
            batch_size=n,
        )
        atom37_d, _ = a37(pos_d, rot_d, aatype_j)
        keep_d = (
            filter_unphysical_masks_device(atom37_d, mask)
            if filter_samples else None
        )
        if pending is not None:
            total += _finalize_batch(out, seq, mask, kept_chunks, *pending)
        pending = (start, n, pos_d, rot_d, atom37_d, keep_d)
    if pending is not None:
        total += _finalize_batch(out, seq, mask, kept_chunks, *pending)

    t_loop = time.perf_counter()
    result = _write_ensemble(
        out, seq, aatype, mask, kept_chunks, total, filter_samples
    )
    # Wall breakdown for long-L roofline accounting (bench.py --e2e reads
    # this at debug level): staging is the per-run O(L^2) upload, the loop
    # is device time + any unoverlapped host tail, write is serial.
    logger.debug(
        "wall breakdown: stage=%.2fs loop=%.2fs write=%.2fs",
        t_stage - t0, t_loop - t_stage, time.perf_counter() - t_loop,
    )
    return result


def _finalize_batch(
    out: Path, seq: str, mask: np.ndarray, kept_chunks: list,
    start: int, n: int, pos_d, rot_d, atom37_d, keep_d,
) -> int:
    """Host tail for one sampled batch: npz write + kept-frame centering."""
    np.savez(
        out / format_npz_samples_filename(start, n),
        sequence=seq, pos=np.asarray(pos_d), node_orientations=np.asarray(rot_d),
    )
    atom37 = np.asarray(atom37_d)
    chunk = atom37[np.asarray(keep_d)] if keep_d is not None else atom37
    _append_centered(kept_chunks, chunk, mask)
    return n


def _append_centered(kept_chunks: list, chunk: np.ndarray, mask: np.ndarray) -> None:
    if not len(chunk):
        return
    # Center each frame (convert_chemgraph.py:430-436).
    flat_mask = mask.reshape(-1).astype(bool)
    coords = chunk.reshape(len(chunk), -1, 3)
    center = coords[:, flat_mask].mean(axis=1, keepdims=True)
    kept_chunks.append((coords - center).reshape(chunk.shape))


def _append_npz_chunk(
    kept_chunks: list, path: Path, sequence: str, a37, aatype_j,
    mask: np.ndarray, filter_samples: bool,
) -> int:
    """Convert one saved batch file -> centered kept frames; returns its
    frame count."""
    with np.load(path) as data:
        assert str(data["sequence"]) == sequence, "sequence mismatch in batches"
        pos = jnp.asarray(data["pos"])  # [m, L, 3] nm
        rot = jnp.asarray(data["node_orientations"])
    atom37_d, _ = a37(pos, rot, aatype_j)
    if filter_samples:
        keep = np.asarray(filter_unphysical_masks_device(atom37_d, mask))
        chunk = np.asarray(atom37_d)[keep]
    else:
        chunk = np.asarray(atom37_d)
    _append_centered(kept_chunks, chunk, mask)
    return pos.shape[0]


def _write_ensemble(
    output_dir: Path, sequence: str, aatype: np.ndarray, mask: np.ndarray,
    kept_chunks: list, total: int, filter_samples: bool,
) -> Path:
    """Centered kept frames -> topology.pdb + samples.xtc (or .pdb)."""
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


def write_structure_outputs(
    output_dir: Path, sequence: str, filter_samples: bool = True
) -> Path:
    """All batch npz files -> topology.pdb + trajectory
    (sample.py:310-327, convert_chemgraph.py:398-458).

    Processes one batch file at a time: frames->atom37 and the physicality
    filter run jitted on the accelerator per chunk, and only kept frames
    transfer to host. Chunking keeps every host working set small — fresh
    numpy allocations beyond ~32 MB page-fault at ~0.1 GB/s on some hosts,
    so one [M, L, 37, 3] concatenation can cost more than the sampling.
    ``sample`` does this conversion inline, overlapped with the device; this
    standalone entry point re-derives outputs from saved batches."""
    output_dir = Path(output_dir)
    aatype = sequence_to_aatype(sequence)
    mask = atom37_mask(aatype)
    a37 = jax.jit(atom37_from_frames)
    aatype_j = jnp.asarray(aatype)
    kept_chunks: list[np.ndarray] = []  # centered [m, N, 37, 3] per file
    total = 0
    for f in sorted(output_dir.glob("batch_*.npz")):
        total += _append_npz_chunk(
            kept_chunks, f, sequence, a37, aatype_j, mask, filter_samples
        )
    return _write_ensemble(
        output_dir, sequence, aatype, mask, kept_chunks, total, filter_samples
    )
