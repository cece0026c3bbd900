"""Evoformer embedding providers: cache + pluggable backends.

Counterpart of `bioemu/src/bioemu/get_embeds.py`: embeddings for a sequence
are cached under sha256(seq)-keyed npy files
(``{sha}_single.npy [L, 384]``, ``{sha}_pair.npy [L, L, 128]``) and computed
on cache miss by a backend. Backends:

* ``colabfold`` — shells out to a patched ``colabfold_batch`` exactly like
  the reference (get_embeds.py:138-174); requires a ColabFold install
  (``SE3DIFF_COLABFOLD_DIR`` or ``BIOEMU_COLABFOLD_DIR``). ColabFold is
  itself JAX, so on TPU hosts it runs natively.
* ``dummy`` — deterministic pseudo-random embeddings derived from the
  sequence hash; used for tests and benchmarks where a ColabFold install is
  unavailable (mirrors the reference's mocked-subprocess test strategy,
  tests/test_embeds.py).

The provider returns file paths (like the reference) so callers can mmap.
"""

from __future__ import annotations

import hashlib
import logging
import os
import shutil
import subprocess
import tempfile
from pathlib import Path

import numpy as np

from se3diff_tpu.sampling.seq_io import StrPath, write_fasta

logger = logging.getLogger(__name__)

SINGLE_DIM = 384
PAIR_DIM = 128


def shahexencode(s: str) -> str:
    return hashlib.sha256(s.encode()).hexdigest()


def default_embeds_dir() -> str:
    return os.environ.get(
        "SE3DIFF_EMBEDS_CACHE",
        os.path.join(os.path.expanduser("~"), ".se3diff_embeds_cache"),
    )


def _colabfold_bin_dir() -> str:
    colabfold_dir = os.environ.get(
        "SE3DIFF_COLABFOLD_DIR",
        os.environ.get(
            "BIOEMU_COLABFOLD_DIR",
            os.path.join(os.path.expanduser("~"), ".se3diff_colabfold"),
        ),
    )
    return os.path.join(colabfold_dir, "bin")


def run_colabfold(
    input_file: StrPath, res_dir: StrPath, env: dict[str, str], msa_host_url: str | None = None
) -> subprocess.CompletedProcess:
    """Invoke ``colabfold_batch`` with the evoformer-representation flags
    (get_embeds.py:140-174)."""
    assert str(input_file).endswith((".fasta", ".a3m"))
    cmd = [
        "colabfold_batch",
        str(input_file),
        str(res_dir),
        "--num-models", "1",
        "--model-order", "3",
        "--model-type", "alphafold2",
        "--num-recycle", "0",
        "--save-single-representations",
        "--save-pair-representations",
    ]
    if msa_host_url is not None:
        cmd.extend(["--host-url", msa_host_url])
    return subprocess.run(cmd, env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)


def _compute_colabfold(seq: str, out_single: Path, out_pair: Path, msa_host_url=None) -> None:
    """Cache-miss path shelling out to ColabFold (get_embeds.py:177-266)."""
    seqsha = shahexencode(seq)
    env = os.environ.copy()
    env["PATH"] = f"{_colabfold_bin_dir()}:{env['PATH']}"
    env.pop("MPLBACKEND", None)
    with tempfile.TemporaryDirectory() as tempdir:
        fasta_file = os.path.join(tempdir, f"{seqsha}.fasta")
        res_dir = os.path.join(tempdir, "results")
        os.makedirs(res_dir, exist_ok=True)
        write_fasta([seq], fasta_file)
        res = run_colabfold(fasta_file, res_dir, env, msa_host_url)
        if res.returncode != 0:
            raise RuntimeError(
                f"{res.stdout.decode()}\nFailed to run colabfold_batch due to the above error."
            )
        prefix = f"{seqsha}__unknown_description_"
        suffix = "evo_rank_001_alphafold2_model_3_seed_000.npy"
        shutil.copy(os.path.join(res_dir, f"{prefix}_single_repr_{suffix}"), out_single)
        shutil.copy(os.path.join(res_dir, f"{prefix}_pair_repr_{suffix}"), out_pair)


def _compute_dummy(seq: str, out_single: Path, out_pair: Path) -> None:
    """Deterministic stand-in embeddings keyed by the sequence hash."""
    seed = int.from_bytes(hashlib.sha256(seq.encode()).digest()[:8], "little")
    rng = np.random.default_rng(seed)
    L = len(seq)
    np.save(out_single, rng.standard_normal((L, SINGLE_DIM)).astype(np.float32) * 0.5)
    np.save(out_pair, rng.standard_normal((L, L, PAIR_DIM)).astype(np.float32) * 0.2)


def get_embeds(
    seq: str,
    cache_embeds_dir: StrPath | None = None,
    backend: str = "colabfold",
    msa_host_url: str | None = None,
) -> tuple[str, str]:
    """Return paths to cached (single, pair) embedding npy files for ``seq``.

    Cache layout and naming match the reference (get_embeds.py:197-210) so
    existing BioEmu embedding caches can be pointed at directly.
    """
    seqsha = shahexencode(seq)
    cache_dir = Path(os.path.expanduser(str(cache_embeds_dir or default_embeds_dir())))
    cache_dir.mkdir(parents=True, exist_ok=True)
    single_file = cache_dir / f"{seqsha}_single.npy"
    pair_file = cache_dir / f"{seqsha}_pair.npy"

    if single_file.exists() and pair_file.exists():
        logger.info("Using cached embeddings in %s", cache_dir)
        return str(single_file), str(pair_file)

    if backend == "colabfold":
        _compute_colabfold(seq, single_file, pair_file, msa_host_url)
    elif backend == "dummy":
        _compute_dummy(seq, single_file, pair_file)
    else:
        raise ValueError(f"unknown embeds backend {backend!r}")
    return str(single_file), str(pair_file)


def load_embeds(single_file: StrPath, pair_file: StrPath) -> tuple[np.ndarray, np.ndarray]:
    """Load and shape-check embedding arrays."""
    single = np.load(single_file).astype(np.float32)
    pair = np.load(pair_file).astype(np.float32)
    L = single.shape[0]
    assert single.shape == (L, SINGLE_DIM), single.shape
    assert pair.shape == (L, L, PAIR_DIM), pair.shape
    return single, pair
