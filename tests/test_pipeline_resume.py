"""Sampling pipeline resumability (sample.py:285-308 semantics).

Re-running with the same output_dir continues from existing batch files;
seeds are batch start indices, so interruption points don't change results.
"""

from pathlib import Path

import numpy as np
import pytest

from se3diff_tpu.sampling.bundle import random_bundle
from se3diff_tpu.sampling.pipeline import (
    batch_size_heuristic,
    count_samples_in_output_dir,
    format_npz_samples_filename,
    sample,
)

SEQ = "GYDPETGTWG"


@pytest.fixture(scope="module")
def bundle():
    return random_bundle(
        model_cfg=dict(num_layers=1, dim_model=16, dim_pair=8, num_heads=2,
                       dim_hidden=16, dropout=0.0),
        so3_kwargs=dict(num_sigma=24, num_omega=128, l_max=100),
        denoiser="dpm_fast",
        length=len(SEQ),
    )


def test_filename_and_count_roundtrip(tmp_path):
    assert format_npz_samples_filename(0, 5) == "batch_0000000_0000005.npz"
    np.savez(tmp_path / format_npz_samples_filename(0, 5), x=1)
    np.savez(tmp_path / format_npz_samples_filename(5, 3), x=1)
    assert count_samples_in_output_dir(tmp_path) == 8


def test_batch_size_heuristic():
    assert batch_size_heuristic(10, 100) == 10
    assert batch_size_heuristic(10, 200) == 2
    assert batch_size_heuristic(10, 1000) == 1  # floor


def test_resume_continues_and_reproduces(bundle, tmp_path, monkeypatch):
    out = tmp_path / "run"
    kwargs = dict(
        sequence=SEQ, bundle=bundle, batch_size_100=0,  # floor -> batch 1
        cache_embeds_dir=tmp_path / "embeds", embeds_backend="dummy",
        filter_samples=False, output_dir=out,
    )
    sample(num_samples=2, **kwargs)
    files_first = sorted(p.name for p in out.glob("batch_*.npz"))
    assert files_first == [
        "batch_0000000_0000001.npz", "batch_0000001_0000002.npz",
    ]
    data_first = {f: np.load(out / f)["pos"] for f in files_first}

    # Extend to 3 samples: old batches untouched, one new batch appears.
    mtimes = {f: (out / f).stat().st_mtime_ns for f in files_first}
    sample(num_samples=3, **kwargs)
    files_second = sorted(p.name for p in out.glob("batch_*.npz"))
    assert files_second == files_first + ["batch_0000002_0000003.npz"]
    for f in files_first:
        assert (out / f).stat().st_mtime_ns == mtimes[f]

    # Reproducibility: a fresh run of the same range gives identical batches
    # (seed = batch start index).
    out2 = tmp_path / "run2"
    kwargs2 = dict(kwargs)
    kwargs2["output_dir"] = out2
    sample(num_samples=2, **kwargs2)
    for f in files_first:
        np.testing.assert_array_equal(np.load(out2 / f)["pos"], data_first[f])

    # Asking for fewer than existing is a no-op.
    sample(num_samples=1, **kwargs)
    assert sorted(p.name for p in out.glob("batch_*.npz")) == files_second


def test_conditioning_staged_once_per_run(bundle, tmp_path, monkeypatch):
    """The batch-invariant [L, L, 128] conditioning must be device-staged
    ONCE per sample() run, not per batch — a per-batch `jnp.asarray(pair)`
    is a 134 MB host-cliff copy + H2D transfer at L=512 and was the
    round-4 long-L end-to-end collapse (13.6% of device-only;
    docs/PERF.md)."""
    from se3diff_tpu.sampling import pipeline

    calls = {"n": 0}
    orig = pipeline.stage_conditioning

    def counting(*a, **kw):
        calls["n"] += 1
        return orig(*a, **kw)

    monkeypatch.setattr(pipeline, "stage_conditioning", counting)
    sample(
        sequence=SEQ, num_samples=4, output_dir=tmp_path / "o",
        bundle=bundle, batch_size=2, embeds_backend="dummy",
        cache_embeds_dir=tmp_path / "emb", filter_samples=False,
    )
    assert calls["n"] == 1  # 2 batches, one staging


def test_length_bucketing_shares_compilation(bundle):
    """Bucketed sampling pads + masks; output shape is the true length and
    two different lengths in a bucket share one jitted sampler."""
    from se3diff_tpu.sampling.pipeline import generate_batch, round_to_bucket

    assert round_to_bucket(10, 16) == 16
    assert round_to_bucket(16, 16) == 16

    rng = np.random.default_rng(0)
    bundle._samplers.clear()
    for L in (10, 13):
        single = rng.standard_normal((L, 384)).astype(np.float32) * 0.3
        pair = rng.standard_normal((L, L, 128)).astype(np.float32) * 0.1
        out = generate_batch(
            bundle, single, pair, seed=0, batch_size=2, length_bucket=16
        )
        assert out["pos"].shape == (2, L, 3)
        assert np.all(np.isfinite(out["pos"]))
    # Both lengths hit the same (batch=2, Lp=16) compilation.
    assert list(bundle._samplers) == [(2, 16)]

def test_big_conditioning_stages_mmap_and_pads_on_device():
    """The long-L fixed-cost rule (docs/artifacts/bench_r5_longL.json):
    `load_embeds` hands back a no-copy mmap (eager np.load + astype of
    the 512 MB L=1024 pair file costs ~23 s in >32 MB host-cliff
    allocations) and `stage_conditioning` uploads it in ONE bulk
    jnp.asarray — slab-chunked device_puts are a measured on-chip
    negative — padding on device rather than via a full-size np.pad
    host copy. Staging a big mmap'd tensor must be bit-identical to
    staging the eager array."""
    from se3diff_tpu.sampling import pipeline

    rng = np.random.default_rng(7)
    L = 200  # pair: 200*200*128*4 = 20.5 MB, above the cliff at L>=420
    single = rng.standard_normal((L, 384)).astype(np.float32)
    pair = rng.standard_normal((L, L, 128)).astype(np.float32)

    staged = pipeline.stage_conditioning(single, pair)[1]
    np.testing.assert_array_equal(np.asarray(staged), pair)

    # Bucketed: padding happens on device (np.pad would be another
    # full-size host copy) — and from an mmap source, like production.
    import tempfile

    mm_path = Path(tempfile.mkdtemp()) / "pair.npy"
    np.save(mm_path, pair)
    pair_mm = np.load(mm_path, mmap_mode="r")
    s_d, p_d, m_d, true_len = pipeline.stage_conditioning(
        single, pair_mm, length_bucket=256
    )
    assert true_len == L and p_d.shape == (256, 256, 128)
    np.testing.assert_array_equal(np.asarray(p_d)[:L, :L], pair)
    assert not np.asarray(p_d)[L:].any()
    assert np.asarray(m_d).sum() == L


def test_load_embeds_returns_mmap(tmp_path):
    from se3diff_tpu.sampling.embeds import load_embeds

    rng = np.random.default_rng(3)
    single = rng.standard_normal((8, 384)).astype(np.float32)
    pair = rng.standard_normal((8, 8, 128)).astype(np.float32)
    sf, pf = tmp_path / "s.npy", tmp_path / "p.npy"
    np.save(sf, single)
    np.save(pf, pair)
    s2, p2 = load_embeds(sf, pf)
    assert isinstance(p2, np.memmap)  # no-copy load for f32 files
    np.testing.assert_array_equal(np.asarray(p2), pair)
    np.testing.assert_array_equal(np.asarray(s2), single)
