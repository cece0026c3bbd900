"""End-to-end CLI chain: sample a benchmark sequence -> evaluate the output.

Mirrors the reference's subprocess CLI test strategy (SURVEY.md section 4.2)
in-process: `se3diff_tpu.sample` writes topology.pdb + samples.xtc for a real
ood60 test-case sequence (random-init model, dummy embeddings), then
`se3diff_tpu.benchmarks eval` indexes and scores them.
"""

import json

import numpy as np
import pytest

from se3diff_tpu.benchmarks.core import Benchmark


@pytest.fixture(scope="module")
def sampled_dir(tmp_path_factory):
    import se3diff_tpu.sample as sample_cli
    from se3diff_tpu.sampling import bundle as bd

    md = Benchmark.MULTICONF_OOD60.metadata
    seq = md.loc[md.test_case == "Q2FYI5"].sequence.iloc[0]  # L = 70

    out = tmp_path_factory.mktemp("chain")
    # Route the CLI's no-checkpoint path through a deterministic tiny bundle.
    tiny = bd.random_bundle(
        model_cfg=dict(num_layers=1, dim_model=16, dim_pair=8, num_heads=2,
                       dim_hidden=16, dropout=0.0),
        so3_kwargs=dict(num_sigma=24, num_omega=128, l_max=100),
        denoiser="dpm_fast",
    )
    orig = bd.random_bundle
    bd.random_bundle = lambda **kw: tiny
    try:
        sample_cli.main([
            "--sequence", seq,
            "--num_samples", "4",
            "--output_dir", str(out / "samples" / "Q2FYI5"),
            "--embeds_backend", "dummy",
            "--cache_embeds_dir", str(out / "embeds"),
            "--batch_size_100", "400",
            "--no-filter_samples",
        ])
    finally:
        bd.random_bundle = orig
    return out


def test_sample_then_eval(sampled_dir):
    from se3diff_tpu.benchmarks.cli import main as bench_cli

    results = sampled_dir / "results"
    bench_cli([
        "eval", str(sampled_dir / "samples"),
        "--benchmarks", "multiconf_ood60",
        "--output_dir", str(results),
        "--skip_filtering",
        "--no_plots",
    ])
    with open(results / "benchmark_metrics.json") as f:
        agg = json.load(f)
    assert "multiconf_ood60" in agg
    k = agg["multiconf_ood60"]
    # Random-model samples score, but badly: k-recall RMSD finite and large.
    rmsd_key = [key for key in k if "rmsd" in key][0]
    assert np.isfinite(k[rmsd_key])
    assert (results / "multiconf_ood60" / "summary.json").exists()
    npz = np.load(results / "multiconf_ood60" / "multiconf_results.npz")
    per = [key for key in npz.files if key.startswith("per_system_Q2FYI5")]
    assert per


def test_observables_example(sampled_dir, tmp_path, monkeypatch):
    """The observations.ipynb-mirror example: reads a real sampled npz dir
    (rejecting length-mismatched systems with a clear message) and renders
    its histogram figure in demo mode."""
    import runpy
    import sys

    example = __file__.rsplit("/tests/", 1)[0] + "/examples/analyze_observables.py"
    # Q2FYI5 samples are L=70; GRB2-SH3 observables need L=56 -> clear error.
    sample_npz_dir = str(sampled_dir / "samples" / "Q2FYI5")
    monkeypatch.setattr(sys, "argv", ["x", sample_npz_dir])
    with pytest.raises(SystemExit, match="70 residues"):
        runpy.run_path(example, run_name="__main__")

    out_demo = tmp_path / "demo.png"
    monkeypatch.setattr(sys, "argv", ["x", "--demo", "--out", str(out_demo)])
    runpy.run_path(example, run_name="__main__")
    assert out_demo.stat().st_size > 0

    # PSD95-PDZ3 variant (observations_pdz3.ipynb): same pipeline keyed on
    # the 1be9 reference.
    out_pdz3 = tmp_path / "pdz3.png"
    monkeypatch.setattr(
        sys, "argv", ["x", "--demo", "--system", "pdz3", "--out", str(out_pdz3)]
    )
    runpy.run_path(example, run_name="__main__")
    assert out_pdz3.stat().st_size > 0


def test_md_projection_example(tmp_path, monkeypatch):
    """The observations_md.ipynb-mirror example: projects the vendored
    md_emulation fixture trajectory onto the benchmark's free-energy
    landscape and writes the comparison plots."""
    import runpy
    import sys

    example = __file__.rsplit("/tests/", 1)[0] + "/examples/analyze_md_projection.py"
    out = tmp_path / "mdscatter.png"
    monkeypatch.setattr(
        sys, "argv", ["x", "--out", str(out), "--n_resample", "5000"]
    )
    monkeypatch.chdir(tmp_path)
    runpy.run_path(example, run_name="__main__")
    # The FES comparison plots land next to --out.
    assert (tmp_path / "projections.png").stat().st_size > 0
    assert (tmp_path / "metrics.png").stat().st_size > 0


def test_train_from_scratch_example(tmp_path, monkeypatch):
    """The from-scratch training example: a few DSM steps + EM sampling
    run end-to-end (full convergence is the example's own 500-step run)."""
    import runpy
    import sys

    example = __file__.rsplit("/tests/", 1)[0] + "/examples/train_from_scratch.py"
    monkeypatch.setattr(
        sys, "argv",
        ["x", "--steps", "2", "--ckpt_dir", str(tmp_path / "ckpt")],
    )
    runpy.run_path(example, run_name="__main__")
    assert (tmp_path / "ckpt").exists()


def test_train_from_scratch_example_on_real_ensemble(tmp_path, monkeypatch):
    """--trajectory/--topology: the example trains on a real PDB+XTC
    ensemble through training/data.py."""
    import runpy
    import sys

    example = __file__.rsplit("/tests/", 1)[0] + "/examples/train_from_scratch.py"
    fix = __file__.rsplit("/tests/", 1)[0] + (
        "/tests/test_data/samples_example/md_emulation/cath1_1bl0A02"
    )
    monkeypatch.setattr(
        sys, "argv",
        ["x", "--steps", "2", "--batch_size", "2",
         "--trajectory", fix + ".xtc", "--topology", fix + ".pdb",
         "--ckpt_dir", str(tmp_path / "ckpt")],
    )
    runpy.run_path(example, run_name="__main__")
    assert (tmp_path / "ckpt").exists()


def test_sample_cli_sequence_parallel(tmp_path):
    """--sp N shards the pair activation over N devices from the CLI (the
    long-protein escape hatch, docs/SCALING.md); outputs stay finite."""
    import se3diff_tpu.sample as sample_cli

    # Tiny torch checkpoint in the reference on-disk format.
    import torch

    from tests.test_bundle import TINY_CONFIG

    ckpt = tmp_path / "ckpt"
    ckpt.mkdir()
    with np.load("tests/test_data/golden_dig/state_dict.npz") as sd:
        torch.save(
            {k: torch.from_numpy(np.asarray(sd[k])) for k in sd},
            ckpt / "checkpoint.ckpt",
        )
    (ckpt / "config.yaml").write_text(TINY_CONFIG)

    out = tmp_path / "out"
    sample_cli.main([
        "--sequence", "GYDPETGTWG",
        "--num_samples", "2",
        "--output_dir", str(out),
        "--ckpt_path", str(ckpt / "checkpoint.ckpt"),
        "--denoiser", "dpm_fast",
        "--embeds_backend", "dummy",
        "--cache_embeds_dir", str(tmp_path / "embeds"),
        "--batch_size_100", "2",
        "--no-filter_samples",
        "--sp", "4",
    ])
    npzs = list(out.glob("batch_*.npz"))
    assert npzs
    with np.load(npzs[0]) as d:
        assert np.isfinite(d["pos"]).all()
