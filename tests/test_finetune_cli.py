"""Finetune CLI end-to-end on the real GRB2-SH3 mutant CSV (BASELINE config
3 analogue): tiny checkpoint, dummy embeddings, sigmoid(-dg) targets from
`assets/reference_h/GRB2_SH3_high_confidence.csv`, FoldingStability h with
the vendored 2vwf_trimmed_SH3.pdb reference."""

from pathlib import Path

import numpy as np
import pandas as pd
import pytest

import se3diff_tpu.finetune as finetune_cli
from tests.test_bundle import ckpt_dir  # fixture: tiny torch checkpoint

ASSETS = Path(__file__).parent.parent / "assets"


def test_finetune_cli_on_grb2_csv(ckpt_dir, tmp_path):
    full = pd.read_csv(ASSETS / "reference_h" / "GRB2_SH3_high_confidence.csv")
    small = full.head(2)
    csv = tmp_path / "grb2_small.csv"
    small.to_csv(csv, index=False)
    assert small.seq.str.len().nunique() == 1  # same-length mutants

    out = tmp_path / "out"
    finetune_cli.main([
        "--csv_path", str(csv),
        "--csv_path_val", str(csv),
        "--sequence_col", "seq",
        "--h_stars_cols", "f_dg_pred",
        "--h_stars_from_dg",
        "--ckpt_path", str(ckpt_dir / "checkpoint.ckpt"),
        "--denoiser_type", "euler_maruyama_finetune",
        "--h_func", "folding_stability",
        "--h_func_ref_path", str(ASSETS / "structures" / "2vwf_trimmed_SH3.pdb"),
        "--num_steps", "8",
        "--batch_size", "4",
        "--num_epochs", "1",
        "--output_dir", str(out),
        "--cache_embeds_dir", str(tmp_path / "embeds"),
        "--embeds_backend", "dummy",
    ])
    assert (out / "finetune_model.npz").exists()
    with np.load(out / "finetune_model.npz") as d:
        assert any("fc_out" in k for k in d.files)


def test_finetune_cli_with_user_msa_file(ckpt_dir, tmp_path, monkeypatch):
    """--msa_file: every mutant in the CSV reuses the wild-type A3M (query
    row swapped per sequence) instead of querying an MSA server
    (finetune.py:299-322); colabfold itself is mocked."""
    from tests.test_embeds import _write_a3m, install_fake_colabfold

    full = pd.read_csv(ASSETS / "reference_h" / "GRB2_SH3_high_confidence.csv")
    small = full.head(2)
    csv = tmp_path / "grb2_small.csv"
    small.to_csv(csv, index=False)

    wt_seq = small.seq.iloc[0]
    wt_msa = tmp_path / "wildtype.a3m"
    _write_a3m(wt_msa, wt_seq, [("hit1", wt_seq)])

    calls = install_fake_colabfold(monkeypatch)

    out = tmp_path / "out"
    finetune_cli.main([
        "--csv_path", str(csv),
        "--csv_path_val", str(csv),
        "--sequence_col", "seq",
        "--h_stars_cols", "f_dg_pred",
        "--h_stars_from_dg",
        "--ckpt_path", str(ckpt_dir / "checkpoint.ckpt"),
        "--denoiser_type", "euler_maruyama_finetune",
        "--h_func", "folding_stability",
        "--h_func_ref_path", str(ASSETS / "structures" / "2vwf_trimmed_SH3.pdb"),
        "--num_steps", "8",
        "--batch_size", "4",
        "--num_epochs", "1",
        "--output_dir", str(out),
        "--cache_embeds_dir", str(tmp_path / "embeds"),
        "--embeds_backend", "colabfold",
        "--msa_file", str(wt_msa),
    ])
    assert (out / "finetune_model.npz").exists()
    # one colabfold run per distinct sequence, all fed the a3m (no server)
    seqs = set(small.seq)
    assert len(calls) == len(seqs)
    assert all(c["input_file"].endswith(".a3m") for c in calls)
    assert all(c["msa_host_url"] is None for c in calls)


def test_finetune_cli_config_yamls(ckpt_dir, tmp_path):
    """Reference-parity config plumbing (finetune.py:696-736): hyperparams
    from --finetune_config_path, the denoiser from --denoiser_config_path
    (the dpm path recorder), and the h-func from --h_func_config_path."""
    cfg_dir = Path(__file__).parent.parent / "se3diff_tpu" / "config"
    full = pd.read_csv(ASSETS / "reference_h" / "GRB2_SH3_high_confidence.csv")
    small = full.head(2)
    csv = tmp_path / "grb2_small.csv"
    small.to_csv(csv, index=False)

    ft_yaml = tmp_path / "ft.yaml"
    ft_yaml.write_text("batch_size: 4\nnum_epochs: 1\nlambda_: 0.1\n")

    out = tmp_path / "out"
    finetune_cli.main([
        "--csv_path", str(csv),
        "--csv_path_val", str(csv),
        "--sequence_col", "seq",
        "--h_stars_cols", "f_dg_pred",
        "--h_stars_from_dg",
        "--ckpt_path", str(ckpt_dir / "checkpoint.ckpt"),
        "--finetune_config_path", str(ft_yaml),
        "--denoiser_config_path", str(cfg_dir / "denoiser" / "sde_dpm_finetune.yaml"),
        "--h_func_config_path", str(cfg_dir / "h_func" / "folding_stability.yaml"),
        "--h_func_ref_path", str(ASSETS / "structures" / "2vwf_trimmed_SH3.pdb"),
        "--num_steps", "8",
        "--output_dir", str(out),
        "--cache_embeds_dir", str(tmp_path / "embeds"),
        "--embeds_backend", "dummy",
    ])
    assert (out / "finetune_model.npz").exists()
