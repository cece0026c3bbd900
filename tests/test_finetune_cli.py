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
