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


def _cli_args(ckpt_dir, tmp_path, *extra):
    """Minimal valid finetune CLI arg list on the tiny checkpoint."""
    full = pd.read_csv(ASSETS / "reference_h" / "GRB2_SH3_high_confidence.csv")
    csv = tmp_path / "grb2_small.csv"
    full.head(2).to_csv(csv, index=False)
    return [
        "--csv_path", str(csv),
        "--csv_path_val", str(csv),
        "--sequence_col", "seq",
        "--h_stars_cols", "f_dg_pred",
        "--h_stars_from_dg",
        "--ckpt_path", str(ckpt_dir / "checkpoint.ckpt"),
        "--h_func_ref_path", str(ASSETS / "structures" / "2vwf_trimmed_SH3.pdb"),
        "--num_steps", "8",
        "--batch_size", "4",
        "--num_epochs", "1",
        "--output_dir", str(tmp_path / "out"),
        "--cache_embeds_dir", str(tmp_path / "embeds"),
        "--embeds_backend", "dummy",
        *extra,
    ]


def test_finetune_cli_reference_format_h_func_yaml(ckpt_dir, tmp_path):
    """The reference's own h_func yamls (full bioemu.shortcuts target +
    cache_embeds_dir, config/h_func/folding_stability.yaml) load: the
    embeds-cache key is an embeds-layer concern, not a constructor kwarg."""
    h_yaml = tmp_path / "h.yaml"
    h_yaml.write_text(
        "_target_: bioemu.shortcuts.FoldingStability\n"
        "k: -24.0\nd_0: 0.4\ntol: 1.0e-07\n"
        "cache_embeds_dir: ~/.cache/bioemu/embeds\n"
    )
    finetune_cli.main(
        _cli_args(ckpt_dir, tmp_path, "--h_func_config_path", str(h_yaml))
    )
    assert (tmp_path / "out" / "finetune_model.npz").exists()


@pytest.mark.parametrize(
    "body,msg",
    [
        ("k: -24.0\n", "missing _target_"),
        ("_target_: my.custom.MyHFunc\n", "unknown _target_"),
        (
            "_target_: bioemu.shortcuts.FoldingStability\nkk: -24.0\n",
            "unknown kwargs",
        ),
    ],
)
def test_finetune_cli_bad_h_func_yaml_errors(ckpt_dir, tmp_path, body, msg):
    h_yaml = tmp_path / "h.yaml"
    h_yaml.write_text(body)
    with pytest.raises(SystemExit, match=msg):
        finetune_cli.main(
            _cli_args(ckpt_dir, tmp_path, "--h_func_config_path", str(h_yaml))
        )


def test_finetune_cli_rejects_sampling_denoiser_config(ckpt_dir, tmp_path):
    """--denoiser_config_path must name a path *recorder*; a plain sampling
    denoiser (config/denoiser/dpm.yaml) fails fast, not deep inside jit."""
    cfg_dir = Path(__file__).parent.parent / "se3diff_tpu" / "config"
    with pytest.raises(SystemExit, match="_finetune"):
        finetune_cli.main(_cli_args(
            ckpt_dir, tmp_path,
            "--denoiser_config_path", str(cfg_dir / "denoiser" / "dpm.yaml"),
        ))


def test_finetune_cli_finetune_config_typo_errors(ckpt_dir, tmp_path):
    """Unknown hyperparameter keys error instead of silently training with
    defaults; the reference yaml's _target_/num_workers keys stay accepted."""
    bad = tmp_path / "ft_bad.yaml"
    bad.write_text("num_epoch: 20\n")  # typo for num_epochs
    with pytest.raises(SystemExit, match="num_epoch"):
        finetune_cli.main(_cli_args(
            ckpt_dir, tmp_path, "--finetune_config_path", str(bad),
        ))

    ref_style = tmp_path / "ft_ref.yaml"
    ref_style.write_text(
        "_target_: bioemu.shortcuts.FinetuneConfig\n"
        "num_workers: 0\nbatch_size: 4\nnum_epochs: 1\n"
    )
    finetune_cli.main(_cli_args(
        ckpt_dir, tmp_path, "--finetune_config_path", str(ref_style),
    ))
    assert (tmp_path / "out" / "finetune_model.npz").exists()


def test_finetune_cli_debug_dump_dir(ckpt_dir, tmp_path):
    """--debug_dump_dir: each training pass refreshes the endpoint batch as
    npz + topology.pdb + samples.xtc (reference finetune.py:419-448, where
    the dump is unconditional into a hardcoded ddr_debug/)."""
    dump = tmp_path / "dump"
    finetune_cli.main(
        _cli_args(ckpt_dir, tmp_path, "--debug_dump_dir", str(dump))
    )
    assert (dump / "topology.pdb").exists()
    assert (dump / "samples.xtc").exists() or (dump / "samples.pdb").exists()
    npzs = list(dump.glob("batch_*.npz"))
    assert len(npzs) == 1
    with np.load(npzs[0]) as d:
        assert d["pos"].shape[0] == 4  # batch_size from _cli_args
        assert d["node_orientations"].shape[-2:] == (3, 3)
        assert str(d["sequence"])


def test_finetune_cli_explicit_model_config_wins(ckpt_dir, tmp_path, monkeypatch):
    """--model_name + explicit --model_config_path: the user's config is not
    clobbered by the hub's config.yaml."""
    import se3diff_tpu.ppft.trainer as trainer_mod
    from se3diff_tpu.sampling import bundle as bd

    def fake_download(model_name=None, **kw):
        return str(ckpt_dir / "checkpoint.ckpt"), "/hub/config.yaml"

    seen = {}
    real_load = trainer_mod.load_finetune_bundle

    def spy_load(**kw):
        seen.update(kw)
        return real_load(**kw)

    monkeypatch.setattr(bd, "maybe_download_checkpoint", fake_download)
    monkeypatch.setattr(trainer_mod, "load_finetune_bundle", spy_load)

    args = _cli_args(ckpt_dir, tmp_path)
    i = args.index("--ckpt_path")
    del args[i:i + 2]  # force the --model_name path
    finetune_cli.main(args + [
        "--model_name", "bioemu-v1.0",
        "--model_config_path", str(ckpt_dir / "config.yaml"),
    ])
    assert seen["model_config_path"] == str(ckpt_dir / "config.yaml")
