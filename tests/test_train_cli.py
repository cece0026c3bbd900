"""`python -m se3diff_tpu.train`: the from-scratch/continued training entry
point (beyond-reference; the reference ships no trainer for its production
model). Covers multi-system training, exact resume, the npz export, and the
export round-tripping into the sample CLI."""

from pathlib import Path

import numpy as np

import se3diff_tpu.train as train_cli

FIX = Path(__file__).parent / "test_data" / "samples_example"

TINY_MODEL_YAML = """
score_model:
  _target_: bioemu.shortcuts.DiGConditionalScoreModel
  dim_hidden: 16
  dim_model: 16
  dim_pair: 8
  dropout: 0.0
  num_heads: 2
  num_layers: 1
sdes:
  node_orientations:
    _target_: bioemu.shortcuts.DiGSO3SDE
    eps_t: 0.001
    l_max: 100
    num_omega: 128
    num_sigma: 24
    sigma_max: 1.65
    sigma_min: 0.02
    tol: 1.0e-07
  pos:
    _target_: bioemu.shortcuts.CosineVPSDE
    s: 0.008
"""


def _args(tmp_path, *extra):
    cfg = tmp_path / "model.yaml"
    if not cfg.exists():
        cfg.write_text(TINY_MODEL_YAML)
    md = FIX / "md_emulation" / "cath1_1bl0A02"
    ffe = FIX / "folding_free_energies" / "test_1TG0"
    return [
        "--trajectory", str(md.with_suffix(".xtc")),
        "--topology", str(md.with_suffix(".pdb")),
        "--trajectory", str(ffe.with_suffix(".xtc")),
        "--topology", str(ffe.with_suffix(".pdb")),
        "--batch_size", "2",
        "--min_t", "0.15",  # tiny tables: l_max*sigma >> 3 needs t >= 0.15
        "--log_every", "1",
        "--model_config_path", str(cfg),
        "--cache_embeds_dir", str(tmp_path / "embeds"),
        *extra,
    ]


def test_train_cli_multi_system_resume_and_export(tmp_path):
    ckpt = tmp_path / "ckpt"
    train_cli.main(_args(
        tmp_path, "--steps", "4", "--ckpt_dir", str(ckpt), "--ckpt_every", "2",
    ))
    assert (ckpt / "params.npz").exists()
    assert (ckpt / "4").exists()  # orbax step dir
    with np.load(ckpt / "params.npz") as sd:
        # torch state-dict key layout (models/convert.py)
        assert any(k.startswith("model_nn.") for k in sd.files)
        first = {k: sd[k].copy() for k in list(sd.files)[:3]}

    # Re-run with more steps: resumes from step 4 (orbax restore) and the
    # exported params change.
    train_cli.main(_args(
        tmp_path, "--steps", "6", "--ckpt_dir", str(ckpt), "--ckpt_every", "2",
    ))
    with np.load(ckpt / "params.npz") as sd:
        changed = any(
            not np.array_equal(first[k], sd[k]) for k in first
        )
    assert changed


def test_train_export_roundtrips_into_sample_cli(tmp_path):
    from se3diff_tpu.sample import main as sample_main

    ckpt = tmp_path / "ckpt"
    train_cli.main(_args(
        tmp_path, "--steps", "2", "--ckpt_dir", str(ckpt),
    ))
    # The export ships a sibling config.yaml, so the sample CLI needs only
    # --ckpt_path (load_bundle's default config resolution).
    assert (ckpt / "config.yaml").exists()
    out = tmp_path / "samples"
    sample_main([
        "--sequence", "GYDPETGTWG",
        "--num_samples", "2",
        "--output_dir", str(out),
        "--ckpt_path", str(ckpt / "params.npz"),
        "--embeds_backend", "dummy",
        "--cache_embeds_dir", str(tmp_path / "embeds"),
        "--batch_size_100", "2",
        "--denoiser", "dpm_fast",
        "--no-filter_samples",
    ])
    assert list(out.glob("batch_*.npz"))


def test_generated_config_roundtrips_through_instantiate(tmp_path):
    """The no---model_config_path branch exports `_default_config_yaml`;
    every float in it must round-trip through YAML 1.1 back into a float
    (the '1e-07'-as-string regression: a bare f-string print of tol crashed
    the table build downstream). Uses a tiny model/SDE pair so the check
    runs in the fast tier — the coverage target is the YAML writer, which
    is size-independent."""
    import jax.numpy as jnp
    import yaml

    from se3diff_tpu.diffusion.denoise import SDEs
    from se3diff_tpu.models.dig import DiGConditionalScoreModel
    from se3diff_tpu.sampling.bundle import instantiate
    from se3diff_tpu.sde.so3_sde import DiGSO3SDE
    from se3diff_tpu.sde.vpsde import CosineVPSDE

    model = DiGConditionalScoreModel(
        dim_hidden=16, dim_model=16, dim_pair=8, dropout=0.0,
        num_heads=2, num_layers=1,
    )
    sdes = SDEs(
        pos=CosineVPSDE(),
        node_orientations=DiGSO3SDE(
            l_max=100, num_omega=128, num_sigma=8,
            sigma_min=0.02, sigma_max=1.65, tol=1e-7, eps_t=1e-3,
            cache_dir=str(tmp_path / "so3"),
        ),
    )
    text = train_cli._default_config_yaml(model, sdes)
    cfg = yaml.safe_load(text)
    # The historical failure shape: tol/eps_t serialized as '1e-07' strings.
    assert isinstance(cfg["sdes"]["node_orientations"]["tol"], float)
    assert isinstance(cfg["sdes"]["node_orientations"]["eps_t"], float)
    m2 = instantiate(cfg["score_model"], dtype=jnp.float32)
    assert (m2.dim_model, m2.num_heads) == (16, 2)
    so3 = instantiate(
        cfg["sdes"]["node_orientations"], cache_dir=str(tmp_path / "so3")
    )
    assert float(so3.tol) == 1e-7
    instantiate(cfg["sdes"]["pos"])


def test_quoted_numeric_looking_strings_survive_instantiate():
    """_NUMERIC_STR must only catch the dot-less scientific forms YAML 1.1
    mis-parses ('1e-07'); dotted forms ('1.5e3') parse as floats upstream,
    so a string still holding one at instantiate() time was quoted on
    purpose and must not be coerced."""
    from se3diff_tpu.sampling.bundle import _NUMERIC_STR

    assert _NUMERIC_STR.fullmatch("1e-07")
    assert _NUMERIC_STR.fullmatch("+3E5")
    assert not _NUMERIC_STR.fullmatch("1.5e3")
    assert not _NUMERIC_STR.fullmatch("1.e3")
    assert not _NUMERIC_STR.fullmatch(".5e3")
    assert not _NUMERIC_STR.fullmatch("v1e5x")


def test_train_cli_warm_start(tmp_path):
    ckpt = tmp_path / "ckpt"
    train_cli.main(_args(tmp_path, "--steps", "2", "--ckpt_dir", str(ckpt)))
    ckpt2 = tmp_path / "ckpt2"
    train_cli.main(_args(
        tmp_path, "--steps", "2", "--ckpt_dir", str(ckpt2),
        "--init_ckpt_path", str(ckpt / "params.npz"),
    ))
    assert (ckpt2 / "params.npz").exists()
