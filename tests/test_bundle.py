"""Bundle loading: reference-format config.yaml + torch checkpoint -> sampler."""

import textwrap

import jax
import numpy as np
import pytest

from se3diff_tpu.sampling import bundle as bd

TINY_CONFIG = textwrap.dedent(
    """
    score_model:
      _target_: bioemu.shortcuts.DiGConditionalScoreModel
      dim_hidden: 2
      dim_model: 4
      dim_pair: 2
      dim_single_rep: 2
      dropout: 0.1
      max_distance_relative: 128
      num_buckets: 4
      num_heads: 1
      num_layers: 1
    finetune_model:
      _target_: bioemu.shortcuts.DiGConditionalScoreModel
      dim_hidden: 2
      dim_model: 4
      dim_pair: 2
      dim_single_rep: 2
      dropout: 0.1
      max_distance_relative: 128
      num_buckets: 4
      num_heads: 1
      num_layers: 1
    sdes:
      node_orientations:
        _target_: bioemu.shortcuts.DiGSO3SDE
        eps_t: 0.001
        l_max: 100
        num_omega: 128
        num_sigma: 32
        omega_exponent: 3
        sigma_max: 1.65
        sigma_min: 0.02
        tol: 1.0e-07
      pos:
        _target_: bioemu.shortcuts.CosineVPSDE
        s: 0.008
    """
)


@pytest.fixture(scope="module")
def ckpt_dir(tmp_path_factory):
    """Torch checkpoint in the reference's on-disk format, built from the
    golden tiny state dict."""
    import torch

    d = tmp_path_factory.mktemp("ckpt")
    with np.load("tests/test_data/golden_dig/state_dict.npz") as sd:
        torch.save(
            {k: torch.from_numpy(np.asarray(sd[k])) for k in sd},
            d / "checkpoint.ckpt",
        )
    (d / "config.yaml").write_text(TINY_CONFIG)
    return d


class TestLoadBundle:
    def test_load_and_sample(self, ckpt_dir):
        b = bd.load_bundle(ckpt_dir / "checkpoint.ckpt", denoiser="dpm_fast")
        assert b.model.dim_model == 4 and b.model.num_heads == 1
        L = 6
        rng = np.random.default_rng(0)
        single = rng.standard_normal((L, 384)).astype(np.float32)
        pair = rng.standard_normal((L, L, 128)).astype(np.float32)
        from se3diff_tpu.sampling.pipeline import generate_batch

        out = generate_batch(b, single, pair, seed=0, batch_size=3)
        assert out["pos"].shape == (3, L, 3)
        assert np.all(np.isfinite(out["pos"]))
        # Rotations stay orthonormal through the whole reverse SDE.
        rot = out["node_orientations"]
        eye = np.einsum("blij,blkj->blik", rot, rot)
        np.testing.assert_allclose(
            eye, np.broadcast_to(np.eye(3), eye.shape), atol=1e-4
        )

    def test_use_pallas_threads_to_model(self, ckpt_dir):
        """The runtime use_pallas choice reaches the model without being
        part of the reference config format (sample CLI --use_pallas)."""
        b = bd.load_bundle(
            ckpt_dir / "checkpoint.ckpt", denoiser="dpm_fast",
            use_pallas="auto",
        )
        assert b.model.use_pallas == "auto"
        assert bd.load_bundle(
            ckpt_dir / "checkpoint.ckpt", denoiser="dpm_fast"
        ).model.use_pallas is False

    def test_denoiser_from_reference_yaml(self, ckpt_dir):
        dn = bd.make_denoiser(
            {
                "_target_": "bioemu.shortcuts.heun_denoiser",
                "_partial_": True,
                "num_steps": 7,
                "max_t": 0.99,
                "min_t": 0.001,
                "noise": 0.5,
            }
        )
        import functools

        assert isinstance(dn, functools.partial)
        assert dn.keywords["num_steps"] == 7

    def test_unknown_target_raises(self):
        with pytest.raises(KeyError, match="unknown _target_"):
            bd.instantiate({"_target_": "bioemu.shortcuts.NoSuchThing"})

    def test_finetune_bundle_loads(self, ckpt_dir):
        from se3diff_tpu.ppft.trainer import load_finetune_bundle

        fb = load_finetune_bundle(
            ckpt_dir / "checkpoint.ckpt",
            denoiser_type="euler_maruyama_finetune",
            h_func="folding_stability",
        )
        assert fb.finetune_model.dim_model == 4
        n_leaves = len(jax.tree.leaves(fb.finetune_params))
        assert n_leaves > 10


def test_all_denoiser_configs_instantiate():
    """Every shipped config/denoiser yaml resolves through make_denoiser
    (regression: sde_dpm_finetune.yaml shipped without a registry entry)."""
    from pathlib import Path

    import yaml

    from se3diff_tpu.sampling.bundle import make_denoiser

    cfg_dir = (
        Path(__file__).parent.parent / "se3diff_tpu" / "config" / "denoiser"
    )
    yamls = sorted(cfg_dir.glob("*.yaml"))
    assert yamls
    for y in yamls:
        with open(y) as f:
            dn = make_denoiser(yaml.safe_load(f))
        assert callable(dn), y


def test_sample_cli_model_name_fetch(tmp_path, monkeypatch):
    """--model_name routes through maybe_download_checkpoint (reference
    sample.py:331-358); mocked hub download lands on load_bundle."""
    import se3diff_tpu.sample as sample_cli
    from se3diff_tpu.sampling import bundle as bd

    calls = {}

    def fake_download(model_name=None, **kw):
        calls["model_name"] = model_name
        # Serve the tiny reference-format checkpoint.
        import torch

        d = tmp_path / "hub"
        d.mkdir(exist_ok=True)
        with np.load("tests/test_data/golden_dig/state_dict.npz") as sd:
            torch.save(
                {k: torch.from_numpy(np.asarray(sd[k])) for k in sd},
                d / "checkpoint.ckpt",
            )
        (d / "config.yaml").write_text(TINY_CONFIG)
        return str(d / "checkpoint.ckpt"), str(d / "config.yaml")

    monkeypatch.setattr(
        sample_cli, "maybe_download_checkpoint", fake_download, raising=False
    )
    monkeypatch.setattr(bd, "maybe_download_checkpoint", fake_download)
    out = tmp_path / "out"
    sample_cli.main([
        "--sequence", "GYDPETGTWG",
        "--num_samples", "2",
        "--output_dir", str(out),
        "--model_name", "bioemu-v1.0",
        "--denoiser", "dpm_fast",
        "--embeds_backend", "dummy",
        "--cache_embeds_dir", str(tmp_path / "embeds"),
        "--batch_size_100", "2",
        "--no-filter_samples",
    ])
    assert calls["model_name"] == "bioemu-v1.0"
    assert list(out.glob("batch_*.npz"))


def test_sample_cli_explicit_model_config_wins(ckpt_dir, tmp_path, monkeypatch):
    """--model_name + explicit --model_config_path: the hub's config.yaml
    must not clobber the user's config."""
    import se3diff_tpu.sample as sample_cli
    from se3diff_tpu.sampling import bundle as bd_mod

    def fake_download(model_name=None, **kw):
        return str(ckpt_dir / "checkpoint.ckpt"), "/hub/config.yaml"

    seen = {}
    real_load = sample_cli.load_bundle

    def spy_load(ckpt_path, **kw):
        seen.update(kw)
        return real_load(ckpt_path, **kw)

    monkeypatch.setattr(bd_mod, "maybe_download_checkpoint", fake_download)
    monkeypatch.setattr(sample_cli, "load_bundle", spy_load)

    out = tmp_path / "out"
    sample_cli.main([
        "--sequence", "GYDPETGTWG",
        "--num_samples", "2",
        "--output_dir", str(out),
        "--model_name", "bioemu-v1.0",
        "--model_config_path", str(ckpt_dir / "config.yaml"),
        "--denoiser", "dpm_fast",
        "--embeds_backend", "dummy",
        "--cache_embeds_dir", str(tmp_path / "embeds"),
        "--batch_size_100", "2",
        "--no-filter_samples",
    ])
    assert seen["config_path"] == str(ckpt_dir / "config.yaml")
    assert list(out.glob("batch_*.npz"))
