"""PPFT trainer: end-to-end fine-tuning on a tiny synthetic problem."""

from functools import partial
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from se3diff_tpu.diffusion import denoise
from se3diff_tpu.ppft import trainer as tr
from se3diff_tpu.sampling.bundle import random_bundle

L = 6
SEQ = "GYDPET"  # length 6


def mean_pos_h(pos: jax.Array, sequence: str) -> jax.Array:
    """Toy differentiable observable: sigmoid of mean coordinate, [B, 1]."""
    del sequence
    return jax.nn.sigmoid(jnp.mean(pos, axis=(-1, -2)))[:, None]


@pytest.fixture(scope="module")
def bundle() -> tr.FinetuneBundle:
    base = random_bundle(
        model_cfg=dict(num_layers=1, dim_model=16, dim_pair=8, num_heads=2,
                       dim_hidden=16, dropout=0.0),
        so3_kwargs=dict(num_sigma=24, num_omega=128, l_max=100),
        length=L,
        seed=0,
    )
    ft_model = type(base.model)(
        num_layers=1, dim_model=8, dim_pair=8, num_heads=2, dim_hidden=8,
        dropout=0.0,
    )
    ft_params = ft_model.init(
        jax.random.key(1),
        jnp.zeros((1, L, 3)),
        jnp.broadcast_to(jnp.eye(3), (1, L, 3, 3)),
        jnp.zeros((1,)),
        jnp.zeros((1, L, 384)),
        jnp.zeros((1, L, L, 128)),
    )
    denoiser = partial(denoise.euler_maruyama_finetune, num_steps=8)
    return tr.FinetuneBundle(
        base=base,
        finetune_model=ft_model,
        finetune_params=ft_params,
        denoiser=denoiser,
        h_func=mean_pos_h,
    )


@pytest.fixture(scope="module")
def embeds(rng_module=np.random.default_rng(3)):
    single = rng_module.standard_normal((L, 384)).astype(np.float32) * 0.3
    pair = rng_module.standard_normal((L, L, 128)).astype(np.float32) * 0.1
    return single, pair


class TestPathAndGrads:
    def test_path_shapes(self, bundle, embeds):
        single, pair = embeds
        path = tr.generate_finetune_batch(
            jax.random.key(0), bundle, bundle.finetune_params, single, pair, 4
        )
        assert path.pos_path.shape == (9, 4, L, 3)
        assert path.rot_path.shape == (9, 4, L, 3, 3)
        assert path.us["pos"].shape == (8, 4, L, 3)
        assert path.dWs["node_orientations"].shape == (8, 4, L, 3)

    def test_grads_finite_and_nonzero(self, bundle, embeds):
        single, pair = embeds
        path = tr.generate_finetune_batch(
            jax.random.key(0), bundle, bundle.finetune_params, single, pair, 4
        )
        hs = bundle.h_func(path.pos_path[-1], SEQ)
        grad_fn, val_fn = tr.make_finetune_step_fns(bundle, lambda_=0.1)
        grads, loss = grad_fn(
            bundle.finetune_params, path,
            jnp.asarray(single), jnp.asarray(pair),
            hs, jnp.asarray([0.9], jnp.float32),
        )
        assert np.isfinite(float(loss))
        leaves = jax.tree.leaves(grads)
        assert all(np.all(np.isfinite(np.asarray(g))) for g in leaves)
        total = sum(float(jnp.sum(jnp.abs(g))) for g in leaves)
        assert total > 0.0

    def test_val_loss_matches_direct_formula(self, bundle, embeds):
        """ws=1 validation loss = plain EV + lambda*KL from recorded us."""
        from se3diff_tpu.ppft.losses import compute_ev_loss, compute_kl_loss

        single, pair = embeds
        path = tr.generate_finetune_batch(
            jax.random.key(2), bundle, bundle.finetune_params, single, pair, 4
        )
        hs = bundle.h_func(path.pos_path[-1], SEQ)
        h_stars = jnp.asarray([0.9], jnp.float32)
        _, val_fn = tr.make_finetune_step_fns(bundle, lambda_=0.5)
        got = float(val_fn(path, hs, h_stars))

        dts = jnp.diff(path.timesteps)
        int_sg = tr._int_uudt_from_us(path.us, dts)
        ws = jnp.ones_like(int_sg)
        expected = float(
            compute_ev_loss(ws=ws, hs=hs, h_stars=h_stars,
                            from_int_dws=False, use_stab=False)
            + 0.5 * compute_kl_loss(ws=ws, int_u_u_dt=int_sg, int_u_u_dt_sg=int_sg,
                                    from_int_dws=False, use_rloo=False)
        )
        assert got == pytest.approx(expected, rel=1e-6)


class TestFinetuneLoop:
    def test_end_to_end(self, bundle, tmp_path, monkeypatch):
        # Route embeddings through the dummy backend into a temp cache.
        csv = tmp_path / "train.csv"
        csv.write_text("seq,h0\n" + f"{SEQ},0.8\n{SEQ},0.8\n")
        out = tmp_path / "out"

        cfg = tr.FinetuneConfig(
            batch_size=4, num_epochs=1, save_every_n_epochs=1,
            val_every_n_epochs=1, lambda_=0.01,
        )
        params0 = bundle.finetune_params
        best = tr.finetune(
            csv_path=csv, csv_path_val=csv, sequence_col="seq",
            h_stars_cols="h0", bundle=bundle, config=cfg,
            output_dir=out, cache_embeds_dir=tmp_path / "embeds",
            embeds_backend="dummy", seed=0,
        )
        assert (out / "finetune_model.npz").exists()
        assert (out / "finetune_model_0.npz").exists()
        assert (out / "finetune_model_1.npz").exists()
        # Params must have moved.
        diff = sum(
            float(jnp.sum(jnp.abs(a - b)))
            for a, b in zip(jax.tree.leaves(params0), jax.tree.leaves(best))
        )
        # (best may equal init if epoch-0 val was better, but the saved
        # epoch-1 checkpoint must differ from epoch 0.)
        ck0 = tr.load_finetune_params(out / "finetune_model_0.npz")
        ck1 = tr.load_finetune_params(out / "finetune_model_1.npz")
        diff01 = sum(
            float(jnp.sum(jnp.abs(jnp.asarray(a) - jnp.asarray(b))))
            for a, b in zip(jax.tree.leaves(ck0), jax.tree.leaves(ck1))
        )
        assert diff01 > 0.0
        # The loop records its full trajectory for post-hoc inspection.
        import json

        hist = json.loads((out / "history.json").read_text())
        assert hist["train"][0]["epoch"] == 1
        assert [v["epoch"] for v in hist["val"]] == [0, 1]
        assert hist["best_epoch"] in (0, 1)
        assert hist["train"][0]["skipped_updates"] == 0

    def test_kl_guard_skips_degenerate_updates(self, bundle, tmp_path):
        """kl_guard is a trust region on the recorded-path KL: with an
        always-binding threshold every update is skipped, the epoch-1
        checkpoint equals epoch 0, and history records the skips. (The
        recorded KL cost is >= 0, so a negative guard always binds.)"""
        import json

        csv = tmp_path / "train.csv"
        csv.write_text("seq,h0\n" + f"{SEQ},0.8\n{SEQ},0.8\n")
        out = tmp_path / "out_guard"
        cfg = tr.FinetuneConfig(
            batch_size=4, num_epochs=1, save_every_n_epochs=1,
            val_every_n_epochs=1, lambda_=0.01, kl_guard=-1.0,
        )
        tr.finetune(
            csv_path=csv, csv_path_val=csv, sequence_col="seq",
            h_stars_cols="h0", bundle=bundle, config=cfg,
            output_dir=out, cache_embeds_dir=tmp_path / "embeds",
            embeds_backend="dummy", seed=0,
        )
        hist = json.loads((out / "history.json").read_text())
        assert hist["train"][0]["skipped_updates"] == 2
        ck0 = tr.load_finetune_params(out / "finetune_model_0.npz")
        ck1 = tr.load_finetune_params(out / "finetune_model_1.npz")
        for a, b in zip(jax.tree.leaves(ck0), jax.tree.leaves(ck1)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_dataset_batches(self, tmp_path):
        csv = tmp_path / "d.csv"
        csv.write_text("seq,a,b\nAAA,0.1,0.2\nCCC,0.3,0.4\nDDD,0.5,0.6\n")
        ds = tr.SequenceHStarsDataset(csv, "seq", ["a", "b"])
        assert len(ds) == 3
        seq, h = ds[1]
        assert seq == "CCC" and h.shape == (2,)
        batches = list(ds.batches(2, shuffle=False))
        assert [len(b) for b in batches] == [2, 1]
        with pytest.raises(ValueError):
            tr.SequenceHStarsDataset(csv, "seq", ["missing"])


class TestDPMFinetunePath:
    """The sde_dpm_solver_finetune path (empty stub in the reference,
    denoiser.py:767-777) drives the replay gradient like the others."""

    def test_dpm_path_grads_finite_and_nonzero(self, bundle, embeds):
        single, pair = embeds
        dpm_bundle = bundle._replace(
            denoiser=partial(denoise.sde_dpm_solver_finetune, num_steps=8)
        )
        path = tr.generate_finetune_batch(
            jax.random.key(5), dpm_bundle, dpm_bundle.finetune_params,
            single, pair, 4,
        )
        assert path.pos_path.shape == (9, 4, L, 3)
        assert np.all(np.isfinite(np.asarray(path.dWs["pos"])))
        hs = dpm_bundle.h_func(path.pos_path[-1], SEQ)
        grad_fn, _ = tr.make_finetune_step_fns(dpm_bundle, lambda_=0.1)
        grads, loss = grad_fn(
            dpm_bundle.finetune_params, path,
            jnp.asarray(single), jnp.asarray(pair),
            hs, jnp.asarray([0.9], jnp.float32),
        )
        assert np.isfinite(float(loss))
        leaves = jax.tree.leaves(grads)
        assert all(np.all(np.isfinite(np.asarray(g))) for g in leaves)
        assert sum(float(jnp.sum(jnp.abs(g))) for g in leaves) > 0.0

    def test_registry_exposes_dpm_finetune(self):
        assert "sde_dpm_solver_finetune" in tr.FINETUNE_DENOISERS
        cfg = tr.FINETUNE_DENOISERS["sde_dpm_solver_finetune"]
        assert cfg["fn"] is denoise.sde_dpm_solver_finetune
