"""Ensemble data pipeline: frames from atoms (inverse of the atom37
builder) and DSM training on a real PDB+XTC ensemble.

The reference has no structure-training data layer (bioemu-v1.0 arrives
pretrained, sample.py:54-105); `training/data.py` is framework-new. The
frame convention under test is the reference's own openfold
``Rigid.from_3_points`` (convert_chemgraph.py:12)."""

from pathlib import Path

import numpy as np
import pytest

from se3diff_tpu.struct.atoms import (
    atom37_from_frames,
    frames_from_atom37,
    frames_from_backbone,
)
from se3diff_tpu.struct.residues import sequence_to_aatype
from se3diff_tpu.training.data import EnsembleDataset

FIXTURE = Path(__file__).parent / "test_data" / "samples_example" / "md_emulation"


class TestFramesFromBackbone:
    def test_round_trip_ideal_geometry(self):
        """frames -> idealized atoms -> frames recovers (pos, rot) exactly
        (GLY included: the inverse uses N/CA/C only)."""
        from se3diff_tpu.ops import so3 as so3_ops

        rng = np.random.default_rng(0)
        B, L = 3, 11
        pos = rng.standard_normal((B, L, 3)).astype(np.float32) * 0.8
        rot = np.asarray(
            so3_ops.rotvec_to_rotmat(
                rng.standard_normal((B, L, 3)).astype(np.float32)
            )
        )
        aatype = sequence_to_aatype("GYDPETGTWGG")  # GLY at both ends
        atom37, _ = atom37_from_frames(pos, rot, aatype)

        pos2, rot2 = frames_from_atom37(np.asarray(atom37))
        np.testing.assert_allclose(pos2, pos, atol=2e-6)
        np.testing.assert_allclose(rot2, rot, atol=2e-5)

    def test_real_backbone_rotations_orthonormal(self):
        """On a real (non-ideal) PDB backbone the frames are proper
        rotations and CA sits at the frame origin."""
        from se3diff_tpu.benchmarks.trajectory import load_reference_pdb

        traj = load_reference_pdb(FIXTURE / "cath1_1bl0A02.pdb")
        pos, rot = frames_from_backbone(
            traj.coords[:, :, 0], traj.coords[:, :, 1], traj.coords[:, :, 2]
        )
        eye = np.einsum("...ij,...kj->...ik", rot, rot)
        np.testing.assert_allclose(
            eye, np.broadcast_to(np.eye(3), eye.shape), atol=1e-5
        )
        assert np.allclose(np.linalg.det(rot), 1.0, atol=1e-5)
        np.testing.assert_allclose(pos * 10.0, traj.coords[:, :, 1], atol=1e-4)

    def test_local_convention_matches_table(self):
        """In the recovered frame, C lands on +x and N in the xy-plane with
        +y — the BACKBONE_LOCAL_POSITIONS convention (residues.py:48)."""
        rng = np.random.default_rng(1)
        ca = rng.standard_normal(3) * 5
        c = ca + np.array([1.2, 0.4, -0.3])
        n = ca + np.array([-0.4, 1.1, 0.9])
        pos, rot = frames_from_backbone(n, ca, c)
        local_c = rot.T @ (c - ca)
        local_n = rot.T @ (n - ca)
        assert local_c[0] > 0 and abs(local_c[1]) < 1e-6 and abs(local_c[2]) < 1e-6
        assert local_n[1] > 0 and abs(local_n[2]) < 1e-6


class TestEnsembleDataset:
    @pytest.fixture(scope="class")
    def ds(self, tmp_path_factory):
        return EnsembleDataset.from_trajectory(
            FIXTURE / "cath1_1bl0A02.xtc",
            FIXTURE / "cath1_1bl0A02.pdb",
            embeds_backend="dummy",
            cache_embeds_dir=tmp_path_factory.mktemp("embeds"),
        )

    def test_shapes_and_centering(self, ds):
        F, R = ds.num_frames, ds.num_residues
        assert F > 4 and R > 10
        assert ds.pos.shape == (F, R, 3)
        assert ds.rot.shape == (F, R, 3, 3)
        assert ds.single.shape[0] == R and ds.pair.shape[:2] == (R, R)
        np.testing.assert_allclose(
            ds.pos.mean(axis=1), 0.0, atol=1e-5
        )
        # nm scale: a folded domain's CA cloud has sub-nm std.
        assert 0.05 < ds.pos.std() < 5.0

    def test_batch_fn_is_deterministic_and_covers_epoch(self, ds):
        fn = ds.batch_fn(batch_size=2, seed=3)
        b0a, b0b = fn(0), fn(0)
        np.testing.assert_array_equal(b0a["pos"], b0b["pos"])
        assert b0a["single"].shape == (2, ds.num_residues, ds.single.shape[1])
        # One epoch enumerates each frame exactly once.
        per_epoch = ds.num_frames // 2
        seen = np.concatenate(
            [fn(k)["pos"][:, 0, 0] for k in range(per_epoch)]
        )
        assert len(np.unique(seen)) == len(seen)

    def test_conditioning_shape_mismatch_raises(self):
        with pytest.raises(ValueError, match="do not match"):
            EnsembleDataset.from_trajectory(
                FIXTURE / "cath1_1bl0A02.pdb",
                single=np.zeros((3, 8), np.float32),
                pair=np.zeros((3, 3, 4), np.float32),
            )

    def test_dsm_training_on_real_ensemble(self, ds):
        """Loss descends when training a tiny score net on the real
        ensemble through the trainer loop."""
        import jax

        from se3diff_tpu.diffusion.denoise import SDEs
        from se3diff_tpu.models.dig import DiGConditionalScoreModel
        from se3diff_tpu.sde.so3_sde import DiGSO3SDE
        from se3diff_tpu.sde.vpsde import CosineVPSDE
        from se3diff_tpu.training.loop import TrainConfig, train_dsm

        model = DiGConditionalScoreModel(
            num_layers=1, dim_model=16, dim_pair=8, num_heads=2,
            dim_hidden=16, dropout=0.0,
        )
        sdes = SDEs(
            pos=CosineVPSDE(),
            node_orientations=DiGSO3SDE(num_sigma=24, num_omega=128, l_max=100),
        )
        fn = ds.batch_fn(batch_size=2, seed=0)
        b0 = fn(0)
        params = model.init(
            jax.random.key(0), b0["pos"][:1], b0["rot"][:1],
            np.ones((1,), np.float32), b0["single"][:1], b0["pair"][:1],
        )

        def model_apply(p, pos, rot, t, single, pair, mask):
            return model.apply(p, pos, rot, t, single, pair, mask)

        # min_t=0.15: the tiny test tables (l_max=100) need l_max*sigma >> 3
        # for a convergent score series; sigma(0.15)=0.041 is the smallest
        # resolvable sigma here. Production tables (l_max=2000) support the
        # reference min_t=0.001.
        cfg = TrainConfig(
            num_steps=30, lr=3e-3, warmup_steps=5, min_t=0.15, log_every=1
        )
        _, losses = train_dsm(sdes, model_apply, params, fn, cfg)
        assert np.mean(losses[-5:]) < np.mean(losses[:5])


class TestMultiEnsembleDataset:
    @pytest.fixture(scope="class")
    def mds(self, tmp_path_factory):
        from se3diff_tpu.training.data import MultiEnsembleDataset

        ffe = FIXTURE.parent / "folding_free_energies"
        return MultiEnsembleDataset.from_trajectories(
            [
                (FIXTURE / "cath1_1bl0A02.xtc", FIXTURE / "cath1_1bl0A02.pdb"),
                (ffe / "test_1TG0.xtc", ffe / "test_1TG0.pdb"),
            ],
            bucket=32,
            embeds_backend="dummy",
            cache_embeds_dir=tmp_path_factory.mktemp("embeds"),
        )

    def test_bucketing_and_masks(self, mds):
        # 60 -> 64 (padded), 64 -> 64 (exact): ONE occupied bucket, so both
        # systems share one compiled train-step shape.
        assert mds.occupied_buckets() == [64]
        b0 = mds.batch(0, np.arange(2))  # cath1: 60 residues, 4 pad rows
        assert b0["pos"].shape == (2, 64, 3)
        assert b0["mask"].sum() == 2 * 60
        # Padded rotations are valid (identity) rotations.
        np.testing.assert_allclose(
            b0["rot"][:, 60:],
            np.broadcast_to(np.eye(3, dtype=np.float32), (2, 4, 3, 3)),
        )
        b1 = mds.batch(1, np.arange(2))  # 1TG0: exact fit
        assert b1["mask"].all() and b1["pos"].shape == (2, 64, 3)

    def test_batch_fn_deterministic_and_mixes_systems(self, mds):
        fn = mds.batch_fn(batch_size=2, seed=1)
        np.testing.assert_array_equal(fn(5)["pos"], fn(5)["pos"])
        # Over a few steps both residue counts (mask sums) appear.
        sums = {int(fn(k)["mask"][0].sum()) for k in range(20)}
        assert sums == {60, 64}

    def test_padded_rows_do_not_leak_into_loss(self, mds):
        """dsm_loss on a padded batch is invariant to the padded rows'
        contents: the model masks attention and the loss masks targets."""
        import jax
        import jax.numpy as jnp

        from se3diff_tpu.diffusion.denoise import SDEs
        from se3diff_tpu.models.dig import DiGConditionalScoreModel
        from se3diff_tpu.sde.so3_sde import DiGSO3SDE
        from se3diff_tpu.sde.vpsde import CosineVPSDE
        from se3diff_tpu.training.dsm import dsm_loss

        model = DiGConditionalScoreModel(
            num_layers=1, dim_model=16, dim_pair=8, num_heads=2,
            dim_hidden=16, dropout=0.0,
        )
        sdes = SDEs(
            pos=CosineVPSDE(),
            node_orientations=DiGSO3SDE(num_sigma=24, num_omega=128, l_max=100),
        )
        batch = {
            k: jnp.asarray(v) for k, v in mds.batch(0, np.arange(2)).items()
        }
        params = model.init(
            jax.random.key(0), batch["pos"][:1], batch["rot"][:1],
            jnp.ones((1,), jnp.float32), batch["single"][:1],
            batch["pair"][:1], batch["mask"][:1],
        )

        def model_apply(p, pos, rot, t, single, pair, mask):
            return model.apply(p, pos, rot, t, single, pair, mask)

        loss_fn = jax.jit(
            lambda b: dsm_loss(
                params, jax.random.key(7), b, sdes, model_apply, min_t=0.15
            )
        )
        loss_a = float(loss_fn(batch))
        messed = dict(batch)
        messed["pos"] = batch["pos"].at[:, 60:].set(37.0)
        rng = np.random.default_rng(0)
        from se3diff_tpu.ops import so3 as so3_ops

        messed["rot"] = batch["rot"].at[:, 60:].set(
            so3_ops.rotvec_to_rotmat(
                jnp.asarray(rng.standard_normal((2, 4, 3)), jnp.float32)
            )
        )
        loss_b = float(loss_fn(messed))
        assert np.isfinite(loss_a)
        assert loss_a == pytest.approx(loss_b, rel=1e-6)

    def test_sharded_training_on_multi_ensemble(self, mds):
        """Real multi-system bucketed batches through the DP+TP-sharded
        trainer loop on the 8-device mesh."""
        import jax

        from se3diff_tpu.diffusion.denoise import SDEs
        from se3diff_tpu.models.dig import DiGConditionalScoreModel
        from se3diff_tpu.parallel.mesh import make_mesh
        from se3diff_tpu.sde.so3_sde import DiGSO3SDE
        from se3diff_tpu.sde.vpsde import CosineVPSDE
        from se3diff_tpu.training.loop import TrainConfig, train_dsm

        model = DiGConditionalScoreModel(
            num_layers=1, dim_model=16, dim_pair=8, num_heads=2,
            dim_hidden=16, dropout=0.0,
        )
        sdes = SDEs(
            pos=CosineVPSDE(),
            node_orientations=DiGSO3SDE(num_sigma=24, num_omega=128, l_max=100),
        )
        fn = mds.batch_fn(batch_size=4, seed=2)
        b0 = fn(0)
        params = model.init(
            jax.random.key(0), b0["pos"][:1], b0["rot"][:1],
            np.ones((1,), np.float32), b0["single"][:1], b0["pair"][:1],
            b0["mask"][:1],
        )
        mesh = make_mesh(8, model_parallel=2)
        cfg = TrainConfig(num_steps=3, lr=1e-3, log_every=1, min_t=0.15)
        _, hist = train_dsm(sdes, model.apply, params, fn, cfg, mesh=mesh)
        assert np.isfinite(hist).all()

        # A device_cond batch_fn (unbatched [L,S]/[L,L,P] conditioning) is
        # single-device-only; combined with a mesh the sharded place_batch
        # must fail loud naming the fix, not shard the L axis or throw an
        # opaque sharding error.
        dev_fn = mds.datasets[0].batch_fn(batch_size=4, seed=2,
                                          device_cond=True)
        with pytest.raises(ValueError, match="device_cond"):
            train_dsm(sdes, model.apply, params, dev_fn, cfg, mesh=mesh)

    def test_device_cond_batches_match_host_batches(self, mds):
        """device_cond=True serves the SAME batch content as the default
        path — conditioning just arrives unbatched (staged on device once)
        — and dsm_loss is identical on both forms with the same key."""
        import jax
        import jax.numpy as jnp

        from se3diff_tpu.diffusion.denoise import SDEs
        from se3diff_tpu.models.dig import DiGConditionalScoreModel
        from se3diff_tpu.sde.so3_sde import DiGSO3SDE
        from se3diff_tpu.sde.vpsde import CosineVPSDE
        from se3diff_tpu.training.dsm import dsm_loss

        host_fn = mds.batch_fn(batch_size=2, seed=9)
        dev_fn = mds.batch_fn(batch_size=2, seed=9, device_cond=True)
        for step in range(6):
            bh, bd = host_fn(step), dev_fn(step)
            np.testing.assert_array_equal(bh["pos"], bd["pos"])
            np.testing.assert_array_equal(bh["rot"], bd["rot"])
            B = bh["pos"].shape[0]
            assert bd["single"].ndim == 2 and bd["pair"].ndim == 3
            np.testing.assert_array_equal(
                bh["single"], np.broadcast_to(
                    np.asarray(bd["single"]), (B, *bd["single"].shape))
            )
            np.testing.assert_array_equal(
                bh["pair"], np.broadcast_to(
                    np.asarray(bd["pair"]), (B, *bd["pair"].shape))
            )
            np.testing.assert_array_equal(
                bh["mask"], np.broadcast_to(
                    np.asarray(bd["mask"]), (B, *bd["mask"].shape))
            )

        model = DiGConditionalScoreModel(
            num_layers=1, dim_model=16, dim_pair=8, num_heads=2,
            dim_hidden=16, dropout=0.0,
        )
        sdes = SDEs(
            pos=CosineVPSDE(),
            node_orientations=DiGSO3SDE(num_sigma=24, num_omega=128, l_max=100),
        )
        bh = {k: jnp.asarray(v) for k, v in host_fn(0).items()}
        params = model.init(
            jax.random.key(0), bh["pos"][:1], bh["rot"][:1],
            jnp.ones((1,), jnp.float32), bh["single"][:1], bh["pair"][:1],
            bh["mask"][:1],
        )
        loss = lambda b: float(jax.jit(
            lambda b: dsm_loss(params, jax.random.key(3), b, sdes,
                               model.apply, min_t=0.15)
        )(b))
        assert loss(bh) == pytest.approx(loss(dev_fn(0)), rel=1e-6)

    def test_device_cond_single_ensemble(self, mds):
        """EnsembleDataset.batch_fn(device_cond=True): unbatched staged
        conditioning, identical frame selection."""
        ds = mds.datasets[0]
        host_fn = ds.batch_fn(batch_size=2, seed=5)
        dev_fn = ds.batch_fn(batch_size=2, seed=5, device_cond=True)
        bh, bd = host_fn(3), dev_fn(3)
        np.testing.assert_array_equal(bh["pos"], bd["pos"])
        assert bd["single"].ndim == 2 and bd["pair"].ndim == 3
        np.testing.assert_array_equal(bh["single"][0], np.asarray(bd["single"]))
