"""From-scratch DSM trainer loop: loss descent, checkpointing, exact resume.

The reference has no from-scratch trainer (its toy trains SO(3) only,
se3diff/train.py:109-143); this subsystem is framework-new.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from se3diff_tpu.diffusion.denoise import SDEs
from se3diff_tpu.models.dig import DiGConditionalScoreModel
from se3diff_tpu.ops import so3 as so3_ops
from se3diff_tpu.sde.so3_sde import DiGSO3SDE
from se3diff_tpu.sde.vpsde import CosineVPSDE
from se3diff_tpu.training.loop import TrainConfig, train_dsm

L = 6


@pytest.fixture(scope="module")
def setup():
    model = DiGConditionalScoreModel(
        num_layers=1, dim_model=16, dim_pair=8, num_heads=2, dim_hidden=16,
        dropout=0.0,
    )
    sdes = SDEs(
        pos=CosineVPSDE(),
        node_orientations=DiGSO3SDE(num_sigma=24, num_omega=128, l_max=100),
    )

    def batch_fn(step):
        rng = np.random.default_rng(step)
        B = 4
        return {
            "pos": jnp.asarray(rng.standard_normal((B, L, 3)) * 0.5, jnp.float32),
            "rot": so3_ops.rotvec_to_rotmat(
                jnp.asarray(rng.standard_normal((B, L, 3)) * 0.3, jnp.float32)
            ),
            "single": jnp.asarray(rng.standard_normal((B, L, 384)), jnp.float32),
            "pair": jnp.asarray(
                rng.standard_normal((B, L, L, 128)) * 0.3, jnp.float32
            ),
        }

    b0 = batch_fn(0)
    params = model.init(
        jax.random.key(0), b0["pos"][:1], b0["rot"][:1],
        jnp.ones((1,), jnp.float32), b0["single"][:1], b0["pair"][:1],
    )
    return model, sdes, params, batch_fn


def _leaf_equal(a, b):
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestTrainLoop:
    def test_loss_decreases(self, setup):
        # min_t=0.05: the tiny test tables (l_max=100) only resolve the
        # IGSO(3) series where l_max*sigma >> 3; production tables
        # (l_max=2000) support the reference min_t=0.001.
        model, sdes, params, batch_fn = setup
        cfg = TrainConfig(num_steps=30, lr=3e-3, log_every=1, min_t=0.05)
        # Fixed batch: the loss on it must drop under optimization.
        fixed = batch_fn(0)
        _, hist = train_dsm(
            sdes, model.apply, params, lambda step: fixed, cfg
        )
        assert np.mean(hist[-5:]) < np.mean(hist[:5]), hist

    def test_resume_is_exact(self, setup, tmp_path):
        model, sdes, params, batch_fn = setup

        full_cfg = TrainConfig(
            num_steps=6, lr=1e-3, log_every=1, min_t=0.05,
            ckpt_every=1, ckpt_dir=str(tmp_path / "full"),
        )
        p_full, _ = train_dsm(sdes, model.apply, params, batch_fn, full_cfg)

        # Interrupted run: die fetching the batch for step 3, then a fresh
        # call with the SAME config resumes from the checkpoint and
        # finishes — identical result (same cosine horizon, fold_in keys).
        part_dir = str(tmp_path / "part")
        part_cfg = TrainConfig(
            num_steps=6, lr=1e-3, log_every=1, min_t=0.05, ckpt_every=1,
            ckpt_dir=part_dir,
        )

        def interrupting(step):
            if step == 3:
                raise KeyboardInterrupt
            return batch_fn(step)

        with pytest.raises(KeyboardInterrupt):
            train_dsm(sdes, model.apply, params, interrupting, part_cfg)
        p_res, _ = train_dsm(sdes, model.apply, params, batch_fn, part_cfg)
        jax.tree.map(_leaf_equal, p_full, p_res)

    def test_sharded_loop_runs(self, setup):
        from se3diff_tpu.parallel.mesh import make_mesh

        model, sdes, params, batch_fn = setup
        mesh = make_mesh(8, model_parallel=2)
        cfg = TrainConfig(num_steps=2, lr=1e-3, log_every=1)
        p, hist = train_dsm(
            sdes, model.apply, params, batch_fn, cfg, mesh=mesh,
        )
        assert np.isfinite(hist[-1])


def test_validation_path_runs(setup):
    """val_every + val_batch must not crash (regression: fold_in(-1)
    overflowed) and runs jitted."""
    model, sdes, params, batch_fn = setup
    cfg = TrainConfig(num_steps=4, lr=1e-3, log_every=1, min_t=0.05,
                      val_every=2)
    _, hist = train_dsm(
        sdes, model.apply, params, batch_fn, cfg, val_batch=batch_fn(999),
    )
    assert np.isfinite(hist[-1])


def test_sharded_resume_with_checkpoints(setup, tmp_path):
    """Checkpoint/restore round-trips mesh-sharded params+opt_state."""
    from se3diff_tpu.parallel.mesh import make_mesh

    model, sdes, params, batch_fn = setup
    mesh = make_mesh(8, model_parallel=2)
    cfg = TrainConfig(num_steps=4, lr=1e-3, log_every=1, min_t=0.05,
                      ckpt_every=1, ckpt_dir=str(tmp_path / "ck"))
    p_full, _ = train_dsm(sdes, model.apply, params, batch_fn, cfg, mesh=mesh)

    def interrupting(step):
        if step == 2:
            raise KeyboardInterrupt
        return batch_fn(step)

    cfg2 = TrainConfig(num_steps=4, lr=1e-3, log_every=1, min_t=0.05,
                       ckpt_every=1, ckpt_dir=str(tmp_path / "ck2"))
    with pytest.raises(KeyboardInterrupt):
        train_dsm(sdes, model.apply, params, interrupting, cfg2, mesh=mesh)
    p_res, _ = train_dsm(sdes, model.apply, params, batch_fn, cfg2, mesh=mesh)
    jax.tree.map(_leaf_equal, p_full, p_res)


def test_metrics_jsonl(setup, tmp_path):
    """train_log.jsonl: one record per log_every step with step/loss/lr/
    seconds, appended across resumes."""
    import json

    model, sdes, params, batch_fn = setup
    ckpt = tmp_path / "ck"
    cfg = TrainConfig(num_steps=4, lr=1e-3, log_every=2, min_t=0.05,
                      ckpt_every=2, ckpt_dir=str(ckpt))
    train_dsm(sdes, model.apply, params, batch_fn, cfg)
    log = ckpt / "train_log.jsonl"
    recs = [json.loads(x) for x in log.read_text().splitlines()]
    assert [r["step"] for r in recs] == [2, 4]
    assert all(r["lr"] > 0 and np.isfinite(r["loss"]) for r in recs)

    # Resume appends (steps 4 -> 6).
    cfg6 = TrainConfig(num_steps=6, lr=1e-3, log_every=2, min_t=0.05,
                       ckpt_every=2, ckpt_dir=str(ckpt))
    train_dsm(sdes, model.apply, params, batch_fn, cfg6)
    recs = [json.loads(x) for x in log.read_text().splitlines()]
    assert [r["step"] for r in recs] == [2, 4, 6]
