"""Mesh parallelism: DP sampling and DP+TP training on the virtual mesh.

Runs on the 8-virtual-CPU-device mesh configured in conftest.py
(SURVEY.md section 4.3).
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from se3diff_tpu.diffusion import denoise
from se3diff_tpu.models.dig import DiGConditionalScoreModel
from se3diff_tpu.parallel.mesh import make_mesh, pick_model_parallel
from se3diff_tpu.parallel.sample import (
    make_sharded_sampler,
    round_up_batch,
    sample_batch_sharded,
)
from se3diff_tpu.parallel.sharding import dig_tp_param_specs
from se3diff_tpu.sampling.bundle import random_bundle
from se3diff_tpu.training.dsm import make_sharded_dsm_train_step

L = 6


@pytest.fixture(scope="module")
def bundle():
    return random_bundle(
        model_cfg=dict(num_layers=1, dim_model=16, dim_pair=8, num_heads=4,
                       dim_hidden=16, dropout=0.0),
        so3_kwargs=dict(num_sigma=24, num_omega=128, l_max=100),
        denoiser="dpm_fast",
        length=L,
    )


class TestMesh:
    def test_make_mesh_shapes(self):
        mesh = make_mesh(8, model_parallel=2)
        assert mesh.shape == {"data": 4, "model": 2}
        mesh = make_mesh(4)
        assert mesh.shape == {"data": 4, "model": 1}

    def test_pick_model_parallel(self):
        assert pick_model_parallel(8, 32) == 8
        assert pick_model_parallel(8, 4) == 4
        assert pick_model_parallel(6, 32) == 2
        assert pick_model_parallel(1, 32) == 1

    def test_round_up_batch(self):
        assert round_up_batch(10, 4) == 12
        assert round_up_batch(8, 4) == 8


class TestDPSampling:
    def test_sharded_sampler_matches_unsharded(self, bundle):
        """Same key, sharded vs single-device: identical results."""
        rng = np.random.default_rng(0)
        single = rng.standard_normal((L, 384)).astype(np.float32) * 0.3
        pair = rng.standard_normal((L, L, 128)).astype(np.float32) * 0.1

        mesh = make_mesh(8)
        out = sample_batch_sharded(bundle, mesh, single, pair, batch=16, seed=7)
        assert out["pos"].shape == (16, L, 3)
        assert out["node_orientations"].shape == (16, L, 3, 3)

        model_fn = bundle.model_fn(jnp.asarray(single), jnp.asarray(pair))
        pos_ref, rot_ref = jax.jit(
            lambda key: bundle.denoiser(
                key, bundle.sdes, model_fn, batch=16, length=L
            )
        )(jax.random.key(7))
        np.testing.assert_allclose(out["pos"], np.asarray(pos_ref), atol=2e-4)
        np.testing.assert_allclose(
            out["node_orientations"], np.asarray(rot_ref), atol=2e-4
        )

    def test_output_sharding_is_dp(self, bundle):
        rng = np.random.default_rng(0)
        single = jnp.asarray(rng.standard_normal((L, 384)), jnp.float32)
        pair = jnp.asarray(rng.standard_normal((L, L, 128)), jnp.float32)
        mesh = make_mesh(8)
        sampler = make_sharded_sampler(bundle, mesh, batch=16, length=L)
        pos, rot = sampler(jax.random.key(0), bundle.params, single, pair)
        assert pos.sharding.spec == P("data")


class TestTPSpecs:
    def test_tp_param_specs_shapes(self, bundle):
        specs = dig_tp_param_specs(bundle.params)
        flat = {
            tuple(str(k) for k in path): spec
            for path, spec in jax.tree_util.tree_flatten_with_path(specs)[0]
        }
        col = [k for k, v in flat.items() if v == P(None, "model")]
        row = [k for k, v in flat.items() if v == P("model", None)]
        assert any("scalar_query" in str(k) for k in col)
        assert any("fc_out" in str(k) for k in row)
        assert any("fc1" in str(k) for k in col)
        # layernorms replicated
        assert all(
            v == P() for k, v in flat.items() if "norm1" in str(k)
        )

    def test_dp_tp_train_step_runs_and_matches_dp_only(self, bundle):
        """One DSM step on (data=2, model=4) equals (data=8, model=1)."""
        rng = np.random.default_rng(1)
        B = 8
        batch = {
            "pos": jnp.asarray(rng.standard_normal((B, L, 3)), jnp.float32),
            "rot": jnp.broadcast_to(jnp.eye(3), (B, L, 3, 3)),
            "single": jnp.asarray(rng.standard_normal((B, L, 384)), jnp.float32),
            "pair": jnp.asarray(rng.standard_normal((B, L, L, 128)), jnp.float32),
        }
        model = bundle.model

        def model_apply(p, pos, rot, t, single, pair, mask):
            return model.apply(p, pos, rot, t, single, pair, mask)

        opt = optax.sgd(1e-3)
        losses = []
        for mp in (1, 4):
            mesh = make_mesh(8, model_parallel=mp)
            step, place_params, place_batch = make_sharded_dsm_train_step(
                bundle.sdes, model_apply, opt, mesh, bundle.params
            )
            # The step donates its inputs; give it a private copy so the
            # shared fixture's buffers survive.
            params = place_params(jax.tree.map(jnp.array, bundle.params))
            opt_state = opt.init(params)
            params, opt_state, loss = step(
                params, opt_state, jax.random.key(3), place_batch(batch)
            )
            losses.append(float(loss))
        assert losses[0] == pytest.approx(losses[1], rel=1e-4)


class TestSequenceParallel:
    def test_pair_sharded_model_matches(self, bundle):
        """Sharding the pair activation over the model axis (SP) must not
        change results."""
        import dataclasses
        from jax.sharding import NamedSharding

        mesh = make_mesh(8, model_parallel=4)
        rng = np.random.default_rng(2)
        B, Lsp = 4, 8
        args = (
            jnp.asarray(rng.standard_normal((B, Lsp, 3)), jnp.float32),
            jnp.broadcast_to(jnp.eye(3), (B, Lsp, 3, 3)),
            jnp.full((B,), 0.5, jnp.float32),
            jnp.asarray(rng.standard_normal((B, Lsp, 384)), jnp.float32),
            jnp.asarray(rng.standard_normal((B, Lsp, Lsp, 128)), jnp.float32),
        )
        m_ref = bundle.model
        params = m_ref.init(jax.random.key(0), *args)
        ref = m_ref.apply(params, *args)

        m_sp = dataclasses.replace(
            m_ref, pair_sharding=NamedSharding(mesh, P(None, "model"))
        )
        # pair_sharding carries a concrete NamedSharding, so no ambient
        # mesh context is needed.
        got = jax.jit(m_sp.apply)(params, *args)
        np.testing.assert_allclose(np.asarray(got[0]), np.asarray(ref[0]), atol=2e-5)
        np.testing.assert_allclose(np.asarray(got[1]), np.asarray(ref[1]), atol=2e-5)


def test_sharded_sampler_with_dpm_2m():
    """The multistep DPM++(2M) solver composes with DP sharding: same
    carry-structured scan, batch sharded over the data axis."""
    from functools import partial

    from se3diff_tpu.diffusion import denoise
    from se3diff_tpu.parallel.sample import make_sharded_sampler
    from se3diff_tpu.sampling.bundle import random_bundle

    bundle = random_bundle(
        model_cfg=dict(num_layers=1, dim_model=16, dim_pair=8, num_heads=2,
                       dim_hidden=16, dropout=0.0),
        so3_kwargs=dict(num_sigma=24, num_omega=128, l_max=100),
    )
    sampler = make_sharded_sampler(
        bundle, make_mesh(8), batch=16, length=6,
        denoiser=partial(denoise.dpm_solver_pp2m, num_steps=4),
    )
    rng = np.random.default_rng(0)
    single = jnp.asarray(rng.standard_normal((6, 384)), jnp.float32)
    pair = jnp.asarray(rng.standard_normal((6, 6, 128)), jnp.float32)
    pos, rot = sampler(jax.random.key(0), bundle.params, single, pair)
    assert pos.shape == (16, 6, 3)
    assert np.isfinite(np.asarray(pos)).all()
    r = np.asarray(rot)
    eye = np.einsum("blij,blkj->blik", r, r)
    assert np.abs(eye - np.eye(3)).max() < 1e-4


class TestSequenceParallelMemory:
    """Sequence parallelism doing its actual job (VERDICT round 1, item 6):
    the compiler-reported temp footprint of the long-L forward drops
    ~1/n_devices under pair sharding, and the sharded forward executes at a
    long L. Footprints come from memory_analysis of the CPU lowering — a
    layout-pessimistic proxy for the TPU program (the real v5e lowering at
    L=2048/B=1 squeezes under 16 GB and runs; the measured single-chip OOM
    wall is L=4096/B=1, where the recorded failure is 'Ran out of memory in
    memory space hbm. Used 16.00G of 15.75G' with the CONDITIONING ARGUMENTS
    alone at 16 GB — precisely the tensors pair sharding splits), so the
    assertions are
    primarily RELATIVE (sharded << unsharded), with the absolute bound
    demonstrating the ~L^2 footprint scale."""

    V5E_HBM_BYTES = 16 * 1024**3

    @staticmethod
    def _compiled_temp_bytes(pair_sharding, L, n_layers=2):
        model = DiGConditionalScoreModel(
            num_layers=n_layers, dtype=jnp.bfloat16, pair_sharding=pair_sharding
        )
        B = 1
        pos = jnp.zeros((B, L, 3))
        rot = jnp.broadcast_to(jnp.eye(3), (B, L, 3, 3))
        t = jnp.ones((B,))
        single = jnp.zeros((B, L, 384))
        pair = jnp.zeros((B, L, L, 128))
        params = jax.eval_shape(
            lambda: model.init(jax.random.PRNGKey(0), pos, rot, t, single, pair)
        )
        compiled = (
            jax.jit(lambda *a: model.apply(*a))
            .lower(params, pos, rot, t, single, pair)
            .compile()
        )
        return compiled.memory_analysis().temp_size_in_bytes

    def test_long_L_oom_unsharded_fits_sharded(self):
        L = 2048
        unsharded = self._compiled_temp_bytes(None, L)
        # CPU-lowering temps exceed a v5e's whole HBM at this L (the actual
        # TPU lowering is tighter; the relative claim below is the load-
        # bearing one).
        assert unsharded > self.V5E_HBM_BYTES, unsharded

        mesh = Mesh(np.array(jax.devices()[:8]).reshape(8), ("model",))
        sharded = self._compiled_temp_bytes(
            NamedSharding(mesh, P(None, "model")), L
        )
        assert sharded < self.V5E_HBM_BYTES / 4, sharded  # fits with headroom
        assert sharded < unsharded / 6, (sharded, unsharded)

    def test_long_L_sharded_forward_executes(self):
        # Execution (not just compilation) at a long L on the 8-device mesh.
        L = 1024
        mesh = Mesh(np.array(jax.devices()[:8]).reshape(8), ("model",))
        model = DiGConditionalScoreModel(
            num_layers=1,
            dtype=jnp.bfloat16,
            pair_sharding=NamedSharding(mesh, P(None, "model")),
        )
        rng = np.random.default_rng(0)
        B = 1
        pos = jnp.asarray(rng.standard_normal((B, L, 3)), jnp.float32)
        rot = jnp.broadcast_to(jnp.eye(3), (B, L, 3, 3))
        t = jnp.full((B,), 0.5, jnp.float32)
        single = jnp.asarray(rng.standard_normal((B, L, 384)) * 0.1, jnp.float32)
        pair = jnp.asarray(rng.standard_normal((B, L, L, 128)) * 0.1, jnp.float32)
        params = model.init(
            jax.random.PRNGKey(0), pos[:, :8], rot[:, :8], t,
            single[:, :8], pair[:, :8, :8],
        )
        out_pos, out_rot = jax.jit(model.apply)(params, pos, rot, t, single, pair)
        assert np.all(np.isfinite(np.asarray(out_pos)))
        assert np.all(np.isfinite(np.asarray(out_rot)))


class TestPipelineParallel:
    """GPipe-style pipeline parallelism over a "pipe" mesh axis
    (`parallel/pipeline.py`): microbatches stream through layer stages via
    ppermute inside one shard_map. New capability vs the single-GPU
    reference (SURVEY.md section 2.10)."""

    @pytest.fixture(scope="class")
    def setup(self):
        from se3diff_tpu.ops import so3 as so3_ops

        model = DiGConditionalScoreModel(
            dim_model=16, dim_pair=8, num_layers=4, num_heads=4,
            dim_hidden=16, dropout=0.0,
        )
        rng = np.random.default_rng(3)
        B = 8
        pos = jnp.asarray(rng.standard_normal((B, L, 3)) * 0.5, jnp.float32)
        rot = so3_ops.rotvec_to_rotmat(
            jnp.asarray(rng.standard_normal((B, L, 3)) * 0.3, jnp.float32)
        )
        t = jnp.asarray(rng.uniform(0.1, 0.9, (B,)), jnp.float32)
        single = jnp.asarray(rng.standard_normal((B, L, 384)), jnp.float32)
        pair = jnp.asarray(
            rng.standard_normal((B, L, L, 128)) * 0.3, jnp.float32
        )
        params = model.init(jax.random.key(0), pos, rot, t, single, pair)
        ref = jax.jit(model.apply)(params, pos, rot, t, single, pair)
        return model, params, (pos, rot, t, single, pair), ref

    @pytest.mark.parametrize(
        "devices,pipe,microbatches", [(8, 4, 2), (4, 2, 4)],
        ids=["4stages_x_1layer", "2stages_x_2layers"],
    )
    def test_pp_forward_matches_sequential(
        self, setup, devices, pipe, microbatches
    ):
        from se3diff_tpu.parallel.pipeline import make_pp_score_fn

        model, params, args, (ref_pos, ref_rot) = setup
        mesh = make_mesh(
            devices, model_parallel=pipe, axis_names=("data", "pipe")
        )
        pp = make_pp_score_fn(model, mesh, n_microbatches=microbatches)
        pp_pos, pp_rot = jax.jit(pp)(params, *args)
        np.testing.assert_allclose(pp_pos, ref_pos, atol=1e-5)
        np.testing.assert_allclose(pp_rot, ref_rot, atol=1e-5)

    def test_pp_forward_with_mask(self, setup):
        """Padded residues (mask=False) must not change real outputs."""
        from se3diff_tpu.parallel.pipeline import make_pp_score_fn

        model, params, (pos, rot, t, single, pair), _ = setup
        B = pos.shape[0]
        mask = np.ones((B, L), bool)
        mask[:, L - 2:] = False
        mask = jnp.asarray(mask)
        ref_pos, ref_rot = jax.jit(model.apply)(
            params, pos, rot, t, single, pair, mask
        )
        mesh = make_mesh(8, model_parallel=4, axis_names=("data", "pipe"))
        pp = make_pp_score_fn(model, mesh, n_microbatches=2)
        pp_pos, pp_rot = jax.jit(pp)(params, pos, rot, t, single, pair, mask)
        np.testing.assert_allclose(pp_pos, ref_pos, atol=1e-5)
        np.testing.assert_allclose(pp_rot, ref_rot, atol=1e-5)

    def test_pp_grad_matches_sequential(self, setup, bundle):
        """d(dsm_loss)/d(params) through the pipeline equals the sequential
        gradient — ppermute/scan transpose correctly, so PP *training* works
        by composing make_pp_score_fn with the existing DSM step."""
        from se3diff_tpu.parallel.pipeline import make_pp_score_fn
        from se3diff_tpu.training.dsm import dsm_loss

        model, params, (pos, rot, _, single, pair), _ = setup
        batch = {"pos": pos, "rot": rot, "single": single, "pair": pair}
        sdes = bundle.sdes
        mesh = make_mesh(8, model_parallel=4, axis_names=("data", "pipe"))
        pp_apply = make_pp_score_fn(model, mesh, n_microbatches=2)
        seq_apply = model.apply

        key = jax.random.key(11)
        lseq, gseq = jax.jit(
            jax.value_and_grad(
                lambda p, k, b: dsm_loss(p, k, b, sdes, seq_apply)
            )
        )(params, key, batch)
        lpp, gpp = jax.jit(
            jax.value_and_grad(
                lambda p, k, b: dsm_loss(p, k, b, sdes, pp_apply)
            )
        )(params, key, batch)
        assert float(lpp) == pytest.approx(float(lseq), rel=1e-5)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(a, b, atol=2e-5),
            gseq, gpp,
        )

    def test_pp_rejects_indivisible_layers(self, setup):
        from se3diff_tpu.parallel.pipeline import make_pp_score_fn

        model, *_ = setup
        mesh = make_mesh(8, model_parallel=8, axis_names=("data", "pipe"))
        with pytest.raises(ValueError, match="not divisible"):
            make_pp_score_fn(model, mesh, n_microbatches=2)


class TestPipelineBf16:
    def test_pp_forward_bf16_matches_sequential(self):
        """PP parity holds in the bench dtype (bf16 compute, f32 heads)."""
        from se3diff_tpu.ops import so3 as so3_ops
        from se3diff_tpu.parallel.pipeline import make_pp_score_fn

        model = DiGConditionalScoreModel(
            dim_model=16, dim_pair=8, num_layers=4, num_heads=4,
            dim_hidden=16, dropout=0.0, dtype=jnp.bfloat16,
        )
        rng = np.random.default_rng(9)
        B = 8
        pos = jnp.asarray(rng.standard_normal((B, L, 3)) * 0.5, jnp.float32)
        rot = so3_ops.rotvec_to_rotmat(
            jnp.asarray(rng.standard_normal((B, L, 3)) * 0.3, jnp.float32)
        )
        t = jnp.asarray(rng.uniform(0.1, 0.9, (B,)), jnp.float32)
        single = jnp.asarray(rng.standard_normal((B, L, 384)), jnp.float32)
        pair = jnp.asarray(
            rng.standard_normal((B, L, L, 128)) * 0.3, jnp.float32
        )
        params = model.init(jax.random.key(0), pos, rot, t, single, pair)
        ref = jax.jit(model.apply)(params, pos, rot, t, single, pair)

        mesh = make_mesh(8, model_parallel=4, axis_names=("data", "pipe"))
        pp = make_pp_score_fn(model, mesh, n_microbatches=2)
        got = jax.jit(pp)(params, pos, rot, t, single, pair)
        # bf16 trunk: identical layer math, so only accumulation-order
        # noise at bf16 scale.
        np.testing.assert_allclose(got[0], ref[0], atol=3e-2)
        np.testing.assert_allclose(got[1], ref[1], atol=3e-2)
