"""PPFT fine-tuning trainer: property-guided stochastic-control training.

TPU-native counterpart of `bioemu/src/bioemu/finetune.py`. Structural
differences from the reference (all jit/XLA-motivated):

* Path generation is one ``lax.scan`` (`euler_maruyama_finetune` /
  `heun_finetune`), not a Python step loop.
* The gradient through the recorded path is one jitted
  ``jax.grad`` of a rematerialized scan over timesteps
  (``jax.checkpoint`` on the scan body) instead of the reference's manual
  micro-batched per-chunk ``loss.backward()`` accumulation
  (finetune.py:338-393,470-492) — same estimator, bounded memory, no host
  round-trips.
* Optimizer/schedule via optax (AdamW + cosine to ``eta_min``,
  finetune.py:580-581).
* Checkpoints are torch-layout state dicts in ``.npz`` (loadable by either
  stack via models/convert.py).

The estimator itself is the reference's: gradients flow through the control
``u`` only via the linearized importance weight ``int <u, -dW>`` and the
quadratic cost ``int |u|^2 dt``; the path is generated without gradients and
replayed (SURVEY.md section 3.2).
"""

from __future__ import annotations

import dataclasses
import json
import logging
import os
from dataclasses import dataclass
from pathlib import Path
from typing import Any, Callable, Iterator, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from se3diff_tpu.diffusion import denoise
from se3diff_tpu.models.convert import flax_to_torch_state_dict, torch_state_dict_to_flax
from se3diff_tpu.models.dig import DiGConditionalScoreModel
from se3diff_tpu.ppft.h_functions import H_FUNCTIONS, FoldingStability
from se3diff_tpu.ppft.losses import compute_ev_loss, compute_kl_loss
from se3diff_tpu.sampling.bundle import (
    Bundle,
    initialize_weights_to_near_zero,
    instantiate,
    load_bundle,
)
from se3diff_tpu.sampling.embeds import get_embeds, load_embeds
from se3diff_tpu.sampling.seq_io import check_protein_valid

logger = logging.getLogger(__name__)

# h_func(pos [B, L, 3], sequence) -> [B, K]
HFunc = Callable[[jax.Array, str], jax.Array]


@dataclass
class FinetuneConfig:
    """Defaults = `bioemu/src/bioemu/config/finetune/finetune.yaml`."""

    # Data
    data_batch_size: int = 1
    shuffle: bool = True
    # Loss
    lambda_: float = 2.0e-05
    tol: float = 1.0e-07
    # Training
    batch_size: int = 256
    micro_batch_size: int = 2  # kept for API parity; remat supersedes it
    num_epochs: int = 4
    save_every_n_epochs: int = 2
    val_every_n_epochs: int = 4
    lr: float = 5.0e-04
    betas: tuple[float, float] = (0.9, 0.999)
    weight_decay: float = 0.0
    eta_min: float = 5.0e-06
    # Beyond-reference variance guard (None = reference behavior): skip any
    # update whose recorded-path KL estimate exceeds this many nats. When
    # the control drives the path law too far from the prior, the
    # linearized importance weights degenerate onto a handful of paths and
    # the replay gradient is noise — the round-4 on-chip run B traversed
    # exactly this (healthy descent at path-KL <= ~50, val-loss spike 5x
    # at KL ~200-260; docs/PPFT_LEARNING.md). The guard is a trust region
    # on the sampler: skipped steps still count a path generation but keep
    # the params where the estimator is valid.
    kl_guard: float | None = None
    # Gated equivalent of the reference's always-on terminal-sample dump
    # into a hardcoded "ddr_debug/" dir (finetune.py:419-448): when set,
    # each training loss computation refreshes {dir}/batch_*.npz +
    # topology.pdb + samples.xtc with the most recent path's endpoint batch.
    debug_dump_dir: str | None = None


class FinetuneBundle(NamedTuple):
    """(finetune.py:94-99) — the score model rides inside ``base``."""

    base: Bundle  # frozen score model + sdes
    finetune_model: DiGConditionalScoreModel
    finetune_params: Any
    denoiser: Callable  # a *_finetune denoiser partial
    h_func: HFunc


FINETUNE_DENOISERS = {
    # config/denoiser/{heun,euler_maruyama}_finetune.yaml
    "heun_finetune": dict(
        fn=denoise.heun_finetune, num_steps=100, max_t=0.99, min_t=0.001, noise=0.5
    ),
    "euler_maruyama_finetune": dict(
        fn=denoise.euler_maruyama_finetune, num_steps=200, max_t=0.99, min_t=0.001
    ),
    # The reference names this in config (sde_dpm_finetune.yaml: 50 steps)
    # but ships an empty stub (denoiser.py:767-777); implemented here —
    # path generation at half heun's / a quarter of EM's model evals.
    "sde_dpm_solver_finetune": dict(
        fn=denoise.sde_dpm_solver_finetune, num_steps=50, max_t=0.99,
        min_t=0.001,
    ),
}


def load_finetune_bundle(
    ckpt_path: str | os.PathLike,
    model_config_path: str | os.PathLike | None = None,
    finetune_ckpt_path: str | os.PathLike | None = None,
    denoiser_type: str = "heun_finetune",
    h_func: HFunc | str = "folding_stability",
    h_func_kwargs: dict | None = None,
    so3_cache_dir: str | None = None,
    seed: int = 0,
) -> FinetuneBundle:
    """Load score + finetune models and the finetune denoiser
    (finetune.py:125-196)."""
    from functools import partial

    base = load_bundle(
        ckpt_path, config_path=model_config_path, so3_cache_dir=so3_cache_dir
    )
    if "finetune_model" not in base.config:
        raise ValueError("model config must contain 'finetune_model'")

    ft_model: DiGConditionalScoreModel = instantiate(base.config["finetune_model"])
    L = 8
    ft_params = ft_model.init(
        jax.random.key(seed),
        jnp.zeros((1, L, 3)),
        jnp.broadcast_to(jnp.eye(3), (1, L, 3, 3)),
        jnp.zeros((1,)),
        jnp.zeros((1, L, 384)),
        jnp.zeros((1, L, L, 128)),
    )
    # The reference re-initializes with xavier weights / zero biases
    # (finetune.py:102-122, applied with scale=1.0); flax's default init is
    # the same family, so fresh init suffices. A checkpoint overrides it.
    if finetune_ckpt_path is not None:
        ft_params = load_finetune_params(finetune_ckpt_path)

    dn = dict(FINETUNE_DENOISERS[denoiser_type])
    denoiser = partial(dn.pop("fn"), **dn)

    if isinstance(h_func, str):
        h_func = H_FUNCTIONS[h_func](**(h_func_kwargs or {}))

    return FinetuneBundle(
        base=base,
        finetune_model=ft_model,
        finetune_params=ft_params,
        denoiser=denoiser,
        h_func=h_func,
    )


def load_finetune_params(path: str | os.PathLike) -> Any:
    """Load finetune params from .npz (ours) or .pt (torch state dict)."""
    path = str(path)
    if path.endswith(".npz"):
        with np.load(path) as d:
            return torch_state_dict_to_flax({k: d[k] for k in d})
    from se3diff_tpu.models.convert import load_torch_checkpoint

    return load_torch_checkpoint(path)


def save_finetune_params(params: Any, path: str | os.PathLike) -> None:
    np.savez(path, **flax_to_torch_state_dict(jax.device_get(params)))


# --------------------------------------------------------------------- #
# Dataset                                                                 #
# --------------------------------------------------------------------- #


class SequenceHStarsDataset:
    """CSV -> (sequence, h_stars [K]) rows (finetune.py:199-262)."""

    def __init__(self, csv_path, sequence_col: str, h_stars_cols: str | list[str]):
        import pandas as pd

        self.df = pd.read_csv(csv_path)
        if isinstance(h_stars_cols, str):
            h_stars_cols = [h_stars_cols]
        missing = [c for c in [sequence_col, *h_stars_cols] if c not in self.df.columns]
        if missing:
            raise ValueError(f"columns not found in CSV: {missing}")
        self.sequence_col = sequence_col
        self.h_stars_cols = h_stars_cols

    def __len__(self) -> int:
        return len(self.df)

    def __getitem__(self, idx: int) -> tuple[str, np.ndarray]:
        row = self.df.iloc[idx]
        return str(row[self.sequence_col]), row[self.h_stars_cols].to_numpy(
            np.float32
        )

    def batches(
        self, batch_size: int = 1, shuffle: bool = True, rng: np.random.Generator | None = None
    ) -> Iterator[list[tuple[str, np.ndarray]]]:
        order = np.arange(len(self))
        if shuffle:
            (rng or np.random.default_rng()).shuffle(order)
        for start in range(0, len(order), batch_size):
            yield [self[int(i)] for i in order[start : start + batch_size]]


# --------------------------------------------------------------------- #
# Path generation + loss                                                  #
# --------------------------------------------------------------------- #


def make_path_sampler(bundle: FinetuneBundle, batch_size: int, length: int):
    """Jitted ``sampler(key, ft_params, single, pair) -> DenoisedSDEPath``.

    Build once per (batch, length); params and conditioning are traced
    arguments so mutants of the same length share one compilation.
    """

    def sampler(key, base_params, ft_params, single, pair):
        # Both models embed the t-invariant conditioning once; the path
        # recorder replays only the per-step score evaluations.
        s = jnp.broadcast_to(single, (batch_size,) + single.shape[-2:])
        p = jnp.broadcast_to(pair, (batch_size,) + pair.shape[-3:])
        base_cache = bundle.base.model.apply(
            base_params, s, p, method="embed_conditioning"
        )

        def model_fn(pos, rot, t):
            return bundle.base.model.apply(
                base_params, pos, rot, t, base_cache, method="score_from_cache"
            )

        ft_fn = _finetune_model_fn(bundle, ft_params, single, pair, batch_size)
        return bundle.denoiser(
            key, bundle.base.sdes, model_fn, ft_fn,
            batch=batch_size, length=length,
        )

    return jax.jit(sampler)


def generate_finetune_batch(
    key: jax.Array,
    bundle: FinetuneBundle,
    finetune_params: Any,
    single: np.ndarray,
    pair: np.ndarray,
    batch_size: int,
) -> denoise.DenoisedSDEPath:
    """One recorded sampling batch (finetune.py:291-335); fully jitted.

    One-shot convenience; inside a training loop use :func:`make_path_sampler`
    to reuse the compilation across calls.
    """
    sampler = make_path_sampler(bundle, batch_size, single.shape[0])
    return sampler(
        key, bundle.base.params, finetune_params,
        jnp.asarray(single), jnp.asarray(pair),
    )


def _finetune_model_fn(bundle, params, single, pair, batch: int):
    """Per-step finetune score fn with the conditioning embedded once.

    Inside the rematerialized replay scan this also keeps the embed out of
    every checkpointed step recomputation (gradients still flow through the
    embed parameters, once)."""
    single = jnp.asarray(single)
    pair = jnp.asarray(pair)
    s = jnp.broadcast_to(single, (batch,) + single.shape[-2:])
    p = jnp.broadcast_to(pair, (batch,) + pair.shape[-3:])
    cache = bundle.finetune_model.apply(params, s, p, method="embed_conditioning")

    def fn(pos, rot, t):
        return bundle.finetune_model.apply(
            params, pos, rot, t, cache, method="score_from_cache"
        )

    return fn


def _sum_last(x: jax.Array) -> jax.Array:
    """Reduce all but the leading batch axis."""
    return jnp.sum(x, axis=tuple(range(1, x.ndim)))


def _int_uudt_from_us(us: dict[str, jax.Array], dts: jax.Array) -> jax.Array:
    """Full-path control cost ``int |u|^2 (-dt)`` per sample [B]."""
    return sum(
        jnp.sum(jnp.sum(u**2, axis=(-1, -2)) * (-dts)[:, None], axis=0)
        for u in us.values()
    )


def make_finetune_step_fns(
    bundle: FinetuneBundle, lambda_: float = 2.0e-05, tol: float = 1.0e-07
):
    """Build jitted (grad_fn, val_fn) for this bundle (finetune.py:396-514).

    ``grad_fn(params, path, single, pair, hs, h_stars) -> (grads, val_loss)``
    re-forwards the finetune model over the recorded path inside a
    rematerialized scan; gradients flow through ``int <u, -dW>`` (the
    linearized importance weight) and ``int |u|^2 dt`` only.
    ``val_fn(path, hs, h_stars) -> val_loss`` is the reference's validation
    quantity (ws = 1, raw EV + lambda*KL from the recorded controls).
    """

    def _validation_loss(path, hs, h_stars):
        dts = jnp.diff(path.timesteps)
        int_uudt_sg = _int_uudt_from_us(path.us, dts)
        ws = jnp.ones_like(int_uudt_sg)
        val_ev = compute_ev_loss(
            ws=ws, hs=hs, h_stars=h_stars, from_int_dws=False, use_stab=False, tol=tol
        )
        val_kl = compute_kl_loss(
            ws=ws, int_u_u_dt=int_uudt_sg, int_u_u_dt_sg=int_uudt_sg,
            from_int_dws=False, use_rloo=False,
        )
        return val_ev + lambda_ * val_kl

    @jax.jit
    def grad_fn(params, path, single, pair, hs, h_stars):
        dts = jnp.diff(path.timesteps)  # [T], negative (reverse time)
        int_uudt_sg = _int_uudt_from_us(path.us, dts)
        B = path.pos_path.shape[1]

        def loss_fn(p):
            ft_fn = _finetune_model_fn(bundle, p, single, pair, B)

            def body(carry, xs):
                int_dws, int_uudt = carry
                pos_t, rot_t, t_scalar, dW_pos, dW_rot, dt = xs
                t = jnp.full((B,), t_scalar, pos_t.dtype)
                u_pos, u_rot = ft_fn(pos_t, rot_t, t)
                int_dws = (
                    int_dws
                    + jnp.sum(u_pos * -dW_pos, axis=(-1, -2))
                    + jnp.sum(u_rot * -dW_rot, axis=(-1, -2))
                )
                int_uudt = int_uudt + (
                    jnp.sum(u_pos**2, axis=(-1, -2))
                    + jnp.sum(u_rot**2, axis=(-1, -2))
                ) * (-dt)
                return (int_dws, int_uudt), None

            init = (jnp.zeros((B,)), jnp.zeros((B,)))
            xs = (
                path.pos_path[:-1],
                path.rot_path[:-1],
                path.timesteps[:-1],
                path.dWs["pos"],
                path.dWs["node_orientations"],
                dts,
            )
            (int_dws, int_uudt), _ = jax.lax.scan(jax.checkpoint(body), init, xs)
            loss_ev = compute_ev_loss(
                ws=int_dws, hs=hs, h_stars=h_stars,
                from_int_dws=True, use_stab=True, tol=tol,
            )
            loss_kl = compute_kl_loss(
                ws=int_dws, int_u_u_dt=int_uudt, int_u_u_dt_sg=int_uudt_sg,
                from_int_dws=True, use_rloo=True,
            )
            return loss_ev + lambda_ * loss_kl

        grads = jax.grad(loss_fn)(params)
        return grads, _validation_loss(path, hs, h_stars)

    return grad_fn, jax.jit(_validation_loss)


# --------------------------------------------------------------------- #
# Training loop                                                           #
# --------------------------------------------------------------------- #


def _dump_terminal_batch(
    dump_dir: Path, seq: str, pos: np.ndarray, rot: np.ndarray
) -> None:
    """Refresh ``dump_dir`` with the endpoint batch of the most recent
    finetune path: ``batch_*.npz`` (reference npz keys) + topology.pdb +
    samples.xtc — the gated counterpart of the reference's unconditional
    ddr_debug dump (finetune.py:419-448), unfiltered like the reference's
    ``filter_samples=False``."""
    from se3diff_tpu.sampling.pipeline import (
        _write_ensemble,
        format_npz_samples_filename,
    )
    from se3diff_tpu.struct.atoms import atom37_from_frames, atom37_mask
    from se3diff_tpu.struct.residues import sequence_to_aatype

    dump_dir.mkdir(parents=True, exist_ok=True)
    B = pos.shape[0]
    np.savez(
        dump_dir / format_npz_samples_filename(0, B),
        pos=pos, node_orientations=rot, sequence=seq,
    )
    aatype = sequence_to_aatype(seq)
    atom37, _ = jax.jit(atom37_from_frames)(pos, rot, aatype)
    _write_ensemble(
        dump_dir, seq, aatype, atom37_mask(aatype),
        [np.asarray(atom37)], B, filter_samples=False,
    )


def finetune(
    csv_path: str | os.PathLike,
    csv_path_val: str | os.PathLike,
    sequence_col: str,
    h_stars_cols: str | list[str],
    bundle: FinetuneBundle,
    config: FinetuneConfig = FinetuneConfig(),
    output_dir: str | os.PathLike = "finetune_out",
    cache_embeds_dir: str | None = None,
    embeds_backend: str = "colabfold",
    msa_file: str | os.PathLike | None = None,
    msa_host_url: str | None = None,
    seed: int = 0,
) -> Any:
    """The fine-tuning loop (finetune.py:517-692).

    Epoch 0 is validation-only; checkpoints every ``save_every_n_epochs``;
    the best-validation params are saved as ``finetune_model.npz``.
    Returns the best params.
    """
    output_dir = Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)

    dataset = SequenceHStarsDataset(csv_path, sequence_col, h_stars_cols)
    dataset_val = SequenceHStarsDataset(csv_path_val, sequence_col, h_stars_cols)
    num_batches = -(-len(dataset) // config.data_batch_size)

    schedule = optax.cosine_decay_schedule(
        init_value=config.lr,
        decay_steps=max(config.num_epochs * num_batches, 1),
        alpha=config.eta_min / config.lr,
    )
    optimizer = optax.adamw(
        schedule, b1=config.betas[0], b2=config.betas[1],
        weight_decay=config.weight_decay,
    )
    params = bundle.finetune_params
    opt_state = optimizer.init(params)

    @jax.jit
    def apply_grads(params, opt_state, grads):
        # One fused device program instead of eager per-leaf optax dispatch
        # (each eager op is a ~30 ms round trip on remote TPU backends).
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state

    rng = np.random.default_rng(seed)
    key = jax.random.key(seed)

    def embeds_for(seq: str):
        # With msa_file set, every mutant sequence in the CSV reuses the
        # wild-type MSA (query row swapped per sequence inside get_embeds),
        # matching finetune.py:299-322 — no MSA-server query per mutant.
        check_protein_valid(seq)
        sf, pf = get_embeds(
            seq, cache_embeds_dir, backend=embeds_backend,
            msa_file=msa_file, msa_host_url=msa_host_url,
        )
        return load_embeds(sf, pf)

    grad_fn, val_fn = make_finetune_step_fns(bundle, config.lambda_, config.tol)

    @jax.jit
    def path_kl(path):
        # Raw KL-control-cost estimate of the recorded path (nats; ws=1 —
        # the same quantity the validation loss scales by lambda), for the
        # kl_guard trust region.
        dts = jnp.diff(path.timesteps)
        int_uudt = _int_uudt_from_us(path.us, dts)
        ws = jnp.ones_like(int_uudt)
        return compute_kl_loss(
            ws=ws, int_u_u_dt=int_uudt, int_u_u_dt_sg=int_uudt,
            from_int_dws=False, use_rloo=False,
        )

    samplers: dict[int, Callable] = {}
    # Jitted h evaluation: eager per-op dispatch costs ~30 ms/op on remote
    # TPU backends. static seq -> one compile per unique sequence, cache
    # hits on later epochs.
    h_apply = jax.jit(lambda pos, seq: bundle.h_func(pos, seq), static_argnums=1)

    def run_one(params, seq, h_stars, key, for_grad):
        single, pair = embeds_for(seq)
        L = single.shape[0]
        if L not in samplers:
            samplers[L] = make_path_sampler(bundle, config.batch_size, L)
        path = samplers[L](
            key, bundle.base.params, params,
            jnp.asarray(single), jnp.asarray(pair),
        )
        hs = h_apply(path.pos_path[-1], seq)
        if config.debug_dump_dir and for_grad:
            _dump_terminal_batch(
                Path(config.debug_dump_dir), seq,
                np.asarray(path.pos_path[-1]), np.asarray(path.rot_path[-1]),
            )
        if for_grad:
            grads, loss = grad_fn(
                params, path, jnp.asarray(single), jnp.asarray(pair),
                hs, jnp.asarray(h_stars),
            )
        else:
            grads, loss = None, val_fn(path, hs, jnp.asarray(h_stars))
        return grads, float(loss), float(path_kl(path))

    best_val, best_epoch, best_params = float("inf"), 0, params
    history: dict = {"train": [], "val": [], "config": dataclasses.asdict(config)}

    def _write_history():
        history["best_epoch"] = best_epoch
        history["best_val"] = best_val
        with open(output_dir / "history.json", "w") as f:
            json.dump(history, f, indent=1)

    for epoch in range(config.num_epochs + 1):
        if epoch > 0:
            epoch_loss, n, kls, skipped = 0.0, 0, [], 0
            for data_batch in dataset.batches(
                config.data_batch_size, config.shuffle, rng
            ):
                grads_sum = None
                for seq, h_stars in data_batch:
                    key, k = jax.random.split(key)
                    grads, loss, kl = run_one(params, seq, h_stars, k, True)
                    kls.append(kl)
                    if config.kl_guard is not None and kl > config.kl_guard:
                        # Trust region: the linearized importance weights
                        # behind this gradient are degenerate — drop it.
                        skipped += 1
                        logger.info(
                            "kl_guard: skipping update (path KL %.1f > %.1f)",
                            kl, config.kl_guard,
                        )
                        continue
                    grads_sum = (
                        grads
                        if grads_sum is None
                        else jax.tree.map(jnp.add, grads_sum, grads)
                    )
                    epoch_loss += loss
                    n += 1
                if grads_sum is not None:
                    params, opt_state = apply_grads(params, opt_state, grads_sum)
            logger.info("Epoch %d: avg train loss %.4f", epoch, epoch_loss / max(n, 1))
            history["train"].append({
                "epoch": epoch,
                "loss": epoch_loss / max(n, 1),
                "mean_path_kl": float(np.mean(kls)) if kls else 0.0,
                "max_path_kl": float(np.max(kls)) if kls else 0.0,
                "skipped_updates": skipped,
            })

        if epoch % config.val_every_n_epochs == 0 or epoch == config.num_epochs:
            val_loss, val_kl, n = 0.0, 0.0, 0
            for (seq, h_stars), in dataset_val.batches(1, shuffle=False):
                key, k = jax.random.split(key)
                _, loss, kl = run_one(params, seq, h_stars, k, False)
                val_loss += loss
                val_kl += kl
                n += 1
            avg_val = val_loss / max(n, 1)
            logger.info("Epoch %d: avg val loss %.4f", epoch, avg_val)
            history["val"].append({
                "epoch": epoch,
                "val_loss": avg_val,
                "val_path_kl": val_kl / max(n, 1),
            })
            if avg_val < best_val:
                best_val, best_epoch, best_params = avg_val, epoch, params
                logger.info("Updated best model at epoch %d", epoch)

        if epoch % config.save_every_n_epochs == 0 or epoch == config.num_epochs:
            save_finetune_params(params, output_dir / f"finetune_model_{epoch}.npz")
        _write_history()

    save_finetune_params(best_params, output_dir / "finetune_model.npz")
    return best_params
