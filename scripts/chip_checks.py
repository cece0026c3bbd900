"""On-device numerics checks for the rectangular fused path.

Run on the real TPU after kernel changes: compares the fused (Pallas) and
XLA forward paths of the checkpoint-sized model at rectangular lengths
(rows pad to 64-multiples, columns to 128 — e.g. L=150 runs 192x256) and
prints one line per length with the relative output deviation. The
fused-bf16 vs f32 error must stay at or below the bf16 XLA path's own
(the round-3 acceptance bar; see ops/pallas_ipa.py module docstring).

Usage: python scripts/chip_checks.py [--lengths 150,300] [--dtype bfloat16]
"""

import argparse

import jax
import jax.numpy as jnp
import numpy as np


def rel_err(a, b):
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    return float(np.linalg.norm(a - b) / (np.linalg.norm(b) + 1e-12))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--lengths", default="150,192,300,320")
    p.add_argument("--dtype", default="bfloat16",
                   choices=["float32", "bfloat16"])
    p.add_argument("--batch", type=int, default=2)
    args = p.parse_args()

    from se3diff_tpu.models.dig import DiGConditionalScoreModel
    from se3diff_tpu.ops import so3 as so3_ops

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    B = args.batch
    for L in [int(x) for x in args.lengths.split(",")]:
        rng = np.random.default_rng(L)
        pos = jnp.asarray(rng.standard_normal((B, L, 3)) * 0.5, jnp.float32)
        rot = so3_ops.rotvec_to_rotmat(
            jnp.asarray(rng.standard_normal((B, L, 3)) * 0.4, jnp.float32)
        )
        t = jnp.full((B,), 0.3, jnp.float32)
        single = jnp.asarray(
            rng.standard_normal((B, L, 384)) * 0.5, jnp.float32
        )
        pair = jnp.asarray(
            rng.standard_normal((B, L, L, 128)) * 0.2, jnp.float32
        )

        def fwd(use_pallas, dt):
            m = DiGConditionalScoreModel(dtype=dt, use_pallas=use_pallas)
            params = m.init(jax.random.key(0), pos[:1], rot[:1], t[:1],
                            single[:1], pair[:1])
            out = jax.jit(
                lambda *a: m.apply(params, *a)
            )(pos, rot, t, single, pair)
            return tuple(np.asarray(o) for o in out)

        ref = fwd(False, jnp.float32)
        xla = fwd(False, dtype)
        fused = fwd(True, dtype)
        print(
            f"L={L} xla_{args.dtype}_vs_f32="
            f"{rel_err(xla[0], ref[0]):.2e}/{rel_err(xla[1], ref[1]):.2e} "
            f"fused_{args.dtype}_vs_f32="
            f"{rel_err(fused[0], ref[0]):.2e}/{rel_err(fused[1], ref[1]):.2e}",
            flush=True,
        )


if __name__ == "__main__":
    main()
