"""On-chip probe for the ragged plan (round-4 dead-zone attempt).

Stage 1 (raw kernel): does the (ti=128, tj=320) full-column block compile
under the VMEM limit on real hardware, and what does one fused layer cost
at the ragged 320x320 shape vs the legacy 384x384? Checkpoint-sized model
dims, B as given.

Stage 2 (pipeline): end-to-end reference-protocol dpm-30 at the probe
lengths with RAGGED_PLAN forced on vs off vs the XLA path, using the same
machinery as bench.py. Prints one JSON line per cell.

    python scripts/probe_deadzone_r4.py --stage 1
    python scripts/probe_deadzone_r4.py --stage 2 --lengths 260,300,320
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def stage1(args) -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from se3diff_tpu.ops import pallas_ipa as pk

    B, H, DK, CP = args.batch, 32, 16, 256
    rng = np.random.default_rng(0)

    def build(Lq, Lk):
        g = lambda *s, dt=jnp.bfloat16: jnp.asarray(
            rng.standard_normal(s) * 0.3, dt)
        qs, ks, vs = g(B, H, Lq, DK), g(B, H, Lk, DK), g(B, H, Lk, DK)
        qp = g(B, 3, H * 4, Lq, dt=jnp.float32)
        kp = g(B, 3, H * 4, Lk, dt=jnp.float32)
        vp = g(B, H, Lk, 24, dt=jnp.float32)
        x2d = g(B, Lq, Lk, CP)
        w_pb = g(CP, H, dt=jnp.float32)
        w_pv = g(H, CP, DK)
        bias = jnp.zeros((B, Lk), jnp.float32)
        pa = g(B, H, Lq, Lk)
        return (qs, ks, vs, qp, kp, vp, x2d, w_pb, w_pv, bias, pa)

    def timed(fn, *a):
        out = fn(*a)
        np.asarray(jax.tree.leaves(out)[0])
        ts = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            np.asarray(jax.tree.leaves(fn(*a))[0])
            ts.append(time.perf_counter() - t0)
        return min(ts)

    kw = dict(scalar_w=0.1, pair_w=0.577)
    for name, Lq, Lk, ti, tj in [
        ("legacy_384x384_t128", 384, 384, 128, 128),
        ("fullcol_384x320_t128x320", 384, 320, 128, 320),
        ("rowsplit_320x320", 320, 320, None, None),
        ("rowsplit_320x384", 320, 384, None, None),
    ]:
        a = build(Lq, Lk)
        try:
            if ti is None:
                f = jax.jit(lambda *a: pk.fused_ipa_attention_rowsplit(
                    *a, **kw))
            else:
                f = jax.jit(lambda *a, _ti=ti, _tj=tj:
                            pk.fused_ipa_attention(*a, ti=_ti, tj=_tj, **kw))
            t = timed(f, *a)
            print(json.dumps({"probe": name, "B": B, "ms": round(t * 1e3, 3),
                              "per_cell_ns": round(
                                  t * 1e9 / (B * Lq * Lk), 3)}))
        except Exception as e:  # noqa: BLE001 — record compile failures
            print(json.dumps({"probe": name, "B": B,
                              "error": str(e)[:300]}))
        sys.stdout.flush()


def stage2(args) -> None:
    import os

    os.environ.setdefault("SE3DIFF_COMPILATION_CACHE_DIR",
                          str(Path.home() / ".se3diff_xla_cache"))
    import jax
    import jax.numpy as jnp
    import numpy as np

    from se3diff_tpu.diffusion import denoise
    from se3diff_tpu.models.dig import DiGConditionalScoreModel
    from se3diff_tpu.ops import pallas_ipa as pk
    from se3diff_tpu.sde.so3_sde import DiGSO3SDE
    from se3diff_tpu.sde.vpsde import CosineVPSDE

    sdes = denoise.SDEs(
        pos=CosineVPSDE(), node_orientations=DiGSO3SDE(sigma_max=2.33)
    )
    rng = np.random.default_rng(0)

    for L in [int(x) for x in args.lengths.split(",")]:
        B = args.batch or max(1, int(round(40 * (100.0 / L) ** 2)))
        single = jnp.asarray(rng.standard_normal((1, L, 384)) * 0.5,
                             jnp.float32)
        pair = jnp.asarray(rng.standard_normal((1, L, L, 128)) * 0.2,
                           jnp.float32)
        for mode, ragged, fused in [("xla", False, False),
                                    ("fused_legacy", False, True),
                                    ("fused_ragged", True, True)]:
            pk.RAGGED_PLAN = ragged
            model = DiGConditionalScoreModel(dtype=jnp.bfloat16,
                                             use_pallas=fused)
            params = model.init(
                jax.random.key(0), jnp.zeros((1, L, 3)),
                jnp.broadcast_to(jnp.eye(3), (1, L, 3, 3)),
                jnp.ones((1,)), single, pair,
            )

            @jax.jit
            def sample(key, single, pair, model=model, params=params, B=B,
                       L=L):
                s = jnp.broadcast_to(single, (B, L, 384))
                p = jnp.broadcast_to(pair, (B, L, L, 128))
                cache = model.apply(params, s, p,
                                    method="embed_conditioning")

                def model_fn(pos, rot, t):
                    return model.apply(params, pos, rot, t, cache,
                                       method="score_from_cache")

                return denoise.dpm_solver(key, sdes, model_fn, batch=B,
                                          length=L, num_steps=30)

            try:
                np.asarray(sample(jax.random.key(0), single, pair)[0])
                ts = []
                for i in range(args.iters):
                    t0 = time.perf_counter()
                    np.asarray(sample(jax.random.key(i + 1), single,
                                      pair)[0])
                    ts.append(time.perf_counter() - t0)
                t = min(ts)
                print(json.dumps({
                    "L": L, "B": B, "mode": mode,
                    "ms_per_batch": round(t * 1e3, 1),
                    "structs_per_hr": round(B / t * 3600.0, 1),
                }))
            except Exception as e:  # noqa: BLE001
                print(json.dumps({"L": L, "B": B, "mode": mode,
                                  "error": str(e)[:300]}))
            sys.stdout.flush()


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--stage", type=int, default=1, choices=[1, 2])
    p.add_argument("--batch", type=int, default=None)
    p.add_argument("--iters", type=int, default=5)
    p.add_argument("--lengths", default="260,300,320")
    args = p.parse_args()
    if args.stage == 1:
        args.batch = args.batch or 6
        stage1(args)
    else:
        stage2(args)


if __name__ == "__main__":
    main()
