"""On-chip probe: fastest way to stage a 512 MB [1024,1024,128] f32
conditioning tensor from an .npy file to the device over the axon tunnel.

Variants, each timed end-to-end (np.load -> device array ready), twice:
  bulk      np.load (eager) + jnp.asarray            (pre-round-5 path)
  mmap_bulk np.load(mmap) + jnp.asarray              (one big transfer,
            host copy inside jax)
  slab16/64/128  np.load(mmap) + device_put row slabs + on-device concat
            (the round-5 queue-D regression at 16 MB — measure the size
            sweep before deciding)

Writes one JSON line per variant. Run on the real chip (axon default).
"""
import json
import sys
import time

import numpy as np
import jax

if "cpu" in sys.argv[1:]:
    # The axon sitecustomize overrides the JAX_PLATFORMS env var; the
    # in-process flip is the only reliable CPU switch (CLAUDE.md).
    jax.config.update("jax_platforms", "cpu")
    sys.argv.remove("cpu")
import jax.numpy as jnp

L = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
path = f"/tmp/probe_pair_{L}.npy"
rng = np.random.default_rng(0)
# Write once, in slabs (avoid the >32 MB fresh-alloc cliff in setup).
arr = np.lib.format.open_memmap(path, mode="w+", dtype=np.float32,
                                shape=(L, L, 128))
for i in range(0, L, 32):
    arr[i:i + 32] = rng.standard_normal((min(32, L - i), L, 128),
                                        dtype=np.float32)
arr.flush()
del arr

nbytes = L * L * 128 * 4


def timed(name, fn):
    for rep in range(2):
        t0 = time.perf_counter()
        out = fn()
        out.block_until_ready()
        np.asarray(out[0, 0, :2])  # force a real sync over the tunnel
        dt = time.perf_counter() - t0
        print(json.dumps({"variant": name, "rep": rep, "L": L,
                          "seconds": round(dt, 3),
                          "MBps": round(nbytes / 1e6 / dt, 1)}),
              flush=True)
        del out


def bulk():
    a = np.load(path).astype(np.float32)
    return jnp.asarray(a)


def mmap_bulk():
    m = np.load(path, mmap_mode="r").astype(np.float32, copy=False)
    return jnp.asarray(m)


def slab(mb):
    def f():
        m = np.load(path, mmap_mode="r").astype(np.float32, copy=False)
        per = max(1, (mb << 20) // (m.nbytes // m.shape[0]))
        parts = [jax.device_put(np.ascontiguousarray(m[i:i + per]))
                 for i in range(0, m.shape[0], per)]
        return jnp.concatenate(parts, axis=0)
    return f


timed("slab16", slab(16))
timed("slab64", slab(64))
timed("slab128", slab(128))
timed("mmap_bulk", mmap_bulk)
timed("bulk", bulk)
