"""Secondary throughput numbers: RWMD / Sinkhorn-WMD / contextual cosine.

Complements bench.py (alignment serving) with the transport metrics and the
contextual-embedding path, single query over 131k slices.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from vectorian_tpu.ops.wmd import _bucket_emd_scores, _bucket_rwmd_scores

V, T, L = 50_000, 8, 32
N = 1 << 17
CHUNK = 1024
rng = np.random.default_rng(0)
tokens = jnp.asarray(rng.integers(1, V, size=(N, L), dtype=np.int32))
ts = jnp.asarray(tokens.reshape(N // CHUNK, CHUNK * L))
inv = jnp.broadcast_to(
    jnp.arange(CHUNK * L, dtype=jnp.int32)[None], (N // CHUNK, CHUNK * L)
)
pos = jnp.zeros((N, L), jnp.int8)
tag = jnp.zeros((N, L), jnp.int16)
lengths = jnp.asarray(rng.integers(L // 2, L + 1, size=N).astype(np.int32))
sim_vocab = jnp.asarray(rng.uniform(0, 1, size=(V, T)).astype(np.float32))
mags = jnp.asarray(rng.uniform(0.5, 2.0, size=(V,)).astype(np.float32))
mass_t = jnp.ones((T,), jnp.float32)
tw = (jnp.zeros((T,), jnp.float32), jnp.zeros((T,), jnp.int8),
      jnp.asarray(0.0, jnp.float32), jnp.asarray(0.0, jnp.float32))


def timed(name, fn, iters=6):
    out = fn(sim_vocab)
    _ = float(jnp.ravel(out)[0])
    t0 = time.perf_counter()
    s = sim_vocab
    for _ in range(iters):
        out = fn(s)
        s = sim_vocab + jnp.ravel(out)[0] * 0
    _ = float(jnp.ravel(out)[0])
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:34s} {dt*1e3:8.1f} ms  -> {N/dt/1e6:6.2f} M slices/s", flush=True)


def rwmd(sim):
    return _bucket_rwmd_scores(
        ("static", 0), tokens, ts, inv, pos, tag, lengths,
        (sim,), (mags,), (), (), (),
        mass_t, jnp.asarray(T, jnp.int32), *tw,
        injective=False, symmetric=True, normalize_bow=True, chunk=CHUNK,
    )


def wmd_bound(sim):
    return _bucket_emd_scores(
        ("static", 0), tokens, ts, inv, pos, tag, lengths,
        (sim,), (mags,), (), (), (),
        mass_t, *tw,
        use_magnitudes=False, normalize_mass=True, chunk=CHUNK,
    )


def wrd(sim):
    return _bucket_emd_scores(
        ("static", 0), tokens, ts, inv, pos, tag, lengths,
        (sim,), (mags,), (), (), (),
        mass_t, *tw,
        use_magnitudes=True, normalize_mass=True, chunk=CHUNK,
    )


timed("RWMD (nbow symmetric)", rwmd)
timed("full WMD (bound ranking)", wmd_bound)
timed("WRD (bound ranking)", wrd)

os._exit(0)
