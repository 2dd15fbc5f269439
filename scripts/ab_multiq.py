"""Careful interleaved A/B: old transpose pipeline vs NT gather-native.

Interleaved rounds, 8 chained iterations each, median-of-rounds reported.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from vectorian_tpu.ops.alignment import AffineGapParams
from vectorian_tpu.ops.pallas_dp import (
    pallas_align_scores_multi,
    pallas_align_scores_multi_nt,
)

V, T, L = 50_000, 8, 32
N = 1 << 17
Q = 128
CHUNK = 1024

rng = np.random.default_rng(0)
tok_np = rng.integers(1, V, size=(N, L), dtype=np.int32)
tokens = jnp.asarray(tok_np)
lengths = jnp.asarray(rng.integers(L // 2, L + 1, size=N).astype(np.int32))
sim_qt = jnp.asarray(rng.uniform(0, 1, size=(V, Q, T)).astype(np.float32))
sim_tq = jnp.asarray(np.swapaxes(np.asarray(sim_qt), 1, 2).copy())  # [V, T, Q]
len_t = jnp.full((Q,), T, jnp.int32)
gaps = AffineGapParams.of(0.0, 0.0, 0.0, 0.0)


@jax.jit
def run_old(sim):  # sim [V, Q, T]
    def one_chunk(args):
        tok, ln = args
        S4 = sim[tok]  # [c, L, Q, T]
        return pallas_align_scores_multi(S4, jnp.maximum(ln, 1), len_t, gaps, "local")

    xs = (tokens.reshape(N // CHUNK, CHUNK, L), lengths.reshape(N // CHUNK, CHUNK))
    return jax.lax.map(one_chunk, xs).reshape(N, Q)


def make_nt(chunk):
    @jax.jit
    def run_nt(sim):  # sim [V, T, Q]
        def one_chunk(args):
            tokT, ln = args
            S = sim[tokT]  # [L, c, T, Q]
            return pallas_align_scores_multi_nt(S, jnp.maximum(ln, 1), len_t, gaps, "local")

        tokens_T = jnp.swapaxes(tokens.reshape(N // chunk, chunk, L), 1, 2)
        xs = (tokens_T, lengths.reshape(N // chunk, chunk))
        return jax.lax.map(one_chunk, xs).reshape(N, Q)
    return run_nt

run_nt = make_nt(CHUNK)


def once(fn, sim, iters=8):
    t0 = time.perf_counter()
    s = sim
    for _ in range(iters):
        out = fn(s)
        s = sim + jnp.ravel(out)[0].astype(sim.dtype) * 0
    _ = float(jnp.ravel(out)[0])
    return (time.perf_counter() - t0) / iters


# warm both
_ = float(jnp.ravel(run_old(sim_qt))[0])
_ = float(jnp.ravel(run_nt(sim_tq))[0])

run_nt4 = make_nt(4096)
run_nt16 = make_nt(16384)
_ = float(jnp.ravel(run_nt4(sim_tq))[0])
_ = float(jnp.ravel(run_nt16(sim_tq))[0])

a, b, c4, c16 = [], [], [], []
for r in range(4):
    a.append(once(run_old, sim_qt))
    b.append(once(run_nt, sim_tq))
    c4.append(once(run_nt4, sim_tq))
    c16.append(once(run_nt16, sim_tq))
    print(f"round {r}: old {a[-1]*1e3:7.1f}  nt1k {b[-1]*1e3:7.1f}  nt4k {c4[-1]*1e3:7.1f}  nt16k {c16[-1]*1e3:7.1f} ms", flush=True)
for nm, xs_ in (("old", a), ("nt1k", b), ("nt4k", c4), ("nt16k", c16)):
    m = np.median(xs_)
    print(f"median {nm}: {m*1e3:.1f} ms ({N*Q/m/1e6:.1f} M/s)")
os._exit(0)
