"""No-transpose multi-query pipeline: gather [V,T,Q] by tok.T -> kernel."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from vectorian_tpu.ops.alignment import AffineGapParams
from vectorian_tpu.ops.pallas_dp import pallas_align_scores_multi_nt

V, T, L = 50_000, 8, 32
N = 1 << 17
Q = 128
CHUNK = 1024

rng = np.random.default_rng(0)
tok_uni = rng.integers(1, V, size=(N, L), dtype=np.int32)
tok_zipf = np.minimum(np.random.default_rng(1).zipf(1.2, size=(N, L)), V - 1).astype(np.int32)
lengths = jnp.asarray(rng.integers(L // 2, L + 1, size=N).astype(np.int32))
sim_tq = jnp.asarray(rng.uniform(0, 1, size=(V, T, Q)).astype(np.float32))
len_t = jnp.full((Q,), T, jnp.int32)
gaps = AffineGapParams.of(0.0, 0.0, 0.0, 0.0)


def timed(name, fn, sim, iters=4):
    out = fn(sim)
    _ = float(jnp.ravel(out)[0])
    t0 = time.perf_counter()
    s = sim
    for _ in range(iters):
        out = fn(s)
        s = sim + jnp.ravel(out)[0].astype(sim.dtype) * 0
    _ = float(jnp.ravel(out)[0])
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:44s} {dt*1e3:9.1f} ms   {N*Q/dt/1e6:8.1f} M align/s", flush=True)


def make_run(tok_np, block_c):
    tokens_T = jnp.asarray(
        np.ascontiguousarray(np.swapaxes(tok_np.reshape(N // CHUNK, CHUNK, L), 1, 2))
    )  # [n_chunks, L, CHUNK]

    @jax.jit
    def run(sim):
        def one_chunk(args):
            tokT, ln = args  # [L, CHUNK], [CHUNK]
            S = sim[tokT]  # [L, CHUNK, T, Q] gather-native
            raw = pallas_align_scores_multi_nt(
                S.astype(jnp.float32), jnp.maximum(ln, 1), len_t, gaps,
                "local", block_c=block_c,
            )
            return raw / float(T)

        xs = (tokens_T, lengths.reshape(N // CHUNK, CHUNK))
        return jax.lax.map(one_chunk, xs).reshape(N, Q)

    return run


timed("NT uniform f32 cb=16", make_run(tok_uni, 16), sim_tq)
timed("NT uniform f32 cb=64", make_run(tok_uni, 64), sim_tq)
timed("NT zipf    f32 cb=64", make_run(tok_zipf, 64), sim_tq)
timed("NT uniform bf16->f32 cb=64", make_run(tok_uni, 64), sim_tq.astype(jnp.bfloat16))
timed("NT zipf    bf16->f32 cb=64", make_run(tok_zipf, 64), sim_tq.astype(jnp.bfloat16))

os._exit(0)
