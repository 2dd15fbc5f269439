"""Full-pipeline variants: where does the sorted gather win get lost?

V1: current _bucket_scores_multiquery (sorted gather, fused by XLA)
V2: optimization_barrier after the sorted gather (forces materialization)
V3: barrier + bf16 table (upcast after unperm)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from vectorian_tpu.ops.alignment import AffineGapParams
from vectorian_tpu.ops.pallas_dp import pallas_align_scores_multi

V, T, L = 50_000, 8, 32
N = 1 << 17
Q = 128
CHUNK = 1024

rng = np.random.default_rng(0)
tok_np = rng.integers(1, V, size=(N, L), dtype=np.int32)
tokens = jnp.asarray(tok_np)
flat = tok_np.reshape(N // CHUNK, CHUNK * L)
order = np.argsort(flat, axis=1, kind="stable").astype(np.int32)
tok_sorted = jnp.asarray(np.take_along_axis(flat, order, axis=1))
inv = np.empty_like(order)
np.put_along_axis(inv, order, np.broadcast_to(np.arange(CHUNK * L, dtype=np.int32), order.shape), axis=1)
sort_inv = jnp.asarray(inv)
lengths = jnp.asarray(rng.integers(L // 2, L + 1, size=N).astype(np.int32))
sim_multi = jnp.asarray(rng.uniform(0, 1, size=(V, Q, T)).astype(np.float32))
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


def make_pipeline(barrier):
    @jax.jit
    def run(sim):
        n_chunks = N // CHUNK

        def one_chunk(args):
            ts, inv, ln = args
            flat = sim[ts]  # [cL, Q, T] coherent when materialized
            if barrier:
                flat = jax.lax.optimization_barrier(flat)
            S4 = flat[inv].reshape(CHUNK, L, Q, T).astype(jnp.float32)
            raw = pallas_align_scores_multi(S4, jnp.maximum(ln, 1), len_t, gaps, "local")
            return raw / float(T)

        xs = (tok_sorted, sort_inv, lengths.reshape(n_chunks, CHUNK))
        return jax.lax.map(one_chunk, xs).reshape(N, Q)

    return run


timed("V1 fused sorted gather (f32)", make_pipeline(False), sim_multi)
timed("V2 barrier sorted gather (f32)", make_pipeline(True), sim_multi)
timed("V3 barrier sorted gather (bf16)", make_pipeline(True), sim_multi.astype(jnp.bfloat16))

# --- same pipelines under a realistic Zipf corpus (freq-ordered vocab ids,
# matching Session._reorder_vocab_by_frequency) ---
zipf = np.minimum(np.random.default_rng(1).zipf(1.2, size=(N, L)) , V - 1).astype(np.int32)
tok_np = zipf
tokens = jnp.asarray(tok_np)
flat = tok_np.reshape(N // CHUNK, CHUNK * L)
order = np.argsort(flat, axis=1, kind="stable").astype(np.int32)
tok_sorted = jnp.asarray(np.take_along_axis(flat, order, axis=1))
inv = np.empty_like(order)
np.put_along_axis(inv, order, np.broadcast_to(np.arange(CHUNK * L, dtype=np.int32), order.shape), axis=1)
sort_inv = jnp.asarray(inv)

timed("Z1 fused sorted gather zipf (f32)", make_pipeline(False), sim_multi)
timed("Z2 barrier sorted gather zipf (f32)", make_pipeline(True), sim_multi)
timed("Z3 barrier sorted gather zipf (bf16)", make_pipeline(True), sim_multi.astype(jnp.bfloat16))

os._exit(0)
