"""Decompose the headline bench into stages to find the bottleneck.

Stages timed separately with the chained-iteration protocol (CLAUDE.md):
  A. vocab gather only:      S4 = sim_multi[tok]            [c,L,Q,T]
  B. gather + transpose:     layout into [L,T1p,B]
  C. full pipeline (bench):  gather + layout + pallas DP
  D. DP only on pre-laid-out S (kernel ceiling)
Also tries bf16 sim_multi for A/C.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from vectorian_tpu.ops.alignment import AffineGapParams
from vectorian_tpu.ops.pallas_dp import _pallas_call_scores, _round_up
from vectorian_tpu.ops.search import _bucket_scores_multiquery, use_pallas_default

V, T, L = 50_000, 8, 32
N = 1 << 17
Q = 128
CHUNK = 1024

rng = np.random.default_rng(0)
tokens = jnp.asarray(rng.integers(1, V, size=(N, L), dtype=np.int32))
lengths = jnp.asarray(rng.integers(L // 2, L + 1, size=N).astype(np.int32))
sim_multi = jnp.asarray(rng.uniform(0, 1, size=(V, Q, T)).astype(np.float32))
len_t = jnp.full((Q,), T, jnp.int32)
norm_total = jnp.full((Q,), float(T), jnp.float32)
gaps = AffineGapParams.of(0.0, 0.0, 0.0, 0.0)


def timed(name, fn, sim, iters=4):
    out = fn(sim)
    _ = float(jnp.ravel(out)[0])  # compile + warm
    t0 = time.perf_counter()
    s = sim
    for _i in range(iters):
        out = fn(s)
        s = sim + jnp.ravel(out)[0] * 1e-12  # device-side chain, no host read
    _ = float(jnp.ravel(out)[0])  # force completion
    dt = (time.perf_counter() - t0) / iters
    rate = N * Q / dt
    print(f"{name:34s} {dt*1e3:9.1f} ms   {rate/1e6:8.1f} M align/s", flush=True)
    return dt


@jax.jit
def gather_only(sim):
    n_chunks = N // CHUNK

    def one(tok):
        S4 = sim[tok]  # [c, L, Q, T]
        return jnp.sum(S4.astype(jnp.float32), axis=(1, 2, 3))

    return jax.lax.map(one, tokens.reshape(n_chunks, CHUNK, L))


@jax.jit
def gather_layout(sim):
    n_chunks = N // CHUNK
    T1p = _round_up(T + 1, 8)

    def one(tok):
        c = tok.shape[0]
        S4 = sim[tok]
        S = jnp.transpose(S4.astype(jnp.float32), (1, 3, 0, 2)).reshape(L, T, c * Q)
        S = jnp.pad(S, ((0, 0), (0, T1p - T), (0, 0)))
        return jnp.sum(S, axis=(0, 1))

    return jax.lax.map(one, tokens.reshape(n_chunks, CHUNK, L))


_pos = jnp.zeros((N, L), jnp.int8)
_tag = jnp.zeros((N, L), jnp.int16)
_boost = jnp.ones((N,), jnp.float32)
_flt = (jnp.zeros((1,), bool),) * 3
_gv = (jnp.zeros((L + 1,), jnp.float32), jnp.zeros((T + 1,), jnp.float32))
_tw = (
    jnp.ones((T, Q), jnp.float32),
    jnp.full((T, Q), -1, jnp.int8),
    jnp.zeros((Q,), jnp.float32),
    jnp.full((Q,), -1.0, jnp.float32),
)


def full(sim):
    return _bucket_scores_multiquery(
        tokens, _pos, _tag, lengths, sim, len_t, gaps, norm_total, _boost,
        *_tw, *_flt, *_gv,
        locality="local", chunk=CHUNK, n_queries=Q,
        use_pallas=use_pallas_default(),
    )


# D: DP only — pre-laid-out S for one chunk, looped over all chunks
T1p = _round_up(T + 1, 8)
B = CHUNK * Q
S_fixed = jnp.asarray(rng.uniform(0, 1, size=(L, T1p, B)).astype(np.float32))
lens_fixed = jnp.asarray(
    np.tile(rng.integers(L // 2, L + 1, size=CHUNK).astype(np.int32), Q)
).reshape(1, B)
lt_fixed = jnp.full((1, B), T, jnp.int32)


@jax.jit
def _dp_only_impl(sim, S_f, lens_f, lt_f):
    n_chunks = N // CHUNK
    bias = sim[0, 0, 0] * 1e-12

    def one(_i, acc):
        out = _pallas_call_scores(
            S_f + bias, lens_f, lt_f,
            (0.0, 0.0, 0.0, 0.0), "local", 512, False,
        )
        return acc + jnp.sum(out)

    return jax.lax.fori_loop(0, n_chunks, one, jnp.float32(0.0))


def dp_only(sim):
    return _dp_only_impl(sim, S_fixed, lens_fixed, lt_fixed)


print("backend:", jax.default_backend(), " pallas:", use_pallas_default())
timed("A  gather only (f32)", gather_only, sim_multi)
timed("B  gather+layout (f32)", gather_layout, sim_multi)
timed("C  full pipeline (f32)", full, sim_multi)
timed("D  DP only (pallas)", dp_only, sim_multi)

sim_bf16 = sim_multi.astype(jnp.bfloat16)
timed("A' gather only (bf16 table)", gather_only, sim_bf16)
timed("B' gather+layout (bf16 table)", gather_layout, sim_bf16)

import os
os._exit(0)
