"""Gather microbenchmarks: what actually moves the vocab-gather bottleneck.

Variants: f32/bf16/int8 tables, sorted vs random indices, row width (Q).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

V, T, L = 50_000, 8, 32
N = 1 << 17
CHUNK = 1024
rng = np.random.default_rng(0)
tok_np = rng.integers(1, V, size=(N, L), dtype=np.int32)
tokens = jnp.asarray(tok_np)
tokens_sorted = jnp.asarray(np.sort(tok_np.reshape(N // CHUNK, CHUNK * L), axis=1).reshape(N, L))
# zipf-ish corpus distribution (real corpora are heavily skewed)
zipf = np.minimum((np.random.default_rng(1).zipf(1.3, size=(N, L)) - 1), V - 1).astype(np.int32)
tokens_zipf = jnp.asarray(zipf)


def timed(name, fn, table, tok, iters=4):
    out = fn(table, tok)
    _ = float(jnp.ravel(out)[0])
    t0 = time.perf_counter()
    tb = table
    for _ in range(iters):
        out = fn(tb, tok)
        tb = table + jnp.ravel(out)[0].astype(table.dtype) * 0
    _ = float(jnp.ravel(out)[0])
    dt = (time.perf_counter() - t0) / iters
    ns_per_idx = dt / (N * L) * 1e9
    print(f"{name:38s} {dt*1e3:9.1f} ms   {ns_per_idx:6.1f} ns/idx", flush=True)
    return dt


def make_gather(Q):
    @jax.jit
    def gather(table, tok):
        n_chunks = N // CHUNK

        def one(tk):
            S = table[tk]
            return jnp.sum(S.astype(jnp.float32), axis=tuple(range(1, S.ndim)))

        return jax.lax.map(one, tok.reshape(n_chunks, CHUNK, L))

    return gather


g = make_gather(None)
for Q in (32, 128, 256):
    tab_f32 = jnp.asarray(rng.uniform(0, 1, size=(V, Q * T)).astype(np.float32))
    timed(f"f32   Q={Q:4d} rows={Q*T*4}B", g, tab_f32, tokens)
for Q in (128, 256, 512):
    tab_bf16 = jnp.asarray(rng.uniform(0, 1, size=(V, Q * T)).astype(np.float32)).astype(jnp.bfloat16)
    timed(f"bf16  Q={Q:4d} rows={Q*T*2}B", g, tab_bf16, tokens)
Q = 128
tab_i8 = jnp.asarray((rng.uniform(0, 1, size=(V, Q * T)) * 255).astype(np.int8))
timed(f"int8  Q={Q:4d} rows={Q*T}B", g, tab_i8, tokens)
tab_bf16 = jnp.asarray(rng.uniform(0, 1, size=(V, Q * T)).astype(np.float32)).astype(jnp.bfloat16)
timed("bf16  Q= 128 sorted idx", g, tab_bf16, tokens_sorted)
timed("bf16  Q= 128 zipf idx", g, tab_bf16, tokens_zipf)
tab_f32 = jnp.asarray(rng.uniform(0, 1, size=(V, Q * T)).astype(np.float32))
timed("f32   Q= 128 sorted idx", g, tab_f32, tokens_sorted)
timed("f32   Q= 128 zipf idx", g, tab_f32, tokens_zipf)

os._exit(0)
