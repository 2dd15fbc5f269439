"""Can sorted gather + unpermute beat a direct random gather?

Pack time gives us sorted indices + inverse permutation for free (corpus is
static).  The question is whether un-permuting the gathered rows (scatter or
second gather) costs less than what sorting saves.
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
Q = 128
QT = Q * T
rng = np.random.default_rng(0)
tok_np = rng.integers(1, V, size=(N, L), dtype=np.int32)

flat = tok_np.reshape(N // CHUNK, CHUNK * L)
order = np.argsort(flat, axis=1, kind="stable").astype(np.int32)
sorted_tok = np.take_along_axis(flat, order, axis=1)
inv = np.empty_like(order)
rows = np.arange(N // CHUNK)[:, None]
inv[rows, order] = np.arange(CHUNK * L, dtype=np.int32)[None, :]

tokens = jnp.asarray(tok_np)
tok_sorted = jnp.asarray(sorted_tok)  # [n_chunks, CHUNK*L]
inv_perm = jnp.asarray(inv)  # [n_chunks, CHUNK*L]
order_d = jnp.asarray(order)


def timed(name, fn, table, iters=4):
    out = fn(table)
    _ = float(jnp.ravel(out)[0])
    t0 = time.perf_counter()
    tb = table
    for _ in range(iters):
        out = fn(tb)
        tb = table + jnp.ravel(out)[0].astype(table.dtype) * 0
    _ = float(jnp.ravel(out)[0])
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:44s} {dt*1e3:9.1f} ms", flush=True)
    return dt


@jax.jit
def direct(table):
    def one(tk):
        S = table[tk]
        return jnp.sum(S.astype(jnp.float32), axis=tuple(range(1, S.ndim)))

    return jax.lax.map(one, tokens.reshape(N // CHUNK, CHUNK, L))


@jax.jit
def sorted_then_gather_unperm(table):
    def one(args):
        tk, ip = args
        S = table[tk]  # [CHUNK*L, QT] coherent reads
        S2 = S[ip]  # random VMEM->HBM gather to restore order
        return jnp.sum(S2.astype(jnp.float32), axis=-1)

    return jax.lax.map(one, (tok_sorted, inv_perm))


@jax.jit
def sorted_then_scatter(table):
    def one(args):
        tk, ip = args
        S = table[tk]
        out = jnp.zeros(S.shape, jnp.float32)
        out = out.at[ip].set(S.astype(jnp.float32))
        return jnp.sum(out, axis=-1)

    return jax.lax.map(one, (tok_sorted, inv_perm))


@jax.jit
def sorted_only(table):
    def one(tk):
        S = table[tk]
        return jnp.sum(S.astype(jnp.float32), axis=-1)

    return jax.lax.map(one, tok_sorted)


for dt_name, conv in (("f32", lambda x: x), ("bf16", lambda x: x.astype(jnp.bfloat16))):
    table = conv(jnp.asarray(rng.uniform(0, 1, size=(V, QT)).astype(np.float32)))
    timed(f"{dt_name} direct random gather", direct, table)
    timed(f"{dt_name} sorted gather only (floor)", sorted_only, table)
    timed(f"{dt_name} sorted gather + gather unperm", sorted_then_gather_unperm, table)
    timed(f"{dt_name} sorted gather + scatter unperm", sorted_then_scatter, table)

os._exit(0)
