"""Round 3 prefilter primitive measurements: side-term variants
(gather-free select vs 2D gather; unrolled eq-scan), top_k scaling with
M, and block-reduce two-level selection.  Chained protocol.

Usage: python scripts/profile_prefilter_stages3.py
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def log(msg):
    print(f"[pfs3 {time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr,
          flush=True)


def timed(fn, x0, iters=6):
    y = fn(x0)
    _ = float(np.asarray(y).ravel()[0])
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        y = x0
        for _ in range(iters):
            y = fn(y)
        _ = float(np.asarray(y).ravel()[0])
        times.append((time.perf_counter() - t0) / iters)
    return float(np.median(times))


def main():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.expanduser("~/.cache/vectorian_jax"),
    )
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    N, L, P, D1 = 1_000_000, 16, 16, 5
    tokens = jnp.asarray(
        np.minimum(rng.zipf(1.2, size=(N, L)), 4999).astype(np.int32)
    )
    ln = jnp.asarray(rng.integers(8, L + 1, size=(N,)).astype(np.int32))
    ids = jnp.asarray(rng.integers(256, 5000, size=(P,)).astype(np.int32))
    cs = jnp.asarray(rng.uniform(0, 1, size=(P, D1)).astype(np.float32))

    @jax.jit
    def side_unrolled(tokens, ln, ids, cs, x):
        valid = jnp.arange(L, dtype=jnp.int32)[None, :] < ln[:, None]
        tokm = jnp.where(valid, tokens, -1)
        total = jnp.zeros((N,), jnp.float32)
        for p in range(P):
            occ = jnp.sum(tokm == ids[p], axis=1, dtype=jnp.int32)
            occ_c = jnp.minimum(occ, D1)
            val = jnp.zeros((N,), jnp.float32)
            for c in range(1, D1 + 1):
                val = val + jnp.where(occ_c == c, cs[p, c - 1], 0.0)
            val = val + jnp.maximum(occ - D1, 0) * cs[p, D1 - 1]
            total = total + val
        return total + x[0]

    f = functools.partial(side_unrolled, tokens, ln, ids, cs)
    log(f"side unrolled P={P}: {timed(f, jnp.zeros((N,)))*1e3:.2f} ms")

    @jax.jit
    def side_batched(tokens, ln, ids, cs, x):
        valid = jnp.arange(L, dtype=jnp.int32)[None, :] < ln[:, None]
        tokm = jnp.where(valid, tokens, -1)
        occ = jnp.sum(
            tokm[:, :, None] == ids[None, None, :], axis=1,
            dtype=jnp.int32,
        )  # [N, P]
        occ_c = jnp.minimum(occ, D1)
        val = jnp.zeros((N, P), jnp.float32)
        for c in range(1, D1 + 1):
            val = val + jnp.where(occ_c == c, cs[None, :, c - 1], 0.0)
        val = val + jnp.maximum(occ - D1, 0) * cs[None, :, D1 - 1]
        return val.sum(axis=1) + x[0]

    f = functools.partial(side_batched, tokens, ln, ids, cs)
    log(f"side batched-select P={P}: {timed(f, jnp.zeros((N,)))*1e3:.2f} ms")

    ub0 = f(jnp.zeros((N,)))

    for M in (4096, 16384, 32768):
        @functools.partial(jax.jit, static_argnames=("m",))
        def topk(ub, m):
            vals, idx = jax.lax.top_k(ub, m + 1)
            return ub + vals[m] * 1e-9

        g = functools.partial(topk, m=M)
        log(f"top_k(1M, {M+1}): {timed(g, ub0)*1e3:.2f} ms")

    for B, MB in ((8, 4096), (16, 2048)):
        @functools.partial(jax.jit, static_argnames=("b", "mb"))
        def blocksel(ub, b, mb):
            g = ub.reshape(N // b, b)
            bm = jnp.max(g, axis=1)  # [N/b]
            vals, idx = jax.lax.top_k(bm, mb + 1)
            rest = vals[mb]
            rows = (idx[:mb, None] * b
                    + jnp.arange(b, dtype=jnp.int32)[None, :]).reshape(-1)
            sel = ub[rows]
            return ub + rest * 1e-9 + sel[0] * 1e-12

        g = functools.partial(blocksel, b=B, mb=MB)
        log(f"block-reduce b={B} top {MB} blocks (= {B*MB} slices): "
            f"{timed(g, ub0)*1e3:.2f} ms")
    os._exit(0)


if __name__ == "__main__":
    main()
