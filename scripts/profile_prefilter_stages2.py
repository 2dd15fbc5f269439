"""Round 2 of prefilter primitive measurements on the real TPU:
int8xint8 MXU GEMV, sampled-quantile threshold + flatnonzero select +
scatter/masked-max residual, and the stage-2 refined-bound ops (row
gather + per-row sorts + small top_k).  Chained timing protocol.

Usage: python scripts/profile_prefilter_stages2.py
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def log(msg):
    print(f"[pfs2 {time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr,
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

    if os.environ.get("FORCE_CPU"):
        jax.config.update("jax_platforms", "cpu")
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.expanduser("~/.cache/vectorian_jax"),
    )
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    N, W = 1_000_000, 1088
    M1C, M2 = 81920, 8192
    L, V = 16, 5000
    STRIDE = 64

    cnt = jnp.asarray(rng.integers(0, 3, size=(N, W)).astype(np.int8))
    uu_q = jnp.asarray(rng.integers(0, 127, size=(W,)).astype(np.int8))
    tokens = jnp.asarray(rng.integers(0, V, size=(N, L)).astype(np.int32))
    u1 = jnp.asarray(rng.uniform(0, 1, size=(V,)).astype(np.float32))

    @jax.jit
    def gemv_i8(cnt, uu_q, x):
        ub = jax.lax.dot_general(
            cnt, uu_q, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        return ub + x[0].astype(jnp.int32)

    g = functools.partial(gemv_i8, cnt, uu_q)
    log(f"int8 gemv [N={N}, W={W}]: "
        f"{timed(g, jnp.zeros((N,), jnp.int32))*1e3:.2f} ms")
    ub0 = (g(jnp.zeros((N,), jnp.int32))).astype(jnp.float32)

    # W=512 variant (H=256)
    cnt2 = cnt[:, :512]
    g2 = functools.partial(gemv_i8, cnt2, uu_q[:512])
    log(f"int8 gemv [N={N}, W=512]: "
        f"{timed(g2, jnp.zeros((N,), jnp.int32))*1e3:.2f} ms")

    @jax.jit
    def thresh_select(ub):
        samp = ub[::STRIDE]
        r = max(M1C * 8 // 10 // STRIDE, 1)
        tau = jax.lax.top_k(samp, r)[0][r - 1]
        mask = ub >= tau
        sel = jnp.flatnonzero(mask, size=M1C, fill_value=-1)
        selmask = (
            jnp.zeros((N,), bool).at[jnp.maximum(sel, 0)]
            .set(sel >= 0, mode="drop")
        )
        ub_rest = jnp.max(jnp.where(selmask, -jnp.inf, ub))
        return ub + ub_rest * 1e-9 + sel[0] * 1e-12

    log(f"sampled-tau + flatnonzero({M1C}) + rest-max: "
        f"{timed(thresh_select, ub0)*1e3:.2f} ms")

    sel1 = jnp.asarray(rng.choice(N, size=M1C, replace=False).astype(np.int32))

    @jax.jit
    def refine(tokens, u1, sel1, x):
        rows = tokens[sel1]  # [M1C, L]
        ts = jnp.sort(rows, axis=1)
        first = jnp.concatenate(
            [jnp.ones((M1C, 1), bool), ts[:, 1:] != ts[:, :-1]], axis=1
        )
        vals = jnp.where(first, u1[ts], u1[ts] * 0.5)
        vs = jnp.sort(vals, axis=1)[:, ::-1]
        lt = 7
        ub2 = jnp.sum(vs[:, :lt], axis=1) + x[0] * 1e-9
        v2, p2 = jax.lax.top_k(ub2, M2 + 1)
        return ub2 + v2[M2] * 1e-9 + p2[0] * 1e-12

    r = functools.partial(refine, tokens, u1, sel1)
    log(f"stage2 refine (gather {M1C}x{L} + 2 sorts + top_k({M2})): "
        f"{timed(r, jnp.zeros((M1C,)))*1e3:.2f} ms")

    @jax.jit
    def topk_small(ub2):
        v2, p2 = jax.lax.top_k(ub2, M2 + 1)
        return ub2 + v2[M2] * 1e-9

    ub2_0 = r(jnp.zeros((M1C,)))
    log(f"top_k({M1C}, {M2+1}) alone: {timed(topk_small, ub2_0)*1e3:.2f} ms")
    os._exit(0)


if __name__ == "__main__":
    main()
