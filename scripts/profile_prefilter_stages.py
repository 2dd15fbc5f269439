"""Profile the prefilter device chain stage by stage on the real TPU:
(a) the [N, W] int8 GEMV, (b) global lax.top_k(N, M+1), (c) grouped
per-block top-k select (candidate replacement for (b)), (d) compacted
gather+DP.  Chained-iteration timing (each iter consumes the previous
output) with a final forced host read — the only honest protocol through
the tunnel (CLAUDE.md).

Usage: python scripts/profile_prefilter_stages.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def log(msg):
    print(f"[pfst {time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr,
          flush=True)


def timed(fn, x0, iters=6):
    """Median s/iter over chained iterations, clock stopped after a host
    read of the final result."""
    y = fn(x0)
    _ = float(np.asarray(y)[0])  # warm + sync
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        y = x0
        for _ in range(iters):
            y = fn(y)
        _ = float(np.asarray(y)[0])
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
    N, W, M = 1_000_000, 1088, 8192
    L, T, V = 16, 8, 5000

    cnt = jnp.asarray(rng.integers(0, 3, size=(N, W)).astype(np.int8))
    uu = jnp.asarray(rng.uniform(0, 1, size=(W,)).astype(np.float32)
                     ).astype(jnp.bfloat16)
    tokens = jnp.asarray(rng.integers(0, V, size=(N, L)).astype(np.int32))
    table = jnp.asarray(
        rng.normal(size=(V, T, 1)).astype(np.float32)
    )

    # big arrays MUST be jit args, not closure constants (CLAUDE.md:
    # the tunnel's remote compile rejects baked-in programs, HTTP 413)
    @jax.jit
    def gemv(cnt, uu, x):
        ub = jax.lax.dot_general(
            cnt.astype(jnp.bfloat16), uu, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return ub + x[0]  # chain

    import functools
    g = functools.partial(gemv, cnt, uu)
    log(f"gemv [N={N}, W={W}]: {timed(g, jnp.zeros((N,)))*1e3:.2f} ms")

    ub0 = g(jnp.zeros((N,)))

    @jax.jit
    def topk_global(ub):
        vals, idx = jax.lax.top_k(ub, M + 1)
        return ub + vals[M] * 1e-9

    log(f"lax.top_k(N, {M+1}): {timed(topk_global, ub0)*1e3:.2f} ms")

    B, m = 1024, 16

    @jax.jit
    def topk_grouped(ub):
        g = ub[: (N // B) * B].reshape(N // B, B)
        vals, idx = jax.lax.top_k(g, m + 1)
        return ub + jnp.max(vals[:, m]) * 1e-9

    log(f"grouped top_k({B}->{m}): {timed(topk_grouped, ub0)*1e3:.2f} ms")

    @jax.jit
    def argsort_sel(ub):
        idx = jnp.argsort(-ub)
        return ub + idx[M] * 1e-9

    log(f"full argsort: {timed(argsort_sel, ub0)*1e3:.2f} ms")

    sel = jnp.asarray(rng.choice(N, size=M, replace=False).astype(np.int32))

    @jax.jit
    def gather_dp(tokens, table, sel, x):
        from vectorian_tpu.ops.alignment import (
            AffineGapParams, align_scores,
        )

        tok_c = tokens[sel]  # [M, L]
        S = table[tok_c][..., 0]  # [M, L, T]
        raw = align_scores.__wrapped__(
            S + x[0] * 1e-9,
            jnp.full((M,), L, jnp.int32),
            jnp.full((M,), T, jnp.int32),
            AffineGapParams.of(0.3, 0.1, 0.3, 0.1),
            "local",
        )
        return raw

    gd = functools.partial(gather_dp, tokens, table, sel)
    log(f"gather+DP on M={M}: {timed(gd, jnp.zeros((M,)))*1e3:.2f} ms")

    # counts build one-off
    from vectorian_tpu.ops import prefilter as pf

    groups = pf.cold_groups(512, V)
    t0 = time.perf_counter()
    c = pf.build_counts(tokens, jnp.full((N,), L, jnp.int32), H=512,
                        groups=groups, chunk=1024)
    _ = int(np.asarray(c[0, 0]))
    log(f"build_counts(N={N}, H=512): {time.perf_counter() - t0:.1f} s "
        f"(incl compile)")
    os._exit(0)


if __name__ == "__main__":
    main()
