"""Measure the Q=512 batched top-k term of the throughput pass:
lax.top_k([Q, N], kd+1) vs a two-stage (chunk-local + merge) variant.

Usage: python scripts/profile_topk512.py
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np


def log(m):
    print(f"[tk512 {time.strftime('%H:%M:%S')}] {m}", file=sys.stderr,
          flush=True)


def timed(fn, x0, iters=4):
    y = fn(x0)
    _ = float(np.asarray(y).ravel()[0])
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        y = x0
        for _ in range(iters):
            y = fn(y)
        _ = float(np.asarray(y).ravel()[0])
        ts.append((time.perf_counter() - t0) / iters)
    return float(np.median(ts))


def main():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.expanduser("~/.cache/vectorian_jax"),
    )
    import jax.numpy as jnp

    N, Q, K = 1_000_000, 512, 129
    rng = np.random.default_rng(0)
    scores = jnp.asarray(rng.normal(size=(N, Q)).astype(np.float32))

    @jax.jit
    def tk_direct(s):
        vals, idx = jax.lax.top_k(s.T, K)
        return s + vals[0, 0] * 1e-9

    log(f"direct top_k([Q={Q}, N={N}], {K}): "
        f"{timed(tk_direct, scores)*1e3:.0f} ms")

    B = 8192

    @jax.jit
    def tk_two_stage(s):
        g = s.reshape(N // B, B, Q)
        lv, li = jax.lax.top_k(jnp.swapaxes(g, 1, 2), K)  # [nb, Q, K]
        nb = N // B
        lv2 = jnp.swapaxes(lv, 0, 1).reshape(Q, nb * K)
        vals, idx = jax.lax.top_k(lv2, K)
        return s + vals[0, 0] * 1e-9

    log(f"two-stage (B={B}) top_k: {timed(tk_two_stage, scores)*1e3:.0f} ms")
    os._exit(0)


if __name__ == "__main__":
    main()
