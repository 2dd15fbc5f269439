"""Split the Q=1 corpus pass: gather-only vs gather+DP vs int8 table.

Interleaved, chained, medians (tunnel protocol).  Decides where the
remaining single-query latency lives (LATENCY_r04: topk.fetch ~117 ms).

Usage: python scripts/profile_q1_pass.py [n_slices]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(N=1 << 20):
    import functools

    import jax
    import jax.numpy as jnp

    from vectorian_tpu.ops.alignment import AffineGapParams, align_scores
    from vectorian_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()

    V, T, L = 5_000, 8, 32
    CHUNK = 4096
    Q = 1
    rng = np.random.default_rng(0)
    # Zipf ids like the e2e corpus (frequency-ordered -> hot gather region)
    tokens = jnp.asarray(
        np.minimum(rng.zipf(1.2, size=(N, L)), V - 1).astype(np.int32)
    )
    lengths = jnp.asarray(rng.integers(L // 2, L + 1, size=N).astype(np.int32))
    sim_f32 = rng.uniform(0, 1, size=(V, T, Q)).astype(np.float32)
    table_f32 = jnp.asarray(sim_f32)
    scale8 = float(np.abs(sim_f32).max()) / 127.0
    table_i8 = jnp.asarray(np.round(sim_f32 / scale8).astype(np.int8))
    gaps = AffineGapParams.of(0.0, 0.0, 0.0, 0.0)
    lt = jnp.full((Q,), T, jnp.int32)
    n_chunks = N // CHUNK

    @functools.partial(jax.jit, static_argnames=("mode",))
    def pass_(table, mode: str):
        tokens_T = jnp.swapaxes(tokens.reshape(n_chunks, CHUNK, L), 1, 2)

        def one_chunk(args):
            (tokT, ln) = args
            S = table[tokT].astype(jnp.float32)  # [L, c, T, Q]
            if mode == "gather":
                return jnp.sum(S, axis=(0, 2, 3))
            S2 = jnp.transpose(S, (1, 3, 0, 2)).reshape(CHUNK * Q, L, T)
            ln_rep = jnp.repeat(jnp.maximum(ln, 1), Q)
            lt_rep = jnp.tile(lt, CHUNK)
            return align_scores(S2, ln_rep, lt_rep, gaps, "local").reshape(
                CHUNK, Q
            )[:, 0]

        return jax.lax.map(
            one_chunk, (tokens_T, lengths.reshape(n_chunks, CHUNK))
        ).reshape(N)

    variants = {
        "gather-f32": (table_f32, "gather"),
        "full-f32": (table_f32, "full"),
        "gather-i8": (table_i8, "gather"),
        "full-i8": (table_i8, "full"),
    }
    for name, (tb, mode) in variants.items():
        out = pass_(tb, mode)
        print(f"{name} warm, sample {float(out[0]):.3f}", flush=True)
    times = {k: [] for k in variants}
    for _rep in range(3):
        for name, (tb, mode) in variants.items():
            t0 = time.perf_counter()
            for _ in range(6):
                out = pass_(tb, mode)
            _ = float(out[0])
            times[name].append((time.perf_counter() - t0) / 6)
    for name in variants:
        med = float(np.median(times[name])) * 1e3
        print(f"{name:12s} {med:7.1f} ms/pass "
              f"({[f'{t*1e3:.0f}' for t in times[name]]})", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 20)
    os._exit(0)
