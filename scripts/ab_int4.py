"""A/B: int8 vs int4-packed [V, T, Q] similarity table (VERDICT r4 item 8).

The Q=512 serving pass gathers 4 KB [T, Q] int8 rows — near the
random-access HBM bytes floor.  An s4 table halves the row bytes; max-plus
homogeneity runs either through the unchanged DP kernels (gaps/scale in,
raw*scale out).  Interleaved in ONE process, chained iterations, medians
(the tunnel measurement protocol, CLAUDE.md).

Usage: python scripts/ab_int4.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax.numpy as jnp

    from vectorian_tpu.ops.alignment import AffineGapParams
    from vectorian_tpu.ops.search import (
        _bucket_scores_multiquery,
        use_pallas_default,
    )
    from vectorian_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()

    V, T, L = 50_000, 8, 32
    N = 1 << 17
    Q = 512
    CHUNK = int(os.environ.get("VECTORIAN_CHUNK", "1024"))

    rng = np.random.default_rng(0)
    tokens = jnp.asarray(rng.integers(1, V, size=(N, L), dtype=np.int32))
    lengths = jnp.asarray(rng.integers(L // 2, L + 1, size=N).astype(np.int32))
    sim_f32 = rng.uniform(0, 1, size=(V, T, Q)).astype(np.float32)
    mx = float(np.abs(sim_f32).max())
    scale8 = mx / 127.0
    sim_i8 = jnp.asarray(np.round(sim_f32 / scale8).astype(np.int8))
    scale4 = mx / 7.0
    # host->device transfer of s4 hits a jax recursion bug; upload int8
    # and narrow on device instead
    sim_i4 = jnp.asarray(
        np.clip(np.round(sim_f32 / scale4), -8, 7).astype(np.int8)
    ).astype(jnp.int4)
    len_t = jnp.full((Q,), T, jnp.int32)
    norm_total = jnp.full((Q,), float(T), jnp.float32)
    gaps = AffineGapParams.of(0.0, 0.0, 0.0, 0.0)
    use_pallas = use_pallas_default()

    pos_ids = jnp.zeros((N, L), jnp.int8)
    tag_ids = jnp.zeros((N, L), jnp.int16)
    boost = jnp.ones((N, 1), jnp.float32)
    flt = (jnp.zeros((1,), bool),) * 3
    gv = (jnp.zeros((L + 1,), jnp.float32), jnp.zeros((T + 1,), jnp.float32))
    tw_w = jnp.ones((T, Q), jnp.float32)
    tw_p = jnp.full((T, Q), -1, jnp.int8)
    pen = jnp.zeros((Q,), jnp.float32)
    thr = jnp.full((Q,), -1.0, jnp.float32)

    def run(sim, scale):
        return _bucket_scores_multiquery(
            tokens, pos_ids, tag_ids, lengths, sim, len_t, gaps, norm_total,
            boost, tw_w, tw_p, pen, thr, *flt, *gv,
            locality="local", chunk=CHUNK, n_queries=Q,
            use_pallas=use_pallas, sim_scale=jnp.asarray(scale, jnp.float32),
        )

    variants = {"int8": (sim_i8, scale8), "int4": (sim_i4, scale4)}
    outs = {}
    for name, (sim, sc) in variants.items():
        print(f"compiling {name}...", flush=True)
        outs[name] = run(sim, sc)
        print(name, "sample", float(outs[name][0, 0]), flush=True)
    # sanity: int4 scores within quantization error of int8's
    d = float(
        jnp.max(jnp.abs(outs["int8"][:256] - outs["int4"][:256]))
    )
    print(f"max |int8 - int4| over 256 slices: {d:.4f}")

    n_iters = 8
    times = {k: [] for k in variants}
    for _rep in range(3):
        for name, (sim, sc) in variants.items():
            t0 = time.perf_counter()
            s = sim
            for _ in range(n_iters):
                out = run(s, sc)
                s = sim + (out[0, 0] * 0).astype(sim.dtype)
            _ = float(out[0, 0])
            times[name].append((time.perf_counter() - t0) / n_iters)
    for name in variants:
        med = float(np.median(times[name]))
        rate = N * Q / med
        print(
            f"{name}: {med*1e3:.1f} ms/pass = {rate/1e6:.1f}M alignments/s "
            f"(runs: {[f'{t*1e3:.0f}' for t in times[name]]})"
        )


if __name__ == "__main__":
    main()
    os._exit(0)
