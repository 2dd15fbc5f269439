"""A/B: f32 vs bf16 [V, T, Q] similarity table through the multiquery pass.

Interleaved in ONE process, chained iterations, medians — per the tunnel
measurement protocol (docs/performance.md "Measuring honestly").
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

    V, T, L = 50_000, 8, 32
    N = 1 << 17
    Q = 512
    CHUNK = 1024

    rng = np.random.default_rng(0)
    tokens = jnp.asarray(rng.integers(1, V, size=(N, L), dtype=np.int32))
    lengths = jnp.asarray(rng.integers(L // 2, L + 1, size=N).astype(np.int32))
    sim_f32 = jnp.asarray(rng.uniform(0, 1, size=(V, T, Q)).astype(np.float32))
    sim_bf16 = sim_f32.astype(jnp.bfloat16)
    len_t = jnp.full((Q,), T, jnp.int32)
    norm_total = jnp.full((Q,), float(T), jnp.float32)
    gaps = AffineGapParams.of(0.0, 0.0, 0.0, 0.0)
    use_pallas = use_pallas_default()

    pos_ids = jnp.zeros((N, L), jnp.int8)
    tag_ids = jnp.zeros((N, L), jnp.int16)
    boost = jnp.ones((N,), jnp.float32)
    flt = (jnp.zeros((1,), bool),) * 3
    gv = (jnp.zeros((L + 1,), jnp.float32), jnp.zeros((T + 1,), jnp.float32))
    tw_w = jnp.ones((T, Q), jnp.float32)
    tw_p = jnp.full((T, Q), -1, jnp.int8)
    pen = jnp.zeros((Q,), jnp.float32)
    thr = jnp.full((Q,), -1.0, jnp.float32)

    def run(sim):
        return _bucket_scores_multiquery(
            tokens, pos_ids, tag_ids, lengths, sim, len_t, gaps, norm_total,
            boost, tw_w, tw_p, pen, thr, *flt, *gv,
            locality="local", chunk=CHUNK, n_queries=Q,
            use_pallas=use_pallas,
        )

    # warm both variants
    o32 = run(sim_f32); _ = float(o32[0, 0])
    o16 = run(sim_bf16); _ = float(o16[0, 0])
    # accuracy check
    a = np.asarray(o32[:2048])
    b = np.asarray(o16[:2048])
    print("max |f32-bf16| score diff:", float(np.abs(a - b).max()))

    K = 6  # chained iterations per timed sample
    times = {"f32": [], "bf16": []}
    for rep in range(5):
        for name, sim0 in (("f32", sim_f32), ("bf16", sim_bf16)):
            sim = sim0
            out = run(sim)
            _ = float(out[0, 0])
            t0 = time.perf_counter()
            for _i in range(K):
                out = run(sim)
                sim = sim0 + out[0, 0].astype(sim0.dtype) * 0
            _ = float(out[0, 0])
            times[name].append((time.perf_counter() - t0) / K)
    for name, ts in times.items():
        med = np.median(ts)
        print(f"{name}: median {med*1e3:.1f} ms/pass  "
              f"({N*Q/med/1e6:.1f}M alignments/s)  all={[round(t*1e3,1) for t in ts]}")

    os._exit(0)


if __name__ == "__main__":
    main()
