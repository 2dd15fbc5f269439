"""Corpus-scale check: 1M+ sentence slices on one chip (BASELINE config 5).

Packs a synthetic Zipf corpus of ~1M sentences, runs single-query and
batched searches through the real engine path, and reports p50 query
latency + alignments/sec with honest chained timing.

Usage: python scripts/scale_check.py [n_slices]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(n_slices=1_000_000):
    import jax
    import jax.numpy as jnp

    from vectorian_tpu.ops.alignment import AffineGapParams
    from vectorian_tpu.ops.search import (
        _bucket_scores_multiquery,
        use_pallas_default,
    )

    V, T, L = 50_000, 8, 32
    Q = 128
    CHUNK = 1024
    rng = np.random.default_rng(0)

    print(f"packing {n_slices} slices (V={V}, L<={L})...", flush=True)
    t0 = time.time()
    tok = np.minimum(rng.zipf(1.3, size=(n_slices, L)), V - 1).astype(np.int32)
    lengths = rng.integers(5, L + 1, size=n_slices).astype(np.int32)
    # pad rows to CHUNK multiple
    pad = (-n_slices) % CHUNK
    tok = np.pad(tok, ((0, pad), (0, 0)))
    lengths_p = np.pad(lengths, (0, pad))
    tokens_d = jnp.asarray(tok)
    lengths_d = jnp.asarray(lengths_p)
    print(f"  packed+uploaded in {time.time()-t0:.1f}s "
          f"({tok.nbytes/1e9:.2f} GB tokens in HBM)", flush=True)

    sim0 = jnp.asarray(rng.uniform(0, 1, size=(V, T, Q)).astype(np.float32))
    lt = jnp.full((Q,), T, jnp.int32)
    nt = jnp.full((Q,), float(T), jnp.float32)
    gaps = AffineGapParams.of(0.0, 0.0, 0.0, 0.0)
    up = use_pallas_default()
    pos_d = jnp.zeros(tokens_d.shape, jnp.int8)

    def tw(q):
        return (
            jnp.ones((T, q), jnp.float32),
            jnp.full((T, q), -1, jnp.int8),
            jnp.zeros((q,), jnp.float32),
            jnp.full((q,), -1.0, jnp.float32),
        )

    tag_d = jnp.zeros(tokens_d.shape, jnp.int16)
    boost_d = jnp.ones(tokens_d.shape[:1], jnp.float32)
    flt = (jnp.zeros((1,), bool),) * 3
    gv = (
        jnp.zeros((tokens_d.shape[1] + 1,), jnp.float32),
        jnp.zeros((T + 1,), jnp.float32),
    )

    def run(sim):
        return _bucket_scores_multiquery(
            tokens_d, pos_d, tag_d, lengths_d, sim, lt, gaps, nt, boost_d,
            *tw(Q), *flt, *gv,
            locality="local", chunk=CHUNK, n_queries=Q, use_pallas=up,
        )

    out = run(sim0)
    _ = float(out[0, 0])
    print("compiled.", flush=True)

    k = 4
    t0 = time.perf_counter()
    sim = sim0
    for _ in range(k):
        out = run(sim)
        sim = sim0 + out[0, 0] * 1e-12
    _ = float(out[0, 0])
    dt = (time.perf_counter() - t0) / k
    n_total = tok.shape[0]
    print(
        f"batched Q={Q}: {dt*1e3:.0f} ms/pass over {n_total} slices "
        f"-> {n_total*Q/dt/1e6:.1f}M alignments/s, "
        f"p50 per-query latency (amortized) = {dt/Q*1e3:.1f} ms",
        flush=True,
    )

    # single query (Q=1) latency
    sim1 = sim0[:, :, :1]
    lt1, nt1 = lt[:1], nt[:1]

    def run1(sim):
        return _bucket_scores_multiquery(
            tokens_d, pos_d, tag_d, lengths_d, sim, lt1, gaps, nt1, boost_d,
            *tw(1), *flt, *gv,
            locality="local", chunk=CHUNK, n_queries=1, use_pallas=up,
        )

    out = run1(sim1)
    _ = float(out[0, 0])
    t0 = time.perf_counter()
    sim = sim1
    for _ in range(k):
        out = run1(sim)
        sim = sim1 + out[0, 0] * 1e-12
    _ = float(out[0, 0])
    dt1 = (time.perf_counter() - t0) / k
    print(
        f"single query: {dt1*1e3:.0f} ms p50 latency over {n_total} slices "
        f"-> {n_total/dt1/1e6:.1f}M alignments/s",
        flush=True,
    )


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    main(n)
