"""Headline benchmark: sentence-alignments/sec/chip.

North-star target (BASELINE.json): >= 10M sentence-alignments/sec/chip on
TPU v5e.  One "sentence alignment" = one full Smith-Waterman DP of a
(sentence-slice x query) pair including the similarity gather — the
reference's per-slice unit of work (MatcherImpl::match loop,
vectorian/core/cpp/match/matcher_impl.h:66-176).

Prints ONE json line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from vectorian_tpu.ops.alignment import AffineGapParams
    from vectorian_tpu.ops.search import _bucket_scores

    # benchmark config ~ PR1 reference scaled up: fastText-300d-style vocab,
    # local alignment, 8-token query, sentence slices of <=32 tokens.
    V, T = 50_000, 8
    L = 32
    N = 1 << 17  # 131072 slices
    CHUNK = 8192

    rng = np.random.default_rng(0)
    tokens = rng.integers(1, V, size=(N, L), dtype=np.int32)
    lengths = rng.integers(L // 2, L + 1, size=N).astype(np.int32)
    pos = np.zeros((N, L), np.int8)
    sim_vocab = rng.uniform(0, 1, size=(V, T)).astype(np.float32)
    boost = np.ones((N,), np.float32)

    gaps = AffineGapParams.of(0.0, 0.0, 0.0, 0.0)
    zero_t = jnp.zeros((T,), jnp.float32)
    zero_t8 = jnp.zeros((T,), jnp.int8)
    zero = jnp.asarray(0.0, jnp.float32)

    d_tokens = jnp.asarray(tokens)
    d_pos = jnp.asarray(pos)
    d_lengths = jnp.asarray(lengths)
    d_sim = jnp.asarray(sim_vocab)
    d_boost = jnp.asarray(boost)

    def run():
        return _bucket_scores(
            d_tokens, d_pos, d_lengths, d_sim,
            jnp.asarray(T, jnp.int32), gaps, d_boost,
            jnp.asarray(float(T), jnp.float32),
            zero_t, zero_t8, zero, zero,
            locality="local", chunk=CHUNK, with_tags=False,
        )

    # warmup / compile
    run().block_until_ready()

    n_iters = 5
    t0 = time.perf_counter()
    for _ in range(n_iters):
        out = run()
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / n_iters

    alignments_per_sec = N / dt
    baseline = 10_000_000.0  # north-star target, BASELINE.md
    print(
        json.dumps(
            {
                "metric": "sentence-alignments/sec/chip",
                "value": round(alignments_per_sec, 1),
                "unit": "alignments/s",
                "vs_baseline": round(alignments_per_sec / baseline, 4),
            }
        )
    )


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    main()
