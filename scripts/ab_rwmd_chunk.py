"""A/B the relaxed-WMD multi-query kernel's chunk size on the real chip.

The serving rule shrinks chunk so chunk*Q <= 4096 (ops/wmd.py:1224) to
bound the greedy fill's O(L^2) mask ([chunk*Q, T, L, L] floats).  That cap
ignores L and T, so short-needle workloads run tiny chunks = many lax.map
steps.  This sweeps chunk at fixed Q on the bench_transport_batch workload,
interleaved in ONE process with chained iterations (tunnel throughput
varies +-30% between runs, CLAUDE.md), and prints median ms/pass per chunk.

Usage: python scripts/ab_rwmd_chunk.py [n_sents] [Q] [chunks, e.g. 64,128,256]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _alpha_word(i: int) -> str:
    s = ""
    i += 1
    while i:
        s += chr(ord("a") + i % 26)
        i //= 26
    return "w" + s


def main():
    n_sents = int(sys.argv[1]) if len(sys.argv) > 1 else 32_000
    Q = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    chunks = (
        [int(c) for c in sys.argv[3].split(",")]
        if len(sys.argv) > 3
        else [64, 128, 256]
    )

    if os.environ.get("FORCE_CPU"):
        import jax

        jax.config.update("jax_platforms", "cpu")

    from vectorian_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()

    import jax.numpy as jnp

    import vectorian_tpu as vt
    from vectorian_tpu.alignment import WordMoversDistance
    from vectorian_tpu.embedding.static import KeyedVectors
    from vectorian_tpu.metrics import EmbeddingTokenSim
    from vectorian_tpu.ops import wmd as W
    from vectorian_tpu.sim.span import OptimizedSpanSim

    rng = np.random.default_rng(0)
    V_words = 5_000
    words = [_alpha_word(i) for i in range(V_words)]
    emb = KeyedVectors(
        "syn", words, rng.normal(size=(V_words, 300)).astype(np.float32)
    )
    sents_per_doc = 2_000
    n_docs = max(n_sents // sents_per_doc, 1)
    texts = []
    for _ in range(n_docs):
        ids = np.minimum(rng.zipf(1.2, size=(sents_per_doc, 9)), V_words - 1)
        texts.append(
            " ".join(" ".join(words[i] for i in row) + "." for row in ids)
        )
    docs = [vt.StringImporter()(t, title=f"d{i}") for i, t in enumerate(texts)]
    session = vt.Session(docs, embeddings=[emb])
    partition = session.partition("sentence")
    token_sim = EmbeddingTokenSim(emb)

    def zipf_query():
        return " ".join(
            words[int(i)]
            for i in np.minimum(rng.zipf(1.2, size=7), V_words - 1)
        )

    queries = [zipf_query() for _ in range(Q)]
    index = partition.index(
        OptimizedSpanSim(token_sim, WordMoversDistance.rwmd("nbow"))
    )

    # record the kernel invocations of one real pass
    kernel_calls = []
    _orig = W._bucket_rwmd_scores_multi

    def _rec(*a, **k):
        kernel_calls.append((a, dict(k)))
        return _orig(*a, **k)

    W._bucket_rwmd_scores_multi = _rec
    index.find_batch(queries, n=10, min_score=0.2)
    W._bucket_rwmd_scores_multi = _orig
    calls = list(kernel_calls)
    print(
        f"{len(calls)} bucket kernels; Ls="
        f"{[a[0].shape[1] for a, _ in calls]}, "
        f"Ns={[a[0].shape[0] for a, _ in calls]}",
        flush=True,
    )

    def one_pass(chunk_for, eps):
        outs = []
        for a, k in calls:
            k2 = dict(k)
            N = a[0].shape[0]
            c = min(chunk_for, N)
            while N % c:  # kernel reshapes to [N//chunk, chunk, L]
                c //= 2
            k2["chunk"] = c
            a2 = (a[0], a[1], a[2], a[3], a[4] + eps) + a[5:]
            outs.append(_orig(*a2, **k2))
        return outs

    zero = jnp.zeros((), calls[0][0][4].dtype)
    # compile/warm every variant first
    for c in chunks:
        outs = one_pass(c, zero)
        _ = float(outs[-1][0, 0])
        print(f"chunk {c}: compiled", flush=True)

    n_iters = 4
    results = {c: [] for c in chunks}
    for _round in range(5):
        for c in chunks:  # interleaved
            t0 = time.perf_counter()
            eps = zero
            for _ in range(n_iters):
                outs = one_pass(c, eps)
                eps = (outs[-1][0, 0] * 1e-12).astype(zero.dtype)
            _ = float(outs[-1][0, 0])
            results[c].append((time.perf_counter() - t0) / n_iters)
    for c in chunks:
        med = float(np.median(results[c])) * 1e3
        print(f"chunk {c:5d}: {med:8.1f} ms/pass (median of 5 chains)")
    os._exit(0)


if __name__ == "__main__":
    main()
