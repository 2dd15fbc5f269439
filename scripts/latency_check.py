"""End-to-end interactive query latency through the public API.

Builds a synthetic Zipf corpus of n sentences (default 100k), runs repeated
`index.find()` calls with varying queries/gap costs (no recompiles expected
after warmup), and reports p50/p90 wall latency — the full path including
query prep, similarity compile, device pass, top-k, flow traceback, and
Match construction.

Usage: python scripts/latency_check.py [n_sentences]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(n_sents=100_000):
    import vectorian_tpu as vt
    from vectorian_tpu.alignment import ConstantGapCost, LocalAlignment
    from vectorian_tpu.embedding.static import KeyedVectors
    from vectorian_tpu.metrics import EmbeddingTokenSim, OptimizedSpanSim

    rng = np.random.default_rng(0)
    V_words = 5_000

    def alpha_word(i):  # vanilla normalization requires isalpha
        s = ""
        i += 1
        while i:
            s += chr(ord("a") + i % 26)
            i //= 26
        return "w" + s

    words = [alpha_word(i) for i in range(V_words)]
    emb = KeyedVectors(
        "syn", words, rng.normal(size=(V_words, 300)).astype(np.float32)
    )

    print(f"building {n_sents}-sentence corpus...", flush=True)
    t0 = time.time()
    # Zipf word draw (realistic frequency profile)
    sents_per_doc = 2_000
    n_docs = n_sents // sents_per_doc
    texts = []
    for d in range(n_docs):
        ids = np.minimum(rng.zipf(1.2, size=(sents_per_doc, 9)), V_words - 1)
        sents = [" ".join(words[i] for i in row) + "." for row in ids]
        texts.append(" ".join(sents))
    docs = [vt.StringImporter()(t, title=f"d{i}") for i, t in enumerate(texts)]
    print(f"  imported in {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    session = vt.Session(docs, embeddings=[emb])
    index = session.partition("sentence").index(
        OptimizedSpanSim(EmbeddingTokenSim(emb), LocalAlignment(ConstantGapCost(0)))
    )
    print(f"  session+index in {time.time()-t0:.1f}s", flush=True)

    queries = [
        " ".join(words[int(i)] for i in np.minimum(rng.zipf(1.2, size=6), V_words - 1))
        for _ in range(24)
    ]
    # warm (compiles per bucket shape)
    t0 = time.time()
    r = index.find(queries[0], n=10)
    print(f"  first query (compile): {time.time()-t0:.1f}s, "
          f"{len(r)} matches", flush=True)

    lat = []
    for q in queries:
        t0 = time.perf_counter()
        r = index.find(q, n=10)
        lat.append(time.perf_counter() - t0)
    lat = np.asarray(lat) * 1e3
    n_slices = index.packed.n_slices
    print(
        f"find() over {n_slices} slices: p50 {np.percentile(lat, 50):.0f} ms, "
        f"p90 {np.percentile(lat, 90):.0f} ms, min {lat.min():.0f} ms",
        flush=True,
    )

    # interactive gap-cost change must not recompile
    t0 = time.perf_counter()
    index2 = session.partition("sentence").index(
        OptimizedSpanSim(EmbeddingTokenSim(emb), LocalAlignment(ConstantGapCost(0.4)))
    )
    r = index2.find(queries[0], n=10)
    print(f"gap-cost change query: {(time.perf_counter()-t0)*1e3:.0f} ms "
          f"(no recompile expected)", flush=True)


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    main(n)
    os._exit(0)
