"""Phase breakdown of the Q=512/int8 throughput-mode find_batch pass on
the 1M-slice Zipf corpus (the bench's e2e_throughput_mode config).

Usage: python scripts/profile_batch512.py [n_sents] [Q]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def log(m):
    print(f"[p512 {time.strftime('%H:%M:%S')}] {m}", file=sys.stderr, flush=True)


def main(n_sents=1_000_000, Q=512):
    import jax

    if os.environ.get("FORCE_CPU"):
        jax.config.update("jax_platforms", "cpu")
    from vectorian_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    os.environ.setdefault("VECTORIAN_CHUNK", "1024")

    import vectorian_tpu as vt
    from vectorian_tpu.embedding.static import KeyedVectors
    from vectorian_tpu.metrics import EmbeddingTokenSim
    from vectorian_tpu.utils import trace

    rng = np.random.default_rng(0)
    V_words = 5_000

    def alpha_word(i):
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
    texts = []
    for _ in range(max(n_sents // 2000, 1)):
        ids = np.minimum(rng.zipf(1.2, size=(2000, 9)), V_words - 1)
        texts.append(
            " ".join(" ".join(words[i] for i in row) + "." for row in ids)
        )
    docs = [vt.StringImporter()(t, title=f"d{i}") for i, t in enumerate(texts)]
    session = vt.Session(docs, embeddings=[emb])
    index = session.partition("sentence").index(EmbeddingTokenSim(emb))
    log(f"packed {index.packed.n_slices} slices")

    def zq():
        return " ".join(
            words[int(i)]
            for i in np.minimum(rng.zipf(1.2, size=7), V_words - 1)
        )

    queries = [zq() for _ in range(Q)]
    t0 = time.perf_counter()
    index.find_batch(queries, n=10, min_score=0.2)
    log(f"warm {time.perf_counter()-t0:.1f}s")
    events, times = [], []
    for _ in range(3):
        trace.start()
        t0 = time.perf_counter()
        index.find_batch(queries, n=10, min_score=0.2)
        times.append(time.perf_counter() - t0)
        events.append(trace.stop())
    log(f"median pass {float(np.median(times)):.2f}s")
    names = sorted({n for ev in events for n, _ in ev})
    for n2 in names:
        per = [sum(d for m, d in ev if m == n2) for ev in events]
        cnt = [sum(1 for m, _ in ev if m == n2) for ev in events]
        log(
            f"  {n2:24s} {float(np.median(per)):7.2f} s "
            f"x{float(np.median(cnt)):.0f}"
        )


if __name__ == "__main__":
    main(
        int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000,
        int(sys.argv[2]) if len(sys.argv) > 2 else 512,
    )
    os._exit(0)
