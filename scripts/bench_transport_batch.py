"""Batched transport serving throughput: find_batch over WMD variants.

Refreshes docs/performance.md's batched-transport numbers on the current
serving path (provable-bound ranking + exact EMD rescore under the cut —
the Sinkhorn ranking it replaced scaled its iteration count with Q).

Q=64 queries over a ~32k-slice synthetic Zipf corpus, one chip.  Each
find_batch call blocks on host-materialized Match scores, so wall time per
call is an honest completion barrier; we run >=4 passes and report the
median (tunnel throughput varies +-30% between runs, CLAUDE.md).

Usage: python scripts/bench_transport_batch.py [n_sents] [Q]
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

    if os.environ.get("FORCE_CPU"):
        import jax

        jax.config.update("jax_platforms", "cpu")

    from vectorian_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()

    import vectorian_tpu as vt
    from vectorian_tpu.alignment import WordMoversDistance, WordRotatorsDistance
    from vectorian_tpu.embedding.static import KeyedVectors
    from vectorian_tpu.metrics import EmbeddingTokenSim
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

    variants = [
        ("relaxed WMD (nbow symmetric)", WordMoversDistance.rwmd("nbow")),
        ("full WMD (bound ranking)", WordMoversDistance.wmd("nbow")),
        ("WRD (bound ranking)", WordRotatorsDistance()),
    ]
    from vectorian_tpu.utils import trace

    for name, opt in variants:
        index = partition.index(OptimizedSpanSim(token_sim, opt))
        n_slices = index.packed.n_slices
        index.find_batch(queries, n=10, min_score=0.2)  # warm/compile
        if name.startswith("WRD"):
            # per-metric Sinkhorn-dual consume-filter A/B (VERDICT r4
            # item 6): WRD's looser two-sided bound leaves the largest
            # contested band — interleave filter on/off in ONE process
            ab = {"1": [], "0": []}
            for rep in range(8):
                mode = "10"[rep % 2]
                os.environ["VECTORIAN_DUAL_FILTER"] = mode
                t0 = time.perf_counter()
                res = index.find_batch(queries, n=10, min_score=0.2)
                ab[mode].append(time.perf_counter() - t0)
                assert len(res) == Q
            os.environ.pop("VECTORIAN_DUAL_FILTER", None)
            for mode, label in (("1", "dual-filter"), ("0", "no-filter")):
                d = float(np.median(ab[mode]))
                print(
                    f"{name + ' ' + label:34s} {d*1e3:8.0f} ms/pass  "
                    f"{d/Q*1e3:6.1f} ms/query amortized",
                    flush=True,
                )
        times, events = [], []
        for _ in range(4):
            trace.start()
            t0 = time.perf_counter()
            res = index.find_batch(queries, n=10, min_score=0.2)
            times.append(time.perf_counter() - t0)
            events.append(trace.stop())
            assert len(res) == Q
        dt = float(np.median(times))
        print(
            f"{name:34s} {dt*1e3:8.0f} ms/pass  "
            f"{dt/Q*1e3:6.1f} ms/query amortized  "
            f"({n_slices} slices, Q={Q})",
            flush=True,
        )
        names = sorted({n2 for ev in events for n2, _ in ev})
        for n2 in names:
            per = [sum(d for m, d in ev if m == n2) * 1e3 for ev in events]
            cnt = [sum(1 for m, _ in ev if m == n2) for ev in events]
            print(
                f"    {n2:24s} {float(np.median(per)):8.1f} ms "
                f"x{float(np.median(cnt)):.0f}",
                flush=True,
            )
    os._exit(0)


if __name__ == "__main__":
    main()
