"""Warm find() latency breakdown on the real TPU — VERDICT r3 item 1.

Builds the bench's 1M-slice Zipf corpus, warms every shape, then runs N
warm single queries with vectorian_tpu.utils.trace collecting per-phase
wall times (query prep, plan compile, table stack/upload, bucket
dispatch, the ONE blocking device fetch, host finalize, extra rescore
rounds).  Also measures the bare tunnel round-trip (tiny device_get) so
the unavoidable-RTT floor is explicit.  Writes LATENCY_r04.json.

Usage: python scripts/latency_breakdown.py [n_sents] [n_queries] [out]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def log(msg):
    print(f"[lat {time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)


def main(n_sents=1_000_000, n_queries=24, out_path="LATENCY_r04.json"):
    import jax

    if os.environ.get("FORCE_CPU"):
        jax.config.update("jax_platforms", "cpu")
    cache_dir = os.environ.get(
        "VECTORIAN_JAX_CACHE", os.path.expanduser("~/.cache/vectorian_jax")
    )
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

    import jax.numpy as jnp

    import vectorian_tpu as vt
    from vectorian_tpu.embedding.static import KeyedVectors
    from vectorian_tpu.metrics import EmbeddingTokenSim
    from vectorian_tpu.utils import trace

    # bare tunnel round trip: dispatch + host read of one f32
    dev_x = jnp.zeros((8,), jnp.float32)
    _ = float((dev_x + 1)[0])
    rtts = []
    for _ in range(10):
        t0 = time.perf_counter()
        _ = float((dev_x + 1)[0])
        rtts.append(time.perf_counter() - t0)
    rtt_ms = float(np.percentile(np.asarray(rtts) * 1e3, 50))
    log(f"bare dispatch+read round trip p50: {rtt_ms:.1f} ms")

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
    sents_per_doc = 2_000
    texts = []
    for _ in range(max(n_sents // sents_per_doc, 1)):
        ids = np.minimum(rng.zipf(1.2, size=(sents_per_doc, 9)), V_words - 1)
        texts.append(
            " ".join(" ".join(words[i] for i in row) + "." for row in ids)
        )
    log("corpus text built")
    docs = [vt.StringImporter()(t, title=f"d{i}") for i, t in enumerate(texts)]
    session = vt.Session(docs, embeddings=[emb])
    index = session.partition("sentence").index(EmbeddingTokenSim(emb))
    n_slices = index.packed.n_slices
    log(f"packed {n_slices} slices")

    def zipf_query():
        return " ".join(
            words[int(i)]
            for i in np.minimum(rng.zipf(1.2, size=7), V_words - 1)
        )

    # warm every shape the measured queries will touch
    for _ in range(3):
        index.find(zipf_query(), n=10, min_score=0.2)
    log("warm")

    lats, events = [], []
    for _ in range(n_queries):
        q = zipf_query()
        trace.start()
        t0 = time.perf_counter()
        index.find(q, n=10, min_score=0.2)
        lats.append(time.perf_counter() - t0)
        events.append(trace.stop())

    lats_ms = np.asarray(lats) * 1e3
    p50 = float(np.percentile(lats_ms, 50))
    p90 = float(np.percentile(lats_ms, 90))
    log(f"p50 {p50:.1f} ms  p90 {p90:.1f} ms over {n_queries} queries")

    # per-phase p50s + per-query counts
    names = sorted({n for ev in events for n, _ in ev})
    phases = {}
    for name in names:
        per_q = [sum(dt for n2, dt in ev if n2 == name) * 1e3 for ev in events]
        cnt = [sum(1 for n2, _ in ev if n2 == name) for ev in events]
        phases[name] = {
            "p50_ms": round(float(np.percentile(per_q, 50)), 2),
            "p90_ms": round(float(np.percentile(per_q, 90)), 2),
            "calls_p50": float(np.percentile(cnt, 50)),
        }
        log(f"  {name:24s} p50 {phases[name]['p50_ms']:8.2f} ms  "
            f"x{phases[name]['calls_p50']:.0f}")

    blocking = [
        sum(1 for n2, _ in ev if n2 in ("topk.fetch", "rescore_many"))
        for ev in events
    ]

    # interleaved A/B: two-stage unique gather on/off (CLAUDE.md protocol:
    # one process, alternating, medians — tunnel throughput varies ±30%
    # between runs, which fabricates separate-run "wins")
    ab = {}
    if os.environ.get("VECTORIAN_LAT_AB", "1") != "0":
        for mode in ("1", "0"):
            os.environ["VECTORIAN_UNIQ_GATHER"] = mode
            index.find(zipf_query(), n=10, min_score=0.2)  # compile/warm
        lat_ab = {"1": [], "0": []}
        for _ in range(max(n_queries // 2, 8)):
            q = zipf_query()
            for mode in ("1", "0"):
                os.environ["VECTORIAN_UNIQ_GATHER"] = mode
                t0 = time.perf_counter()
                index.find(q, n=10, min_score=0.2)
                lat_ab[mode].append(time.perf_counter() - t0)
        os.environ.pop("VECTORIAN_UNIQ_GATHER", None)
        ab = {
            "uniq_gather_p50_ms": round(
                float(np.percentile(np.asarray(lat_ab["1"]) * 1e3, 50)), 1
            ),
            "direct_gather_p50_ms": round(
                float(np.percentile(np.asarray(lat_ab["0"]) * 1e3, 50)), 1
            ),
        }
        log(f"A/B uniq {ab['uniq_gather_p50_ms']} ms vs direct "
            f"{ab['direct_gather_p50_ms']} ms")
    out = {
        "what": (
            "warm single-query find() latency breakdown, 1M-slice Zipf "
            "corpus, one real TPU chip through the tunnel "
            "(scripts/latency_breakdown.py)"
        ),
        "n_slices": int(n_slices),
        "n_queries": int(n_queries),
        "p50_ms": round(p50, 1),
        "p90_ms": round(p90, 1),
        "bare_dispatch_read_rtt_ms": round(rtt_ms, 1),
        "blocking_fetches_per_query_p50": float(np.percentile(blocking, 50)),
        "phases": phases,
        **ab,
        "date": time.strftime("%Y-%m-%d"),
    }
    with open(out_path, "w") as f:
        json.dump(out, f, indent=2)
        f.write("\n")
    log(f"wrote {out_path}")
    print(json.dumps(out))


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    q = int(sys.argv[2]) if len(sys.argv) > 2 else 24
    out = sys.argv[3] if len(sys.argv) > 3 else "LATENCY_r04.json"
    main(n, q, out)
    os._exit(0)
