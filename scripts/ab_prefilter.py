"""Interleaved A/B of the provable MXU prefilter on the real TPU.

Builds the bench's 1M-slice Zipf corpus, warms find() with the prefilter
on AND off, then alternates modes per query in ONE process (CLAUDE.md
protocol — tunnel throughput varies ±30% between runs).  Reports p50/p90
per mode, the prefilter fallback rate (unprovable cuts), and per-phase
p50s for the prefiltered queries.

Usage: python scripts/ab_prefilter.py [n_sents] [n_queries_per_mode]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def log(msg):
    print(f"[abpf {time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr,
          flush=True)


def main(n_sents=1_000_000, n_q=12):
    import jax

    if os.environ.get("FORCE_CPU"):
        jax.config.update("jax_platforms", "cpu")
    cache_dir = os.environ.get(
        "VECTORIAN_JAX_CACHE", os.path.expanduser("~/.cache/vectorian_jax")
    )
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

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
    log(f"packed {index.packed.n_slices} slices")

    def zipf_query():
        return " ".join(
            words[int(i)]
            for i in np.minimum(rng.zipf(1.2, size=7), V_words - 1)
        )

    # warm both modes (compiles: full pass, prefilter kernels, counts)
    for mode in ("0", "1"):
        os.environ["VECTORIAN_PREFILTER"] = mode
        t0 = time.perf_counter()
        for _ in range(3):
            index.find(zipf_query(), n=10, min_score=0.2)
        log(f"warm mode={mode}: {time.perf_counter() - t0:.1f}s")

    time.sleep(3)  # settle window
    lat = {"0": [], "1": []}
    ev_pf = []
    fallbacks = 0
    for i in range(n_q * 2):
        mode = "01"[i % 2]
        os.environ["VECTORIAN_PREFILTER"] = mode
        q = zipf_query()
        trace.start()
        t0 = time.perf_counter()
        index.find(q, n=10, min_score=0.2)
        lat[mode].append(time.perf_counter() - t0)
        ev = trace.stop()
        if mode == "1":
            ev_pf.append(ev)
            if any(n == "find.pf_fallback" for n, _ in ev):
                fallbacks += 1

    out = {"n_slices": int(index.packed.n_slices)}
    for mode, name in (("0", "full"), ("1", "prefilter")):
        ms = np.asarray(lat[mode]) * 1e3
        out[f"p50_{name}_ms"] = round(float(np.percentile(ms, 50)), 1)
        out[f"p90_{name}_ms"] = round(float(np.percentile(ms, 90)), 1)
        log(f"{name}: p50 {out[f'p50_{name}_ms']} ms "
            f"p90 {out[f'p90_{name}_ms']} ms over {len(ms)}")
    out["pf_fallback_rate"] = round(fallbacks / max(n_q, 1), 3)
    log(f"fallback rate {out['pf_fallback_rate']}")

    names = sorted({n for ev in ev_pf for n, _ in ev})
    phases = {}
    for name in names:
        per_q = [sum(dt for n2, dt in ev if n2 == name) * 1e3
                 for ev in ev_pf]
        phases[name] = round(float(np.percentile(per_q, 50)), 2)
    out["pf_phases_p50_ms"] = phases
    for k, v in phases.items():
        log(f"  {k:24s} {v:8.2f} ms")
    print(json.dumps(out))
    os._exit(0)


if __name__ == "__main__":
    main(
        int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000,
        int(sys.argv[2]) if len(sys.argv) > 2 else 12,
    )
