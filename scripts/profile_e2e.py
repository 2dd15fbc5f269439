"""Phase breakdown of find_batch at bench-e2e scale: where do the
~4.9s/32-query go?  Wraps the engine's dispatch / top-k-fetch /
rescore_many phases with wall clocks (warm pass only; first pass
compiles).  Usage: python scripts/profile_e2e.py [n_sents] [Q]."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

n_sents = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
Q = int(sys.argv[2]) if len(sys.argv) > 2 else 32

import jax

cache_dir = os.path.expanduser("~/.cache/vectorian_jax")
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
os.environ.setdefault("VECTORIAN_CHUNK", "1024")

import vectorian_tpu as vt
from vectorian_tpu.embedding.static import KeyedVectors
from vectorian_tpu.metrics import EmbeddingTokenSim
from vectorian_tpu.ops import search as S

LOG = []


def _wrap(cls, name):
    orig = getattr(cls, name)

    def timed(self, *a, **k):
        t0 = time.perf_counter()
        r = orig(self, *a, **k)
        LOG.append((f"{cls.__name__}.{name}", time.perf_counter() - t0))
        return r

    setattr(cls, name, timed)


_wrap(S.BruteForceEngine, "_dispatch_multi")
_wrap(S.BucketTopKSource, "__init__")
_wrap(S.BucketTopKSource, "above_many")
_wrap(S.BucketTopKSource, "above_exact_many")
_wrap(S.BucketTopKSource, "_above_impl")
_wrap(S.BruteForceEngine, "rescore_many")
_wrap(S.BruteForceEngine, "_stacked_plan_tables")
_wrap(S.BruteForceEngine, "batch_slice_similarity")

# inside rescore_many: device_get wait vs host traceback
_orig_get = jax.device_get


def _timed_get(x):
    t0 = time.perf_counter()
    r = _orig_get(x)
    LOG.append(("jax.device_get", time.perf_counter() - t0))
    return r


jax.device_get = _timed_get

for _name in ("traceback", "traceback_general"):
    _orig_tb = getattr(S, _name)

    def _mk(fn):
        def timed(*a, **k):
            t0 = time.perf_counter()
            r = fn(*a, **k)
            LOG.append(("host_traceback", time.perf_counter() - t0))
            return r

        return timed

    setattr(S, _name, _mk(_orig_tb))

def _alpha_word(i):
    s = ""
    i += 1
    while i:
        s += chr(ord("a") + i % 26)
        i //= 26
    return "w" + s


rng = np.random.default_rng(0)
V_words = 5_000
words = [_alpha_word(i) for i in range(V_words)]
emb = KeyedVectors("syn", words, rng.normal(size=(V_words, 300)).astype(np.float32))
sents_per_doc = 2_000
n_docs = max(n_sents // sents_per_doc, 1)
texts = []
for _ in range(n_docs):
    ids = np.minimum(rng.zipf(1.2, size=(sents_per_doc, 9)), V_words - 1)
    texts.append(" ".join(" ".join(words[i] for i in row) + "." for row in ids))
print(f"[{time.strftime('%H:%M:%S')}] corpus text built", flush=True)
docs = [vt.StringImporter()(t, title=f"d{i}") for i, t in enumerate(texts)]
session = vt.Session(docs, embeddings=[emb])
index = session.partition("sentence").index(EmbeddingTokenSim(emb))
print(
    f"[{time.strftime('%H:%M:%S')}] packed {index.packed.n_slices} slices, "
    f"{len(index._engine._device_buckets)} device buckets",
    flush=True,
)


def zipf_query():
    return " ".join(
        words[int(i)] for i in np.minimum(rng.zipf(1.2, size=7), V_words - 1)
    )


queries = [zipf_query() for _ in range(Q)]
index.find_batch(queries, n=10, min_score=0.2)  # warm/compile
print(f"[{time.strftime('%H:%M:%S')}] warm done", flush=True)

for trial in range(3):
    LOG.clear()
    t0 = time.perf_counter()
    res = index.find_batch(queries, n=10, min_score=0.2)
    wall = time.perf_counter() - t0
    by = {}
    for name, dt in LOG:
        agg = by.setdefault(name, [0.0, 0])
        agg[0] += dt
        agg[1] += 1
    print(f"--- trial {trial}: wall {wall:.3f}s for Q={Q}")
    tracked = 0.0
    for name, (tot, cnt) in sorted(by.items(), key=lambda t: -t[1][0]):
        print(f"  {name:42s} {tot:7.3f}s  x{cnt}")
        if name not in (
            "BruteForceEngine.batch_slice_similarity",  # nested
            "jax.device_get",
            "host_traceback",
        ):
            tracked += tot
    print(f"  {'(untracked: prep, numpy, Match build)':42s} {wall - tracked:7.3f}s")

os._exit(0)
