"""Phase breakdown of the batched relaxed-WMD serving pass.

Where do bench_transport_batch.py's ms/pass go?  Monkeypatch-times the
phases of ``WMDEngine.find_batch`` (relaxed path, ops/wmd.py:1089):

  kernel     : bare `_bucket_rwmd_scores_multi` chained ms/pass (device
               compute + dispatch, no top-k fetch) — measured separately
  topk       : BucketTopKSource.top_k_exactly_many (blocks on the device
               scores, so it contains kernel time on the first pass wall)
  sims_fetch : WMDEngine._sims_many_static (fused candidate-sims fetch)
  rescore    : WMDEngine._host_rescore total across queries
  other      : total - (topk + sims_fetch + rescore)

Usage: python scripts/profile_transport_batch.py [n_sents] [Q]
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


class _Acc:
    def __init__(self):
        self.t = 0.0
        self.n = 0

    def wrap(self, fn):
        def inner(*a, **k):
            t0 = time.perf_counter()
            out = fn(*a, **k)
            self.t += time.perf_counter() - t0
            self.n += 1
            return out

        return inner


def main():
    n_sents = int(sys.argv[1]) if len(sys.argv) > 1 else 32_000
    Q = int(sys.argv[2]) if len(sys.argv) > 2 else 64

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
    from vectorian_tpu.ops import search as S
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
    n_slices = index.packed.n_slices
    index.find_batch(queries, n=10, min_score=0.2)  # warm/compile

    topk = _Acc()
    sims = _Acc()
    resc = _Acc()
    S.BucketTopKSource.top_k_exactly_many = topk.wrap(
        S.BucketTopKSource.top_k_exactly_many
    )
    W.WMDEngine._sims_many_static = sims.wrap(W.WMDEngine._sims_many_static)
    W.WMDEngine._host_rescore = resc.wrap(W.WMDEngine._host_rescore)
    W.WMDEngine._relaxed_finalize = resc.wrap(W.WMDEngine._relaxed_finalize)

    # record the real kernel invocations (args + kwargs) for the bare
    # chained replay below — dispatch is async so wrapping its wall time
    # tells us nothing; replaying chained with a final host read does
    kernel_calls = []
    _orig_kernel = W._bucket_rwmd_scores_multi

    def _recording_kernel(*a, **k):
        kernel_calls.append((a, k))
        return _orig_kernel(*a, **k)

    W._bucket_rwmd_scores_multi = _recording_kernel

    times = []
    for _ in range(4):
        for acc in (topk, sims, resc):
            acc.t = 0.0
            acc.n = 0
        kernel_calls.clear()  # keep only the final pass's invocations
        t0 = time.perf_counter()
        res = index.find_batch(queries, n=10, min_score=0.2)
        times.append(
            (time.perf_counter() - t0, topk.t, sims.t, resc.t, topk.n)
        )
        assert len(res) == Q
    total, t_topk, t_sims, t_resc, n_topk = min(times, key=lambda r: r[0])
    other = total - t_topk - t_sims - t_resc
    print(f"pass total   {total*1e3:8.0f} ms   ({n_slices} slices, Q={Q})")
    print(f"  topk       {t_topk*1e3:8.0f} ms   ({n_topk} calls)")
    print(f"  sims_fetch {t_sims*1e3:8.0f} ms   ({sims.n} calls)")
    print(f"  rescore    {t_resc*1e3:8.0f} ms   ({resc.n} calls)")
    print(f"  other      {other*1e3:8.0f} ms")

    # bare kernel: replay the recorded invocations chained (each pass's
    # stacked sims table carries a term of the previous pass's output, a
    # final host read is the completion barrier)
    calls = [(a, k) for a, k in kernel_calls]
    if not calls:
        print("bare kernel  (no invocations recorded)")
        os._exit(0)

    def one_pass(eps):
        outs = []
        for a, k in calls:
            a2 = (a[0], a[1], a[2], a[3], a[4] + eps) + a[5:]
            outs.append(_orig_kernel(*a2, **k))
        return outs

    zero = jnp.zeros((), calls[0][0][4].dtype)
    outs = one_pass(zero)
    _ = float(outs[-1][0, 0])  # warm (already compiled)
    n_iters = 4
    t0 = time.perf_counter()
    eps = zero
    for _ in range(n_iters):
        outs = one_pass(eps)
        eps = (outs[-1][0, 0] * 1e-12).astype(zero.dtype)
    _ = float(outs[-1][0, 0])
    dt = (time.perf_counter() - t0) / n_iters
    print(f"bare kernel  {dt*1e3:8.0f} ms/pass (chained x{n_iters})")
    os._exit(0)


if __name__ == "__main__":
    main()
