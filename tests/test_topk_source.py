"""Unit tests for the finalizer's candidate-source protocol
(HostVecSource / BucketTopKSource): the device-side per-bucket top-k
must stay provably cut-complete — a tie group truncated at the k
boundary (or at ``initial``'s m truncation) must keep
rest_max >= thresh so the tie-bounded extras round recovers every
dropped slice (reference completeness contract: result_set.h:32-93
worst_score pruning never drops a candidate that could reach the
top-n)."""

import numpy as np
import jax.numpy as jnp

from vectorian_tpu.ops.search import BucketTopKSource, HostVecSource


def _bucket(slice_ids, scores_qn):
    """(db, scores_dev [n_pad, Q]) pair like _dispatch_multi's pending."""
    scores = np.asarray(scores_qn, np.float32).T  # [n, Q]
    db = {"n": scores.shape[0], "slice_index": np.asarray(slice_ids, np.int64)}
    return db, jnp.asarray(scores)


def _complete_set(src_initial, above, thresh):
    ids, rest_max = src_initial
    got = set(ids)
    if rest_max >= thresh:
        got |= set(above)
    return got


class TestBucketTopKSource:
    def test_tie_truncated_at_k_recovered_by_extras(self):
        # 8-way tie at 0.9 but k=4: initial returns only 4; the (k+1)-th
        # value bounds the rest so the extras round must recover all 8
        scores = np.full((12,), 0.125, np.float32)
        scores[2:10] = 0.875
        src = BucketTopKSource(None, [_bucket(np.arange(12), [scores])], 1, 4)
        ids, rest_max = src.initial(0, 4, thresh=0.5)
        assert len(ids) == 4 and all(scores[i] == np.float32(0.875) for i in ids)
        assert rest_max >= 0.875  # truncated tie keeps the bound hot
        view = src.qview(0)
        (extra,) = src.above_many([(view, 0.5, set(ids))])
        assert set(ids) | set(extra) == set(range(2, 10))

    def test_covers_all_requires_total_within_m(self):
        # two FULL buckets (n <= k each) totaling > m: initial truncates,
        # so covers_all must be False or boundary ties would be dropped
        b1 = _bucket([0, 1, 2], [[0.9, 0.8, 0.7]])
        b2 = _bucket([3, 4, 5], [[0.7, 0.7, 0.6]])
        src = BucketTopKSource(None, [b1, b2], 1, 10)
        assert src.covers_all(6)
        assert not src.covers_all(5)
        ids, rest_max = src.initial(0, 4, thresh=0.0)
        assert len(ids) == 4
        assert rest_max >= 0.6  # bound covers the truncated slices
        view = src.qview(0)
        (extra,) = src.above_many([(view, 0.65, set(ids))])
        got = set(ids) | set(e for e in extra)
        assert {0, 1, 2, 3, 4} <= got  # every slice >= 0.65 is reachable

    def test_multi_bucket_bound_merges(self):
        # non-full bucket's (k+1)-th value must dominate rest_max even
        # when the other bucket is cold
        hot = _bucket(np.arange(10), [np.linspace(1.0, 0.55, 10)])
        cold = _bucket(np.arange(10, 14), [[0.2, 0.1, 0.05, 0.01]])
        src = BucketTopKSource(None, [hot, cold], 1, 3)
        ids, rest_max = src.initial(0, 6, thresh=0.3)
        # only 3 hot candidates fetched (k=3); bound = 4th hot value
        assert len(ids) == 3
        assert rest_max >= float(np.linspace(1.0, 0.55, 10)[3])

    def test_matches_host_vec_source_membership(self):
        # same scores through both protocols select the same candidate
        # set above thresh (order may differ; the finalizer re-sorts)
        rng = np.random.default_rng(0)
        scores = rng.uniform(0.0, 1.0, size=(1, 40)).astype(np.float32)
        scores[0, [5, 17, 29]] = 0.95  # tie group
        bsrc = BucketTopKSource(
            None,
            [_bucket(np.arange(20), scores[:, :20]),
             _bucket(np.arange(20, 40), scores[:, 20:])],
            1, 6,
        )
        thresh = 0.5

        class _Eng:
            @staticmethod
            def top_k_with_next(s, m, t):
                order = np.argsort(-s, kind="stable")
                keep = [int(i) for i in order if s[i] >= t][:m]
                rest = [float(s[i]) for i in order if int(i) not in set(keep)]
                return keep, (max(rest) if rest else float("-inf"))

        hsrc = HostVecSource(_Eng, scores[0])
        bi = bsrc.initial(0, 6, thresh)
        hi = hsrc.initial(6, thresh)
        bview = bsrc.qview(0)
        bset = _complete_set(
            bi, bsrc.above_many([(bview, thresh, set(bi[0]))])[0], thresh
        )
        hset = _complete_set(
            hi, hsrc.above_many([(hsrc, thresh, set(hi[0]))])[0], thresh
        )
        want = set(int(i) for i in np.flatnonzero(scores[0] >= thresh))
        assert bset == want
        assert hset == want

    def test_above_cap_overflow_falls_back_to_column(self):
        # a tie group larger than the capped device select must still be
        # recovered completely (full-column fallback)
        scores = np.full((30,), 0.25, np.float32)
        scores[4:24] = 0.75  # 20-way tie
        src = BucketTopKSource(None, [_bucket(np.arange(30), [scores])], 1, 3)
        src.ABOVE_CAP = 8  # instance override: force overflow
        view = src.qview(0)
        (extra,) = src.above_many([(view, 0.5, set())])
        assert set(extra) == set(range(4, 24))
        assert (0, 0) in src._col_cache  # came via the fallback read

    def test_column_reads_batch_and_cache(self):
        # above_many reads score columns once; repeated calls hit the cache
        scores = np.stack([np.linspace(1.0, 0.0, 50),
                           np.linspace(0.0, 1.0, 50)]).astype(np.float32)
        src = BucketTopKSource(None, [_bucket(np.arange(50), scores)], 2, 5)
        v0, v1 = src.qview(0), src.qview(1)
        out = src.above_many([(v0, 0.7, set()), (v1, 0.7, set())])
        assert set(out[0]) == set(int(i) for i in np.flatnonzero(scores[0] >= 0.7))
        assert set(out[1]) == set(int(i) for i in np.flatnonzero(scores[1] >= 0.7))
        n_cached = len(src._col_cache)
        src.above_many([(v0, 0.8, set())])
        assert len(src._col_cache) == n_cached  # no refetch


class _FakePacked:
    def __init__(self, n, docs=None):
        self.n_slices = n
        self.slice_doc = (
            np.asarray(docs, np.int64) if docs is not None
            else np.zeros(n, np.int64)
        )
        self.slice_idx = np.arange(n, dtype=np.int64)


class _FakeEngine:
    def __init__(self, n, docs=None):
        self._packed = _FakePacked(n, docs)

    @property
    def packed(self):
        return self._packed

    def top_k(self, scores, k, min_score=0.2):
        from vectorian_tpu.ops.search import BruteForceEngine

        return BruteForceEngine.top_k(self, scores, k, min_score)


class TestTopKExactly:
    """top_k_exactly must replicate engine.top_k's tie-complete pool over
    the device matrices — the transport batch paths rank on it."""

    def test_matches_host_topk_on_tie_heavy_matrices(self):
        rng = np.random.default_rng(11)
        for trial in range(6):
            n = int(rng.integers(20, 120))
            Q = int(rng.integers(1, 4))
            # heavy ties: quantized scores
            scores = (rng.integers(0, 8, size=(Q, n)) / 8.0).astype(
                np.float32
            )
            docs = rng.integers(0, 5, size=n)
            eng = _FakeEngine(n, docs)
            k = int(rng.integers(1, 12))
            msc = float(rng.uniform(-0.2, 0.6))
            # split into two buckets to exercise cross-bucket merge
            cut = n // 2
            b1 = _bucket(np.arange(cut), [s[:cut] for s in scores])
            b2 = _bucket(np.arange(cut, n), [s[cut:] for s in scores])
            src = BucketTopKSource(eng, [b1, b2], Q, max(k // 2, 1))
            for qi in range(Q):
                want = eng.top_k(scores[qi], k, min_score=msc)
                got, smap = src.top_k_exactly(qi, k, msc)
                assert got == want, (trial, qi)
                for sid in got:
                    assert smap[sid] == float(scores[qi][sid])


def test_lazy_flow_resolution_matches_eager(monkeypatch):
    """Matches whose flow payload misses the fused transfer defer mapping
    extraction to first access (_FlowResolver); resolved mappings and
    edge similarities must equal the eager payload path byte-for-byte
    (the resolver runs the same rescore_many arithmetic)."""
    import numpy as np

    from vectorian_tpu import Session, StringImporter
    from vectorian_tpu.ops.search import BucketTopKSource
    from vectorian_tpu.sim.token import EmbeddingTokenSim

    from .helpers import make_embedding

    rng = np.random.default_rng(7)
    planted = "the sun shines over the sea"
    fillers = ["stars at night", "the moon shines bright",
               "waves crash over rocks"]
    sents = [planted] * 12 + [f for f in fillers for _ in range(10)]
    rng.shuffle(sents)
    docs = [
        StringImporter()(". ".join(sents[i::3]) + ".", title=f"d{i}")
        for i in range(3)
    ]
    words = sorted({w for s in sents for w in s.split()})
    emb = make_embedding(words)
    session = Session(docs, embeddings=[emb])
    index = session.partition("sentence").index(EmbeddingTokenSim(emb))
    qs = [planted, "stars night", "moon shines"]

    eager = [
        [
            (m.slice_id, m.score, tuple(m._mapping),
             tuple(np.asarray(m._similarities)))
            for m in r
        ]
        for r in index.find_batch(qs, n=5, min_score=0.05)
    ]
    monkeypatch.setattr(BucketTopKSource, "PAYLOAD_MAX_BYTES", 0)
    lazy = index.find_batch(qs, n=5, min_score=0.05)
    assert any(
        m._mapping_v is None and m._flow_resolver is not None
        for r in lazy
        for m in r
    ), "payload budget 0 should defer at least one flow"
    got = [
        [
            (m.slice_id, m.score, tuple(m._mapping),
             tuple(np.asarray(m._similarities)))
            for m in r
        ]
        for r in lazy
    ]
    assert got == eager
    # to_json exercises regions through the resolved flows
    j = lazy[0][0].to_json()
    assert j["regions"] and j["score"] > 0.9


def test_uniq_gather_and_deep_fetch_parity(monkeypatch):
    """The two-stage unique gather and the deep tie fetch are pure
    execution strategies: forcing them on/off (and shrinking DEEP_K so
    the extras round must fire) never changes any reported match."""
    import numpy as np

    from vectorian_tpu import Session, StringImporter
    from vectorian_tpu.ops.search import BucketTopKSource
    from vectorian_tpu.sim.token import EmbeddingTokenSim

    from .helpers import make_embedding

    rng = np.random.default_rng(9)
    planted = "the king rides the horse"
    sents = [planted] * 25 + [
        "a bird sings softly here", "grey clouds drift over town",
        "a cat sleeps on the mat",
    ] * 12
    rng.shuffle(sents)
    docs = [
        StringImporter()(". ".join(sents[i::2]) + ".", title=f"d{i}")
        for i in range(2)
    ]
    words = sorted({w for s in sents for w in s.split()})
    emb = make_embedding(words)
    session = Session(docs, embeddings=[emb])
    index = session.partition("sentence").index(EmbeddingTokenSim(emb))
    qs = [planted, "a bird sings"]

    def run():
        return [
            [(m.slice_id, m.score) for m in r]
            for r in index.find_batch(qs, n=6, min_score=0.05)
        ] + [
            [(m.slice_id, m.score) for m in index.find(q, n=6, min_score=0.05)]
            for q in qs
        ]

    want = run()
    for flag in ("1", "0"):
        monkeypatch.setenv("VECTORIAN_UNIQ_GATHER", flag)
        assert run() == want, f"uniq={flag}"
    monkeypatch.delenv("VECTORIAN_UNIQ_GATHER", raising=False)
    # tiny deep fetch: the tie group (25 planted duplicates) overflows it,
    # so the fused extras round must recover every tie — results unchanged
    monkeypatch.setattr(BucketTopKSource, "DEEP_K", 2)
    monkeypatch.setattr(BucketTopKSource, "DEEP_K_LARGE_Q", 2)
    assert run() == want
