"""Byte-equality of the stacked multi-query rescore vs the per-query path.

rescore_many collapses a whole serving batch into one dispatch per bucket
when all plans are static-only and gaps are affine (_rescore_many_stacked).
The stacked table is a pure copy of each query's compiled plan matrices and
the DP is column-prefix-causal with masked reductions, so results must be
bit-identical — these tests pin that contract for plain, tag-weighted,
doc-filtered, multi-leaf and score-only requests.
"""

import numpy as np
import pytest

from vectorian_tpu import Session, StringImporter
from vectorian_tpu.ops.alignment import AffineGapParams
from vectorian_tpu.ops.search import BruteForceEngine, TagWeightingSpec
from vectorian_tpu.ops.simmatrix import compile_plan
from vectorian_tpu.sim.token import EmbeddingTokenSim

from .helpers import WORDS, make_corpus_texts, make_embedding


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(17)
    planted = [
        "the old king rides the grey horse",
        "a small bird sings in the tree",
    ]
    texts, _ = make_corpus_texts(
        rng, n_docs=4, sents_per_doc=10, planted=planted
    )
    imp = StringImporter()
    docs = [imp(t, title=f"d{i}") for i, t in enumerate(texts)]
    words = sorted(
        set(WORDS)
        | {"old", "king", "rides", "grey", "horse", "small", "bird",
           "sings", "tree", "the", "a", "in"}
    )
    emb = make_embedding(words)
    emb2 = make_embedding(words, dim=16, name="test-emb2")
    session = Session(docs, embeddings=[emb, emb2])
    index = session.partition("sentence").index(EmbeddingTokenSim(emb))
    return session, index, emb, emb2


def _mk_requests(session, index, token_sim, queries, want_flows=True,
                 tagws=None):
    reqs = []
    eng = index._engine
    n_slices = eng.packed.n_slices
    rng = np.random.default_rng(7)
    for i, q in enumerate(queries):
        pq = index.make_query(q, n=5).prepare(index._nlp)
        qp = compile_plan(
            token_sim, session.compiled_embeddings,
            pq.token_ids, pq.token_strings, {},
        )
        k = int(rng.integers(3, min(12, n_slices)))
        sids = sorted(
            int(s) for s in rng.choice(n_slices, size=k, replace=False)
        )
        reqs.append(
            {
                "slice_ids": sids,
                "qp": qp,
                "len_t": pq.n_tokens,
                "tag_weights": tagws[i] if tagws else None,
                "want_flows": want_flows,
                "_pq": pq,
            }
        )
    return reqs


def _run_both(eng, reqs, gaps, locality, monkeypatch, doc_filter=None):
    """(stacked results, per-query fallback results); asserts the stacked
    path actually ran for the batched call."""
    calls = {"n": 0}
    orig = BruteForceEngine._rescore_many_stacked

    def counting(self, *a, **kw):
        out = orig(self, *a, **kw)
        if out is not None:
            calls["n"] += 1
        return out

    monkeypatch.setattr(BruteForceEngine, "_rescore_many_stacked", counting)
    stacked = eng.rescore_many(
        reqs, gaps, locality, doc_filter=doc_filter
    )
    assert calls["n"] == 1, "stacked path did not run"
    monkeypatch.setattr(
        BruteForceEngine,
        "_rescore_many_stacked",
        lambda self, *a, **kw: None,
    )
    fallback = eng.rescore_many(
        reqs, gaps, locality, doc_filter=doc_filter
    )
    monkeypatch.setattr(BruteForceEngine, "_rescore_many_stacked", orig)
    return stacked, fallback


def _assert_equal(stacked, fallback):
    assert len(stacked) == len(fallback)
    for (m1, e1, r1), (m2, e2, r2) in zip(stacked, fallback):
        np.testing.assert_array_equal(r1, r2)
        for a, b in zip(m1, m2):
            np.testing.assert_array_equal(a, b)
        for a, b in zip(e1, e2):
            np.testing.assert_array_equal(a, b)


QUERIES = [
    "the old king rides the grey horse",
    "small bird",
    "a small bird sings in the tree quickly",
]


@pytest.mark.parametrize("locality", ["local", "global", "semiglobal"])
def test_stacked_plain(setup, monkeypatch, locality):
    session, index, emb, _ = setup
    eng = index._engine
    reqs = _mk_requests(session, index, EmbeddingTokenSim(emb), QUERIES)
    gaps = AffineGapParams.of(0.2, 0.1, 0.15, 0.05)
    stacked, fallback = _run_both(eng, reqs, gaps, locality, monkeypatch)
    _assert_equal(stacked, fallback)
    # sanity: real scores were produced
    assert any(np.isfinite(r[2]).any() and (r[2] > -1e29).any()
               for r in stacked)


def test_stacked_mixed_tagged_untagged(setup, monkeypatch):
    session, index, emb, _ = setup
    eng = index._engine
    pq0 = index.make_query(QUERIES[0], n=5).prepare(index._nlp)
    tagw = TagWeightingSpec(
        t_pos_weights=np.linspace(1.0, 0.3, pq0.n_tokens).astype(np.float32),
        pos_t=np.asarray(pq0.pos_ids, np.int8),
        pos_mismatch_penalty=0.25,
        similarity_threshold=0.15,
    )
    reqs = _mk_requests(
        session, index, EmbeddingTokenSim(emb), QUERIES,
        tagws=[tagw, None, None],
    )
    gaps = AffineGapParams.of(0.1, 0.05, 0.1, 0.05)
    stacked, fallback = _run_both(eng, reqs, gaps, "local", monkeypatch)
    _assert_equal(stacked, fallback)


def test_stacked_multi_leaf_plan(setup, monkeypatch):
    """Mixed two-embedding plan with a unary kernel: the tree pre-combines
    over [V, T] and must still match per-cell evaluation bit-for-bit."""
    from vectorian_tpu.sim.kernel import Bias
    from vectorian_tpu.sim.modifier import (
        MixedTokenSimilarity,
        UnaryTokenSimilarityModifier,
    )

    session, index, emb, emb2 = setup
    eng = index._engine
    token_sim = UnaryTokenSimilarityModifier(
        MixedTokenSimilarity(
            [EmbeddingTokenSim(emb), EmbeddingTokenSim(emb2)], [0.7, 0.3]
        ),
        [Bias(-0.05)],
    )
    reqs = _mk_requests(session, index, token_sim, QUERIES)
    gaps = AffineGapParams.of(0.2, 0.1, 0.2, 0.1)
    stacked, fallback = _run_both(eng, reqs, gaps, "local", monkeypatch)
    _assert_equal(stacked, fallback)


def test_stacked_doc_filter(setup, monkeypatch):
    from vectorian_tpu.ops.search import DocFilterSpec
    from vectorian_tpu.vocabulary import UPOS

    session, index, emb, _ = setup
    eng = index._engine
    vocab = session.vocab
    pos_ex = np.zeros((len(UPOS),), bool)
    pos_ex[vocab.pos_id("DET")] = True
    flt = DocFilterSpec(
        pos_ex,
        np.zeros((max(len(vocab.tags), 1),), bool),
        np.zeros((max(len(vocab.tokens), 1),), bool),
    )
    reqs = _mk_requests(session, index, EmbeddingTokenSim(emb), QUERIES)
    gaps = AffineGapParams.of(0.1, 0.1, 0.1, 0.1)
    stacked, fallback = _run_both(
        eng, reqs, gaps, "local", monkeypatch, doc_filter=flt
    )
    _assert_equal(stacked, fallback)


def test_stacked_score_only(setup, monkeypatch):
    session, index, emb, _ = setup
    eng = index._engine
    reqs = _mk_requests(
        session, index, EmbeddingTokenSim(emb), QUERIES, want_flows=False
    )
    gaps = AffineGapParams.of(0.3, 0.1, 0.3, 0.1)
    stacked, fallback = _run_both(eng, reqs, gaps, "local", monkeypatch)
    _assert_equal(stacked, fallback)


def test_stacked_empty_request_mixed_in(setup, monkeypatch):
    """A request with no candidates must not derail the stacked batch."""
    session, index, emb, _ = setup
    eng = index._engine
    reqs = _mk_requests(session, index, EmbeddingTokenSim(emb), QUERIES)
    reqs[1] = dict(reqs[1], slice_ids=[])
    gaps = AffineGapParams.of(0.1, 0.05, 0.1, 0.05)
    stacked, fallback = _run_both(eng, reqs, gaps, "local", monkeypatch)
    _assert_equal(stacked, fallback)
    assert stacked[1][2].shape == (0,)


def test_fused_topk_exact_matches_unfused(setup, monkeypatch):
    """find_batch with the fused top-k exact rescore must return the same
    matches (ids, scores, mappings) as with fusion disabled."""
    session, index, emb, _ = setup
    calls = {"fused": 0}
    orig_init = BruteForceEngine.__dict__["_stacked_plan_tables"]

    def spy(self, qps, **kw):
        out = orig_init(self, qps, **kw)
        if out is not None:
            calls["fused"] += 1
        return out

    monkeypatch.setattr(BruteForceEngine, "_stacked_plan_tables", spy)
    fused = index.find_batch(QUERIES, n=4, min_score=0.05)
    assert calls["fused"] >= 1
    monkeypatch.setattr(
        BruteForceEngine, "_stacked_plan_tables",
        lambda self, qps, **kw: None
    )
    plain = index.find_batch(QUERIES, n=4, min_score=0.05)
    monkeypatch.setattr(BruteForceEngine, "_stacked_plan_tables", orig_init)
    for rf, rp in zip(fused, plain):
        assert [(m.slice_id, m.score) for m in rf] == [
            (m.slice_id, m.score) for m in rp
        ]
        for mf, mp in zip(rf, rp):
            np.testing.assert_array_equal(mf._mapping, mp._mapping)
            np.testing.assert_array_equal(mf._similarities, mp._similarities)


def test_fused_extras_cover_tie_groups(monkeypatch):
    """Tie-heavy corpus: the fused above-threshold select must deliver
    exact raw scores for EVERY tie-extra (no follow-up rescore), with
    results equal to the f32 oracle and find()."""
    from vectorian_tpu.alignment import AffineGapCost, LocalAlignment
    from vectorian_tpu.embedding.static import KeyedVectors
    from vectorian_tpu.ops.search import BucketTopKSource
    from vectorian_tpu.sim.span import OptimizedSpanSim

    rng = np.random.default_rng(3)
    words = ["alpha", "beta", "gamma", "delta", "epsi",
             "zeta", "eta", "theta", "iota", "kappa"]
    emb = KeyedVectors(
        "toy", words, rng.normal(size=(len(words), 24)).astype("float32")
    )
    sents = []
    for _ in range(200):
        ids = np.minimum(rng.zipf(1.3, size=6), len(words)) - 1
        sents.append(" ".join(words[i] for i in ids) + ".")
    sents = sents + sents[:100]  # exact duplicates -> boundary ties
    docs = [
        StringImporter()(" ".join(sents[i::4]), title=f"d{i}")
        for i in range(4)
    ]
    session = Session(docs, embeddings=[emb])
    index = session.partition("sentence").index(
        OptimizedSpanSim(
            EmbeddingTokenSim(emb), LocalAlignment(AffineGapCost(0.3, 0.1))
        )
    )
    qs = [
        " ".join(
            words[int(i) - 1]
            for i in np.minimum(rng.zipf(1.3, size=k), len(words))
        )
        for k in (3, 5, 2, 4)
    ]
    stats = {"calls": 0, "raws": 0, "ids": 0}
    orig = BucketTopKSource.above_exact_many

    def spy(self, reqs):
        out = orig(self, reqs)
        stats["calls"] += 1
        for ids, rmap in out:
            stats["ids"] += len(ids)
            stats["raws"] += len(rmap)
        return out

    monkeypatch.setattr(BucketTopKSource, "above_exact_many", spy)
    want = [
        [(m.slice_id, m.score) for m in r]
        for r in index.find_batch(
            qs, n=6, min_score=0.05, sim_precision="float32"
        )
    ]
    got = [
        [(m.slice_id, m.score) for m in r]
        for r in index.find_batch(qs, n=6, min_score=0.05)
    ]
    single = [
        [(m.slice_id, m.score) for m in index.find(q, n=6, min_score=0.05)]
        for q in qs
    ]
    assert got == want and single == want
    assert stats["calls"] >= 1
    assert stats["ids"] > 0 and stats["raws"] == stats["ids"]


def test_tree_metric_find_vs_find_batch_byte_equality(setup):
    """Modifier-tree static metrics: find() collapses via the jitted
    identity-gather (combine_static_plan) while find_batch collapses via
    the eager modifier combine — the two [V, T] matrices (and therefore
    every score and tie-break) must agree bit-for-bit."""
    from vectorian_tpu.alignment import AffineGapCost, LocalAlignment
    from vectorian_tpu.sim.kernel import Bias, Scale
    from vectorian_tpu.sim.modifier import (
        MaximumTokenSimilarity,
        MixedTokenSimilarity,
        UnaryTokenSimilarityModifier,
    )
    from vectorian_tpu.sim.span import OptimizedSpanSim

    session, index, emb, emb2 = setup
    trees = [
        MixedTokenSimilarity(
            [EmbeddingTokenSim(emb), EmbeddingTokenSim(emb2)], [0.6, 0.4]
        ),
        UnaryTokenSimilarityModifier(
            MixedTokenSimilarity(
                [EmbeddingTokenSim(emb), EmbeddingTokenSim(emb2)],
                [0.7, 0.3],
            ),
            [Bias(-0.03), Scale(1.1)],
        ),
        MaximumTokenSimilarity(
            [EmbeddingTokenSim(emb), EmbeddingTokenSim(emb2)]
        ),
    ]
    for tree in trees:
        ix = session.partition("sentence").index(
            OptimizedSpanSim(tree, LocalAlignment(AffineGapCost(0.2, 0.1)))
        )
        batch = [
            [(m.slice_id, m.score) for m in r]
            for r in ix.find_batch(QUERIES, n=5, min_score=-1.0)
        ]
        single = [
            [(m.slice_id, m.score) for m in ix.find(q, n=5, min_score=-1.0)]
            for q in QUERIES
        ]
        assert single == batch, tree


def test_general_gap_fused_serving_exact(monkeypatch):
    """Exponential/custom gap models through the fused serving pipeline:
    byte-equality across precisions and single-vs-batch, with the fused
    context active (the general DP shares one index-level cost-vector
    pair; closures are prefix-stable under needle padding)."""
    from vectorian_tpu.alignment import (
        CustomGapCost,
        ExponentialGapCost,
        LocalAlignment,
        SemiGlobalAlignment,
    )
    from vectorian_tpu.embedding.static import KeyedVectors
    from vectorian_tpu.ops.search import BucketTopKSource
    from vectorian_tpu.sim.span import OptimizedSpanSim

    rng = np.random.default_rng(5)
    words = ["alpha", "beta", "gamma", "delta", "epsi",
             "zeta", "eta", "theta", "iota", "kappa"]
    emb = KeyedVectors(
        "toy", words, rng.normal(size=(len(words), 24)).astype("float32")
    )
    sents = []
    for _ in range(150):
        ids = np.minimum(rng.zipf(1.3, size=6), len(words)) - 1
        sents.append(" ".join(words[i] for i in ids) + ".")
    sents = sents + sents[:70]
    docs = [
        StringImporter()(" ".join(sents[i::4]), title=f"d{i}")
        for i in range(4)
    ]
    session = Session(docs, embeddings=[emb])
    qs = [
        " ".join(
            words[int(i) - 1]
            for i in np.minimum(rng.zipf(1.3, size=k), len(words))
        )
        for k in (3, 5, 2)
    ]
    fired = {"n": 0}
    orig = BucketTopKSource.__init__

    def spy(self, engine, pending, Q, k, exact_ctx=None):
        if exact_ctx is not None and exact_ctx["gap_costs"] is not None:
            fired["n"] += 1
        orig(self, engine, pending, Q, k, exact_ctx)

    monkeypatch.setattr(BucketTopKSource, "__init__", spy)
    for gap, loc in [
        (ExponentialGapCost(3.0), LocalAlignment),
        (CustomGapCost(lambda k: 0.1 * (k ** 1.5)), SemiGlobalAlignment),
    ]:
        index = session.partition("sentence").index(
            OptimizedSpanSim(EmbeddingTokenSim(emb), loc(gap))
        )
        want = [
            [(m.slice_id, m.score) for m in r]
            for r in index.find_batch(
                qs, n=5, min_score=0.05, sim_precision="float32"
            )
        ]
        got = [
            [(m.slice_id, m.score) for m in r]
            for r in index.find_batch(qs, n=5, min_score=0.05)
        ]
        single = [
            [
                (m.slice_id, m.score)
                for m in index.find(q, n=5, min_score=0.05)
            ]
            for q in qs
        ]
        assert got == want and single == want, loc.__name__
    assert fired["n"] >= 2


def test_doc_filter_fused_serving_exact(setup, monkeypatch):
    """Document-side token filters run through the fused pipeline (the
    in-kernel compaction must replicate host filtered_positions): the
    fused context must be ACTIVE and results byte-equal across paths."""
    from vectorian_tpu.ops.search import BucketTopKSource

    session, index, emb, _ = setup
    fired = {"n": 0}
    orig = BucketTopKSource.__init__

    def spy(self, engine, pending, Q, k, exact_ctx=None):
        if exact_ctx is not None and exact_ctx["with_filter"]:
            fired["n"] += 1
        orig(self, engine, pending, Q, k, exact_ctx)

    monkeypatch.setattr(BucketTopKSource, "__init__", spy)
    kw = dict(n=5, min_score=-2.0, token_filter=["the", "a"],
              pos_filter=["DET"])
    want = [
        [(m.slice_id, m.score) for m in r]
        for r in index.find_batch(QUERIES, sim_precision="float32", **kw)
    ]
    got = [
        [(m.slice_id, m.score) for m in r]
        for r in index.find_batch(QUERIES, **kw)
    ]
    single = [
        [(m.slice_id, m.score) for m in index.find(q, **kw)]
        for q in QUERIES
    ]
    assert got == want and single == want
    assert fired["n"] >= 1
    # mappings must point at un-filtered slice offsets
    r0 = index.find_batch(QUERIES[:1], **kw)[0]
    for m in r0:
        mp = m._mapping
        assert mp.max() < 64 and (mp >= -1).all()


def test_boosted_batch_uses_device_topk(setup, monkeypatch):
    """Boosted batches rank through the device top-k (per-query boost
    columns in-kernel) instead of the full host score read, byte-equal to
    find() and the f32 oracle."""
    from vectorian_tpu.saliency import KeywordSignal, Saliency

    session, index, emb, _ = setup
    sal = Saliency(strength=0.8).add_signal(KeywordSignal("king"), 1.0)
    calls = {"all": 0, "topk": 0}
    oa = BruteForceEngine.score_all_multi
    ot = BruteForceEngine.score_topk_multi

    def wa(self, *a, **k):
        calls["all"] += 1
        return oa(self, *a, **k)

    def wt(self, *a, **k):
        calls["topk"] += 1
        return ot(self, *a, **k)

    monkeypatch.setattr(BruteForceEngine, "score_all_multi", wa)
    monkeypatch.setattr(BruteForceEngine, "score_topk_multi", wt)
    kw = dict(n=5, min_score=0.01, booster=sal)
    want = [
        [(m.slice_id, m.score) for m in r]
        for r in index.find_batch(QUERIES, sim_precision="float32", **kw)
    ]
    got = [
        [(m.slice_id, m.score) for m in r]
        for r in index.find_batch(QUERIES, **kw)
    ]
    single = [
        [(m.slice_id, m.score) for m in index.find(q, **kw)]
        for q in QUERIES
    ]
    assert got == want and single == want
    assert calls["topk"] >= 2 and calls["all"] == 0
