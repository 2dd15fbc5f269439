"""Aux subsystem tests: bidirectional, abort, debug hooks, result merging,
frequencies, submatch_weight."""

import numpy as np
import pytest

from vectorian_tpu import Session, StringImporter
from vectorian_tpu.sim.token import EmbeddingTokenSim

from .helpers import make_embedding


@pytest.fixture(scope="module")
def sess():
    words = ["the", "old", "king", "rides", "grey", "horse", "cat", "sleeps",
             "dog", "runs"]
    emb = make_embedding(words)
    docs = [
        StringImporter()(
            "the old king rides the grey horse. horse grey the rides king old the.",
            title="d0",
        )
    ]
    session = Session(docs, embeddings=[emb])
    return session, emb


def test_bidirectional(sess):
    session, emb = sess
    index = session.partition("sentence").index(EmbeddingTokenSim(emb))
    q = "the old king rides the grey horse"
    r_uni = index.find(q, n=2)
    r_bi = index.find(q, n=2, bidirectional=True)
    # sentence 2 is the query reversed: only bidirectional scores it 1.0
    s_uni = {m.doc.title + str(m.slice_id): m.score for m in r_uni}
    assert len(r_bi) == 2
    assert r_bi[0].score == pytest.approx(1.0, abs=1e-4)
    assert r_bi[1].score == pytest.approx(1.0, abs=1e-4)
    # flows of the reversed match still map to valid offsets
    j = r_bi[1].to_json()
    assert any("edges" in reg for reg in j["regions"])


def test_abort(sess):
    session, emb = sess
    index = session.partition("sentence").index(EmbeddingTokenSim(emb))
    q = index.make_query("old king", n=5)
    q.abort()
    pq = q.prepare(session.nlp)
    assert index._find(pq) == []


def test_debug_hooks(sess):
    session, emb = sess
    index = session.partition("sentence").index(EmbeddingTokenSim(emb))
    events = []
    index.find("old king rides", n=2, debug=lambda name, data: events.append(name))
    names = set(events)
    assert "static_similarity_matrix" in names
    assert "scores" in names
    assert "alignment" in names
    assert "document/match_time" in names


def test_result_extend(sess):
    session, emb = sess
    index = session.partition("sentence").index(EmbeddingTokenSim(emb))
    r1 = index.find("old king rides", n=1)
    r2 = index.find("grey horse", n=1)
    n = len(r1) + len(r2)
    r1.extend(r2)
    assert len(r1) == n
    scores = [m.score for m in r1]
    assert scores == sorted(scores, reverse=True)


def test_frequencies(sess):
    session, emb = sess
    p = session.partition("sentence")
    freq = p.freq
    assert freq.token_tf("horse") >= 2.0
    assert freq.token_tf("zebra") == 0.0
    # tf-idf of a token present in the single doc: log(1/(1+1)) < 0
    assert freq.token_tf_idf("horse") <= 0.0
    assert freq.tf.shape == (len(session.vocab),)


def test_submatch_weight(sess):
    """submatch_weight > 0 boosts partial matches (reference
    reference_score, metric/alignment.h:84-106)."""
    session, emb = sess
    index = session.partition("sentence").index(EmbeddingTokenSim(emb))
    q = "old king sleeps quietly tonight"  # partial match only
    r0 = index.find(q, n=1, min_score=0.01)
    r1 = index.find(q, n=1, min_score=0.01, submatch_weight=0.5)
    assert r0 and r1
    assert r1[0].score > r0[0].score
    assert r1[0].score <= 1.0


def test_precision_recall(sess):
    session, emb = sess
    index = session.partition("sentence").index(EmbeddingTokenSim(emb))
    r = index.find("the old king rides the grey horse", n=2, min_score=0.1)
    assert len(r) >= 1
    relevant = {r[0].slice_id}
    assert r.precision(relevant) == pytest.approx(1.0 / len(r))
    assert r.recall(relevant) == pytest.approx(1.0)
    assert r.recall({999999}) == 0.0


def test_ndcg(sess):
    """NDCG (the reference's de-facto regression metric, __init__.py:29-31):
    perfect ranking -> 1.0; graded gains discount by log2(rank+1)."""
    import numpy as np

    session, emb = sess
    index = session.partition("sentence").index(EmbeddingTokenSim(emb))
    r = index.find("the old king rides the grey horse", n=3, min_score=0.01)
    assert len(r) >= 2
    # best match alone, gain 1 -> the top-ranked hit gives NDCG 1.0
    assert r.ndcg({r[0].slice_id}) == pytest.approx(1.0)
    # relevant item ranked second: dcg = 1/log2(3), idcg = 1/log2(2)
    assert r.ndcg({r[1].slice_id: 1.0}) == pytest.approx(1.0 / np.log2(3.0))
    # graded gains in result order -> perfect ranking
    gains = {m.slice_id: g for m, g in zip(r, [3.0, 2.0, 1.0])}
    assert r.ndcg(gains) == pytest.approx(1.0)
    # a missing relevant slice lowers the score below 1
    gains[999999] = 5.0
    assert r.ndcg(gains) < 1.0
    assert r.ndcg({}) == 0.0
    # (doc_index, slice_idx) keys work like in precision/recall
    packed = index.packed
    key = (int(packed.slice_doc[r[0].slice_id]), int(packed.slice_idx[r[0].slice_id]))
    assert r.ndcg({key: 1.0}) == pytest.approx(1.0)


def test_compile_and_build_time():
    import vectorian_tpu as vt

    ok = vt.compile()
    if ok:
        assert vt.backend_build_time() is not None


def test_contextual_debug_hook():
    """Contextual queries emit per-slice similarity blocks through the
    debug hook (reference contextual_similarity_matrix,
    metric/contextual.cpp:77-99)."""
    from tests.test_contextual import DIM, ctx_fn
    from vectorian_tpu import Session, StringImporter
    from vectorian_tpu.embedding.contextual import LambdaContextualEmbedding
    from vectorian_tpu.sim.token import EmbeddingTokenSim

    ctx = LambdaContextualEmbedding("dbg-ctx", ctx_fn, DIM)
    docs = [StringImporter()("the old king rides. a cat sleeps.", title="d")]
    session = Session(docs, embeddings=[ctx])
    ix = session.partition("sentence").index(EmbeddingTokenSim(ctx))
    seen = []
    ix.find("old king rides", n=2, min_score=-5,
            debug=lambda name, payload: seen.append((name, payload)))
    names = [n for n, _ in seen]
    assert "contextual_similarity_matrix" in names
    payload = dict(seen)["contextual_similarity_matrix"]
    assert payload["similarity"].shape[1] == 3


def test_submatch_upper_bound_dominates():
    """The closed-form overfetch bound must dominate the exact rescored
    score for every (raw, matched, total, w) with raw <= matched <= total
    — the soundness condition of the submatch-weight cut proof."""
    import numpy as np

    from vectorian_tpu.index import _submatch_upper_bound
    from vectorian_tpu.ops.search import reference_score

    rng = np.random.default_rng(0)
    for _ in range(2000):
        total = float(rng.uniform(0.5, 12.0))
        matched = float(rng.uniform(0.0, total))
        raw = float(rng.uniform(0.0, matched))
        w = float(rng.uniform(0.01, 1.5))
        ref = reference_score(total, matched, w)
        exact = raw / ref if ref > 0 else 0.0
        d = raw / total  # device-normalized score
        ub = float(_submatch_upper_bound(d, total, w))
        assert ub >= exact - 1e-9, (total, matched, raw, w, exact, ub)
    # monotone in the device score (required for top-m by device score to
    # be top-m by bound)
    ds = np.linspace(0, 1, 50)
    ubs = np.asarray(_submatch_upper_bound(ds, 8.0, 0.7))
    assert (np.diff(ubs) >= -1e-12).all()
    # negative device scores stay negative (never promoted past min_score)
    assert float(_submatch_upper_bound(-0.5, 8.0, 0.7)) == -0.5


def test_submatch_upper_bound_sim_max():
    """With a similarity ceiling above 1 (unary-kernel metrics), the bound
    must still dominate: raw <= matched * sim_max replaces raw <= matched."""
    import numpy as np

    from vectorian_tpu.index import _submatch_upper_bound
    from vectorian_tpu.ops.search import reference_score

    rng = np.random.default_rng(1)
    for _ in range(2000):
        sim_max = float(rng.uniform(1.0, 3.0))
        total = float(rng.uniform(0.5, 12.0))
        matched = float(rng.uniform(0.0, total))
        raw = float(rng.uniform(0.0, matched * sim_max))
        w = float(rng.uniform(0.01, 1.5))
        ref = reference_score(total, matched, w)
        exact = raw / ref if ref > 0 else 0.0
        d = raw / total
        ub = float(_submatch_upper_bound(d, total, w, sim_max))
        assert ub >= exact - 1e-9, (total, matched, raw, w, sim_max, exact, ub)


def test_plan_sim_upper():
    """plan_sim_upper: 1.0 for clipped plans, the exact matrix max for
    static plans with unary kernels, inf for contextual plans with them."""
    import jax.numpy as jnp
    import numpy as np

    from vectorian_tpu.ops.simmatrix import QueryPlan, plan_sim_upper
    from vectorian_tpu.sim.kernel import Kernel, Scale

    base = dict(
        static_mags=[], ctx_names=[], ctx_queries=[], mixed_weights=[]
    )
    S = jnp.asarray(np.array([[0.2, 0.9], [0.5, 0.1]], np.float32))
    plain = QueryPlan(plan=("static", 0), static_sims=[S], **base)
    assert plan_sim_upper(plain) == 1.0

    scaled = QueryPlan(
        plan=("unary", ("static", 0), Kernel([Scale(2.0)])),
        static_sims=[S],
        **base,
    )
    assert abs(plan_sim_upper(scaled) - 1.8) < 1e-6

    ctx = QueryPlan(
        plan=("unary", ("ctx", 0, None), Kernel([Scale(2.0)])),
        static_sims=[],
        static_mags=[],
        ctx_names=["c"],
        ctx_queries=[{}],
        mixed_weights=[],
    )
    assert plan_sim_upper(ctx) == float("inf")


def test_fuzz_submatch_cut_vs_exhaustive():
    """The submatch-weight overfetch cut must reproduce the exhaustive
    ranking exactly for random weights/queries (the closed-form bound's
    end-to-end guarantee)."""
    import itertools
    import string

    import numpy as np

    from tests.helpers import make_embedding
    from vectorian_tpu import Session, StringImporter
    from vectorian_tpu.sim.token import EmbeddingTokenSim

    rng = np.random.default_rng(321)
    base = ["".join(p) for p in itertools.product(string.ascii_lowercase[:6], repeat=3)][:80]
    emb = make_embedding(base, dim=16)
    sents = [
        " ".join(rng.choice(base, size=int(rng.integers(2, 8)))) + "."
        for _ in range(70)
    ]
    docs = [StringImporter()(" ".join(sents), title="d")]
    session = Session(docs, embeddings=[emb])
    ix = session.partition("sentence").index(EmbeddingTokenSim(emb))
    n_sl = ix.packed.n_slices
    for trial in range(5):
        r = np.random.default_rng(50 + trial)
        q = " ".join(r.choice(base, size=int(r.integers(2, 7))))
        w = float(r.uniform(0.1, 1.0))
        exhaustive = ix.find(
            q, n=n_sl, min_score=-1e30, submatch_weight=w
        )
        got = ix.find(q, n=3, min_score=-1e30, submatch_weight=w)
        assert [(m.slice_id, m.score) for m in got] == [
            (m.slice_id, m.score) for m in exhaustive[:3]
        ], (trial, q, w)


def test_debug_hook_does_not_change_results(sess):
    """Attaching a debug hook must not change which matches find() returns
    (the debug path takes the score_all fallback, whose candidate
    membership is guarded like the low-latency path)."""
    session, emb = sess
    index = session.partition("sentence").index(EmbeddingTokenSim(emb))
    for q in ["old king rides", "grey horse", "the cat"]:
        plain = index.find(q, n=3, min_score=-5.0)
        dbg = index.find(q, n=3, min_score=-5.0, debug=lambda *a: None)
        assert [(m.slice_id, m.score) for m in plain] == [
            (m.slice_id, m.score) for m in dbg
        ], q
