"""Contextual-embedding tests: lambda encoder, mixed trees, PCA compression."""

import numpy as np
import pytest

from vectorian_tpu import Session, StringImporter
from vectorian_tpu.embedding.contextual import LambdaContextualEmbedding
from vectorian_tpu.sim.modifier import (
    MaximumTokenSimilarity,
    MixedTokenSimilarity,
)
from vectorian_tpu.sim.token import EmbeddingTokenSim

from .helpers import make_embedding, word_vector

DIM = 24


def ctx_fn(tokens, text):
    """Deterministic 'contextual' vectors: word vector + small neighbor mix
    — context-dependent but reproducible across doc/query encoding."""
    words = [text[a:b] for a, b in tokens]
    base = np.stack(
        [word_vector(w, DIM) if w else np.zeros(DIM, np.float32) for w in words]
    )
    out = base.copy()
    for i in range(len(words)):
        if i > 0:
            out[i] += 0.2 * base[i - 1]
        if i + 1 < len(words):
            out[i] += 0.2 * base[i + 1]
    return out.astype(np.float32)


@pytest.fixture(scope="module")
def ctx_session():
    ctx = LambdaContextualEmbedding("test-ctx", ctx_fn, DIM)
    words = ["the", "old", "king", "rides", "grey", "horse", "cat", "sleeps",
             "dog", "runs", "fast", "a", "bird", "sings", "loud"]
    static = make_embedding(words, dim=16, name="static-emb")
    imp = StringImporter()
    docs = [
        imp("the old king rides the grey horse. a cat sleeps.", title="d0"),
        imp("the dog runs fast. a bird sings loud.", title="d1"),
    ]
    session = Session(docs, embeddings=[static, ctx])
    return session, static, ctx


def test_contextual_search(ctx_session):
    session, static, ctx = ctx_session
    index = session.partition("sentence").index(EmbeddingTokenSim(ctx))
    r = index.find("the old king rides the grey horse", n=3)
    assert len(r) >= 1
    # identical text -> identical contextual vectors -> near-perfect score
    assert r[0].score == pytest.approx(1.0, abs=0.01)
    assert r[0].doc.title == "d0"
    j = r[0].to_json()
    assert any("edges" in reg for reg in j["regions"])


def test_contextual_prepared_docs_have_vectors(ctx_session):
    session, static, ctx = ctx_session
    for pd in session.documents:
        v = pd.contextual["test-ctx"]
        assert v.shape == (pd.n_tokens, DIM)


def test_mixed_static_contextual(ctx_session):
    session, static, ctx = ctx_session
    mixed = MixedTokenSimilarity(
        [EmbeddingTokenSim(static), EmbeddingTokenSim(ctx)], [0.5, 0.5]
    )
    index = session.partition("sentence").index(mixed)
    r = index.find("the old king rides the grey horse", n=2)
    assert len(r) >= 1
    assert r[0].doc.title == "d0"
    assert r[0].score == pytest.approx(1.0, abs=0.01)


def test_maximum_static_contextual(ctx_session):
    session, static, ctx = ctx_session
    mx = MaximumTokenSimilarity([EmbeddingTokenSim(static), EmbeddingTokenSim(ctx)])
    index = session.partition("sentence").index(mx)
    r = index.find("a cat sleeps", n=2)
    assert len(r) >= 1
    assert r[0].score == pytest.approx(1.0, abs=0.01)


def test_pca_compressed_contextual():
    """PCA-compressed contextual embedding: fitted on corpus, replayed on
    queries (reference transform.py PCACompression + contextual pca())."""
    ctx = LambdaContextualEmbedding("ctx-pca", ctx_fn, DIM).pca(8)
    imp = StringImporter()
    docs = [
        imp("the old king rides the grey horse. a cat sleeps by the fire.", title="d0"),
        imp("the dog runs fast and the bird sings.", title="d1"),
    ]
    session = Session(docs, embeddings=[ctx])
    for pd in session.documents:
        assert pd.contextual["ctx-pca"].shape[1] == 8
    index = session.partition("sentence").index(EmbeddingTokenSim(ctx))
    r = index.find("the old king rides the grey horse", n=2)
    assert len(r) >= 1
    assert r[0].doc.title == "d0"
    # same text through the same fitted projection -> still near 1.0
    assert r[0].score == pytest.approx(1.0, abs=0.02)


def test_contextual_oracle_score(ctx_session):
    """Engine contextual score matches a direct numpy cosine+DP oracle."""
    from tests.oracle import gotoh_align

    session, static, ctx = ctx_session
    index = session.partition("sentence").index(EmbeddingTokenSim(ctx))
    qtext = "king rides horse"
    r = index.find(qtext, n=10, min_score=-10)
    assert r

    # oracle: encode query + slice via ctx_fn on the raw sentence tokens
    pq_vecs = {}
    packed = index.packed
    import vectorian_tpu.index as vidx

    q = vidx.Query(index, qtext, {"partition": index.partition.to_args()})
    pq = q.prepare(session.nlp)
    qv = session.encode_contextual_query("test-ctx", pq._sdoc, qtext, pq.kept)

    for m in r[:3]:
        sid = m.slice_id
        d = int(packed.slice_doc[sid])
        s0 = int(packed.slice_start[sid])
        ln = int(packed.slice_len[sid])
        dv = session.documents[d].contextual["test-ctx"][s0 : s0 + ln]
        dn = dv / np.maximum(np.linalg.norm(dv, axis=1, keepdims=True), 1e-9)
        qn = qv["normalized"]
        S = np.clip(dn @ qn.T, 0.0, 1.0)
        raw, _, _, _ = gotoh_align(S, 0, 0, 0, 0, "local")
        want = raw / S.shape[1]
        assert m.score == pytest.approx(want, abs=2e-3), sid


def test_contextual_lazy_corpus_roundtrip(tmp_path):
    """Stored contextual vectors load lazily (h5 refs; no data read at
    session build) and produce identical search results to the in-memory
    session (reference ExternalMemoryVectors/OpenedVectorsCache,
    embedding/vectors.py:245-309)."""
    from vectorian_tpu import Corpus, Session, StringImporter
    from vectorian_tpu.embedding.contextual import LambdaContextualEmbedding
    from vectorian_tpu.embedding.vectors import ExternalMemoryVectors, LazyVectors

    ctx = LambdaContextualEmbedding("lazy-ctx", ctx_fn, DIM)
    text = "the old king rides the grey horse. a cat sleeps. the sun shines."
    docs = [StringImporter()(text, title="d0")]
    mem_session = Session(docs, embeddings=[ctx])  # encodes + stores vectors

    with Corpus(tmp_path / "c") as corpus:
        for d in mem_session.documents:
            corpus.add_doc(d.doc)

    with Corpus(tmp_path / "c") as corpus:
        loaded = corpus.docs
        # stored vectors come back as lazy h5 references
        assert isinstance(
            loaded[0].contextual_embeddings["lazy-ctx"], ExternalMemoryVectors
        )
        session = Session(loaded, embeddings=[ctx])
        pd = session.documents[0]
        lv = pd.contextual["lazy-ctx"]
        assert isinstance(lv, LazyVectors)
        assert lv._data is None, "session build must not read vector data"

        from vectorian_tpu.sim.token import EmbeddingTokenSim

        q = "old king rides grey horse"
        ix = session.partition("sentence").index(EmbeddingTokenSim(ctx))
        mem_ix = mem_session.partition("sentence").index(EmbeddingTokenSim(ctx))
        got = [(m.slice_id, round(m.score, 4)) for m in ix.find(q, n=3)]
        want = [(m.slice_id, round(m.score, 4)) for m in mem_ix.find(q, n=3)]
        assert got == want and got


def test_cache_contextual_embeddings(tmp_path):
    """Preloading materializes lazy refs and pre-packs device stores
    (reference Session.cache_contextual_embeddings)."""
    from vectorian_tpu import Corpus, Session, StringImporter
    from vectorian_tpu.embedding.contextual import LambdaContextualEmbedding
    from vectorian_tpu.embedding.vectors import LazyVectors
    from vectorian_tpu.sim.token import EmbeddingTokenSim

    ctx = LambdaContextualEmbedding("pre-ctx", ctx_fn, DIM)
    docs = [StringImporter()("the old king rides. a cat sleeps.", title="d")]
    mem = Session(docs, embeddings=[ctx])
    with Corpus(tmp_path / "c") as corpus:
        for d in mem.documents:
            corpus.add_doc(d.doc)
        session = Session(corpus.docs, embeddings=[ctx])
        p = session.partition("sentence")
        ix = p.index(EmbeddingTokenSim(ctx))  # builds the engine
        session.cache_contextual_embeddings()
        lv = session.documents[0].contextual["pre-ctx"]
        assert isinstance(lv, LazyVectors) and lv._data is not None
        assert "pre-ctx" in ix._engine._ctx_stores
        r = ix.find("old king rides", n=2, min_score=-5)
        assert len(r) >= 1


def test_mixed_tree_find_batch_matches_single(ctx_session):
    """find_batch on a mixed static+contextual modifier tree serves the
    batch through ONE stacked-leaf corpus pass (score_all_multi_tree) —
    single-chip AND mesh — byte-equal to find() (the finalizer's exact
    per-slice rescore owns the reported scores, so the batched GEMM's
    different reduction tiling never shows)."""
    import vectorian_tpu as vt
    from vectorian_tpu.sim.modifier import (
        MaximumTokenSimilarity,
        MixedTokenSimilarity,
    )
    from vectorian_tpu.sim.token import EmbeddingTokenSim

    session, static_emb, ctx_emb = ctx_session
    qs = ["the old king rides", "a bird sings loud", "cat sleeps"]
    for tree in (
        MixedTokenSimilarity(
            [EmbeddingTokenSim(static_emb), EmbeddingTokenSim(ctx_emb)],
            [0.5, 0.5],
        ),
        MaximumTokenSimilarity(
            [EmbeddingTokenSim(static_emb), EmbeddingTokenSim(ctx_emb)]
        ),
    ):
        ix = session.partition("sentence").index(tree)
        batch = [
            [(m.slice_id, m.score) for m in r]
            for r in ix.find_batch(qs, n=4, min_score=-1.0)
        ]
        single = [
            [(m.slice_id, m.score) for m in ix.find(q, n=4, min_score=-1.0)]
            for q in qs
        ]
        assert batch == single
        ms = vt.MeshSearch(vt.make_mesh())
        mesh = [
            [(m.slice_id, m.score) for m in r]
            for r in ix.find_batch(qs, n=4, min_score=-1.0, mesh=ms)
        ]
        assert mesh == single
        # per-query options on cross-modality trees stay per-query
        b2 = [
            [(m.slice_id, m.score) for m in r]
            for r in ix.find_batch(qs[:2], n=3, min_score=-1.0,
                                   submatch_weight=0.5)
        ]
        s2 = [
            [
                (m.slice_id, m.score)
                for m in ix.find(q, n=3, min_score=-1.0, submatch_weight=0.5)
            ]
            for q in qs[:2]
        ]
        assert b2 == s2


def test_ctx_find_batch_booster_matches_single(ctx_session):
    """Boosters ride the contextual AND mixed-tree serving batches
    (in-kernel ranking multiply + boosted exact rescore), single-chip and
    mesh, byte-equal to find()."""
    import vectorian_tpu as vt
    from vectorian_tpu.saliency import KeywordSignal, Saliency

    session, static_emb, ctx_emb = ctx_session
    sal = Saliency(strength=0.8).add_signal(KeywordSignal("horse"), 1.0)
    qs = ["the old king rides", "a bird sings loud"]
    for token_sim in (
        EmbeddingTokenSim(ctx_emb),
        MixedTokenSimilarity(
            [EmbeddingTokenSim(static_emb), EmbeddingTokenSim(ctx_emb)],
            [0.5, 0.5],
        ),
    ):
        ix = session.partition("sentence").index(token_sim)
        want = [
            [
                (m.slice_id, m.score)
                for m in ix.find(q, n=4, min_score=0.01, booster=sal)
            ]
            for q in qs
        ]
        got = [
            [(m.slice_id, m.score) for m in r]
            for r in ix.find_batch(qs, n=4, min_score=0.01, booster=sal)
        ]
        assert got == want
        ms = vt.MeshSearch(vt.make_mesh())
        got_mesh = [
            [(m.slice_id, m.score) for m in r]
            for r in ix.find_batch(qs, n=4, min_score=0.01, booster=sal,
                                   mesh=ms)
        ]
        assert got_mesh == want


@pytest.mark.slow
def test_ctx_find_batch_options_match_single(ctx_session):
    """submatch_weight, bidirectional and doc-side token filters ride the
    contextual AND mixed-tree serving batches (closed round-2 exclusion) —
    single-chip and mesh, byte-equal to find()."""
    import vectorian_tpu as vt

    session, static_emb, ctx_emb = ctx_session
    qs = ["the old king rides", "a bird sings loud", "cat sleeps"]
    option_sets = [
        {"submatch_weight": 0.5},
        {"bidirectional": True},
        {"token_filter": ["the", "a"]},
        {"submatch_weight": 0.5, "bidirectional": True,
         "token_filter": ["the"]},
    ]
    for token_sim in (
        EmbeddingTokenSim(ctx_emb),
        MixedTokenSimilarity(
            [EmbeddingTokenSim(static_emb), EmbeddingTokenSim(ctx_emb)],
            [0.5, 0.5],
        ),
    ):
        ix = session.partition("sentence").index(token_sim)
        ms = vt.MeshSearch(vt.make_mesh())
        for kwargs in option_sets:
            want = [
                [
                    (m.slice_id, m.score)
                    for m in ix.find(q, n=4, min_score=-1.0, **kwargs)
                ]
                for q in qs
            ]
            got = [
                [(m.slice_id, m.score) for m in r]
                for r in ix.find_batch(qs, n=4, min_score=-1.0, **kwargs)
            ]
            assert got == want, (type(token_sim).__name__, kwargs)
            got_mesh = [
                [(m.slice_id, m.score) for m in r]
                for r in ix.find_batch(
                    qs, n=4, min_score=-1.0, mesh=ms, **kwargs
                )
            ]
            assert got_mesh == want, (type(token_sim).__name__, kwargs)


def test_mixed_tree_tag_weighted_batch_and_mesh(ctx_session):
    """Tag weights on mixed-modifier contextual trees ride the batch AND
    mesh kernels (the round-3 NotImplementedError holes) — per-query tag
    weighting applies to the combined tree similarity in
    score_all_multi_tree / tree_score_topk_multiquery, byte-equal to
    find()."""
    import vectorian_tpu as vt
    from vectorian_tpu.sim.span import OptimizedSpanSim

    session, static_emb, ctx_emb = ctx_session
    tree = MixedTokenSimilarity(
        [EmbeddingTokenSim(static_emb), EmbeddingTokenSim(ctx_emb)],
        [0.6, 0.4],
    )
    tw = {"NN": 1.0, "VB": 0.8, "DT": 0.3}
    ix = session.partition("sentence").index(
        OptimizedSpanSim(
            tree, tag_weights=tw, pos_mismatch_penalty=0.25,
            similarity_threshold=0.05,
        )
    )
    qs = ["the old king rides", "a bird sings loud"]
    single = [
        [(m.slice_id, m.score) for m in ix.find(q, n=4, min_score=-1.0)]
        for q in qs
    ]
    batch = [
        [(m.slice_id, m.score) for m in r]
        for r in ix.find_batch(qs, n=4, min_score=-1.0)
    ]
    assert batch == single
    ms = vt.MeshSearch(vt.make_mesh())
    mesh = [
        [(m.slice_id, m.score) for m in r]
        for r in ix.find_batch(qs, n=4, min_score=-1.0, mesh=ms)
    ]
    assert mesh == single
    # the weighting must actually bite (scores differ from unweighted)
    plain = session.partition("sentence").index(tree)
    unweighted = [
        [(m.slice_id, m.score) for m in plain.find(q, n=4, min_score=-1.0)]
        for q in qs
    ]
    assert single != unweighted
