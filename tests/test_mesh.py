"""Multi-chip sharding tests on the 8-virtual-device CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vectorian_tpu.ops.alignment import AffineGapParams, align_scores
from vectorian_tpu.parallel.mesh import MeshSearch, make_mesh


@pytest.fixture(scope="module")
def mesh_search():
    assert len(jax.devices()) == 8, jax.devices()
    return MeshSearch(make_mesh())


def _problem(rng, N=64, L=12, T=4, V=300):
    tokens = rng.integers(1, V, size=(N, L)).astype(np.int32)
    lengths = rng.integers(1, L + 1, size=N).astype(np.int32)
    sim = rng.uniform(0, 1, size=(V, T)).astype(np.float32)
    return tokens, lengths, sim


def test_sharded_matches_single_device(rng, mesh_search):
    tokens, lengths, sim = _problem(rng)
    T = sim.shape[1]
    gaps = AffineGapParams.of(0.1, 0.05, 0.1, 0.05)

    tok_d, len_d = mesh_search.shard_bucket(tokens, lengths)
    sim_d = mesh_search.put_replicated(sim)
    scores, idx = mesh_search.score_topk(
        tok_d, len_d, sim_d, jnp.asarray(T, jnp.int32), gaps,
        jnp.asarray(float(T), jnp.float32), locality="local", k=10,
    )
    # single-device reference
    S = jnp.asarray(sim)[jnp.asarray(tokens)]
    raw = np.asarray(
        align_scores(S, jnp.asarray(np.maximum(lengths, 1)),
                     jnp.full((len(lengths),), T, jnp.int32), gaps, "local")
    )
    want = raw / T
    got_scores = np.asarray(scores)
    got_idx = np.asarray(idx)
    order = np.argsort(-want, kind="stable")[:10]
    np.testing.assert_allclose(np.sort(got_scores), np.sort(want[order]), atol=1e-5)
    for s, i in zip(got_scores, got_idx):
        assert want[i] == pytest.approx(s, abs=1e-5)


def test_shardmap_topk_matches(rng, mesh_search):
    tokens, lengths, sim = _problem(rng, N=128)
    T = sim.shape[1]
    gaps = AffineGapParams.of(0.0, 0.0, 0.0, 0.0)
    tok_d, len_d = mesh_search.shard_bucket(tokens, lengths)
    sim_d = mesh_search.put_replicated(sim)
    s1, i1 = mesh_search.score_topk(
        tok_d, len_d, sim_d, jnp.asarray(T, jnp.int32), gaps,
        jnp.asarray(float(T), jnp.float32), locality="local", k=8,
    )
    s2, i2 = mesh_search.score_topk_shardmap(
        tok_d, len_d, sim_d, jnp.asarray(T, jnp.int32), gaps,
        jnp.asarray(float(T), jnp.float32), locality="local", k=8,
    )
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), atol=1e-5)
    # indices may tie-swap only where scores tie
    sa = np.asarray(s1)
    for a, b, s in zip(np.asarray(i1), np.asarray(i2), sa):
        if a != b:
            assert np.isclose(s, sa[np.asarray(s2) == s][0], atol=1e-6)


def test_multiquery_mesh_matches_single_device(rng, mesh_search):
    """Sharded serving batch: per-query global top-k must equal the
    single-device per-query results."""
    tokens, lengths, sim = _problem(rng, N=128, T=8)
    T, Q, k = 8, 5, 6
    sim_multi = rng.uniform(0, 1, size=(sim.shape[0], T, Q)).astype(np.float32)
    gaps = AffineGapParams.of(0.2, 0.1, 0.2, 0.1)
    len_t = rng.integers(1, T + 1, size=Q).astype(np.int32)

    tok_d, len_d = mesh_search.shard_bucket(tokens, lengths)
    sm_d = mesh_search.put_replicated(sim_multi)
    s, i = mesh_search.score_topk_multiquery(
        tok_d, len_d, sm_d, jnp.asarray(len_t), gaps,
        jnp.asarray(len_t, jnp.float32), locality="local", k=k,
    )
    s, i = np.asarray(s), np.asarray(i)
    assert s.shape == (Q, k)

    # single-device reference, one query at a time
    for q in range(Q):
        S = jnp.asarray(sim_multi[:, :, q])[jnp.asarray(tokens)]
        raw = np.asarray(
            align_scores(
                S, jnp.asarray(np.maximum(lengths, 1)),
                jnp.full((len(lengths),), int(len_t[q]), jnp.int32),
                gaps, "local",
            )
        )
        want = raw / float(len_t[q])
        top = np.sort(want)[::-1][:k]
        np.testing.assert_allclose(np.sort(s[q])[::-1], top, atol=1e-5)
        for sc, ii in zip(s[q], i[q]):
            assert want[ii] == pytest.approx(sc, abs=1e-5)


def test_graft_dryrun_runs():
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_multiquery_mesh_quantized(rng, mesh_search):
    """int8 table through the sharded serving batch: homogeneity keeps the
    ranking within the quantization bound of the f32 mesh results."""
    tokens, lengths, sim = _problem(rng, N=128, T=8)
    T, Q, k = 8, 4, 6
    sim_multi = rng.uniform(0, 1, size=(sim.shape[0], T, Q)).astype(np.float32)
    gaps = AffineGapParams.of(0.2, 0.1, 0.2, 0.1)
    len_t = np.full((Q,), T, np.int32)

    scale = float(np.abs(sim_multi).max()) / 127.0
    sim_q = np.round(sim_multi / scale).astype(np.int8)

    tok_d, len_d = mesh_search.shard_bucket(tokens, lengths)
    nt = jnp.asarray(len_t, jnp.float32)
    s_f, i_f = mesh_search.score_topk_multiquery(
        tok_d, len_d, mesh_search.put_replicated(sim_multi),
        jnp.asarray(len_t), gaps, nt, locality="local", k=k,
    )
    s_q, i_q = mesh_search.score_topk_multiquery(
        tok_d, len_d, mesh_search.put_replicated(sim_q),
        jnp.asarray(len_t), gaps, nt, locality="local", k=k,
        sim_scale=jnp.asarray(scale, jnp.float32),
    )
    # entry_err = scale/2 per matched cell, <= T cells, / norm_total (= T)
    eps = scale / 2.0 + 1e-5
    np.testing.assert_allclose(np.asarray(s_q), np.asarray(s_f), atol=eps)


def test_multiquery_mesh_with_next_bound(rng, mesh_search):
    """with_next: next_best must upper-bound (and exactly equal the max of)
    every score OUTSIDE the returned candidate set — the mesh analogue of
    top_k_with_next for the quantized cut proof."""
    tokens, lengths, sim = _problem(rng, N=128, T=8)
    T, Q, k = 8, 3, 4
    sim_multi = rng.uniform(0, 1, size=(sim.shape[0], T, Q)).astype(np.float32)
    gaps = AffineGapParams.of(0.2, 0.1, 0.2, 0.1)
    len_t = np.full((Q,), T, np.int32)

    tok_d, len_d = mesh_search.shard_bucket(tokens, lengths)
    nt = jnp.asarray(len_t, jnp.float32)
    s, i, nxt = mesh_search.score_topk_multiquery(
        tok_d, len_d, mesh_search.put_replicated(sim_multi),
        jnp.asarray(len_t), gaps, nt, locality="local", k=k, with_next=True,
    )
    s, i, nxt = np.asarray(s), np.asarray(i), np.asarray(nxt)

    # dense single-device reference scores
    npad = tok_d.shape[0]
    for q in range(Q):
        S = jnp.asarray(sim_multi[:, :, q])[jnp.asarray(tokens)]
        raw = np.asarray(
            align_scores(
                S, jnp.asarray(np.maximum(lengths, 1)),
                jnp.full((len(lengths),), T, jnp.int32), gaps, "local",
            )
        )
        dense = raw / float(T)
        outside = np.setdiff1d(np.arange(len(dense)), i[q][i[q] < len(dense)])
        if len(outside):
            assert nxt[q] >= dense[outside].max() - 1e-5
            np.testing.assert_allclose(nxt[q], dense[outside].max(), atol=1e-5)


def test_find_batch_mesh_public_api(session_ix_mesh):
    """index.find_batch(mesh=...) must return exactly the single-chip
    results — ids, scores, order — for int8 (default) and f32 ranking."""
    session, index = session_ix_mesh
    queries = [
        "the old king rides the grey horse",
        "a small bird sings in the tree",
        "king horse",
        "",
    ]
    want = [
        [(m.slice_id, m.score) for m in r]
        for r in index.find_batch(queries, n=5, min_score=0.1,
                                  sim_precision="float32")
    ]
    ms = MeshSearch(make_mesh())
    for prec in ("int8", "float32"):
        got_res = index.find_batch(
            queries, n=5, min_score=0.1, sim_precision=prec, mesh=ms,
        )
        got = [[(m.slice_id, m.score) for m in r] for r in got_res]
        assert got == want, prec
    # a raw jax Mesh is accepted too
    got_res = index.find_batch(queries[:2], n=5, min_score=0.1,
                               mesh=make_mesh())
    got = [[(m.slice_id, m.score) for m in r] for r in got_res]
    assert got == want[:2]


def test_find_mesh_public_api(session_ix_mesh):
    """index.find(text, mesh=...) serves ONE query with every chip
    (VERDICT r4 item 2; reference bar: one query on all cores,
    index.py:530-560) and must return exactly the single-chip find()
    matches — ids, scores, order."""
    session, index = session_ix_mesh
    ms = MeshSearch(make_mesh())
    for q in ["the old king rides the grey horse", "king horse", ""]:
        want = [
            (m.slice_id, m.score)
            for m in index.find(q, n=5, min_score=0.1)
        ]
        got = [
            (m.slice_id, m.score)
            for m in index.find(q, n=5, min_score=0.1, mesh=ms)
        ]
        assert got == want, q
    # options ride through the delegation: bidirectional + submatch
    q = "the old king rides"
    want = [
        (m.slice_id, m.score)
        for m in index.find(
            q, n=4, min_score=0.0, bidirectional=True, submatch_weight=0.5
        )
    ]
    got = [
        (m.slice_id, m.score)
        for m in index.find(
            q, n=4, min_score=0.0, bidirectional=True, submatch_weight=0.5,
            mesh=ms,
        )
    ]
    assert got == want


@pytest.fixture(scope="module")
def session_ix_mesh():
    from vectorian_tpu import Session, StringImporter
    from vectorian_tpu.sim.token import EmbeddingTokenSim

    from .helpers import WORDS, make_corpus_texts, make_embedding

    rng = np.random.default_rng(5)
    planted = [
        "the old king rides the grey horse",
        "a small bird sings in the tree",
    ]
    texts, _ = make_corpus_texts(rng, n_docs=4, sents_per_doc=10, planted=planted)
    imp = StringImporter()
    docs = [imp(t, title=f"d{i}") for i, t in enumerate(texts)]
    words = sorted(
        set(WORDS)
        | {"old", "king", "rides", "grey", "horse", "small", "bird", "sings",
           "tree", "the", "a", "in"}
    )
    emb = make_embedding(words)
    session = Session(docs, embeddings=[emb])
    index = session.partition("sentence").index(EmbeddingTokenSim(emb))
    return session, index


def test_find_batch_mesh_debug_and_transport_tags(session_ix_mesh):
    """Every (metric x option) cell serves with a mesh argument: per-query
    debug hooks are documented single-chip diagnostics (find_batch serves
    them per query, byte-equal, payloads delivered), and transport + tag
    weights ride the mesh transport kernels."""
    from vectorian_tpu.alignment import WordRotatorsDistance
    from vectorian_tpu.sim.span import OptimizedSpanSim
    from vectorian_tpu.sim.token import EmbeddingTokenSim

    session, index = session_ix_mesh
    ms = MeshSearch(make_mesh())
    seen = []
    got_dbg = [
        [(m.slice_id, m.score) for m in r]
        for r in index.find_batch(
            ["king"], n=2, mesh=ms, debug=lambda name, p: seen.append(name)
        )
    ]
    want_dbg = [
        [(m.slice_id, m.score) for m in index.find("king", n=2)]
    ]
    assert got_dbg == want_dbg and seen
    emb = session.embeddings[0]
    # transport + tag weights ride the mesh transport kernels now
    # (tag-weighted sims + (id, tag) BOW identity in-shard) — byte-equal
    # to the single-query path
    wix = session.partition("sentence").index(
        OptimizedSpanSim(
            EmbeddingTokenSim(emb), WordRotatorsDistance(),
            tag_weights={"NN": 1.0}, pos_mismatch_penalty=0.1,
            similarity_threshold=0.0,
        )
    )
    qs = ["king rides", "a bird"]
    want = [
        [(m.slice_id, m.score) for m in wix.find(q, n=3, min_score=0.05)]
        for q in qs
    ]
    got = [
        [(m.slice_id, m.score) for m in r]
        for r in wix.find_batch(qs, n=3, min_score=0.05, mesh=ms)
    ]
    assert got == want


def test_find_batch_mesh_doc_filter(session_ix_mesh):
    """Doc-side token filters ride the mesh kernels (in-shard compaction)
    and return byte-identical results to find()."""
    session, index = session_ix_mesh
    ms = MeshSearch(make_mesh())
    queries = ["the old king rides the grey horse", "bird sings tree"]
    kwargs = dict(n=4, min_score=0.05, token_filter=["the", "a"])
    want = [
        [(m.slice_id, m.score) for m in index.find(q, **kwargs)]
        for q in queries
    ]
    got = [
        [(m.slice_id, m.score) for m in r]
        for r in index.find_batch(queries, mesh=ms, **kwargs)
    ]
    assert got == want
    # single-chip batch agrees too
    got1 = [
        [(m.slice_id, m.score) for m in r]
        for r in index.find_batch(queries, **kwargs)
    ]
    assert got1 == want


def test_find_batch_mesh_tag_weighted(session_ix_mesh):
    """Tag-weighted alignment over the mesh (f32 ranking + per-query tag
    columns in-shard) returns byte-identical matches to find()."""
    from vectorian_tpu.sim.span import OptimizedSpanSim
    from vectorian_tpu.sim.token import EmbeddingTokenSim

    session, _ = session_ix_mesh
    emb = session.embeddings[0]
    tw = {"NN": 1.0, "VB": 0.9, "JJ": 0.7, "DT": 0.2}
    ix = session.partition("sentence").index(
        OptimizedSpanSim(
            EmbeddingTokenSim(emb), tag_weights=tw,
            pos_mismatch_penalty=0.2, similarity_threshold=0.1,
        )
    )
    queries = [
        "the old king rides the grey horse",
        "a small bird sings in the tree",
    ]
    want = [
        [(m.slice_id, m.score) for m in ix.find(q, n=5, min_score=-5.0)]
        for q in queries
    ]
    ms = MeshSearch(make_mesh())
    got = [
        [(m.slice_id, m.score) for m in r]
        for r in ix.find_batch(queries, n=5, min_score=-5.0, mesh=ms)
    ]
    assert got == want


def test_find_batch_mesh_contextual():
    """Contextual alignment metrics serve over the mesh ([N, L, d] bucket
    stores sharded, stacked-query GEMM per shard) and return byte-identical
    matches to the single-chip batch and find()."""
    from tests.test_contextual import ctx_fn, DIM
    from vectorian_tpu import Session, StringImporter
    from vectorian_tpu.embedding.contextual import LambdaContextualEmbedding
    from vectorian_tpu.sim.token import EmbeddingTokenSim

    ctx = LambdaContextualEmbedding("mesh-ctx", ctx_fn, DIM)
    docs = [
        StringImporter()(
            "the old king rides the grey horse. a cat sleeps here. "
            "stars shine at night. the horse rides again.",
            title="d0",
        ),
        StringImporter()(
            "a small bird sings in the tree. the king sleeps.", title="d1"
        ),
    ]
    session = Session(docs, embeddings=[ctx])
    index = session.partition("sentence").index(EmbeddingTokenSim(ctx))
    queries = ["the old king rides", "bird sings tree"]
    want = [
        [(m.slice_id, m.score) for m in index.find(q, n=4, min_score=0.05)]
        for q in queries
    ]
    assert any(want)
    got1 = [
        [(m.slice_id, m.score) for m in r]
        for r in index.find_batch(queries, n=4, min_score=0.05)
    ]
    assert got1 == want
    ms = MeshSearch(make_mesh())
    got = [
        [(m.slice_id, m.score) for m in r]
        for r in index.find_batch(queries, n=4, min_score=0.05, mesh=ms)
    ]
    assert got == want


def test_find_batch_mesh_full_wmd_wrd(session_ix_mesh):
    """Full-WMD and WRD serving over the mesh: per-shard batched Sinkhorn
    ranking + all-gather merge, exact host EMD rescore.  With n large
    enough that the 4n overfetch covers the whole corpus the candidate set
    is complete on both paths, so mesh and single-chip batches must return
    identical (slice, score) lists — and the reported scores are the exact
    EMD scores find() reports."""
    from vectorian_tpu.alignment import WordMoversDistance, WordRotatorsDistance
    from vectorian_tpu.sim.span import OptimizedSpanSim
    from vectorian_tpu.sim.token import EmbeddingTokenSim

    session, _ = session_ix_mesh
    emb = session.embeddings[0]
    queries = ["the old king rides the grey horse", "bird sings tree"]
    for optimizer in [WordMoversDistance.wmd("nbow"), WordRotatorsDistance()]:
        ix = session.partition("sentence").index(
            OptimizedSpanSim(EmbeddingTokenSim(emb), optimizer)
        )
        n = ix.packed.n_slices  # 4n overfetch covers everything
        want = [
            [(m.slice_id, m.score) for m in r]
            for r in ix.find_batch(queries, n=n, min_score=0.05)
        ]
        assert any(want), optimizer
        ms = MeshSearch(make_mesh())
        got = [
            [(m.slice_id, m.score) for m in r]
            for r in ix.find_batch(queries, n=n, min_score=0.05, mesh=ms)
        ]
        assert got == want, optimizer
        # spot-check against find(): exact EMD scores, same top hit
        r0 = ix.find(queries[0], n=3, min_score=0.05)
        assert got[0][0][0] == r0[0].slice_id
        assert got[0][0][1] == pytest.approx(r0[0].score, abs=1e-6)


def test_find_batch_mesh_rwmd(session_ix_mesh):
    """Relaxed-WMD serving over the mesh must equal the single-chip
    transport batch exactly (ids, scores, order)."""
    from vectorian_tpu.alignment import WordMoversDistance
    from vectorian_tpu.sim.span import OptimizedSpanSim
    from vectorian_tpu.sim.token import EmbeddingTokenSim

    session, index = session_ix_mesh
    emb = session.embeddings[0]
    for variant in ("nbow", "bow/fast"):
        ix = session.partition("sentence").index(
            OptimizedSpanSim(EmbeddingTokenSim(emb), WordMoversDistance.rwmd(variant))
        )
        queries = [
            "the old king rides the grey horse",
            "bird sings tree",
            "king",
        ]
        want = [
            [(m.slice_id, m.score) for m in r]
            for r in ix.find_batch(queries, n=4, min_score=-5.0)
        ]
        ms = MeshSearch(make_mesh())
        got = [
            [(m.slice_id, m.score) for m in r]
            for r in ix.find_batch(queries, n=4, min_score=-5.0, mesh=ms)
        ]
        assert got == want, variant
