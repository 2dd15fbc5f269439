"""Batched multi-query search tests."""

import numpy as np
import pytest

from vectorian_tpu import Session, StringImporter
from vectorian_tpu.sim.token import EmbeddingTokenSim

from .helpers import WORDS, make_corpus_texts, make_embedding


@pytest.fixture(scope="module")
def session_ix():
    rng = np.random.default_rng(5)
    planted = [
        "the old king rides the grey horse",
        "a small bird sings in the tree",
    ]
    texts, locations = make_corpus_texts(rng, n_docs=4, sents_per_doc=10, planted=planted)
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
    return session, index, locations


def test_find_batch_matches_single(session_ix):
    session, index, locations = session_ix
    queries = [
        "the old king rides the grey horse",
        "a small bird sings in the tree",
        "quickly the fish jumps",
    ]
    batch = index.find_batch(queries, n=5, min_score=-5.0)
    assert len(batch) == 3
    for q, br in zip(queries, batch):
        sr = index.find(q, n=5, min_score=-5.0)
        # both paths report the finalizer's exact f32 scores, so single and
        # batched results are bit-identical (incl. tie-breaks)
        got = [(m.slice_id, m.score) for m in br]
        want = [(m.slice_id, m.score) for m in sr]
        assert got == want, q


def test_preloaded_leaf_inputs_bitwise(session_ix):
    """The batched needle upload (preload_leaf_inputs) must leave the
    per-query leaf GEMM bits untouched: same executable, same operand
    bytes, bit-identical [V, T] matrices (find/find_batch byte-equality
    rests on this)."""
    import jax.numpy as jnp

    from vectorian_tpu.index import _pad_needle
    from vectorian_tpu.ops.simmatrix import compile_plan, preload_leaf_inputs

    session, index, locations = session_ix
    token_sim = index._args["metric"]["token_sim"]
    texts = [
        "the old king rides the grey horse",
        "a small bird sings in the tree",
        "king horse unknownword",  # OOV id path
    ]
    padded = []
    for t in texts:
        pq = index.make_query(t, n=3, min_score=0.0).prepare(index._nlp)
        padded.append(_pad_needle(pq, session, with_ctx=False))
    pre = preload_leaf_inputs(
        token_sim,
        session.compiled_embeddings,
        [(p[0], p[1]) for p in padded],
    )
    for (ids, strings, _, _), pl in zip(padded, pre):
        for needs_mag in (False, True):
            qp_a = compile_plan(
                token_sim, session.compiled_embeddings, ids, strings, {},
                needs_magnitudes=needs_mag,
            )
            qp_b = compile_plan(
                token_sim, session.compiled_embeddings, ids, strings, {},
                needs_magnitudes=needs_mag, preloaded=pl,
            )
            a = np.asarray(qp_a.static_sims[0])
            b = np.asarray(qp_b.static_sims[0])
            assert a.tobytes() == b.tobytes()
            ma = np.asarray(qp_a.static_mags[0])
            mb = np.asarray(qp_b.static_mags[0])
            assert ma.tobytes() == mb.tobytes()


def test_find_batch_different_lengths(session_ix):
    """Queries of different token counts share one pass (padding)."""
    session, index, locations = session_ix
    batch = index.find_batch(["king", "the old king rides the grey horse"], n=3)
    assert len(batch) == 2
    assert batch[1][0].score == pytest.approx(1.0, abs=1e-4)


def test_find_batch_tag_weighted_matches_single(session_ix):
    """Tag-weighted batch search must replicate the single-query path."""
    from vectorian_tpu.sim.span import OptimizedSpanSim
    from vectorian_tpu.sim.token import EmbeddingTokenSim as ETS

    session, index, locations = session_ix
    emb = session.embeddings[0]
    tw = {"NN": 1.0, "VB": 0.9, "JJ": 0.7, "DT": 0.2}
    ix = session.partition("sentence").index(
        OptimizedSpanSim(
            ETS(emb), tag_weights=tw,
            pos_mismatch_penalty=0.2, similarity_threshold=0.1,
        )
    )
    queries = [
        "the old king rides the grey horse",
        "a small bird sings in the tree",
    ]
    batch = ix.find_batch(queries, n=5, min_score=-5.0)
    for q, br in zip(queries, batch):
        sr = ix.find(q, n=5, min_score=-5.0)
        # tagged batches route through the same exact finalizer: byte-equal
        got = [(m.slice_id, m.score) for m in br]
        want = [(m.slice_id, m.score) for m in sr]
        assert got == want, q


def test_find_batch_doc_filter_matches_single(session_ix):
    """Doc-side token filters ride the batch kernel (in-kernel compaction)
    and must return byte-identical matches to find()."""
    session, index, locations = session_ix
    qs = ["the old king rides the grey horse", "a small bird sings"]
    batch = index.find_batch(qs, n=4, min_score=-5.0, token_filter=["the"])
    for q, br in zip(qs, batch):
        sr = index.find(q, n=4, min_score=-5.0, token_filter=["the"])
        got = [(m.slice_id, m.score) for m in br]
        want = [(m.slice_id, m.score) for m in sr]
        assert got == want, q


def test_find_batch_booster_matches_single(session_ix):
    """Boosters multiply the batch ranking and the exact rescore alike —
    batch (every precision) and mesh results equal find() byte-for-byte."""
    from vectorian_tpu.parallel.mesh import MeshSearch, make_mesh
    from vectorian_tpu.saliency import KeywordSignal, Saliency

    session, index, locations = session_ix
    sal = Saliency(strength=0.8).add_signal(KeywordSignal("horse"), 1.0)
    qs = ["the old king rides the grey horse", "a small bird sings"]
    want = [
        [(m.slice_id, m.score) for m in index.find(
            q, n=4, min_score=0.01, booster=sal)]
        for q in qs
    ]
    for prec in ("float32", "int8", "bfloat16"):
        got = [
            [(m.slice_id, m.score) for m in r]
            for r in index.find_batch(
                qs, n=4, min_score=0.01, booster=sal, sim_precision=prec
            )
        ]
        assert got == want, prec
    ms = MeshSearch(make_mesh())
    got_mesh = [
        [(m.slice_id, m.score) for m in r]
        for r in index.find_batch(qs, n=4, min_score=0.01, booster=sal, mesh=ms)
    ]
    assert got_mesh == want


def test_unsafe_cut_rescore_is_tie_bounded(monkeypatch):
    """Tie-heavy corpora make the overfetch cut unsafe (the n-th score
    ties dozens of identical slices).  The finalize fallback must rescore
    only the TIE GROUP — not the whole corpus (a full-coverage retry
    measured 100k+ host tracebacks on a 1M-slice Zipf corpus)."""
    from vectorian_tpu import Session, StringImporter
    from vectorian_tpu.ops.search import BruteForceEngine

    rng = np.random.default_rng(9)
    planted = "the king rides the horse"
    fillers = ["a bird sings softly here", "grey clouds drift over town",
               "a cat sleeps on the mat", "ships sail across the sea"]
    sents = [planted] * 40
    for _ in range(160):
        w = fillers[int(rng.integers(0, len(fillers)))].split()
        rng.shuffle(w)
        sents.append(" ".join(w))
    rng.shuffle(sents)
    docs = [
        StringImporter()(". ".join(sents[i::4]) + ".", title=f"d{i}")
        for i in range(4)
    ]
    words = sorted({w for s in sents for w in s.split()})
    emb = make_embedding(words)
    session = Session(docs, embeddings=[emb])
    index = session.partition("sentence").index(EmbeddingTokenSim(emb))
    n_slices = index.packed.n_slices
    assert n_slices >= 190

    rescored = []
    orig = BruteForceEngine.rescore_with_flows

    def counting(self, slice_ids, *a, **k):
        rescored.append(len(slice_ids))
        return orig(self, slice_ids, *a, **k)

    monkeypatch.setattr(BruteForceEngine, "rescore_with_flows", counting)
    res = index.find_batch([planted], n=5, min_score=0.2)[0]
    assert len(res) == 5
    assert all(m.score == pytest.approx(1.0, abs=1e-5) for m in res)
    # byte-parity with find() under ties (the (doc, slice) order decides)
    want = [(m.slice_id, m.score) for m in index.find(planted, n=5, min_score=0.2)]
    assert [(m.slice_id, m.score) for m in res] == want
    # the rescore totals must be bounded by overfetch + tie group (~40),
    # never the corpus
    assert sum(rescored) < 140, rescored


def test_find_batch_submatch_weight_matches_single(session_ix):
    """submatch_weight rides the batch kernels (_finalize_submatch_many:
    closed-form-bounded 4n overfetch + flow-aware exact rescore) and
    returns byte-identical results to find()'s per-query path."""
    session, index, locations = session_ix
    qs = ["the old king rides the grey horse", "a small bird sings"]
    for prec in ("float32", "int8"):
        batch = index.find_batch(
            qs, n=4, min_score=-5.0, submatch_weight=0.5, sim_precision=prec
        )
        for q, br in zip(qs, batch):
            sr = index.find(q, n=4, min_score=-5.0, submatch_weight=0.5)
            got = [(m.slice_id, m.score) for m in br]
            want = [(m.slice_id, m.score) for m in sr]
            assert got == want, (q, prec)


def test_find_batch_bidirectional_matches_single(session_ix):
    """bidirectional rides the batch kernels (both orientations on the
    stacked table, exact-score merge with forward winning ties) and
    returns byte-identical results to find()."""
    session, index, locations = session_ix
    qs = ["horse grey the rides king old the", "a small bird sings"]
    for kw in (
        {"bidirectional": True},
        {"bidirectional": True, "submatch_weight": 0.4},
    ):
        batch = index.find_batch(qs, n=4, min_score=-5.0, **kw)
        for q, br in zip(qs, batch):
            sr = index.find(q, n=4, min_score=-5.0, **kw)
            got = [(m.slice_id, m.score) for m in br]
            want = [(m.slice_id, m.score) for m in sr]
            assert got == want, (q, kw)
        # the reversed-needle orientation must actually WIN somewhere:
        # the corpus plants the reversed query as a sentence
        plain = index.find(qs[0], n=4, min_score=-5.0)
        bi = index.find(qs[0], n=4, min_score=-5.0, bidirectional=True)
        assert bi[0].score >= plain[0].score


def test_score_all_multi_mixed_tag_batch(session_ix):
    """A mixed batch (one tagged, one untagged plan) must leave the
    untagged query's scores untouched (per-query penalty/threshold)."""
    import jax.numpy as jnp

    from vectorian_tpu.ops.alignment import AffineGapParams
    from vectorian_tpu.ops.search import TagWeightingSpec
    from vectorian_tpu.ops.simmatrix import compile_plan

    session, index, locations = session_ix
    engine = index._engine
    token_sim = index._args["metric"]["token_sim"]

    pqs = [
        index.make_query("the old king rides", n=5).prepare(index._nlp),
        index.make_query("a small bird sings", n=5).prepare(index._nlp),
    ]
    plans, len_ts = [], []
    for pq in pqs:
        plans.append(
            compile_plan(
                token_sim, session.compiled_embeddings,
                pq.token_ids, pq.token_strings, {},
            )
        )
        len_ts.append(pq.n_tokens)
    gaps = AffineGapParams.of(0.0, 0.0, 0.0, 0.0)
    tagw0 = TagWeightingSpec(
        t_pos_weights=np.full((len_ts[0],), 0.5, np.float32),
        pos_t=pqs[0].pos_ids,
        pos_mismatch_penalty=0.3,
        similarity_threshold=0.2,
    )
    mixed = engine.score_all_multi(
        plans, len_ts, gaps, "local",
        [tagw0.total, float(len_ts[1])],
        tag_weights=[tagw0, None],
    )
    plain = engine.score_all_multi(
        plans, len_ts, gaps, "local",
        [float(len_ts[0]), float(len_ts[1])],
    )
    # the untagged query (column 1) must be bit-identical to the plain run
    np.testing.assert_array_equal(mixed[:, 1], plain[:, 1])
    # the tagged query must differ (weights 0.5 halve everything)
    valid = plain[:, 0] > -1e29
    assert not np.allclose(mixed[valid, 0], plain[valid, 0])


def test_find_batch_empty_query(session_ix):
    session, index, locations = session_ix
    batch = index.find_batch(["", "king rides"], n=3)
    assert len(batch[0]) == 0
    assert len(batch[1]) >= 1


def test_find_all_oov_query(session_ix):
    """A query of only OOV tokens has a non-empty needle but an empty
    candidate pool (every score falls below min_score) — both find() and
    find_batch() must return empty, not crash in the finalizer
    (order_by_score used to choke on the empty float64 id array)."""
    session, index, locations = session_ix
    oov = "zzzunknown qqqwords xxnothere"
    assert len(index.find(oov, n=3, min_score=0.2)) == 0
    batch = index.find_batch([oov, "king rides"], n=3, min_score=0.2)
    assert len(batch[0]) == 0
    assert len(batch[1]) >= 1


def test_find_batch_contextual_matches_single():
    """Contextual batch serving: one stacked-GEMM corpus pass must match
    the single-query contextual path exactly."""
    from tests.test_contextual import DIM, ctx_fn
    from vectorian_tpu import Session, StringImporter
    from vectorian_tpu.embedding.contextual import LambdaContextualEmbedding
    from vectorian_tpu.sim.token import EmbeddingTokenSim as ETS

    ctx = LambdaContextualEmbedding("batch-ctx", ctx_fn, DIM)
    docs = [StringImporter()(
        "the old king rides the grey horse. a cat sleeps. the sun shines over the sea.",
        title="d0",
    )]
    session = Session(docs, embeddings=[ctx])
    ix = session.partition("sentence").index(ETS(ctx))
    queries = ["the old king rides the grey horse", "the sun shines", "cat sleeps"]
    batch = ix.find_batch(queries, n=3, min_score=-5.0)
    assert len(batch) == 3
    for q, br in zip(queries, batch):
        sr = ix.find(q, n=3, min_score=-5.0)
        # both paths report the per-slice finalizer's exact scores
        got = [(m.slice_id, m.score) for m in br]
        want = [(m.slice_id, m.score) for m in sr]
        assert got == want, q
    assert batch[0][0].score > 0.9


def test_find_batch_rwmd_matches_single(session_ix):
    """Batched relaxed WMD shares one corpus pass and must match the
    single-query transport path BYTE-identically: both paths report
    rwmd_score_host's shape-independent arithmetic (device kernels only
    rank — their f32 reduction trees vary with the compiled batch shape,
    which used to leak ~1-ulp drift into the reported scores)."""
    from vectorian_tpu.alignment import WordMoversDistance, WordRotatorsDistance
    from vectorian_tpu.sim.span import OptimizedSpanSim
    from vectorian_tpu.sim.token import EmbeddingTokenSim as ETS

    session, index, locations = session_ix
    emb = session.embeddings[0]
    ix = session.partition("sentence").index(
        OptimizedSpanSim(ETS(emb), WordMoversDistance.rwmd("nbow"))
    )
    queries = [  # mixed plan widths: one padded ranking pass serves all
        "horse grey the rides king old the",
        "bird sings tree",
        "the old king",
    ]
    batch = ix.find_batch(queries, n=4, min_score=-5.0)
    assert len(batch) == 3
    for q, br in zip(queries, batch):
        sr = ix.find(q, n=4, min_score=-5.0)
        got = [(m.slice_id, m.score) for m in br]
        want = [(m.slice_id, m.score) for m in sr]
        assert got == want, q

    # WRD batches exact-rescore under the provable cut, same guarantee
    ix2 = session.partition("sentence").index(
        OptimizedSpanSim(ETS(emb), WordRotatorsDistance())
    )
    b2 = ix2.find_batch(queries[:2], n=3, min_score=-5.0)
    for q, br in zip(queries[:2], b2):
        sr = ix2.find(q, n=3, min_score=-5.0)
        assert [(m.slice_id, m.score) for m in br] == [
            (m.slice_id, m.score) for m in sr
        ], q


def test_find_batch_quantized_equals_f32(session_ix):
    """quantized ranking + exact rescore must be bit-identical to pure f32
    (the cut-safety loop guarantees this by construction) — for both
    the int8 default and bf16."""
    session, index, locations = session_ix
    queries = [
        "the old king rides the grey horse",
        "a small bird sings in the tree",
        "quickly the fish jumps",
        "king horse",
    ]
    f32 = index.find_batch(queries, n=6, min_score=0.1, sim_precision="float32")
    want_all = [
        [(m.slice_id, m.score, tuple(m._mapping)) for m in r] for r in f32
    ]
    for prec in ("int8", "bfloat16"):
        got_res = index.find_batch(queries, n=6, min_score=0.1, sim_precision=prec)
        for q, rq, want in zip(queries, got_res, want_all):
            got = [(m.slice_id, m.score, tuple(m._mapping)) for m in rq]
            assert got == want, (prec, q)


def test_find_batch_bf16_cut_expansion(session_ix, monkeypatch):
    """A huge rounding bound forces the overfetch loop to expand (possibly
    to the whole corpus) — results must still equal the f32 path."""
    from vectorian_tpu.index import BruteForceIndex

    session, index, locations = session_ix
    monkeypatch.setattr(BruteForceIndex, "QUANT_SCORE_EPS", 0.5)
    queries = ["the old king rides the grey horse", "bird sings"]
    b16 = index.find_batch(queries, n=4, min_score=0.1)
    f32 = index.find_batch(queries, n=4, min_score=0.1, sim_precision="float32")
    for q, r16, r32 in zip(queries, b16, f32):
        got = [(m.slice_id, m.score) for m in r16]
        want = [(m.slice_id, m.score) for m in r32]
        assert got == want, q


def test_top_k_with_next(session_ix):
    session, index, locations = session_ix
    eng = index._engine
    scores = np.asarray([0.9, 0.1, 0.8, 0.5, 0.3], np.float32)
    # m covers everything above thresh -> complete, -inf sentinel
    ids, nxt = eng.top_k_with_next(scores, 10, 0.2)
    assert sorted(ids) == [0, 2, 3, 4] and nxt == float("-inf")
    # m truncates -> sentinel is the best excluded score
    ids, nxt = eng.top_k_with_next(scores, 2, 0.2)
    assert sorted(ids) == [0, 2] and nxt == np.float32(0.5)
    # partition boundary below thresh -> complete above thresh
    ids, nxt = eng.top_k_with_next(scores, 3, 0.6)
    assert sorted(ids) == [0, 2] and nxt == float("-inf")


@pytest.mark.slow
def test_fuzz_quantized_batch_parity(session_ix):
    """Randomized configs: quantized (int8/bf16) find_batch must be
    bit-identical to the f32 path — ids, scores, order — for random gap
    costs, localities and query mixes (the cut-safety loop's guarantee)."""
    from vectorian_tpu.alignment import (
        AffineGapCost,
        GlobalAlignment,
        LocalAlignment,
        SemiGlobalAlignment,
    )
    from vectorian_tpu.sim.span import OptimizedSpanSim
    from vectorian_tpu.sim.token import EmbeddingTokenSim as ETS

    session, index, locations = session_ix
    emb = session.embeddings[0]
    p = session.partition("sentence")
    rng = np.random.default_rng(77)
    locs = [LocalAlignment, GlobalAlignment, SemiGlobalAlignment]
    pool = [
        "the old king rides the grey horse",
        "small bird tree",
        "king",
        "grey horse rides",
        "a b c unknownwords",
    ]
    for trial in range(4):
        opt = locs[trial % 3](
            AffineGapCost(float(rng.uniform(0, 0.5)), float(rng.uniform(0, 0.3)))
        )
        ix = p.index(OptimizedSpanSim(ETS(emb), opt))
        queries = [str(q) for q in rng.choice(pool, size=3, replace=False)]
        ms = float(rng.uniform(-1.0, 0.3))
        want = [
            [(m.slice_id, m.score) for m in r]
            for r in ix.find_batch(queries, n=5, min_score=ms, sim_precision="float32")
        ]
        for prec in ("int8", "bfloat16"):
            got = [
                [(m.slice_id, m.score) for m in r]
                for r in ix.find_batch(queries, n=5, min_score=ms, sim_precision=prec)
            ]
            assert got == want, (trial, prec, ms)


def test_find_batch_full_wmd_and_wrd(session_ix):
    """Full (Sinkhorn-ranked, exact-EMD-rescored) WMD and WRD batch in one
    corpus pass — must match the single-query transport path exactly."""
    from vectorian_tpu.alignment import WordMoversDistance, WordRotatorsDistance
    from vectorian_tpu.sim.span import OptimizedSpanSim
    from vectorian_tpu.sim.token import EmbeddingTokenSim as ETS

    session, index, locations = session_ix
    emb = session.embeddings[0]
    queries = [
        "the old king rides the grey horse",
        "bird sings tree",
        "king horse oovwordzz",
    ]
    for opt in (WordMoversDistance.wmd("nbow"), WordRotatorsDistance()):
        ix = session.partition("sentence").index(OptimizedSpanSim(ETS(emb), opt))
        # n large enough that the 4n Sinkhorn-rank overfetch covers the
        # whole corpus: candidate membership is then deterministic (rank
        # scores differ at the last ulp between the batched and single
        # kernels; see _find_batch_emd)
        n_cover = ix.packed.n_slices // 4 + 1
        batch = ix.find_batch(queries, n=n_cover, min_score=-5.0)
        for q, br in zip(queries, batch):
            sr = ix.find(q, n=n_cover, min_score=-5.0)
            got = [(m.slice_id, round(m.score, 4)) for m in br]
            want = [(m.slice_id, round(m.score, 4)) for m in sr]
            assert got == want, (opt, q)


def test_submatch_booster_provable_batch_and_mesh(session_ix):
    """submatch_weight + booster rides every batched path under the
    boost-factored closed-form bound (_submatch_bound_boosted) instead of
    the old per-query 4n heuristic: find(), find_batch (f32 + int8) and
    mesh are byte-equal, and the top-n equals the rescore-everything
    oracle (a large n forces full coverage — no cut, no bound)."""
    from vectorian_tpu.parallel.mesh import MeshSearch, make_mesh
    from vectorian_tpu.saliency import KeywordSignal, Saliency

    session, index, locations = session_ix
    sal = Saliency(strength=0.7).add_signal(KeywordSignal("horse"), 1.0)
    qs = ["the old king rides the grey horse", "a small bird sings"]
    n_slices = index.packed.n_slices
    assert 4 * 4 < n_slices  # n=4 leaves unfetched slices -> bound engaged
    oracle = [
        [
            (m.slice_id, m.score)
            for m in index.find(
                q, n=n_slices + 8, min_score=-5.0, submatch_weight=0.5,
                booster=sal,
            )
        ][:4]
        for q in qs
    ]
    want = [
        [
            (m.slice_id, m.score)
            for m in index.find(
                q, n=4, min_score=-5.0, submatch_weight=0.5, booster=sal
            )
        ]
        for q in qs
    ]
    assert want == oracle
    for prec in ("float32", "int8"):
        got = [
            [(m.slice_id, m.score) for m in r]
            for r in index.find_batch(
                qs, n=4, min_score=-5.0, submatch_weight=0.5, booster=sal,
                sim_precision=prec,
            )
        ]
        assert got == want, prec
    ms = MeshSearch(make_mesh())
    got_mesh = [
        [(m.slice_id, m.score) for m in r]
        for r in index.find_batch(
            qs, n=4, min_score=-5.0, submatch_weight=0.5, booster=sal,
            mesh=ms,
        )
    ]
    assert got_mesh == want


def test_debug_hook_serves_on_mesh_batch(session_ix):
    """Per-query debug hooks no longer raise with mesh= — find_batch
    serves them single-chip per query (host-side diagnostics; documented
    in BATCH_HARD_OPTIONS), byte-equal to the plain batch."""
    from vectorian_tpu.parallel.mesh import MeshSearch, make_mesh

    session, index, locations = session_ix
    qs = ["the old king rides the grey horse"]
    payloads = []

    def dbg(name, data):
        payloads.append(name)

    ms = MeshSearch(make_mesh())
    got = [
        [(m.slice_id, m.score) for m in r]
        for r in index.find_batch(qs, n=3, min_score=0.01, debug=dbg, mesh=ms)
    ]
    want = [
        [(m.slice_id, m.score) for m in index.find(q, n=3, min_score=0.01)]
        for q in qs
    ]
    assert got == want
    assert "static_similarity_matrix" in payloads
