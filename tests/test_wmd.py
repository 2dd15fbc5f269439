"""Transport metric tests: RWMD greedy vs scalar oracle, Sinkhorn vs exact
EMD, end-to-end WMD/WRD search."""

import numpy as np
import pytest

from vectorian_tpu.ops.emd_exact import emd_score, exact_emd
from vectorian_tpu.ops.sinkhorn import sinkhorn_emd_score
from vectorian_tpu.ops.wmd import (
    _bucket_rwmd_scores,
    _greedy_fill_cost,
    dedup_masses,
)

import jax.numpy as jnp


def greedy_oracle(w1, D, cap, injective):
    """Scalar replica of the reference RelaxedSolver inner loop
    (wmd.h:317-377)."""
    total = 0.0
    for i in range(len(w1)):
        if w1[i] <= 0:
            continue
        if injective:
            best, best_j = np.inf, -1
            for j in range(len(cap)):
                if cap[j] > 0 and D[i, j] < best:
                    best, best_j = D[i, j], j
            total += w1[i] * (best if best_j >= 0 else 1.0)
        else:
            remaining = w1[i]
            order = np.argsort(D[i], kind="stable")
            for j in order:
                if cap[j] <= 0:
                    continue
                take = min(remaining, cap[j])
                total += take * D[i, j]
                remaining -= take
                if remaining <= 1e-12:
                    break
            total += max(remaining, 0.0) * 1.0
    return total


@pytest.mark.parametrize("injective", [True, False])
def test_greedy_fill_vs_oracle(rng, injective):
    B, n1, n2 = 12, 5, 9
    w1 = rng.uniform(0, 2, size=(B, n1)).astype(np.float32)
    w1[rng.uniform(size=(B, n1)) < 0.2] = 0.0
    cap = rng.uniform(0, 2, size=(B, n2)).astype(np.float32)
    cap[rng.uniform(size=(B, n2)) < 0.2] = 0.0
    D = rng.uniform(0, 1, size=(B, n1, n2)).astype(np.float32)
    got = np.asarray(_greedy_fill_cost(jnp.asarray(w1), jnp.asarray(D), jnp.asarray(cap), injective))
    for b in range(B):
        want = greedy_oracle(w1[b], D[b], cap[b], injective)
        assert got[b] == pytest.approx(want, abs=1e-4)


def test_dedup_masses():
    ids = np.array([5, 3, 5, 5, 7, 3])
    m = dedup_masses(ids, np.ones(6, bool))
    np.testing.assert_array_equal(m, [3, 2, 0, 0, 1, 0])


def test_rwmd_scores_dedup_consistency(rng):
    """Duplicated tokens must merge mass exactly like vocab-level dedup."""
    V, T, L, N = 50, 4, 8, 4
    sim_vocab = rng.uniform(0, 1, size=(V, T)).astype(np.float32)
    tok = rng.integers(1, 10, size=(N, L)).astype(np.int32)  # many dups
    lengths = np.full((N,), L, np.int32)
    mass_t = np.ones((T,), np.float32)
    got = np.asarray(
        _bucket_rwmd_scores(
            ("static", 0),
            jnp.asarray(tok),
            jnp.asarray(tok.reshape(1, N * L)),
            jnp.arange(N * L, dtype=jnp.int32).reshape(1, N * L),
            jnp.zeros((N, L), jnp.int8),
            jnp.zeros((N, L), jnp.int16),
            jnp.asarray(lengths),
            (jnp.asarray(sim_vocab),), (jnp.zeros((V,), jnp.float32),),
            (), (), (),
            jnp.asarray(mass_t), jnp.asarray(T, jnp.int32),
            jnp.asarray(float(T), jnp.float32),
            jnp.zeros((T,), jnp.float32), jnp.zeros((T,), jnp.int8),
            jnp.asarray(0.0, jnp.float32), jnp.asarray(0.0, jnp.float32),
            jnp.zeros((1,), bool), jnp.zeros((1,), bool), jnp.zeros((1,), bool),
            injective=False, symmetric=True, normalize_bow=True, chunk=N,
        )
    )
    # scalar oracle with explicit vocab-level dedup
    for b in range(N):
        ids = tok[b]
        m_s = dedup_masses(ids, np.ones(L, bool)) / L
        m_t = mass_t / mass_t.sum()
        D_st = np.maximum(1.0 - sim_vocab[ids], 0.0)  # [L, T]
        acc0 = greedy_oracle(m_t, D_st.T, m_s, False)
        acc1 = greedy_oracle(m_s, D_st, m_t, False)
        want = 1.0 - max(acc0, acc1)
        assert got[b] == pytest.approx(want, abs=1e-4)


def test_exact_emd_simple():
    # two points moving to two points, distinct costs
    w1 = np.array([1.0, 1.0])
    w2 = np.array([1.0, 1.0])
    D = np.array([[0.0, 1.0], [1.0, 0.0]])
    r = exact_emd(w1, w2, D)
    assert r.success
    assert r.cost == pytest.approx(0.0)
    np.testing.assert_allclose(r.flow, np.eye(2), atol=1e-9)


def test_exact_emd_unbalanced_penalty():
    w1 = np.array([2.0])
    w2 = np.array([1.0])
    D = np.array([[0.5]])
    r = exact_emd(w1, w2, D, extra_mass_penalty=0.9)
    assert r.success
    # one unit moves at 0.5; extra unit pays 0.9 via the sink
    assert r.cost == pytest.approx(0.5)  # cost excludes sink in flow matrix
    assert r.flow[0, 0] == pytest.approx(1.0)


def test_sinkhorn_matches_exact_emd_score(rng):
    """Sinkhorn score must closely track exact-EMD score on small problems."""
    B, n1, n2 = 8, 5, 7
    w1 = rng.uniform(0.1, 1, size=(B, n1))
    w2 = rng.uniform(0.1, 1, size=(B, n2))
    w1 = w1 / w1.sum(axis=1, keepdims=True)
    w2 = w2 / w2.sum(axis=1, keepdims=True)
    D = rng.uniform(0, 1, size=(B, n1, n2)).astype(np.float32)
    got = np.asarray(
        sinkhorn_emd_score(jnp.asarray(w1), jnp.asarray(w2), jnp.asarray(D),
                           jnp.asarray(0.01, jnp.float32), n_iters=300)
    )
    for b in range(B):
        want, _ = emd_score(w1[b], w2[b], D[b])
        assert got[b] == pytest.approx(want, abs=0.02), b


def test_sinkhorn_ranking_preserved(rng):
    """Sinkhorn ranking must agree with exact EMD ranking on separated
    problems (top-k ordering is what the device pass decides)."""
    B, n1, n2 = 16, 4, 6
    w1 = np.full((B, n1), 1.0 / n1)
    w2 = np.full((B, n2), 1.0 / n2)
    D = rng.uniform(0, 1, size=(B, n1, n2)).astype(np.float32)
    got = np.asarray(
        sinkhorn_emd_score(jnp.asarray(w1), jnp.asarray(w2), jnp.asarray(D),
                           jnp.asarray(0.02, jnp.float32), n_iters=200)
    )
    want = np.asarray([emd_score(w1[b], w2[b], D[b])[0] for b in range(B)])
    # order of clearly-separated scores must match
    go, wo = np.argsort(-got), np.argsort(-want)
    # compare only where oracle scores differ by > 0.03
    for a, bq in zip(wo[:-1], wo[1:]):
        if want[a] - want[bq] > 0.03:
            assert got[a] > got[bq]


def test_wmd_search_end_to_end():
    """RWMD / full WMD / WRD through the public index API."""
    from tests.helpers import WORDS, make_corpus_texts, make_embedding
    from vectorian_tpu import Session, StringImporter
    from vectorian_tpu.alignment import WordMoversDistance, WordRotatorsDistance
    from vectorian_tpu.sim.span import OptimizedSpanSim
    from vectorian_tpu.sim.token import EmbeddingTokenSim

    rng = np.random.default_rng(3)
    planted = ["the old king rides the grey horse"]
    texts, locations = make_corpus_texts(rng, n_docs=3, sents_per_doc=10, planted=planted)
    imp = StringImporter()
    docs = [imp(t, title=f"d{i}") for i, t in enumerate(texts)]
    words = sorted(set(WORDS) | {"old", "king", "rides", "grey", "horse", "the"})
    emb = make_embedding(words)
    session = Session(docs, embeddings=[emb])
    p = session.partition("sentence")

    for optimizer in [
        WordMoversDistance.rwmd("nbow"),
        WordMoversDistance.rwmd("nbow/distributed"),
        WordMoversDistance.rwmd("bow/fast"),
        WordMoversDistance.wmd("nbow"),
        WordRotatorsDistance(),
    ]:
        index = p.index(OptimizedSpanSim(EmbeddingTokenSim(emb), optimizer))
        # word order scrambled: transport metrics don't care about order
        r = index.find("horse grey the rides king old the", n=5, min_score=0.1)
        assert len(r) >= 1, optimizer
        packed = index.packed
        top = r[0]
        d = int(packed.slice_doc[top.slice_id])
        s = int(packed.slice_idx[top.slice_id])
        assert (d, s) == locations[0], (optimizer, top.score)
        assert top.score > 0.9
        j = top.to_json()
        assert j["regions"], optimizer


def test_tagged_rwmd_scores_vs_oracle(rng):
    """Tag-weighted RWMD kernel: (id, tag) BOW identity + tag-weighted
    similarity (reference TaggedTokenFactory, bow.h:150-202, selected by
    similarity_dependency()==TAGS, metric/alignment.h:558-563)."""
    V, T, L, N, n_pos = 40, 4, 8, 8, 5
    sim_vocab = rng.uniform(0, 1, size=(V, T)).astype(np.float32)
    tok = rng.integers(1, 8, size=(N, L)).astype(np.int32)  # many dup ids
    tags = rng.integers(0, 3, size=(N, L)).astype(np.int16)  # dup (id,tag)
    pos_s = rng.integers(0, n_pos, size=(N, L)).astype(np.int8)
    lengths = np.full((N,), L, np.int32)
    mass_t = np.ones((T,), np.float32)
    tw_w = rng.uniform(0.2, 1.0, size=(T,)).astype(np.float32)
    tw_pos = rng.integers(0, n_pos, size=(T,)).astype(np.int8)
    penalty, threshold = 0.3, 0.15
    got = np.asarray(
        _bucket_rwmd_scores(
            ("static", 0),
            jnp.asarray(tok),
            jnp.asarray(tok.reshape(1, N * L)),
            jnp.arange(N * L, dtype=jnp.int32).reshape(1, N * L),
            jnp.asarray(pos_s),
            jnp.asarray(tags),
            jnp.asarray(lengths),
            (jnp.asarray(sim_vocab),), (jnp.zeros((V,), jnp.float32),),
            (), (), (),
            jnp.asarray(mass_t), jnp.asarray(T, jnp.int32),
            jnp.asarray(float(tw_w.sum()), jnp.float32),
            jnp.asarray(tw_w), jnp.asarray(tw_pos),
            jnp.asarray(penalty, jnp.float32),
            jnp.asarray(threshold, jnp.float32),
            jnp.zeros((1,), bool), jnp.zeros((1,), bool), jnp.zeros((1,), bool),
            injective=False, symmetric=True, normalize_bow=True, chunk=N,
            with_tags=True,
        )
    )
    for b in range(N):
        S = sim_vocab[tok[b]]  # [L, T]
        w = tw_w[None, :] * np.where(
            pos_s[b][:, None] == tw_pos[None, :], 1.0, 1.0 - penalty
        )
        Sw = S * w
        Sw = np.where(Sw > threshold, Sw, 0.0)
        m_s = dedup_masses(
            list(zip(tok[b].tolist(), tags[b].tolist())), np.ones(L, bool)
        ) / L
        m_t = mass_t / mass_t.sum()
        D_st = np.maximum(1.0 - Sw, 0.0)
        acc0 = greedy_oracle(m_t, D_st.T, m_s, False)
        acc1 = greedy_oracle(m_s, D_st, m_t, False)
        want = 1.0 - max(acc0, acc1)
        assert got[b] == pytest.approx(want, abs=1e-4), b


def test_tag_weighted_wmd_end_to_end():
    """Tag weights through the public WMD index path (reference supports
    tag-weighted slices under transport matchers too)."""
    from tests.helpers import WORDS, make_corpus_texts, make_embedding
    from vectorian_tpu import Session, StringImporter
    from vectorian_tpu.alignment import WordMoversDistance, WordRotatorsDistance
    from vectorian_tpu.sim.span import OptimizedSpanSim
    from vectorian_tpu.sim.token import EmbeddingTokenSim

    rng = np.random.default_rng(7)
    planted = ["the old king rides the grey horse"]
    texts, locations = make_corpus_texts(
        rng, n_docs=3, sents_per_doc=8, planted=planted
    )
    docs = [StringImporter()(t, title=f"d{i}") for i, t in enumerate(texts)]
    words = sorted(set(WORDS) | set(planted[0].split()))
    emb = make_embedding(words)
    session = Session(docs, embeddings=[emb])
    p = session.partition("sentence")

    tag_weights = {"NN": 1.0, "VB": 0.9, "JJ": 0.7, "DT": 0.2}
    for optimizer in [
        WordMoversDistance.rwmd("nbow"),
        WordMoversDistance.wmd("nbow"),
        WordRotatorsDistance(),
    ]:
        index = p.index(
            OptimizedSpanSim(
                EmbeddingTokenSim(emb), optimizer, tag_weights=tag_weights,
                pos_mismatch_penalty=0.2, similarity_threshold=0.1,
            )
        )
        r = index.find("horse grey the rides king old the", n=5, min_score=0.05)
        assert len(r) >= 1, optimizer
        packed = index.packed
        top = r[0]
        d = int(packed.slice_doc[top.slice_id])
        s = int(packed.slice_idx[top.slice_id])
        assert (d, s) == locations[0], (optimizer, top.score)
        # down-weighted tags must lower the score below the unweighted run
        plain = p.index(OptimizedSpanSim(EmbeddingTokenSim(emb), optimizer))
        r0 = plain.find("horse grey the rides king old the", n=5, min_score=0.05)
        assert top.score <= r0[0].score + 1e-6, optimizer


def test_contextual_wmd_wrd():
    """WMD/WRD over contextual embeddings (position-unique BOW entries,
    reference UniqueTokensBOWBuilder path)."""
    from tests.test_contextual import ctx_fn, DIM
    from vectorian_tpu import Session, StringImporter
    from vectorian_tpu.alignment import WordMoversDistance, WordRotatorsDistance
    from vectorian_tpu.embedding.contextual import LambdaContextualEmbedding
    from vectorian_tpu.sim.span import OptimizedSpanSim
    from vectorian_tpu.sim.token import EmbeddingTokenSim

    ctx = LambdaContextualEmbedding("wmd-ctx", ctx_fn, DIM)
    docs = [StringImporter()(
        "the old king rides the grey horse. a cat sleeps.", title="d0")]
    session = Session(docs, embeddings=[ctx])
    p = session.partition("sentence")
    for optimizer in [
        WordMoversDistance.rwmd("nbow"),
        WordMoversDistance.wmd("nbow"),
        WordRotatorsDistance(),
    ]:
        index = p.index(OptimizedSpanSim(EmbeddingTokenSim(ctx), optimizer))
        # scrambled word order: transport ignores order; contextual vectors
        # differ slightly so expect high-but-not-perfect scores
        r = index.find("horse grey the rides king old the", n=2, min_score=0.3)
        assert len(r) >= 1, optimizer
        assert r[0].score > 0.7, (optimizer, r[0].score)
        assert r[0].to_json()["regions"], optimizer



def test_rwmd_multi_kernel_vs_oracle(rng):
    """Multi-query RWMD kernel vs the scalar greedy oracle per (slice,
    query) — independent of the single-query device kernel."""
    from vectorian_tpu.ops.wmd import _bucket_rwmd_scores_multi

    V, T, Q, L, N = 40, 4, 3, 8, 8
    sim_multi = rng.uniform(0, 1, size=(V, T, Q)).astype(np.float32)
    tok = rng.integers(1, 12, size=(N, L)).astype(np.int32)
    lengths = rng.integers(2, L + 1, size=N).astype(np.int32)
    # masses are dedup counts of the query tokens, so they sum to len_t
    mass_t = np.zeros((T, Q), np.float32)
    len_t = rng.integers(1, T + 1, size=Q).astype(np.int32)
    for q in range(Q):
        qtok = rng.integers(0, 3, size=len_t[q])
        mass_t[: len_t[q], q] = dedup_masses(qtok, np.ones(len_t[q], bool))
    got = np.asarray(
        _bucket_rwmd_scores_multi(
            jnp.asarray(tok), jnp.asarray(lengths),
            jnp.zeros((N, L), jnp.int8), jnp.zeros((N, L), jnp.int16),
            jnp.asarray(sim_multi),
            jnp.asarray(mass_t), jnp.asarray(len_t),
            jnp.asarray(len_t, jnp.float32),
            jnp.ones((N, Q), jnp.float32),
            jnp.ones((T, Q), jnp.float32), jnp.full((T, Q), -1, jnp.int8),
            jnp.zeros((Q,), jnp.float32), jnp.full((Q,), -1.0, jnp.float32),
            jnp.zeros((1,), bool), jnp.zeros((1,), bool),
            jnp.zeros((1,), bool),
            injective=False, symmetric=True, normalize_bow=True,
            chunk=N, n_queries=Q,
        )
    )
    for b in range(N):
        ln = int(lengths[b])
        ids = tok[b, :ln]
        m_s = dedup_masses(ids, np.ones(ln, bool)) / ln
        for q in range(Q):
            S = sim_multi[ids, :, q]  # [ln, T]
            D_st = np.maximum(1.0 - S, 0.0)
            m_t = mass_t[:, q] / float(len_t[q])
            acc0 = greedy_oracle(m_t, D_st.T, m_s, False)
            acc1 = greedy_oracle(m_s, D_st, m_t, False)
            want = 1.0 - max(acc0, acc1)
            assert got[b, q] == pytest.approx(want, abs=1e-4), (b, q)


def test_tagged_rwmd_bow_mode_max_cost(rng):
    """bow mode (normalize_bow=False) with tag weights: max_cost is the
    tag-weight sum (reference max_sum_of_similarities of TagWeightedSlice,
    wmd.h:411-412 + slice/static.h:285), not len_t."""
    V, T, L, N, n_pos = 30, 4, 6, 6, 4
    sim_vocab = rng.uniform(0, 1, size=(V, T)).astype(np.float32)
    tok = rng.integers(1, 9, size=(N, L)).astype(np.int32)
    tags = rng.integers(0, 3, size=(N, L)).astype(np.int16)
    pos_s = rng.integers(0, n_pos, size=(N, L)).astype(np.int8)
    lengths = np.full((N,), L, np.int32)
    mass_t = np.ones((T,), np.float32)
    tw_w = rng.uniform(0.2, 1.0, size=(T,)).astype(np.float32)
    tw_pos = rng.integers(0, n_pos, size=(T,)).astype(np.int8)
    penalty, threshold = 0.25, 0.1
    got = np.asarray(
        _bucket_rwmd_scores(
            ("static", 0),
            jnp.asarray(tok),
            jnp.asarray(tok.reshape(1, N * L)),
            jnp.arange(N * L, dtype=jnp.int32).reshape(1, N * L),
            jnp.asarray(pos_s),
            jnp.asarray(tags),
            jnp.asarray(lengths),
            (jnp.asarray(sim_vocab),), (jnp.zeros((V,), jnp.float32),),
            (), (), (),
            jnp.asarray(mass_t), jnp.asarray(T, jnp.int32),
            jnp.asarray(float(tw_w.sum()), jnp.float32),
            jnp.asarray(tw_w), jnp.asarray(tw_pos),
            jnp.asarray(penalty, jnp.float32),
            jnp.asarray(threshold, jnp.float32),
            jnp.zeros((1,), bool), jnp.zeros((1,), bool), jnp.zeros((1,), bool),
            injective=False, symmetric=False, normalize_bow=False, chunk=N,
            with_tags=True,
        )
    )
    for b in range(N):
        S = sim_vocab[tok[b]]
        w = tw_w[None, :] * np.where(
            pos_s[b][:, None] == tw_pos[None, :], 1.0, 1.0 - penalty
        )
        Sw = np.where(S * w > threshold, S * w, 0.0)
        m_s = dedup_masses(
            list(zip(tok[b].tolist(), tags[b].tolist())), np.ones(L, bool)
        )
        D_st = np.maximum(1.0 - Sw, 0.0)
        acc0 = greedy_oracle(mass_t, D_st.T, m_s, False) / mass_t.sum()
        max_cost = float(tw_w.sum())  # NOT len_t
        want = (max_cost - acc0) / max_cost
        assert got[b] == pytest.approx(want, abs=1e-4), b


def test_wrd_oov_query_token_keeps_mass():
    """A corpus-OOV query token must keep its encoder magnitude as WRD mass
    (reference interns every query token in the query vocabulary, so none
    is massless — static.cpp fill_magnitudes_t)."""
    from tests.helpers import make_embedding
    from vectorian_tpu import Session, StringImporter
    from vectorian_tpu.alignment import WordRotatorsDistance
    from vectorian_tpu.sim.span import OptimizedSpanSim
    from vectorian_tpu.sim.token import EmbeddingTokenSim

    words = ["old", "king", "rides", "horse", "cat", "sleeps", "the", "oovword"]
    emb = make_embedding(words)
    # corpus does NOT contain "oovword" -> it is absent from the session
    # vocabulary, but the embedding can encode it
    docs = [StringImporter()(
        "the old king rides the horse. the cat sleeps.", title="d"
    )]
    session = Session(docs, embeddings=[emb])
    ix = session.partition("sentence").index(
        OptimizedSpanSim(EmbeddingTokenSim(emb), WordRotatorsDistance())
    )
    q = ix.make_query("old king oovword", n=2, min_score=-5.0).prepare(ix._nlp)
    assert (np.asarray(q.token_ids) < 0).any()  # truly OOV vs corpus vocab
    from vectorian_tpu.ops.wmd import WMDEngine
    from vectorian_tpu.ops.simmatrix import compile_plan

    eng = WMDEngine(ix._engine, ix._args["alignment"])
    qp = compile_plan(
        ix._args["metric"]["token_sim"], session.compiled_embeddings,
        q.token_ids, q.token_strings, {}, needs_magnitudes=True,
    )
    mags = eng._static_needle_magnitudes(qp, q, ix)
    # every real query token carries positive mass, including the OOV one
    assert (mags[: q.n_tokens] > 0).all()
    # and the public path still returns results
    r = ix.find("old king oovword", n=2, min_score=-5.0)
    assert len(r) >= 1


def test_rwmd_flow_normalization_modes():
    """Flow edge weights follow wmd.h:401-402: nbow keeps raw moved mass,
    bow divides by the source's bow mass."""
    from vectorian_tpu.ops.wmd import rwmd_flow_host

    m_t = np.asarray([2.0, 1.0], np.float32)  # bow counts
    m_s = np.asarray([1.0, 3.0], np.float32)
    D = np.asarray([[0.1, 0.2], [0.5, 0.05]], np.float32)
    # bow mode: source 0 moves 1.0 to s0 and 1.0 to s1 -> flows 0.5, 0.5
    edges = rwmd_flow_host(m_t, m_s, D, injective=False, normalize_bow=False)
    by = {(t, s): f for t, s, f, d in edges}
    assert by[(0, 0)] == pytest.approx(0.5)
    assert by[(0, 1)] == pytest.approx(0.5)
    assert by[(1, 1)] == pytest.approx(1.0)
    # nbow mode: masses pre-normalized, flows are the raw moved mass
    m_tn = m_t / m_t.sum()
    m_sn = m_s / m_s.sum()
    edges = rwmd_flow_host(m_tn, m_sn, D, injective=False, normalize_bow=True)
    by = {(t, s): f for t, s, f, d in edges}
    assert by[(0, 0)] == pytest.approx(0.25)  # capped by m_sn[0]
    assert by[(0, 1)] == pytest.approx(m_tn[0] - 0.25)


def test_transport_booster_applied():
    """Boosters multiply transport scores exactly like alignment scores:
    the reference builds Score(r.score, score_max, p_boost) for WMD
    (metric/alignment.h:598) and WRD (:710).  Boosted results must equal
    the plain scores times the per-slice boost, with min_score applied to
    the BOOSTED value."""
    from tests.helpers import WORDS, make_corpus_texts, make_embedding
    from vectorian_tpu import Session, StringImporter
    from vectorian_tpu.alignment import WordMoversDistance, WordRotatorsDistance
    from vectorian_tpu.saliency import KeywordSignal, Saliency
    from vectorian_tpu.sim.span import OptimizedSpanSim
    from vectorian_tpu.sim.token import EmbeddingTokenSim

    rng = np.random.default_rng(11)
    planted = ["the old king rides the grey horse"]
    texts, locations = make_corpus_texts(
        rng, n_docs=3, sents_per_doc=8, planted=planted
    )
    imp = StringImporter()
    docs = [imp(t, title=f"d{i}") for i, t in enumerate(texts)]
    words = sorted(set(WORDS) | {"old", "king", "rides", "grey", "horse", "the"})
    emb = make_embedding(words)
    session = Session(docs, embeddings=[emb])
    p = session.partition("sentence")
    # strength=0.5 -> boost in [0.5, 1.0]: non-trivial multipliers on every
    # slice (strength=1.0 would only zero scores out)
    sal = Saliency(strength=0.5).add_signal(KeywordSignal("horse"), 1.0)
    boost = sal.compile(session, p)
    query = "horse grey the rides king old the"

    for optimizer in [
        WordMoversDistance.rwmd("nbow"),
        WordMoversDistance.wmd("nbow"),
        WordRotatorsDistance(),
    ]:
        index = p.index(OptimizedSpanSim(EmbeddingTokenSim(emb), optimizer))
        plain = index.find(query, n=20, min_score=0.05)
        boosted = index.find(query, n=20, min_score=0.05, booster=sal)
        assert len(boosted) >= 1, optimizer
        plain_by_sid = {m.slice_id: m.score for m in plain}
        for m in boosted:
            assert m.slice_id in plain_by_sid, optimizer
            want = plain_by_sid[m.slice_id] * float(boost[m.slice_id])
            assert m.score == pytest.approx(want, rel=1e-5), optimizer
        # the boosted list is sorted by the boosted score
        scores = [m.score for m in boosted]
        assert scores == sorted(scores, reverse=True)
        # min_score applies to the boosted value (strict >)
        assert all(m.score > 0.05 for m in boosted)


def test_transport_doc_token_filter():
    """Doc-side token filters apply to transport metrics exactly like the
    reference's FilteredSlice (slice/static.h:104-184 wraps EVERY matcher,
    WMD/WRD included): searching corpus A with token_filter=['foo'] must
    score every slice identically to searching corpus B where 'foo' was
    never in the text — and no flow edge may point at a filtered token."""
    from tests.helpers import WORDS, make_embedding
    from vectorian_tpu import Session, StringImporter
    from vectorian_tpu.alignment import WordMoversDistance, WordRotatorsDistance
    from vectorian_tpu.sim.span import OptimizedSpanSim
    from vectorian_tpu.sim.token import EmbeddingTokenSim

    rng = np.random.default_rng(7)
    base_sents = []
    for _ in range(12):
        k = rng.integers(4, 8)
        base_sents.append([WORDS[i] for i in rng.integers(0, len(WORDS), k)])
    filler = "filler"
    sents_a, sents_b = [], []
    for s in base_sents:
        s_a = list(s)
        # inject the filler at a random interior position in corpus A
        s_a.insert(int(rng.integers(0, len(s))), filler)
        sents_a.append(" ".join(s_a))
        sents_b.append(" ".join(s))
    text_a = ". ".join(sents_a) + "."
    text_b = ". ".join(sents_b) + "."

    words = sorted(set(WORDS) | {filler})
    emb = make_embedding(words)
    imp = StringImporter()
    sess_a = Session([imp(text_a, title="a")], embeddings=[emb])
    sess_b = Session([imp(text_b, title="b")], embeddings=[emb])
    query = "old king rides the grey horse"

    for optimizer in [
        WordMoversDistance.rwmd("nbow"),
        WordMoversDistance.rwmd("bow/fast"),
        WordMoversDistance.wmd("nbow"),
        WordRotatorsDistance(),
    ]:
        ix_a = sess_a.partition("sentence").index(
            OptimizedSpanSim(EmbeddingTokenSim(emb), optimizer)
        )
        ix_b = sess_b.partition("sentence").index(
            OptimizedSpanSim(EmbeddingTokenSim(emb), optimizer)
        )
        r_a = ix_a.find(query, n=20, min_score=-1e30, token_filter=[filler])
        r_b = ix_b.find(query, n=20, min_score=-1e30)
        got = {
            int(ix_a.packed.slice_idx[m.slice_id]): m.score for m in r_a
        }
        want = {
            int(ix_b.packed.slice_idx[m.slice_id]): m.score for m in r_b
        }
        assert set(got) == set(want), optimizer
        for s, sc in want.items():
            assert got[s] == pytest.approx(sc, abs=2e-5), (optimizer, s)
        # flow edges never touch the filtered token
        filler_id = sess_a.vocab.tokens.get(filler)
        packed_a = ix_a.packed
        for m in r_a:
            s0 = int(packed_a.slice_start[m.slice_id])
            d = int(packed_a.slice_doc[m.slice_id])
            ids = sess_a.documents[d].token_ids
            for (t, s, f, dist) in (m._edge_list or []):
                assert ids[s0 + s] != filler_id, optimizer


def test_rwmd_batch_same_width_group_byte_parity():
    """Regression: two queries sharing a plan width used to be served in
    one width group whose Q=2 kernel's f32 reduction tree drifted ~1 ulp
    from the single-query program — find() and find_batch() reported
    different scores for the same (query, slice).  Reported scores now
    come from rwmd_score_host (shape-independent), so parity is exact."""
    import numpy as np

    from vectorian_tpu import Session, StringImporter
    from vectorian_tpu.alignment import WordMoversDistance
    from vectorian_tpu.embedding.static import KeyedVectors
    from vectorian_tpu.sim.span import OptimizedSpanSim
    from vectorian_tpu.sim.token import EmbeddingTokenSim as ETS

    rng = np.random.default_rng(0)
    words = ["sun", "moon", "shines", "over", "the", "sea", "stars",
             "night", "bright", "dark", "sky", "waves"]
    emb = KeyedVectors(
        "toy", words, rng.normal(size=(len(words), 16)).astype("float32")
    )
    docs = [
        StringImporter()(
            "The sun shines over the sea. Stars at night. The moon over "
            "dark waves. Bright sky over the sea.",
            title="d0",
        ),
        StringImporter()(
            "The stars shine over the dark sea at night.", title="d1"
        ),
    ]
    session = Session(docs, embeddings=[emb])
    ix = session.partition("sentence").index(
        OptimizedSpanSim(ETS(emb), WordMoversDistance.rwmd("nbow"))
    )
    # both pad to plan width 4 — the failing width group
    queries = ["stars at night", "moon over dark waves"]
    batch = ix.find_batch(queries, n=4, min_score=0.05)
    for q, br in zip(queries, batch):
        want = [(m.slice_id, m.score) for m in ix.find(q, n=4, min_score=0.05)]
        got = [(m.slice_id, m.score) for m in br]
        assert got == want, q
