"""End-to-end search tests: engine vs an independent numpy oracle."""

import numpy as np
import pytest

from vectorian_tpu import Session, StringImporter
from vectorian_tpu.alignment import (
    ConstantGapCost,
    GlobalAlignment,
    LinearGapCost,
    LocalAlignment,
    SemiGlobalAlignment,
)
from vectorian_tpu.sim.span import OptimizedSpanSim
from vectorian_tpu.sim.token import EmbeddingTokenSim

from .helpers import WORDS, make_corpus_texts, make_embedding, word_vector
from .oracle import gotoh_align


@pytest.fixture(scope="module")
def corpus_session():
    rng = np.random.default_rng(42)
    planted = [
        "the old king rides the grey horse",
        "an old queen rides a horse",
        "the young knight walks the long road",
    ]
    texts, locations = make_corpus_texts(rng, n_docs=5, sents_per_doc=14, planted=planted)
    importer = StringImporter()
    docs = [importer(t, title=f"doc{i}") for i, t in enumerate(texts)]
    all_words = sorted(set(WORDS) | {"old", "king", "queen", "rides", "grey",
                                     "horse", "young", "knight", "walks",
                                     "long", "road", "the", "a", "an"})
    emb = make_embedding(all_words)
    session = Session(docs, embeddings=[emb])
    return session, emb, locations


def oracle_scores(session, emb, partition_spec, query_words, locality, gaps_affine):
    """Independent slice scoring: rebuild S per slice from raw word vectors
    and run the scalar Gotoh oracle."""
    packed = session.packed_corpus(partition_spec)
    vocab_strings = session.vocab.tokens.strings
    vocab_vecs = np.stack([word_vector(w) if w != "<pad>" else np.zeros(32, np.float32)
                           for w in vocab_strings])
    # unknown vocab words (not in embedding) -> zero
    known = set(emb._words)
    for i, w in enumerate(vocab_strings):
        if w not in known:
            vocab_vecs[i] = 0.0

    def normed(v):
        n = np.linalg.norm(v)
        return v / n if n > 1e-9 else v

    q_vecs = np.stack([
        word_vector(w) if w in known else np.zeros(32, np.float32)
        for w in query_words
    ])
    sim_vocab = np.zeros((len(vocab_strings), len(query_words)), np.float32)
    for i in range(len(vocab_strings)):
        for j in range(len(query_words)):
            sim_vocab[i, j] = float(np.dot(normed(vocab_vecs[i]), normed(q_vecs[j])))
    # exact-match override + clip + zero pad row
    w_to_id = {w: i for i, w in enumerate(vocab_strings)}
    for j, w in enumerate(query_words):
        i = w_to_id.get(w, -1)
        if i >= 0:
            sim_vocab[i, j] = 1.0
    sim_vocab = np.clip(sim_vocab, 0.0, 1.0)
    sim_vocab[0, :] = 0.0

    os_, es, ot, et = gaps_affine
    scores = np.zeros((packed.n_slices,), np.float32)
    for sid in range(packed.n_slices):
        d = int(packed.slice_doc[sid])
        s0 = int(packed.slice_start[sid])
        ln = int(packed.slice_len[sid])
        if ln == 0:
            continue
        ids = session.documents[d].token_ids[s0 : s0 + ln]
        S = sim_vocab[ids]
        raw, _, _, _ = gotoh_align(S, os_, es, ot, et, locality)
        scores[sid] = raw / len(query_words)
    return scores


@pytest.mark.parametrize(
    "optimizer,locality,gaps",
    [
        (LocalAlignment(), "local", (0.0, 0.0, 0.0, 0.0)),
        (LocalAlignment(LinearGapCost(0.3)), "local", (0.3, 0.3, 0.3, 0.3)),
        (GlobalAlignment(ConstantGapCost(0.5)), "global", (0.5, 0.0, 0.5, 0.0)),
        (SemiGlobalAlignment(LinearGapCost(0.2)), "semiglobal", (0.2, 0.2, 0.2, 0.2)),
    ],
)
def test_recall_parity_vs_oracle(corpus_session, optimizer, locality, gaps):
    """recall@10 parity with the oracle engine (SURVEY.md §4c)."""
    session, emb, locations = corpus_session
    index = session.partition("sentence").index(
        OptimizedSpanSim(EmbeddingTokenSim(emb), optimizer)
    )
    query = "old king rides horse"
    result = index.find(query, n=10, min_score=-10.0)
    got_ids = [m.slice_id for m in result.matches]
    got_scores = {m.slice_id: m.score for m in result.matches}

    q_norm = ["old", "king", "rides", "horse"]
    oracle = oracle_scores(session, emb, index.partition.spec, q_norm, locality, gaps)
    want_order = np.argsort(-oracle.astype(np.float64), kind="stable")[:10]

    # scores agree everywhere we matched
    for sid in got_ids:
        assert got_scores[sid] == pytest.approx(float(oracle[sid]), abs=2e-4)
    # recall@10: same set (scores may tie)
    want_set = set(int(x) for x in want_order)
    assert len(set(got_ids) & want_set) >= 9  # allow 1 boundary tie


def test_planted_sentences_rank_top(corpus_session):
    session, emb, locations = corpus_session
    index = session.partition("sentence").index(EmbeddingTokenSim(emb))
    result = index.find("the old king rides the grey horse", n=5)
    assert len(result) >= 2
    top = result[0]
    packed = index.packed
    d = int(packed.slice_doc[top.slice_id])
    s = int(packed.slice_idx[top.slice_id])
    assert (d, s) == locations[0]
    assert top.score == pytest.approx(1.0, abs=1e-4)
    # second planted sentence (partial match) should also rank high
    found = {(int(packed.slice_doc[m.slice_id]), int(packed.slice_idx[m.slice_id]))
             for m in result}
    assert locations[1] in found


def test_match_json_shape(corpus_session):
    session, emb, locations = corpus_session
    index = session.partition("sentence").index(EmbeddingTokenSim(emb))
    result = index.find("old king rides horse", n=3)
    assert len(result) >= 1
    j = result[0].to_json(context_size=10)
    assert set(j.keys()) == {"slice", "location", "score", "metric", "regions",
                             "omitted", "level"}
    assert j["level"] == "word"
    assert isinstance(j["regions"], list) and j["regions"]
    matched = [r for r in j["regions"] if "edges" in r]
    assert matched, "expected at least one matched region"
    e = matched[0]["edges"][0]
    assert set(e.keys()) == {"t", "flow", "distance", "metric"}
    assert set(e["t"].keys()) == {"text", "index", "pos"}
    assert 0.0 <= e["distance"] <= 1.0


def test_min_score_and_n(corpus_session):
    session, emb, locations = corpus_session
    index = session.partition("sentence").index(EmbeddingTokenSim(emb))
    r = index.find("old king rides horse", n=3, min_score=0.5)
    assert len(r) <= 3
    for m in r:
        assert m.score >= 0.5


def test_interactive_requery_no_repack(corpus_session):
    """Changing gap costs / locality must reuse the packed corpus."""
    session, emb, locations = corpus_session
    p = session.partition("sentence")
    i1 = p.index(OptimizedSpanSim(EmbeddingTokenSim(emb), LocalAlignment()))
    packed1 = i1.packed
    i2 = p.index(
        OptimizedSpanSim(
            EmbeddingTokenSim(emb), GlobalAlignment(LinearGapCost(0.5))
        )
    )
    assert i2.packed is packed1
    r = i2.find("old king rides horse", n=5, min_score=-10)
    assert len(r) >= 1


def test_window_partition(corpus_session):
    """Sliding sentence windows (window_size=2, step=1)."""
    session, emb, locations = corpus_session
    index = session.partition("sentence", 2, 1).index(EmbeddingTokenSim(emb))
    r = index.find("old king rides horse", n=5)
    assert len(r) >= 1
    packed = index.packed
    # window slices must be longer than single sentences on average
    single = session.packed_corpus(session.partition("sentence").spec)
    assert packed.slice_len.mean() > single.slice_len.mean()


@pytest.mark.slow
def test_fuzz_random_configs_vs_oracle(corpus_session):
    """Randomized end-to-end parity sweep: random affine gaps, localities,
    tag weighting and doc-side token filters, every trial checked against
    the independent scalar oracle."""
    session, emb, locations = corpus_session
    rng = np.random.default_rng(1234)
    known = sorted(set(emb._words))
    localities = {
        "local": LocalAlignment,
        "global": GlobalAlignment,
        "semiglobal": SemiGlobalAlignment,
    }
    from vectorian_tpu.alignment import AffineGapCost

    p = session.partition("sentence")
    vocab_strings = session.vocab.tokens.strings
    w_to_id = {w: i for i, w in enumerate(vocab_strings)}

    for trial in range(8):
        qwords = [str(w) for w in rng.choice(known, size=rng.integers(1, 11))]
        loc = str(rng.choice(list(localities)))
        o, e = float(rng.uniform(0, 0.6)), float(rng.uniform(0, 0.4))
        use_tags = trial % 2 == 1
        use_filter = trial % 3 == 0
        kwargs = {}
        if use_tags:
            kwargs = {
                "tag_weights": {"NN": 0.8, "VB": 1.2, "DT": 0.3, "JJ": 0.6},
                "pos_mismatch_penalty": 0.25,
                "similarity_threshold": 0.15,
            }
        opt = localities[loc](AffineGapCost(o, e))
        index = p.index(OptimizedSpanSim(EmbeddingTokenSim(emb), opt, **kwargs))
        find_kwargs = {}
        filter_words = []
        if use_filter:
            filter_words = ["the", "a"]
            find_kwargs["token_filter"] = filter_words
        result = index.find(
            " ".join(qwords), n=10, min_score=-100.0, **find_kwargs
        )
        pq = index.make_query(" ".join(qwords)).prepare(index._nlp)

        # --- independent oracle ---
        def normed(v):
            n = np.linalg.norm(v)
            return v / n if n > 1e-9 else v

        sim_vocab = np.zeros((len(vocab_strings), len(qwords)), np.float32)
        qv = [normed(word_vector(w)) for w in qwords]
        for i, w in enumerate(vocab_strings):
            vi = normed(word_vector(w)) if w in emb._words and w != "<pad>" else None
            for j in range(len(qwords)):
                sim_vocab[i, j] = float(np.dot(vi, qv[j])) if vi is not None else 0.0
        for j, w in enumerate(qwords):
            i = w_to_id.get(w, -1)
            if i >= 0:
                sim_vocab[i, j] = 1.0
        sim_vocab = np.clip(sim_vocab, 0.0, 1.0)
        sim_vocab[0, :] = 0.0

        if use_tags:
            tw = kwargs["tag_weights"]
            weights = np.asarray(
                [tw.get(t, 1.0) for t in pq.token_tag], np.float32
            )
            norm_total = float(weights.sum())
        else:
            norm_total = float(len(qwords))
        excluded = {w_to_id.get(w, -2) for w in filter_words}

        packed = index.packed
        got = {m.slice_id: m.score for m in result.matches}
        for sid, score in got.items():
            d = int(packed.slice_doc[sid])
            s0 = int(packed.slice_start[sid])
            ln = int(packed.slice_len[sid])
            pd = session.documents[d]
            ids = pd.token_ids[s0 : s0 + ln]
            pos = pd.pos_ids[s0 : s0 + ln]
            keep = np.asarray([t not in excluded for t in ids], bool)
            ids, pos = ids[keep], pos[keep]
            if len(ids) == 0:
                continue
            S = sim_vocab[ids].copy()
            if use_tags:
                mism = pos[:, None] != pq.pos_ids[None, :]
                Sw = S * weights[None, :] * np.where(mism, 0.75, 1.0)
                S = np.where(Sw > 0.15, Sw, 0.0)
            raw, _, _, _ = gotoh_align(S, o, e, o, e, loc)
            assert score == pytest.approx(raw / norm_total, abs=3e-4), (
                trial, loc, o, e, use_tags, use_filter, sid
            )


def test_warmup_precompiles_buckets(corpus_session):
    """index.warmup() runs dummy queries over each needle-length bucket and
    returns self; real queries afterwards work unchanged."""
    session, emb, locations = corpus_session
    index = session.partition("sentence").index(EmbeddingTokenSim(emb))
    assert index.warmup(max_tokens=8) is index
    r = index.find("old king rides horse", n=3)
    assert len(r) >= 1


def test_ctx_multiquery_kernel_vs_oracle(rng):
    """Contextual multi-query bucket kernel vs a scalar cosine+Gotoh oracle
    per (slice, query)."""
    import jax.numpy as jnp

    from vectorian_tpu.ops.alignment import AffineGapParams
    from vectorian_tpu.ops.search import _bucket_scores_multiquery_ctx
    from vectorian_tpu.sim.vector import CosineSim

    N, L, d, T, Q = 8, 6, 12, 8, 3
    ctx = rng.normal(size=(N, L, d)).astype(np.float32)
    lengths = rng.integers(1, L + 1, size=N).astype(np.int32)
    len_t = rng.integers(1, T + 1, size=Q).astype(np.int32)
    qv = rng.normal(size=(T, Q, d)).astype(np.float32)
    for q in range(Q):
        qv[len_t[q]:, q] = 0.0
    q_flat = qv.reshape(T * Q, d)
    mags = np.linalg.norm(q_flat, axis=-1)
    q_norm = q_flat / np.maximum(mags, 1e-9)[:, None]
    gaps = AffineGapParams.of(0.2, 0.1, 0.2, 0.1)
    got = np.asarray(
        _bucket_scores_multiquery_ctx(
            jnp.asarray(ctx), jnp.asarray(lengths),
            jnp.asarray(q_norm), jnp.asarray(q_flat), jnp.asarray(mags),
            jnp.asarray(len_t), gaps,
            jnp.asarray(len_t, jnp.float32),
            jnp.zeros((L + 1,), jnp.float32),
            jnp.zeros((T + 1,), jnp.float32),
            jnp.zeros((1, 1), jnp.int32),  # token/pos/tag + filter masks
            jnp.zeros((1, 1), jnp.int32),  # (unused: with_filter=False)
            jnp.zeros((1, 1), jnp.int32),
            jnp.zeros((1,), bool),
            jnp.zeros((1,), bool),
            jnp.zeros((1,), bool),
            metric=CosineSim(), locality="local", chunk=N, n_queries=Q,
        )
    )

    def normed(v):
        n = np.linalg.norm(v)
        return v / n if n > 1e-9 else v

    for b in range(N):
        ln = int(lengths[b])
        for q in range(Q):
            lt = int(len_t[q])
            S = np.zeros((ln, lt), np.float32)
            for i in range(ln):
                for j in range(lt):
                    S[i, j] = float(np.dot(normed(ctx[b, i]), normed(qv[j, q])))
            S = np.clip(S, 0.0, 1.0)
            raw, _, _, _ = gotoh_align(S, 0.2, 0.1, 0.2, 0.1, "local")
            want = raw / lt
            assert got[b, q] == pytest.approx(want, abs=2e-4), (b, q)


def test_top_k_tie_break_across_partition_boundary(corpus_session):
    """Score-tied slices at the k-th boundary must resolve by the reference
    (doc asc, slice asc) order — an argpartition candidate pool would keep
    an arbitrary tied subset (review repro)."""
    session, emb, locations = corpus_session
    index = session.partition("sentence").index(EmbeddingTokenSim(emb))
    eng = index._engine
    n = eng.packed.n_slices
    assert n >= 8
    scores = np.full((n,), 0.5, np.float32)
    scores[n - 1] = 0.9
    scores[n - 2] = 0.9
    got = eng.top_k(scores, 3, min_score=0.0)
    # third place: the (doc, slice)-smallest among ALL 0.5-tied slices
    packed = eng.packed
    ties = np.arange(n - 2)
    order = np.lexsort((packed.slice_idx[ties], packed.slice_doc[ties]))
    want_third = int(ties[order][0])
    assert got[2] == want_third
    # the two 0.9s come first, ordered by (doc, slice) as well
    first_two = sorted(
        [n - 1, n - 2],
        key=lambda s: (packed.slice_doc[s], packed.slice_idx[s]),
    )
    assert got[:2] == [int(x) for x in first_two]


def test_score_topk_tie_expansion(corpus_session):
    """Device-side top-k must resolve large tie groups by (doc, slice)
    order even when they cross the per-bucket fetch boundary — buckets are
    LENGTH-sorted, so lax.top_k's index-order tie preference is wrong
    without the expansion loop."""
    from vectorian_tpu.ops.simmatrix import compile_plan
    from vectorian_tpu.ops.alignment import AffineGapParams

    session, emb, locations = corpus_session
    index = session.partition("sentence").index(EmbeddingTokenSim(emb))
    eng = index._engine
    q = index.make_query("king", n=3).prepare(index._nlp)
    qp = compile_plan(
        EmbeddingTokenSim(emb), session.compiled_embeddings,
        q.token_ids, q.token_strings, {},
    )
    gaps = AffineGapParams.of(0.0, 0.0, 0.0, 0.0)
    n_sl = eng.packed.n_slices
    k = max(2, n_sl // 8)
    top, smap = eng.score_topk(
        qp, 1, gaps, "local", 1.0, k=k, min_score=-1e30,
    )
    # reference: host top_k over the full exact score vector
    full = eng.score_all(qp, 1, gaps, "local", 1.0)
    want = eng.top_k(full, k, min_score=-1e30)
    assert top == want
