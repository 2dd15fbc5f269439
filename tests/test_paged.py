"""Host-side bucket paging (BruteForceEngine(paged=True)): serving for
corpora past the one-chip HBM envelope streams each length bucket through
the device (page in -> dispatch -> host-read barrier -> evict) and must be
BYTE-IDENTICAL to resident mode on every serving path
(docs/performance.md's >4M-slice option; reference has no analogue — the
CPU matcher never faces HBM)."""

import numpy as np
import pytest

from vectorian_tpu import Session, StringImporter
from vectorian_tpu.alignment import GlobalAlignment, LocalAlignment
from vectorian_tpu.metrics import OptimizedSpanSim
from vectorian_tpu.ops.search import BruteForceEngine, _PagedBucket
from vectorian_tpu.saliency import KeywordSignal, Saliency
from vectorian_tpu.sim.token import EmbeddingTokenSim

from .helpers import WORDS, make_corpus_texts, make_embedding

QS = [
    "the old king rides the grey horse",
    "a bird sings in the night",
    "water under the stone road",
    "the cat sleeps",
]


@pytest.fixture(scope="module")
def paged_pair():
    """(session, partition, resident_index, paged_index) over the same
    packed corpus — only engine residency differs."""
    rng = np.random.default_rng(7)
    planted = ["the old king rides the grey horse"]
    texts, _ = make_corpus_texts(
        rng, n_docs=6, sents_per_doc=20, planted=planted
    )
    # duplicate a doc: tie-heavy scores exercise the tie-extras/column
    # fallback paths, which re-page buckets in paged mode
    texts.append(texts[0])
    imp = StringImporter()
    docs = [imp(t, title=f"d{i}") for i, t in enumerate(texts)]
    words = sorted(
        set(WORDS)
        | {"old", "king", "rides", "grey", "horse", "sings", "in", "the"}
    )
    emb = make_embedding(words)
    session = Session(docs, embeddings=[emb])
    p = session.partition("sentence")
    ix_resident = p.index(EmbeddingTokenSim(emb))
    # swap a paged engine into the session cache, then bind a new index
    paged_engine = BruteForceEngine(session.packed_corpus(p.spec), paged=True)
    session._engine_cache[p.spec] = paged_engine
    ix_paged = p.index(EmbeddingTokenSim(emb))
    assert ix_paged._engine is paged_engine
    return session, p, ix_resident, ix_paged, emb


def _res(matches):
    return [(m.slice_id, m.score) for m in matches]


def _assert_evicted(engine):
    """After a pass, no paged bucket may hold resident device arrays."""
    for db in engine._device_buckets:
        assert isinstance(db, _PagedBucket)
        for key in _PagedBucket._DEVICE_KEYS:
            assert key not in dict.keys(db), f"{key} still resident"


def test_paged_find_matches_resident(paged_pair):
    session, p, ix_r, ix_p, emb = paged_pair
    for q in QS:
        want = _res(ix_r.find(q, n=5, min_score=0.05))
        got = _res(ix_p.find(q, n=5, min_score=0.05))
        assert got == want
    _assert_evicted(ix_p._engine)


def test_paged_find_batch_matches_resident(paged_pair):
    session, p, ix_r, ix_p, emb = paged_pair
    for prec in ("float32", "int8", "bfloat16"):
        want = [
            _res(r)
            for r in ix_r.find_batch(
                QS, n=5, min_score=0.05, sim_precision=prec
            )
        ]
        got = [
            _res(r)
            for r in ix_p.find_batch(
                QS, n=5, min_score=0.05, sim_precision=prec
            )
        ]
        assert got == want, prec
    _assert_evicted(ix_p._engine)


def test_paged_options_match_resident(paged_pair):
    """Boosters, global alignment and submatch_weight ride the paged
    engine's score_all/score_topk paths identically."""
    session, p, ix_r, ix_p, emb = paged_pair
    sal = Saliency(strength=0.9).add_signal(KeywordSignal("horse"), 1.0)
    for kwargs in (
        {"booster": sal},
        {"submatch_weight": 0.5},
    ):
        for q in QS[:2]:
            want = _res(ix_r.find(q, n=4, min_score=0.01, **kwargs))
            got = _res(ix_p.find(q, n=4, min_score=0.01, **kwargs))
            assert got == want, kwargs
    ix_rg = p.index(
        OptimizedSpanSim(EmbeddingTokenSim(emb), GlobalAlignment())
    )
    eng = ix_p._engine
    ix_pg = p.index(
        OptimizedSpanSim(EmbeddingTokenSim(emb), GlobalAlignment())
    )
    assert ix_pg._engine is eng  # still the paged engine from the cache
    want = [_res(r) for r in ix_rg.find_batch(QS, n=4, min_score=-1.0)]
    # resident oracle for the global-alignment metric: fresh engine
    res_eng = BruteForceEngine(session.packed_corpus(p.spec), paged=False)
    session._engine_cache[p.spec] = res_eng
    ix_oracle = p.index(
        OptimizedSpanSim(EmbeddingTokenSim(emb), GlobalAlignment())
    )
    session._engine_cache[p.spec] = eng  # restore paged for other tests
    got_oracle = [
        _res(r) for r in ix_oracle.find_batch(QS, n=4, min_score=-1.0)
    ]
    got_paged = [_res(r) for r in ix_pg.find_batch(QS, n=4, min_score=-1.0)]
    assert want == got_oracle == got_paged
    _assert_evicted(eng)


def test_paged_bucket_lazy_upload_and_evict():
    """_PagedBucket pages a device key in on first touch and drops it on
    evict; host copies are untouched."""
    import jax.numpy as jnp

    tok = np.arange(12, dtype=np.int32).reshape(4, 3)
    db = _PagedBucket(
        {"tokens_np": tok, "n": 4, "n_pad": 4, "capacity": 3, "chunk": 4}
    )
    assert "tokens" not in dict.keys(db)
    dev = db["tokens"]
    assert isinstance(dev, jnp.ndarray)
    assert "tokens" in dict.keys(db)
    np.testing.assert_array_equal(np.asarray(dev), tok)
    db.evict()
    assert "tokens" not in dict.keys(db)
    np.testing.assert_array_equal(db["tokens_np"], tok)
    with pytest.raises(KeyError):
        db["not_a_key"]


def test_paged_contextual_matches_resident():
    """Contextual and mixed-tree serving over a paged engine: host-side
    bf16 stores (ml_dtypes) upload per pass and match resident mode
    bit-for-bit (ml_dtypes rounds to-nearest-even like XLA's convert)."""
    from vectorian_tpu.embedding.contextual import LambdaContextualEmbedding
    from vectorian_tpu.sim.modifier import MixedTokenSimilarity

    from .test_contextual import DIM, ctx_fn

    ctx = LambdaContextualEmbedding("test-ctx", ctx_fn, DIM)
    words = ["the", "old", "king", "rides", "grey", "horse", "cat",
             "sleeps", "dog", "runs", "fast", "a", "bird", "sings", "loud"]
    static = make_embedding(words, dim=16, name="static-emb")
    imp = StringImporter()
    docs = [
        imp("the old king rides the grey horse. a cat sleeps.", title="d0"),
        imp("the dog runs fast. a bird sings loud.", title="d1"),
    ]
    session = Session(docs, embeddings=[static, ctx])
    p = session.partition("sentence")
    qs = ["the old king rides", "a bird sings loud"]
    for token_sim in (
        EmbeddingTokenSim(ctx),
        MixedTokenSimilarity(
            [EmbeddingTokenSim(static), EmbeddingTokenSim(ctx)], [0.5, 0.5]
        ),
    ):
        ix_r = p.index(token_sim)
        want = [_res(r) for r in ix_r.find_batch(qs, n=4, min_score=-1.0)]
        eng_p = BruteForceEngine(session.packed_corpus(p.spec), paged=True)
        session._engine_cache[p.spec] = eng_p
        ix_p = p.index(token_sim)
        got = [_res(r) for r in ix_p.find_batch(qs, n=4, min_score=-1.0)]
        # fresh resident engine cache for the next loop iteration
        session._engine_cache.pop(p.spec)
        assert got == want
        for store in eng_p._ctx_stores.values():
            assert all(isinstance(a, np.ndarray) for a in store)
        _assert_evicted(eng_p)


def test_session_paged_kwarg():
    """Session(paged=True) builds paged engines for every partition."""
    imp = StringImporter()
    docs = [imp("the cat sleeps. a dog runs.", title="d0")]
    emb = make_embedding(["the", "cat", "sleeps", "a", "dog", "runs"])
    session = Session(docs, embeddings=[emb], paged=True)
    p = session.partition("sentence")
    ix = p.index(EmbeddingTokenSim(emb))
    assert all(
        isinstance(db, _PagedBucket) for db in ix._engine._device_buckets
    )
    r = ix.find("the cat sleeps", n=2, min_score=0.1)
    assert len(r) >= 1
    _assert_evicted(ix._engine)
