"""On-TPU cross-path serving parity.

The byte-equality canaries (find() == find_batch() == sim_precision
variants, tests/test_cross_path_parity.py) run on the CPU backend; the
guarantee must ALSO hold on the real TPU, where XLA tiles and fuses
differently.  These trials run the fused serving pipeline end-to-end on
the actual device: static affine, tag-weighted, general-gap and relaxed
WMD configs over a tie-heavy Zipf corpus.
"""

import numpy as np
import pytest

import jax

pytestmark = pytest.mark.skipif(
    jax.devices()[0].platform not in ("tpu", "axon")
    and "TPU" not in str(jax.devices()[0]).upper(),
    reason="needs a real TPU device",
)


@pytest.fixture(scope="module")
def setup():
    import vectorian_tpu as vt
    from vectorian_tpu.embedding.static import KeyedVectors

    rng = np.random.default_rng(31)
    words = ["alpha", "beta", "gamma", "delta", "epsi",
             "zeta", "eta", "theta", "iota", "kappa"]
    emb = KeyedVectors(
        "toy", words, rng.normal(size=(len(words), 24)).astype("float32")
    )
    sents = []
    for _ in range(200):
        ids = np.minimum(rng.zipf(1.3, size=6), len(words)) - 1
        sents.append(" ".join(words[i] for i in ids) + ".")
    sents = sents + sents[:100]  # duplicates -> boundary ties
    docs = [
        vt.StringImporter()(" ".join(sents[i::4]), title=f"d{i}")
        for i in range(4)
    ]
    session = vt.Session(docs, embeddings=[emb])
    qs = [
        " ".join(
            words[int(i) - 1]
            for i in np.minimum(rng.zipf(1.3, size=k), len(words))
        )
        for k in (3, 6, 2, 4)
    ]
    return session, emb, qs


def _spans(session, emb, optimizer=None, **kw):
    from vectorian_tpu.sim.span import OptimizedSpanSim
    from vectorian_tpu.sim.token import EmbeddingTokenSim

    ts = EmbeddingTokenSim(emb)
    spec = (
        OptimizedSpanSim(ts, optimizer, **kw)
        if optimizer is not None
        else OptimizedSpanSim(ts, **kw)
    )
    return session.partition("sentence").index(spec)


def _assert_paths_equal(ix, qs, n=5, msc=0.05):
    want = [
        [(m.slice_id, m.score) for m in r]
        for r in ix.find_batch(qs, n=n, min_score=msc,
                               sim_precision="float32")
    ]
    for prec in ("int8", "bfloat16"):
        got = [
            [(m.slice_id, m.score) for m in r]
            for r in ix.find_batch(qs, n=n, min_score=msc,
                                   sim_precision=prec)
        ]
        assert got == want, prec
    single = [
        [(m.slice_id, m.score) for m in ix.find(q, n=n, min_score=msc)]
        for q in qs
    ]
    assert single == want


def test_static_affine_parity(setup):
    from vectorian_tpu.alignment import AffineGapCost, LocalAlignment

    session, emb, qs = setup
    ix = _spans(session, emb, LocalAlignment(AffineGapCost(0.3, 0.1)))
    _assert_paths_equal(ix, qs)


def test_tag_weighted_parity(setup):
    from vectorian_tpu.alignment import AffineGapCost, SemiGlobalAlignment

    session, emb, qs = setup
    ix = _spans(
        session, emb, SemiGlobalAlignment(AffineGapCost(0.2, 0.1)),
        tag_weights={"NN": 0.9, "JJ": 0.5},
        pos_mismatch_penalty=0.2, similarity_threshold=0.1,
    )
    want = [
        [(m.slice_id, m.score) for m in r]
        for r in ix.find_batch(qs, n=5, min_score=0.05)
    ]
    single = [
        [(m.slice_id, m.score) for m in ix.find(q, n=5, min_score=0.05)]
        for q in qs
    ]
    assert single == want


def test_general_gap_parity(setup):
    from vectorian_tpu.alignment import ExponentialGapCost, LocalAlignment

    session, emb, qs = setup
    ix = _spans(session, emb, LocalAlignment(ExponentialGapCost(3.0)))
    _assert_paths_equal(ix, qs)


def test_relaxed_wmd_parity(setup):
    from vectorian_tpu.alignment import WordMoversDistance

    session, emb, qs = setup
    ix = _spans(session, emb, WordMoversDistance.rwmd("nbow"))
    got = [
        [(m.slice_id, m.score) for m in r]
        for r in ix.find_batch(qs, n=5, min_score=0.05)
    ]
    single = [
        [(m.slice_id, m.score) for m in ix.find(q, n=5, min_score=0.05)]
        for q in qs
    ]
    assert single == got


def test_full_emd_provable_cut_parity(setup):
    """Full WMD + WRD on the real chip: the device bound kernel
    (_emd_score_bound) drives the provable-cut exact rescore — find()
    and find_batch() must agree byte-for-byte, and the top-k must equal
    the exhaustive exact-EMD oracle (every slice solved host-side)."""
    from vectorian_tpu.alignment import WordMoversDistance, WordRotatorsDistance

    session, emb, qs = setup
    for mk in (WordMoversDistance.wmd("nbow"), WordRotatorsDistance()):
        ix = _spans(session, emb, mk)
        n_slices = int(ix.packed.n_slices)
        got = [
            [(m.slice_id, m.score) for m in r]
            for r in ix.find_batch(qs[:2], n=5, min_score=0.05)
        ]
        single = [
            [(m.slice_id, m.score) for m in ix.find(q, n=5, min_score=0.05)]
            for q in qs[:2]
        ]
        assert single == got
        # exhaustive oracle for the first query (reference wmd.h:194-270)
        full = ix.find(qs[0], n=n_slices + 8, min_score=-1.0)
        want = [(m.slice_id, m.score) for m in full if m.score > 0.05][:5]
        assert got[0] == want


def test_paged_engine_parity_on_tpu(setup):
    """Host-side bucket paging (paged engine) on the REAL device: results
    byte-equal to resident mode, device arrays evicted after the pass —
    the >HBM-envelope serving mode proven on hardware, not just the CPU
    suite (tests/test_paged.py)."""
    from vectorian_tpu.ops.search import BruteForceEngine, _PagedBucket
    from vectorian_tpu.sim.token import EmbeddingTokenSim

    session, emb, qs = setup
    p = session.partition("sentence")
    ix_r = p.index(EmbeddingTokenSim(emb))
    want = [
        [(m.slice_id, m.score) for m in r]
        for r in ix_r.find_batch(qs, n=5, min_score=0.05)
    ]
    eng_p = BruteForceEngine(session.packed_corpus(p.spec), paged=True)
    session._engine_cache[p.spec] = eng_p
    try:
        ix_p = p.index(EmbeddingTokenSim(emb))
        got = [
            [(m.slice_id, m.score) for m in r]
            for r in ix_p.find_batch(qs, n=5, min_score=0.05)
        ]
        assert got == want
        single = [
            [(m.slice_id, m.score) for m in ix_p.find(q, n=5, min_score=0.05)]
            for q in qs
        ]
        assert single == want
        for db in eng_p._device_buckets:
            assert isinstance(db, _PagedBucket)
            for key in _PagedBucket._DEVICE_KEYS:
                assert key not in dict.keys(db), f"{key} still resident"
    finally:
        session._engine_cache.pop(p.spec, None)


def test_ctx_batch_options_parity_on_tpu(setup):
    """Contextual batch with submatch/bidirectional/filters on the real
    device (the round-3 uniform-options serving matrix)."""
    from vectorian_tpu.embedding.contextual import LambdaContextualEmbedding
    from vectorian_tpu.sim.token import EmbeddingTokenSim

    session, emb, qs = setup

    def ctx_fn(tokens, text):
        import hashlib

        out = []
        for a, b in tokens:
            w = text[a:b]
            h = int.from_bytes(
                hashlib.sha256(w.encode()).digest()[:8], "little"
            )
            rng = np.random.default_rng(h)
            v = rng.normal(size=(16,)).astype(np.float32)
            out.append(v / np.linalg.norm(v))
        return (
            np.stack(out)
            if out
            else np.zeros((0, 16), np.float32)
        )

    ctx = LambdaContextualEmbedding("tpu-ctx", ctx_fn, 16)
    # rebuild a session including the ctx embedding
    import vectorian_tpu as vt

    docs = [pd.doc for pd in session.documents]
    s2 = vt.Session(docs, embeddings=[emb, ctx])
    ix = s2.partition("sentence").index(EmbeddingTokenSim(ctx))
    for kwargs in (
        {"submatch_weight": 0.5},
        {"bidirectional": True},
    ):
        want = [
            [
                (m.slice_id, m.score)
                for m in ix.find(q, n=4, min_score=-1.0, **kwargs)
            ]
            for q in qs[:2]
        ]
        got = [
            [(m.slice_id, m.score) for m in r]
            for r in ix.find_batch(qs[:2], n=4, min_score=-1.0, **kwargs)
        ]
        assert got == want, kwargs
