"""Provable-cut completeness for full-WMD / WRD top-k.

The reference solves exact EMD for EVERY slice
(vectorian/core/cpp/alignment/wmd.h:194-270, transport.h:91-145), so its
top-k can never miss a qualifying match.  Here the device ranks with
``_emd_score_bound`` — a provable UPPER bound on the exact score (greedy
relaxed transport from the lighter-marginal side) — and the exact host EMD
rescore consumes candidates in descending-bound order until every remaining
bound sits below the n-th exact score.  These tests pin the two halves of
that guarantee:

* the bound dominates the exact score on random LP instances (including
  unbalanced marginals and custom extra-mass penalties), yet genuinely
  MISRANKS (strict gaps flip orderings) — i.e. a bound-prefix fetch without
  the cut would return wrong top-k sets;
* the served top-k (find / find_batch / mesh, boosted or not) equals the
  exhaustive exact-EMD oracle byte-for-byte while exact-rescoring only a
  fraction of the corpus.
"""

import itertools
import string

import jax.numpy as jnp
import numpy as np
import pytest

import vectorian_tpu as vt
from vectorian_tpu.alignment import WordMoversDistance, WordRotatorsDistance
from vectorian_tpu.embedding.static import KeyedVectors
from vectorian_tpu.ops.emd_exact import emd_score
from vectorian_tpu.ops.wmd import WMDEngine, _emd_score_bound
from vectorian_tpu.sim.span import OptimizedSpanSim
from vectorian_tpu.sim.token import EmbeddingTokenSim


@pytest.mark.parametrize("normalize", [True, False])
@pytest.mark.parametrize("penalty", [-1.0, 0.25])
def test_bound_dominates_exact_and_misranks(normalize, penalty):
    """bound >= exact on random instances — balanced AND unbalanced
    marginals, default and custom extra-mass penalties (the emd_hat sink
    absorbs exactly the mass difference, so the real-flow LP the score is
    computed from is penalty-independent) — with strict gaps large enough
    to flip orderings."""
    rng = np.random.default_rng(42)
    B, T, L = 48, 5, 7
    m_t = rng.integers(1, 4, size=(B, T)).astype(np.float32)
    m_s = rng.integers(0, 3, size=(B, L)).astype(np.float32)
    m_s[:, 0] = np.maximum(m_s[:, 0], 1.0)
    D = rng.uniform(0.0, 1.0, size=(B, T, L)).astype(np.float32)
    if normalize:
        m_t = m_t / m_t.sum(axis=1, keepdims=True)
        m_s = m_s / m_s.sum(axis=1, keepdims=True)
    bound = np.asarray(
        _emd_score_bound(jnp.asarray(m_t), jnp.asarray(m_s), jnp.asarray(D))
    )
    exact = np.array(
        [
            emd_score(
                m_t[b].astype(np.float64),
                m_s[b].astype(np.float64),
                D[b].astype(np.float64),
                penalty,
            )[0]
            for b in range(B)
        ]
    )
    assert np.all(bound >= exact - 1e-5), float((exact - bound).max())
    # the bound is not the exact score: strict gaps exist ...
    assert np.any(bound > exact + 1e-3)
    # ... and they flip orderings: ranking by bound disagrees with ranking
    # by exact score for some pair — the cut machinery is load-bearing
    ob, oe = np.argsort(-bound), np.argsort(-exact)
    assert ob.tolist() != oe.tolist()


@pytest.fixture(scope="module")
def corpus():
    """Small corpus with heavy word repetition (binding BOW capacities make
    the greedy relaxation loose, so bound order and exact order diverge)."""
    rng = np.random.default_rng(31)
    base = [
        "".join(p)
        for p in itertools.product(string.ascii_lowercase[:5], repeat=3)
    ][:24]
    # clustered vectors -> many near-tied distances
    centers = rng.normal(size=(4, 12)).astype("float32")
    vecs = (
        centers[rng.integers(0, 4, size=len(base))]
        + 0.25 * rng.normal(size=(len(base), 12)).astype("float32")
    ).astype("float32")
    emb = KeyedVectors("pc", base, vecs)
    sents = [
        " ".join(rng.choice(base[:12], size=int(rng.integers(3, 9)))) + "."
        for _ in range(60)
    ]
    docs = [
        vt.StringImporter()(" ".join(sents[i : i + 15]), title=f"d{i}")
        for i in range(0, 60, 15)
    ]
    session = vt.Session(docs, embeddings=[emb])
    return session, emb, base


def _spy_rescore(monkeypatch):
    """Count exact-rescored slices and capture the bound maps find() used."""
    calls = {"n": 0, "smaps": []}
    orig = WMDEngine._host_rescore

    def spy(self, index, query, qp, state, top, min_score, debug, **kw):
        calls["n"] += len(top)
        calls["smaps"].append(state["scores"])
        return orig(self, index, query, qp, state, top, min_score, debug, **kw)

    monkeypatch.setattr(WMDEngine, "_host_rescore", spy)
    return calls


METRICS = [
    ("wmd/nbow", lambda: WordMoversDistance.wmd("nbow")),
    ("wmd/bow", lambda: WordMoversDistance.wmd("bow")),
    ("wrd", lambda: WordRotatorsDistance()),
]


@pytest.mark.parametrize("name,mk", METRICS, ids=[m[0] for m in METRICS])
def test_topk_matches_exhaustive_exact(corpus, monkeypatch, name, mk):
    """find() top-k == the exhaustive exact-EMD oracle (reference
    wmd.h:194-270 semantics: solve every slice), for membership, scores,
    and order — while exact-rescoring only a fraction of the corpus, and
    on queries where the bound ordering provably misranks."""
    session, emb, base = corpus
    p = session.partition("sentence")
    ix = p.index(OptimizedSpanSim(EmbeddingTokenSim(emb), mk()))
    n_slices = int(ix.packed.n_slices)
    rng = np.random.default_rng(17)
    queries = [
        " ".join(rng.choice(base[:12], size=k)) for k in (3, 5, 7)
    ]

    misranked = 0
    calls = _spy_rescore(monkeypatch)
    for q in queries:
        # exhaustive oracle: n >= n_slices and a below-everything threshold
        # force the cut open, so EVERY slice is exact-rescored (transport
        # scores are >= 0); this is literally the reference's algorithm
        exhaustive = ix.find(q, n=n_slices + 8, min_score=-1.0)
        assert calls["n"] >= n_slices  # the oracle really solved every slice
        for n, msc in ((3, -1.0), (5, 0.3), (10, 0.05)):
            want = [
                (m.slice_id, m.score) for m in exhaustive if m.score > msc
            ][:n]
            calls["n"], calls["smaps"] = 0, []
            got = [(m.slice_id, m.score) for m in ix.find(q, n=n, min_score=msc)]
            assert got == want, (name, q, n, msc)
            # the cut did real work: far fewer exact solves than slices
            assert calls["n"] < n_slices
            # adversarial check: does the bound's own top-n prefix differ
            # from the exact top-n?  (counted across configs; asserted > 0
            # at the end — the cut machinery must be load-bearing somewhere)
            smap = calls["smaps"][0] if calls["smaps"] else {}
            if isinstance(smap, dict) and len(want) == n:
                by_bound = sorted(
                    smap.items(), key=lambda kv: (-kv[1], kv[0])
                )[:n]
                if {s for s, _ in by_bound} != {s for s, _ in want}:
                    misranked += 1
    assert misranked > 0, "corpus never misranked — weaken the embedding"


@pytest.mark.parametrize("name,mk", METRICS, ids=[m[0] for m in METRICS])
def test_batch_and_mesh_match_exhaustive(corpus, name, mk):
    """find_batch() and find_batch(mesh=) return the exhaustive-oracle
    top-k byte-for-byte (scores AND membership) — the VERDICT-r2 gap:
    the old Sinkhorn 4n-overfetch could silently drop a qualifying match."""
    session, emb, base = corpus
    p = session.partition("sentence")
    ix = p.index(OptimizedSpanSim(EmbeddingTokenSim(emb), mk()))
    n_slices = int(ix.packed.n_slices)
    rng = np.random.default_rng(23)
    queries = [" ".join(rng.choice(base[:12], size=k)) for k in (3, 6, 4)]
    oracle = {
        q: ix.find(q, n=n_slices + 8, min_score=-1.0) for q in queries
    }
    ms = vt.MeshSearch(vt.make_mesh())
    for n, msc in ((4, 0.25), (8, 0.05)):
        want = [
            [(m.slice_id, m.score) for m in oracle[q] if m.score > msc][:n]
            for q in queries
        ]
        got = [
            [(m.slice_id, m.score) for m in rr]
            for rr in ix.find_batch(queries, n=n, min_score=msc)
        ]
        assert got == want, (name, n, msc)
        mgot = [
            [(m.slice_id, m.score) for m in rr]
            for rr in ix.find_batch(queries, n=n, min_score=msc, mesh=ms)
        ]
        assert mgot == want, (name, n, msc)


def test_boosted_full_wmd_matches_exhaustive(corpus, monkeypatch):
    """Boosters multiply exact scores (alignment.h:598); the cut eps
    scales with the max boost so membership stays provably complete."""
    from vectorian_tpu.saliency import KeywordSignal, Saliency

    session, emb, base = corpus
    p = session.partition("sentence")
    ix = p.index(
        OptimizedSpanSim(EmbeddingTokenSim(emb), WordMoversDistance.wmd("nbow"))
    )
    n_slices = int(ix.packed.n_slices)
    sal = Saliency(strength=0.5).add_signal(KeywordSignal(base[0]), 1.0)
    q = " ".join(base[2:7])
    exhaustive = ix.find(q, n=n_slices + 8, min_score=-1.0, booster=sal)
    calls = _spy_rescore(monkeypatch)
    for n, msc in ((3, -1.0), (6, 0.2)):
        want = [
            (m.slice_id, m.score) for m in exhaustive if m.score > msc
        ][:n]
        calls["n"] = 0
        got = [
            (m.slice_id, m.score)
            for m in ix.find(q, n=n, min_score=msc, booster=sal)
        ]
        assert got == want, (n, msc)
        assert calls["n"] < n_slices
