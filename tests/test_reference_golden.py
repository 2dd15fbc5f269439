"""Golden-value fixtures hand-derived from the reference C++ expressions
(VERDICT r4 item 7): tag-weighted similarity (slice/static.h:236-263) and
the WMD option-flag matrix (alignment/wmd.h:273-417 RelaxedSolver,
:183-262 FullSolver, cost_to_score :139-141) — one case per option cell,
with every expected number computed BY HAND in the comments from the C++
formulas, so parity does not rest on repo-internal oracles.

Geometry used by the WMD cells (unit vectors, exact f32-representable
similarities):  wa=(1,0)  wb=(0.6,0.8)  wc=(0,1)
    sim(wa,wb)=0.6   sim(wb,wc)=0.8   sim(wa,wc)=0.0
    distance d = max(1 - sim, 0):  d(a,b)=0.4  d(b,c)=0.2  d(a,c)=1.0
Needle "wa wb" vs corpus slice "wb wc wc":
    nbow_t = {a:1/2, b:1/2}    bow_t = {a:1, b:1},  w_sum 2, len_t 2
    nbow_s = {b:1/3, c:2/3}    bow_s = {b:1, c:2},  w_sum 3
"""

import numpy as np
import pytest

import vectorian_tpu as vt
from vectorian_tpu.alignment import (
    AffineGapCost,
    LocalAlignment,
    WordMoversDistance,
)
from vectorian_tpu.embedding.static import KeyedVectors
from vectorian_tpu.sim.span import OptimizedSpanSim
from vectorian_tpu.sim.token import EmbeddingTokenSim


@pytest.fixture(scope="module")
def wmd_setup():
    emb = KeyedVectors(
        "golden2d",
        ["wa", "wb", "wc", "wd"],
        np.asarray(
            [[1.0, 0.0], [0.6, 0.8], [0.0, 1.0], [-1.0, 0.0]], np.float32
        ),
    )
    docs = [
        vt.StringImporter()("wb wc wc. wd wd.", title="d0"),
    ]
    session = vt.Session(docs, embeddings=[emb])
    return session, emb


def _wmd_score(session, emb, metric, query="wa wb"):
    ix = session.partition("sentence").index(
        OptimizedSpanSim(EmbeddingTokenSim(emb), metric)
    )
    r = ix.find(query, n=2, min_score=-1.0)
    assert r[0].slice_id is not None
    return r[0].score


def test_rwmd_nbow_injective_symmetric(wmd_setup):
    """rwmd('nbow') = (relaxed, injective, symmetric, normalize_bow)
    (reference alignment.py:233).  RelaxedSolver wmd.h:307-417:
      t->s: a: 1/2 * min(0.4, 1.0) = 0.2 ; b: 1/2 * 0 = 0     acc0 = 0.2
      s->t: b: 1/3 * 0 ; c: 2/3 * min(1.0, 0.2) = 2/15        acc1 = 0.1333
      symmetric -> cost = max = 0.2 ; max_cost = 1 (nbow, wmd.h:411)
      score = (1 - 0.2) / 1 = 0.8                 (cost_to_score :139)"""
    session, emb = wmd_setup
    got = _wmd_score(session, emb, WordMoversDistance.rwmd("nbow"))
    assert got == pytest.approx(0.8, abs=1e-6)


def test_rwmd_nbow_distributed(wmd_setup):
    """rwmd('nbow/distributed') = non-injective 1:n fill (wmd.h:341-376):
      t->s: a(1/2): 1/3@0.4 + 1/6@1.0 = 0.3 ; b(1/2): 1/3@0 + 1/6@0.2
            = 1/30                                     acc0 = 1/3
      s->t: b(1/3): @0 ; c(2/3): 1/2@0.2 + 1/6@1.0 = 4/15  acc1 = 4/15
      cost = max = 1/3 ; score = 1 - 1/3 = 2/3"""
    session, emb = wmd_setup
    got = _wmd_score(
        session, emb, WordMoversDistance.rwmd("nbow/distributed")
    )
    assert got == pytest.approx(2.0 / 3.0, abs=1e-6)


def test_rwmd_bow_fast_nonsymmetric(wmd_setup):
    """rwmd('bow/fast') = (relaxed, injective, NON-symmetric, raw bow)
    (alignment.py:237).  Only the t->s direction runs (wmd.h:383-386):
      acc = 1*0.4 + 1*0 = 0.4 ; /= w_sum(t)=2 -> cost = 0.2  (wmd.h:379)
      max_cost = max_sum_of_similarities = len_t = 2 (wmd.h:411-412,
      static.h:98)
      score = (2 - 0.2) / 2 = 0.9"""
    session, emb = wmd_setup
    got = _wmd_score(session, emb, WordMoversDistance.rwmd("bow/fast"))
    assert got == pytest.approx(0.9, abs=1e-6)


def test_wmd_bow_full(wmd_setup):
    """wmd('bow') = full EMD over NORMALIZED bows (alignment.py:214 —
    note the reference quirk: the 'bow' variant passes
    normalize_bow=True).  Optimal transport of {a:1/2, b:1/2} onto
    {b:1/3, c:2/3}: cost(x = flow a->b) = 8/15 - 0.4x, minimized at
    x = 1/3: G = {a->b:1/3, a->c:1/6, b->c:1/2}, cost 0.4.
    FullSolver score = sum((1-D)*G)/sum(G) (wmd.h:252):
      (0.6*(1/3) + 0*(1/6) + 0.8*(1/2)) / 1 = 0.6"""
    session, emb = wmd_setup
    got = _wmd_score(session, emb, WordMoversDistance.wmd("bow"))
    assert got == pytest.approx(0.6, abs=1e-6)


def test_wmd_nbow_full(wmd_setup):
    """wmd('nbow') = full EMD over RAW counts (normalize_bow=False,
    alignment.py:216): masses t={a:1,b:1} (2) vs s={b:1,c:2} (3).
    emd_hat moves the smaller total (2); the sink penalty term is
    G-independent, so G minimizes plain transport:
      G = {a->b:1, b->c:1}, cost 0.6
      score = ((1-0.4)*1 + (1-0.2)*1) / 2 = 0.7   (wmd.h:252)"""
    session, emb = wmd_setup
    got = _wmd_score(session, emb, WordMoversDistance.wmd("nbow"))
    assert got == pytest.approx(0.7, abs=1e-6)


@pytest.fixture(scope="module")
def onehot_session():
    words = ["cat", "Cat", "chased", "dog", "see"]
    emb = KeyedVectors("onehot", words, np.eye(5, dtype=np.float32))
    docs = [
        vt.StringImporter()("cat chased dog. Cat runs.", title="d0"),
    ]
    return vt.Session(docs, embeddings=[emb]), emb


def test_tag_weight_threshold_golden(onehot_session):
    """TagWeightedSlice (static.h:236-263) with one-hot sims.

    SimpleNLP tags: cat->NN, chased (-ed)->VB, dog->NN.  Needle
    "cat chased dog", weights {NN:0.8, VB:0.5}, threshold 0.6:
      sim'(cat,cat)    = 1 * 0.8 = 0.8  > 0.6  keep
      sim'(chased,chased) = 0.5        <= 0.6  -> 0   (static.h:258)
      sim'(dog,dog)    = 0.8
    Local alignment, affine gaps open 0.2 extend 0.1: the best path
    matches all three pairs DIAGONALLY — the zeroed chased/chased cell
    contributes 0 but costs no gap — raw = 0.8 + 0 + 0.8 = 1.6 (gapped
    alternatives pay 2 * 0.2).
    norm_total = sum of needle weights = 0.8+0.5+0.8 = 2.1
    score = 1.6 / 2.1 = 0.761904...  (metric/alignment.h:84-106 with
    submatch_weight 0 -> reference_score = max_sum = 2.1)"""
    session, emb = onehot_session
    ix = session.partition("sentence").index(
        OptimizedSpanSim(
            EmbeddingTokenSim(emb),
            LocalAlignment(AffineGapCost(0.2, 0.1)),
            tag_weights={"NN": 0.8, "VB": 0.5},
            similarity_threshold=0.6,
        )
    )
    r = ix.find("cat chased dog", n=1, min_score=0.0)
    assert r[0].score == pytest.approx(1.6 / 2.1, abs=1e-6)


def test_tag_weight_pos_mismatch_golden():
    """pos_mismatch_penalty uses UNIVERSAL pos (static.h:243-246).
    (NB the vanilla flavor rewrites PROPN->NOUN / NNP->NN, reference
    normalization.py vanilla — so the mismatch must come from distinct
    POS classes that SURVIVE normalization.)

    Embedding: walked=(1,0), jump=(0.6,0.8) -> sim = 0.6.  SimpleNLP:
    "walked" (-ed) -> VERB/VB, "jump" -> NOUN/NN.  Needle "walked",
    weights {VB: 0.9}, penalty 0.3:
      doc "walked."  same pos:   sim' = 1.0 * 0.9        = 0.9
      doc "jump."    VERB!=NOUN: sim' = 0.6 * 0.9 * 0.7  = 0.378
    norm_total = 0.9 -> scores 1.0 and 0.42 (static.h:236-263)."""
    emb = KeyedVectors(
        "mix2d",
        ["walked", "jump"],
        np.asarray([[1.0, 0.0], [0.6, 0.8]], np.float32),
    )
    docs = [vt.StringImporter()("walked. jump.", title="d0")]
    session = vt.Session(docs, embeddings=[emb])
    ix = session.partition("sentence").index(
        OptimizedSpanSim(
            EmbeddingTokenSim(emb),
            LocalAlignment(AffineGapCost(0.2, 0.1)),
            tag_weights={"VB": 0.9},
            pos_mismatch_penalty=0.3,
        )
    )
    r = ix.find("walked", n=2, min_score=0.0)
    assert [m.slice_id for m in r] == [0, 1]
    assert r[0].score == pytest.approx(1.0, abs=1e-6)
    assert r[1].score == pytest.approx(0.42, abs=1e-6)
