"""Cross-path parity: find(), find_batch() and find_batch(mesh=...) must
return IDENTICAL matches (ids, scores, order) for randomized configs across
metric families — the committed slice of the 40-trial campaign that caught
the device-top-k tie truncation and the 1-ulp score-reporting divergence
(git f7bb0cf / d91b1d8)."""

import itertools
import string

import numpy as np
import pytest

import vectorian_tpu as vt
from vectorian_tpu.alignment import (
    AffineGapCost,
    ConstantGapCost,
    ExponentialGapCost,
    GlobalAlignment,
    LinearGapCost,
    LocalAlignment,
    SemiGlobalAlignment,
    WordMoversDistance,
    WordRotatorsDistance,
)
from vectorian_tpu.embedding.static import KeyedVectors
from vectorian_tpu.sim.span import OptimizedSpanSim
from vectorian_tpu.sim.token import EmbeddingTokenSim




def _campaign(n: int, keep: int = 2):
    """First ``keep`` trials run by default; the rest are slow-marked
    (the full campaign runs in CI via --override-ini=addopts=)."""
    return [
        pytest.param(i, marks=[] if i < keep else [pytest.mark.slow])
        for i in range(n)
    ]

@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(99)
    base = [
        "".join(p)
        for p in itertools.product(string.ascii_lowercase[:7], repeat=3)
    ][:120]
    emb = KeyedVectors(
        "fz", base, rng.normal(size=(len(base), 24)).astype("float32")
    )
    sents = [
        " ".join(rng.choice(base, size=int(rng.integers(3, 10)))) + "."
        for _ in range(80)
    ]
    docs = [
        vt.StringImporter()(" ".join(sents[i : i + 20]), title=f"d{i}")
        for i in range(0, 80, 20)
    ]
    session = vt.Session(docs, embeddings=[emb])
    return session, emb, base


LOCS = [LocalAlignment, GlobalAlignment, SemiGlobalAlignment]
GAPS = [
    lambda r: AffineGapCost(float(r.uniform(0, 0.5)), float(r.uniform(0, 0.3))),
    lambda r: ConstantGapCost(float(r.uniform(0, 0.6))),
    lambda r: LinearGapCost(float(r.uniform(0, 0.4))),
    lambda r: ExponentialGapCost(int(r.integers(2, 8))),
]
TRANSPORTS = [
    lambda: WordMoversDistance.rwmd("nbow"),
    lambda: WordMoversDistance.rwmd("bow/fast"),
    lambda: WordMoversDistance.wmd("nbow"),
    lambda: WordRotatorsDistance(),
    # non-injective greedy + symmetric — the variant whose batch kernel
    # was width-sensitive (mixed-width batches now group by width)
    lambda: WordMoversDistance.rwmd("nbow/distributed"),
]


@pytest.mark.parametrize("trial", _campaign(12))
def test_cross_path_parity(setup, trial):
    session, emb, base = setup
    p = session.partition("sentence")
    r = np.random.default_rng(1000 + trial)
    qs = [
        " ".join(r.choice(base, size=int(r.integers(1, 9)))) for _ in range(3)
    ]
    msc = float(r.uniform(-1.0, 0.2))
    if trial % 4 == 3:
        ix = p.index(
            OptimizedSpanSim(
                EmbeddingTokenSim(emb), TRANSPORTS[(trial // 4) % len(TRANSPORTS)]()
            )
        )
    else:
        ix = p.index(
            OptimizedSpanSim(
                EmbeddingTokenSim(emb), LOCS[trial % 3](GAPS[trial % 4](r))
            )
        )
    want = [
        [(m.slice_id, m.score) for m in ix.find(q, n=4, min_score=msc)]
        for q in qs
    ]
    got = [
        [(m.slice_id, m.score) for m in rr]
        for rr in ix.find_batch(qs, n=4, min_score=msc)
    ]
    assert got == want
    ms = vt.MeshSearch(vt.make_mesh())
    try:
        mgot = [
            [(m.slice_id, m.score) for m in rr]
            for rr in ix.find_batch(qs, n=4, min_score=msc, mesh=ms)
        ]
    except NotImplementedError:
        return
    assert mgot == got


@pytest.mark.parametrize("trial", _campaign(4))
def test_cross_path_parity_options(setup, trial):
    """Campaign extension for the fused serving paths: tag-weighted
    alignment, document-side token filters and general gaps mixed with
    randomized localities — find()/find_batch()(/mesh) byte-equality."""
    session, emb, base = setup
    p = session.partition("sentence")
    r = np.random.default_rng(7000 + trial)
    qs = [
        " ".join(r.choice(base, size=int(r.integers(2, 8)))) for _ in range(3)
    ]
    msc = float(r.uniform(-1.0, 0.15))
    gap = GAPS[trial % 4](r)
    loc = LOCS[trial % 3]
    kwargs = {}
    if trial % 2 == 0:
        # drop a handful of corpus words on the document side
        kwargs["token_filter"] = [
            str(w) for w in r.choice(base, size=3, replace=False)
        ]
    if trial % 2 == 1:
        tw = {"NN": float(r.uniform(0.5, 1.0)), "JJ": float(r.uniform(0.2, 0.8))}
        ix = p.index(
            OptimizedSpanSim(
                EmbeddingTokenSim(emb), loc(gap), tag_weights=tw,
                pos_mismatch_penalty=float(r.uniform(0, 0.4)),
                similarity_threshold=float(r.uniform(0, 0.2)),
            )
        )
    else:
        ix = p.index(OptimizedSpanSim(EmbeddingTokenSim(emb), loc(gap)))
    want = [
        [(m.slice_id, m.score) for m in ix.find(q, n=4, min_score=msc, **kwargs)]
        for q in qs
    ]
    got = [
        [(m.slice_id, m.score) for m in rr]
        for rr in ix.find_batch(qs, n=4, min_score=msc, **kwargs)
    ]
    assert got == want
    # mesh serves doc filters too (round 3: in-shard compaction)
    ms = vt.MeshSearch(vt.make_mesh())
    try:
        mgot = [
            [(m.slice_id, m.score) for m in rr]
            for rr in ix.find_batch(qs, n=4, min_score=msc, mesh=ms, **kwargs)
        ]
    except NotImplementedError:
        return
    assert mgot == got


@pytest.mark.parametrize("trial", _campaign(6))
def test_cross_path_parity_submatch_bidirectional(setup, trial):
    """Campaign extension for the last batch-served options
    (BATCH_HARD_OPTIONS shrank to {'debug'}): ``submatch_weight`` (the
    closed-form-bounded overfetch finalizer) and ``bidirectional`` (both
    orientations on the stacked table, exact-score merge), alone and
    combined, across gap models / localities / tag weights —
    find()/find_batch()/mesh byte-equality."""
    session, emb, base = setup
    p = session.partition("sentence")
    r = np.random.default_rng(9100 + trial)
    qs = [
        " ".join(r.choice(base, size=int(r.integers(2, 8)))) for _ in range(3)
    ]
    msc = float(r.uniform(-0.5, 0.15))
    kwargs = {}
    if trial % 3 != 1:
        kwargs["submatch_weight"] = float(r.uniform(0.1, 1.0))
    if trial % 3 != 0:
        kwargs["bidirectional"] = True
    gap = GAPS[trial % 4](r)
    if trial % 2 == 1:
        ix = p.index(
            OptimizedSpanSim(
                EmbeddingTokenSim(emb), LOCS[trial % 3](gap),
                tag_weights={"NN": 0.8, "JJ": 0.4},
                pos_mismatch_penalty=0.2,
            )
        )
    else:
        ix = p.index(OptimizedSpanSim(EmbeddingTokenSim(emb), LOCS[trial % 3](gap)))
    want = [
        [(m.slice_id, m.score) for m in ix.find(q, n=4, min_score=msc, **kwargs)]
        for q in qs
    ]
    got = [
        [(m.slice_id, m.score) for m in rr]
        for rr in ix.find_batch(qs, n=4, min_score=msc, **kwargs)
    ]
    assert got == want
    ms = vt.MeshSearch(vt.make_mesh())
    mgot = [
        [(m.slice_id, m.score) for m in rr]
        for rr in ix.find_batch(qs, n=4, min_score=msc, mesh=ms, **kwargs)
    ]
    assert mgot == got


@pytest.mark.parametrize("trial", _campaign(6))
def test_cross_path_parity_transport_options(setup, trial):
    """Transport batches with boosters / doc-side token filters / tag
    weights (VERDICT-r2 gap: these used to fall back to Q per-query
    passes, and raised over a mesh) — find()/find_batch()/mesh
    byte-equality for relaxed WMD, full WMD and WRD."""
    from vectorian_tpu.saliency import KeywordSignal, Saliency

    session, emb, base = setup
    p = session.partition("sentence")
    r = np.random.default_rng(8200 + trial)
    qs = [
        " ".join(r.choice(base, size=int(r.integers(2, 6)))) for _ in range(3)
    ]
    msc = float(r.uniform(-0.2, 0.2))
    mk = TRANSPORTS[trial % len(TRANSPORTS)]
    kwargs = {}
    if trial % 2 == 0:
        kwargs["booster"] = Saliency(strength=0.5).add_signal(
            KeywordSignal(base[trial % 7]), 1.0
        )
    if trial % 3 == 0:
        kwargs["token_filter"] = [
            str(w) for w in r.choice(base, size=3, replace=False)
        ]
    if trial % 2 == 1:
        ix = p.index(
            OptimizedSpanSim(
                EmbeddingTokenSim(emb), mk(),
                tag_weights={"NN": 0.8, "JJ": 0.5},
                pos_mismatch_penalty=0.15,
                similarity_threshold=0.05,
            )
        )
    else:
        ix = p.index(OptimizedSpanSim(EmbeddingTokenSim(emb), mk()))
    want = [
        [(m.slice_id, m.score) for m in ix.find(q, n=4, min_score=msc, **kwargs)]
        for q in qs
    ]
    got = [
        [(m.slice_id, m.score) for m in rr]
        for rr in ix.find_batch(qs, n=4, min_score=msc, **kwargs)
    ]
    assert got == want
    ms = vt.MeshSearch(vt.make_mesh())
    mgot = [
        [(m.slice_id, m.score) for m in rr]
        for rr in ix.find_batch(qs, n=4, min_score=msc, mesh=ms, **kwargs)
    ]
    assert mgot == got


def test_distributed_rwmd_mixed_width_batch(setup):
    """Non-injective symmetric relaxed WMD ("nbow/distributed") with
    MIXED needle widths in one batch: the batch kernel's f32 sum
    reduction tree changes with the padded width (measured 1-ulp drift
    vs the query's own compile width), so the padded kernel only RANKS
    and every path reports rwmd_score_host's shape-independent
    arithmetic — find() and find_batch() stay byte-identical."""
    session, emb, base = setup
    p = session.partition("sentence")
    r = np.random.default_rng(5014)
    # lengths straddling the 4-token pad bucket: widths 4 and 8 mix
    qs = [
        " ".join(r.choice(base, size=k)) for k in (4, 7, 2, 5)
    ]
    ix = p.index(
        OptimizedSpanSim(
            EmbeddingTokenSim(emb),
            WordMoversDistance.rwmd("nbow/distributed"),
        )
    )
    for msc in (-0.5, 0.05):
        want = [
            [(m.slice_id, m.score) for m in ix.find(q, n=4, min_score=msc)]
            for q in qs
        ]
        got = [
            [(m.slice_id, m.score) for m in rr]
            for rr in ix.find_batch(qs, n=4, min_score=msc)
        ]
        assert got == want
