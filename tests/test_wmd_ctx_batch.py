"""Batched contextual / mixed-tree TRANSPORT serving parity.

find_batch must return byte-identical matches to find() for relaxed WMD,
full WMD and WRD over contextual and mixed static+contextual plans — the
reference serves every metric uniformly through its document ThreadPool
(/root/reference/vectorian/index.py:530-560); contextual operands select
the position-unique BOW builder (metric/alignment.h:551-576,
alignment/bow.h:278-334).  The batch ranks through the stacked-plan
transport kernels (one corpus pass for Q queries) and reports the same
host arithmetic as find(): rwmd_score_host for relaxed, the exact EMD
solver under the provable cut for full WMD / WRD.
"""

import numpy as np
import pytest

from vectorian_tpu import Session, StringImporter
from vectorian_tpu.alignment import WordMoversDistance, WordRotatorsDistance
from vectorian_tpu.embedding.contextual import LambdaContextualEmbedding
from vectorian_tpu.sim.modifier import MixedTokenSimilarity
from vectorian_tpu.sim.span import OptimizedSpanSim
from vectorian_tpu.sim.token import EmbeddingTokenSim

from .helpers import make_embedding
from .test_contextual import DIM, ctx_fn

QUERIES = [
    "horse grey the rides king old the",
    "a cat sleeps",
    "the dog runs fast and the bird sings",
    "king rides horse",
]


@pytest.fixture(scope="module")
def tsession():
    ctx = LambdaContextualEmbedding("wmdb-ctx", ctx_fn, DIM)
    words = ["the", "old", "king", "rides", "grey", "horse", "cat",
             "sleeps", "dog", "runs", "fast", "a", "bird", "sings",
             "loud", "and", "queen", "walks"]
    static = make_embedding(words, dim=16, name="wmdb-static")
    imp = StringImporter()
    docs = [
        imp(
            "the old king rides the grey horse. a cat sleeps. "
            "the queen walks fast.",
            title="d0",
        ),
        imp(
            "the dog runs fast. a bird sings loud. "
            "the grey horse rides the old king. a cat sleeps.",
            title="d1",
        ),
    ]
    return Session(docs, embeddings=[static, ctx]), static, ctx


OPTIMIZERS = [
    WordMoversDistance.rwmd("nbow"),
    WordMoversDistance.rwmd("bow/fast"),
    WordMoversDistance.wmd("nbow"),
    WordMoversDistance.wmd("bow"),
    WordRotatorsDistance(),
]
OPT_IDS = ["rwmd-nbow", "rwmd-bow-fast", "wmd-nbow", "wmd-bow", "wrd"]


def _pairs(result):
    return [(m.slice_id, m.score) for m in result]


@pytest.mark.parametrize("optimizer", OPTIMIZERS, ids=OPT_IDS)
def test_ctx_transport_batch_parity(tsession, optimizer):
    session, _static, ctx = tsession
    p = session.partition("sentence")
    ix = p.index(OptimizedSpanSim(EmbeddingTokenSim(ctx), optimizer))
    want = [_pairs(ix.find(q, n=3, min_score=0.05)) for q in QUERIES]
    got = [_pairs(r) for r in ix.find_batch(QUERIES, n=3, min_score=0.05)]
    assert got == want
    assert any(len(w) > 0 for w in want)  # non-vacuous


@pytest.mark.parametrize(
    "optimizer",
    [WordMoversDistance.rwmd("nbow"), WordMoversDistance.wmd("nbow"),
     WordRotatorsDistance()],
    ids=["rwmd", "wmd", "wrd"],
)
def test_mixed_tree_transport_batch_parity(tsession, optimizer):
    """Mixed static+contextual trees stack per leaf through the same
    plan-stacked transport kernels (position-unique BOW — a contextual
    operand is present)."""
    session, static, ctx = tsession
    tree = MixedTokenSimilarity(
        [EmbeddingTokenSim(static), EmbeddingTokenSim(ctx)], [0.5, 0.5]
    )
    p = session.partition("sentence")
    ix = p.index(OptimizedSpanSim(tree, optimizer))
    want = [_pairs(ix.find(q, n=3, min_score=0.05)) for q in QUERIES]
    got = [_pairs(r) for r in ix.find_batch(QUERIES, n=3, min_score=0.05)]
    assert got == want
    assert any(len(w) > 0 for w in want)


def test_ctx_transport_batch_booster_filter_parity(tsession):
    """Boosters and doc-side token filters ride the contextual transport
    batch (in-kernel multiply / mass exclusion), byte-equal to find()."""
    from vectorian_tpu.saliency import KeywordSignal, Saliency

    session, _static, ctx = tsession
    sal = Saliency(strength=0.8).add_signal(KeywordSignal("horse"), 1.0)
    p = session.partition("sentence")
    for optimizer in (
        WordMoversDistance.rwmd("nbow"),
        WordRotatorsDistance(),
    ):
        ix = p.index(OptimizedSpanSim(EmbeddingTokenSim(ctx), optimizer))
        for kwargs in ({"booster": sal}, {"token_filter": ["the", "a"]}):
            want = [
                _pairs(ix.find(q, n=3, min_score=0.05, **kwargs))
                for q in QUERIES[:2]
            ]
            got = [
                _pairs(r)
                for r in ix.find_batch(QUERIES[:2], n=3, min_score=0.05,
                                       **kwargs)
            ]
            assert got == want, (type(optimizer).__name__, kwargs)


@pytest.mark.parametrize(
    "optimizer",
    [WordMoversDistance.rwmd("nbow"), WordMoversDistance.wmd("nbow"),
     WordRotatorsDistance()],
    ids=["rwmd", "wmd", "wrd"],
)
def test_ctx_transport_mesh_parity(tsession, optimizer):
    """Contextual transport serves over the mesh too
    (MeshSearch.plan_transport_topk_multiquery: sharded ctx stores,
    replicated stacked leaves) — byte-equal to find()."""
    import vectorian_tpu as vt

    session, _static, ctx = tsession
    p = session.partition("sentence")
    ix = p.index(OptimizedSpanSim(EmbeddingTokenSim(ctx), optimizer))
    want = [_pairs(ix.find(q, n=3, min_score=0.05)) for q in QUERIES]
    ms = vt.MeshSearch(vt.make_mesh())
    got = [
        _pairs(r)
        for r in ix.find_batch(QUERIES, n=3, min_score=0.05, mesh=ms)
    ]
    assert got == want


@pytest.mark.parametrize(
    "optimizer",
    [WordMoversDistance.rwmd("nbow"), WordMoversDistance.wmd("nbow"),
     WordRotatorsDistance()],
    ids=["rwmd", "wmd", "wrd"],
)
def test_static_tree_transport_batch_parity(tsession, optimizer):
    """Static-only modifier trees batch too: WMD plans fold to ONE
    combined table (compile_plan canonicalization) and ride the static
    [V, T, Q] kernels; WRD keeps the tree (it needs leaf magnitudes) and
    rides the plan-stacked kernels with dedup BOW masses."""
    session, static, _ctx = tsession
    tree = MixedTokenSimilarity(
        [EmbeddingTokenSim(static), EmbeddingTokenSim(static)], [0.7, 0.3]
    )
    p = session.partition("sentence")
    ix = p.index(OptimizedSpanSim(tree, optimizer))
    want = [_pairs(ix.find(q, n=3, min_score=0.05)) for q in QUERIES]
    got = [_pairs(r) for r in ix.find_batch(QUERIES, n=3, min_score=0.05)]
    assert got == want
    import vectorian_tpu as vt

    ms = vt.MeshSearch(vt.make_mesh())
    got_mesh = [
        _pairs(r)
        for r in ix.find_batch(QUERIES, n=3, min_score=0.05, mesh=ms)
    ]
    assert got_mesh == want


def test_mixed_tree_transport_mesh_parity(tsession):
    """Mixed static+contextual transport over the mesh: stacked static
    leaf tables replicate, ctx stores shard — byte-equal to find()."""
    import vectorian_tpu as vt

    session, static, ctx = tsession
    tree = MixedTokenSimilarity(
        [EmbeddingTokenSim(static), EmbeddingTokenSim(ctx)], [0.5, 0.5]
    )
    p = session.partition("sentence")
    ix = p.index(OptimizedSpanSim(tree, WordMoversDistance.rwmd("nbow")))
    want = [_pairs(ix.find(q, n=3, min_score=0.05)) for q in QUERIES]
    ms = vt.MeshSearch(vt.make_mesh())
    got = [
        _pairs(r)
        for r in ix.find_batch(QUERIES, n=3, min_score=0.05, mesh=ms)
    ]
    assert got == want
