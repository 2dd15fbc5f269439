"""Provable MXU prefilter (ops/prefilter.py): bound soundness oracle +
byte-identity of the pruned serving path vs the full corpus pass —
including the unsafe-cut fallback on tie-heavy (duplicate-sentence)
corpora.  TPU analogue of the reference's worst_score early-reject
(core/cpp/result_set.h:32-38)."""

import numpy as np
import pytest

import vectorian_tpu as vt
from vectorian_tpu.alignment import (
    AffineGapCost,
    GlobalAlignment,
    LinearGapCost,
    LocalAlignment,
    SemiGlobalAlignment,
)
from vectorian_tpu.ops import prefilter as pf
from vectorian_tpu.ops.alignment import AffineGapParams, align_scores
from vectorian_tpu.sim.span import OptimizedSpanSim
from vectorian_tpu.sim.token import EmbeddingTokenSim

from .helpers import make_embedding

import jax.numpy as jnp


def test_bound_dominates_dp_oracle():
    """ub = cnt @ weights upper-bounds the exact DP raw score for random
    similarity tables, token streams and nonnegative affine gaps, at
    every locality."""
    rng = np.random.default_rng(7)
    V, H = 40, 8
    groups = pf.cold_groups(H, V)
    for trial in range(20):
        T = int(rng.integers(1, 7))
        L = int(rng.integers(2, 12))
        N = 16
        table = rng.normal(scale=0.7, size=(V, T, 1)).astype(np.float32)
        tokens = rng.integers(0, V, size=(N, L)).astype(np.int32)
        # tie-heavy rows: duplicate tokens exercise the excess-count term
        tokens[: N // 2, : L // 2] = tokens[: N // 2, :1]
        lengths = rng.integers(1, L + 1, size=(N,)).astype(np.int32)
        gaps = AffineGapParams.of(
            float(rng.uniform(0, 0.5)), float(rng.uniform(0, 0.3)),
            float(rng.uniform(0, 0.5)), float(rng.uniform(0, 0.3)),
        )
        cnt = np.asarray(
            pf.build_counts(
                jnp.asarray(tokens), jnp.asarray(lengths),
                H=H, groups=groups, chunk=N,
            )
        )
        srt = pf._needle_sorted(
            jnp.asarray(table), jnp.asarray([T], jnp.int32)
        )
        no_needle = jnp.zeros((V,), bool)
        uu = np.asarray(
            pf._ub_weights(srt, H, groups, no_needle)
        ).astype(np.float32)
        ub = cnt.astype(np.float32) @ uu
        for locality in ("local", "semiglobal", "global"):
            raw = np.asarray(
                align_scores(
                    jnp.asarray(table[:, :, 0][tokens]),  # [N, L, T]
                    jnp.asarray(np.maximum(lengths, 1)),
                    jnp.asarray(np.full(N, T, np.int32)),
                    gaps,
                    locality,
                )
            )
            slack = 1e-3 * np.maximum(1.0, np.abs(ub))
            assert np.all(ub + slack >= raw), (
                trial, locality, float(np.max(raw - ub)),
            )


@pytest.fixture(scope="module")
def big_session():
    """~1.5k-slice corpus concentrated in one length bucket so the
    prefilter engages at test-sized M."""
    rng = np.random.default_rng(31)
    import itertools
    import string

    words = [
        "".join(t)
        for t in itertools.product(string.ascii_lowercase[:10], repeat=2)
    ][:90]
    emb = make_embedding(words, dim=16, name="pfemb")
    # Zipf-ish draws + planted duplicates for tie-heavy boundaries
    p = 1.0 / np.arange(1, len(words) + 1)
    p /= p.sum()
    sents = [
        " ".join(rng.choice(words, size=int(rng.integers(4, 8)), p=p)) + "."
        for _ in range(1400)
    ]
    dup = " ".join(words[:5]) + "."
    sents.extend([dup] * 100)
    docs = [
        vt.StringImporter()(" ".join(sents[i : i + 300]), title=f"d{i}")
        for i in range(0, len(sents), 300)
    ]
    session = vt.Session(docs, embeddings=[emb])
    return session, emb, words


def _run_find(session, emb, queries, gap, loc, n, min_score):
    p = session.partition("sentence")
    ix = p.index(OptimizedSpanSim(EmbeddingTokenSim(emb), loc(gap)))
    return [
        [(m.slice_id, m.score) for m in ix.find(q, n=n, min_score=min_score)]
        for q in queries
    ]


@pytest.mark.parametrize("trial", range(3))
def test_prefiltered_find_byte_identical(big_session, trial, monkeypatch):
    session, emb, words = big_session
    rng = np.random.default_rng(500 + trial)
    queries = [
        " ".join(rng.choice(words[:40], size=int(rng.integers(2, 7))))
        for _ in range(3)
    ]
    loc = [LocalAlignment, SemiGlobalAlignment, GlobalAlignment][trial % 3]
    gap = [
        AffineGapCost(0.3, 0.1),
        LinearGapCost(0.25),
        AffineGapCost(0.0, 0.0),
    ][trial % 3]

    monkeypatch.setenv("VECTORIAN_PREFILTER", "0")
    want = _run_find(session, emb, queries, gap, loc, 5, 0.05)

    monkeypatch.setenv("VECTORIAN_PREFILTER", "1")
    monkeypatch.setenv("VECTORIAN_PREFILTER_M", "256")
    monkeypatch.setenv("VECTORIAN_PREFILTER_MIN_N", "1")
    monkeypatch.setenv("VECTORIAN_PREFILTER_H", "32")
    from vectorian_tpu.utils import trace

    trace.start()
    got = _run_find(session, emb, queries, gap, loc, 5, 0.05)
    events = dict(trace.stop())
    assert "pf.dispatch" in events, "prefilter path did not engage"
    assert got == want


def test_unsafe_cut_falls_back(big_session, monkeypatch):
    """M far below the duplicate-tie group forces ub_rest >= s_n: the
    serving path must detect the unprovable cut and rerun unpruned,
    returning byte-identical matches."""
    session, emb, words = big_session
    query = " ".join(words[:5])  # the 100x-planted duplicate sentence

    monkeypatch.setenv("VECTORIAN_PREFILTER", "0")
    want = _run_find(
        session, emb, [query], AffineGapCost(0.2, 0.1), LocalAlignment,
        50, 0.0,
    )

    monkeypatch.setenv("VECTORIAN_PREFILTER", "1")
    monkeypatch.setenv("VECTORIAN_PREFILTER_M", "60")
    monkeypatch.setenv("VECTORIAN_PREFILTER_MIN_N", "1")
    monkeypatch.setenv("VECTORIAN_PREFILTER_H", "32")
    from vectorian_tpu.utils import trace

    trace.start()
    got = _run_find(
        session, emb, [query], AffineGapCost(0.2, 0.1), LocalAlignment,
        50, 0.0,
    )
    events = [name for name, _ in trace.stop()]
    assert got == want
    # with every duplicate scoring identically, 60 candidates cannot
    # prove a 50-deep cut over a 100-wide tie group
    assert "find.pf_fallback" in events


def test_count_matrix_semantics():
    """Depth-4 occurrence indicators, excess and cold distinct/dup
    columns count exactly (int8, masked by length)."""
    H = 4
    V = 12
    groups = pf.cold_groups(H, V)
    assert groups == ((4, 6), (6, 9), (9, 12))
    tokens = np.asarray(
        [
            [1, 1, 1, 5, 5, 9, 1, 1],  # last two masked by length
            [2, 3, 4, 8, 11, 11, 11, 2],
        ],
        np.int32,
    )
    lengths = np.asarray([6, 8], np.int32)
    cnt = np.asarray(
        pf.build_counts(
            jnp.asarray(tokens), jnp.asarray(lengths), H=H, groups=groups,
            chunk=2,
        )
    )
    G = len(groups)
    ind = [cnt[:, c * H : (c + 1) * H] for c in range(4)]
    ext = cnt[:, 4 * H : 5 * H]
    dis = cnt[:, 5 * H : 5 * H + G]
    dup = cnt[:, 5 * H + G :]
    # row 0: tokens 1,1,1,5,5,9 -> tf(1)=3
    assert list(ind[0][0]) == [0, 1, 0, 0]
    assert list(ind[1][0]) == [0, 1, 0, 0]
    assert list(ind[2][0]) == [0, 1, 0, 0]
    assert list(ind[3][0]) == [0, 0, 0, 0]
    assert list(ext[0]) == [0, 0, 0, 0]
    assert list(dis[0]) == [1, 0, 1]  # 5 in [4,6), 9 in [9,12)
    assert list(dup[0]) == [1, 0, 0]
    # row 1: 2,3,4,8,11,11,11,2 -> tf(2)=2, tf(3)=1
    assert list(ind[0][1]) == [0, 0, 1, 1]
    assert list(ind[1][1]) == [0, 0, 1, 0]
    assert list(ind[2][1]) == [0, 0, 0, 0]
    assert list(ext[1]) == [0, 0, 0, 0]
    assert list(dis[1]) == [1, 1, 1]  # 4 | 8 | 11
    assert list(dup[1]) == [0, 0, 2]
    # a 6-copy hot id exercises the excess column
    t2 = np.asarray([[1] * 6 + [0, 0]], np.int32)
    c2 = np.asarray(
        pf.build_counts(
            jnp.asarray(t2), jnp.asarray([6], np.int32), H=H,
            groups=groups, chunk=1,
        )
    )
    assert c2[0, 0 * H + 1] == 1 and c2[0, 3 * H + 1] == 1
    assert c2[0, 4 * H + 1] == 2  # (6 - 4)+


def test_needle_cold_side_term_bound():
    """The exact needle-cold side-term keeps the bound valid: random
    tables with a 'needle id' in the cold range, bound computed through
    prefilter_select_score's own arithmetic vs the exact DP."""
    rng = np.random.default_rng(11)
    V, H, T, L, N = 24, 4, 3, 8, 32
    groups = pf.cold_groups(H, V)
    M = 8
    for _ in range(6):
        table = rng.normal(scale=0.7, size=(V, T, 1)).astype(np.float32)
        tokens = rng.integers(0, V, size=(N, L)).astype(np.int32)
        lengths = rng.integers(1, L + 1, size=(N,)).astype(np.int32)
        gaps = AffineGapParams.of(0.2, 0.1, 0.2, 0.1)
        cnt = pf.build_counts(
            jnp.asarray(tokens), jnp.asarray(lengths), H=H, groups=groups,
            chunk=N,
        )
        needle = pf.needle_cold_ids([np.asarray([5, 9, 9, 2])], H)
        out = pf.prefilter_select_score(
            cnt, jnp.asarray(tokens), jnp.zeros((N, L), jnp.int8),
            jnp.zeros((N, L), jnp.int16), jnp.asarray(lengths),
            jnp.arange(N, dtype=jnp.int32), jnp.asarray(table),
            jnp.asarray([T], jnp.int32), jnp.asarray([float(T)]),
            jnp.asarray(needle), gaps,
            jnp.zeros((L + 1,), jnp.float32),
            jnp.zeros((T + 1,), jnp.float32),
            M=M, H=H, n=N, locality="local", general=False, groups=groups,
        )
        scores_c, sid_c, ub_rest = out[0], out[5], float(out[6])
        raw = np.asarray(
            align_scores(
                jnp.asarray(table[:, :, 0][tokens]),
                jnp.asarray(np.maximum(lengths, 1)),
                jnp.full((N,), T, np.int32), gaps, "local",
            )
        )
        kept = set(int(s) for s in np.asarray(sid_c))
        excluded = [i for i in range(N) if i not in kept]
        slack = 1e-3 * max(1.0, abs(ub_rest))
        for i in excluded:
            assert raw[i] <= ub_rest + slack, (i, raw[i], ub_rest)


def test_prefiltered_general_gaps_byte_identical(big_session, monkeypatch):
    """Non-affine (WSB) gap models ride the prefilter too when every
    cost is nonnegative — byte-equality vs the unpruned path."""
    from vectorian_tpu.alignment import ExponentialGapCost

    session, emb, words = big_session
    rng = np.random.default_rng(77)
    queries = [
        " ".join(rng.choice(words[:40], size=int(rng.integers(2, 6))))
        for _ in range(2)
    ]
    gap = ExponentialGapCost(3.0)

    monkeypatch.setenv("VECTORIAN_PREFILTER", "0")
    want = _run_find(session, emb, queries, gap, LocalAlignment, 5, 0.05)

    monkeypatch.setenv("VECTORIAN_PREFILTER", "1")
    monkeypatch.setenv("VECTORIAN_PREFILTER_M", "256")
    monkeypatch.setenv("VECTORIAN_PREFILTER_MIN_N", "1")
    monkeypatch.setenv("VECTORIAN_PREFILTER_H", "32")
    from vectorian_tpu.utils import trace

    trace.start()
    got = _run_find(session, emb, queries, gap, LocalAlignment, 5, 0.05)
    events = [n for n, _ in trace.stop()]
    assert "pf.dispatch" in events, "general-gap prefilter did not engage"
    assert got == want


def test_prefiltered_bidirectional_byte_identical(big_session, monkeypatch):
    """The fused bidirectional path rides the prefilter with ONE shared
    candidate set (reversal permutes needle positions; the bound's
    per-id maxima are permutation-invariant) — byte-equality vs the
    unpruned bidirectional path."""
    session, emb, words = big_session
    rng = np.random.default_rng(91)
    queries = [
        " ".join(rng.choice(words[:40], size=int(rng.integers(2, 6))))
        for _ in range(2)
    ]

    def run():
        p = session.partition("sentence")
        ix = p.index(
            OptimizedSpanSim(
                EmbeddingTokenSim(emb), LocalAlignment(AffineGapCost(0.3, 0.1))
            )
        )
        return [
            [
                (m.slice_id, m.score)
                for m in ix.find(q, n=5, min_score=0.05, bidirectional=True)
            ]
            for q in queries
        ]

    monkeypatch.setenv("VECTORIAN_PREFILTER", "0")
    want = run()
    monkeypatch.setenv("VECTORIAN_PREFILTER", "1")
    monkeypatch.setenv("VECTORIAN_PREFILTER_M", "256")
    monkeypatch.setenv("VECTORIAN_PREFILTER_MIN_N", "1")
    monkeypatch.setenv("VECTORIAN_PREFILTER_H", "32")
    from vectorian_tpu.utils import trace

    trace.start()
    got = run()
    events = [n for n, _ in trace.stop()]
    assert "pf.dispatch" in events, "bidirectional prefilter did not engage"
    assert got == want
