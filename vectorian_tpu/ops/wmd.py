"""Batched Word Mover's / Word Rotator's Distance over packed corpora.

Reference: vectorian/core/cpp/alignment/wmd.h + wrd.h + bow.h.

TPU re-architecture:

* BOW dedup (BOWBuilder::build, bow.h:204-275) becomes a *masked-mass*
  formulation: every slice position keeps its token, but only the first
  occurrence of each token id carries the (count) mass — capacity-equivalent
  to the reference's vocab-level problem and fully vectorizable (O(L^2)
  equality comparisons per slice, batched on the VPU).
* RelaxedSolver (wmd.h:273-417): the per-token greedy heap fill becomes a
  sort-free capacity prefix — the mass available before each target is the
  total capacity of strictly-closer targets, computed from a pairwise
  distance-comparison mask (TPU argsort costs ~10x; the sort path remains
  for long-slice buckets).  Each source token fills capacities in
  ascending-distance order; leftover mass costs the maximum distance 1.0.
  Both directions batched; `symmetric` takes the tighter.
* FullSolver / WRD exact EMD (wmd.h:194-270, wrd.h:62-146): device ranking
  via a PROVABLE upper bound on the exact score (the greedy relaxed
  transport from the lighter-marginal side, see _emd_score_bound), exact
  host EMD rescore (ops/emd_exact.py) of every candidate whose bound can
  still reach the reported top-k — so both the reported scores AND the
  top-k membership match the reference's exhaustive exact-EMD semantics
  (wmd.h:194-270 solves every slice; here the bound proves which slices
  can be skipped).
"""

from __future__ import annotations

import functools
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from vectorian_tpu.utils import trace

from vectorian_tpu.ops.emd_exact import emd_score_batch
from vectorian_tpu.ops.search import NEG_SCORE

MAX_SIMILARITY = 1.0
# absolute score slack covering device-f32 vs host-f64 drift in the
# provable-cut comparisons (greedy reductions over <=128 f32 terms drift
# ~1e-6 relative; near-balanced direction masking adds ~1e-6·mass/flow):
# the slack only ever ADDS candidates to the exact rescore, never drops one
CUT_EPS = 5e-4
# relaxed-WMD rank-vs-report drift guard: device kernels rank in f32 with
# shape-dependent reduction trees (measured drift ~1e-7 on unit-scale
# scores); the reported value is rwmd_score_host's f64 arithmetic.  Pools
# and cut comparisons pad by multiples of this so candidate membership is
# provably complete — the slack only ever widens the host rescore set
RWMD_RANK_EPS = 1e-5


def _pool_from_vector(packed, scores, n: int, min_score: float, eps: float):
    """Tie-complete relaxed-WMD candidate pool over a COMPLETE host score
    vector: every slice within 3*eps of the n-th ranking value (and above
    min_score - eps), in deterministic (score desc, doc, slice) order —
    the vector-path mirror of top_k_exactly_many(slack=3*eps, pool=True)."""
    from vectorian_tpu.ops.search import order_by_score

    cand = np.flatnonzero(scores >= min_score - eps)
    if cand.size == 0:
        return []
    vals = scores[cand].astype(np.float32)
    if cand.size >= n:
        cut = max(
            float(-np.partition(-vals, n - 1)[n - 1]) - 3 * eps,
            min_score - eps,
        )
        keep = vals >= cut
        cand, vals = cand[keep], vals[keep]
    order = order_by_score(packed, cand, vals)
    return [int(c) for c in cand[order]]


def dedup_masses(ids, valid) -> np.ndarray:
    """Host-side: mass per position = count of equal ids at first occurrence,
    0 elsewhere (mirrors BOWBuilder dedup, bow.h:204-275).  ``ids`` is any
    sequence of hashables — (id, tag) tuples key the tagged variant
    (TaggedTokenFactory, bow.h:150-202)."""
    n = len(ids)
    mass = np.zeros((n,), np.float32)
    seen = {}
    for i in range(n):
        if not valid[i]:
            continue
        k = ids[i]
        if k in seen:
            mass[seen[k]] += 1.0
        else:
            seen[k] = i
            mass[i] = 1.0
    return mass


def _device_masses(
    tok: jnp.ndarray, lengths: jnp.ndarray, tag: jnp.ndarray = None,
    keep: jnp.ndarray = None,
) -> jnp.ndarray:
    """[n, L] first-occurrence count masses on device (O(L^2) per slice).
    With ``tag``, identity is (id, tag) — the reference's TaggedTokenFactory
    (bow.h:150-202) selected by similarity_dependency()==TAGS.  ``keep``
    (bool [n, L]) masks doc-filtered positions out of the bag entirely
    (FilteredSlice semantics: the token never enters the BOW)."""
    n, L = tok.shape
    pos = jnp.arange(L, dtype=jnp.int32)
    valid = pos[None, :] < lengths[:, None]  # [n, L]
    if keep is not None:
        valid = valid & keep
    eq = (tok[:, :, None] == tok[:, None, :]) & valid[:, :, None] & valid[:, None, :]
    if tag is not None:
        eq = eq & (tag[:, :, None] == tag[:, None, :])
    counts = jnp.sum(eq, axis=2).astype(jnp.float32)  # [n, L]
    first = jnp.argmax(eq, axis=1) == pos[None, :]  # first occurrence of own id
    return jnp.where(first & valid, counts, 0.0)


def _greedy_fill_cost(w1, D, cap, injective: bool):
    """Relaxed WMD inner loop, batched.

    w1:  [B, n1]    source masses (0 = inactive)
    D:   [B, n1, n2] distances
    cap: [B, n2]    target capacities (0 = inactive)
    Returns total cost [B] = sum_i cost of moving w1[i] into capacities in
    ascending-distance order (or to the argmin target if injective);
    unplaceable mass costs MAX_SIMILARITY.
    """
    D = jnp.where(cap[:, None, :] > 0, D, jnp.inf)  # inactive targets
    if injective:
        d_best = jnp.min(D, axis=2)  # [B, n1]
        d_best = jnp.where(jnp.isfinite(d_best), d_best, MAX_SIMILARITY)
        return jnp.sum(w1 * d_best, axis=1)
    n2 = D.shape[2]
    if n2 <= 128:
        # ascending-distance fill WITHOUT a sort (TPU argsort costs ~10x):
        # the capacity available before target j is the capacity of all
        # targets strictly closer (ties broken by index, matching a stable
        # sort).  O(n2^2) memory — long-slice buckets fall through to the
        # sort path below.
        idx = jnp.arange(n2, dtype=jnp.int32)
        Dk = D[:, :, None, :]  # [B, n1, 1, n2] candidate k
        Dj = D[:, :, :, None]  # [B, n1, n2, 1] target j
        closer = (Dk < Dj) | (
            (Dk == Dj) & (idx[None, None, None, :] < idx[None, None, :, None])
        )
        prefix = jnp.sum(
            closer * cap[:, None, None, :], axis=3
        )  # [B, n1, n2] capacity ahead of j
        moved = jnp.clip(w1[:, :, None] - prefix, 0.0, cap[:, None, :])
    else:
        order = jnp.argsort(D, axis=2)  # ascending, stable
        cap_sorted = jnp.take_along_axis(
            jnp.broadcast_to(cap[:, None, :], D.shape), order, axis=2
        )
        before = jnp.cumsum(cap_sorted, axis=2) - cap_sorted
        moved_sorted = jnp.clip(w1[:, :, None] - before, 0.0, cap_sorted)
        # scatter back to target order so the cost term below is uniform
        inv = jnp.argsort(order, axis=2)
        moved = jnp.take_along_axis(moved_sorted, inv, axis=2)
    Df = jnp.where(jnp.isfinite(D), D, 0.0)
    cost = jnp.sum(moved * Df, axis=2)
    leftover = jnp.maximum(w1 - jnp.sum(moved, axis=2), 0.0)
    return jnp.sum(cost + leftover * MAX_SIMILARITY, axis=1)


def _emd_score_bound(m_t: jnp.ndarray, m_s: jnp.ndarray, Dts: jnp.ndarray):
    """[B] provable upper bound on the exact FullSolver score.

    The exact score is ``1 - cost_real/flow`` (wmd.h:252 via emd_score):
    ``flow = min(sum(m_t), sum(m_s))`` is the real-to-real transported
    mass, and ``cost_real`` solves the LP whose LIGHTER side's marginals
    are exact while the heavier side's act as capacities (the emd_hat sink
    absorbs the imbalance at a constant cost, so the penalty never affects
    the real flows).  The greedy relaxed fill from the lighter side
    (per-source independent ascending-distance assignment — the exact RWMD
    kernel, wmd.h:339-376) is feasible-dominated by every real flow, hence
    ``greedy <= cost_real`` and ``1 - greedy/flow >= exact score``.

    Near-balanced masses (|sum difference| <= tol) take the max of both
    directions (tighter, like symmetric RWMD); the direction validity
    error this introduces is <= tol·max(D)/flow, absorbed by CUT_EPS at
    the cut comparisons.

    m_t: [B, T] query masses; m_s: [B, L] slice masses; Dts: [B, T, L].
    """
    st = jnp.sum(m_t, axis=1)
    ss = jnp.sum(m_s, axis=1)
    flow = jnp.minimum(st, ss)
    tol = 1e-6 * jnp.maximum(st, ss)
    g_ts = _greedy_fill_cost(m_t, Dts, m_s, False)
    g_st = _greedy_fill_cost(m_s, jnp.swapaxes(Dts, 1, 2), m_t, False)
    neg = jnp.asarray(-jnp.inf, g_ts.dtype)
    g = jnp.maximum(
        jnp.where(st <= ss + tol, g_ts, neg),
        jnp.where(ss <= st + tol, g_st, neg),
    )
    return 1.0 - g / jnp.maximum(flow, 1e-9)


@functools.partial(
    jax.jit,
    static_argnames=(
        "plan", "injective", "symmetric", "normalize_bow", "chunk",
        "unique_masses", "with_tags", "with_filter",
    ),
)
def _bucket_rwmd_scores(
    plan: tuple,
    token_ids: jnp.ndarray,  # [N, L] i32, padded
    tok_sorted: jnp.ndarray,  # [n_chunks, chunk*L]
    sort_inv: jnp.ndarray,  # [n_chunks, chunk*L]
    pos_ids: jnp.ndarray,  # [N, L] i8
    tag_ids: jnp.ndarray,  # [N, L] i16
    lengths: jnp.ndarray,  # [N]
    static_sims: tuple,
    static_mags: tuple,
    ctx_chunks: tuple,
    ctx_queries: tuple,
    mixed_weights: tuple,
    mass_t: jnp.ndarray,  # [T] deduped query masses (counts)
    len_t: jnp.ndarray,  # scalar i32 actual token count of query
    max_score_t: jnp.ndarray,  # scalar f32 max_sum_of_similarities (= len_t
    # untagged; = sum of tag weights when tag-weighted, slice/static.h:285)
    tw_weights: jnp.ndarray,  # [T] f32 (unused unless with_tags)
    tw_pos_t: jnp.ndarray,  # [T] i8
    tw_penalty: jnp.ndarray,  # scalar f32
    tw_threshold: jnp.ndarray,  # scalar f32
    df_pos_ex: jnp.ndarray,  # [n_pos] bool (unused unless with_filter)
    df_tag_ex: jnp.ndarray,  # [n_tags] bool
    df_tok_ex: jnp.ndarray,  # [V] bool
    injective: bool,
    symmetric: bool,
    normalize_bow: bool,
    chunk: int,
    unique_masses: bool = False,
    with_tags: bool = False,
    with_filter: bool = False,
):
    from vectorian_tpu.ops.search import _apply_tag_weights
    from vectorian_tpu.ops.simmatrix import eval_plan_chunk

    N, L = token_ids.shape
    T = mass_t.shape[0]
    n_chunks = N // chunk

    def one_chunk(args):
        tok, ts, inv, pos, tag, ln, ctx = args
        p = jnp.arange(L, dtype=jnp.int32)
        valid = p[None, :] < ln[:, None]  # [c, L]
        keep = None
        if with_filter:
            # doc-side token filter = FilteredSlice (slice/static.h:104-184):
            # excluded tokens never enter the BOW and the effective slice
            # length shrinks accordingly
            keep = valid & ~(
                df_pos_ex[jnp.maximum(pos, 0).astype(jnp.int32)]
                | df_tag_ex[jnp.maximum(tag, 0).astype(jnp.int32)]
                | df_tok_ex[jnp.maximum(tok, 0)]
            )
        if unique_masses:
            # contextual: every position is its own BOW entry (reference
            # UniqueTokensBOWBuilder, alignment/bow.h:278-334)
            mass_s = (keep if keep is not None else valid).astype(jnp.float32)
        elif with_tags:
            mass_s = _device_masses(tok, ln, tag, keep=keep)  # (id, tag)
        else:
            mass_s = _device_masses(tok, ln, keep=keep)  # [c, L] counts
        eff_len = (
            jnp.sum(keep, axis=1) if keep is not None else ln
        ).astype(jnp.float32)
        w_sum_s = jnp.maximum(eff_len, 1e-9)
        w_sum_t = jnp.maximum(len_t.astype(jnp.float32), 1e-9)
        if normalize_bow:
            m_s = mass_s / w_sum_s[:, None]
            m_t = jnp.broadcast_to(mass_t[None, :] / w_sum_t, (tok.shape[0], T))
        else:
            m_s = mass_s
            m_t = jnp.broadcast_to(mass_t[None, :], (tok.shape[0], T))

        S = eval_plan_chunk(
            plan, tok, static_sims, static_mags, ctx, ctx_queries,
            mixed_weights, sorted_gather=(ts, inv),
        )["similarity"]  # [c, L, T]
        if with_tags:
            S = _apply_tag_weights(
                S, pos, tw_weights, tw_pos_t, tw_penalty, tw_threshold
            )
        Dst = jnp.maximum(MAX_SIMILARITY - S, 0.0)  # [c, L, T] s x t
        Dts = jnp.swapaxes(Dst, 1, 2)  # [c, T, L]

        # direction 0: t -> s (reference computes this first, wmd.h:302)
        acc0 = _greedy_fill_cost(m_t, Dts, m_s, injective)
        if not normalize_bow:
            acc0 = acc0 / w_sum_t
        if symmetric:
            acc1 = _greedy_fill_cost(m_s, Dst, m_t, injective)
            if not normalize_bow:
                acc1 = acc1 / w_sum_s
            cost = jnp.maximum(acc0, acc1)  # tighter bound (wmd.h:383-390)
        else:
            cost = acc0
        # max_cost = p_slice.max_sum_of_similarities() in bow mode
        # (wmd.h:411-412): len_t untagged, the tag-weight sum when weighted
        max_cost = 1.0 if normalize_bow else max_score_t
        score = (max_cost - cost) / max_cost  # cost_to_score, wmd.h:139-141
        return jnp.where(eff_len > 0, score, NEG_SCORE)

    xs = (
        token_ids.reshape(n_chunks, chunk, L),
        tok_sorted,
        sort_inv,
        pos_ids.reshape(n_chunks, chunk, L),
        tag_ids.reshape(n_chunks, chunk, L),
        lengths.reshape(n_chunks, chunk),
        tuple(c.reshape(n_chunks, chunk, L, c.shape[-1]) for c in ctx_chunks),
    )
    return jax.lax.map(one_chunk, xs).reshape(N)


@functools.partial(jax.jit, static_argnames=("V", "with_tags"))
def _pairs_sims_static(tok, pos, qidx, sim_multi, tw_w, tw_p, tw_pen, tw_thr,
                       V: int, with_tags: bool):
    """(S_weighted [p, L, Tmax], S_unmodified) for (slice, query) candidate
    PAIRS against the stacked [V, Tmax, Q] static table — the whole serving
    batch's host-rescore similarities in ONE dispatch + ONE fetch.  A
    per-query batch_slice_similarity fetch costs a tunnel round trip per
    query and per fetched array (a Q=64 batch measured ~2.6 s in host
    reads alone).  Bit-equal to the per-query path: the stacked table is a
    pure pad/copy of each query's plan matrix, the pair gather selects
    exact elements, and the tag weighting applies search._apply_tag_weights'
    elementwise formula with the pair's own query column.
    tok/pos: [p, L] host-gathered rows (works identically in paged mode —
    device bucket keys are never touched); qidx: [p] i32; tw_w/tw_p:
    [Tmax, Q]; tw_pen/tw_thr: [Q]."""
    Tmax, Q = sim_multi.shape[1], sim_multi.shape[2]
    # [Q*V, Tmax] view so each pair is one row-gather with a fused offset
    simQ = jnp.moveaxis(sim_multi, 2, 0).reshape(Q * V, Tmax)
    S = simQ[qidx[:, None] * V + tok]  # [p, L, Tmax]
    Su = S
    if with_tags:
        w = tw_w.T[qidx][:, None, :] * jnp.where(
            pos[:, :, None] == tw_p.T[qidx][:, None, :],
            1.0,
            1.0 - tw_pen[qidx][:, None, None],
        )
        Sw = S * w
        S = jnp.where(Sw > tw_thr[qidx][:, None, None], Sw, 0.0)
    return S, Su


def _tag_weights_multi(S, posT, tw_w, tw_p, tw_pen, tw_thr):
    """Per-query tag weighting for the stacked [L, c, T, Q] similarity
    layout — the transport analogue of search._apply_tag_weights, same
    elementwise formula (reference TagWeightedSlice, slice/static.h:186-288)
    so single-query and batched kernels report bit-equal scores.
    posT: [L, c] i8; tw_w/tw_p: [T, Q]; tw_pen/tw_thr: [Q]."""
    w = tw_w[None, None, :, :] * jnp.where(
        posT[:, :, None, None] == tw_p[None, None, :, :],
        1.0,
        1.0 - tw_pen[None, None, None, :],
    )
    Sw = S * w
    return jnp.where(Sw > tw_thr[None, None, None, :], Sw, 0.0)


def _multi_filter_keep(tok, posT, tagT, valid, df_pos_ex, df_tag_ex, df_tok_ex):
    """[c, L] doc-filter keep mask (FilteredSlice, slice/static.h:104-184):
    excluded tokens never enter the BOW / carry mass."""
    return valid & ~(
        df_pos_ex[jnp.maximum(posT.T, 0).astype(jnp.int32)]
        | df_tag_ex[jnp.maximum(tagT.T, 0).astype(jnp.int32)]
        | df_tok_ex[jnp.maximum(tok, 0)]
    )


def _rwmd_chunk_scores_multi(
    tokT, ln, posT, tagT, sim_multi, mass_t, len_t, max_score_t,
    tw_w, tw_p, tw_pen, tw_thr, df_pos_ex, df_tag_ex, df_tok_ex,
    injective: bool, symmetric: bool, normalize_bow: bool,
    with_tags: bool, with_filter: bool,
    S=None, unique: bool = False,
):
    """[c, Q] relaxed-WMD scores for one [L, c] token chunk — shared by
    the single-chip batch kernel and the mesh shard kernel (the two paths
    must stay byte-equal).  Mirrors the single-query _bucket_rwmd_scores
    semantics: tag-weighted similarity + (id, tag) BOW identity, filtered
    positions carry no mass and shrink the effective length.

    ``S``: optional precomputed [L, c, T, Q] similarity (the stacked
    plan-tree evaluation of the contextual/mixed batch) — ``sim_multi``
    is then unused; ``unique``: position-unique BOW entries (a contextual
    operand is present, reference UniqueTokensBOWBuilder,
    alignment/bow.h:278-334)."""
    L, c = tokT.shape
    if S is None:
        T, Q = sim_multi.shape[1], sim_multi.shape[2]
        S = sim_multi[tokT]  # [L, c, T, Q]
    else:
        T, Q = S.shape[2], S.shape[3]
    if with_tags:
        S = _tag_weights_multi(S, posT, tw_w, tw_p, tw_pen, tw_thr)
    tok = tokT.T  # [c, L]
    p = jnp.arange(L, dtype=jnp.int32)
    valid = p[None, :] < ln[:, None]  # [c, L]
    keep = None
    if with_filter:
        keep = _multi_filter_keep(
            tok, posT, tagT, valid, df_pos_ex, df_tag_ex, df_tok_ex
        )
    if unique:
        mass_s = (keep if keep is not None else valid).astype(jnp.float32)
    elif with_tags:
        mass_s = _device_masses(tok, ln, tagT.T, keep=keep)  # (id, tag)
    else:
        mass_s = _device_masses(tok, ln, keep=keep)  # [c, L] counts
    eff_len = (
        jnp.sum(keep, axis=1) if keep is not None else ln
    ).astype(jnp.float32)
    w_sum_s = jnp.maximum(eff_len, 1e-9)  # [c]
    w_sum_t = jnp.maximum(len_t.astype(jnp.float32), 1e-9)  # [Q]
    if normalize_bow:
        m_s = mass_s / w_sum_s[:, None]
        m_t = mass_t / w_sum_t[None, :]
    else:
        m_s = mass_s
        m_t = mass_t
    D = jnp.maximum(MAX_SIMILARITY - S, 0.0)  # [L, c, T, Q]
    Dts = jnp.transpose(D, (1, 3, 2, 0)).reshape(c * Q, T, L)
    m_t_b = jnp.tile(m_t.T[None], (c, 1, 1)).reshape(c * Q, T)
    m_s_b = jnp.repeat(m_s, Q, axis=0)  # [c*Q, L], b = ci*Q + q
    acc0 = _greedy_fill_cost(m_t_b, Dts, m_s_b, injective)  # [c*Q]
    if not normalize_bow:
        acc0 = acc0 / jnp.tile(w_sum_t, c)
    if symmetric:
        Dst = jnp.transpose(D, (1, 3, 0, 2)).reshape(c * Q, L, T)
        acc1 = _greedy_fill_cost(m_s_b, Dst, m_t_b, injective)
        if not normalize_bow:
            acc1 = acc1 / jnp.repeat(w_sum_s, Q)
        cost = jnp.maximum(acc0, acc1)
    else:
        cost = acc0
    # cost_to_score (wmd.h:139-141): max_cost = 1 (nbow) or
    # max_sum_of_similarities (bow: len_t untagged, tag-weight sum when
    # tag-weighted — wmd.h:411-412)
    max_cost = (
        1.0
        if normalize_bow
        else jnp.tile(jnp.maximum(max_score_t, 1e-9), c)
    )
    score = ((max_cost - cost) / max_cost).reshape(c, Q)
    return jnp.where(eff_len[:, None] > 0, score, NEG_SCORE)


@functools.partial(
    jax.jit,
    static_argnames=(
        "injective", "symmetric", "normalize_bow", "chunk", "n_queries",
        "with_tags", "with_filter", "with_boost",
    ),
)
def _bucket_rwmd_scores_multi(
    token_ids: jnp.ndarray,  # [N, L] i32
    lengths: jnp.ndarray,  # [N] i32
    pos_ids: jnp.ndarray,  # [N, L] i8
    tag_ids: jnp.ndarray,  # [N, L] i16
    sim_multi: jnp.ndarray,  # [V, T, Q] stacked query similarity tables
    mass_t: jnp.ndarray,  # [T, Q] per-query deduped masses (0-padded)
    len_t: jnp.ndarray,  # [Q] i32 real token counts
    max_score_t: jnp.ndarray,  # [Q] f32 max_sum_of_similarities
    boost: jnp.ndarray,  # [N, Q] per-slice boosts (unused unless with_boost)
    tw_w: jnp.ndarray,  # [T, Q] f32 (unused unless with_tags)
    tw_p: jnp.ndarray,  # [T, Q] i8
    tw_pen: jnp.ndarray,  # [Q] f32
    tw_thr: jnp.ndarray,  # [Q] f32
    df_pos_ex: jnp.ndarray,  # [n_pos] bool (unused unless with_filter)
    df_tag_ex: jnp.ndarray,  # [n_tags] bool
    df_tok_ex: jnp.ndarray,  # [V] bool
    injective: bool,
    symmetric: bool,
    normalize_bow: bool,
    chunk: int,
    n_queries: int,
    with_tags: bool = False,
    with_filter: bool = False,
    with_boost: bool = False,
):
    """[N, Q] relaxed-WMD scores — Q static queries share one corpus pass
    (the vocab gather, like the alignment serving batch).  Tag weighting,
    doc-side filters and per-slice boosts ride the same kernel (reference
    Booster, metric/alignment.h:598 — boost multiplies the exact scores,
    so ranking and reporting both carry it)."""
    N, L = token_ids.shape
    n_chunks = N // chunk

    def one_chunk(args):
        tokT, ln, posT, tagT = args  # [L, c], [c], [L, c], [L, c]
        return _rwmd_chunk_scores_multi(
            tokT, ln, posT, tagT, sim_multi, mass_t, len_t, max_score_t,
            tw_w, tw_p, tw_pen, tw_thr, df_pos_ex, df_tag_ex, df_tok_ex,
            injective, symmetric, normalize_bow, with_tags, with_filter,
        )

    tokens_T = jnp.swapaxes(token_ids.reshape(n_chunks, chunk, L), 1, 2)
    pos_T = jnp.swapaxes(pos_ids.reshape(n_chunks, chunk, L), 1, 2)
    tag_T = jnp.swapaxes(tag_ids.reshape(n_chunks, chunk, L), 1, 2)
    xs = (tokens_T, lengths.reshape(n_chunks, chunk), pos_T, tag_T)
    scores = jax.lax.map(one_chunk, xs).reshape(N, n_queries)
    if with_boost:
        # same arithmetic as find()'s host-side boosted relaxed path:
        # multiply valid scores, keep NEG_SCORE sentinels intact
        scores = jnp.where(
            scores > NEG_SCORE * 0.5, scores * boost, NEG_SCORE
        )
    return scores


@functools.partial(
    jax.jit,
    static_argnames=(
        "use_magnitudes", "normalize_mass", "chunk", "n_queries",
        "with_tags", "with_filter", "with_boost",
    ),
)
def _bucket_emd_scores_multi(
    token_ids: jnp.ndarray,  # [N, L] i32
    lengths: jnp.ndarray,  # [N] i32
    pos_ids: jnp.ndarray,  # [N, L] i8
    tag_ids: jnp.ndarray,  # [N, L] i16
    sim_multi: jnp.ndarray,  # [V, T, Q] stacked query similarity tables
    mags_vocab: jnp.ndarray,  # [V] static row magnitudes (WRD masses)
    mass_t: jnp.ndarray,  # [T, Q] per-query masses (counts or magnitudes)
    boost: jnp.ndarray,  # [N, Q] per-slice boosts (unused unless with_boost)
    tw_w: jnp.ndarray,  # [T, Q] f32 (unused unless with_tags)
    tw_p: jnp.ndarray,  # [T, Q] i8
    tw_pen: jnp.ndarray,  # [Q] f32
    tw_thr: jnp.ndarray,  # [Q] f32
    df_pos_ex: jnp.ndarray,  # [n_pos] bool (unused unless with_filter)
    df_tag_ex: jnp.ndarray,  # [n_tags] bool
    df_tok_ex: jnp.ndarray,  # [V] bool
    use_magnitudes: bool,
    normalize_mass: bool,
    chunk: int,
    n_queries: int,
    with_tags: bool = False,
    with_filter: bool = False,
    with_boost: bool = False,
):
    """[N, Q] full-WMD / WRD provable score BOUNDS — Q static queries share
    one corpus pass (gather amortizes like the relaxed batch; the exact EMD
    rescore on host stays per query, driven by the bound's provable cut).
    Boosts multiply the bounds (bound*b >= exact*b for b >= 0, so the cut
    stays provable); tag weighting and doc filters mirror the single-query
    kernel."""
    N, L = token_ids.shape
    n_chunks = N // chunk

    def one_chunk(args):
        tokT, ln, posT, tagT = args  # [L, c], [c], [L, c], [L, c]
        return _emd_chunk_scores_multi(
            tokT, ln, posT, tagT, sim_multi, mags_vocab, mass_t,
            tw_w, tw_p, tw_pen, tw_thr, df_pos_ex, df_tag_ex, df_tok_ex,
            use_magnitudes, normalize_mass, with_tags, with_filter,
        )

    tokens_T = jnp.swapaxes(token_ids.reshape(n_chunks, chunk, L), 1, 2)
    pos_T = jnp.swapaxes(pos_ids.reshape(n_chunks, chunk, L), 1, 2)
    tag_T = jnp.swapaxes(tag_ids.reshape(n_chunks, chunk, L), 1, 2)
    xs = (tokens_T, lengths.reshape(n_chunks, chunk), pos_T, tag_T)
    scores = jax.lax.map(one_chunk, xs).reshape(N, n_queries)
    if with_boost:
        scores = jnp.where(
            scores > NEG_SCORE * 0.5, scores * boost, NEG_SCORE
        )
    return scores


def _emd_chunk_scores_multi(
    tokT, ln, posT, tagT, sim_multi, mags_vocab, mass_t,
    tw_w, tw_p, tw_pen, tw_thr, df_pos_ex, df_tag_ex, df_tok_ex,
    use_magnitudes: bool, normalize_mass: bool,
    with_tags: bool = False, with_filter: bool = False,
    S=None, unique: bool = False, mags_s=None,
):
    """[c, Q] exact-EMD score upper bounds for one [L, c] token chunk —
    shared by the single-chip chunk loop and the mesh shard kernel.  The
    masses replicate the host rescore's exactly (same normalization flag,
    same (id, tag) BOW identity, same filter exclusions), so
    _emd_score_bound's guarantee carries to the reported scores.

    ``S``: optional precomputed [L, c, T, Q] similarity (the stacked
    plan-tree evaluation of the contextual/mixed batch); ``unique``:
    position-unique BOW entries (contextual operand present); ``mags_s``:
    [c, L] doc-side WRD masses when the plan is contextual (per-position
    vector norms instead of vocab-row magnitudes)."""
    L = tokT.shape[0]
    c = ln.shape[0]
    if S is None:
        T, Q = sim_multi.shape[1], sim_multi.shape[2]
        S = sim_multi[tokT].astype(jnp.float32)  # [L, c, T, Q]
    else:
        T, Q = S.shape[2], S.shape[3]
        S = S.astype(jnp.float32)
    if with_tags:
        S = _tag_weights_multi(S, posT, tw_w, tw_p, tw_pen, tw_thr)
    tok = tokT.T  # [c, L]
    p = jnp.arange(L, dtype=jnp.int32)
    valid = p[None, :] < ln[:, None]  # [c, L]
    keep = None
    if with_filter:
        keep = _multi_filter_keep(
            tok, posT, tagT, valid, df_pos_ex, df_tag_ex, df_tok_ex
        )
        valid = keep
    if use_magnitudes:
        # WRD: every position its own entry, mass = |v| (wrd.h:62-146)
        m_s = jnp.where(
            valid, mags_s if mags_s is not None else mags_vocab[tok], 0.0
        )  # [c, L]
    elif unique:
        # contextual: every position its own BOW entry (reference
        # UniqueTokensBOWBuilder, alignment/bow.h:278-334)
        m_s = valid.astype(jnp.float32)
    elif with_tags:
        m_s = _device_masses(tok, ln, tagT.T, keep=keep)  # (id, tag)
    else:
        m_s = _device_masses(tok, ln, keep=keep)  # dedup by vocab id
    m_t = jnp.tile(mass_t.T[None], (c, 1, 1)).reshape(c * Q, T)
    m_s_b = jnp.repeat(m_s, Q, axis=0)  # [c*Q, L]
    if normalize_mass:
        m_s_b = m_s_b / jnp.maximum(
            jnp.sum(m_s_b, axis=1, keepdims=True), 1e-9
        )
        m_t = m_t / jnp.maximum(jnp.sum(m_t, axis=1, keepdims=True), 1e-9)
    D = jnp.maximum(MAX_SIMILARITY - S, 0.0)  # [L, c, T, Q]
    Dts = jnp.transpose(D, (1, 3, 2, 0)).reshape(c * Q, T, L)
    score = _emd_score_bound(m_t, m_s_b, Dts)
    score = score.reshape(c, Q)
    ok = jnp.sum(valid, axis=1) > 0  # [c]
    return jnp.where(ok[:, None], score, NEG_SCORE)


@functools.partial(
    jax.jit,
    static_argnames=(
        "plan", "injective", "symmetric", "normalize_bow", "chunk",
        "n_queries", "unique_masses", "with_tags", "with_filter",
        "with_boost", "use_sorted",
    ),
)
def _bucket_rwmd_scores_multi_plan(
    plan: tuple,
    token_ids: jnp.ndarray,  # [N, L] i32
    tok_sorted: jnp.ndarray,  # [n_chunks, chunk*L] ([n_chunks, 1] unused)
    sort_inv: jnp.ndarray,
    pos_ids: jnp.ndarray,  # [N, L] i8
    tag_ids: jnp.ndarray,  # [N, L] i16
    lengths: jnp.ndarray,  # [N]
    static_sims: tuple,  # k -> [V, Tpad*Q] stacked (q-minor)
    static_mags: tuple,
    ctx_chunks: tuple,  # k -> [N, L, d] bucket stores
    ctx_queries: tuple,  # k -> dicts of [Tpad*Q, ...] stacked query vectors
    mixed_weights: tuple,
    mass_t: jnp.ndarray,  # [Tpad, Q] per-query masses (0-padded)
    len_t: jnp.ndarray,  # [Q] i32 real token counts
    max_score_t: jnp.ndarray,  # [Q] f32 max_sum_of_similarities
    boost: jnp.ndarray,  # [N, Q] (unused unless with_boost)
    tw_w: jnp.ndarray,  # [Tpad, Q] f32 (unused unless with_tags)
    tw_p: jnp.ndarray,  # [Tpad, Q] i8
    tw_pen: jnp.ndarray,  # [Q] f32
    tw_thr: jnp.ndarray,  # [Q] f32
    df_pos_ex: jnp.ndarray,  # [n_pos] bool (unused unless with_filter)
    df_tag_ex: jnp.ndarray,
    df_tok_ex: jnp.ndarray,
    injective: bool,
    symmetric: bool,
    normalize_bow: bool,
    chunk: int,
    n_queries: int,
    unique_masses: bool = True,
    with_tags: bool = False,
    with_filter: bool = False,
    with_boost: bool = False,
    use_sorted: bool = True,
):
    """[N, Q] relaxed-WMD scores for Q CONTEXTUAL / mixed-tree queries in
    one corpus pass: every leaf evaluates against the stacked query axis
    (static [V, Tpad*Q] tables / [Tpad*Q, d] contextual query matrices,
    search.stack_tree_plans), then the [L, c, T, Q] similarity feeds the
    SAME transport tail as the static batch kernel — the reference serves
    every metric uniformly through its document ThreadPool
    (index.py:530-560).  ``use_sorted``: the pack-time sorted gather
    stream only tiles when chunk == the bucket's pack chunk."""
    from vectorian_tpu.ops.simmatrix import eval_plan_chunk

    N, L = token_ids.shape
    Q = n_queries
    n_chunks = N // chunk

    def one_chunk(args):
        tok, ts, inv, pos, tag, ln, ctx = args
        c = tok.shape[0]
        out = eval_plan_chunk(
            plan, tok, static_sims, static_mags, ctx, ctx_queries,
            mixed_weights,
            sorted_gather=(ts, inv) if use_sorted else None,
        )
        S = out["similarity"]  # [c, L, Tpad*Q]
        T = S.shape[-1] // Q
        S = jnp.transpose(S.reshape(c, L, T, Q), (1, 0, 2, 3))  # [L,c,T,Q]
        return _rwmd_chunk_scores_multi(
            jnp.swapaxes(tok, 0, 1), ln, jnp.swapaxes(pos, 0, 1),
            jnp.swapaxes(tag, 0, 1), None, mass_t, len_t, max_score_t,
            tw_w, tw_p, tw_pen, tw_thr, df_pos_ex, df_tag_ex, df_tok_ex,
            injective, symmetric, normalize_bow, with_tags, with_filter,
            S=S, unique=unique_masses,
        )

    xs = (
        token_ids.reshape(n_chunks, chunk, L),
        tok_sorted,
        sort_inv,
        pos_ids.reshape(n_chunks, chunk, L),
        tag_ids.reshape(n_chunks, chunk, L),
        lengths.reshape(n_chunks, chunk),
        tuple(c.reshape(n_chunks, chunk, L, c.shape[-1]) for c in ctx_chunks),
    )
    scores = jax.lax.map(one_chunk, xs).reshape(N, Q)
    if with_boost:
        scores = jnp.where(
            scores > NEG_SCORE * 0.5, scores * boost, NEG_SCORE
        )
    return scores


@functools.partial(
    jax.jit,
    static_argnames=(
        "plan", "use_magnitudes", "normalize_mass", "chunk", "n_queries",
        "unique_masses", "with_tags", "with_filter", "with_boost",
        "use_sorted",
    ),
)
def _bucket_emd_scores_multi_plan(
    plan: tuple,
    token_ids: jnp.ndarray,  # [N, L] i32
    tok_sorted: jnp.ndarray,  # [n_chunks, chunk*L] ([n_chunks, 1] unused)
    sort_inv: jnp.ndarray,
    pos_ids: jnp.ndarray,  # [N, L] i8
    tag_ids: jnp.ndarray,  # [N, L] i16
    lengths: jnp.ndarray,  # [N]
    static_sims: tuple,  # k -> [V, Tpad*Q] stacked (q-minor)
    static_mags: tuple,
    ctx_chunks: tuple,  # k -> [N, L, d] bucket stores
    ctx_queries: tuple,  # k -> dicts of [Tpad*Q, ...] stacked query vectors
    mixed_weights: tuple,
    mass_t: jnp.ndarray,  # [Tpad, Q] per-query masses (counts or magnitudes)
    boost: jnp.ndarray,  # [N, Q] (unused unless with_boost)
    tw_w: jnp.ndarray,  # [Tpad, Q] f32 (unused unless with_tags)
    tw_p: jnp.ndarray,  # [Tpad, Q] i8
    tw_pen: jnp.ndarray,  # [Q] f32
    tw_thr: jnp.ndarray,  # [Q] f32
    df_pos_ex: jnp.ndarray,  # [n_pos] bool (unused unless with_filter)
    df_tag_ex: jnp.ndarray,
    df_tok_ex: jnp.ndarray,
    use_magnitudes: bool,
    normalize_mass: bool,
    chunk: int,
    n_queries: int,
    unique_masses: bool = True,
    with_tags: bool = False,
    with_filter: bool = False,
    with_boost: bool = False,
    use_sorted: bool = True,
):
    """[N, Q] full-WMD / WRD provable score BOUNDS for Q contextual /
    mixed-tree queries sharing one corpus pass (stacked per-leaf query
    axes); WRD doc-side masses come from eval_plan_chunk's per-position
    magnitudes — exactly the single-query kernel's arithmetic, so batch
    and find() rank identically."""
    from vectorian_tpu.ops.simmatrix import eval_plan_chunk

    N, L = token_ids.shape
    Q = n_queries
    n_chunks = N // chunk

    def one_chunk(args):
        tok, ts, inv, pos, tag, ln, ctx = args
        c = tok.shape[0]
        out = eval_plan_chunk(
            plan, tok, static_sims, static_mags, ctx, ctx_queries,
            mixed_weights, needs_magnitudes=use_magnitudes,
            sorted_gather=(ts, inv) if use_sorted else None,
        )
        S = out["similarity"]  # [c, L, Tpad*Q]
        T = S.shape[-1] // Q
        S = jnp.transpose(S.reshape(c, L, T, Q), (1, 0, 2, 3))  # [L,c,T,Q]
        return _emd_chunk_scores_multi(
            jnp.swapaxes(tok, 0, 1), ln, jnp.swapaxes(pos, 0, 1),
            jnp.swapaxes(tag, 0, 1), None, jnp.zeros((1,), jnp.float32),
            mass_t,
            tw_w, tw_p, tw_pen, tw_thr, df_pos_ex, df_tag_ex, df_tok_ex,
            use_magnitudes, normalize_mass, with_tags, with_filter,
            S=S, unique=unique_masses, mags_s=out.get("magnitudes_s"),
        )

    xs = (
        token_ids.reshape(n_chunks, chunk, L),
        tok_sorted,
        sort_inv,
        pos_ids.reshape(n_chunks, chunk, L),
        tag_ids.reshape(n_chunks, chunk, L),
        lengths.reshape(n_chunks, chunk),
        tuple(c.reshape(n_chunks, chunk, L, c.shape[-1]) for c in ctx_chunks),
    )
    scores = jax.lax.map(one_chunk, xs).reshape(N, Q)
    if with_boost:
        scores = jnp.where(
            scores > NEG_SCORE * 0.5, scores * boost, NEG_SCORE
        )
    return scores


@functools.partial(
    jax.jit,
    static_argnames=(
        "plan", "use_magnitudes", "normalize_mass", "chunk",
        "unique_masses", "with_tags", "with_filter",
    ),
)
def _bucket_emd_scores(
    plan: tuple,
    token_ids: jnp.ndarray,  # [N, L]
    tok_sorted: jnp.ndarray,  # [n_chunks, chunk*L]
    sort_inv: jnp.ndarray,  # [n_chunks, chunk*L]
    pos_ids: jnp.ndarray,  # [N, L] i8
    tag_ids: jnp.ndarray,  # [N, L] i16
    lengths: jnp.ndarray,  # [N]
    static_sims: tuple,
    static_mags: tuple,
    ctx_chunks: tuple,
    ctx_queries: tuple,
    mixed_weights: tuple,
    mass_t: jnp.ndarray,  # [T] query masses (counts or magnitudes)
    tw_weights: jnp.ndarray,  # [T] f32 (unused unless with_tags)
    tw_pos_t: jnp.ndarray,  # [T] i8
    tw_penalty: jnp.ndarray,  # scalar f32
    tw_threshold: jnp.ndarray,  # scalar f32
    df_pos_ex: jnp.ndarray,  # [n_pos] bool (unused unless with_filter)
    df_tag_ex: jnp.ndarray,  # [n_tags] bool
    df_tok_ex: jnp.ndarray,  # [V] bool
    use_magnitudes: bool,
    normalize_mass: bool,
    chunk: int,
    unique_masses: bool = False,
    with_tags: bool = False,
    with_filter: bool = False,
):
    """Full WMD / WRD device ranking via the provable exact-score upper
    bound (_emd_score_bound); the exact host EMD rescore, driven by the
    bound's cut, owns the reported scores AND the top-k membership."""
    from vectorian_tpu.ops.search import _apply_tag_weights
    from vectorian_tpu.ops.simmatrix import eval_plan_chunk

    N, L = token_ids.shape
    T = mass_t.shape[0]
    n_chunks = N // chunk

    def one_chunk(args):
        tok, ts, inv, pos, tag, ln, ctx = args
        out = eval_plan_chunk(
            plan, tok, static_sims, static_mags, ctx, ctx_queries,
            mixed_weights, needs_magnitudes=use_magnitudes,
            sorted_gather=(ts, inv),
        )
        S = out["similarity"]  # [c, L, T]
        if with_tags:
            S = _apply_tag_weights(
                S, pos, tw_weights, tw_pos_t, tw_penalty, tw_threshold
            )
        p = jnp.arange(L, dtype=jnp.int32)
        valid = p[None, :] < ln[:, None]
        keep = None
        if with_filter:
            # FilteredSlice semantics (slice/static.h:104-184): excluded
            # tokens never enter the BOW / carry mass
            keep = valid & ~(
                df_pos_ex[jnp.maximum(pos, 0).astype(jnp.int32)]
                | df_tag_ex[jnp.maximum(tag, 0).astype(jnp.int32)]
                | df_tok_ex[jnp.maximum(tok, 0)]
            )
            valid = keep
        if use_magnitudes:
            # WRD: every position is its own entry, mass = |v| (wrd.h:62-146)
            m_s = jnp.where(valid, out["magnitudes_s"], 0.0)
        elif unique_masses:
            m_s = valid.astype(jnp.float32)
        elif with_tags:
            m_s = _device_masses(tok, ln, tag, keep=keep)
        else:
            m_s = _device_masses(tok, ln, keep=keep)
        m_t = jnp.broadcast_to(mass_t[None, :], (tok.shape[0], T))
        if normalize_mass:
            m_s = m_s / jnp.maximum(jnp.sum(m_s, axis=1, keepdims=True), 1e-9)
            m_t = m_t / jnp.maximum(jnp.sum(m_t, axis=1, keepdims=True), 1e-9)
        D = jnp.maximum(MAX_SIMILARITY - jnp.swapaxes(S, 1, 2), 0.0)  # [c, T, L]
        score = _emd_score_bound(m_t, m_s, D)
        ok = jnp.sum(valid, axis=1) > 0
        return jnp.where(ok, score, NEG_SCORE)

    xs = (
        token_ids.reshape(n_chunks, chunk, L),
        tok_sorted,
        sort_inv,
        pos_ids.reshape(n_chunks, chunk, L),
        tag_ids.reshape(n_chunks, chunk, L),
        lengths.reshape(n_chunks, chunk),
        tuple(c.reshape(n_chunks, chunk, L, c.shape[-1]) for c in ctx_chunks),
    )
    return jax.lax.map(one_chunk, xs).reshape(N)


def _sinkhorn_dual_score_ub(specs, iters: int = 30, reg: float = 0.02):
    """Provable per-candidate upper bound on the exact EMD score for
    BALANCED problems — a cheap vectorized pre-filter for the consume
    phase's exact solves.

    Any LP-dual-feasible (u, v) (u_i + v_j <= D_ij) lower-bounds the
    optimal transport cost; u comes from a few log-domain Sinkhorn
    iterations (quality only affects tightness, never validity) and v is
    projected to exact feasibility (v_j = min_i D_ij - u_i).  With
    balanced masses the FullSolver score is 1 - cost/flow (wmd.h:252),
    so cost_lb gives score_ub.  Returns [float | None] per spec (None =
    unbalanced/degenerate — no bound, caller solves exactly)."""
    out = [None] * len(specs)
    idx = []
    for i, (a, b, _D, _e) in enumerate(specs):
        sa, sb = float(np.sum(a)), float(np.sum(b))
        if sa > 0 and abs(sa - sb) <= 1e-9 * max(sa, sb):
            idx.append(i)
    if not idx:
        return out
    T = max(len(specs[i][0]) for i in idx)
    L = max(len(specs[i][1]) for i in idx)
    B = len(idx)
    A = np.zeros((B, T))
    Bm = np.zeros((B, L))
    D = np.full((B, T, L), 1e3)
    for k, i in enumerate(idx):
        a, b, Dts, _ = specs[i]
        A[k, : len(a)] = a
        Bm[k, : len(b)] = b
        D[k, : len(a), : len(b)] = Dts
    logA = np.log(np.maximum(A, 1e-300))
    logB = np.log(np.maximum(Bm, 1e-300))

    def lse(M, axis):
        mx = np.max(M, axis=axis, keepdims=True)
        return (
            mx + np.log(np.sum(np.exp(M - mx), axis=axis, keepdims=True))
        ).squeeze(axis)

    f = np.zeros((B, T))
    g = np.zeros((B, L))
    for _ in range(iters):
        f = reg * (logA - lse((g[:, None, :] - D) / reg, axis=2))
        g = reg * (logB - lse((f[:, :, None] - D) / reg, axis=1))
    v = np.min(D - f[:, :, None], axis=1)  # exact dual feasibility
    cost_lb = np.sum(A * f, axis=1) + np.sum(Bm * v, axis=1)
    flow = np.sum(A, axis=1)
    ub = 1.0 - cost_lb / np.maximum(flow, 1e-12)
    for k, i in enumerate(idx):
        out[i] = float(ub[k])
    return out


def _greedy_cost_host(w1, D, cap) -> float:
    """f64 host greedy fill cost for ONE slice (mirrors
    ``_greedy_fill_cost``, same stable index tie-break): each source moves
    its mass into targets in ascending-distance order; unplaceable mass
    costs MAX_SIMILARITY.  w1: [n1], D: [n1, n2], cap: [n2], float64."""
    order = np.argsort(D, axis=1, kind="stable")
    Ds = np.take_along_axis(D, order, axis=1)
    caps = np.take_along_axis(np.broadcast_to(cap, D.shape), order, axis=1)
    before = np.cumsum(caps, axis=1) - caps
    moved = np.clip(w1[:, None] - before, 0.0, caps)
    leftover = np.maximum(w1 - moved.sum(axis=1), 0.0)
    return float((moved * Ds).sum() + leftover.sum() * MAX_SIMILARITY)


def _greedy_cost_host_injective(w1, D, cap) -> float:
    """f64 host injective fill: every source moves wholly to its nearest
    active target (cap > 0); no active target costs MAX_SIMILARITY."""
    active = cap > 0
    if not active.any():
        return float(w1.sum() * MAX_SIMILARITY)
    d_best = D[:, active].min(axis=1)
    return float((w1 * d_best).sum())


def rwmd_score_host(m_t, m_s, D_ts, injective: bool, symmetric: bool,
                    normalize_bow: bool, max_score: float) -> np.float32:
    """THE single home for REPORTED relaxed-WMD scores.

    Device kernels (single-query, multi-query, mesh shard) RANK only:
    their f32 reduction trees differ by compiled shape (measured ~1-ulp
    drift between the Q=1 and Q>=2 programs even at a common needle
    width), so reported scores must come from one shape-independent
    arithmetic path — float64 greedy fill here, cast to f32 — exactly as
    the alignment finalizer and the full-WMD/WRD exact EMD rescore do.
    Mirrors the kernel formula (wmd.h:139-141 cost_to_score, :383-390
    symmetric max): masses normalized by their sums in nbow mode, costs
    divided by the source mass sum in bow mode, max_cost = 1 (nbow) or
    max_sum_of_similarities (bow)."""
    m_t = np.asarray(m_t, np.float64)
    m_s = np.asarray(m_s, np.float64)
    D = np.asarray(D_ts, np.float64)
    w_t = max(float(m_t.sum()), 1e-9)
    w_s = max(float(m_s.sum()), 1e-9)
    if normalize_bow:
        mt, ms = m_t / w_t, m_s / w_s
    else:
        mt, ms = m_t, m_s
    fill = _greedy_cost_host_injective if injective else _greedy_cost_host
    acc0 = fill(mt, D, ms)
    if not normalize_bow:
        acc0 /= w_t
    if symmetric:
        acc1 = fill(ms, np.ascontiguousarray(D.T), mt)
        if not normalize_bow:
            acc1 /= w_s
        cost = max(acc0, acc1)
    else:
        cost = acc0
    max_cost = 1.0 if normalize_bow else max(float(max_score), 1e-9)
    return np.float32((max_cost - cost) / max_cost)


def rwmd_flow_host(m_t, m_s, D_ts, injective: bool, normalize_bow: bool = True):
    """Replicate the greedy fill on host for one slice to extract flow edges
    [(t, s, flow, distance)] (wmd.h:393-409).  Direction t->s only (the
    direction the reference uses for flows when not symmetric-tighter-1).
    Per-source capacity is independent (the reference re-fills w2 for every
    source token, wmd.h:339-376).

    Flow normalization follows wmd.h:401-402 exactly: nbow keeps the raw
    moved mass (masses are already normalized); bow divides by the source's
    bow mass ``m_t[i]``."""
    edges = []
    for i in range(len(m_t)):
        w = float(m_t[i])
        if w <= 0:
            continue
        if injective:
            valid = np.flatnonzero(m_s > 0)
            if valid.size == 0:
                continue
            j = valid[np.argmin(D_ts[i, valid])]
            edges.append((i, int(j), w, float(D_ts[i, j])))
        else:
            order = np.argsort(D_ts[i])
            remaining = w
            for j in order:
                if m_s[j] <= 0:
                    continue
                take = min(remaining, float(m_s[j]))
                if take > 0:
                    edges.append((i, int(j), take, float(D_ts[i, j])))
                    remaining -= take
                if remaining <= 1e-12:
                    break
    if normalize_bow:
        return edges
    return [(t, s, f / max(float(m_t[t]), 1e-12), d) for (t, s, f, d) in edges]


class WMDEngine:
    """Transport-metric search over a BruteForceEngine's packed buckets."""

    def __init__(self, engine, alignment_args: dict):
        self._engine = engine
        self._args = alignment_args
        self._algorithm = alignment_args["algorithm"]

    def _query_masses(self, query, tagged: bool = False) -> np.ndarray:
        """Dedup query tokens by string (the reference interns OOV tokens in
        the query vocabulary, so duplicates share an id); by (string, tag)
        when tag-weighted (TaggedTokenFactory, bow.h:150-202)."""
        strings = query.token_strings
        valid = np.ones((len(strings),), bool)
        if tagged:
            ids = list(zip(strings, query.token_tag))
        else:
            ids = list(strings)
        return dedup_masses(ids, valid)

    def find(self, index, query, qp) -> List:
        opts = query.options
        n = int(opts.get("max_matches", 100))
        min_score = float(opts.get("min_score", 0.2))
        debug = opts.get("debug")
        booster = opts.get("booster")
        boost = None
        if booster is not None:
            # the reference multiplies the booster into EVERY match score,
            # transport included (Score(r.score, score_max, p_boost),
            # metric/alignment.h:598 WMD / :710 WRD) — rank on boosted
            # scores so top-k pruning sees the same ordering
            boost = np.asarray(
                booster.compile(index.session, index._partition, query),
                np.float32,
            )
        doc_filter = index._doc_filter(query)

        a = self._args
        relaxed = self._algorithm == "word-movers-distance" and a["relaxed"]
        use_device = boost is None and debug is None
        state = self._score(
            index, query, qp, doc_filter=doc_filter, device=use_device
        )
        state["boost"] = boost
        packed = self._engine.packed

        if relaxed:
            # device kernels RANK; rwmd_score_host REPORTS (f32 reduction
            # trees vary with the compiled batch shape — see its
            # docstring).  Pool slack 3*eps makes membership provably
            # complete: any slice whose host score could reach the host
            # n-th has device >= nth_V - 2*eps, strictly above the pool
            # cut AND the unfetched bound, so one tie-complete pool fetch
            # suffices (no second round).
            eps = RWMD_RANK_EPS * (
                max(1.0, float(boost.max())) if boost is not None else 1.0
            )
            if use_device:
                from vectorian_tpu.ops.search import BucketTopKSource

                src = BucketTopKSource(self._engine, state["scores"], 1, n)
                top, smap, _rest = src.top_k_exactly_many(
                    [0], n, min_score - eps, slack=3 * eps, pool=True
                )[0]
                state["scores"] = smap
            else:
                scores = state["scores"]
                if boost is not None:
                    valid = scores > NEG_SCORE * 0.5
                    scores = np.where(
                        valid, scores * boost, NEG_SCORE
                    ).astype(np.float32)
                    state["scores"] = scores
                if debug:
                    debug("scores", {"scores": scores})
                top = _pool_from_vector(
                    packed, scores, n, min_score, eps
                )
            return self._relaxed_finalize(
                index, query, qp, state, top, n, min_score, debug
            )

        # full WMD / WRD: device scores are PROVABLE upper bounds on the
        # exact score (_emd_score_bound), so exact-rescoring candidates in
        # descending-bound order until every remaining bound sits below the
        # n-th exact score reproduces the reference's exhaustive exact-EMD
        # top-k (wmd.h:194-270) without solving every slice
        eps = CUT_EPS * (
            max(1.0, float(boost.max())) if boost is not None else 1.0
        )
        rank_min = min_score - eps
        if use_device:
            from vectorian_tpu.ops.search import BucketTopKSource

            src = BucketTopKSource(self._engine, state["scores"], 1, n + 32)
            smap, rest = src.score_map(0, rank_min)
            state["scores"] = smap

            def fetch_all(cut):
                found = src.above_vals_many([(src.qview(0), cut, set(smap))])
                return found[0][1]

        else:
            scores = state["scores"]
            if boost is not None:
                valid = scores > NEG_SCORE * 0.5
                scores = np.where(valid, scores * boost, NEG_SCORE).astype(
                    np.float32
                )
                state["scores"] = scores
            if debug:
                debug("scores", {"scores": scores})
            cand = np.flatnonzero(scores >= rank_min)
            smap = {int(c): float(scores[c]) for c in cand}
            rest = float("-inf")  # the host vector is already complete
            fetch_all = None
        return self._rescore_with_cut(
            index, query, qp, state, smap, rest, n, min_score,
            fetch_all=fetch_all, debug=debug,
        )

    @staticmethod
    def _nth_cut(matches, n: int, min_score: float) -> float:
        """The score every further candidate must (weakly) reach: the n-th
        best exact score so far, or the threshold while fewer than n
        qualify."""
        if len(matches) < n:
            return min_score
        return sorted((m.score for m in matches), reverse=True)[n - 1]

    def _ordered_by_bound(self, d: dict) -> List[int]:
        """Candidate sids in descending-bound order ((doc, slice) breaking
        bound ties — the same deterministic order as the final ranking)."""
        from vectorian_tpu.ops.search import order_by_score

        if not d:
            return []
        ids = np.fromiter(d.keys(), np.int64, len(d))
        vals = np.asarray([d[int(i)] for i in ids], np.float64)
        o = order_by_score(self._engine.packed, ids, vals)
        return [int(i) for i in ids[o]]

    def _consume_ordered(
        self, index, query, qp, state, smap, cand, matches, n, min_score,
        eps, debug=None, sims_map=None,
    ) -> None:
        """Exact-EMD rescore of bound-ordered candidates into ``matches``,
        in batches (each batch = one batched similarity fetch, or a lookup
        into a ``_sims_many_static`` prefetch shared across the batch),
        stopping once every remaining candidate's bound is provably below
        the n-th exact score: bound >= exact, so bound < nth - eps cannot
        displace or tie any reported match."""
        i = 0
        step = max(2 * n, 32)
        while i < len(cand):
            if (
                len(matches) >= n
                and smap[cand[i]] < self._nth_cut(matches, n, min_score) - eps
            ):
                return
            cut = (
                self._nth_cut(matches, n, min_score) - eps
                if len(matches) >= n
                else min_score
            )
            matches.extend(
                self._host_rescore(
                    index, query, qp, state, cand[i : i + step], min_score,
                    debug, sims_map=sims_map, cut=cut,
                )
            )
            i += step

    def _consume_rounds_many(
        self, index, queries, qps, states, smaps, cand_lists, per_q, pos,
        n, min_score, eps_q, sims_all, sim_multi, tw_args, tagged,
        active=None,
    ) -> None:
        """Batched ``_consume_ordered``: every still-active query advances
        one bound-ordered step per round, and all queries' missing candidate
        similarities for the round fetch in ONE fused ``_sims_many_static``
        dispatch.  Per-query fetching costs a blocking tunnel round trip per
        (query, step); the stopping rule is identical — a query retires when
        its next candidate's bound is provably below its n-th exact score."""
        step = max(2 * n, 32)
        # geometric window growth: each fused sims fetch costs a blocking
        # tunnel round trip, and loose-bound metrics (WRD) consumed ~20
        # fixed-step rounds per pass — doubling the window caps the rounds
        # at ~6 while the per-query stopping rule still retires early
        # (overshoot only costs extra host solves, which the threaded
        # batch EMD absorbs)
        step_cap = max(8 * step, 256)
        if active is None:
            active = range(len(queries))
        active = [qi for qi in active if pos[qi] < len(cand_lists[qi])]

        # software pipelining (static tables only): the NEXT window's
        # similarity fetch dispatches BEFORE the current window's host
        # EMD solves, so the device gather runs under the solver
        # (measured serialized: 0.57 s fetch + 0.84 s solve per WRD Q=64
        # pass).  The speculative window assumes no query retires — the
        # actual window is always a subset (active only shrinks; pos and
        # step advance deterministically), so overshoot costs wasted
        # device work, never correctness.  ``inflight`` keeps a
        # speculative fetch from being re-requested.
        inflight = set()

        def build_items(act, pos_of, stp):
            items = []
            for qi in act:
                window = cand_lists[qi][pos_of(qi) : pos_of(qi) + stp]
                missing = [
                    s
                    for s in window
                    if int(s) not in sims_all[qi]
                    and (qi, int(s)) not in inflight
                ]
                if missing:
                    items.append((qi, missing))
            return items

        def retire_filter(act):
            return [
                qi
                for qi in act
                if not (
                    len(per_q[qi]) >= n
                    and pos[qi] < len(cand_lists[qi])
                    and smaps[qi][cand_lists[qi][pos[qi]]]
                    < self._nth_cut(per_q[qi], n, min_score) - eps_q[qi]
                )
            ]

        def dispatch(items):
            if not items:
                return None
            for qi, sids in items:
                inflight.update((qi, int(s)) for s in sids)
            if sim_multi is None:
                return None  # plan-generic path stays serial (below)
            return self._sims_many_static_dispatch(
                items, sim_multi, tw_args, tagged
            )

        def collect(handle, items):
            if not items:
                return
            with trace.span("wmd.sims_fetch"):
                if handle is None:
                    # contextual / mixed-tree batch: the stacked
                    # pair-gather table only exists for static plans —
                    # fetch through the plan-generic batched similarity
                    # path per query (serial, no prefetch)
                    fetched = self._sims_many_plan(items, qps, states)
                else:
                    fetched = self._sims_many_static_collect(handle)
            for (qi, sids), sm in zip(items, fetched):
                sims_all[qi].update(sm)
                inflight.difference_update((qi, int(s)) for s in sids)

        active = retire_filter(active)
        cur_items = build_items(active, lambda qi: pos[qi], step)
        handle = dispatch(cur_items)
        while active:
            collect(handle, cur_items)
            # speculative prefetch for the next round (pipelined under
            # this round's host solves)
            nstep = min(2 * step, step_cap)
            spec = [
                qi for qi in active if pos[qi] + step < len(cand_lists[qi])
            ]
            spec_items = build_items(spec, lambda qi: pos[qi] + step, nstep)
            handle = dispatch(spec_items)
            nxt = []
            with trace.span("wmd.host_rescore"):
                for qi in active:
                    cand = cand_lists[qi]
                    matches = per_q[qi]
                    cut_q = (
                        self._nth_cut(matches, n, min_score) - eps_q[qi]
                        if len(matches) >= n
                        else min_score
                    )
                    matches.extend(
                        self._host_rescore(
                            index, queries[qi], qps[qi], states[qi],
                            cand[pos[qi] : pos[qi] + step], min_score, None,
                            sims_map=sims_all[qi], cut=cut_q,
                        )
                    )
                    pos[qi] += step
                    if pos[qi] < len(cand):
                        nxt.append(qi)
            step = nstep
            active = retire_filter(nxt)
            cur_items = spec_items

    def _rescore_with_cut(
        self, index, query, qp, state, smap, rest, n, min_score,
        fetch_all=None, debug=None,
    ) -> List:
        """Provably complete full-WMD / WRD top-k (reference parity with
        wmd.h:194-270's exhaustive exact EMD): ``smap`` maps fetched sids to
        their provable score bounds, ``rest`` upper-bounds every unfetched
        slice, ``fetch_all(cut)`` returns the complete {sid: bound} map of
        everything >= cut (one device completion round; None when smap is
        already complete).  After the final pass every slice NOT exactly
        rescored has bound < nth - eps <= exact nth, so it can neither beat
        nor tie the reported top-k."""
        packed = self._engine.packed
        boost = state.get("boost")
        eps = CUT_EPS * (
            max(1.0, float(np.max(boost))) if boost is not None else 1.0
        )
        rank_min = min_score - eps
        matches: List = []
        cand0 = self._ordered_by_bound(
            {s: v for s, v in smap.items() if v >= rank_min}
        )
        self._consume_ordered(
            index, query, qp, state, smap, cand0, matches, n, min_score,
            eps, debug,
        )
        if fetch_all is not None:
            cut = max(self._nth_cut(matches, n, min_score) - eps, rank_min)
            if rest >= cut:
                extra = fetch_all(cut)
                new = {
                    int(s): float(v)
                    for s, v in extra.items()
                    if int(s) not in smap and v >= cut
                }
                smap.update(
                    {int(s): float(v) for s, v in extra.items()}
                )
                self._consume_ordered(
                    index, query, qp, state, smap,
                    self._ordered_by_bound(new), matches, n, min_score,
                    eps, debug,
                )
        matches.sort(
            key=lambda m: (
                -m.score,
                int(packed.slice_doc[m.slice_id]),
                int(packed.slice_idx[m.slice_id]),
            )
        )
        return matches[:n]

    def _sims_many_static(self, items, sim_multi, tw_args, tagged):
        """Fused candidate-similarity fetch for a whole serving batch:
        ``items`` = [(qi, sids)] resolve to (slice, query) pairs, grouped
        by bucket row length; each group is ONE ``_pairs_sims_static``
        dispatch against the already-stacked [V, Tmax, Q] table, and all
        groups fetch in one ``jax.device_get`` — a blocking per-query
        fetch costs a tunnel round trip per query AND per fetched array
        (a Q=64 batch measured ~2.6 s in host reads alone).  Returns one
        {sid: (Sw, Su)} per item; slices/pairs are host-gathered rows, so
        paged mode works identically (device bucket keys never touched)."""
        return self._sims_many_static_collect(
            self._sims_many_static_dispatch(items, sim_multi, tw_args,
                                            tagged)
        )

    def _sims_many_static_dispatch(self, items, sim_multi, tw_args, tagged):
        """Dispatch half of ``_sims_many_static``: enqueues the device
        work and returns a handle; ``_sims_many_static_collect`` blocks
        on the results.  The split lets the consume loop PREFETCH the
        next window's similarities under the current window's host EMD
        solves (wmd.sims_fetch measured ~0.57 s of a 2.0 s WRD Q=64 pass
        fully serialized against 0.84 s of host rescore)."""
        from vectorian_tpu.ops.search import _next_pow2

        engine = self._engine
        V = int(sim_multi.shape[0])
        # vectorized (bucket-grouped) row packing: the per-sid python
        # append loop was the dominant HOST cost of a WRD serving round
        # (it sat on the critical path even with the prefetch pipeline)
        if items:
            sid_arr = np.concatenate(
                [np.asarray(sids, np.int64) for _, sids in items]
            )
            ii_arr = np.concatenate(
                [np.full(len(sids), ii, np.int32)
                 for ii, (_, sids) in enumerate(items)]
            )
            qi_arr = np.concatenate(
                [np.full(len(sids), qi, np.int32) for qi, sids in items]
            )
            locs = engine._slice_loc[sid_arr]  # [k, 2] (bucket, row)
        else:
            sid_arr = np.zeros((0,), np.int64)
        refs, metas = [], []
        if sid_arr.size:
            order = np.argsort(locs[:, 0], kind="stable")
            b_sorted = locs[order, 0]
            starts = np.flatnonzero(
                np.concatenate(([True], b_sorted[1:] != b_sorted[:-1]))
            )
            bounds = list(starts) + [len(order)]
            for gi in range(len(starts)):
                sel = order[bounds[gi] : bounds[gi + 1]]
                bi = int(b_sorted[bounds[gi]])
                db = engine._device_buckets[bi]
                rows = locs[sel, 1]
                p = len(sel)
                pp = _next_pow2(p)
                L = db["tokens_np"].shape[1]
                tok = np.zeros((pp, L), np.int32)
                tok[:p] = db["tokens_np"][rows]
                pos = np.zeros((pp, L), np.int8)
                pos[:p] = db["pos_np"][rows]
                qidx = np.zeros((pp,), np.int32)
                qidx[:p] = qi_arr[sel]
                Sw, Su = _pairs_sims_static(
                    jnp.asarray(tok), jnp.asarray(pos), jnp.asarray(qidx),
                    sim_multi, *tw_args, V=V, with_tags=tagged,
                )
                refs.append(Sw)
                if tagged:
                    refs.append(Su)
                metas.append(
                    list(zip(ii_arr[sel].tolist(), sid_arr[sel].tolist()))
                )
        # start the device->host copies NOW: the collect's device_get then
        # only waits out whatever transfer remains after the host EMD
        # solves it overlapped (the [pp, L, Tmax] f32 rounds are
        # transfer-bound — ~8 MB at the largest window)
        for r in refs:
            try:
                r.copy_to_host_async()
            except (AttributeError, RuntimeError):
                break
        return {
            "refs": refs, "metas": metas, "tagged": tagged,
            "n_items": len(items), "items": items,
        }

    def _sims_many_static_collect(self, handle):
        """Blocking half of ``_sims_many_static`` (one batched
        device_get + host unpack)."""
        out_all = [dict() for _ in range(handle["n_items"])]
        fetched = (
            jax.device_get(handle["refs"]) if handle["refs"] else []
        )
        pos_i = 0
        tagged = handle["tagged"]
        slice_len = self._engine.packed.slice_len
        for own in handle["metas"]:
            Sw = np.asarray(fetched[pos_i])
            pos_i += 1
            if tagged:
                Su = np.asarray(fetched[pos_i])
                pos_i += 1
            else:
                Su = Sw
            for k2, (ii, sid) in enumerate(own):
                ln = int(slice_len[sid])
                out_all[ii][sid] = (Sw[k2, :ln], Su[k2, :ln])
        return out_all

    def _plan_mesh_shards(self, ms, plan_pack, Q, with_tags, with_filter,
                          with_boost, boosts):
        """Per-bucket mesh shards for the plan-stacked transport kernels:
        token/length/pos/tag rows AND the contextual bucket stores pad to
        a multiple of devices*chunk (padding rows have length 0 -> NEG
        score, filtered) and shard over the mesh's slice axis."""
        import jax

        engine = self._engine
        shards = []
        for bi, db in enumerate(engine._device_buckets):
            if db["n"] == 0:
                continue
            chunk = db["chunk"]
            while chunk > 64 and chunk * Q > 4096:
                chunk //= 2
            mult = ms.n_devices * chunk
            npad = (-db["tokens_np"].shape[0]) % mult
            tok = np.pad(db["tokens_np"], ((0, npad), (0, 0)))
            ln = np.pad(db["lengths_np"], (0, npad))
            tok_d = jax.device_put(tok, ms._sharded)
            len_d = jax.device_put(ln, ms._sharded)
            pos_d = tag_d = bst_d = None
            if with_tags or with_filter:
                pos_d = jax.device_put(
                    np.pad(db["pos_np"], ((0, npad), (0, 0))), ms._sharded
                )
                tag_d = jax.device_put(
                    np.pad(db["tag_np"], ((0, npad), (0, 0))), ms._sharded
                )
            if with_boost:
                bst_d = jax.device_put(
                    self._bucket_boost_mat(db, boosts, Q, tok.shape[0]),
                    ms._sharded,
                )
            ctx_d = tuple(
                jax.device_put(
                    np.pad(
                        np.asarray(engine._ctx_stores[nm][bi]),
                        ((0, npad), (0, 0), (0, 0)),
                    ),
                    ms._sharded,
                )
                for nm in plan_pack["ctx_names"]
            )
            shards.append((db, tok_d, len_d, pos_d, tag_d, bst_d, ctx_d, chunk))
        return shards

    @staticmethod
    def _replicate_plan_pack(ms, plan_pack):
        """Replicate the stacked leaf tables / ctx query dicts over the
        mesh for the plan-stacked transport shard kernels."""
        statics = tuple(
            ms.put_replicated(np.asarray(s)) for s in plan_pack["statics"]
        )
        static_mags = tuple(
            ms.put_replicated(np.asarray(m))
            for m in plan_pack["static_mags"]
        )
        ctx_qs = tuple(
            {k: ms.put_replicated(np.asarray(v)) for k, v in d.items()}
            for d in plan_pack["ctx_qs"]
        )
        weights = tuple(
            ms.put_replicated(np.asarray(w)) for w in plan_pack["weights"]
        )
        return statics, static_mags, ctx_qs, weights

    def _sims_many_plan(self, items, qps, states):
        """Candidate-similarity fetch for contextual / mixed-tree serving
        batches: each (qi, sids) item resolves through the plan-generic
        ``batch_slice_similarity`` (one batched device dispatch+fetch per
        query — the [V, Tmax, Q] pair-gather table of ``_sims_many_static``
        only exists for static plans).  Same {sid: (Sw, Su)} maps."""
        engine = self._engine
        out_all = []
        for qi, sids in items:
            sids = list(sids)
            sims = engine.batch_slice_similarity(
                sids, qps[qi], tag_weights=states[qi]["tagw"]
            )
            out_all.append(
                {int(s): sm for s, sm in zip(sids, sims)}
            )
        return out_all

    @staticmethod
    def _tagw_args_multi(tagws, Tmax: int, Q: int):
        """[Tmax, Q] device tag-weighting columns (identity for untagged
        queries — same packing as the alignment mesh batch)."""
        tw_w = np.ones((Tmax, Q), np.float32)
        tw_p = np.full((Tmax, Q), -1, np.int8)
        pen = np.zeros((Q,), np.float32)
        thr = np.full((Q,), -1.0, np.float32)
        for qi, tw in enumerate(tagws):
            if tw is None:
                continue
            t = len(tw.t_pos_weights)
            tw_w[:t, qi] = tw.t_pos_weights
            tw_p[:t, qi] = tw.pos_t
            pen[qi] = tw.pos_mismatch_penalty
            thr[qi] = tw.similarity_threshold
        return tuple(
            jnp.asarray(a) for a in (tw_w, tw_p, pen, thr)
        )

    @staticmethod
    def _sorted_gather_args(db, chunk: int):
        """(tok_sorted, sort_inv) for a bucket dispatch: the pack-time
        sorted gather stream only tiles at the bucket's own pack chunk —
        shrunk chunks pass inert placeholders (use_sorted=False)."""
        if chunk == db["chunk"]:
            return db["tok_sorted"], db["sort_inv"]
        n_chunks = int(db["tokens"].shape[0]) // chunk
        z = jnp.zeros((n_chunks, 1), jnp.int32)
        return z, z

    @staticmethod
    def _bucket_boost_mat(db, boosts, Q: int, n_rows: int) -> np.ndarray:
        """[n_rows, Q] per-slice boost matrix for one bucket (ones for
        unboosted queries and padding rows)."""
        bmat = np.ones((n_rows, Q), np.float32)
        for qi, b in enumerate(boosts):
            if b is not None:
                bmat[: db["n"], qi] = b[db["slice_index"]]
        return bmat

    def find_batch(
        self, index, queries, qps, n: int, min_score: float, mesh=None,
        tagws=None, boosts=None, doc_filter=None,
    ) -> List:
        """Batched relaxed-WMD over static plans: one corpus pass serves
        Q queries (the gather amortizes like the alignment serving batch),
        then the per-query host rescore/flows run as usual — every path
        reports ``rwmd_score_host``'s shape-independent arithmetic, so
        find/find_batch/mesh matches stay byte-identical.  With ``mesh``
        the corpus pass shards over the device mesh (the per-query
        next-best bound plus the rank-vs-report slack guard membership).

        ``tagws``: per-query TagWeightingSpec list (tag-weighted similarity
        + (id, tag) BOW identity, in-kernel); ``boosts``: per-query
        [n_slices] multipliers (multiply ranking scores/bounds AND the
        exact rescore, reference metric/alignment.h:598/:710);
        ``doc_filter``: shared doc-side token filter (in-kernel mass
        exclusion)."""
        engine = self._engine
        a = self._args
        Q = len(queries)
        if tagws is None:
            tagws = [None] * Q
        widths = [engine._plan_width(qp) for qp in qps]
        relaxed_ = self._algorithm == "word-movers-distance" and a.get(
            "relaxed"
        )
        # every transport variant serves mixed widths in ONE padded pass:
        # device kernels only RANK (pad zeros shift f32 reduction trees by
        # ~1 ulp, which the pool slack absorbs) and REPORTED scores come
        # from shape-independent host arithmetic — rwmd_score_host for
        # relaxed, the exact EMD solver for full WMD / WRD
        is_static = all(qp.plan == ("static", 0) for qp in qps)
        # a contextual operand anywhere in the tree -> position-unique BOW
        # entries (reference similarity_dependency()==POSITION,
        # metric/alignment.h:551-576), exactly like the single-query path
        unique = not qps[0].is_static_only
        if is_static:
            Tmax = max(widths)
            from vectorian_tpu.ops.search import _pad_stack

            sim_multi = _pad_stack(
                tuple(qp.static_sims[0] for qp in qps),
                tuple(Tmax - w for w in widths),
                axis=2,
            )  # [V, Tmax, Q] — one dispatch for Q pads + the stack
            plan_pack = None
        else:
            # contextual / mixed trees: stack per leaf (static [V, Tpad*Q]
            # tables + [Tpad*Q, d] ctx query matrices) and evaluate via
            # eval_plan_chunk's stacked query axis — same machinery as the
            # alignment tree batch (search.stack_tree_plans)
            from vectorian_tpu.ops.search import stack_tree_plans

            statics, ctx_qs, weights, Tmax = stack_tree_plans(
                qps, [max(q.n_tokens, 1) for q in queries]
            )
            sim_multi = None
            plan_pack = {
                "plan": qps[0].plan,
                "statics": statics,
                "static_mags": tuple(qps[0].static_mags),
                "ctx_names": tuple(qps[0].ctx_names),
                "ctx_qs": ctx_qs,
                "weights": weights,
                "unique": unique,
            }
        # (id, tag) BOW identity when tag-weighted (TaggedTokenFactory,
        # bow.h:150-202) — tag weights are index-level, so the identity is
        # uniform across the batch; position-unique entries subsume it
        # when a contextual operand is present
        with_tags = any(tw is not None for tw in tagws)
        tagged = with_tags and not unique
        mass_t = np.zeros((Tmax, Q), np.float32)
        max_score_t = np.zeros((Q,), np.float32)
        states = []
        for qi, (query, qp) in enumerate(zip(queries, qps)):
            if unique:
                m = np.ones((query.n_tokens,), np.float32)
            else:
                m = self._query_masses(query, tagged=tagged)
            mass_t[: len(m), qi] = m
            tw = tagws[qi]
            max_score_t[qi] = (
                tw.total if tw is not None else float(query.n_tokens)
            )
            states.append(
                {
                    "mass_t": np.pad(m, (0, max(widths[qi] - len(m), 0))),
                    "mass_t_mag": None,
                    "tagw": tw,
                    "tagged": tagged,
                    "unique": unique,
                    "T": query.n_tokens,
                    "doc_filter": doc_filter,
                    "boost": (
                        boosts[qi] if boosts is not None else None
                    ),
                }
            )
        len_ts = jnp.asarray([q.n_tokens for q in queries], jnp.int32)
        tw_args = self._tagw_args_multi(tagws, Tmax, Q)
        df_args = self._df_args(doc_filter)
        with_filter = doc_filter is not None
        with_boost = boosts is not None and any(
            b is not None for b in boosts
        )

        relaxed = relaxed_
        if mesh is not None:
            if relaxed:
                return self._find_batch_mesh_rwmd(
                    index, queries, qps, sim_multi, mass_t, len_ts, states,
                    n, min_score, mesh, max_score_t=max_score_t,
                    tw_args=tw_args, df_args=df_args, boosts=boosts,
                    with_tags=with_tags, with_filter=with_filter,
                    with_boost=with_boost, plan_pack=plan_pack,
                )
            return self._find_batch_mesh_emd(
                index, queries, qps, sim_multi, mass_t, states, Tmax,
                n, min_score, mesh, tw_args=tw_args, df_args=df_args,
                boosts=boosts, with_tags=with_tags,
                with_filter=with_filter, with_boost=with_boost,
                plan_pack=plan_pack,
            )
        if not relaxed:
            return self._find_batch_emd(
                index, queries, qps, sim_multi, mass_t, states, Tmax,
                n, min_score, tw_args=tw_args, df_args=df_args,
                boosts=boosts, with_tags=with_tags,
                with_filter=with_filter, with_boost=with_boost,
                plan_pack=plan_pack,
            )

        from vectorian_tpu.ops.search import _LazyScores

        pending = []
        for bi, db in enumerate(engine._device_buckets):
            if db["n"] == 0:
                continue
            # the greedy-fill mask is O(L^2) per (slice, query): shrink the
            # chunk so chunk*Q stays bounded
            chunk = db["chunk"]
            while chunk > 64 and chunk * Q > 4096:
                chunk //= 2

            def dispatch(db=db, bi=bi, chunk=chunk):
                bmat = (
                    jnp.asarray(
                        self._bucket_boost_mat(
                            db, boosts, Q, int(db["n_pad"])
                        )
                    )
                    if with_boost
                    else jnp.ones((1, Q), jnp.float32)
                )
                if plan_pack is not None:
                    return _bucket_rwmd_scores_multi_plan(
                        plan_pack["plan"],
                        db["tokens"],
                        *self._sorted_gather_args(db, chunk),
                        db["pos"],
                        db["tag"],
                        db["lengths"],
                        plan_pack["statics"],
                        plan_pack["static_mags"],
                        tuple(
                            engine._ctx_dev(nm, bi)
                            for nm in plan_pack["ctx_names"]
                        ),
                        plan_pack["ctx_qs"],
                        plan_pack["weights"],
                        jnp.asarray(mass_t),
                        len_ts,
                        jnp.asarray(max_score_t),
                        bmat,
                        *tw_args,
                        *df_args,
                        injective=bool(a["injective"]),
                        symmetric=bool(a["symmetric"]),
                        normalize_bow=bool(a["normalize_bow"]),
                        chunk=chunk,
                        n_queries=Q,
                        unique_masses=plan_pack["unique"],
                        with_tags=with_tags,
                        with_filter=with_filter,
                        with_boost=with_boost,
                        use_sorted=chunk == db["chunk"],
                    )
                return _bucket_rwmd_scores_multi(
                    db["tokens"],
                    db["lengths"],
                    db["pos"],
                    db["tag"],
                    sim_multi,
                    jnp.asarray(mass_t),
                    len_ts,
                    jnp.asarray(max_score_t),
                    bmat,
                    *tw_args,
                    *df_args,
                    injective=bool(a["injective"]),
                    symmetric=bool(a["symmetric"]),
                    normalize_bow=bool(a["normalize_bow"]),
                    chunk=chunk,
                    n_queries=Q,
                    with_tags=with_tags,
                    with_filter=with_filter,
                    with_boost=with_boost,
                )

            pending.append(
                (db, _LazyScores(db, dispatch) if engine._paged else dispatch())
            )
        # device-side per-bucket top-k instead of the full [n_slices, Q]
        # host read (128 MB at 1M x 32); top_k_exactly replicates
        # engine.top_k's tie-complete pool over the resident matrices
        from vectorian_tpu.ops.search import BucketTopKSource

        src = BucketTopKSource(engine, pending, Q, n + 32)

        results = []
        packed = engine.packed
        # pooled fetch with rank-vs-report slack (see find()'s relaxed
        # branch): candidates are tie-complete wrt the HOST-reported
        # scores, so one round is provably enough
        eps = RWMD_RANK_EPS * (
            max(
                1.0,
                max(
                    float(np.max(b)) for b in boosts if b is not None
                ),
            )
            if with_boost
            else 1.0
        )
        tops = src.top_k_exactly_many(
            range(Q), n, min_score - eps, slack=3 * eps, pool=True
        )
        # one fused similarity fetch serves every query's host rescore
        # (a blocking per-query fetch costs a tunnel round trip each)
        if plan_pack is not None:
            sims_all = self._sims_many_plan(
                [(qi, tops[qi][0]) for qi in range(Q)], qps, states
            )
        else:
            sims_all = self._sims_many_static(
                [(qi, tops[qi][0]) for qi in range(Q)],
                sim_multi, tw_args, with_tags,
            )
        for qi, (query, qp) in enumerate(zip(queries, qps)):
            top, smap, _rest = tops[qi]
            states[qi]["scores"] = smap
            results.append(
                self._relaxed_finalize(
                    index, query, qp, states[qi], top, n, min_score, None,
                    sims_map=sims_all[qi],
                )
            )
        return results

    def _batch_emd_masses(self, index, queries, qps, states, Tmax):
        """(mass_dev [Tmax, Q], normalize, mags_vocab) for a full-WMD / WRD
        serving batch — the bound kernel's masses mirror the exact host
        rescore's exactly (provable-cut requirement)."""
        a = self._args
        Q = len(queries)
        is_wrd = self._algorithm == "word-rotators-distance"
        if is_wrd:
            mass_dev = np.zeros((Tmax, Q), np.float32)
            for qi, (query, qp) in enumerate(zip(queries, qps)):
                if qp.ctx_queries and not qp.is_static_only:
                    # contextual: needle mass = per-position vector norm
                    # (single-query _score's mass_t_mag source)
                    mm = np.asarray(
                        qp.ctx_queries[0]["magnitudes"], np.float32
                    )
                else:
                    mm = self._static_needle_magnitudes(qp, query, index)
                k = min(len(mm), Tmax)
                mass_dev[:k, qi] = mm[:k]
                states[qi]["mass_t_mag"] = mm
            normalize = bool(a.get("normalize_magnitudes", True))
            mags_vocab = (
                np.asarray(qps[0].static_mags[0], np.float32)
                if qps[0].static_mags
                else np.zeros((1,), np.float32)
            )
        else:
            mass_dev = None  # caller already built the bow masses
            normalize = bool(a["normalize_bow"])
            mags_vocab = np.zeros(
                (
                    int(qps[0].static_sims[0].shape[0])
                    if qps[0].static_sims
                    else 1,
                ),
                np.float32,
            )
        return mass_dev, normalize, mags_vocab, is_wrd

    def _find_batch_emd(
        self, index, queries, qps, sim_multi, mass_t, states, Tmax,
        n: int, min_score: float, tw_args=None, df_args=None, boosts=None,
        with_tags=False, with_filter=False, with_boost=False,
        plan_pack=None,
    ) -> List:
        """Batched full-WMD / WRD: Q queries share one bound-ranking corpus
        pass (the vocab gather amortizes like the relaxed batch), then each
        query's exact EMD rescore runs under the provable cut — candidates
        are consumed in descending-bound order until every remaining bound
        sits below the n-th exact score, and one FUSED completion round
        serves every query whose initial fetch could not prove its cut.
        Results match the reference's exhaustive exact EMD (wmd.h:194-270)
        and the single-query ``find()`` byte-for-byte."""
        engine = self._engine
        Q = len(queries)
        mass_dev, normalize, mags_vocab, is_wrd = self._batch_emd_masses(
            index, queries, qps, states, Tmax
        )
        if mass_dev is None:
            mass_dev = mass_t

        from vectorian_tpu.ops.search import _LazyScores

        pending = []
        for bi, db in enumerate(engine._device_buckets):
            if db["n"] == 0:
                continue
            # the greedy-fill mask is O(L^2) per (slice, query): bound
            # chunk*Q like the relaxed batch
            chunk = db["chunk"]
            while chunk > 64 and chunk * Q > 4096:
                chunk //= 2

            def dispatch(db=db, bi=bi, chunk=chunk):
                bmat = (
                    jnp.asarray(
                        self._bucket_boost_mat(
                            db, boosts, Q, int(db["n_pad"])
                        )
                    )
                    if with_boost
                    else jnp.ones((1, Q), jnp.float32)
                )
                if plan_pack is not None:
                    return _bucket_emd_scores_multi_plan(
                        plan_pack["plan"],
                        db["tokens"],
                        *self._sorted_gather_args(db, chunk),
                        db["pos"],
                        db["tag"],
                        db["lengths"],
                        plan_pack["statics"],
                        plan_pack["static_mags"],
                        tuple(
                            engine._ctx_dev(nm, bi)
                            for nm in plan_pack["ctx_names"]
                        ),
                        plan_pack["ctx_qs"],
                        plan_pack["weights"],
                        jnp.asarray(mass_dev),
                        bmat,
                        *(tw_args or self._tagw_args_multi([None] * Q, Tmax, Q)),
                        *(df_args or self._df_args(None)),
                        use_magnitudes=is_wrd,
                        normalize_mass=normalize,
                        chunk=chunk,
                        n_queries=Q,
                        unique_masses=plan_pack["unique"],
                        with_tags=with_tags,
                        with_filter=with_filter,
                        with_boost=with_boost,
                        use_sorted=chunk == db["chunk"],
                    )
                return _bucket_emd_scores_multi(
                    db["tokens"],
                    db["lengths"],
                    db["pos"],
                    db["tag"],
                    sim_multi,
                    jnp.asarray(mags_vocab),
                    jnp.asarray(mass_dev),
                    bmat,
                    *(tw_args or self._tagw_args_multi([None] * Q, Tmax, Q)),
                    *(df_args or self._df_args(None)),
                    use_magnitudes=is_wrd,
                    normalize_mass=normalize,
                    chunk=chunk,
                    n_queries=Q,
                    with_tags=with_tags,
                    with_filter=with_filter,
                    with_boost=with_boost,
                )

            pending.append(
                (db, _LazyScores(db, dispatch) if engine._paged else dispatch())
            )
        from vectorian_tpu.ops.search import BucketTopKSource

        src = BucketTopKSource(engine, pending, Q, n + 32)
        return self._rescore_with_cut_many(
            index, queries, qps, states, src, n, min_score,
            sim_multi=sim_multi,
            tw_args=tw_args or self._tagw_args_multi([None] * Q, Tmax, Q),
            tagged=with_tags,
        )

    def _rescore_with_cut_many(
        self, index, queries, qps, states, src, n: int, min_score: float,
        sim_multi=None, tw_args=None, tagged=False,
    ) -> List:
        """Batched provable-cut driver over a BucketTopKSource: phase 1
        consumes each query's fetched bound candidates; queries whose
        unfetched bound can still reach their n-th exact score share ONE
        fused completion round (per-query rounds would pay a tunnel round
        trip each)."""
        packed = self._engine.packed
        Q = len(queries)
        # per-query drift slack: boosted bounds carry boost-scaled drift
        # (bound*b >= exact*b keeps the cut provable; the eps comparison
        # must scale with it, same as the single-query path)
        eps_q = []
        for qi in range(Q):
            b = states[qi].get("boost")
            eps_q.append(
                CUT_EPS * (max(1.0, float(np.max(b))) if b is not None else 1.0)
            )
        smaps, rests, cand_lists = [], [], []
        for qi in range(Q):
            rank_min = min_score - eps_q[qi]
            smap, rest = src.score_map(qi, rank_min)
            states[qi]["scores"] = smap
            smaps.append(smap)
            rests.append(rest)
            cand_lists.append(
                self._ordered_by_bound(
                    {s: v for s, v in smap.items() if v >= rank_min}
                )
            )
        # round-based consume: every query advances one step per round and
        # ALL queries' missing candidate similarities fetch in one fused
        # dispatch — letting each query fetch its own later steps costs a
        # blocking tunnel round trip per (query, step) (measured 8.7 s of
        # a 12 s WRD Q=64 serving pass in per-query device reads)
        step = max(2 * n, 32)
        sims_all = [dict() for _ in range(Q)]
        per_q = [[] for _ in range(Q)]
        pos = [0] * Q
        self._consume_rounds_many(
            index, queries, qps, states, smaps, cand_lists, per_q, pos,
            n, min_score, eps_q, sims_all, sim_multi, tw_args, tagged,
        )
        unsafe, cuts = [], {}
        for qi in range(Q):
            cut = max(
                self._nth_cut(per_q[qi], n, min_score) - eps_q[qi],
                min_score - eps_q[qi],
            )
            if rests[qi] >= cut:
                unsafe.append(qi)
                cuts[qi] = cut
        if unsafe:
            found = src.above_vals_many(
                [(src.qview(qi), cuts[qi], set(smaps[qi])) for qi in unsafe]
            )
            for qi, (_ids, vmap) in zip(unsafe, found):
                new = {
                    int(s): float(v)
                    for s, v in vmap.items()
                    if int(s) not in smaps[qi] and v >= cuts[qi]
                }
                smaps[qi].update(
                    {int(s): float(v) for s, v in vmap.items()}
                )
                # the consumed prefix's tail bounds stayed below a cut that
                # only rises, so only the completion round's new candidates
                # need consuming (same as the single-query path)
                cand_lists[qi] = self._ordered_by_bound(new)
                pos[qi] = 0
            self._consume_rounds_many(
                index, queries, qps, states, smaps, cand_lists, per_q, pos,
                n, min_score, eps_q, sims_all, sim_multi, tw_args, tagged,
                active=unsafe,
            )
        results = []
        for qi in range(Q):
            matches = per_q[qi]
            matches.sort(
                key=lambda m: (
                    -m.score,
                    int(packed.slice_doc[m.slice_id]),
                    int(packed.slice_idx[m.slice_id]),
                )
            )
            results.append(matches[:n])
        return results

    def _find_batch_mesh_emd(
        self, index, queries, qps, sim_multi, mass_t, states, Tmax,
        n: int, min_score: float, mesh, tw_args=None, df_args=None,
        boosts=None, with_tags=False, with_filter=False, with_boost=False,
        plan_pack=None,
    ) -> List:
        """Mesh-sharded full-WMD / WRD serving batch: per-shard bound
        ranking (the same provable _emd_score_bound) + top-k all-gather
        merge with a ``next_best`` bound, then the exact host EMD rescore
        under the provable cut.  A query whose unfetched bound can still
        reach its n-th exact score triggers ONE full-coverage round
        (k = every shard row) instead of per-doubling remote compiles —
        results match the single-chip paths byte-for-byte."""
        import jax
        from vectorian_tpu.parallel.mesh import MeshSearch

        engine = self._engine
        ms = mesh if isinstance(mesh, MeshSearch) else MeshSearch(mesh)
        Q = len(queries)
        mass_dev, normalize, mags_vocab, is_wrd = self._batch_emd_masses(
            index, queries, qps, states, Tmax
        )
        if mass_dev is None:
            mass_dev = mass_t

        if plan_pack is not None:
            table = mags_d = None
            statics_r, smags_r, ctx_qs_r, weights_r = (
                self._replicate_plan_pack(ms, plan_pack)
            )
            len_ts_d = ms.put_replicated(
                np.asarray([q.n_tokens for q in queries], np.int32)
            )
            mst_dummy = ms.put_replicated(np.zeros((Q,), np.float32))
        else:
            table = ms.put_replicated(np.asarray(sim_multi))
            mags_d = ms.put_replicated(mags_vocab)
        mass_d = ms.put_replicated(mass_dev)
        n_dev = ms.n_devices
        if tw_args is None:
            tw_args = self._tagw_args_multi([None] * Q, Tmax, Q)
        if df_args is None:
            df_args = self._df_args(None)
        tw_d = tuple(ms.put_replicated(np.asarray(a)) for a in tw_args)
        df_d = tuple(ms.put_replicated(np.asarray(a)) for a in df_args)
        # per-query boost-scaled drift slack (same as the single-chip cut)
        eps_q = []
        for qi in range(Q):
            b = states[qi].get("boost")
            eps_q.append(
                CUT_EPS
                * (max(1.0, float(np.max(b))) if b is not None else 1.0)
            )
        packed = engine.packed

        # uniform 8-tuples: the static path carries no ctx stores
        shards = self._plan_mesh_shards(
            ms, plan_pack or {"ctx_names": ()}, Q, with_tags, with_filter,
            with_boost, boosts,
        )

        m = n + 32
        while True:
            pending = []
            complete = True
            for db, tok_d, len_d, pos_d, tag_d, bst_d, ctx_d, chunk in shards:
                complete = complete and m >= tok_d.shape[0]
                if plan_pack is not None:
                    out = ms.plan_transport_topk_multiquery(
                        plan_pack["plan"], tok_d, len_d, ctx_d,
                        statics_r, smags_r, ctx_qs_r, weights_r,
                        mass_d, len_ts_d, mst_dummy,
                        relaxed=False,
                        use_magnitudes=is_wrd, normalize_mass=normalize,
                        k=min(m, tok_d.shape[0]), chunk=chunk,
                        with_next=True,
                        pos_ids=pos_d, tag_ids=tag_d, boost=bst_d,
                        tw_args=tw_d if with_tags else None,
                        df_args=df_d if with_filter else None,
                        unique_masses=plan_pack["unique"],
                        with_tags=with_tags, with_filter=with_filter,
                        with_boost=with_boost,
                    )
                else:
                    out = ms.emd_topk_multiquery(
                        tok_d, len_d, table, mags_d, mass_d,
                        use_magnitudes=is_wrd, normalize_mass=normalize,
                        k=min(m, tok_d.shape[0]), chunk=chunk,
                        with_next=True,
                        pos_ids=pos_d, tag_ids=tag_d, boost=bst_d,
                        tw_args=tw_d if with_tags else None,
                        df_args=df_d if with_filter else None,
                        with_tags=with_tags, with_filter=with_filter,
                        with_boost=with_boost,
                    )
                pending.append((db, out))

            score_maps = [dict() for _ in range(Q)]
            rest = np.full((Q,), -np.inf)
            for db, (s, i, nxt) in pending:
                s, i = np.asarray(s), np.asarray(i)
                rest = np.maximum(rest, np.asarray(nxt))
                for q in range(Q):
                    valid = (
                        (i[q] < db["n"])
                        & np.isfinite(s[q])
                        & (s[q] > NEG_SCORE * 0.5)
                    )
                    for sid, sc in zip(
                        db["slice_index"][i[q][valid]], s[q][valid]
                    ):
                        score_maps[q][int(sid)] = float(sc)

            cand_lists = [
                self._ordered_by_bound(
                    {
                        s: v
                        for s, v in score_maps[qi].items()
                        if v >= min_score - eps_q[qi]
                    }
                )
                for qi in range(Q)
            ]
            # round-based consume with fused similarity fetches (one
            # device_get per round for the whole batch instead of a tunnel
            # round trip per (query, step) — see _consume_rounds_many)
            sims_all = [dict() for _ in range(Q)]
            per_q = [[] for _ in range(Q)]
            pos = [0] * Q
            states_q = []
            for qi in range(Q):
                st = dict(states[qi])
                st["scores"] = score_maps[qi]
                states_q.append(st)
            self._consume_rounds_many(
                index, queries, qps, states_q, score_maps, cand_lists,
                per_q, pos, n, min_score, eps_q, sims_all,
                jnp.asarray(sim_multi) if plan_pack is None else None,
                tw_args, with_tags,
            )
            results = []
            retry = False
            for qi in range(Q):
                matches = per_q[qi]
                cut = max(self._nth_cut(matches, n, min_score) - eps_q[qi],
                          min_score - eps_q[qi])
                # provable cut: every unfetched slice's bound (hence its
                # exact score) sits below anything that can reach the top-k
                if not complete and rest[qi] >= cut:
                    retry = True
                    break
                matches.sort(
                    key=lambda mm: (
                        -mm.score,
                        int(packed.slice_doc[mm.slice_id]),
                        int(packed.slice_idx[mm.slice_id]),
                    )
                )
                results.append(matches[:n])
            if not retry:
                return results
            # unsafe cut: full coverage in one more round (complete=True
            # next pass) — avoids a fresh remote compile per doubling
            m = max(tok_d.shape[0] for _, tok_d, *_ in shards)

    def _find_batch_mesh_rwmd(
        self, index, queries, qps, sim_multi, mass_t, len_ts, states,
        n: int, min_score: float, mesh, max_score_t=None,
        tw_args=None, df_args=None, boosts=None,
        with_tags=False, with_filter=False, with_boost=False,
        plan_pack=None,
    ) -> List:
        """Mesh-sharded relaxed-WMD serving batch: per-bucket slice shards
        run the greedy transport fill, per-query top-k merges over one
        all-gather.  Shard scores RANK only (reported scores come from
        ``rwmd_score_host`` in the shared host rescore); the overfetch
        loop retries at full coverage whenever the merge's next-best
        bound reaches the slack-padded pool cut, so host-score membership
        is provably complete.  Tag weighting / doc filters / boosts ride
        the shard kernel like the single-chip batch."""
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        from vectorian_tpu.ops.search import order_by_score
        from vectorian_tpu.parallel.mesh import MeshSearch

        a = self._args
        engine = self._engine
        ms = mesh if isinstance(mesh, MeshSearch) else MeshSearch(mesh)
        Q = len(queries)
        if plan_pack is not None:
            table = None
            statics_r, smags_r, ctx_qs_r, weights_r = (
                self._replicate_plan_pack(ms, plan_pack)
            )
            # plan shards carry ctx stores and a per-bucket chunk (the
            # stacked-leaf eval + fills run in chunk-sized pieces)
            shards = [
                s
                for s in self._plan_mesh_shards(
                    ms, plan_pack, Q, with_tags, with_filter, with_boost,
                    boosts,
                )
            ]
        else:
            table = jax.device_put(sim_multi, NamedSharding(ms.mesh, P()))
            shards = [
                (db, tok_d, len_d, pos_d, tag_d, None, (), 0)
                for db, tok_d, len_d, pos_d, tag_d in index._mesh_shards(ms)
            ]
        mass_d = jnp.asarray(mass_t)
        if max_score_t is None:
            max_score_t = np.asarray(
                [float(q.n_tokens) for q in queries], np.float32
            )
        if tw_args is None:
            tw_args = self._tagw_args_multi([None] * Q, mass_t.shape[0], Q)
        if df_args is None:
            df_args = self._df_args(None)
        mst_d = ms.put_replicated(np.asarray(max_score_t, np.float32))
        tw_d = tuple(ms.put_replicated(np.asarray(x)) for x in tw_args)
        df_d = tuple(ms.put_replicated(np.asarray(x)) for x in df_args)
        if with_boost and plan_pack is None:
            shards = [
                (
                    db, tok_d, len_d, pos_d, tag_d,
                    jax.device_put(
                        self._bucket_boost_mat(
                            db, boosts, Q, int(tok_d.shape[0])
                        ),
                        ms._sharded,
                    ),
                    ctx_d, chunk,
                )
                for db, tok_d, len_d, pos_d, tag_d, _b, ctx_d, chunk
                in shards
            ]
        packed = engine.packed

        m = n + 32
        while True:
            pending = []
            complete = True
            for db, tok_d, len_d, pos_d, tag_d, bst_d, ctx_d, chunk in shards:
                complete = complete and m >= tok_d.shape[0]
                if plan_pack is not None:
                    out = ms.plan_transport_topk_multiquery(
                        plan_pack["plan"], tok_d, len_d, ctx_d,
                        statics_r, smags_r, ctx_qs_r, weights_r,
                        mass_d, len_ts, mst_d,
                        relaxed=True,
                        injective=bool(a["injective"]),
                        symmetric=bool(a["symmetric"]),
                        normalize_bow=bool(a["normalize_bow"]),
                        k=min(m, tok_d.shape[0]), chunk=chunk,
                        with_next=True,
                        pos_ids=pos_d, tag_ids=tag_d, boost=bst_d,
                        tw_args=tw_d if with_tags else None,
                        df_args=df_d if with_filter else None,
                        unique_masses=plan_pack["unique"],
                        with_tags=with_tags, with_filter=with_filter,
                        with_boost=with_boost,
                    )
                else:
                    out = ms.rwmd_topk_multiquery(
                        tok_d, len_d, table, mass_d, len_ts,
                        injective=bool(a["injective"]),
                        symmetric=bool(a["symmetric"]),
                        normalize_bow=bool(a["normalize_bow"]),
                        k=min(m, tok_d.shape[0]), with_next=True,
                        max_score_t=mst_d,
                        pos_ids=pos_d, tag_ids=tag_d,
                        boost=bst_d,
                        tw_args=tw_d if with_tags else None,
                        df_args=df_d if with_filter else None,
                        with_tags=with_tags, with_filter=with_filter,
                        with_boost=with_boost,
                    )
                pending.append((db, out))

            score_maps = [dict() for _ in range(Q)]
            rest = np.full((Q,), -np.inf)
            for db, (s, i, nxt) in pending:
                s, i = np.asarray(s), np.asarray(i)
                rest = np.maximum(rest, np.asarray(nxt))
                for q in range(Q):
                    valid = (i[q] < db["n"]) & np.isfinite(s[q])
                    for sid, sc in zip(
                        db["slice_index"][i[q][valid]], s[q][valid]
                    ):
                        score_maps[q][int(sid)] = float(sc)

            # rank-vs-report slack (see find()'s relaxed branch): shard
            # kernels RANK, rwmd_score_host REPORTS, so pools carry the
            # 3*eps slack that makes host-score membership provably
            # complete (any slice reaching the host n-th has device value
            # strictly above the cut; below-cut and unfetched slices
            # provably cannot)
            eps = RWMD_RANK_EPS * (
                max(
                    1.0,
                    max(
                        float(np.max(b)) for b in boosts if b is not None
                    ),
                )
                if with_boost
                else 1.0
            )
            tops = []
            retry = False
            for qi in range(Q):
                smap = score_maps[qi]
                cand = [
                    sid for sid, sc in smap.items()
                    if sc >= min_score - eps
                ]
                vals = np.asarray(
                    [smap[c] for c in cand], np.float64
                )
                nth_v = (
                    float(-np.partition(-vals, n - 1)[n - 1])
                    if len(cand) >= n
                    else float("-inf")
                )
                cut_pool = max(nth_v - 3 * eps, min_score - eps)
                # the merged shard top-k truncates at m per shard: unsafe
                # whenever an unfetched slice could still enter the pool
                if not complete and rest[qi] >= cut_pool:
                    retry = True
                    break
                if cand:
                    keep = vals >= cut_pool
                    cand_arr = np.asarray(cand, np.int64)[keep]
                    order = order_by_score(
                        packed, cand_arr, vals[keep]
                    )
                    tops.append([int(c) for c in cand_arr[order]])
                else:
                    tops.append([])
            if not retry:
                break
            # unsafe cut: full coverage in one more round (complete=True
            # next pass) — avoids a fresh remote compile per doubling
            m = max(tok_d.shape[0] for _, tok_d, *_ in shards)

        # one fused similarity fetch serves every query's flow rescore
        # (a blocking per-query fetch costs a tunnel round trip each)
        if plan_pack is not None:
            sims_all = self._sims_many_plan(
                [(qi, tops[qi]) for qi in range(Q)], qps, states
            )
        else:
            sims_all = self._sims_many_static(
                [(qi, tops[qi]) for qi in range(Q)],
                jnp.asarray(sim_multi), tw_args, with_tags,
            )
        results = []
        for qi, (query, qp) in enumerate(zip(queries, qps)):
            state = dict(states[qi])
            state["scores"] = score_maps[qi]
            results.append(
                self._relaxed_finalize(
                    index, query, qp, state, tops[qi], n, min_score, None,
                    sims_map=sims_all[qi],
                )
            )
        return results

    def _score(self, index, query, qp, doc_filter=None, device=False) -> dict:
        """Device ranking pass; returns scores plus the mass/tag/filter
        state the host rescore needs.  ``device=True`` leaves the per-bucket
        score matrices on device (state["scores"] is then a pending list
        for BucketTopKSource instead of a host vector)."""
        T = query.n_tokens
        engine = self._engine
        a = self._args
        # padded needle width (see index._find_transport): kernel shapes use
        # Tpad, masses beyond T are zero (masked by the transport solvers)
        Tpad = engine._plan_width(qp) if (qp.static_sims or qp.ctx_queries) else T
        # contextual (per-position) operands -> position-unique BOW entries
        # (reference similarity_dependency()==POSITION selects
        # UniqueTokensBOWBuilder, metric/alignment.h:551-576)
        unique = not qp.is_static_only
        # tag-weighted similarity -> (id, tag) BOW identity
        # (similarity_dependency()==TAGS -> TaggedTokenFactory,
        # metric/alignment.h:558-563 + bow.h:150-202); position-unique
        # subsumes it when a contextual operand is present
        tagw = index._tag_weighting(query, width=Tpad)
        tagged = tagw is not None and not unique
        mass_t = (
            np.ones((T,), np.float32)
            if unique
            else self._query_masses(query, tagged=tagged)
        )
        mass_t = np.pad(mass_t, (0, Tpad - T))
        mass_t_mag = None

        if self._algorithm == "word-movers-distance" and a["relaxed"]:
            scores = self._score_buckets_rwmd(
                qp, mass_t, T,
                bool(a["injective"]), bool(a["symmetric"]),
                bool(a["normalize_bow"]), unique, tagw,
                doc_filter=doc_filter, device=device,
            )
        elif self._algorithm == "word-movers-distance":
            # bound masses MUST mirror the exact host rescore's (same
            # bow/nbow normalization) — _emd_score_bound's guarantee is
            # relative to the masses the LP actually solves
            scores = self._score_buckets_emd(
                qp, mass_t, use_magnitudes=False,
                normalize=bool(a["normalize_bow"]),
                unique=unique, tagw=tagw, doc_filter=doc_filter,
                device=device,
            )
        elif self._algorithm == "word-rotators-distance":
            mass_t_mag = np.asarray(qp.ctx_queries[0]["magnitudes"], np.float32) if (
                unique and qp.ctx_queries
            ) else None
            if mass_t_mag is None:
                # static: needle magnitudes from the embedding rows
                mass_t_mag = self._static_needle_magnitudes(qp, query, index)
            scores = self._score_buckets_emd(
                qp, mass_t_mag, use_magnitudes=True,
                normalize=bool(a.get("normalize_magnitudes", True)),
                unique=unique, tagw=tagw, doc_filter=doc_filter,
                device=device,
            )
        else:
            raise ValueError(self._algorithm)

        return {
            "scores": scores,
            "mass_t": mass_t,
            "mass_t_mag": mass_t_mag,
            "tagw": tagw,
            "tagged": tagged,
            "unique": unique,
            "T": T,
            "doc_filter": doc_filter,
        }

    def _fetch_slice_sims(self, top, qp, tagw, sims_map):
        """[(Sw, Su)] per sid (batched device fetch, or the prefetched
        ``sims_map`` from ``_sims_many_static`` with a batched fetch for
        any missing sids)."""
        engine = self._engine
        if sims_map is None:
            return engine.batch_slice_similarity(top, qp, tag_weights=tagw)
        missing = [sid for sid in top if int(sid) not in sims_map]
        if missing:
            for sid, sims in zip(
                missing,
                engine.batch_slice_similarity(
                    missing, qp, tag_weights=tagw
                ),
            ):
                sims_map[int(sid)] = sims
        return [sims_map[int(sid)] for sid in top]

    def _slice_bow(self, sid, ids, ln, state):
        """(m_s, keep) for one slice: the doc-side BOW masses (dedup by id,
        (id, tag) when tag-weighted, per-position when contextual-unique)
        with the doc filter's FilteredSlice exclusion applied."""
        engine = self._engine
        doc_filter = state.get("doc_filter")
        keep = np.ones(ln, bool)
        if doc_filter is not None:
            # FilteredSlice: excluded doc tokens carry no mass and get
            # no flow edges (they render as gap regions)
            bi, r = engine._slice_loc[sid]
            db = engine._device_buckets[bi]
            pos_h = db["pos_np"][r][:ln].astype(np.int64)
            tag_h = db["tag_np"][r][:ln].astype(np.int64)
            keep = ~(
                doc_filter.pos_exclude[np.maximum(pos_h, 0)]
                | doc_filter.tag_exclude[np.maximum(tag_h, 0)]
                | doc_filter.token_exclude[np.maximum(ids, 0)]
            )
        if state["unique"]:
            m_s = keep.astype(np.float32)
        elif state["tagged"]:
            bi, r = engine._slice_loc[sid]
            tags = engine._device_buckets[bi]["tag_np"][r][:ln]
            m_s = dedup_masses(
                list(zip(ids.tolist(), tags.tolist())), keep
            )
        else:
            m_s = dedup_masses(ids, keep)
        return m_s, keep

    def _relaxed_finalize(
        self, index, query, qp, state, pool, n, min_score, debug,
        sims_map=None,
    ) -> List:
        """Relaxed-WMD finalize: REPORTED scores for the whole candidate
        pool via ``rwmd_score_host`` (the single shape-independent home —
        device vectors rank only), deterministic (score desc, doc, slice)
        order, then Match + flow extraction for the kept top-n ONLY (pools
        carry boundary slack, so building flows for every member would pay
        the python flow loops for candidates the order drops).  Returns
        the final ordered, min_score-filtered, n-truncated match list."""
        from vectorian_tpu.index import Match
        from vectorian_tpu.ops.search import order_by_score

        engine = self._engine
        packed = engine.packed
        a = self._args
        if not pool:
            return []
        mass_t = state["mass_t"]
        tagw = state["tagw"]
        T = state["T"]
        token_sim_name = index._args["metric"]["token_sim"].name
        max_score = tagw.total if tagw is not None else float(T)
        sims_list = self._fetch_slice_sims(pool, qp, tagw, sims_map)
        boost = state.get("boost")
        scores_arr = np.empty(len(pool), np.float64)
        per = {}
        for k, (sid, (Sw, Su)) in enumerate(zip(pool, sims_list)):
            tok, _ = engine._slice_tokens(sid)
            ln = int(packed.slice_len[sid])
            ids = tok[:ln]
            S = Sw[:, :T]  # [ln, T] (weighted == unmodified when no tags)
            D_ts = np.maximum(MAX_SIMILARITY - S.T, 0.0)  # [T, ln]
            m_s, _keep = self._slice_bow(sid, ids, ln, state)
            score = float(
                rwmd_score_host(
                    mass_t[:T], m_s, D_ts, bool(a["injective"]),
                    bool(a["symmetric"]), bool(a["normalize_bow"]),
                    max_score,
                )
            )
            if boost is not None:
                # boost multiplies every reported score (alignment.h:598);
                # same f32 multiply the ranking kernel applies on device
                score = float(np.float32(score) * np.float32(boost[sid]))
            scores_arr[k] = score
            per[int(sid)] = (D_ts, m_s, score)
        order = order_by_score(
            packed, np.asarray(pool, np.int64), scores_arr
        )
        ordered = [int(pool[j]) for j in order]
        kept = [sid for sid in ordered if per[sid][2] > min_score][:n]
        matches = []
        for sid in (ordered if debug else kept):
            D_ts, m_s, score = per[sid]
            m_t = mass_t[:T].copy()
            m_s_use = m_s.copy()
            if a["normalize_bow"]:
                m_t = m_t / max(m_t.sum(), 1e-9)
                m_s_use = m_s_use / max(m_s_use.sum(), 1e-9)
            edges = rwmd_flow_host(
                m_t, m_s_use, D_ts, bool(a["injective"]),
                normalize_bow=bool(a["normalize_bow"]),
            )
            if debug:
                debug(
                    "alignment/" + self._algorithm + "/solver",
                    {"slice": sid, "D": D_ts, "score": score,
                     "edges": edges},
                )
                if sid not in kept:
                    continue
            matches.append(
                Match(
                    index,
                    query,
                    slice_id=sid,
                    score=score,
                    metric=token_sim_name,
                    edge_list=edges,
                )
            )
        return matches

    def _host_rescore(
        self, index, query, qp, state, top, min_score, debug,
        sims_map=None, cut=None,
    ) -> List:
        """Exact host EMD rescore + flow extraction for the chosen slices
        (similarities batched: one device dispatch per bucket instead of a
        tunnel RTT per slice; relaxed WMD finalizes via
        ``_relaxed_finalize`` instead).  ``sims_map``: prefetched
        {sid: (Sw, Su)} from ``_sims_many_static`` — batched serving fuses
        the fetch across queries; sids missing from the map fetch here as
        usual."""
        from vectorian_tpu.index import Match

        engine = self._engine
        a = self._args
        mass_t = state["mass_t"]
        mass_t_mag = state["mass_t_mag"]
        tagw = state["tagw"]
        T = state["T"]

        matches = []
        token_sim_name = index._args["metric"]["token_sim"].name
        sims_list = self._fetch_slice_sims(top, qp, tagw, sims_map)
        # phase 1: per-candidate problem prep (masses + cost matrices)
        specs, d_list = [], []
        for sid, (Sw, Su) in zip(top, sims_list):
            tok, _ = engine._slice_tokens(sid)
            ln = int(engine.packed.slice_len[sid])
            ids = tok[:ln]
            S = Sw[:, :T]  # [ln, T] (weighted == unmodified when no tags)
            D_ts = np.maximum(MAX_SIMILARITY - S.T, 0.0)  # [T, ln]
            m_s, keep = self._slice_bow(sid, ids, ln, state)
            # exact EMD rescore (reference uses exact emd_hat)
            if self._algorithm == "word-rotators-distance":
                m_t = np.asarray(mass_t_mag[:T], np.float64)
                m_s_use = self._slice_magnitudes(qp, sid, ln)
                m_s_use = np.where(keep, m_s_use, 0.0)
                if a.get("normalize_magnitudes", True):
                    m_s_use = m_s_use / max(m_s_use.sum(), 1e-9)
                    m_t = m_t / max(m_t.sum(), 1e-9)
            else:
                m_t = mass_t[:T].copy()
                m_s_use = m_s
                if a["normalize_bow"]:
                    m_t = m_t / max(m_t.sum(), 1e-9)
                    m_s_use = m_s_use / max(m_s_use.sum(), 1e-9)
            specs.append(
                (m_t, m_s_use, D_ts, a.get("extra_mass_penalty", -1))
            )
            d_list.append(D_ts)
        # phase 1.5 (OPT-IN, VECTORIAN_DUAL_FILTER=1): Sinkhorn-dual score
        # upper bounds (balanced problems) provably discard candidates
        # that cannot reach ``cut`` (exact <= ub <= cut; boosts scale both
        # sides; validity is independent of Sinkhorn convergence).  The
        # bound is ~14x tighter than the greedy ranking bound (mean slack
        # 0.004 vs 0.058 on WRD-like problems), but the interleaved
        # on-TPU A/B measured the filter ~20% SLOWER end to end at Q=64 —
        # the threaded batch EMD (vn_emd_batch) already made the exact
        # solves cheaper than the filter's per-round numpy Sinkhorn — so
        # it stays off by default.  Re-A/B'd PER METRIC in round 5 for
        # WRD specifically (the largest contested band): 22.8 vs 19.6
        # ms/query against no-filter in the same window — still off.
        # Debug queries keep every solve (the solver payload hook
        # reports per slice).
        import os as _os

        if (
            cut is not None
            and debug is None
            and specs
            and _os.environ.get("VECTORIAN_DUAL_FILTER", "") in ("1", "true")
        ):
            ubs = _sinkhorn_dual_score_ub(specs)
            boost_v = state.get("boost")
            keep = []
            for j, (sid, ub) in enumerate(zip(top, ubs)):
                if ub is not None:
                    b = (
                        float(boost_v[sid]) if boost_v is not None else 1.0
                    )
                    if b >= 0.0 and ub * b + 1e-9 <= cut:
                        continue
                keep.append(j)
            if len(keep) < len(top):
                top = [top[j] for j in keep]
                sims_list = [sims_list[j] for j in keep]
                specs = [specs[j] for j in keep]
                d_list = [d_list[j] for j in keep]
        # phase 2: ONE threaded native solve for all candidates (the
        # python per-call loop ran the SSP solves single-threaded —
        # measured as the dominant term of full-WMD/WRD serving batches)
        solved = emd_score_batch(specs)
        # phase 3: flows -> Matches (unchanged arithmetic/order)
        for (sid, (Sw, Su)), (m_t, _m_s, D_ts, _e), (score, r) in zip(
            zip(top, sims_list), specs, solved
        ):
            if state.get("boost") is not None:
                # the exact EMD rescore recomputes the unboosted score, so
                # the boost multiplies here (alignment.h:598)
                score *= float(state["boost"][sid])
            edges = []
            if r.success:
                for i in range(r.flow.shape[0]):
                    max_flow = max(m_t[i], 1e-12)
                    for jj in np.flatnonzero(r.flow[i] > 1e-9):
                        edges.append(
                            (i, int(jj), float(r.flow[i, jj] / max_flow), float(D_ts[i, jj]))
                        )
            if debug:
                debug(
                    "alignment/" + self._algorithm + "/solver",
                    {"slice": sid, "D": D_ts, "score": score, "edges": edges},
                )
            if score <= min_score:  # strict (score > worst_score, alignment.h:284)
                continue
            matches.append(
                Match(
                    index,
                    query,
                    slice_id=sid,
                    score=score,
                    metric=token_sim_name,
                    edge_list=edges,
                )
            )
        return matches

    def _static_needle_magnitudes(self, qp, query, index) -> np.ndarray:
        """Needle-side WRD masses: the embedding-row magnitude per query
        token.  Corpus-OOV tokens keep their own encoder magnitude — the
        reference's query vocabulary interns every query token so none is
        massless (static.cpp fill_magnitudes_t over query-vocab ids)."""
        mags = np.asarray(qp.static_mags[0])
        ids = np.asarray(query.token_ids)
        out = np.where(ids >= 0, mags[np.maximum(ids, 0)], 0.0).astype(np.float32)
        oov = np.flatnonzero(ids < 0)
        if len(oov):
            token_sim = index._args["metric"]["token_sim"]
            emb = token_sim.embeddings[0]
            comp = index.session.compiled_embeddings[emb.name]
            enc = comp.encode_query([query.token_strings[i] for i in oov])
            out[oov] = np.asarray(enc.magnitudes, np.float32)
        width = self._engine._plan_width(qp)
        return np.pad(out, (0, max(width - len(out), 0)))

    def _slice_magnitudes(self, qp, sid, ln) -> np.ndarray:
        engine = self._engine
        if qp.is_static_only:
            if not hasattr(self, "_static_mags_np"):
                self._static_mags_np = np.asarray(qp.static_mags[0])
            tok, _ = engine._slice_tokens(sid)
            return self._static_mags_np[tok[:ln]].astype(np.float64)
        bi, r = engine._slice_loc[sid]
        name = qp.ctx_names[0]
        ctx = np.asarray(engine._ctx_stores[name][bi][r][:ln], dtype=np.float32)
        return np.linalg.norm(ctx, axis=-1).astype(np.float64)

    @staticmethod
    def _tagw_args(tagw, T):
        from vectorian_tpu.ops.search import TagWeightingSpec

        if tagw is None:
            return TagWeightingSpec.identity_args(T)
        return tagw.device_args()

    @staticmethod
    def _df_args(doc_filter):
        """Device args for the doc-side token filter; tiny inert dummies
        when absent (with_filter=False never reads them, they only placate
        the jit signature)."""
        if doc_filter is None:
            z = jnp.zeros((1,), bool)
            return (z, z, z)
        return (
            jnp.asarray(doc_filter.pos_exclude),
            jnp.asarray(doc_filter.tag_exclude),
            jnp.asarray(doc_filter.token_exclude),
        )

    def _score_buckets_rwmd(self, qp, mass_t, len_t, injective, symmetric,
                            normalize_bow, unique, tagw=None, doc_filter=None,
                            device=False):
        engine = self._engine
        tw = self._tagw_args(tagw, len(mass_t))
        df = self._df_args(doc_filter)
        max_score_t = tagw.total if tagw is not None else float(len_t)
        pending = []
        for bi, db in enumerate(engine._device_buckets):
            if db["n"] == 0:
                continue
            static_sims, static_mags, ctx, ctx_q, weights = engine._plan_args(qp, bi)
            scores = _bucket_rwmd_scores(
                qp.plan,
                db["tokens"],
                db["tok_sorted"],
                db["sort_inv"],
                db["pos"],
                db["tag"],
                db["lengths"],
                static_sims,
                static_mags,
                ctx,
                ctx_q,
                weights,
                jnp.asarray(mass_t),
                jnp.asarray(len_t, jnp.int32),
                jnp.asarray(max_score_t, jnp.float32),
                *tw,
                *df,
                injective=injective,
                symmetric=symmetric,
                normalize_bow=normalize_bow,
                chunk=db["chunk"],
                unique_masses=unique,
                with_tags=tagw is not None,
                with_filter=doc_filter is not None,
            )
            pending.append((db, scores))
        if device:
            # [n_pad] -> [n_pad, 1] so BucketTopKSource can rank in place
            return [(db, scores[:, None]) for db, scores in pending]
        out = np.full((engine.packed.n_slices,), NEG_SCORE, np.float32)
        for db, scores in pending:
            out[db["slice_index"]] = np.asarray(scores[: db["n"]])
        return out

    def _score_buckets_emd(self, qp, mass_t, use_magnitudes, normalize, unique,
                           tagw=None, doc_filter=None, device=False):
        engine = self._engine
        tw = self._tagw_args(tagw, len(mass_t))
        df = self._df_args(doc_filter)
        pending = []
        for bi, db in enumerate(engine._device_buckets):
            if db["n"] == 0:
                continue
            static_sims, static_mags, ctx, ctx_q, weights = engine._plan_args(qp, bi)
            scores = _bucket_emd_scores(
                qp.plan,
                db["tokens"],
                db["tok_sorted"],
                db["sort_inv"],
                db["pos"],
                db["tag"],
                db["lengths"],
                static_sims,
                static_mags,
                ctx,
                ctx_q,
                weights,
                jnp.asarray(mass_t, jnp.float32),
                *tw,
                *df,
                use_magnitudes=use_magnitudes,
                normalize_mass=normalize,
                chunk=db["chunk"],
                unique_masses=unique,
                with_tags=tagw is not None,
                with_filter=doc_filter is not None,
            )
            pending.append((db, scores))
        if device:
            return [(db, scores[:, None]) for db, scores in pending]
        out = np.full((engine.packed.n_slices,), NEG_SCORE, np.float32)
        for db, scores in pending:
            out[db["slice_index"]] = np.asarray(scores[: db["n"]])
        return out
