"""Provable MXU prefilter: a device-side slice pruner for serving passes.

This is the TPU form of the reference's ``worst_score`` early-reject
(vectorian/core/cpp/result_set.h:32-38 + metric/alignment.h:284-293): the
reference skips a document the moment a cheap per-slice upper bound falls
below the current n-th score; here the analogous bound for EVERY slice of
a bucket is ONE int8xbf16 GEMV on the MXU, the top-M slices by bound are
compacted, and only they pay the vocab-row gather + DP — the per-index
gather issue rate (~2.2 ns/idx, scripts/profile_q1_pass.py) is the
single-query serving wall this removes.

The bound
---------
An injective monotone alignment matches each needle position at most once
and gap costs only subtract (all serving gap models are nonnegative —
checked by the caller), so for a slice s and needle similarity column
``S[v, j]`` (v = vocab id, j = needle position):

    raw(s)  <=  sum_v [ min(tf_s(v), 1) * top1(v) + max(tf_s(v)-1, 0) * top2(v) ]

where ``top1(v) >= top2(v)`` are the two largest values of
``relu(S[v, :len_t])``: the first occurrence of token v can at best match
its best needle position, and every further duplicate a DIFFERENT needle
position, so at best the second-best value.  (The plain ``tf * top1``
bound collapses on function words — a slice with five "the" would be
credited 5.0; this form credits 1.0 + 4*top2.)

Frequency-ordered vocab ids (session.py) make "hot" a prefix: ids < H
carry per-id (indicator, excess) int8 columns; the Zipf tail is covered
by doubling id-range groups [H,2H), [2H,4H), ... with per-group
(distinct, duplicate) counts bounded by the group's max top1/top2.  The
count matrix ``[N, 2H + 2G]`` is built once per bucket ON DEVICE from the
resident token arrays (no host upload) and reused by every query.

Soundness under quantization: counts are integers <= 127 (exact in
bfloat16); the weight vector is scaled by (1 + 2^-7) before the bf16
round so the rounded value can never fall below the f32 bound; MXU
accumulation is f32.  The caller still applies a relative epsilon when
comparing the pruned-region bound against the exact n-th score, and
falls back to the full corpus pass when the cut is not provable —
results are therefore byte-identical to the unpruned path
(tests/test_prefilter.py).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from vectorian_tpu.ops.alignment import (
    align_scores,
    align_scores_general,
)

NEG_SCORE = -1e30


def enabled() -> bool:
    return os.environ.get("VECTORIAN_PREFILTER", "1") not in (
        "0", "false", "off",
    )


def config():
    """(H hot-prefix size, M candidates kept per bucket, min bucket size).

    Defaults: H=512 costs ~1 KB/slice of HBM for the count matrix; M=8192
    keeps tie groups far from the cut on Zipf corpora; buckets below
    4*M slices are scored in full (pruning there saves nothing)."""
    H = int(os.environ.get("VECTORIAN_PREFILTER_H", "512"))
    M = int(os.environ.get("VECTORIAN_PREFILTER_M", "8192"))
    min_n = int(os.environ.get("VECTORIAN_PREFILTER_MIN_N", str(4 * M)))
    return H, M, min_n


def cold_groups(H: int, V: int):
    """Doubling id-range groups covering [H, V) (static, hashable)."""
    groups = []
    lo = H
    while lo < V:
        hi = min(lo * 2, V)
        groups.append((lo, hi))
        lo = hi
    return tuple(groups)


@functools.partial(jax.jit, static_argnames=("H", "groups", "chunk"))
def build_counts(
    tokens: jnp.ndarray,  # [N, L] i32 (PAD rows allowed; masked by lengths)
    lengths: jnp.ndarray,  # [N] i32
    H: int,
    groups,
    chunk: int,
):
    """[N, 2H + 2G] int8 count matrix, built on device (the token arrays
    are already resident — a host-side build would pay a ~GB tunnel
    upload).  Layout: [hot indicator | hot excess | cold distinct per
    group | cold duplicates per group].  Caller guarantees bucket
    capacity <= 127 so every count fits int8 exactly."""
    N, L = tokens.shape
    n_chunks = N // chunk
    iota_l = jnp.arange(L, dtype=jnp.int32)
    hot_ids = jnp.arange(H, dtype=jnp.int32)

    def one(args):
        tok, ln = args  # [c, L], [c]
        valid = iota_l[None, :] < ln[:, None]
        tokm = jnp.where(valid, tok, -1)
        tf = jnp.sum(
            tokm[:, :, None] == hot_ids[None, None, :],
            axis=1,
            dtype=jnp.int32,
        )  # [c, H]
        parts = [jnp.minimum(tf, 1), jnp.maximum(tf - 1, 0)]
        if groups:
            ts = jnp.sort(tokm, axis=1)
            new = jnp.concatenate(
                [
                    jnp.ones((ts.shape[0], 1), bool),
                    ts[:, 1:] != ts[:, :-1],
                ],
                axis=1,
            )
            dis, dup = [], []
            for lo, hi in groups:
                ing = (ts >= lo) & (ts < hi)
                tot = jnp.sum(ing, axis=1, dtype=jnp.int32)
                d = jnp.sum(ing & new, axis=1, dtype=jnp.int32)
                dis.append(d)
                dup.append(tot - d)
            parts.append(jnp.stack(dis, axis=1))
            parts.append(jnp.stack(dup, axis=1))
        return jnp.concatenate(parts, axis=1).astype(jnp.int8)

    xs = (
        tokens.reshape(n_chunks, chunk, L),
        lengths.astype(jnp.int32).reshape(n_chunks, chunk),
    )
    return jax.lax.map(one, xs).reshape(N, -1)


def _ub_weights(sim_multi, lt_q, H: int, groups):
    """bf16 weight vector [2H + 2G] for the count GEMV: per-hot-id
    (top1, top2) of relu(S[v, :len_t]) maximized over the Q stacked
    queries (a superset's top-2 dominates every query's own top-2, so one
    shared bound is valid for all Q), per-cold-group maxima of each.
    Scaled up by 2^-7 relative before the bf16 round so quantization can
    only loosen the bound."""
    V, T, Q = sim_multi.shape
    mask = jnp.arange(T, dtype=jnp.int32)[None, :, None] < lt_q[None, None, :]
    S = jnp.where(mask, sim_multi.astype(jnp.float32), -jnp.inf)
    flat = S.reshape(V, T * Q)
    if T * Q >= 2:
        top2 = jax.lax.top_k(flat, 2)[0]
        t1 = jnp.maximum(top2[:, 0], 0.0)
        t2 = jnp.maximum(top2[:, 1], 0.0)
    else:
        # a one-position needle matches each slice at most once: every
        # duplicate's best remaining needle position is empty
        t1 = jnp.maximum(flat[:, 0], 0.0)
        t2 = jnp.zeros_like(t1)
    parts = [t1[:H], t2[:H]]
    if groups:
        parts.append(jnp.stack([jnp.max(t1[lo:hi]) for lo, hi in groups]))
        parts.append(jnp.stack([jnp.max(t2[lo:hi]) for lo, hi in groups]))
    uu = jnp.concatenate(parts)
    return (uu * (1.0 + 2.0 ** -7)).astype(jnp.bfloat16)


@functools.partial(
    jax.jit,
    static_argnames=("M", "H", "n", "locality", "general", "groups"),
)
def prefilter_select_score(
    cnt: jnp.ndarray,  # [n_pad, 2H+2G] i8 bucket count matrix
    tokens: jnp.ndarray,  # [n_pad, L] i32
    pos_all: jnp.ndarray,  # [n_pad, L] i8
    tag_all: jnp.ndarray,  # [n_pad, L] i16
    ln_all: jnp.ndarray,  # [n_pad] i32
    sidx: jnp.ndarray,  # [n_pad] i32 global slice ids
    sim_multi: jnp.ndarray,  # [V, T, Q] f32 stacked query tables
    lt_q: jnp.ndarray,  # [Q] i32
    norm_total: jnp.ndarray,  # [Q] f32
    gaps,
    gv_s: jnp.ndarray,  # [L+1] general-gap cost vector (zeros if affine)
    gv_t: jnp.ndarray,  # [T+1]
    M: int,
    H: int,
    n: int,
    locality: str,
    general: bool,
    groups,
):
    """One fused dispatch: GEMV upper bounds for all n slices -> top-M
    select -> compact the selected rows -> ranking-score DP on only those
    M slices.  Returns (scores [M, Q], tok/pos/tag/len/sid compacted,
    ub_rest = the (M+1)-th bound — a provable RAW-score ceiling on every
    pruned slice, for the caller's cut check).

    The ranking scores feed the UNCHANGED fused top-k + exact-rescore
    kernel (_topk_exact_rescore), so reported scores stay byte-identical
    to the unpruned serving path — ranking arithmetic only selects
    candidates, under the same eps-guarded membership rules."""
    uu = _ub_weights(sim_multi, lt_q, H, groups)
    ub = jax.lax.dot_general(
        cnt[:n].astype(jnp.bfloat16),
        uu,
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [n] raw-score upper bounds
    vals_ub, sel = jax.lax.top_k(ub, M + 1)
    sel_m = sel[:M]
    ub_rest = vals_ub[M]
    tok_c = tokens[sel_m]
    pos_c = pos_all[sel_m]
    tag_c = tag_all[sel_m]
    ln_c = ln_all[sel_m].astype(jnp.int32)
    sid_c = sidx[sel_m]

    S = sim_multi[tok_c].astype(jnp.float32)  # [M, L, T, Q]
    L, T, Q = S.shape[1], S.shape[2], S.shape[3]
    SQ = jnp.transpose(S, (0, 3, 1, 2)).reshape(M * Q, L, T)
    ln_rep = jnp.repeat(jnp.maximum(ln_c, 1), Q)
    lt_rep = jnp.tile(lt_q, M)
    if general:
        raw = align_scores_general.__wrapped__(
            SQ, ln_rep, lt_rep, gv_s, gv_t, locality
        )
    else:
        raw = align_scores.__wrapped__(SQ, ln_rep, lt_rep, gaps, locality)
    scores = raw.reshape(M, Q) / jnp.maximum(norm_total[None, :], 1e-9)
    scores = jnp.where(ln_c[:, None] > 0, scores, NEG_SCORE)
    return scores, tok_c, pos_c, tag_c, ln_c, sid_c, ub_rest


def gaps_nonneg(gaps, gap_costs, cap: int, tpad: int) -> bool:
    """True when the gap model provably only subtracts score — the bound
    above requires it.  Affine params must be CONCRETE host scalars
    (interactive runtime-array gaps could be negative at serve time, and
    reading them back would block on the tunnel); general-gap cost
    vectors are host-built and checked directly."""
    from vectorian_tpu.ops.search import gap_vec

    if gap_costs is not None:
        return bool(
            np.all(gap_vec(gap_costs[0], cap + 1) >= 0)
            and np.all(gap_vec(gap_costs[1], tpad + 1) >= 0)
        )
    return all(
        isinstance(g, (int, float, np.floating)) and float(g) >= 0.0
        for g in gaps
    )
