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
An injective monotone alignment matches each needle position at most
once and gap costs only subtract (all serving gap models are
nonnegative — checked by the caller), so with ``S[v, j]`` the needle
similarity column of vocab id v and ``t_c(v)`` the c-th largest value of
``relu(S[v, :len_t])``:

    raw(s)  <=  sum_v  sum_{c=1..tf_s(v)}  t_c(v)

— the c-th occurrence of a token can at best match the c-th best still
free needle position.  Occurrence depth matters: needles with REPEATED
common words have t_1 = t_2 = 1.0, and a depth-2 bound credits every
further duplicate 1.0 as well (measured on the 1M Zipf bench corpus:
min provable M ~112k for such queries, vs ~11k at full depth —
scripts/analyze_prefilter_bound.py).

Layout: frequency-ordered vocab ids (session.py) make "hot" a prefix.
Ids < H carry depth-4 occurrence-indicator columns [tf>=1..tf>=4] plus
an excess column (tf-4)+ weighted t_4; the Zipf tail is covered by
half-octave id-range groups with (distinct, duplicate) counts bounded by
each group's max t_1/t_2 — EXCLUDING the needle's own cold ids, which
are counted exactly in-kernel (an equality scan over the token plane)
and credited their true cumulative t_c sums.  The count matrix
``[N, 5H + 2G]`` int8 is built once per bucket ON DEVICE from the
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

# occurrence-indicator depth for hot ids (see module docstring)
DEPTH = 4
# max needle ids handled by the exact cold side-term; overflow ids simply
# stay in their group bound (sound, looser).  The side-term unrolls over
# this, so it stays small (distinct needle ids >= H are ~2-3 on Zipf
# queries)
NEEDLE_CAP = 16


def enabled() -> bool:
    return os.environ.get("VECTORIAN_PREFILTER", "1") not in (
        "0", "false", "off",
    )


def config():
    """(H hot-prefix size, M candidates kept per bucket, min bucket size).

    Defaults: H=256 costs ~1.3 KB/slice of HBM for the depth-4 count
    matrix; M=16384 covers the measured min provable M (~12k worst) on
    tie-heavy Zipf corpora; buckets below 4*M slices are scored in full
    (pruning there saves nothing)."""
    H = int(os.environ.get("VECTORIAN_PREFILTER_H", "256"))
    M = int(os.environ.get("VECTORIAN_PREFILTER_M", "32768"))
    min_n = int(os.environ.get("VECTORIAN_PREFILTER_MIN_N", str(4 * M)))
    return H, M, min_n


def cold_groups(H: int, V: int):
    """Half-octave id-range groups covering [H, V) (static, hashable)."""
    groups = []
    lo = H
    while lo < V:
        hi = min(max(int(lo * 1.5), lo + 1), V)
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
    """[N, 5H + 2G] int8 count matrix, built on device (the token arrays
    are already resident — a host-side build would pay a ~GB tunnel
    upload).  Layout: [tf>=1 | tf>=2 | tf>=3 | tf>=4 | (tf-4)+ for ids
    < H | cold distinct per group | cold duplicates per group].  Caller
    guarantees bucket capacity <= 127 so every count fits int8
    exactly."""
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
        parts = [
            (tf >= c).astype(jnp.int32) for c in range(1, DEPTH + 1)
        ]
        parts.append(jnp.maximum(tf - DEPTH, 0))
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


def _needle_sorted(sim_multi, lt_q):
    """[V, D] descending relu(S[v, :len_t]) maximised over the Q stacked
    queries, D = min(T*Q, DEPTH+1) columns (a superset's c-th largest
    dominates every query's own c-th largest, so one shared bound is
    valid for all Q)."""
    V, T, Q = sim_multi.shape
    mask = jnp.arange(T, dtype=jnp.int32)[None, :, None] < lt_q[None, None, :]
    S = jnp.where(mask, sim_multi.astype(jnp.float32), 0.0)
    S = jnp.maximum(S, 0.0).reshape(V, T * Q)
    D = min(T * Q, DEPTH + 1)
    if T * Q <= D:
        srt = jnp.sort(S, axis=1)[:, ::-1]
    else:
        srt = jax.lax.top_k(S, D)[0]
    if srt.shape[1] < DEPTH + 1:
        srt = jnp.pad(srt, ((0, 0), (0, DEPTH + 1 - srt.shape[1])))
    return srt  # [V, DEPTH+1] t1..t5 (relu'd, zero-padded)


def _round_up_bf16(x):
    """Minimal bf16 value >= the f32 input (nonnegative finite inputs):
    round-to-nearest, then bump by one ulp via the bit pattern exactly
    where the round went down.  A blanket (1 + 2^-7) scale-up costs
    ~0.8% bound inflation — enough to push tie-dense Zipf cuts past the
    provable-M budget (measured: 33% fallback at M=16k)."""
    b = x.astype(jnp.bfloat16)
    low = b.astype(jnp.float32) < x
    bits = jax.lax.bitcast_convert_type(b, jnp.uint16)
    bumped = jax.lax.bitcast_convert_type(
        (bits + 1).astype(jnp.uint16), jnp.bfloat16
    )
    return jnp.where(low, bumped, b)


def _ub_weights(srt, H: int, groups, needle_mask):
    """bf16 weight vector [5H + 2G] for the count GEMV: per-hot-id
    t_1..t_4 and the excess weight t_4; per-cold-group maxima of t_1/t_2
    with the needle's own (exactly-counted) ids masked out."""
    parts = [srt[:H, c] for c in range(DEPTH)]
    parts.append(srt[:H, DEPTH - 1])  # excess copies <= t_4
    if groups:
        t1m = jnp.where(needle_mask, 0.0, srt[:, 0])
        t2m = jnp.where(needle_mask, 0.0, srt[:, 1])
        parts.append(jnp.stack([jnp.max(t1m[lo:hi]) for lo, hi in groups]))
        parts.append(jnp.stack([jnp.max(t2m[lo:hi]) for lo, hi in groups]))
    return _round_up_bf16(jnp.concatenate(parts))


@functools.partial(
    jax.jit,
    static_argnames=("M", "H", "n", "locality", "general", "groups"),
)
def prefilter_select_score(
    cnt: jnp.ndarray,  # [n_pad, 5H+2G] i8 bucket count matrix
    tokens: jnp.ndarray,  # [n_pad, L] i32
    pos_all: jnp.ndarray,  # [n_pad, L] i8
    tag_all: jnp.ndarray,  # [n_pad, L] i16
    ln_all: jnp.ndarray,  # [n_pad] i32
    sidx: jnp.ndarray,  # [n_pad] i32 global slice ids
    sim_multi: jnp.ndarray,  # [V, T, Q] f32 stacked query tables
    lt_q: jnp.ndarray,  # [Q] i32
    norm_total: jnp.ndarray,  # [Q] f32
    needle_cold: jnp.ndarray,  # [NEEDLE_CAP] i32 needle ids >= H (-1 pad)
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
    """One fused dispatch: GEMV + exact needle-cold side-term upper
    bounds for all n slices -> top-M select -> compact the selected rows
    -> ranking-score DP on only those M slices.  Returns (scores [M, Q],
    tok/pos/tag/len/sid compacted, ub_rest = the (M+1)-th bound — a
    provable RAW-score ceiling on every pruned slice, for the caller's
    cut check).

    The ranking scores feed the UNCHANGED fused top-k + exact-rescore
    kernel (_topk_exact_rescore), so reported scores stay byte-identical
    to the unpruned serving path — ranking arithmetic only selects
    candidates, under the same eps-guarded membership rules."""
    V = sim_multi.shape[0]
    srt = _needle_sorted(sim_multi, lt_q)  # [V, DEPTH+1]
    nm_idx = jnp.where(needle_cold >= 0, needle_cold, V)  # pad -> dropped
    nm = jnp.zeros((V,), bool).at[nm_idx].set(True, mode="drop")
    uu = _ub_weights(srt, H, groups, nm)
    ub = jax.lax.dot_general(
        cnt[:n].astype(jnp.bfloat16),
        uu,
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [n] raw-score upper bounds (group part credits needle ids 0)

    # exact side-term for the needle's own cold ids: count occurrences
    # by per-id equality scans and credit the true cumulative t_c sums.
    # P is small and static, so the loop unrolls into fused VPU compares
    # — no [n, L, P] materialisation and no per-slice gather (a 2D
    # advanced-indexing select here measured ~70 ms at 1M slices)
    L = tokens.shape[1]
    valid = (
        jnp.arange(L, dtype=jnp.int32)[None, :] < ln_all[:n, None]
    )
    tokm = jnp.where(valid, tokens[:n], -1)
    cs_n = jnp.cumsum(srt, axis=1)[
        jnp.maximum(needle_cold, 0)
    ]  # [P, DEPTH+1] t1, t1+t2, ...
    tail = srt[jnp.maximum(needle_cold, 0), DEPTH]  # [P]
    P = needle_cold.shape[0]
    side = jnp.zeros((n,), jnp.float32)
    for p in range(P):
        occ = jnp.sum(tokm == needle_cold[p], axis=1, dtype=jnp.int32)
        occ_c = jnp.minimum(occ, DEPTH + 1)
        val = jnp.zeros((n,), jnp.float32)
        for c in range(1, DEPTH + 2):
            val = val + jnp.where(occ_c == c, cs_n[p, c - 1], 0.0)
        # occurrences beyond DEPTH+1 credit t_{DEPTH+1} each (valid:
        # the c-th occurrence value is nonincreasing in c)
        val = val + jnp.maximum(occ - (DEPTH + 1), 0) * tail[p]
        side = side + jnp.where(needle_cold[p] >= 0, val, 0.0)
    ub = ub + side

    vals_ub, sel = jax.lax.top_k(ub, M + 1)
    sel_m = sel[:M]
    ub_rest = vals_ub[M]
    tok_c = tokens[sel_m]
    pos_c = pos_all[sel_m]
    tag_c = tag_all[sel_m]
    ln_c = ln_all[sel_m].astype(jnp.int32)
    sid_c = sidx[sel_m]

    S = sim_multi[tok_c].astype(jnp.float32)  # [M, L, T, Q]
    T, Q = S.shape[2], S.shape[3]
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


def needle_cold_ids(token_id_lists, H: int) -> np.ndarray:
    """[NEEDLE_CAP] i32 array of the distinct needle table-row ids >= H
    across the stacked queries (-1 padded; overflow ids drop back to the
    group bound — sound, just looser)."""
    ids = sorted(
        {
            int(t)
            for ids in token_id_lists
            for t in np.asarray(ids).ravel()
            if int(t) >= H
        }
    )[:NEEDLE_CAP]
    out = np.full((NEEDLE_CAP,), -1, np.int32)
    out[: len(ids)] = ids
    return out


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
