"""Batched sequence-alignment DP on TPU.

TPU-native replacement for the reference's per-slice pyalign solvers
(reference: vectorian/core/cpp/metric/alignment.h, pyalign SolverImpl used at
metric/alignment.h:242-304).  Instead of solving one (slice x query) dynamic
program at a time on a CPU thread, we solve thousands at once: the batch axis
(independent sentence slices) is the vector axis the VPU parallelises over,
and the sequential `lax.scan` runs over document-token rows.

Algorithm
---------
Gotoh-style affine-gap alignment (covers the reference's ConstantGapCost,
LinearGapCost and affine gap models; cost of a gap of length k is
``open + extend * (k - 1)``).  The classic recurrence

    E[i,j] = max(H[i,j-1] - open_t, E[i,j-1] - extend_t)     (gap consuming t)
    F[i,j] = max(H[i-1,j] - open_s, F[i-1,j] - extend_s)     (gap consuming s)
    H[i,j] = max(H[i-1,j-1] + S[i-1,j-1], E[i,j], F[i,j][, 0 if local])

has a within-row sequential dependency through E.  Substituting
``H = max(C, E)`` with ``C = max(diag, F[, floor])`` gives the *exact*
first-order max-plus recurrence

    E[j] = max(C[j-1] - open_t, E[j-1] - min(open_t, extend_t))

which is a decayed prefix maximum along j — associative, solved in
O(log len_t) doubling steps of full-width vector ops.  Each scan step is
therefore purely data-parallel over [B, len_t+1].

Localities (reference: vectorian/core/cpp/metric/alignment.h:803-814 and
pyalign Locality GLOBAL/SEMIGLOBAL/LOCAL):

  * local      — zero floor, score = max over all cells (Smith-Waterman)
  * global     — boundaries pay gap costs, score = H[len_s, len_t] (NW)
  * semiglobal — free end gaps, score = max over last row and last column

Variable lengths are handled with per-problem ``len_s``/``len_t`` masks so a
single compiled kernel serves a whole padded length bucket.  Gap parameters
are runtime scalars (traced values) so interactive queries never recompile —
the reference's core interactivity contract (README.md:18-19).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

NEG = -1e30

LOCAL = "local"
GLOBAL = "global"
SEMIGLOBAL = "semiglobal"
LOCALITIES = (LOCAL, GLOBAL, SEMIGLOBAL)


class AffineGapParams(NamedTuple):
    """Affine gap parameters per side; cost(k) = open + extend * (k-1).

    ``s`` is the document side (gap = unaligned document token), ``t`` the
    query side, matching the reference's per-side gap dicts
    (vectorian/alignment.py:78-97 {'s':..,'t':..}).
    All four entries may be python floats or traced jnp scalars.
    """

    open_s: jnp.ndarray
    extend_s: jnp.ndarray
    open_t: jnp.ndarray
    extend_t: jnp.ndarray

    @staticmethod
    def of(open_s, extend_s, open_t, extend_t) -> "AffineGapParams":
        def f(x):
            # concrete params stay HOST scalars: the serving flow loop
            # reads them per survivor (float(gaps.open_s) in the native
            # traceback), and a jnp scalar costs a blocking device read
            # each — 4 reads x ~10 top-k survivors measured ~100 ms of a
            # 206 ms warm 1M-slice find() through the tunnel
            # (LATENCY_r04.json fin.r3).  jit treats np.float32 operands
            # identically to jnp scalars (traced 0-d arrays, value
            # changes never recompile).
            if isinstance(x, (int, float, np.floating)):
                return np.float32(x)
            return jnp.asarray(x, jnp.float32)

        return AffineGapParams(f(open_s), f(extend_s), f(open_t), f(extend_t))


def _boundary_costs(n1: int, open_, extend_):
    """[0, cost(1), cost(2), ...] of length n1 (cost(k)=open+(k-1)*extend)."""
    k = jnp.arange(n1, dtype=jnp.float32)
    return jnp.where(k > 0, open_ + (k - 1.0) * extend_, 0.0)


def _decayed_prefix_max(x: jnp.ndarray, decay: jnp.ndarray) -> jnp.ndarray:
    """out[..., j] = max_{k<=j} (x[..., k] - decay * (j - k)).

    Exact associative doubling: log2(n) vector steps.
    """
    n = x.shape[-1]
    out = x
    shift = 1
    while shift < n:
        shifted = jnp.pad(
            out[..., :-shift],
            [(0, 0)] * (out.ndim - 1) + [(shift, 0)],
            constant_values=NEG,
        )
        out = jnp.maximum(out, shifted - decay * shift)
        shift *= 2
    return out


@functools.partial(jax.jit, static_argnames=("locality", "with_position"))
def align_scores(
    similarity: jnp.ndarray,  # [B, Ls, Lt] f32
    len_s: jnp.ndarray,  # [B] i32, 1 <= len_s <= Ls
    len_t: jnp.ndarray,  # [B] i32, 1 <= len_t <= Lt
    gaps: AffineGapParams,
    locality: str = LOCAL,
    with_position: bool = False,
):
    """Raw alignment scores for a batch of independent DP problems.

    Returns ``scores [B]`` (and, if ``with_position``, the [B, 2] (i, j)
    1-based cell at which the optimal alignment ends — the traceback seed).
    """
    if locality not in LOCALITIES:
        raise ValueError(f"unknown locality {locality!r}")
    B, Ls, Lt = similarity.shape
    T1 = Lt + 1
    f32 = jnp.float32
    similarity = similarity.astype(f32)
    len_s = len_s.astype(jnp.int32)
    len_t = len_t.astype(jnp.int32)

    open_s, extend_s, open_t, extend_t = (jnp.asarray(g, f32) for g in gaps)
    decay_t = jnp.minimum(open_t, extend_t)

    jj = jnp.arange(T1, dtype=jnp.int32)  # [T1]
    # valid interior columns per problem: 1 <= j <= len_t
    jmask = (jj[None, :] >= 1) & (jj[None, :] <= len_t[:, None])  # [B, T1]

    if locality == GLOBAL:
        init_row = -_boundary_costs(T1, open_t, extend_t)[None, :] * jnp.ones((B, 1), f32)
    else:
        init_row = jnp.zeros((B, T1), f32)

    def init_col_val(i):
        # H[i, 0] boundary value for row i >= 1.
        if locality == GLOBAL:
            return -(open_s + (i - 1.0) * extend_s)
        return jnp.asarray(0.0, f32)

    def row_step(carry, xs):
        H_prev, F_prev, best, best_pos = carry
        s_row, i = xs  # s_row: [B, Lt]; i: scalar row index (1-based)

        # Diagonal move into (i, j): H[i-1, j-1] + S[i-1, j-1]
        M = jnp.concatenate(
            [jnp.full((B, 1), NEG, f32), H_prev[:, :-1] + s_row], axis=1
        )
        # Vertical move (gap in s): from row i-1, same column.
        F = jnp.maximum(H_prev - open_s, F_prev - extend_s)
        C = jnp.maximum(M, F)
        if locality == LOCAL:
            C = jnp.maximum(C, 0.0)
        # Boundary column j = 0.
        C = C.at[:, 0].set(init_col_val(i.astype(f32)))
        # Horizontal moves (gap in t) via decayed prefix max, exact Gotoh.
        X = jnp.concatenate([jnp.full((B, 1), NEG, f32), C[:, :-1] - open_t], axis=1)
        E = _decayed_prefix_max(X, decay_t)
        H = jnp.maximum(C, E)

        # --- score reductions ---
        Hm = jnp.where(jmask, H, NEG)  # interior, per-problem-valid cells
        row_valid = i <= len_s  # [B]
        if locality == LOCAL:
            row_max = jnp.max(Hm, axis=1)
            row_arg = jnp.argmax(Hm, axis=1).astype(jnp.int32)
            improved = row_valid & (row_max > best)
            best = jnp.where(improved, row_max, best)
            if with_position:
                best_pos = jnp.where(
                    improved[:, None],
                    jnp.stack([jnp.full((B,), i, jnp.int32), row_arg], axis=1),
                    best_pos,
                )
        elif locality == GLOBAL:
            h_end = jnp.take_along_axis(H, len_t[:, None], axis=1)[:, 0]
            hit = i == len_s
            best = jnp.where(hit, h_end, best)
            if with_position:
                best_pos = jnp.where(
                    hit[:, None], jnp.stack([len_s, len_t], axis=1), best_pos
                )
        else:  # SEMIGLOBAL: max over last row and last column
            h_lastcol = jnp.take_along_axis(H, len_t[:, None], axis=1)[:, 0]
            improved_c = row_valid & (h_lastcol > best)
            best = jnp.where(improved_c, h_lastcol, best)
            if with_position:
                best_pos = jnp.where(
                    improved_c[:, None],
                    jnp.stack([jnp.full((B,), i, jnp.int32), len_t], axis=1),
                    best_pos,
                )
            row_max = jnp.max(Hm, axis=1)
            row_arg = jnp.argmax(Hm, axis=1).astype(jnp.int32)
            improved_r = (i == len_s) & (row_max > best)
            best = jnp.where(improved_r, row_max, best)
            if with_position:
                best_pos = jnp.where(
                    improved_r[:, None],
                    jnp.stack([jnp.full((B,), i, jnp.int32), row_arg], axis=1),
                    best_pos,
                )

        return (H, F, best, best_pos), None

    if locality == LOCAL:
        best0 = jnp.zeros((B,), f32)  # empty alignment scores 0
    elif locality == GLOBAL:
        # degenerate len_s handled in-loop; init with NEG
        best0 = jnp.full((B,), NEG, f32)
    else:
        # semiglobal row 0 contributes H[0, len_t] = 0 (skip all of s)
        best0 = jnp.zeros((B,), f32)
    best_pos0 = jnp.zeros((B, 2), jnp.int32)
    F0 = jnp.full((B, T1), NEG, f32)

    xs = (jnp.moveaxis(similarity, 1, 0), jnp.arange(1, Ls + 1, dtype=jnp.int32))
    (H, F, best, best_pos), _ = jax.lax.scan(
        row_step, (init_row, F0, best0, best_pos0), xs
    )
    if with_position:
        return best, best_pos
    return best


@functools.partial(jax.jit, static_argnames=("locality",))
def align_matrices(
    similarity: jnp.ndarray,  # [B, Ls, Lt]
    gaps: AffineGapParams,
    locality: str = LOCAL,
):
    """Full H/E/F DP matrices ([B, Ls+1, Lt+1]) for traceback.

    Only intended for the small top-k rescore batch (mirrors the reference's
    finalizer trick: vectorian/core/cpp/match/matcher_impl.h:172-174 computes
    per-edge flow data only for surviving matches).
    """
    B, Ls, Lt = similarity.shape
    T1 = Lt + 1
    f32 = jnp.float32
    similarity = similarity.astype(f32)
    open_s, extend_s, open_t, extend_t = (jnp.asarray(g, f32) for g in gaps)
    decay_t = jnp.minimum(open_t, extend_t)

    if locality == GLOBAL:
        init_row = -_boundary_costs(T1, open_t, extend_t)[None, :] * jnp.ones((B, 1), f32)
    else:
        init_row = jnp.zeros((B, T1), f32)

    def init_col_val(i):
        if locality == GLOBAL:
            return -(open_s + (i - 1.0) * extend_s)
        return jnp.asarray(0.0, f32)

    def row_step(carry, xs):
        H_prev, F_prev = carry
        s_row, i = xs
        M = jnp.concatenate(
            [jnp.full((B, 1), NEG, f32), H_prev[:, :-1] + s_row], axis=1
        )
        F = jnp.maximum(H_prev - open_s, F_prev - extend_s)
        C = jnp.maximum(M, F)
        if locality == LOCAL:
            C = jnp.maximum(C, 0.0)
        C = C.at[:, 0].set(init_col_val(i.astype(f32)))
        X = jnp.concatenate([jnp.full((B, 1), NEG, f32), C[:, :-1] - open_t], axis=1)
        E = _decayed_prefix_max(X, decay_t)
        H = jnp.maximum(C, E)
        return (H, F), (H, E, F)

    xs = (jnp.moveaxis(similarity, 1, 0), jnp.arange(1, Ls + 1, dtype=jnp.int32))
    F0 = jnp.full((B, T1), NEG, f32)
    (_, _), (Hs, Es, Fs) = jax.lax.scan(row_step, (init_row, F0), xs)
    # prepend row 0
    H = jnp.concatenate([init_row[:, None, :], jnp.moveaxis(Hs, 0, 1)], axis=1)
    E = jnp.concatenate(
        [jnp.full((B, 1, T1), NEG, f32), jnp.moveaxis(Es, 0, 1)], axis=1
    )
    F = jnp.concatenate(
        [jnp.full((B, 1, T1), NEG, f32), jnp.moveaxis(Fs, 0, 1)], axis=1
    )
    return H, E, F


def gap_cost_closure(w: jnp.ndarray) -> jnp.ndarray:
    """Min-plus transitive closure of a gap-cost vector: W*[g] = min over
    compositions g = g1+..+gk of sum w[gi].

    WSB semantics allow a "gap" to be any chain of gaps (the recurrence
    maxes over *final* H values, which may themselves end in gaps — see
    tests/oracle.wsb_align).  Replacing w by W* makes a single
    shifted-max pass over gap lengths exact, removing the sequential
    within-row column loop.  O(n^2 log n), tiny (n = padded length + 1).
    """
    n1 = w.shape[0]
    idx = jnp.arange(n1)
    diff = idx[None, :] - idx[:, None]  # [a, g] -> g - a
    valid = (diff >= 1) & (idx[:, None] >= 1)

    def round_(W, _):
        # Z[a, g] = W[a] + W[g-a] for 1 <= a < g
        Z = jnp.where(valid, W[:, None] + W[jnp.maximum(diff, 0)], jnp.inf)
        return jnp.minimum(W, jnp.min(Z, axis=0)), None

    # CONSTANT round count for every width: each round's update is
    # prefix-causal (W[g] reads only W[0..g]), so equal round counts make
    # closure prefixes bit-identical across padded widths — a width-derived
    # count tightens a shared entry by ~1 ulp via an extra round's
    # differently-associated composition sum (measured ~4e-6 between
    # widths 256 and 257), breaking the byte-equality between
    # per-query-width and batch-padded general-gap rescores.  16 rounds
    # close every gap length up to 2^16 (queries are sentences — needle
    # widths sit orders of magnitude below that); wider vectors take the
    # width-derived count (unreachable in practice, noted discontinuity).
    rounds = max(int(np.ceil(np.log2(max(n1 - 1, 1)))), 1)
    rounds = 16 if n1 - 1 <= (1 << 16) else rounds
    W, _ = jax.lax.scan(round_, w, None, length=rounds)
    return W


def _general_row_h(C, w_closure, T1):
    """H = max(C, max_g shift(C, g) - W*[g]) along the last axis — the
    single-pass horizontal-gap solution (exact given closure costs)."""
    H = C
    for g in range(1, T1):
        shifted = jnp.pad(
            C[..., :-g], [(0, 0)] * (C.ndim - 1) + [(g, 0)],
            constant_values=NEG,
        )
        H = jnp.maximum(H, shifted - w_closure[g])
    return H


@functools.partial(jax.jit, static_argnames=("locality",))
def align_matrices_scores(similarity, len_s, len_t, gaps, locality=LOCAL):
    """H/E/F matrices AND raw scores in ONE dispatch (the finalizer needs
    both; separate calls cost an extra host round trip on tunneled
    runtimes).  Scores are computed by the exact align_scores recurrence,
    so they are bit-identical to the scoring path."""
    H, E, F = align_matrices.__wrapped__(similarity, gaps, locality)
    raw = align_scores.__wrapped__(similarity, len_s, len_t, gaps, locality)
    return H, E, F, raw


@functools.partial(jax.jit, static_argnames=("locality",))
def align_matrices_scores_general(
    similarity, len_s, len_t, gap_vec_s, gap_vec_t, locality=LOCAL
):
    """General-gap analogue of align_matrices_scores (one dispatch)."""
    H = align_matrices_general.__wrapped__(
        similarity, gap_vec_s, gap_vec_t, locality
    )
    raw = align_scores_general.__wrapped__(
        similarity, len_s, len_t, gap_vec_s, gap_vec_t, locality
    )
    return H, raw


@functools.partial(jax.jit, static_argnames=("locality", "with_position"))
def align_scores_general(
    similarity: jnp.ndarray,  # [B, Ls, Lt]
    len_s: jnp.ndarray,  # [B]
    len_t: jnp.ndarray,  # [B]
    gap_vec_s: jnp.ndarray,  # [Ls+1] cost of a gap of length k in s
    gap_vec_t: jnp.ndarray,  # [Lt+1]
    locality: str = LOCAL,
    with_position: bool = False,
):
    """Waterman-Smith-Beyer alignment with *arbitrary* per-length gap costs
    (the reference's O(n^3) general-gap case, alignment.py:54-55 and the
    pyalign GeneralGapCost solvers).

    H[i,j] = max(diag, max_g H[i-g,j] - w_s[g], max_g H[i,j-g] - w_t[g]
                 [, 0 local]).

    Cost: O(Ls * (Ls + Lt^2)) vector steps over [B, Lt+1] — the exact slow
    path for exponential/custom gap models; affine models use align_scores.
    """
    if locality not in LOCALITIES:
        raise ValueError(f"unknown locality {locality!r}")
    B, Ls, Lt = similarity.shape
    T1 = Lt + 1
    S1 = Ls + 1
    f32 = jnp.float32
    similarity = similarity.astype(f32)
    len_s = len_s.astype(jnp.int32)
    len_t = len_t.astype(jnp.int32)
    w_s = gap_vec_s.astype(f32)
    w_t = gap_vec_t.astype(f32)

    jj = jnp.arange(T1, dtype=jnp.int32)
    jmask = (jj[None, :] >= 1) & (jj[None, :] <= len_t[:, None])

    if locality == GLOBAL:
        init_row = jnp.broadcast_to(-w_t[:T1][None, :], (B, T1)).at[:, 0].set(0.0)
    else:
        init_row = jnp.zeros((B, T1), f32)

    # single-pass horizontal gaps need the closure costs (see gap_cost_closure)
    w_t_star = gap_cost_closure(w_t)

    # all previous rows live in the carry: Hall [S1, B, T1]
    Hall0 = jnp.full((S1, B, T1), NEG, f32).at[0].set(init_row)
    rr = jnp.arange(S1, dtype=jnp.int32)

    def row_step(carry, xs):
        Hall, best, best_pos = carry
        s_row, i = xs  # i: 1-based row

        # vertical: max over r < i of Hall[r] - w_s[i - r] (chains of
        # vertical gaps are exact through the stored final rows)
        cost_r = jnp.where(rr < i, w_s[jnp.maximum(i - rr, 0)], jnp.inf)
        V = jnp.max(Hall - cost_r[:, None, None], axis=0)  # [B, T1]

        H_prev = Hall[i - 1]
        M = jnp.concatenate(
            [jnp.full((B, 1), NEG, f32), H_prev[:, :-1] + s_row], axis=1
        )
        C = jnp.maximum(M, V)
        if locality == LOCAL:
            C = jnp.maximum(C, 0.0)
        if locality == GLOBAL:
            C = C.at[:, 0].set(-w_s[jnp.minimum(i, Ls)])
        else:
            C = C.at[:, 0].set(0.0)

        H = _general_row_h(C, w_t_star, T1)
        Hall = Hall.at[i].set(H)

        Hm = jnp.where(jmask, H, NEG)
        row_valid = i <= len_s
        if locality == LOCAL:
            row_max = jnp.max(Hm, axis=1)
            row_arg = jnp.argmax(Hm, axis=1).astype(jnp.int32)
            improved = row_valid & (row_max > best)
            best = jnp.where(improved, row_max, best)
            if with_position:
                best_pos = jnp.where(
                    improved[:, None],
                    jnp.stack([jnp.full((B,), i, jnp.int32), row_arg], axis=1),
                    best_pos,
                )
        elif locality == GLOBAL:
            h_end = jnp.take_along_axis(H, len_t[:, None], axis=1)[:, 0]
            hit = i == len_s
            best = jnp.where(hit, h_end, best)
            if with_position:
                best_pos = jnp.where(
                    hit[:, None], jnp.stack([len_s, len_t], axis=1), best_pos
                )
        else:
            h_lastcol = jnp.take_along_axis(H, len_t[:, None], axis=1)[:, 0]
            improved_c = row_valid & (h_lastcol > best)
            best = jnp.where(improved_c, h_lastcol, best)
            if with_position:
                best_pos = jnp.where(
                    improved_c[:, None],
                    jnp.stack([jnp.full((B,), i, jnp.int32), len_t], axis=1),
                    best_pos,
                )
            row_max = jnp.max(Hm, axis=1)
            row_arg = jnp.argmax(Hm, axis=1).astype(jnp.int32)
            improved_r = (i == len_s) & (row_max > best)
            best = jnp.where(improved_r, row_max, best)
            if with_position:
                best_pos = jnp.where(
                    improved_r[:, None],
                    jnp.stack([jnp.full((B,), i, jnp.int32), row_arg], axis=1),
                    best_pos,
                )
        return (Hall, best, best_pos), None

    if locality == LOCAL:
        best0 = jnp.zeros((B,), f32)
    elif locality == GLOBAL:
        best0 = jnp.full((B,), NEG, f32)
    else:
        best0 = jnp.zeros((B,), f32)
    best_pos0 = jnp.zeros((B, 2), jnp.int32)

    xs = (jnp.moveaxis(similarity, 1, 0), jnp.arange(1, Ls + 1, dtype=jnp.int32))
    (Hall, best, best_pos), _ = jax.lax.scan(
        row_step, (Hall0, best0, best_pos0), xs
    )
    if with_position:
        return best, best_pos
    return best


@functools.partial(jax.jit, static_argnames=("locality",))
def align_matrices_general(
    similarity: jnp.ndarray,  # [B, Ls, Lt]
    gap_vec_s: jnp.ndarray,
    gap_vec_t: jnp.ndarray,
    locality: str = LOCAL,
):
    """Full H matrix for the general-gap DP ([B, Ls+1, Lt+1]) — traceback
    support for the top-k finalizer."""
    B, Ls, Lt = similarity.shape
    T1, S1 = Lt + 1, Ls + 1
    f32 = jnp.float32
    similarity = similarity.astype(f32)
    w_s = gap_vec_s.astype(f32)
    w_t = gap_vec_t.astype(f32)
    jj = jnp.arange(T1, dtype=jnp.int32)
    rr = jnp.arange(S1, dtype=jnp.int32)

    if locality == GLOBAL:
        init_row = jnp.broadcast_to(-w_t[:T1][None, :], (B, T1)).at[:, 0].set(0.0)
    else:
        init_row = jnp.zeros((B, T1), f32)
    Hall0 = jnp.full((S1, B, T1), NEG, f32).at[0].set(init_row)
    w_t_star = gap_cost_closure(w_t)

    def row_step(Hall, xs):
        s_row, i = xs
        cost_r = jnp.where(rr < i, w_s[jnp.maximum(i - rr, 0)], jnp.inf)
        V = jnp.max(Hall - cost_r[:, None, None], axis=0)
        H_prev = Hall[i - 1]
        M = jnp.concatenate(
            [jnp.full((B, 1), NEG, f32), H_prev[:, :-1] + s_row], axis=1
        )
        C = jnp.maximum(M, V)
        if locality == LOCAL:
            C = jnp.maximum(C, 0.0)
        if locality == GLOBAL:
            C = C.at[:, 0].set(-w_s[jnp.minimum(i, Ls)])
        else:
            C = C.at[:, 0].set(0.0)

        H = _general_row_h(C, w_t_star, T1)
        Hall = Hall.at[i].set(H)
        return Hall, None

    xs = (jnp.moveaxis(similarity, 1, 0), jnp.arange(1, Ls + 1, dtype=jnp.int32))
    Hall, _ = jax.lax.scan(row_step, Hall0, xs)
    return jnp.moveaxis(Hall, 1, 0)  # [B, S1, T1]


def traceback_general(H, S, len_s, len_t, w_s, w_t, locality, end_cell=None):
    """Traceback for the general-gap DP: probe all gap lengths against the
    cost vectors."""
    mapping = np.full((len_t,), -1, dtype=np.int32)
    if end_cell is None:
        if locality == GLOBAL:
            i, j = len_s, len_t
        elif locality == LOCAL:
            sub = H[1 : len_s + 1, 1 : len_t + 1]
            flat = int(np.argmax(sub))
            i, j = flat // len_t + 1, flat % len_t + 1
        else:
            col = H[: len_s + 1, len_t]
            row = H[len_s, : len_t + 1]
            if col.max() >= row.max():
                i, j = int(np.argmax(col)), len_t
            else:
                i, j = len_s, int(np.argmax(row))
    else:
        i, j = int(end_cell[0]), int(end_cell[1])

    eps = 1e-4
    while i > 0 and j > 0:
        h = H[i, j]
        if locality == LOCAL and h <= 1e-9:
            break
        if abs(H[i - 1, j - 1] + S[i - 1, j - 1] - h) <= eps:
            mapping[j - 1] = i - 1
            i -= 1
            j -= 1
            continue
        moved = False
        for g in range(1, j + 1):
            if abs(H[i, j - g] - w_t[g] - h) <= eps:
                j -= g
                moved = True
                break
        if moved:
            continue
        for g in range(1, i + 1):
            if abs(H[i - g, j] - w_s[g] - h) <= eps:
                i -= g
                moved = True
                break
        if moved:
            continue
        # numerical fallback
        mapping[j - 1] = i - 1
        i -= 1
        j -= 1
    return mapping


def traceback(
    H: np.ndarray,  # [Ls+1, Lt+1]
    S: np.ndarray,  # [Ls, Lt]
    len_s: int,
    len_t: int,
    gaps,
    locality: str,
    end_cell=None,
) -> np.ndarray:
    """Recover the injective mapping t-index -> s-index (or -1).

    Host-side, run only for the global top-k matches.  Returns an int array
    ``mapping`` of length ``len_t`` (reference: InjectiveFlow mapping,
    vectorian/core/cpp/match/match.h:52-133).
    """
    open_s = float(gaps.open_s)
    extend_s = float(gaps.extend_s)
    open_t = float(gaps.open_t)
    extend_t = float(gaps.extend_t)
    decay_t = min(open_t, extend_t)

    mapping = np.full((len_t,), -1, dtype=np.int32)

    if end_cell is None:
        if locality == GLOBAL:
            i, j = len_s, len_t
        elif locality == LOCAL:
            sub = H[1 : len_s + 1, 1 : len_t + 1]
            flat = int(np.argmax(sub))
            i = flat // len_t + 1
            j = flat % len_t + 1
        else:
            # max over last row / last col
            col = H[: len_s + 1, len_t]
            row = H[len_s, : len_t + 1]
            if col.max() >= row.max():
                i, j = int(np.argmax(col)), len_t
            else:
                i, j = len_s, int(np.argmax(row))
    else:
        i, j = int(end_cell[0]), int(end_cell[1])

    eps = 1e-4
    while i > 0 and j > 0:
        h = H[i, j]
        if locality == LOCAL and h <= 0.0 + 1e-9:
            break
        # diagonal?
        if abs(H[i - 1, j - 1] + S[i - 1, j - 1] - h) <= eps:
            mapping[j - 1] = i - 1
            i -= 1
            j -= 1
            continue
        # horizontal run (gap in t): E-form; walk back one step at a time.
        # E[j] = max(H[j-1] - open_t, E[j-1] - decay_t); we check whether h is
        # reachable as a gap ending here.
        matched = False
        # gap in t of length g: came from H[i, j-g] - (open_t + (g-1)*decay_t)
        for g in range(1, j + 1):
            cost = open_t + (g - 1) * decay_t
            if abs(H[i, j - g] - cost - h) <= eps:
                j -= g
                matched = True
                break
        if matched:
            continue
        # gap in s of length g
        for g in range(1, i + 1):
            cost = open_s + (g - 1) * min(open_s, extend_s)
            if abs(H[i - g, j] - cost - h) <= eps:
                i -= g
                matched = True
                break
        if matched:
            continue
        # numerical fallback: pick the best-looking predecessor
        cands = []
        if i >= 1 and j >= 1:
            cands.append((H[i - 1, j - 1] + S[i - 1, j - 1], "d"))
        if j >= 1:
            cands.append((H[i, j - 1] - decay_t, "t"))
        if i >= 1:
            cands.append((H[i - 1, j] - min(open_s, extend_s), "s"))
        _, move = max(cands, key=lambda c: c[0])
        if move == "d":
            mapping[j - 1] = i - 1
            i -= 1
            j -= 1
        elif move == "t":
            j -= 1
        else:
            i -= 1
    return mapping
