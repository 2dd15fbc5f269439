"""Pallas TPU kernel for the batched Gotoh alignment DP.

The jnp row-scan in ops/alignment.py is correct and fast, but XLA keeps the
carried DP state in HBM-backed loop buffers.  This kernel keeps the whole
recurrence resident in VMEM: per grid step it loads one [L, T, Bt] block of
similarity windows and runs all L DP rows with H/F state in VMEM scratch.

Layout: the (query-token + boundary) axis T1 lives in *sublanes* and the
slice-batch axis Bt in *lanes* — so the in-row decayed-prefix-max (the exact
Gotoh horizontal-gap solution, see ops/alignment.py) becomes log2(T1)
sublane rolls of a [T1, Bt] tile, and every vector op runs at full VPU width
across 128+ slices at once.

Score-only (the traceback/finalizer pass reuses the jnp path on the top-k);
localities local/global/semiglobal; affine gaps as runtime SMEM scalars so
interactive gap changes never recompile.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vectorian_tpu.ops.alignment import LOCAL, GLOBAL, SEMIGLOBAL, LOCALITIES

NEG = -1e30


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _shift_down(x, k, fill, jidx):
    """rows j >= k get x[j-k]; rows < k get fill (sublane roll + mask)."""
    rolled = pltpu.roll(x, shift=k, axis=0)
    return jnp.where(jidx < k, fill, rolled)


def _make_kernel(L, T, T1p, Bt, locality):
    def kernel(gaps_ref, lt_ref, lens_ref, S_ref, out_ref, H_ref, F_ref, best_ref):
        open_s = gaps_ref[0, 0]
        ext_s = gaps_ref[0, 1]
        open_t = gaps_ref[0, 2]
        ext_t = gaps_ref[0, 3]
        decay = jnp.minimum(open_t, ext_t)
        lt = lt_ref[:]  # [1, Bt] i32 — per-problem query length

        jidx = jax.lax.broadcasted_iota(jnp.int32, (T1p, Bt), 0)
        jmask = (jidx >= 1) & (jidx <= lt)
        lens = lens_ref[:]  # [1, Bt] i32

        jf = jidx.astype(jnp.float32)
        if locality == GLOBAL:
            H0 = jnp.where(
                jidx > 0, -(open_t + (jf - 1.0) * ext_t), 0.0
            )
        else:
            H0 = jnp.zeros((T1p, Bt), jnp.float32)
        H_ref[:] = jnp.where(jidx <= lt, H0, NEG)
        F_ref[:] = jnp.full((T1p, Bt), NEG, jnp.float32)
        if locality == GLOBAL:
            best_ref[:] = jnp.full((1, Bt), NEG, jnp.float32)
        else:
            best_ref[:] = jnp.zeros((1, Bt), jnp.float32)

        def row(i, _):
            dp_i = i + 1  # 1-based DP row
            s_row = S_ref[i]  # [T1p, Bt] (T padded to sublanes in the wrapper)
            # align similarity to j: s_pad[j] = S[i, j-1]
            s_pad = _shift_down(s_row, 1, 0.0, jidx)
            Hp = H_ref[:]
            Fp = F_ref[:]
            M = _shift_down(Hp, 1, NEG, jidx) + s_pad
            F = jnp.maximum(Hp - open_s, Fp - ext_s)
            C = jnp.maximum(M, F)
            if locality == LOCAL:
                C = jnp.maximum(C, 0.0)
            if locality == GLOBAL:
                init_col = -(open_s + (dp_i.astype(jnp.float32) - 1.0) * ext_s)
            else:
                init_col = jnp.float32(0.0)
            C = jnp.where(jidx == 0, init_col, C)
            # exact Gotoh horizontal gaps: decayed prefix max over sublanes
            E = _shift_down(C, 1, NEG, jidx) - open_t
            shift = 1
            while shift < T1p:
                E = jnp.maximum(E, _shift_down(E, shift, NEG, jidx) - decay * shift)
                shift *= 2
            Hn = jnp.maximum(C, E)
            H_ref[:] = Hn
            F_ref[:] = F

            Hm = jnp.where(jmask, Hn, NEG)
            colmax = jnp.max(Hm, axis=0, keepdims=True)  # [1, Bt]
            if locality == LOCAL:
                valid = dp_i <= lens
                best_ref[:] = jnp.maximum(
                    best_ref[:], jnp.where(valid, colmax, NEG)
                )
            elif locality == GLOBAL:
                h_end = jnp.max(jnp.where(jidx == lt, Hn, NEG), axis=0, keepdims=True)
                best_ref[:] = jnp.where(dp_i == lens, h_end, best_ref[:])
            else:
                h_end = jnp.max(jnp.where(jidx == lt, Hn, NEG), axis=0, keepdims=True)
                best_ref[:] = jnp.maximum(
                    best_ref[:], jnp.where(dp_i <= lens, h_end, NEG)
                )
                best_ref[:] = jnp.maximum(
                    best_ref[:], jnp.where(dp_i == lens, colmax, NEG)
                )
            return 0

        jax.lax.fori_loop(0, L, row, 0)
        out_ref[:] = best_ref[:]

    return kernel


def _pallas_call_scores(S, lens, lt, gaps, locality, Bt, interpret):
    """Invoke the kernel on pre-laid-out inputs: S [L, T1p, Bp],
    lens/lt [1, Bp]."""
    L, T1p, Bp = S.shape
    gap_arr = jnp.stack(
        [jnp.asarray(g, jnp.float32) for g in gaps]
    ).reshape(1, 4)
    kernel = _make_kernel(L, T1p - 1, T1p, Bt, locality)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, Bp), jnp.float32),
        grid=(Bp // Bt,),
        in_specs=[
            pl.BlockSpec((1, 4), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, Bt), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Bt), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (L, T1p, Bt), lambda i: (0, 0, i), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec((1, Bt), lambda i: (0, i), memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((T1p, Bt), jnp.float32),
            pltpu.VMEM((T1p, Bt), jnp.float32),
            pltpu.VMEM((1, Bt), jnp.float32),
        ],
        interpret=interpret,
    )(gap_arr, lt, lens, S)
    return out


def _make_general_kernel(L, T1p, Bt, locality):
    """Waterman-Smith-Beyer (arbitrary per-length gap costs) kernel.

    Same layout as the affine kernel (T1p sublanes x Bt lanes).  All L+1 DP
    rows stay resident in VMEM scratch so vertical gaps of any length are a
    dynamic row load; horizontal gaps are a single pass of sublane rolls
    against the *min-plus closure* of the t-side costs (exact — see
    ops/alignment.gap_cost_closure)."""

    def kernel(
        ws_ref,  # SMEM [1, L+1] raw s-side costs
        wt_star_ref,  # SMEM [1, T1p] closure t-side costs
        lt_ref,  # VMEM [1, Bt]
        lens_ref,  # VMEM [1, Bt]
        init_ref,  # VMEM [T1p, Bt] row-0 boundary values
        S_ref,  # VMEM [L, T1p, Bt]
        out_ref,  # VMEM [1, Bt]
        Hall_ref,  # scratch [L+1, T1p, Bt]
        best_ref,  # scratch [1, Bt]
    ):
        lt = lt_ref[:]
        lens = lens_ref[:]
        jidx = jax.lax.broadcasted_iota(jnp.int32, (T1p, Bt), 0)
        jmask = (jidx >= 1) & (jidx <= lt)

        Hall_ref[0] = jnp.where(jidx <= lt, init_ref[:], NEG)
        if locality == GLOBAL:
            best_ref[:] = jnp.full((1, Bt), NEG, jnp.float32)
        else:
            best_ref[:] = jnp.zeros((1, Bt), jnp.float32)

        def row(i, _):
            dp_i = i + 1
            s_row = S_ref[i]
            s_pad = _shift_down(s_row, 1, 0.0, jidx)
            H_prev = Hall_ref[i]
            M = _shift_down(H_prev, 1, NEG, jidx) + s_pad

            # vertical gaps: max_g Hall[dp_i - g] - w_s[g] (chains are exact
            # through stored final rows)
            V = jnp.full((T1p, Bt), NEG, jnp.float32)
            for g in range(1, L + 1):
                prev = Hall_ref[jnp.maximum(dp_i - g, 0)]
                cand = prev - ws_ref[0, g]
                V = jnp.where(dp_i - g >= 0, jnp.maximum(V, cand), V)

            C = jnp.maximum(M, V)
            if locality == LOCAL:
                C = jnp.maximum(C, 0.0)
            if locality == GLOBAL:
                init_col = -ws_ref[0, jnp.minimum(dp_i, L)]
            else:
                init_col = jnp.float32(0.0)
            C = jnp.where(jidx == 0, init_col, C)

            # horizontal gaps: one pass over lengths with closure costs
            E = jnp.full((T1p, Bt), NEG, jnp.float32)
            for g in range(1, T1p):
                E = jnp.maximum(E, _shift_down(C, g, NEG, jidx) - wt_star_ref[0, g])
            Hn = jnp.maximum(C, E)
            Hall_ref[dp_i] = Hn

            Hm = jnp.where(jmask, Hn, NEG)
            colmax = jnp.max(Hm, axis=0, keepdims=True)
            if locality == LOCAL:
                valid = dp_i <= lens
                best_ref[:] = jnp.maximum(
                    best_ref[:], jnp.where(valid, colmax, NEG)
                )
            elif locality == GLOBAL:
                h_end = jnp.max(jnp.where(jidx == lt, Hn, NEG), axis=0, keepdims=True)
                best_ref[:] = jnp.where(dp_i == lens, h_end, best_ref[:])
            else:
                h_end = jnp.max(jnp.where(jidx == lt, Hn, NEG), axis=0, keepdims=True)
                best_ref[:] = jnp.maximum(
                    best_ref[:], jnp.where(dp_i <= lens, h_end, NEG)
                )
                best_ref[:] = jnp.maximum(
                    best_ref[:], jnp.where(dp_i == lens, colmax, NEG)
                )
            return 0

        jax.lax.fori_loop(0, L, row, 0)
        out_ref[:] = best_ref[:]

    return kernel


def _pallas_call_scores_general(S, lens, lt, init_row, w_s, w_t_star, locality,
                                Bt, interpret):
    """S [L, T1p, Bp]; lens/lt [1, Bp]; init_row [T1p, Bp];
    w_s [1, L+1]; w_t_star [1, T1p]."""
    L, T1p, Bp = S.shape
    kernel = _make_general_kernel(L, T1p, Bt, locality)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, Bp), jnp.float32),
        grid=(Bp // Bt,),
        in_specs=[
            pl.BlockSpec((1, L + 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, T1p), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, Bt), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Bt), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((T1p, Bt), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (L, T1p, Bt), lambda i: (0, 0, i), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec((1, Bt), lambda i: (0, i), memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((L + 1, T1p, Bt), jnp.float32),
            pltpu.VMEM((1, Bt), jnp.float32),
        ],
        interpret=interpret,
    )(w_s, w_t_star, lt, lens, init_row, S)
    return out


@functools.partial(jax.jit, static_argnames=("locality", "block_b", "interpret"))
def pallas_align_scores_general(
    similarity: jnp.ndarray,  # [B, L, T] f32
    len_s: jnp.ndarray,  # [B] i32
    len_t: jnp.ndarray,  # scalar or [B] i32
    gap_vec_s: jnp.ndarray,  # [L+1] raw costs
    gap_vec_t: jnp.ndarray,  # [T+1] raw costs
    locality: str = LOCAL,
    block_b: int = 0,
    interpret: bool = False,
):
    """Drop-in batched scorer matching ops/alignment.align_scores_general
    (scores only)."""
    from vectorian_tpu.ops.alignment import gap_cost_closure

    if locality not in LOCALITIES:
        raise ValueError(locality)
    B, L, T = similarity.shape
    T1p = _round_up(T + 1, 8)
    if block_b == 0:
        # fit (2L+1) rows of [T1p, Bt] f32 plus the S block in ~8 MB VMEM
        budget = 8 * 1024 * 1024 // ((2 * L + 2) * T1p * 4)
        Bt = max(128, min(512, (budget // 128) * 128))
    else:
        Bt = block_b
    Bp = _round_up(max(B, Bt), Bt)

    S = jnp.transpose(similarity.astype(jnp.float32), (1, 2, 0))  # [L, T, B]
    S = jnp.pad(S, ((0, 0), (0, T1p - T), (0, Bp - B)))
    lens = jnp.pad(len_s.astype(jnp.int32), (0, Bp - B)).reshape(1, Bp)
    lt_vec = jnp.broadcast_to(jnp.asarray(len_t, jnp.int32), (B,))
    lt = jnp.pad(lt_vec, (0, Bp - B), constant_values=1).reshape(1, Bp)

    # pad with prohibitive costs: a gap longer than the supplied vector must
    # never be free (the jnp path clamps/errors; keep the kernels consistent)
    w_s = jnp.pad(
        gap_vec_s.astype(jnp.float32),
        (0, max(L + 1 - gap_vec_s.shape[0], 0)),
        constant_values=-NEG,
    )
    w_t = jnp.pad(
        gap_vec_t.astype(jnp.float32),
        (0, max(T1p - gap_vec_t.shape[0], 0)),
        constant_values=-NEG,
    )
    w_t_star = gap_cost_closure(w_t[: T + 1])
    w_t_star = jnp.pad(w_t_star, (0, T1p - (T + 1)), constant_values=-NEG)

    # row-0 boundary (raw costs, matching the scalar oracle): global pays
    # -w_t[j]; local/semiglobal start free
    jcol = jnp.arange(T1p)
    if locality == GLOBAL:
        init = jnp.where(jcol > 0, -w_t[jnp.minimum(jcol, T)], 0.0)
        init = jnp.where(jcol <= T, init, NEG)
    else:
        init = jnp.zeros((T1p,), jnp.float32)
    init_row = jnp.broadcast_to(init[:, None].astype(jnp.float32), (T1p, Bp))

    out = _pallas_call_scores_general(
        S, lens, lt, init_row,
        w_s[: L + 1].reshape(1, L + 1), w_t_star.reshape(1, T1p),
        locality, Bt, interpret,
    )
    return out[0, :B]


@functools.partial(jax.jit, static_argnames=("locality", "block_b", "interpret"))
def pallas_align_scores(
    similarity: jnp.ndarray,  # [B, L, T] f32
    len_s: jnp.ndarray,  # [B] i32
    len_t: jnp.ndarray,  # scalar i32 or [B] i32
    gaps,  # AffineGapParams
    locality: str = LOCAL,
    block_b: int = 256,
    interpret: bool = False,
):
    """Drop-in batched scorer matching ops/alignment.align_scores
    (scores only)."""
    if locality not in LOCALITIES:
        raise ValueError(locality)
    B, L, T = similarity.shape
    T1p = _round_up(T + 1, 8)
    Bt = block_b
    Bp = _round_up(max(B, Bt), Bt)

    # [L, T1p, Bp]: rows shifted so the kernel can slice [T1p, Bt] directly
    S = jnp.transpose(similarity.astype(jnp.float32), (1, 2, 0))  # [L, T, B]
    S = jnp.pad(S, ((0, 0), (0, T1p - T), (0, Bp - B)))
    lens = jnp.pad(len_s.astype(jnp.int32), (0, Bp - B)).reshape(1, Bp)
    lt_vec = jnp.broadcast_to(jnp.asarray(len_t, jnp.int32), (B,))
    lt = jnp.pad(lt_vec, (0, Bp - B), constant_values=1).reshape(1, Bp)

    out = _pallas_call_scores(S, lens, lt, gaps, locality, Bt, interpret)
    return out[0, :B]


def _make_multiq_kernel(L, T1p, Q, CB, locality):
    """Multi-query DP kernel consuming the gather output layout directly.

    S block: [L, 1, Tp, Q] — one grid step per slice, exactly what
    ``table[V, T, Q][tok.T]`` produces, so NO transpose/relayout of the
    (huge) gathered similarity stream is needed.  (T, Q) is
    (sublane, lane): one native tile per row.  The slice's Q query
    problems live in lanes; the DP state [T1p, Q] sits in VMEM scratch,
    horizontal gaps solved by the decayed-prefix-max sublane rolls (see
    _make_kernel)."""
    Tp = T1p - 8  # S's padded query axis (boundary column lives in scratch)

    def kernel(gaps_ref, lt_ref, lens_ref, S_ref, out_ref, H_ref, F_ref, best_ref):
        open_s = gaps_ref[0, 0]
        ext_s = gaps_ref[0, 1]
        open_t = gaps_ref[0, 2]
        ext_t = gaps_ref[0, 3]
        decay = jnp.minimum(open_t, ext_t)
        lt = lt_ref[:]  # [1, Q] i32 per-query length
        base = pl.program_id(0) * CB

        jidx = jax.lax.broadcasted_iota(jnp.int32, (T1p, Q), 0)
        jmask = (jidx >= 1) & (jidx <= lt)
        jf = jidx.astype(jnp.float32)
        if locality == GLOBAL:
            H0 = jnp.where(jidx > 0, -(open_t + (jf - 1.0) * ext_t), 0.0)
        else:
            H0 = jnp.zeros((T1p, Q), jnp.float32)
        H0 = jnp.where(jidx <= lt, H0, NEG)

        for ci in range(CB):  # static unroll — no dynamic slice indices
            ln = lens_ref[0, base + ci]  # scalar slice length
            H_ref[:] = H0
            F_ref[:] = jnp.full((T1p, Q), NEG, jnp.float32)
            if locality == GLOBAL:
                best_ref[:] = jnp.full((1, Q), NEG, jnp.float32)
            else:
                best_ref[:] = jnp.zeros((1, Q), jnp.float32)
            _dp_one_slice(
                S_ref, out_ref, H_ref, F_ref, best_ref, ci, ln, lt, jidx,
                jmask, open_s, ext_s, open_t, ext_t, decay, L, Tp, T1p, Q,
                locality,
            )

    return kernel


def _dp_one_slice(S_ref, out_ref, H_ref, F_ref, best_ref, ci, ln, lt, jidx,
                  jmask, open_s, ext_s, open_t, ext_t, decay, L, Tp, T1p, Q,
                  locality):
        def row(i, _):
            dp_i = i + 1
            s8 = S_ref[i, ci].astype(jnp.float32)  # [Tp, Q]
            # place s8 rows 0..Tp-1 at sublanes 1..Tp of a [T1p, Q] tile
            s_pad = _shift_down(
                jnp.concatenate(
                    [s8, jnp.zeros((T1p - Tp, Q), jnp.float32)], axis=0
                ),
                1, 0.0, jidx,
            )
            Hp = H_ref[:]
            Fp = F_ref[:]
            M = _shift_down(Hp, 1, NEG, jidx) + s_pad
            F = jnp.maximum(Hp - open_s, Fp - ext_s)
            C = jnp.maximum(M, F)
            if locality == LOCAL:
                C = jnp.maximum(C, 0.0)
            if locality == GLOBAL:
                init_col = -(open_s + (dp_i.astype(jnp.float32) - 1.0) * ext_s)
            else:
                init_col = jnp.float32(0.0)
            C = jnp.where(jidx == 0, init_col, C)
            E = _shift_down(C, 1, NEG, jidx) - open_t
            shift = 1
            while shift < T1p:
                E = jnp.maximum(
                    E, _shift_down(E, shift, NEG, jidx) - decay * shift
                )
                shift *= 2
            Hn = jnp.maximum(C, E)
            H_ref[:] = Hn
            F_ref[:] = F

            Hm = jnp.where(jmask, Hn, NEG)
            colmax = jnp.max(Hm, axis=0, keepdims=True)  # [1, Q]
            if locality == LOCAL:
                valid = dp_i <= ln
                best_ref[:] = jnp.maximum(
                    best_ref[:], jnp.where(valid, colmax, NEG)
                )
            elif locality == GLOBAL:
                h_end = jnp.max(
                    jnp.where(jidx == lt, Hn, NEG), axis=0, keepdims=True
                )
                best_ref[:] = jnp.where(dp_i == ln, h_end, best_ref[:])
            else:
                h_end = jnp.max(
                    jnp.where(jidx == lt, Hn, NEG), axis=0, keepdims=True
                )
                best_ref[:] = jnp.maximum(
                    best_ref[:], jnp.where(dp_i <= ln, h_end, NEG)
                )
                best_ref[:] = jnp.maximum(
                    best_ref[:], jnp.where(dp_i == ln, colmax, NEG)
                )
            return 0

        jax.lax.fori_loop(0, L, row, 0)
        out_ref[ci] = best_ref[0]


@functools.partial(
    jax.jit, static_argnames=("locality", "block_c", "interpret")
)
def pallas_align_scores_multi_nt(
    S: jnp.ndarray,  # [L, c, Tp, Q] — gather-native layout (any float dtype)
    len_s: jnp.ndarray,  # [c] i32
    len_t: jnp.ndarray,  # [Q] i32
    gaps,
    locality: str = LOCAL,
    block_c: int = 0,  # 0 = auto from the VMEM budget
    interpret: bool = False,
):
    """No-transpose multi-query scorer; returns [c, Q] f32 raw scores."""
    if locality not in LOCALITIES:
        raise ValueError(locality)
    L, c, Tp, Q = S.shape
    T1p = Tp + 8  # boundary column + headroom, sublane-aligned
    CB = block_c or 8  # 8 slices per grid step (larger unrolls run slower)
    # VMEM guard: a double-buffered [L, CB, Tp, Q] block must fit.  In
    # order: split the query axis (lane groups of 128), then shrink the
    # per-step slice block, then fall back to the jnp scorer — never hand
    # Mosaic an over-budget block (quantized int8/bf16 tables shrink the
    # block, letting larger Q through in one call)
    VMEM_BUDGET = 8 * 1024 * 1024

    def block_bytes(cb, q):
        return L * cb * Tp * q * S.dtype.itemsize * 2

    if block_bytes(CB, Q) > VMEM_BUDGET and Q > 128:
        half = (Q // 2 + 127) // 128 * 128
        a = pallas_align_scores_multi_nt(
            S[:, :, :, :half], len_s, len_t[:half], gaps, locality,
            block_c=block_c, interpret=interpret,
        )
        b = pallas_align_scores_multi_nt(
            S[:, :, :, half:], len_s, len_t[half:], gaps, locality,
            block_c=block_c, interpret=interpret,
        )
        return jnp.concatenate([a, b], axis=1)
    while CB > 1 and block_bytes(CB, Q) > VMEM_BUDGET:
        CB //= 2
    if block_bytes(CB, Q) > VMEM_BUDGET:
        # a single [L, 1, Tp, Q] slice exceeds VMEM — jnp path
        from vectorian_tpu.ops.alignment import align_scores

        S2 = jnp.transpose(S, (1, 3, 0, 2)).reshape(c * Q, L, Tp)
        return align_scores(
            S2.astype(jnp.float32),
            jnp.repeat(jnp.maximum(len_s, 1), Q),
            jnp.tile(len_t, c),
            gaps,
            locality,
        ).reshape(c, Q)
    cp = _round_up(c, CB)
    if cp != c:
        S = jnp.pad(S, ((0, 0), (0, cp - c), (0, 0), (0, 0)))
    lens = jnp.pad(len_s.astype(jnp.int32), (0, cp - c)).reshape(1, cp)
    lt = len_t.astype(jnp.int32).reshape(1, Q)
    gap_arr = jnp.stack([jnp.asarray(g, jnp.float32) for g in gaps]).reshape(1, 4)
    kernel = _make_multiq_kernel(L, T1p, Q, CB, locality)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((cp, Q), jnp.float32),
        grid=(cp // CB,),
        in_specs=[
            pl.BlockSpec((1, 4), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, Q), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cp), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (L, CB, Tp, Q), lambda i: (0, i, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec((CB, Q), lambda i: (i, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((T1p, Q), jnp.float32),
            pltpu.VMEM((T1p, Q), jnp.float32),
            pltpu.VMEM((1, Q), jnp.float32),
        ],
        interpret=interpret,
    )(gap_arr, lt, lens, S)
    return out[:c]


@functools.partial(
    jax.jit, static_argnames=("locality", "block_b", "interpret")
)
def pallas_align_scores_multi(
    S4: jnp.ndarray,  # [c, L, Q, T] f32 — gathered multi-query windows
    len_s: jnp.ndarray,  # [c] i32
    len_t: jnp.ndarray,  # [Q] i32
    gaps,
    locality: str = LOCAL,
    block_b: int = 512,
    interpret: bool = False,
):
    """Multi-query variant consuming the [c, L, Q, T] gather output
    directly; returns [c, Q] raw scores.  Batch layout is c-major
    (b = ci * Q + q)."""
    c, L, Q, T = S4.shape
    T1p = _round_up(T + 1, 8)
    B = c * Q
    Bt = block_b
    Bp = _round_up(max(B, Bt), Bt)

    S = jnp.transpose(S4.astype(jnp.float32), (1, 3, 0, 2)).reshape(L, T, B)
    S = jnp.pad(S, ((0, 0), (0, T1p - T), (0, Bp - B)))
    lens = jnp.pad(jnp.repeat(len_s.astype(jnp.int32), Q), (0, Bp - B)).reshape(1, Bp)
    lt = jnp.pad(
        jnp.tile(len_t.astype(jnp.int32), c), (0, Bp - B), constant_values=1
    ).reshape(1, Bp)

    out = _pallas_call_scores(S, lens, lt, gaps, locality, Bt, interpret)
    return out[0, :B].reshape(c, Q)
