"""Brute-force batched search: similarity evaluation -> DP -> top-k.

TPU-native replacement for the reference's matcher loop
(MatcherImpl::match, vectorian/core/cpp/match/matcher_impl.h:66-176 +
ThreadPool fan-out index.py:530-560): per length bucket, a chunked jitted
pipeline builds per-slice similarity windows (static vocab-matrix gather,
contextual einsum, or modifier trees — ops/simmatrix.eval_plan_chunk), runs
the batched alignment DP and emits raw scores for *all* slices; top-k
selection replaces the bounded min-heap (result_set.h:40-60).

Score normalization follows the reference exactly
(metric/alignment.h:84-106 + match.h:295-336):

    score = raw / reference_score * boost
    reference_score = matched + ((total-matched)/total)^w * (total-matched)

With the default submatch_weight w=0 the reference score equals ``total``
(= sum over query tokens of max_similarity_for_t) and is alignment
independent — computed fully on device.  For w>0 the device scores with the
w=0 normalization and the exact score is recomputed during the traceback
pass over an overfetched candidate set.
"""

from __future__ import annotations

import functools
import time
from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from vectorian_tpu.utils import trace
from vectorian_tpu.ops.alignment import (
    AffineGapParams,
    align_matrices,
    align_matrices_general,
    align_matrices_scores,
    align_matrices_scores_general,
    align_scores,
    align_scores_general,
    traceback,
    traceback_general,
)
from vectorian_tpu import native
from vectorian_tpu.ops.simmatrix import (
    QueryPlan,
    combine_static_plan,
    eval_plan_chunk,
)

NEG_SCORE = -1e30


def _default_chunk() -> int:
    """Bucket chunk size (rows per jitted map step).  Larger chunks
    amortize dispatch; smaller ones compile much faster on the tunneled
    remote-compile runtime (measured: the 4096-row body compiled ~3x
    slower than 1024).  VECTORIAN_CHUNK overrides."""
    import os

    try:
        return int(os.environ.get("VECTORIAN_CHUNK", "") or 4096)
    except ValueError:
        return 4096


DEFAULT_CHUNK = 4096  # legacy constant; engines call _default_chunk()


class _PagedBucket(dict):
    """Length-bucket dict whose device arrays page in lazily from host
    copies and can be evicted (``VECTORIAN_PAGE_BUCKETS=1`` serving mode
    for corpora past the one-chip HBM envelope, docs/performance.md).

    Lookups of the device keys (``tokens``/``tok_sorted``/``sort_inv``/
    ``pos``/``tag``/``lengths``) upload the matching ``*_np`` host copy on
    first touch — every existing consumer works unchanged — and
    :meth:`evict` drops them back to host-only, freeing HBM once the
    dispatched computation retires.  The corpus-pass loops consume each
    bucket's scores with a host read before moving on, so at most one
    bucket (plus its in-flight successor) is resident."""

    _DEVICE_KEYS = (
        "tokens", "tok_sorted", "sort_inv", "pos", "tag", "lengths",
        "uniq", "uniq_inv",
    )

    def __missing__(self, key):
        if key not in self._DEVICE_KEYS:
            raise KeyError(key)
        # narrow upload planes: paged mode is transfer-bound on the
        # tunnel, so token/index planes whose values fit uint16 (and tag
        # planes fitting uint8) ship at half/quarter width and widen on
        # device (engine.__init__ stores the *_u16_np/_u8_np copies;
        # VECTORIAN_PAGE_NARROW=0 forces full-width for A/Bs)
        narrow = dict.get(self, "_narrow_np", {}).get(key)
        if narrow is not None and _page_narrow_default():
            val = jnp.asarray(narrow)
            val = val.astype(
                jnp.int16 if key == "tag" else jnp.int32
            )
        else:
            val = jnp.asarray(dict.__getitem__(self, key + "_np"))
        dict.__setitem__(self, key, val)
        return val

    def evict(self):
        for key in self._DEVICE_KEYS:
            dict.pop(self, key, None)


class _LazyScores:
    """Deferred per-bucket scoring dispatch (paged mode): ``get()`` pages
    the bucket in and dispatches the kernel; ``release()`` drops the
    scores AND the bucket's device arrays.  Consumers must force a host
    read of (part of) the scores before releasing — that read is the only
    honest completion barrier on the tunneled runtime (CLAUDE.md:
    block_until_ready does not synchronize there)."""

    __slots__ = ("_db", "_fn", "_scores")

    def __init__(self, db, fn):
        self._db = db
        self._fn = fn
        self._scores = None

    def get(self):
        if self._scores is None:
            self._scores = self._fn()
        return self._scores

    def release(self):
        self._scores = None
        if isinstance(self._db, _PagedBucket):
            self._db.evict()


def _paged_default() -> bool:
    import os

    return os.environ.get("VECTORIAN_PAGE_BUCKETS", "") in ("1", "true")


def _page_narrow_default() -> bool:
    """Half-width (uint16 token/index, uint8 tag) paged uploads; the
    device widens after transfer.  VECTORIAN_PAGE_NARROW=0 restores
    full-width uploads (the A/B toggle for scale_check)."""
    import os

    return os.environ.get("VECTORIAN_PAGE_NARROW", "") not in ("0", "false")


def _page_prefetch_default() -> bool:
    """Double-buffered paged mode (bucket i+1 uploads under bucket i's
    read); VECTORIAN_PAGE_PREFETCH=0 forces the serialized r3 behavior
    (one bucket resident) — also the A/B toggle for scale_check."""
    import os

    return os.environ.get("VECTORIAN_PAGE_PREFETCH", "") not in ("0", "false")


def uniq_gather_default(Q: int) -> bool:
    """Two-stage unique-gather policy for the serving corpus pass:
    ``VECTORIAN_UNIQ_GATHER=1/0`` forces it on/off; the default uses it
    for small batches only.  Interleaved A/B on the real chip (Zipf 1M
    corpus, LATENCY_r04.json): Q=1 find() p50 211 ms vs 227 ms direct —
    a modest ~7% win; the frequency-ordered vocab already concentrates
    the direct gather in a hot region, so dedup only trims the remaining
    per-index cost.  At larger Q the [U_max, T, Q] intermediate outgrows
    the hot-block locality and the direct gather is expected to win
    (untested beyond Q=8 — the default stays conservative)."""
    import os

    env = os.environ.get("VECTORIAN_UNIQ_GATHER", "")
    if env in ("0", "false"):
        return False
    if env in ("1", "true"):
        return True
    return Q <= 8


@functools.partial(jax.jit, static_argnames=("pads", "axis"))
def _pad_stack(tables, pads, axis: int):
    """Q zero-pads + one stack in ONE dispatch (each eager jnp op costs a
    tunnel round trip of client/dispatch overhead, so the per-pass table
    build used to pay O(Q) dispatches).  Pure data movement: output bits
    equal the per-table eager jnp.pad + jnp.stack."""
    return jnp.stack(
        [
            m if p == 0 else jnp.pad(m, ((0, 0), (0, p)))
            for m, p in zip(tables, pads)
        ],
        axis=axis,
    )


def stack_query_tables(plans, len_ts, sim_dtype=None):
    """Stack Q static query plans into the serving table [V, Tpad, Q]
    ((T, Q)-minor so the vocab gather's output is already the DP kernel's
    native tiling), optionally quantized.

    ``sim_dtype``: None keeps f32; ``"bfloat16"`` halves the table's HBM
    traffic; ``"int8"`` quarters it (symmetric scale = max|sim|/127 —
    max-plus homogeneity runs the quantized units through the unchanged DP
    kernels via ``sim_scale``).  Quantization happens on device; the
    max|sim| needed for the host-side error bound is returned as an
    UNREAD device scalar so callers can overlap the read with the pass
    (``quantization_entry_err``).  Returns
    (sim_multi, sim_scale, max_abs_dev, Tpad)."""
    Tmax = max(len_ts)
    Tpad = -(-Tmax // 8) * 8  # sublane-aligned for the kernel layout
    for qp in plans:
        assert qp.is_static_only and qp.plan == ("static", 0)
    sim_multi = _pad_stack(
        tuple(qp.static_sims[0] for qp in plans),
        tuple(Tpad - int(qp.static_sims[0].shape[1]) for qp in plans),
        axis=2,
    )  # [V, Tpad, Q]
    sim_scale = 1.0
    max_abs_dev = None
    if sim_dtype is not None:
        if sim_dtype not in ("int8", jnp.int8, "bfloat16", jnp.bfloat16):
            raise ValueError(f"unknown sim_dtype {sim_dtype!r}")
        max_abs_dev = jnp.maximum(jnp.max(jnp.abs(sim_multi)), 1e-9)
        if sim_dtype in ("int8", jnp.int8):
            sim_scale = max_abs_dev / 127.0
            sim_multi = jnp.round(sim_multi / sim_scale).astype(jnp.int8)
        else:  # bfloat16
            sim_multi = sim_multi.astype(jnp.bfloat16)
    return sim_multi, sim_scale, max_abs_dev, Tpad


def stack_ctx_queries(ctx_queries, len_ts):
    """Stack Q contextual query-vector dicts into [Tpad*Q, ...] arrays
    (q-minor) for the batched GEMM paths; returns
    (q_unmod, q_norm, q_mags, Tpad)."""
    Q = len(ctx_queries)
    Tmax = max(len_ts)
    Tpad = -(-Tmax // 8) * 8

    def stack(key):
        out = np.zeros(
            (Tpad, Q) + np.asarray(ctx_queries[0][key]).shape[1:], np.float32
        )
        for q, dq in enumerate(ctx_queries):
            v = np.asarray(dq[key], np.float32)
            out[: v.shape[0], q] = v
        return jnp.asarray(out.reshape((Tpad * Q,) + out.shape[2:]))

    return stack("unmodified"), stack("normalized"), stack("magnitudes"), Tpad


def quantization_entry_err(sim_dtype, max_abs_dev) -> float:
    """Max per-entry absolute rounding of a quantized table (0.0 exact).
    Forces the deferred max|sim| host read — call it AFTER dispatching the
    scoring passes so the tunnel round trip overlaps the compute."""
    if max_abs_dev is None:
        return 0.0
    max_abs = float(max_abs_dev)
    if sim_dtype in ("int8", jnp.int8):
        return max_abs / 127.0 / 2.0  # round-to-nearest
    # bf16 RN absolute error: half-ulp of max_abs's binade — the safe
    # upper bound is 2^-8 * max_abs (2^-9 relative only holds at the
    # binade's low end)
    return max_abs * 2.0 ** -8


def gap_vec(gap_cost_side, n1: int) -> np.ndarray:
    """THE single constructor for general-gap cost vectors (length ``n1``
    = padded width + 1; zeros placeholder when the side is None/affine).
    Every ranking / fused-rescore / stacked-rescore / traceback site must
    build through here: byte-equality across find/find_batch/mesh depends
    on the f32 values (and their min-plus closures) being identical at
    every site."""
    if gap_cost_side is None:
        return np.zeros((n1,), np.float32)
    return np.asarray(gap_cost_side.costs(n1), np.float32)


def order_by_score(packed, ids, scores) -> np.ndarray:
    """Positions of ``ids`` in the reference's deterministic match order:
    score desc, then doc id asc, then slice idx asc (match_impl.h:8-42).
    The single home of this tie-break — every top-k/merge path uses it."""
    # an empty candidate set (e.g. an all-OOV query whose scores all fall
    # below min_score) must order to empty — np.asarray([]) is float64 and
    # would crash the integer indexing below
    ids = np.asarray(ids, np.int64)
    if ids.size == 0:
        return np.empty((0,), np.int64)
    return np.lexsort(
        (
            packed.slice_idx[ids],
            packed.slice_doc[ids],
            -np.asarray(scores).astype(np.float64),
        )
    )


def use_pallas_default() -> bool:
    """Pallas DP kernels compile for TPU targets only; additionally they
    only pay off when the per-pass DP volume is large — measured: 3x faster
    at Q>=512 serving batches and 16x for general-gap WSB, but 1.2-7x
    SLOWER than the fused jnp scan for single-query/contextual/small-batch
    passes (per-chunk launch + layout-copy overhead).  Call sites gate on
    both this and their workload shape."""
    import os

    if os.environ.get("VECTORIAN_NO_PALLAS"):
        return False
    return jax.default_backend() == "tpu"


# measured crossover: the lane-native multi-query kernel beats the jnp scan
# from roughly this many queries per pass
PALLAS_MIN_BATCH = 256


@functools.partial(jax.jit, static_argnames=("n", "size"))
def _col_above_idx(scores, qi, thresh, n, size):
    """Positions (into the bucket's first ``n`` rows) of one query column's
    scores >= thresh, capped at ``size`` (-1 padded), plus the exact count
    so callers detect overflow.  32 KB/query over the tunnel instead of a
    4 MB full-column read at 1M slices."""
    col = jax.lax.dynamic_index_in_dim(scores[:n], qi, axis=1, keepdims=False)
    mask = col >= thresh
    return jnp.flatnonzero(mask, size=size, fill_value=-1), jnp.sum(mask)


@functools.partial(jax.jit, static_argnames=("n", "size"))
def _col_above_vals(scores, qi, thresh, n, size):
    """_col_above_idx that also returns the selected scores — consumers
    that rank on the device values (transport metrics) complete boundary
    tie groups without a full column read."""
    col = jax.lax.dynamic_index_in_dim(scores[:n], qi, axis=1, keepdims=False)
    mask = col >= thresh
    idx = jnp.flatnonzero(mask, size=size, fill_value=-1)
    return idx, jnp.sum(mask), col[jnp.maximum(idx, 0)]


@functools.partial(
    jax.jit,
    static_argnames=(
        "n", "size", "V", "locality", "any_tags", "general", "with_filter",
    ),
)
def _col_above_exact(
    scores, qi, thresh, tokens, pos_all, tag_all, ln_all, table,
    tw_w, tw_pos, tw_pen, tw_thr, tagged,
    flt_pos, flt_tag, flt_tok,
    lt_q, gaps, gv_s, gv_t,
    n: int, size: int, V: int, locality: str, any_tags: bool,
    general: bool, with_filter: bool,
):
    """Thresholded column select FUSED with the exact f32 rescore of the
    selected rows — the tie-extras round costs one device fetch instead
    of two (select, then rescore-by-ids).  Padding rows (idx -1) produce
    garbage raw values that callers mask."""
    col = jax.lax.dynamic_index_in_dim(scores[:n], qi, axis=1, keepdims=False)
    mask = col >= thresh
    idx = jnp.flatnonzero(mask, size=size, fill_value=-1)
    cnt = jnp.sum(mask)
    rows = jnp.maximum(idx, 0)
    qvec = jnp.full((size,), qi, jnp.int32)
    tok, pos, ln = tokens[rows], pos_all[rows], ln_all[rows]
    if with_filter:
        tok, pos, ln = _mq_compact(
            tok, pos, tag_all[rows], ln, (flt_pos, flt_tag, flt_tok)
        )
    S, _ = _mq_similarity(
        tok, pos, qvec, table,
        tw_w, tw_pos, tw_pen, tw_thr, tagged, V, any_tags,
    )
    raw = _mq_scores(
        S, ln, lt_q[qvec], gaps, gv_s, gv_t, locality, general
    )
    return idx, cnt, raw


class HostVecSource:
    """Candidate source over a complete host-side [n_slices] device-score
    vector (one query) — the finalizer's provable-cut machinery talks to
    this protocol so the same code serves full-read and device-top-k
    ranking:

    - ``covers_all(m)``: the initial fetch already covers every slice
    - ``initial(m, thresh)`` -> (ids, rest_max): the m best candidates at
      or above ``thresh`` plus an upper bound on every score outside them
    - ``parent.above_many([(src, thresh, exclude)])``: ids with device
      score >= thresh, batched so one host transfer serves all queries
    """

    def __init__(self, engine, scores: np.ndarray):
        self._engine = engine
        self._scores = scores

    @property
    def parent(self):
        return self

    def covers_all(self, m: int) -> bool:
        return m >= self._scores.shape[0]

    def initial(self, m: int, thresh: float):
        return self._engine.top_k_with_next(self._scores, m, thresh)

    def above_many(self, reqs):
        out = []
        for src, thresh, excl in reqs:
            s = src._scores
            out.append(
                [int(c) for c in np.flatnonzero(s >= thresh) if int(c) not in excl]
            )
        return out


class BucketTopKSource:
    """Device-side per-bucket top-k candidate source for a multi-query
    corpus pass: fetches only [Q, k+1] (value, id) pairs per bucket in ONE
    batched transfer (the full [n_slices, Q] read is ~128 MB at 1M x 32 —
    seconds over a tunneled runtime).  The per-bucket device score
    matrices stay resident; the (k+1)-th value bounds every unfetched
    slice, and unsafe-cut extras read single score COLUMNS on demand.

    Buckets are length-sorted, so ``lax.top_k``'s lowest-index tie
    preference is the WRONG tie order — sound here because candidate
    selection never decides final order (the finalizer exactly rescores
    and ``order_by_score`` owns the tie-break) and the boundary bound
    covers truncated ties: a tied slice left unfetched keeps
    rest_max >= thresh, forcing the tie-bounded extras round that reads
    the column and recovers it."""

    def __init__(self, engine, pending, Q: int, k: int, exact_ctx=None):
        """``exact_ctx``: optional fused-rescore context
        {table, V, lt_q, tw_args, gaps, locality, any_tags} — when present
        the top-k dispatch ALSO computes each selected row's exact f32 raw
        DP score in the same kernel (see _topk_exact_rescore), so the
        finalizer's round-1 rescore round trip disappears."""
        self._engine = engine
        self._pending = pending
        self.Q = Q
        self.k = k
        self.has_exact = exact_ctx is not None
        self.exact_ctx = exact_ctx
        refs = []
        metas = []
        pay_budget = self.PAYLOAD_MAX_BYTES  # WHOLE-FETCH budget
        t_loop0 = time.perf_counter()
        for pi, (db, entry) in enumerate(pending):
            lazy = isinstance(entry, _LazyScores)
            scores = entry.get() if lazy else entry
            bucket_ref_start = len(refs)
            if "sid_dev" in db:
                # prefiltered pseudo-bucket: its global slice-id map and
                # pruned-region bound ride the same batched fetch
                refs.extend((db["sid_dev"], db["ub_dev"]))
            kk = min(k, db["n"])
            # deep (score, id, raw) fetch past the payload depth: resolves
            # Zipf boundary-tie groups host-side instead of paying a
            # second blocking select round (LATENCY_r04).  The tail is
            # KBs per bucket at small Q; at large serving batches the
            # depth shrinks (transfer and fused-DP cost scale with Q) but
            # stays >0 — an unsafe cut at Q=512 pays a full-column select
            # PER QUERY (GBs of device reads)
            if exact_ctx is None:
                deep = 0
            elif Q <= 8:
                deep = self.DEEP_K
            else:
                deep = self.DEEP_K_LARGE_Q
            kd = max(kk, min(deep, db["n"] - 1)) if deep else kk
            if exact_ctx is not None:
                ec = exact_ctx
                # flow payloads (H/Sw/Su of the fetched rows) ride the same
                # transfer when small — a tie-safe query then finishes in
                # ONE device fetch; the budget caps the TOTAL transfer
                # across buckets (per-bucket caps could stack to many MB on
                # many-bucket corpora), past it flows fall back to the
                # final-round rescore
                pay_bytes = (
                    Q * kk * 4 * (
                        (db["capacity"] + 1) * (ec["Tmax"] + 1)
                        + 2 * db["capacity"] * ec["Tmax"]
                    )
                )
                with_pay = pay_bytes <= pay_budget
                if with_pay:
                    pay_budget -= pay_bytes
                gv_s = self._bucket_gv_s(db, ec)
                if kd < db["n"]:
                    vals, idx, raw, H, Sw, Su = _topk_exact_rescore(
                        scores, db["tokens"], db["pos"], db["tag"],
                        db["lengths"].astype(jnp.int32), ec["table"],
                        *ec["tw_args"], *ec["flt"], ec["lt_q"], ec["gaps"],
                        gv_s, ec["gv_t"],
                        n=db["n"], kk=kk, kd=kd, V=ec["V"],
                        locality=ec["locality"], any_tags=ec["any_tags"],
                        general=ec["gap_costs"] is not None,
                        with_filter=ec["with_filter"],
                    )
                    metas.append(
                        {
                            "db": db, "kk": kd, "kk_pay": kk,
                            "full": False, "pay": with_pay,
                        }
                    )
                    refs.extend((vals, idx, raw))
                else:
                    vals, raw, H, Sw, Su = _full_exact_rescore(
                        scores, db["tokens"], db["pos"], db["tag"],
                        db["lengths"].astype(jnp.int32), ec["table"],
                        *ec["tw_args"], *ec["flt"], ec["lt_q"], ec["gaps"],
                        gv_s, ec["gv_t"],
                        n=db["n"], V=ec["V"],
                        locality=ec["locality"], any_tags=ec["any_tags"],
                        general=ec["gap_costs"] is not None,
                        with_filter=ec["with_filter"],
                    )
                    metas.append(
                        {"db": db, "kk": kk, "full": True, "pay": with_pay}
                    )
                    refs.extend((vals, raw))
                if with_pay:
                    refs.extend((H, Sw, Su))
            elif kk < db["n"]:
                vals, idx = jax.lax.top_k(scores[: db["n"]].T, kk + 1)
                metas.append({"db": db, "kk": kk, "full": False})
                refs.append(vals)
                refs.append(idx)
            else:
                metas.append({"db": db, "kk": kk, "full": True})
                refs.append(scores[: db["n"]].T)
            if lazy:
                # paged mode, double-buffered: issue the NEXT bucket's
                # upload + scoring dispatch (async) before this bucket's
                # blocking fetch, so the transfer overlaps the compute;
                # then fetch this bucket's refs (the host read is the
                # completion barrier) and evict — HBM stays bounded at
                # ~two buckets
                if (
                    _page_prefetch_default()
                    and pi + 1 < len(pending)
                    and isinstance(pending[pi + 1][1], _LazyScores)
                ):
                    pending[pi + 1][1].get()
                refs[bucket_ref_start:] = jax.device_get(
                    refs[bucket_ref_start:]
                )
                entry.release()
        trace.add("topk.rescore_dispatch", time.perf_counter() - t_loop0)
        # np arrays from the paged per-bucket fetches pass through device_get
        with trace.span("topk.fetch"):
            fetched = jax.device_get(refs) if refs else []
        _t_unpack = time.perf_counter()
        self._buckets = []
        pos = 0
        for m in metas:
            db = m["db"]
            if "sid_dev" in db:
                db["slice_index"] = np.asarray(fetched[pos])
                m["ub_rest_raw"] = float(fetched[pos + 1])
                pos += 2
            if m["full"]:
                vals = np.asarray(fetched[pos])
                pos += 1
                m["vals"] = vals  # [Q, n]
                m["sids"] = np.broadcast_to(
                    db["slice_index"][None, :], vals.shape
                )
                m["bound"] = np.full((self.Q,), -np.inf, np.float32)
            else:
                vals = np.asarray(fetched[pos])
                idx = np.asarray(fetched[pos + 1])
                pos += 2
                kk = m["kk"]
                m["vals"] = vals[:, :kk]
                m["sids"] = db["slice_index"][idx[:, :kk]]
                m["bound"] = vals[:, kk].astype(np.float32)
            if self.has_exact:
                m["exact"] = np.asarray(fetched[pos])  # [Q, kk] raw f32
                pos += 1
                if m.get("pay"):
                    m["H"] = np.asarray(fetched[pos]).reshape(
                        self.Q, -1, *fetched[pos].shape[1:]
                    )
                    m["Sw"] = np.asarray(fetched[pos + 1]).reshape(
                        self.Q, -1, *fetched[pos + 1].shape[1:]
                    )
                    m["Su"] = np.asarray(fetched[pos + 2]).reshape(
                        self.Q, -1, *fetched[pos + 2].shape[1:]
                    )
                    pos += 3
            self._buckets.append(m)
        self._col_cache = {}
        trace.add("topk.unpack", time.perf_counter() - _t_unpack)

    # flow payloads (H/Sw/Su) ride the initial fetch only up to this size;
    # bigger batches defer flows to the final-round rescore instead
    PAYLOAD_MAX_BYTES = 8 << 20
    # deep (score, id, raw) fetch depth at latency-serving Q (<=8): covers
    # Zipf boundary tie groups so the cut proves safe without a second
    # select round
    DEEP_K = 512
    # reduced depth for serving batches (the tail's fused-DP rescore and
    # transfer scale with Q x depth; 128 still absorbs most tie groups,
    # and an overflow falls back to the fused select round)
    DEEP_K_LARGE_Q = 128

    @staticmethod
    def _bucket_gv_s(db, ec):
        """Per-bucket s-side general-gap cost vector (zeros placeholder on
        the affine path), cached per capacity in the exact context."""
        cache = ec.setdefault("_gv_s_cache", {})
        L = db["capacity"]
        if L not in cache:
            gc = ec["gap_costs"]
            cache[L] = jnp.asarray(
                gap_vec(gc[0] if gc is not None else None, L + 1)
            )
        return cache[L]

    def flows_payload(self, qi: int, sid: int):
        """(H [S1, T1], Sw [L, Tmax], Su, slice_len) for a candidate that
        was fetched with flow payloads, else None (caller rescores)."""
        if not self.has_exact:
            return None
        for m in self._buckets:
            if not m.get("pay"):
                continue
            hit = np.flatnonzero(m["sids"][qi] == sid)
            if hit.size:
                p = int(hit[0])
                if p >= m["H"].shape[1]:
                    # deep-fetched tail candidate: (score, id, raw) came
                    # on the transfer but its flow payload did not —
                    # caller rescores flows for it (round 3)
                    return None
                ln = int(self._engine._packed.slice_len[sid])
                return m["H"][qi, p], m["Sw"][qi, p], m["Su"][qi, p], ln
        return None

    @property
    def prefilter_rest_raw(self) -> float:
        """Max RAW-score upper bound over every slice PRUNED by the MXU
        prefilter (-inf when nothing was pruned).  Slices below it are
        absent from this source entirely — the serving path must prove
        rest/norm_total < s_n - eps or rerun unpruned (score_topk_
        prefiltered's soundness contract)."""
        vals = [m["ub_rest_raw"] for m in self._buckets if "ub_rest_raw" in m]
        return max(vals) if vals else float("-inf")

    def qview(self, qi: int) -> "TopKView":
        return TopKView(self, qi)

    def score_map(self, qi: int, thresh: float):
        """({sid: device score} over fetched entries >= thresh, upper
        bound on every UNFETCHED score) for one query."""
        smap = {}
        bound = float("-inf")
        for b in self._buckets:
            vq = b["vals"][qi]
            keep = vq >= thresh
            for sid, sc in zip(b["sids"][qi][keep], vq[keep]):
                smap[int(sid)] = float(sc)
            bound = max(bound, float(b["bound"][qi]))
        return smap, bound

    def top_k_exactly(self, qi: int, k: int, min_score: float):
        return self.top_k_exactly_many([qi], k, min_score)[0]

    def top_k_exactly_many(self, qis, k: int, min_score: float,
                           slack: float = 0.0, pool: bool = False):
        """[(top ids, {sid: device score})] per query, replicating
        BruteForceEngine.top_k's tie-complete semantics over the
        still-resident device score matrices: the candidate pool is every
        slice scoring >= the k-th largest value (boundary ties resolve by
        the (doc, slice) order).  Pools that the initial per-bucket fetch
        might truncate are completed with ONE fused select-with-values
        round shared by ALL queries — per-query completion rounds would
        pay a tunnel round trip each on tie-heavy corpora.  Fetching
        everything >= the provisional cut can only raise the k-th value,
        so the completed pool still covers every slice >= the true
        threshold.

        ``slack`` lowers the pool cut below the k-th value: consumers that
        exactly RESCORE the candidates (host relaxed-WMD reporting) need
        every slice whose rescored value could reach the rescored k-th,
        and slack >= their device-vs-rescore drift bound makes the pool
        provably complete.  ``pool=True`` returns (ordered pool, smap,
        rest) triples instead: the FULL ordered candidate list >= the cut
        plus an inclusive upper bound on every slice outside smap."""
        smaps, cuts, bounds, unsafe = {}, {}, {}, []
        for qi in qis:
            smap, bound = self.score_map(qi, min_score)
            smaps[qi] = smap
            bounds[qi] = bound
            if smap:
                vals = np.fromiter(smap.values(), np.float32, len(smap))
                thr = (
                    float(-np.partition(-vals, k - 1)[k - 1]) - slack
                    if len(vals) >= k
                    else min_score
                )
                cuts[qi] = max(thr, min_score)
            else:
                cuts[qi] = min_score
            if bound >= cuts[qi]:
                unsafe.append(qi)
        rests = {
            qi: min(bounds[qi], cuts[qi]) for qi in qis
        }  # unfetched <= rest (completion below fetches everything >= cut)
        if unsafe:
            found = self.above_vals_many(
                [(self.qview(qi), cuts[qi], set(smaps[qi])) for qi in unsafe]
            )
            for qi, (_ids, vmap) in zip(unsafe, found):
                smaps[qi].update(vmap)
                vals = np.fromiter(
                    smaps[qi].values(), np.float32, len(smaps[qi])
                )
                if len(vals) >= k:
                    cuts[qi] = max(
                        float(-np.partition(-vals, k - 1)[k - 1]) - slack,
                        min_score,
                    )
        out = []
        for qi in qis:
            smap, cut = smaps[qi], cuts[qi]
            cand = np.asarray(
                [sid for sid, sc in smap.items() if sc >= cut], np.int64
            )
            if cand.size == 0:
                out.append(([], smap, rests[qi]) if pool else ([], smap))
                continue
            cvals = np.asarray([smap[int(c)] for c in cand], np.float32)
            order = order_by_score(self._engine.packed, cand, cvals)
            ids = [int(c) for c in cand[order]]
            if pool:
                out.append((ids, smap, rests[qi]))
            else:
                out.append((ids[:k], smap))
        return out

    def covers_all(self, m: int) -> bool:
        # full buckets alone are NOT enough: ``initial`` truncates the
        # merged candidate list to m, so slices can be dropped whenever
        # the total fetched count exceeds m (they stay covered by
        # rest_max and the extras round)
        return all(b["full"] for b in self._buckets) and (
            sum(b["db"]["n"] for b in self._buckets) <= m
        )

    def initial(self, qi: int, m: int, thresh: float, with_exact=False):
        vals = np.concatenate([b["vals"][qi] for b in self._buckets])
        sids = np.concatenate([b["sids"][qi] for b in self._buckets])
        bound = max(
            (float(b["bound"][qi]) for b in self._buckets),
            default=float("-inf"),
        )
        exact = (
            np.concatenate([b["exact"][qi] for b in self._buckets])
            if with_exact and self.has_exact
            else None
        )
        keep = vals >= thresh
        vk, ik = vals[keep], sids[keep]
        ek = exact[keep] if exact is not None else None
        rest_max = bound
        if len(vals) > len(vk):
            rest_max = max(rest_max, float(np.max(vals[~keep])))
        if len(vk) > m:
            ap = np.argpartition(-vk, m)
            rest_max = max(rest_max, float(vk[ap[m]]))
            vk, ik = vk[ap[:m]], ik[ap[:m]]
            if ek is not None:
                ek = ek[ap[:m]]
        cand = [int(c) for c in ik]
        if with_exact:
            return cand, rest_max, ek
        return cand, rest_max

    # cap on the device-side thresholded index select: extras are
    # tie-bounded and usually small, but Zipf tie groups run to thousands
    # — 8192 int32 ids is 32 KB/query vs 4 MB for a full 1M-slice column
    # (the full-column read measured ~3 s of a 6 s 32-query batch)
    ABOVE_CAP = 8192

    def _column(self, bi: int, qi: int):
        key = (bi, qi)
        if key not in self._col_cache:
            db, entry = self._pending[bi]
            if isinstance(entry, _LazyScores):
                # paged fallback: re-page the bucket and recompute its
                # scores for this column, then evict again — correct and
                # memory-bounded, at the price of a bucket re-pass
                scores = entry.get()
                self._col_cache[key] = np.asarray(scores[: db["n"], qi])
                entry.release()
            else:
                self._col_cache[key] = np.asarray(entry[: db["n"], qi])
        return self._col_cache[key]

    def above_many(self, reqs):
        return [ids for ids, _ in self._above_impl(reqs, "ids")]

    def above_exact_many(self, reqs):
        """Like above_many but each request also gets {sid: exact raw f32
        DP score} for ids covered by the fused select — one fetch serves
        both the tie-extras select AND their exact rescore.  Ids missing
        from the map (overflowed tie groups, cached full columns) still
        need the finalizer's rescore."""
        return self._above_impl(reqs, "exact" if self.has_exact else "ids")

    def above_vals_many(self, reqs):
        """Like above_many but each request also gets {sid: device ranking
        score} — for consumers that rank directly on the device values
        (transport metrics); the map is always COMPLETE (full-column
        fallbacks have the values too)."""
        return self._above_impl(reqs, "vals")

    def _above_impl(self, reqs, mode: str):
        with trace.span(f"above.{mode}"):
            return self._above_impl_inner(reqs, mode)

    def _above_impl_inner(self, reqs, mode: str):
        # phase 1: device-side thresholded select (optionally fused with
        # the exact rescore) for every needed (bucket, query) column,
        # batched into one transfer; only tie groups overflowing the cap
        # fall back to a full column read
        need = []
        for view, thresh, _ in reqs:
            qi = view.qi
            for bi, b in enumerate(self._buckets):
                if (
                    not b["full"]
                    and float(b["bound"][qi]) >= thresh
                    and (bi, qi) not in self._col_cache
                ):
                    need.append((bi, qi, thresh))
        sel = {}
        raws = {}
        if need:
            paged = any(
                isinstance(e, _LazyScores) for _, e in self._pending
            )
            if paged:
                # group by bucket so each re-pages (and recomputes) once
                need = sorted(need, key=lambda t: t[0])
            refs = []
            per = 2 if mode == "ids" else 3
            live = None  # (bi, entry, ref_start) of the paged-in bucket
            for bi, qi, thresh in need:
                db, entry = self._pending[bi]
                lazy = isinstance(entry, _LazyScores)
                if lazy and live is not None and live[0] != bi:
                    refs[live[2]:] = jax.device_get(refs[live[2]:])
                    live[1].release()
                    live = None
                if lazy and live is None:
                    live = (bi, entry, len(refs))
                scores = entry.get() if lazy else entry
                size = min(self.ABOVE_CAP, db["n"])
                if mode == "exact":
                    ec = self.exact_ctx
                    idx, cnt, raw = _col_above_exact(
                        scores, np.int32(qi), np.float32(thresh),
                        db["tokens"], db["pos"], db["tag"],
                        db["lengths"].astype(jnp.int32), ec["table"],
                        *ec["tw_args"], *ec["flt"], ec["lt_q"], ec["gaps"],
                        self._bucket_gv_s(db, ec), ec["gv_t"],
                        n=db["n"], size=size, V=ec["V"],
                        locality=ec["locality"], any_tags=ec["any_tags"],
                        general=ec["gap_costs"] is not None,
                        with_filter=ec["with_filter"],
                    )
                    refs.extend((idx, cnt, raw))
                elif mode == "vals":
                    idx, cnt, vals = _col_above_vals(
                        scores, np.int32(qi), np.float32(thresh),
                        db["n"], size,
                    )
                    refs.extend((idx, cnt, vals))
                else:
                    idx, cnt = _col_above_idx(
                        scores, np.int32(qi), np.float32(thresh),
                        db["n"], size,
                    )
                    refs.extend((idx, cnt))
            if live is not None:
                refs[live[2]:] = jax.device_get(refs[live[2]:])
                live[1].release()
            fetched = jax.device_get(refs)
            full_need = []
            for j, (bi, qi, thresh) in enumerate(need):
                idx = np.asarray(fetched[per * j])
                cnt = int(fetched[per * j + 1])
                if cnt > min(self.ABOVE_CAP, self._pending[bi][0]["n"]):
                    full_need.append((bi, qi))
                else:
                    kept = idx >= 0
                    sel[(bi, qi)] = idx[kept]
                    if mode != "ids":
                        raws[(bi, qi)] = np.asarray(
                            fetched[per * j + 2]
                        )[kept]
            if full_need:
                if paged:
                    # per-column re-pass through _column's lazy handling
                    for bi, qi in full_need:
                        self._column(bi, qi)
                else:
                    cols = jax.device_get(
                        [
                            self._pending[bi][1][
                                : self._pending[bi][0]["n"], qi
                            ]
                            for bi, qi in full_need
                        ]
                    )
                    for (bi, qi), col in zip(full_need, cols):
                        self._col_cache[(bi, qi)] = np.asarray(col)
        out = []
        for view, thresh, excl in reqs:
            qi = view.qi
            seen = set(excl)
            ids = []
            rmap = {}
            for bi, b in enumerate(self._buckets):
                hit_raws = None
                if not b["full"] and float(b["bound"][qi]) >= thresh:
                    db = self._pending[bi][0]
                    if (bi, qi) in sel and (bi, qi) not in self._col_cache:
                        hit = db["slice_index"][sel[(bi, qi)]]
                        hit_raws = raws.get((bi, qi))
                    else:
                        col = self._column(bi, qi)
                        pos_hit = np.flatnonzero(col >= thresh)
                        hit = db["slice_index"][pos_hit]
                        if mode == "vals":
                            hit_raws = col[pos_hit]
                else:
                    vq = b["vals"][qi]
                    keep = vq >= thresh
                    hit = b["sids"][qi][keep]
                    if mode == "exact" and "exact" in b:
                        hit_raws = b["exact"][qi][keep]
                    elif mode == "vals":
                        hit_raws = vq[keep]
                for p, c in enumerate(hit):
                    c = int(c)
                    if c not in seen:
                        seen.add(c)
                        ids.append(c)
                        if hit_raws is not None:
                            rmap[c] = float(hit_raws[p])
            out.append((ids, rmap))
        return out


class TopKView:
    """Per-query view over a shared BucketTopKSource (the finalizer's
    items are per query; column fetches batch through the parent)."""

    def __init__(self, src: BucketTopKSource, qi: int):
        self._src = src
        self.qi = qi

    @property
    def parent(self):
        return self._src

    def covers_all(self, m: int) -> bool:
        return self._src.covers_all(m)

    def initial(self, m: int, thresh: float):
        return self._src.initial(self.qi, m, thresh)

    def initial_exact(self, m: int, thresh: float):
        """(cand, rest_max, exact raw scores or None) — the exact scores
        arrive with the fused top-k dispatch (no extra round trip)."""
        return self._src.initial(self.qi, m, thresh, with_exact=True)

    def flows_payload(self, sid: int):
        return self._src.flows_payload(self.qi, sid)


@dataclass
class TagWeightingSpec:
    """Tag-weighted similarity (reference TagWeightedSlice,
    slice/static.h:186-288): S'(i,j) = S(i,j) * tpw[j] * (1 - penalty *
    [pos_s(i) != pos_t(j)]), thresholded to 0."""

    t_pos_weights: np.ndarray  # [T] f32 per needle token
    pos_t: np.ndarray  # [T] i8 universal pos ids of needle tokens
    pos_mismatch_penalty: float
    similarity_threshold: float

    @property
    def total(self) -> float:
        return float(np.sum(self.t_pos_weights))

    def device_args(self):
        return (
            jnp.asarray(self.t_pos_weights, jnp.float32),
            jnp.asarray(self.pos_t, jnp.int8),
            jnp.asarray(self.pos_mismatch_penalty, jnp.float32),
            jnp.asarray(self.similarity_threshold, jnp.float32),
        )

    @staticmethod
    def identity_args(T: int):
        """Inert (weight 1 is NOT needed: with_tags=False skips weighting;
        these only placate jit argument shapes)."""
        return (
            jnp.zeros((T,), jnp.float32),
            jnp.zeros((T,), jnp.int8),
            jnp.asarray(0.0, jnp.float32),
            jnp.asarray(0.0, jnp.float32),
        )


@dataclass
class DocFilterSpec:
    """Document-side token filtering (reference TokenFilter query.h:8-28 +
    FilteredSlice slice/static.h:104-184): drop document tokens by universal
    POS, fine tag, or explicit token string before alignment.  On device the
    per-slice sequences are compacted with a stable argsort."""

    pos_exclude: np.ndarray  # [n_pos] bool
    tag_exclude: np.ndarray  # [n_tags] bool
    token_exclude: np.ndarray  # [V] bool


def _compact_slices(tok, pos, tag, lengths, pos_ex, tag_ex, tok_ex):
    """Stable-compact kept tokens to the front; returns (perm, new_lengths,
    keep).  perm gathers original positions; dropped/padded go to the end."""
    c, L = tok.shape
    idx = jnp.arange(L, dtype=jnp.int32)[None, :]
    valid = idx < lengths[:, None]
    keep = valid & ~pos_ex[pos] & ~tag_ex[tag] & ~tok_ex[tok]
    # stable sort: kept positions (key 0) before dropped (key 1)
    key = jnp.where(keep, 0, 1).astype(jnp.int32)
    perm = jnp.argsort(key, axis=1, stable=True).astype(jnp.int32)
    new_lengths = jnp.sum(keep, axis=1).astype(jnp.int32)
    return perm, new_lengths, keep


def _apply_tag_weights(S, pos_s, tw_weights, tw_pos_t, tw_penalty, tw_threshold):
    # S: [n, L, T]; pos_s: [n, L] i8; weights/pos_t: [T]
    w = tw_weights[None, None, :] * jnp.where(
        pos_s[:, :, None] == tw_pos_t[None, None, :],
        1.0,
        1.0 - tw_penalty,
    )
    Sw = S * w
    return jnp.where(Sw > tw_threshold, Sw, 0.0)


@functools.partial(
    jax.jit,
    static_argnames=(
        "plan", "locality", "chunk", "with_tags", "with_filter", "general_gaps",
        "use_pallas",
    ),
)
def _bucket_scores(
    plan: tuple,
    token_ids: jnp.ndarray,  # [N, L] i32 (N padded to chunk multiple)
    tok_sorted: jnp.ndarray,  # [n_chunks, chunk*L] sorted gather stream
    sort_inv: jnp.ndarray,  # [n_chunks, chunk*L] inverse permutation
    pos_ids: jnp.ndarray,  # [N, L] i8
    tag_ids: jnp.ndarray,  # [N, L] i16
    lengths: jnp.ndarray,  # [N] i32 (0 for padding rows)
    static_sims: tuple,  # k -> [V, T]
    static_mags: tuple,
    ctx_chunks: tuple,  # k -> [N, L, d]
    ctx_queries: tuple,  # k -> dict of [T, d] arrays
    mixed_weights: tuple,
    len_t: jnp.ndarray,  # scalar i32
    gaps: AffineGapParams,
    boost: jnp.ndarray,  # [N] f32
    norm_total: jnp.ndarray,  # scalar f32
    tw_weights: jnp.ndarray,  # [T] f32 (unused unless with_tags)
    tw_pos_t: jnp.ndarray,  # [T] i8
    tw_penalty: jnp.ndarray,  # scalar f32
    tw_threshold: jnp.ndarray,  # scalar f32
    flt_pos: jnp.ndarray,  # [n_pos] bool (unused unless with_filter)
    flt_tag: jnp.ndarray,  # [n_tags] bool
    flt_tok: jnp.ndarray,  # [V] bool
    gap_vec_s: jnp.ndarray,  # [L+1] (general-gap path only)
    gap_vec_t: jnp.ndarray,  # [T+1]
    locality: str,
    chunk: int,
    with_tags: bool,
    with_filter: bool,
    general_gaps: bool = False,
    use_pallas: bool = False,
):
    """Normalized scores for every slice of one bucket: [N] f32."""
    N, L = token_ids.shape
    n_chunks = N // chunk

    lt_full = jnp.full((chunk,), len_t, jnp.int32)

    def one_chunk(args):
        tok, ts, inv, pos, tag, ln, ctx = args
        S = eval_plan_chunk(
            plan, tok, static_sims, static_mags, ctx, ctx_queries,
            mixed_weights, sorted_gather=(ts, inv),
        )["similarity"]
        if with_filter:
            # compact AFTER the gather (a row permutation of S) so the
            # gather can keep its pack-time sorted stream
            perm, ln, _ = _compact_slices(tok, pos, tag, ln, flt_pos, flt_tag, flt_tok)
            S = jnp.take_along_axis(S, perm[:, :, None], axis=1)
            pos = jnp.take_along_axis(pos, perm, axis=1)
        if with_tags:
            S = _apply_tag_weights(S, pos, tw_weights, tw_pos_t, tw_penalty, tw_threshold)
        ln1 = jnp.maximum(ln, 1)
        if general_gaps and use_pallas:
            from vectorian_tpu.ops.pallas_dp import pallas_align_scores_general

            raw = pallas_align_scores_general(
                S, ln1, len_t, gap_vec_s, gap_vec_t, locality
            )
        elif general_gaps:
            raw = align_scores_general(
                S, ln1, lt_full, gap_vec_s, gap_vec_t, locality
            )
        else:
            # single-query affine: the fused jnp scan beats the Pallas
            # kernel here (~4.8x — per-chunk launch/layout overhead)
            raw = align_scores(S, ln1, lt_full, gaps, locality)
        return jnp.where(ln > 0, raw, NEG_SCORE)

    xs = (
        token_ids.reshape(n_chunks, chunk, L),
        tok_sorted,
        sort_inv,
        pos_ids.reshape(n_chunks, chunk, L),
        tag_ids.reshape(n_chunks, chunk, L),
        lengths.reshape(n_chunks, chunk),
        tuple(c.reshape(n_chunks, chunk, L, c.shape[-1]) for c in ctx_chunks),
    )
    raw = jax.lax.map(one_chunk, xs).reshape(N)
    scores = raw / jnp.maximum(norm_total, 1e-9) * boost
    return jnp.where(raw <= NEG_SCORE * 0.5, NEG_SCORE, scores)


@functools.partial(
    jax.jit,
    static_argnames=(
        "locality", "chunk", "n_queries", "use_pallas", "with_tags",
        "general_gaps", "with_filter", "with_boost", "uniq_gather",
    ),
)
def _bucket_scores_multiquery(
    token_ids: jnp.ndarray,  # [N, L] i32
    pos_ids: jnp.ndarray,  # [N, L] i8 (unused unless with_tags/with_filter)
    tag_ids: jnp.ndarray,  # [N, L] i16 (unused unless with_filter)
    lengths: jnp.ndarray,  # [N] i32
    sim_multi: jnp.ndarray,  # [V, T, Q] f32 — Q stacked query matrices
    len_t: jnp.ndarray,  # [Q] i32
    gaps: AffineGapParams,
    norm_total: jnp.ndarray,  # [Q] f32
    boost: jnp.ndarray,  # [N, 1] shared or [N, Q] per-query boosts
    tw_weights: jnp.ndarray,  # [T, Q] f32 per-query tag weights
    tw_pos_t: jnp.ndarray,  # [T, Q] i8 per-query needle pos ids
    tw_penalty: jnp.ndarray,  # [Q] f32 per-query mismatch penalty
    tw_threshold: jnp.ndarray,  # [Q] f32 per-query similarity threshold
    flt_pos: jnp.ndarray,  # [n_pos] bool (unused unless with_filter)
    flt_tag: jnp.ndarray,  # [n_tags] bool
    flt_tok: jnp.ndarray,  # [V] bool
    gap_vec_s: jnp.ndarray,  # [L+1] (general-gap path only)
    gap_vec_t: jnp.ndarray,  # [T+1]
    locality: str,
    chunk: int,
    n_queries: int,
    use_pallas: bool = False,
    with_tags: bool = False,
    general_gaps: bool = False,
    with_filter: bool = False,
    with_boost: bool = False,
    sim_scale=1.0,  # traced f32: sim table is in units of sim_scale (int8)
    uniq=None,  # [n_chunks, U_max] per-chunk sorted unique token ids
    uniq_inv=None,  # [n_chunks, chunk*L] position -> unique index
    uniq_gather: bool = False,
):
    """[N, Q] normalized scores — Q queries in one corpus pass.

    The vocab-row gather dominates a corpus pass on TPU: its cost is
    per-index and memory-locality bound, so batching Q queries into one
    [V, T, Q] table amortizes it Q-fold.  The [T, Q]-minor table layout
    makes the gather output [L, c, T, Q] *already* the DP kernel's native
    tiling ((T, Q) = (sublane, lane)) — no relayout of the gathered
    similarity stream ever touches HBM (measured ~1.5x over the
    transpose-based pipeline).  This is the TPU serving analogue of the
    reference's one-query-at-a-time loop.
    """
    N, L = token_ids.shape
    T, Q = sim_multi.shape[1], sim_multi.shape[2]
    n_chunks = N // chunk

    # int8 tables quarter the gather's HBM traffic.  Max-plus DP is
    # positively homogeneous — align(S/c, gaps/c) = align(S, gaps)/c,
    # including the local zero floor and general gap-cost vectors — so
    # quantized units flow through the UNCHANGED kernels: divide the gap
    # params by sim_scale going in, multiply the raw scores by sim_scale
    # coming out.
    gaps = AffineGapParams(
        *(jnp.asarray(g, jnp.float32) / sim_scale for g in gaps)
    )
    gap_vec_s = jnp.asarray(gap_vec_s, jnp.float32) / sim_scale
    gap_vec_t = jnp.asarray(gap_vec_t, jnp.float32) / sim_scale

    # the gather-native (NT) kernel puts Q in lanes — only efficient when
    # the batch fills them; below PALLAS_MIN_BATCH the fused jnp scan wins
    # outright (measured).  The general-gap WSB DP has no NT kernel yet —
    # it always takes the jnp scan path.
    nt = n_queries >= PALLAS_MIN_BATCH and not general_gaps

    def one_chunk(args):
        if uniq_gather:
            tokT, posT, tagT, ln, bst, uq, uinvT = args
        else:
            tokT, posT, tagT, ln, bst = args  # [L, c] x3, [c], [c, 1|Q]
        c = tokT.shape[1]
        # ONE gather serves Q queries, in kernel-native layout.  A bf16
        # table halves the gather's HBM traffic (the pass is near the HBM
        # roofline); the Pallas kernel consumes the bf16 block directly and
        # accumulates in f32, the jnp path upcasts right after the gather.
        if uniq_gather:
            # two-stage gather: the per-index cost is paid only on the
            # chunk's deduped (and sorted -> coherent) unique ids; the
            # re-expansion reads a small hot [U_max, T, Q] block.  The
            # barrier forces stage 1 to MATERIALIZE — XLA otherwise fuses
            # gathers into consumers and iterates in output order,
            # silently discarding the dedup (CLAUDE.md).
            rows = sim_multi[uq]  # [U_max, T, Q]
            rows = jax.lax.optimization_barrier(rows)
            S = rows[uinvT]  # [L, c, T, Q]
        else:
            S = sim_multi[tokT]  # [L, c, T, Q]
        if not (use_pallas and nt):
            S = S.astype(jnp.float32)
        elif S.dtype == jnp.int4:
            # int4 tables halve the gathered HBM bytes again; Mosaic
            # consumes >=8-bit blocks, so widen right after the gather
            S = S.astype(jnp.int8)
        if with_filter:
            # compact AFTER the gather (an L-axis permutation of S per
            # column) so the gather layout stays contiguous — the batch
            # analogue of _bucket_scores' compaction
            perm, ln, _ = _compact_slices(
                tokT.T, posT.T, tagT.T, ln, flt_pos, flt_tag, flt_tok
            )
            permT = perm.T  # [L, c]
            S = jnp.take_along_axis(S, permT[:, :, None, None], axis=0)
            posT = jnp.take_along_axis(posT, permT, axis=0)
        if with_tags:
            # tag-weighted similarity per query (TagWeightedSlice semantics,
            # slice/static.h:186-288, broadcast over the batch layout);
            # penalty/threshold are per-query so untagged queries in a mixed
            # batch stay identity (penalty 0, threshold -1)
            w = tw_weights[None, None, :, :] * jnp.where(
                posT[:, :, None, None] == tw_pos_t[None, None, :, :],
                1.0,
                1.0 - tw_penalty[None, None, None, :],
            )
            Sw = S * w
            S = jnp.where(Sw > tw_threshold[None, None, None, :], Sw, 0.0)
        if use_pallas and nt:
            from vectorian_tpu.ops.pallas_dp import pallas_align_scores_multi_nt

            raw = pallas_align_scores_multi_nt(
                S, jnp.maximum(ln, 1), len_t, gaps, locality
            )
        else:
            S2 = jnp.transpose(S, (1, 3, 0, 2)).reshape(c * Q, L, T)
            ln_rep = jnp.repeat(jnp.maximum(ln, 1), Q)
            lt_rep = jnp.tile(len_t, c)
            if general_gaps and use_pallas and n_queries >= PALLAS_MIN_BATCH:
                # the WSB Pallas kernel takes the flattened [c*Q] batch
                # (measured ~16x over the jnp scan at serving batch sizes)
                from vectorian_tpu.ops.pallas_dp import (
                    pallas_align_scores_general,
                )

                raw = pallas_align_scores_general(
                    S2, ln_rep, lt_rep, gap_vec_s, gap_vec_t, locality
                ).reshape(c, Q)
            elif general_gaps:
                raw = align_scores_general(
                    S2, ln_rep, lt_rep, gap_vec_s, gap_vec_t, locality
                ).reshape(c, Q)
            else:
                raw = align_scores(
                    S2, ln_rep, lt_rep, gaps, locality
                ).reshape(c, Q)
        raw = raw * sim_scale  # back from quantized units (no-op at 1.0)
        scores = raw / jnp.maximum(norm_total[None, :], 1e-9)
        if with_boost:
            scores = scores * bst  # [c, 1] broadcasts; [c, Q] per query
        return jnp.where(ln[:, None] > 0, scores, NEG_SCORE)

    # transpose the (tiny) index arrays once, outside the chunk loop, so the
    # (huge) gather consumes contiguous [L, c] index blocks
    tokens_T = jnp.swapaxes(token_ids.reshape(n_chunks, chunk, L), 1, 2)
    pos_T = jnp.swapaxes(pos_ids.reshape(n_chunks, chunk, L), 1, 2)
    tag_T = jnp.swapaxes(tag_ids.reshape(n_chunks, chunk, L), 1, 2)
    xs = (
        tokens_T,
        pos_T,
        tag_T,
        lengths.reshape(n_chunks, chunk),
        boost.reshape(n_chunks, chunk, -1),
    )
    if uniq_gather:
        xs = xs + (
            uniq,
            jnp.swapaxes(uniq_inv.reshape(n_chunks, chunk, L), 1, 2),
        )
    return jax.lax.map(one_chunk, xs).reshape(N, Q)


def stack_tree_plans(plans, len_ts):
    """Stack Q structurally-identical modifier-tree plans into per-leaf
    Q-minor arrays: static leaves -> [V, Tpad*Q] tables, contextual leaves
    -> [Tpad*Q, d] query-vector dicts (the ctx batch layout).  Every
    eval_plan_chunk modifier op (mixed/max/min/unary) is elementwise over
    the similarity tensor's trailing axis, so the SAME tree evaluation
    serves all Q stacked queries in one pass; the [c, L, Tpad*Q] output
    reshapes to the multi-DP tiling.  Tree structure and mixed weights are
    index-level (one token-sim spec), so they are shared.
    Returns (static_sims, ctx_query_dicts, mixed_weights, Tpad)."""
    p0 = plans[0]
    assert all(qp.plan == p0.plan for qp in plans), "tree structure differs"
    Q = len(plans)
    Tmax = max(len_ts)
    Tpad = -(-Tmax // 8) * 8
    statics = []
    for k in range(len(p0.static_sims)):
        V = p0.static_sims[k].shape[0]
        out = np.zeros((V, Tpad, Q), np.float32)
        for q, qp in enumerate(plans):
            m = np.asarray(qp.static_sims[k], np.float32)
            out[:, : m.shape[1], q] = m
        statics.append(jnp.asarray(out.reshape(V, Tpad * Q)))
    ctxs = []
    for k in range(len(p0.ctx_queries)):
        u, nrm, mg, Tp2 = stack_ctx_queries(
            [qp.ctx_queries[k] for qp in plans], len_ts
        )
        assert Tp2 == Tpad
        ctxs.append({"unmodified": u, "normalized": nrm, "magnitudes": mg})
    return tuple(statics), tuple(ctxs), tuple(p0.mixed_weights), Tpad


@functools.partial(
    jax.jit,
    static_argnames=(
        "plan", "locality", "chunk", "n_queries", "use_pallas",
        "general_gaps", "with_filter", "with_tags",
    ),
)
def _bucket_scores_multiquery_tree(
    plan: tuple,
    token_ids: jnp.ndarray,  # [N, L] i32
    tok_sorted: jnp.ndarray,  # [n_chunks, chunk*L] sorted gather stream
    sort_inv: jnp.ndarray,  # [n_chunks, chunk*L]
    lengths: jnp.ndarray,  # [N] i32
    static_sims: tuple,  # k -> [V, T*Q] stacked (q-minor)
    static_mags: tuple,
    ctx_chunks: tuple,  # k -> [N, L, d] bucket stores
    ctx_queries: tuple,  # k -> dict of [T*Q, ...] stacked query vectors
    mixed_weights: tuple,
    len_t: jnp.ndarray,  # [Q] i32
    gaps: AffineGapParams,
    norm_total: jnp.ndarray,  # [Q] f32
    gap_vec_s: jnp.ndarray,  # [L+1] (general-gap path only)
    gap_vec_t: jnp.ndarray,  # [T+1]
    pos_ids: jnp.ndarray,  # [N, L] i8 (tags/filters only; [1, 1] unused)
    tag_ids: jnp.ndarray,  # [N, L] i16
    tw_weights: jnp.ndarray,  # [T, Q] f32 per-query tag weights (tags only)
    tw_pos_t: jnp.ndarray,  # [T, Q] i8 per-query needle pos ids
    tw_penalty: jnp.ndarray,  # [Q] f32
    tw_threshold: jnp.ndarray,  # [Q] f32
    flt_pos: jnp.ndarray,  # [n_pos] bool exclusion masks (filters only)
    flt_tag: jnp.ndarray,
    flt_tok: jnp.ndarray,
    locality: str,
    chunk: int,
    n_queries: int,
    use_pallas: bool = False,
    general_gaps: bool = False,
    with_filter: bool = False,
    with_tags: bool = False,
):
    """[N, Q] scores for Q MIXED static+contextual modifier-tree queries
    in one corpus pass: each leaf evaluates against the stacked query axis
    (static gather of the [V, T*Q] table / one GEMM against the [T*Q, d]
    contextual matrix), the modifier tree combines elementwise, and the
    [c, L, T, Q] similarity feeds the same multi DP tail as the contextual
    batch (reference modifier factory, metric/modifier.cpp:18-74, served
    per document there).  Per-query tag weighting applies to the combined
    tree similarity exactly like the static batch kernel
    (TagWeightedSlice semantics, slice/static.h:186-288)."""
    from vectorian_tpu.ops.simmatrix import eval_plan_chunk

    N, L = token_ids.shape
    Q = n_queries
    n_chunks = N // chunk

    def one_chunk(args):
        if with_filter or with_tags:
            tok, ts, inv, ln, pos, tag, ctx = args
        else:
            tok, ts, inv, ln, ctx = args
        c = tok.shape[0]
        S = eval_plan_chunk(
            plan, tok, static_sims, static_mags, ctx, ctx_queries,
            mixed_weights, sorted_gather=(ts, inv),
        )["similarity"]  # [c, L, T*Q]
        T = S.shape[-1] // Q
        S = S.reshape(c, L, T, Q)
        if with_filter:
            # compact AFTER the leaf gathers/GEMMs (a row permutation of
            # S) so the static gather keeps its pack-time sorted stream
            perm, ln, _ = _compact_slices(
                tok, pos, tag, ln, flt_pos, flt_tag, flt_tok
            )
            S = jnp.take_along_axis(S, perm[:, :, None, None], axis=1)
            pos = jnp.take_along_axis(pos, perm, axis=1)
        if with_tags:
            # per-query tag weighting on the combined similarity (same
            # arithmetic as _bucket_scores_multiquery; untagged queries in
            # a mixed batch stay identity: w=1, penalty 0, threshold -1)
            w = tw_weights[None, None, :, :] * jnp.where(
                pos[:, :, None, None] == tw_pos_t[None, None, :, :],
                1.0,
                1.0 - tw_penalty[None, None, None, :],
            )
            Sw = S * w
            S = jnp.where(Sw > tw_threshold[None, None, None, :], Sw, 0.0)
        S = jnp.transpose(S, (1, 0, 2, 3))  # [L,c,T,Q]
        if use_pallas and Q >= PALLAS_MIN_BATCH and not general_gaps:
            from vectorian_tpu.ops.pallas_dp import (
                pallas_align_scores_multi_nt,
            )

            raw = pallas_align_scores_multi_nt(
                S, jnp.maximum(ln, 1), len_t, gaps, locality
            )
        else:
            S2 = jnp.transpose(S, (1, 3, 0, 2)).reshape(c * Q, L, T)
            ln_rep = jnp.repeat(jnp.maximum(ln, 1), Q)
            lt_rep = jnp.tile(len_t, c)
            if general_gaps:
                raw = align_scores_general(
                    S2, ln_rep, lt_rep, gap_vec_s, gap_vec_t, locality
                ).reshape(c, Q)
            else:
                raw = align_scores(S2, ln_rep, lt_rep, gaps, locality).reshape(
                    c, Q
                )
        scores = raw / jnp.maximum(norm_total[None, :], 1e-9)
        return jnp.where(ln[:, None] > 0, scores, NEG_SCORE)

    xs = (
        token_ids.reshape(n_chunks, chunk, L),
        tok_sorted,
        sort_inv,
        lengths.reshape(n_chunks, chunk),
    )
    if with_filter or with_tags:
        xs = xs + (
            pos_ids.reshape(n_chunks, chunk, L),
            tag_ids.reshape(n_chunks, chunk, L),
        )
    xs = xs + (
        tuple(c.reshape(n_chunks, chunk, L, c.shape[-1]) for c in ctx_chunks),
    )
    return jax.lax.map(one_chunk, xs).reshape(N, Q)


@functools.partial(
    jax.jit,
    static_argnames=(
        "metric", "locality", "chunk", "n_queries", "use_pallas",
        "general_gaps", "with_filter",
    ),
)
def _bucket_scores_multiquery_ctx(
    ctx_store: jnp.ndarray,  # [N, L, d] per-token contextual vectors
    lengths: jnp.ndarray,  # [N] i32
    q_norm: jnp.ndarray,  # [T*Q, d] stacked normalized query vectors (q-minor)
    q_unmod: jnp.ndarray,  # [T*Q, d] unmodified
    q_mags: jnp.ndarray,  # [T*Q]
    len_t: jnp.ndarray,  # [Q] i32
    gaps: AffineGapParams,
    norm_total: jnp.ndarray,  # [Q] f32
    gap_vec_s: jnp.ndarray,  # [L+1] (general-gap path only)
    gap_vec_t: jnp.ndarray,  # [T+1]
    token_ids: jnp.ndarray,  # [N, L] i32 (doc filters only; [1, 1] unused)
    pos_ids: jnp.ndarray,  # [N, L] i8
    tag_ids: jnp.ndarray,  # [N, L] i16
    flt_pos: jnp.ndarray,  # [n_pos] bool exclusion masks (filters only)
    flt_tag: jnp.ndarray,
    flt_tok: jnp.ndarray,
    metric,
    locality: str,
    chunk: int,
    n_queries: int,
    use_pallas: bool = False,
    general_gaps: bool = False,
    with_filter: bool = False,
):
    """[N, Q] scores for Q contextual queries in one corpus pass: the
    per-chunk metric evaluation is ONE GEMM against the [T*Q, d] stacked
    query matrix, and its [c, L, T, Q] output is already the DP kernel's
    native tiling.  Doc-side filters compact the similarity rows
    post-GEMM (the same permutation trick as _bucket_scores — reference
    Slices filtering, query.cpp:180-214)."""
    from vectorian_tpu.ops.simmatrix import _ChunkVectors

    N, L, d = ctx_store.shape
    Q = n_queries
    T = q_norm.shape[0] // Q
    n_chunks = N // chunk

    def one_chunk(args):
        if with_filter:
            ctx, ln, tok, pos, tag = args
        else:
            ctx, ln = args  # [c, L, d], [c]
        c = ctx.shape[0]
        flat = ctx.astype(jnp.float32).reshape(c * L, d)
        mags = jnp.linalg.norm(flat, axis=-1)
        normed = flat / jnp.maximum(mags, 1e-9)[:, None]
        a = _ChunkVectors(flat, normed, mags)
        b = _ChunkVectors(q_unmod, q_norm, q_mags)
        S = metric.compute(a, b)  # [c*L, T*Q]
        S = jnp.clip(S, 0.0, 1.0)
        S = S.reshape(c, L, T, Q)
        if with_filter:
            perm, ln, _ = _compact_slices(
                tok, pos, tag, ln, flt_pos, flt_tag, flt_tok
            )
            S = jnp.take_along_axis(S, perm[:, :, None, None], axis=1)
        S = jnp.transpose(S, (1, 0, 2, 3))  # [L, c, T, Q]
        if use_pallas and Q >= PALLAS_MIN_BATCH and not general_gaps:
            from vectorian_tpu.ops.pallas_dp import pallas_align_scores_multi_nt

            raw = pallas_align_scores_multi_nt(
                S, jnp.maximum(ln, 1), len_t, gaps, locality
            )
        else:
            S2 = jnp.transpose(S, (1, 3, 0, 2)).reshape(c * Q, L, T)
            ln_rep = jnp.repeat(jnp.maximum(ln, 1), Q)
            lt_rep = jnp.tile(len_t, c)
            if general_gaps:
                raw = align_scores_general(
                    S2, ln_rep, lt_rep, gap_vec_s, gap_vec_t, locality
                ).reshape(c, Q)
            else:
                raw = align_scores(S2, ln_rep, lt_rep, gaps, locality).reshape(
                    c, Q
                )
        scores = raw / jnp.maximum(norm_total[None, :], 1e-9)
        return jnp.where(ln[:, None] > 0, scores, NEG_SCORE)

    xs = (
        ctx_store.reshape(n_chunks, chunk, L, d),
        lengths.reshape(n_chunks, chunk),
    )
    if with_filter:
        xs = xs + (
            token_ids.reshape(n_chunks, chunk, L),
            pos_ids.reshape(n_chunks, chunk, L),
            tag_ids.reshape(n_chunks, chunk, L),
        )
    return jax.lax.map(one_chunk, xs).reshape(N, Q)


@functools.partial(jax.jit, static_argnames=("plan", "with_tags"))
def _slice_similarity(
    plan: tuple,
    tok: jnp.ndarray,  # [1, L]
    static_sims: tuple,
    static_mags: tuple,
    ctx_chunk: tuple,  # k -> [1, L, d]
    ctx_queries: tuple,
    mixed_weights: tuple,
    pos: jnp.ndarray,  # [1, L]
    tw_weights: jnp.ndarray,
    tw_pos_t: jnp.ndarray,
    tw_penalty: jnp.ndarray,
    tw_threshold: jnp.ndarray,
    with_tags: bool,
):
    """(S_weighted, S_unmodified) for one slice (rescore/finalizer path)."""
    out = eval_plan_chunk(
        plan, tok, static_sims, static_mags, ctx_chunk, ctx_queries, mixed_weights
    )
    S = out["similarity"]
    S_un = S
    if with_tags:
        S = _apply_tag_weights(S, pos, tw_weights, tw_pos_t, tw_penalty, tw_threshold)
    return S[0], S_un[0]


@functools.partial(jax.jit, static_argnames=("plan", "with_tags", "with_sel"))
def _slices_similarity_batch(
    plan: tuple,
    tokens: jnp.ndarray,  # [N, L] whole bucket (device-resident)
    pos_all: jnp.ndarray,  # [N, L] i8
    rows: jnp.ndarray,  # [g] i32 bucket rows to rescore
    sel_pad: jnp.ndarray,  # [g, L] i32 kept in-slice offsets (with_sel only)
    static_sims: tuple,
    static_mags: tuple,
    ctx_stores: tuple,  # k -> [N, L, d] whole bucket stores
    ctx_queries: tuple,
    mixed_weights: tuple,
    tw_weights: jnp.ndarray,
    tw_pos_t: jnp.ndarray,
    tw_penalty: jnp.ndarray,
    tw_threshold: jnp.ndarray,
    with_tags: bool,
    with_sel: bool,
):
    """(S_weighted [g, L, T], S_unmodified) for a batch of slices of ONE
    bucket — a single device dispatch.  The per-slice variant costs a
    tunnel round trip each; the top-k finalizer rescored ~2s of pure
    latency before this batch path."""
    tok = tokens[rows]
    pos = pos_all[rows]
    ctx = tuple(c[rows] for c in ctx_stores)
    if with_sel:
        tok = jnp.take_along_axis(tok, sel_pad, axis=1)
        pos = jnp.take_along_axis(pos, sel_pad, axis=1)
        ctx = tuple(
            jnp.take_along_axis(c, sel_pad[:, :, None], axis=1) for c in ctx
        )
    out = eval_plan_chunk(
        plan, tok, static_sims, static_mags, ctx, ctx_queries, mixed_weights
    )
    S = out["similarity"]
    S_un = S
    if with_tags:
        S = _apply_tag_weights(S, pos, tw_weights, tw_pos_t, tw_penalty, tw_threshold)
    return S, S_un


def batch_tracebacks(H, Sw, lens, lts, gaps, locality, w_s=None, w_t=None):
    """Native batched DP traceback with the per-row python fallback — the
    ONE home for flow extraction (payload, stacked and per-query rescore
    paths must share it bit-for-bit).  Returns a [B] list of mappings,
    each [lts[i]] int32 in filtered space."""
    if w_s is not None:
        nat = native.traceback_general_batch(
            H, Sw, lens, lts, w_s, w_t, locality
        )
    else:
        nat = native.traceback_affine_batch(H, Sw, lens, lts, gaps, locality)
    out = []
    for i in range(len(lens)):
        if nat is not None:
            out.append(nat[i, : int(lts[i])])
        elif w_s is not None:
            out.append(
                traceback_general(
                    H[i], Sw[i], int(lens[i]), int(lts[i]), w_s, w_t,
                    locality,
                )
            )
        else:
            out.append(
                traceback(
                    H[i], Sw[i], int(lens[i]), int(lts[i]), gaps, locality
                )
            )
    return out


def edge_sims_of(mapping, Su, len_t: int) -> np.ndarray:
    """Per-edge unmodified similarity for an injective mapping
    (ScoreComputer, metric/alignment.h:307-352), filtered-space rows."""
    return np.where(
        mapping >= 0,
        Su[np.maximum(mapping, 0), np.arange(len_t)],
        np.float32(0.0),
    ).astype(np.float32)


def _stack_tw(tag_weights, Qp: int, Tmax: int):
    """Per-request tag-weighting arrays stacked to [Qp, Tmax] (+[Qp]
    scalars + tagged mask) for the multi-query rescore kernels; untagged
    slots stay inert (selected away by the tagged mask in-kernel)."""
    tw_w = np.zeros((Qp, Tmax), np.float32)
    tw_pos = np.full((Qp, Tmax), -1, np.int8)
    tw_pen = np.zeros((Qp,), np.float32)
    tw_thr = np.zeros((Qp,), np.float32)
    tagged = np.zeros((Qp,), bool)
    for si, tg in enumerate(tag_weights or ()):
        if tg is None:
            continue
        T = len(tg.t_pos_weights)
        tw_w[si, :T] = tg.t_pos_weights
        tw_pos[si, :T] = tg.pos_t
        tw_pen[si] = tg.pos_mismatch_penalty
        tw_thr[si] = tg.similarity_threshold
        tagged[si] = True
    return (
        jnp.asarray(tw_w),
        jnp.asarray(tw_pos),
        jnp.asarray(tw_pen),
        jnp.asarray(tw_thr),
        jnp.asarray(tagged),
    )


def _mq_compact(tok, pos, tag, ln, flt):
    """In-kernel doc-filter compaction for fused rescore rows: kept tokens
    move to the front in original order (the device replica of
    filtered_positions — the gathered prefix must equal the host sel
    gather for byte-equal rescores)."""
    perm, new_ln, _ = _compact_slices(tok, pos, tag, ln, *flt)
    return (
        jnp.take_along_axis(tok, perm, axis=1),
        jnp.take_along_axis(pos, perm, axis=1),
        new_ln,
    )


def _mq_similarity(
    tok, pos, qidx, table, tw_w, tw_pos, tw_pen, tw_thr, tagged, V, any_tags
):
    """Gather + per-row tag weighting for multi-query rescore rows (shared
    by the stacked finalizer and the fused top-k rescore — the arithmetic
    must be identical between them for byte-equal scores)."""
    S = table[qidx[:, None] * V + tok]  # [g, L, Tmax]
    Su = S
    if any_tags:
        w = tw_w[qidx][:, None, :] * jnp.where(
            pos[:, :, None] == tw_pos[qidx][:, None, :],
            1.0,
            1.0 - tw_pen[qidx][:, None, None],
        )
        Swt = S * w
        Swt = jnp.where(Swt > tw_thr[qidx][:, None, None], Swt, 0.0)
        S = jnp.where(tagged[qidx][:, None, None], Swt, S)
    return S, Su


def _mq_matrices_scores(S, ln, lt, gaps, gv_s, gv_t, locality, general):
    """H + raw for multi-query rescore rows, affine or general-gap (the
    general DP takes the index-level shared cost vectors; their values and
    min-plus closures are prefix-stable under needle padding, so the
    per-row len_t masks keep results bit-equal to per-query widths).

    Zero-length rows (empty or fully-filtered slices) report NEG_SCORE —
    the per-query rescore skips them entirely, and a local-DP 0.0 would
    otherwise surface as a fake match at negative min_score."""
    if general:
        H, raw = align_matrices_scores_general.__wrapped__(
            S, ln, lt, gv_s, gv_t, locality
        )
    else:
        H, _, _, raw = align_matrices_scores.__wrapped__(
            S, ln, lt, gaps, locality
        )
    return H, jnp.where(ln > 0, raw, NEG_SCORE)


def _mq_scores(S, ln, lt, gaps, gv_s, gv_t, locality, general):
    """Score-only variant of _mq_matrices_scores (same NEG_SCORE mask)."""
    if general:
        raw = align_scores_general.__wrapped__(S, ln, lt, gv_s, gv_t, locality)
    else:
        raw = align_scores.__wrapped__(S, ln, lt, gaps, locality)
    return jnp.where(ln > 0, raw, NEG_SCORE)


@functools.partial(
    jax.jit,
    static_argnames=(
        "n", "kk", "kd", "V", "locality", "any_tags", "general",
        "with_filter",
    ),
)
def _topk_exact_rescore(
    scores: jnp.ndarray,  # [n_pad, Q] normalized device ranking scores
    tokens: jnp.ndarray,  # [n_pad, L]
    pos_all: jnp.ndarray,  # [n_pad, L] i8
    tag_all: jnp.ndarray,  # [n_pad, L] i16 (filter path only)
    ln_all: jnp.ndarray,  # [n_pad] i32 slice lengths
    table: jnp.ndarray,  # [Qp * V, Tmax] f32 stacked plan matrices
    tw_w, tw_pos, tw_pen, tw_thr, tagged,  # [Qp, ...] tag-weight stacks
    flt_pos, flt_tag, flt_tok,  # doc-filter masks (with_filter only)
    lt_q: jnp.ndarray,  # [Q] i32 needle lengths
    gaps: AffineGapParams,
    gv_s: jnp.ndarray,  # [L+1] general-gap cost vector (general only)
    gv_t: jnp.ndarray,  # [Tmax+1]
    n: int,
    kk: int,
    V: int,
    locality: str,
    any_tags: bool,
    general: bool,
    with_filter: bool,
    kd: Optional[int] = None,
):
    """Per-bucket device top-k FUSED with the exact f32 rescore AND the
    traceback DP matrices of the selected rows: the finalizer's rescore
    round trips disappear — candidates arrive on the host already
    carrying their exact raw scores and flow payloads (H/Sw/Su, a few
    hundred KB at serving shapes), so a tie-safe query completes in ONE
    device fetch.  Bit-exact vs the stacked rescore: same table gather,
    same tag arithmetic, same DP recurrence (per-lane bits are
    independent of the batch shape).

    ``kd`` >= kk deepens the (vals, ids, exact-raw) fetch past the
    payload depth: Zipf corpora tie dozens of slices at the n-th score,
    which makes the kk-deep cut unsafe and costs a second blocking
    select round (measured ~100 ms of a 208 ms warm 1M-slice find(),
    LATENCY_r04.json) — a few hundred extra (score, id, raw) triples are
    ~KBs on the same transfer and resolve the tie group host-side."""
    if kd is None:
        kd = kk
    vals, idx = jax.lax.top_k(scores[:n].T, kd + 1)  # [Q, kd+1]
    rows = idx[:, :kd].reshape(-1)
    Q = idx.shape[0]
    qidx = jnp.repeat(jnp.arange(Q, dtype=jnp.int32), kd)
    tok, pos, ln = tokens[rows], pos_all[rows], ln_all[rows]
    if with_filter:
        tok, pos, ln = _mq_compact(
            tok, pos, tag_all[rows], ln, (flt_pos, flt_tag, flt_tok)
        )
    S, Su = _mq_similarity(
        tok, pos, qidx, table,
        tw_w, tw_pos, tw_pen, tw_thr, tagged, V, any_tags,
    )
    H, raw = _mq_matrices_scores(
        S, ln, lt_q[qidx], gaps, gv_s, gv_t, locality, general
    )
    if kd > kk:
        # flow payloads ship only to the kk payload depth; the deep tail
        # carries (score, id, raw) triples only
        H = H.reshape(Q, kd, *H.shape[1:])[:, :kk].reshape(
            Q * kk, *H.shape[1:]
        )
        S = S.reshape(Q, kd, *S.shape[1:])[:, :kk].reshape(
            Q * kk, *S.shape[1:]
        )
        Su = Su.reshape(Q, kd, *Su.shape[1:])[:, :kk].reshape(
            Q * kk, *Su.shape[1:]
        )
    return vals, idx, raw.reshape(Q, kd), H, S, Su


@functools.partial(
    jax.jit,
    static_argnames=(
        "n", "V", "locality", "any_tags", "general", "with_filter",
    ),
)
def _full_exact_rescore(
    scores, tokens, pos_all, tag_all, ln_all, table,
    tw_w, tw_pos, tw_pen, tw_thr, tagged,
    flt_pos, flt_tag, flt_tok,
    lt_q, gaps, gv_s, gv_t,
    n: int, V: int, locality: str, any_tags: bool, general: bool,
    with_filter: bool,
):
    """Fused exact rescore + flow payloads for EVERY row of a small
    (fully-fetched) bucket for all Q queries."""
    Q = lt_q.shape[0]
    rows = jnp.tile(jnp.arange(n, dtype=jnp.int32), Q)
    qidx = jnp.repeat(jnp.arange(Q, dtype=jnp.int32), n)
    tok, pos, ln = tokens[rows], pos_all[rows], ln_all[rows]
    if with_filter:
        tok, pos, ln = _mq_compact(
            tok, pos, tag_all[rows], ln, (flt_pos, flt_tag, flt_tok)
        )
    S, Su = _mq_similarity(
        tok, pos, qidx, table,
        tw_w, tw_pos, tw_pen, tw_thr, tagged, V, any_tags,
    )
    H, raw = _mq_matrices_scores(
        S, ln, lt_q[qidx], gaps, gv_s, gv_t, locality, general
    )
    return scores[:n].T, raw.reshape(Q, n), H, S, Su


@functools.partial(
    jax.jit,
    static_argnames=(
        "V", "locality", "with_sel", "want_flows", "any_tags", "general",
    ),
)
def _stacked_rescore(
    tokens: jnp.ndarray,  # [N, L] i32 whole bucket
    pos_all: jnp.ndarray,  # [N, L] i8
    rows: jnp.ndarray,  # [gp] i32 bucket rows
    qidx: jnp.ndarray,  # [gp] i32 request index per row
    sel_pad: jnp.ndarray,  # [gp, L] i32 (with_sel) else [1, L] placeholder
    table: jnp.ndarray,  # [Qp * V, Tmax] f32 stacked combined plan matrices
    tw_w: jnp.ndarray,  # [Qp, Tmax] f32 per-request tag weights
    tw_pos: jnp.ndarray,  # [Qp, Tmax] i8
    tw_pen: jnp.ndarray,  # [Qp] f32
    tw_thr: jnp.ndarray,  # [Qp] f32
    tagged: jnp.ndarray,  # [Qp] bool
    ln: jnp.ndarray,  # [gp] i32
    lt: jnp.ndarray,  # [gp] i32 per-row needle length
    gaps: AffineGapParams,
    gv_s: jnp.ndarray,  # [L+1] shared general-gap cost vectors
    gv_t: jnp.ndarray,  # [Tmax+1]
    V: int,
    locality: str,
    with_sel: bool,
    want_flows: bool,
    any_tags: bool,
    general: bool,
):
    """Similarity gather + tag weighting + affine DP for the rescore rows of
    MANY queries in ONE dispatch (the per-query finalizer paid Q x buckets
    dispatches; on the tunneled TPU dispatch count, not compute, dominates).

    Bit-exact vs the per-query path: the table rows are copies of each
    query's already-compiled plan matrices (the leaf GEMM bits are fixed at
    plan compile), tag weighting is the same elementwise arithmetic with
    per-row arguments, and the DP recurrence is column-prefix-causal with
    (len_s, len_t)-masked reductions, so the extra pad columns of narrower
    queries never perturb a real cell's bits (tests/test_stacked_rescore.py
    asserts byte-equality)."""
    tok = tokens[rows]
    pos = pos_all[rows]
    if with_sel:
        tok = jnp.take_along_axis(tok, sel_pad, axis=1)
        pos = jnp.take_along_axis(pos, sel_pad, axis=1)
    S, Su = _mq_similarity(
        tok, pos, qidx, table, tw_w, tw_pos, tw_pen, tw_thr, tagged,
        V, any_tags,
    )
    if want_flows:
        H, raw = _mq_matrices_scores(
            S, ln, lt, gaps, gv_s, gv_t, locality, general
        )
        return raw, H, S, Su
    return _mq_scores(S, ln, lt, gaps, gv_s, gv_t, locality, general)


class BruteForceEngine:
    """Scores a PackedCorpus against a compiled query plan.

    ``paged=True`` (or ``VECTORIAN_PAGE_BUCKETS=1``) keeps the bucket
    arrays host-side and streams them through HBM one bucket at a time
    during corpus passes (upload -> dispatch -> consume with a host read ->
    evict), extending the one-chip corpus size past the resident
    [n_slices, Q] envelope (docs/performance.md).  Results are
    byte-identical to resident mode — the arrays and kernels are the same;
    only residency and the per-bucket completion barrier differ."""

    def __init__(self, packed, paged: Optional[bool] = None):
        self._packed = packed
        self._paged = _paged_default() if paged is None else bool(paged)
        self._device_buckets = []
        self._ctx_stores: Dict[str, list] = {}  # name -> per-bucket [Npad, L, d]
        # slice id -> (bucket index, row) for O(1) rescore lookups
        self._slice_loc = np.full((packed.n_slices, 2), -1, np.int32)
        for bi, b in enumerate(packed.buckets):
            n = b.n
            chunk = min(_default_chunk(), _next_pow2(n))
            pad = (-n) % chunk
            tok = np.pad(b.token_ids, ((0, pad), (0, 0)))
            pos = np.pad(b.pos_ids, ((0, pad), (0, 0)))
            tag = np.pad(b.tag_ids, ((0, pad), (0, 0)))
            ln = np.pad(b.lengths, (0, pad))
            self._slice_loc[b.slice_index, 0] = bi
            self._slice_loc[b.slice_index, 1] = np.arange(n, dtype=np.int32)
            # pack-time sorted gather streams: vocab-row gathers are
            # memory-locality bound on TPU, and the corpus is static — sort
            # each chunk's token stream once, undo with the inverse
            # permutation after the (now coherent) gather
            L = tok.shape[1]
            flat = tok.reshape(-1, chunk * L)  # [n_chunks, chunk*L]
            order = np.argsort(flat, axis=1, kind="stable").astype(np.int32)
            tok_sorted = np.take_along_axis(flat, order, axis=1)
            inv = np.empty_like(order)
            np.put_along_axis(
                inv, order,
                np.broadcast_to(
                    np.arange(chunk * L, dtype=np.int32), order.shape
                ),
                axis=1,
            )
            # per-chunk unique-token tables for the two-stage serving
            # gather (VECTORIAN_UNIQ_GATHER): the corpus gather is
            # per-index bound and Zipf chunks repeat few distinct ids —
            # stage 1 gathers each chunk's sorted, deduped unique rows
            # from the big [V, T, Q] table, stage 2 re-expands from that
            # small hot block.  Derived from the sorted stream: run starts
            # mark uniques, the run id at each sorted position is its
            # unique index, composed with the inverse permutation to get
            # original order.
            run_new = np.ones_like(tok_sorted, dtype=bool)
            run_new[:, 1:] = tok_sorted[:, 1:] != tok_sorted[:, :-1]
            run_id = np.cumsum(run_new, axis=1).astype(np.int32) - 1
            u_counts = run_id[:, -1] + 1
            U_max = max(int(u_counts.max()), 1)
            uniq = np.zeros((tok_sorted.shape[0], U_max), np.int32)
            for ci in range(tok_sorted.shape[0]):
                vals = tok_sorted[ci][run_new[ci]]
                uniq[ci, : len(vals)] = vals
                if len(vals):
                    uniq[ci, len(vals):] = vals[-1]
            uniq_inv = np.take_along_axis(run_id, inv, axis=1)
            entry = {
                "capacity": b.capacity,
                "chunk": chunk,
                "slice_index": b.slice_index,
                "n": n,
                "n_pad": tok.shape[0],
                # host copies: rescore/finalizer paths read per-slice
                # rows — a device pull per slice costs a tunnel RTT
                "tokens_np": tok,
                "pos_np": pos.astype(np.int8),
                "tag_np": tag.astype(np.int16),
                # host copies of the unique tables; device uploads are
                # lazy (engine._uniq_args) so the default path pays no HBM
                "uniq_np": uniq,
                "uniq_inv_np": uniq_inv,
            }
            entry["lengths_np"] = ln
            if self._paged:
                # host-only: device keys page in on first touch and evict
                # after each pass (the sorted streams need host copies too)
                entry["tok_sorted_np"] = tok_sorted
                entry["sort_inv_np"] = inv
                # narrow upload copies (uint16 ids/indices, uint8 tags)
                # where values fit: paged serving is transfer-bound on
                # the tunnel, so plane width is throughput (VERDICT r4
                # item 5; reference analogue: the 2-thread streaming
                # corpus pipeline, corpus/corpus.py:308)
                narrow = {}
                for k, arr in (
                    ("tokens", tok),
                    ("tok_sorted", tok_sorted),
                    ("sort_inv", inv),
                    ("uniq", uniq),
                    ("uniq_inv", uniq_inv),
                ):
                    if arr.size and arr.max() < 65536 and arr.min() >= 0:
                        narrow[k] = arr.astype(np.uint16)
                tag16 = entry["tag_np"]
                if tag16.size == 0 or (
                    tag16.max() < 256 and tag16.min() >= 0
                ):
                    narrow["tag"] = tag16.astype(np.uint8)
                entry["_narrow_np"] = narrow
                self._device_buckets.append(_PagedBucket(entry))
            else:
                entry.update(
                    tokens=jnp.asarray(tok),
                    tok_sorted=jnp.asarray(tok_sorted),
                    sort_inv=jnp.asarray(inv),
                    pos=jnp.asarray(entry["pos_np"]),
                    tag=jnp.asarray(entry["tag_np"]),
                    lengths=jnp.asarray(ln),
                )
                self._device_buckets.append(entry)

    @staticmethod
    def _uniq_args(db):
        """Lazy device upload of a bucket's unique-gather tables (plain
        buckets cache them on first use so the default path pays no HBM;
        paged buckets page them like any other device key)."""
        if isinstance(db, _PagedBucket):
            return db["uniq"], db["uniq_inv"]
        if "uniq" not in db:
            db["uniq"] = jnp.asarray(db["uniq_np"])
            db["uniq_inv"] = jnp.asarray(db["uniq_inv_np"])
        return db["uniq"], db["uniq_inv"]

    @property
    def packed(self):
        return self._packed

    @property
    def n_slices(self):
        return self._packed.n_slices

    def ensure_contextual(self, name: str, documents, dim: int):
        """Pack per-token contextual vectors [Npad, L, d] per bucket (the
        TPU analogue of the reference's per-doc h5 vector open,
        metric/contextual.cpp:26-75) — built once, cached.

        Vectorized like pack_corpus: per-doc vectors concatenate into one
        flat [total_tokens, d] matrix (materializing lazy h5 refs here, on
        first contextual query), then each bucket fills with one masked
        fancy-index gather instead of a per-slice python loop."""
        if name in self._ctx_stores:
            return
        packed = self._packed
        flat_parts, off_by_doc, off = [], {}, 0
        for d_i, pd in enumerate(documents):
            vecs = pd.contextual.get(name)
            off_by_doc[d_i] = off
            if vecs is not None and len(vecs):
                flat_parts.append(np.asarray(vecs, np.float32))
                off += len(vecs)
        if flat_parts:
            flat = np.concatenate(flat_parts, axis=0)
        else:
            flat = np.zeros((1, dim), np.float32)
        offs = np.zeros((max(len(documents), 1),), np.int64)
        for d_i, o in off_by_doc.items():
            offs[d_i] = o
        # a document's vector table must cover its token span — clamped
        # gathers would silently read a neighbor's vectors
        n_vecs = np.zeros((max(len(documents), 1),), np.int64)
        for d_i, pd in enumerate(documents):
            v = pd.contextual.get(name)
            n_vecs[d_i] = len(v) if v is not None else 0
        has_vecs = n_vecs > 0
        ends = packed.slice_start + packed.slice_len
        bad = np.flatnonzero(
            (n_vecs[packed.slice_doc] > 0) & (ends > n_vecs[packed.slice_doc])
        )
        if bad.size:
            sid = int(bad[0])
            raise ValueError(
                f"contextual embedding {name!r}: document "
                f"{int(packed.slice_doc[sid])} has "
                f"{int(n_vecs[packed.slice_doc[sid]])} vectors but slice "
                f"{sid} needs tokens up to {int(ends[sid])}"
            )

        store = []
        for db in self._device_buckets:
            npad = int(db["n_pad"])
            L = db["capacity"]
            n = db["n"]
            sids = db["slice_index"]
            docs_b = packed.slice_doc[sids]
            starts = offs[docs_b] + packed.slice_start[sids]
            lens_b = packed.slice_len[sids] * has_vecs[docs_b]
            idx = starts[:, None] + np.arange(L, dtype=np.int64)[None, :]
            mask = np.arange(L)[None, :] < lens_b[:, None]
            idx = np.minimum(np.where(mask, idx, 0), len(flat) - 1)
            arr = np.zeros((npad, L, dim), np.float32)
            arr[:n] = np.where(mask[:, :, None], flat[idx], 0.0)
            # bf16 in HBM halves the bandwidth of the einsum-dominated
            # contextual path; eval_plan_chunk upcasts to f32 per chunk
            if self._paged:
                # host-side bf16 (ml_dtypes rounds to-nearest-even exactly
                # like XLA's convert, so paged == resident bit-for-bit);
                # _ctx_dev uploads per pass
                import ml_dtypes

                store.append(arr.astype(ml_dtypes.bfloat16))
            else:
                store.append(jnp.asarray(arr, dtype=jnp.bfloat16))
        self._ctx_stores[name] = store

    def _ctx_dev(self, name: str, bucket_index: int):
        """Device view of one bucket's contextual store ([Npad, L, d]
        bf16).  Resident mode returns the cached device array; paged mode
        uploads fresh — the caller's pass consumes and drops it."""
        store = self._ctx_stores[name][bucket_index]
        return jnp.asarray(store) if self._paged else store

    @staticmethod
    def _plan_width(qp: QueryPlan) -> int:
        return (
            int(qp.static_sims[0].shape[1])
            if qp.static_sims
            else int(qp.ctx_queries[0]["unmodified"].shape[0])
        )

    def _plan_args(self, qp: QueryPlan, bucket_index: int):
        ctx = tuple(self._ctx_dev(nm, bucket_index) for nm in qp.ctx_names)
        return (
            tuple(qp.static_sims),
            tuple(qp.static_mags),
            ctx,
            tuple(qp.ctx_queries),
            tuple(qp.mixed_weights),
        )

    @staticmethod
    def _filter_args(doc_filter):
        if doc_filter is not None:
            return (
                jnp.asarray(doc_filter.pos_exclude),
                jnp.asarray(doc_filter.tag_exclude),
                jnp.asarray(doc_filter.token_exclude),
            )
        return (jnp.zeros((1,), bool),) * 3

    def _bucket_dispatch_args(self, db, T, boost, tag_weights, gap_costs):
        """Per-bucket boost / tag-weight / gap-cost-vector arguments shared
        by score_all and score_topk (the single home — the two scoring
        paths must not drift)."""
        if boost is not None:
            bvec = np.ones((db["n_pad"],), np.float32)
            bvec[: db["n"]] = boost[db["slice_index"]]
            bvec = jnp.asarray(bvec)
        else:
            bvec = jnp.ones((db["n_pad"],), jnp.float32)
        if tag_weights is not None:
            tw = tag_weights.device_args()
        else:
            tw = TagWeightingSpec.identity_args(T)
        gv_s = jnp.asarray(
            gap_vec(gap_costs[0] if gap_costs is not None else None,
                    db["capacity"] + 1)
        )
        gv_t = jnp.asarray(
            gap_vec(gap_costs[1] if gap_costs is not None else None, T + 1)
        )
        return bvec, tw, gv_s, gv_t

    def score_all(
        self,
        qp: QueryPlan,
        len_t: int,
        gaps: AffineGapParams,
        locality: str,
        norm_total: float,
        boost: Optional[np.ndarray] = None,  # [n_slices] f32
        tag_weights: Optional[TagWeightingSpec] = None,
        doc_filter: Optional[DocFilterSpec] = None,
        gap_costs=None,  # (GapCost_s, GapCost_t) -> general-gap DP path
    ) -> np.ndarray:
        """Normalized score for every slice in the corpus ([n_slices] f32)."""
        T = self._plan_width(qp)  # padded needle width (>= len_t)
        out = np.full((self._packed.n_slices,), NEG_SCORE, np.float32)
        pending = []
        flt = self._filter_args(doc_filter)
        for bi, db in enumerate(self._device_buckets):
            if db["n"] == 0:
                continue

            def dispatch(db=db, bi=bi):
                bvec, (tw_w, tw_p, tw_pen, tw_thr), gv_s, gv_t = (
                    self._bucket_dispatch_args(
                        db, T, boost, tag_weights, gap_costs
                    )
                )
                static_sims, static_mags, ctx, ctx_q, weights = (
                    self._plan_args(qp, bi)
                )
                return _bucket_scores(
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
                    jnp.asarray(len_t, jnp.int32),
                    gaps,
                    bvec,
                    jnp.asarray(norm_total, jnp.float32),
                    tw_w,
                    tw_p,
                    tw_pen,
                    tw_thr,
                    *flt,
                    gv_s,
                    gv_t,
                    locality=locality,
                    chunk=db["chunk"],
                    with_tags=tag_weights is not None,
                    with_filter=doc_filter is not None,
                    general_gaps=gap_costs is not None,
                    use_pallas=use_pallas_default(),
                )

            pending.append(
                (db, _LazyScores(db, dispatch) if self._paged else dispatch())
            )
        # collect after all buckets are dispatched: device work and host
        # transfers overlap instead of paying a tunnel RTT per bucket
        # (paged mode instead consumes bucket-by-bucket to bound HBM)
        self._collect_pending(pending, out)
        return out

    def _collect_pending(self, pending, out: np.ndarray):
        """Drain a corpus pass's per-bucket scores into ``out`` (indexed by
        slice id).  Lazy (paged) entries dispatch here one bucket at a
        time, DOUBLE-BUFFERED: bucket i+1's upload + kernel dispatch is
        issued (async) before bucket i's blocking host read, so the next
        transfer rides under the current compute (the reference's
        2-thread corpus pipeline, corpus/corpus.py:308, as a device
        upload/compute overlap).  Peak HBM = two buckets; the host read
        remains the completion barrier that lets bucket i's HBM free."""
        for i, (db, s) in enumerate(pending):
            if isinstance(s, _LazyScores):
                cur = s.get()[: db["n"]]
                if (
                    _page_prefetch_default()
                    and i + 1 < len(pending)
                    and isinstance(pending[i + 1][1], _LazyScores)
                ):
                    pending[i + 1][1].get()  # prefetch next bucket
                out[db["slice_index"]] = np.asarray(cur)
                s.release()
            else:
                out[db["slice_index"]] = np.asarray(s[: db["n"]])

    def score_all_multi(
        self,
        plans: List[QueryPlan],
        len_ts: List[int],
        gaps: AffineGapParams,
        locality: str,
        norm_totals: List[float],
        tag_weights: Optional[List[Optional[TagWeightingSpec]]] = None,
        sim_dtype=None,
        with_err: bool = False,
        gap_costs=None,  # (GapCost_s, GapCost_t) -> general-gap WSB DP
        doc_filter: Optional[DocFilterSpec] = None,
    ):
        """[n_slices, Q] scores for a batch of static-only query plans with
        one corpus pass (the gather amortizes across queries).

        ``sim_dtype`` quantizes the stacked [V, T, Q] table to cut the
        gather's HBM traffic (the pass is near the HBM roofline):
        ``"bfloat16"`` halves it (~24% faster full pass, measured),
        ``"int8"`` quarters it (~38%; symmetric scale = max|sim|/127,
        max-plus homogeneity keeps the DP kernels unchanged).  DP still
        accumulates in f32.  Scores then carry per-entry input rounding —
        callers must rescore their final top-k exactly (see
        BruteForceIndex.find_batch's cut-safety loop).  ``with_err`` also
        returns the max per-entry absolute rounding bound (0.0 exact);
        quantization requires ``tag_weights=None`` (the tag threshold is a
        discontinuity no rounding bound survives)."""
        pending, err_ref = self._dispatch_multi(
            plans, len_ts, gaps, locality, norm_totals,
            tag_weights=tag_weights, sim_dtype=sim_dtype,
            gap_costs=gap_costs, doc_filter=doc_filter,
        )
        out = np.full(
            (self._packed.n_slices, len(plans)), NEG_SCORE, np.float32
        )
        self._collect_pending(pending, out)
        if with_err:
            return out, quantization_entry_err(*err_ref)
        return out

    def score_topk_multi(
        self,
        plans: List[QueryPlan],
        len_ts: List[int],
        gaps: AffineGapParams,
        locality: str,
        norm_totals: List[float],
        k: int,
        tag_weights: Optional[List[Optional[TagWeightingSpec]]] = None,
        sim_dtype=None,
        with_err: bool = False,
        gap_costs=None,
        doc_filter: Optional[DocFilterSpec] = None,
        boosts=None,
    ):
        """Multi-query corpus pass with DEVICE-SIDE per-bucket top-k: only
        O(buckets * Q * k) (score, id) pairs reach the host instead of the
        full [n_slices, Q] matrix (128 MB at 1M slices x 32 queries — ~5 s
        over the tunnel, the largest single term of find_batch latency).
        Returns a ``BucketTopKSource`` implementing the candidate-source
        protocol the finalizer consumes; tie-unsafe boundaries and
        unsafe-cut extras fall back to reading single score COLUMNS (4 MB
        at 1M slices) from the still-resident device score matrices.
        ``boosts``: per-query [n_slices] multipliers folded into the
        ranking in-kernel."""
        pending, err_ref = self._dispatch_multi(
            plans, len_ts, gaps, locality, norm_totals,
            tag_weights=tag_weights, sim_dtype=sim_dtype,
            gap_costs=gap_costs, doc_filter=doc_filter, boosts=boosts,
        )
        exact_ctx = self._exact_ctx_of(
            plans, len_ts, gaps, locality, tag_weights, gap_costs,
            doc_filter,
        )
        src = BucketTopKSource(self, pending, len(plans), k, exact_ctx)
        if with_err:
            # the fetch above drained the queue, so this read is instant
            with trace.span("topk.entry_err"):
                return src, quantization_entry_err(*err_ref)
        return src

    def _exact_ctx_of(
        self, plans, len_ts, gaps, locality, tag_weights=None,
        gap_costs=None, doc_filter=None,
    ):
        """Fused exact-rescore context: the top-k dispatch also computes
        each selected row's exact f32 raw DP score (static-only plans,
        affine or shared general gap model; doc filters compact in-kernel
        — the device replica of filtered_positions).  None when the plan
        set can't ride the fused kernel."""
        t_ec0 = time.perf_counter()
        exact_ctx = None
        if all(qp.is_static_only for qp in plans):
            stacked = self._stacked_plan_tables(plans, require_identity=True)
            if stacked is not None:
                table, V, Tmax, Qp, _ = stacked
                exact_ctx = {
                    "table": table,
                    "V": V,
                    "Tmax": Tmax,
                    "lt_q": jnp.asarray(len_ts, jnp.int32),
                    "tw_args": _stack_tw(
                        list(tag_weights) if tag_weights else None, Qp, Tmax
                    ),
                    "gaps": gaps,
                    "gap_costs": gap_costs,
                    "gv_t": jnp.asarray(
                        gap_vec(
                            gap_costs[1] if gap_costs is not None else None,
                            Tmax + 1,
                        )
                    ),
                    "locality": locality,
                    "any_tags": tag_weights is not None
                    and any(t is not None for t in tag_weights),
                    "flt": self._filter_args(doc_filter),
                    "with_filter": doc_filter is not None,
                }
        trace.add("topk.exact_ctx", time.perf_counter() - t_ec0)
        return exact_ctx

    def score_topk_prefiltered(
        self,
        plans: List[QueryPlan],
        len_ts: List[int],
        gaps: AffineGapParams,
        locality: str,
        norm_totals: List[float],
        k: int,
        gap_costs=None,
        needle_token_ids=None,
    ):
        """Latency-serving corpus pass with the provable MXU prefilter
        (ops/prefilter.py — the TPU form of the reference's worst_score
        early-reject, core/cpp/result_set.h:32-38): big buckets compute a
        per-slice GEMV upper bound, keep only the top-M slices, and run
        the gather + DP on those; small buckets take the normal full
        pass.  Returns (BucketTopKSource, prefiltered: bool).

        SOUNDNESS CONTRACT: when ``prefiltered`` is True the caller MUST
        verify ``src.prefilter_rest_raw / norm_total < s_n - eps`` after
        the exact finalize and rerun the full pass otherwise — pruned
        slices are not represented in the source at all, so without the
        check a tie at the cut could silently drop matches.  Callers
        guarantee: static-only f32 plans, no tag weights / doc filter /
        boost, nonnegative gap model (prefilter.gaps_nonneg)."""
        from vectorian_tpu.ops import prefilter as pf

        if self._paged or not pf.enabled():
            return (
                self.score_topk_multi(
                    plans, len_ts, gaps, locality, norm_totals, k,
                    gap_costs=gap_costs,
                ),
                False,
            )
        H, M, min_n = pf.config()
        M = max(M, k)
        pf_ids, full_ids = [], []
        for bi, db in enumerate(self._device_buckets):
            if db["n"] == 0:
                continue
            # capacity cap keeps every count exact in int8; small buckets
            # are cheaper to score outright than to prune
            if db["n"] >= max(min_n, 2 * M) and db["capacity"] <= 127:
                pf_ids.append(bi)
            else:
                full_ids.append(bi)
        if not pf_ids:
            return (
                self.score_topk_multi(
                    plans, len_ts, gaps, locality, norm_totals, k,
                    gap_costs=gap_costs,
                ),
                False,
            )

        with trace.span("pf.tables"):
            sim_multi, _, _, Tpad = stack_query_tables(plans, len_ts, None)
        V = int(sim_multi.shape[0])
        groups = pf.cold_groups(H, V)
        lt_arr = jnp.asarray(len_ts, jnp.int32)
        nt_arr = jnp.asarray(norm_totals, jnp.float32)
        needle_cold = jnp.asarray(
            pf.needle_cold_ids(needle_token_ids or [], H)
        )
        gv_t = jnp.asarray(
            gap_vec(gap_costs[1] if gap_costs is not None else None, Tpad + 1)
        )
        pending = []
        t_pf0 = time.perf_counter()
        for bi in pf_ids:
            db = self._device_buckets[bi]
            cnt = self._prefilter_counts(db, H, groups)
            if "_sidx_dev" not in db:
                db["_sidx_dev"] = jnp.asarray(
                    np.pad(
                        db["slice_index"],
                        (0, db["n_pad"] - db["n"]),
                    )
                )
            gv_s = jnp.asarray(
                gap_vec(
                    gap_costs[0] if gap_costs is not None else None,
                    db["capacity"] + 1,
                )
            )
            scores_c, tok_c, pos_c, tag_c, ln_c, sid_c, ub_rest = (
                pf.prefilter_select_score(
                    cnt, db["tokens"], db["pos"], db["tag"],
                    db["lengths"].astype(jnp.int32), db["_sidx_dev"],
                    sim_multi, lt_arr, nt_arr, needle_cold, gaps, gv_s,
                    gv_t,
                    M=M, H=H, n=db["n"], locality=locality,
                    general=gap_costs is not None, groups=groups,
                )
            )
            db_pref = {
                "capacity": db["capacity"],
                "chunk": min(db["chunk"], M),
                "n": M,
                "n_pad": M,
                "tokens": tok_c,
                "pos": pos_c,
                "tag": tag_c,
                "lengths": ln_c,
                "slice_index": None,  # set from sid_dev on the batched fetch
                "sid_dev": sid_c,
                "ub_dev": ub_rest,
            }
            pending.append((db_pref, scores_c))
        trace.add("pf.dispatch", time.perf_counter() - t_pf0)
        if full_ids:
            pending_full, _ = self._dispatch_multi(
                plans, len_ts, gaps, locality, norm_totals,
                gap_costs=gap_costs, only_buckets=set(full_ids),
            )
            pending.extend(pending_full)
        exact_ctx = self._exact_ctx_of(
            plans, len_ts, gaps, locality, None, gap_costs, None
        )
        return BucketTopKSource(self, pending, len(plans), k, exact_ctx), True

    def _prefilter_counts(self, db, H: int, groups):
        """Per-bucket [n_pad, 2H+2G] int8 count matrix, built on device
        once and cached (invalidated if H/groups change)."""
        from vectorian_tpu.ops import prefilter as pf

        key = (H, groups)
        cached = db.get("_pf_cnt")
        if cached is not None and cached[0] == key:
            return cached[1]
        with trace.span("pf.build_counts"):
            cnt = pf.build_counts(
                db["tokens"], db["lengths"], H=H, groups=groups,
                chunk=db["chunk"],
            )
        db["_pf_cnt"] = (key, cnt)
        return cnt

    def _dispatch_multi(
        self, plans, len_ts, gaps, locality, norm_totals,
        tag_weights=None, sim_dtype=None, gap_costs=None, doc_filter=None,
        boosts=None, only_buckets=None,
    ):
        """Dispatch half of the multi-query corpus pass: returns
        ([(db, scores_dev [n_pad, Q])] with scores left on device, and the
        quantization entry error).  ``boosts``: optional per-query
        [n_slices] multipliers — ranking scores carry them in-kernel (the
        exact rescore applies them host-side; eps slack scales with the
        largest boost in the finalizer)."""
        if sim_dtype is not None and tag_weights is not None and any(
            tw is not None for tw in tag_weights
        ):
            raise ValueError("quantized ranking requires tag_weights=None")
        Q = len(plans)
        with trace.span("topk.tables"):
            sim_multi, sim_scale, max_abs_dev, Tpad = stack_query_tables(
                plans, len_ts, sim_dtype
            )
        lt_arr = jnp.asarray(len_ts, jnp.int32)
        nt_arr = jnp.asarray(norm_totals, jnp.float32)

        with_tags = tag_weights is not None and any(
            tw is not None for tw in tag_weights
        )
        # per-query weight / needle-pos / penalty / threshold columns;
        # queries without tag weights stay identity: weight 1, penalty 0
        # (the pos sentinel then never matters), threshold -1 (keeps all)
        tw_w = np.ones((Tpad, Q), np.float32)
        tw_p = np.full((Tpad, Q), -1, np.int8)
        pen = np.zeros((Q,), np.float32)
        thr = np.full((Q,), -1.0, np.float32)
        if with_tags:
            for qi, tw in enumerate(tag_weights):
                if tw is None:
                    continue
                t = len(tw.t_pos_weights)
                tw_w[:t, qi] = tw.t_pos_weights
                tw_p[:t, qi] = tw.pos_t
                pen[qi] = tw.pos_mismatch_penalty
                thr[qi] = tw.similarity_threshold
        tw_args = (
            jnp.asarray(tw_w),
            jnp.asarray(tw_p),
            jnp.asarray(pen),
            jnp.asarray(thr),
        )

        pending = []
        flt = self._filter_args(doc_filter)
        uniq_on = uniq_gather_default(Q)
        t_disp0 = time.perf_counter()
        for bi, db in enumerate(self._device_buckets):
            if db["n"] == 0:
                continue
            if only_buckets is not None and bi not in only_buckets:
                continue

            def dispatch(db=db):
                # the index's gap model is shared by every query in the
                # batch: ONE [L+1]/[Tpad+1] cost-vector pair serves all Q
                # (the DP masks columns past each query's len_t)
                gc_s = gap_costs[0] if gap_costs is not None else None
                gc_t = gap_costs[1] if gap_costs is not None else None
                gv_s = jnp.asarray(gap_vec(gc_s, db["capacity"] + 1))
                gv_t = jnp.asarray(gap_vec(gc_t, Tpad + 1))
                n_pad = db["n_pad"]
                if boosts is not None:
                    bmat = np.ones((n_pad, Q), np.float32)
                    for qi, b in enumerate(boosts):
                        if b is not None:
                            bmat[: db["n"], qi] = b[db["slice_index"]]
                    bvec = jnp.asarray(bmat)
                else:
                    bvec = jnp.ones((n_pad, 1), jnp.float32)
                uq = {}
                if uniq_on:
                    u, ui = self._uniq_args(db)
                    uq = {"uniq": u, "uniq_inv": ui, "uniq_gather": True}
                return _bucket_scores_multiquery(
                    db["tokens"],
                    db["pos"],
                    db["tag"],
                    db["lengths"],
                    sim_multi,
                    lt_arr,
                    gaps,
                    nt_arr,
                    bvec,
                    *tw_args,
                    *flt,
                    gv_s,
                    gv_t,
                    locality=locality,
                    chunk=db["chunk"],
                    n_queries=Q,
                    use_pallas=use_pallas_default(),
                    with_tags=with_tags,
                    general_gaps=gap_costs is not None,
                    with_filter=doc_filter is not None,
                    with_boost=boosts is not None,
                    sim_scale=sim_scale,
                    **uq,
                )

            pending.append(
                (db, _LazyScores(db, dispatch) if self._paged else dispatch())
            )
        trace.add("topk.dispatch", time.perf_counter() - t_disp0)
        # the entry-error bound reads a device scalar — deferred to the
        # CALLER (after its own dispatches): reading here fenced the host
        # behind the whole enqueued corpus pass (measured 2.1 s of a
        # Q=512 pass spent stalled before the top-k stage even dispatched)
        return pending, (sim_dtype, max_abs_dev)

    def score_all_multi_ctx(
        self,
        name: str,
        metric,
        ctx_queries: List[dict],  # q -> {unmodified, normalized, magnitudes}
        len_ts: List[int],
        gaps: AffineGapParams,
        locality: str,
        norm_totals: List[float],
        gap_costs=None,  # (GapCost_s, GapCost_t) -> general-gap WSB DP
        doc_filter: Optional[DocFilterSpec] = None,
    ) -> np.ndarray:
        """[n_slices, Q] scores for a batch of single-contextual-embedding
        queries in one corpus pass (per-chunk metric evaluation = one GEMM
        against the stacked query matrix).  Doc-side filters compact the
        post-GEMM similarity rows in-kernel."""
        Q = len(ctx_queries)
        q_unmod, q_norm, q_mags, Tpad = stack_ctx_queries(ctx_queries, len_ts)
        lt_arr = jnp.asarray(len_ts, jnp.int32)
        nt_arr = jnp.asarray(norm_totals, jnp.float32)
        flt = self._filter_args(doc_filter)
        placeholder = jnp.zeros((1, 1), jnp.int32)

        out = np.full((self._packed.n_slices, Q), NEG_SCORE, np.float32)
        pending = []
        for bi, db in enumerate(self._device_buckets):
            if db["n"] == 0:
                continue

            def dispatch(db=db, bi=bi):
                gv_s = jnp.asarray(
                    gap_vec(gap_costs[0] if gap_costs is not None else None,
                            db["capacity"] + 1)
                )
                gv_t = jnp.asarray(
                    gap_vec(gap_costs[1] if gap_costs is not None else None,
                            Tpad + 1)
                )
                return _bucket_scores_multiquery_ctx(
                    self._ctx_dev(name, bi),
                    db["lengths"],
                    q_norm,
                    q_unmod,
                    q_mags,
                    lt_arr,
                    gaps,
                    nt_arr,
                    gv_s,
                    gv_t,
                    db["tokens"] if doc_filter is not None else placeholder,
                    db["pos"] if doc_filter is not None else placeholder,
                    db["tag"] if doc_filter is not None else placeholder,
                    *flt,
                    metric=metric,
                    locality=locality,
                    chunk=db["chunk"],
                    n_queries=Q,
                    use_pallas=use_pallas_default(),
                    general_gaps=gap_costs is not None,
                    with_filter=doc_filter is not None,
                )

            pending.append(
                (db, _LazyScores(db, dispatch) if self._paged else dispatch())
            )
        self._collect_pending(pending, out)
        return out

    def score_all_multi_tree(
        self,
        plans: List[QueryPlan],
        len_ts: List[int],
        gaps: AffineGapParams,
        locality: str,
        norm_totals: List[float],
        gap_costs=None,
        doc_filter: Optional[DocFilterSpec] = None,
        tag_weights=None,
    ) -> np.ndarray:
        """[n_slices, Q] scores for a batch of MIXED static+contextual
        modifier-tree queries in one corpus pass (stacked per-leaf query
        axes, see stack_tree_plans).  Contextual stores must already be
        ensured by the caller; doc-side filters compact the post-eval
        similarity rows in-kernel; per-query tag weighting applies to the
        combined tree similarity (``tag_weights``: list of
        TagWeightingSpec or None per query)."""
        Q = len(plans)
        statics, ctx_qs, weights, Tpad = stack_tree_plans(plans, len_ts)
        lt_arr = jnp.asarray(len_ts, jnp.int32)
        nt_arr = jnp.asarray(norm_totals, jnp.float32)
        ctx_names = plans[0].ctx_names
        flt = self._filter_args(doc_filter)
        placeholder = jnp.zeros((1, 1), jnp.int32)
        with_tags = tag_weights is not None and any(
            t is not None for t in tag_weights
        )
        tw_w = np.ones((Tpad, Q), np.float32)
        tw_p = np.full((Tpad, Q), -1, np.int8)
        tw_pen = np.zeros((Q,), np.float32)
        tw_thr = np.full((Q,), -1.0, np.float32)
        if with_tags:
            for qi, tw in enumerate(tag_weights):
                if tw is None:
                    continue
                t = min(len(tw.t_pos_weights), Tpad)
                tw_w[:t, qi] = tw.t_pos_weights[:t]
                tw_p[:t, qi] = tw.pos_t[:t]
                tw_pen[qi] = tw.pos_mismatch_penalty
                tw_thr[qi] = tw.similarity_threshold
        tw_args = tuple(
            jnp.asarray(a) for a in (tw_w, tw_p, tw_pen, tw_thr)
        )

        out = np.full((self._packed.n_slices, Q), NEG_SCORE, np.float32)
        pending = []
        for bi, db in enumerate(self._device_buckets):
            if db["n"] == 0:
                continue

            def dispatch(db=db, bi=bi):
                ctx_stores = tuple(self._ctx_dev(nm, bi) for nm in ctx_names)
                gv_s = jnp.asarray(
                    gap_vec(gap_costs[0] if gap_costs is not None else None,
                            db["capacity"] + 1)
                )
                gv_t = jnp.asarray(
                    gap_vec(gap_costs[1] if gap_costs is not None else None,
                            Tpad + 1)
                )
                return _bucket_scores_multiquery_tree(
                    plans[0].plan,
                    db["tokens"],
                    db["tok_sorted"],
                    db["sort_inv"],
                    db["lengths"],
                    statics,
                    tuple(plans[0].static_mags),
                    ctx_stores,
                    ctx_qs,
                    weights,
                    lt_arr,
                    gaps,
                    nt_arr,
                    gv_s,
                    gv_t,
                    db["pos"]
                    if (doc_filter is not None or with_tags)
                    else placeholder,
                    db["tag"]
                    if (doc_filter is not None or with_tags)
                    else placeholder,
                    *tw_args,
                    *flt,
                    locality=locality,
                    chunk=db["chunk"],
                    n_queries=Q,
                    use_pallas=use_pallas_default(),
                    general_gaps=gap_costs is not None,
                    with_filter=doc_filter is not None,
                    with_tags=with_tags,
                )

            pending.append(
                (db, _LazyScores(db, dispatch) if self._paged else dispatch())
            )
        self._collect_pending(pending, out)
        return out

    def score_topk(
        self,
        qp: QueryPlan,
        len_t: int,
        gaps: AffineGapParams,
        locality: str,
        norm_total: float,
        k: int,
        min_score: float = 0.2,
        boost: Optional[np.ndarray] = None,
        tag_weights: Optional[TagWeightingSpec] = None,
        doc_filter: Optional[DocFilterSpec] = None,
        gap_costs=None,
        with_next: bool = False,
    ):
        """Top-k with device-side selection: only O(buckets * k) (score,
        id) pairs ever reach the host — the low-latency single-query path
        (the full score_all transfer is O(n_slices)).

        Returns (slice_ids list, {slice_id: score}); with ``with_next``
        also an upper bound on the device score of every slice NOT in the
        returned candidates (-inf when every slice was fetched) — the
        overfetch-safety hook for rescoring paths (submatch_weight)."""
        T = self._plan_width(qp)  # padded needle width (>= len_t)
        pending = []
        flt = self._filter_args(doc_filter)
        for bi, db in enumerate(self._device_buckets):
            if db["n"] == 0:
                continue

            def dispatch(db=db, bi=bi):
                bvec, tw, gv_s, gv_t = self._bucket_dispatch_args(
                    db, T, boost, tag_weights, gap_costs
                )
                static_sims, static_mags, ctx, ctx_q, weights = (
                    self._plan_args(qp, bi)
                )
                return _bucket_scores(
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
                    jnp.asarray(len_t, jnp.int32),
                    gaps,
                    bvec,
                    jnp.asarray(norm_total, jnp.float32),
                    *tw,
                    *flt,
                    gv_s,
                    gv_t,
                    locality=locality,
                    chunk=db["chunk"],
                    with_tags=tag_weights is not None,
                    with_filter=doc_filter is not None,
                    general_gaps=gap_costs is not None,
                    use_pallas=use_pallas_default(),
                )

            pending.append(
                (db, _LazyScores(db, dispatch) if self._paged else dispatch())
            )
        if not pending or k <= 0:
            return ([], {}, float("-inf")) if with_next else ([], {})

        # Per-bucket device top-k + host merge, with a tie-safe fallback:
        # buckets are LENGTH-sorted, so lax.top_k's lowest-index tie
        # preference truncates tie groups in the wrong order — whenever a
        # bucket's fetch boundary could still hold a slice that beats (or
        # ties) the global k-th, read that bucket's FULL score vector once
        # and merge host-side.  (At most two rounds: a doubling loop would
        # compile a fresh top_k shape per round, which on a tunneled
        # runtime costs seconds per query on tie-heavy corpora.)
        fetched = [None] * len(pending)  # (vals np, ids np, bucket_next)
        for round_ in range(2):
            # dispatch every fetch first, read after — host reads are
            # tunnel round trips; interleaving them would serialize.
            # (Paged mode reads bucket-by-bucket instead: the host read is
            # the completion barrier that bounds HBM to one bucket; an
            # unsafe round-2 bucket re-pages and recomputes.)
            dispatched = []
            for bi, (db, entry) in enumerate(pending):
                if fetched[bi] is not None:
                    continue
                lazy = isinstance(entry, _LazyScores)
                scores = entry.get() if lazy else entry
                kk = min(k, db["n"])
                if round_ == 0 and kk < db["n"]:
                    kf = kk + 1  # +1 probes the boundary
                    vals, idx = jax.lax.top_k(scores[: db["n"]], kf)
                else:  # full read (small bucket or tie-unsafe fallback)
                    kk, vals, idx = db["n"], scores[: db["n"]], None
                if lazy:
                    # double-buffer: issue the next unread bucket's
                    # upload + dispatch before this bucket's blocking read
                    if _page_prefetch_default():
                        for bj in range(bi + 1, len(pending)):
                            if fetched[bj] is None and isinstance(
                                pending[bj][1], _LazyScores
                            ):
                                pending[bj][1].get()
                                break
                    vals = np.asarray(vals)
                    idx = None if idx is None else np.asarray(idx)
                    entry.release()
                dispatched.append((bi, kk, vals, idx))
            for bi, kk, vals, idx in dispatched:
                db = pending[bi][0]
                vals = np.asarray(vals)
                if idx is not None:
                    ids_b = db["slice_index"][np.asarray(idx)]
                    fetched[bi] = (
                        vals[:kk], ids_b[:kk], float(vals[kk]),
                    )
                else:
                    fetched[bi] = (vals, db["slice_index"], float("-inf"))
            vals = np.concatenate([f[0] for f in fetched])
            ids = np.concatenate([f[1] for f in fetched])
            keep = vals >= min_score
            vals_k, ids_k = vals[keep], ids[keep]
            order = order_by_score(self._packed, ids_k, vals_k)
            top = [int(i) for i in ids_k[order][:k]]
            thr = (
                float(vals_k[order][len(top) - 1])
                if len(top) == k
                else min_score
            )
            # a bucket whose unfetched slices could reach thr (>= because
            # an equal score can win the (doc, slice) tie-break) must be
            # read fully before the cut is final
            unsafe = [
                bi
                for bi in range(len(pending))
                if fetched[bi][2] >= thr
            ]
            if not unsafe:
                break
            for bi in unsafe:
                fetched[bi] = None

        if with_next:
            next_bound = max(
                (f[2] for f in fetched), default=float("-inf")
            )
            if len(vals) > len(vals_k):
                # fetched-but-below-min_score candidates are also 'not in
                # the returned set' — the documented bound must cover them
                next_bound = max(next_bound, float(np.max(vals[~keep])))
            if len(ids_k) > len(top):
                # best gathered-but-not-returned candidate: the (k+1)-th in
                # merge order (NOT the k-th kept — that equals the cut and
                # would make every caller's safety check fail vacuously)
                next_bound = max(
                    next_bound, float(vals_k[order][len(top)])
                )
            score_map = {int(i): float(v) for i, v in zip(ids_k, vals_k)}
            return top, score_map, next_bound
        return top, {int(i): float(v) for i, v in zip(ids_k, vals_k)}

    def top_k(
        self,
        scores: np.ndarray,
        k: int,
        min_score: float = 0.2,
    ) -> List[int]:
        """Deterministic top-k with the reference's tie-break order
        (score desc, then doc id asc, then slice id asc —
        match_impl.h:8-42)."""
        n = scores.shape[0]
        if n == 0 or k <= 0:
            return []
        k = min(k, n)
        # candidate pool = EVERY slice scoring >= the k-th largest value, so
        # score ties at the boundary resolve by the (doc, slice) tie-break —
        # an argpartition pool would keep an arbitrary tied subset and could
        # drop the slice the reference order ranks inside the top k
        thr = -np.partition(-scores, k - 1)[k - 1]
        # >= keeps boundary candidates; FINAL acceptance is strictly
        # greater than min_score and happens in the callers' filters
        cand = np.flatnonzero(scores >= max(thr, min_score))
        order = order_by_score(self._packed, cand, scores[cand])
        return [int(c) for c in cand[order][:k]]

    def top_k_with_next(self, scores: np.ndarray, m: int, thresh: float):
        """Unordered candidate ids with score >= ``thresh`` among the m
        largest, plus the best score OUTSIDE the returned set (-inf when
        the set is complete above ``thresh``).  Used by the approximate-
        ranking (bf16) paths to prove their exact-rescore cut is safe: any
        slice not returned scores at most ``next``."""
        n = scores.shape[0]
        if m >= n:
            cand = np.flatnonzero(scores >= thresh)
            return [int(c) for c in cand], float("-inf")
        ap = np.argpartition(-scores, m)
        cand = ap[:m]
        kept = cand[scores[cand] >= thresh]
        if len(kept) < m:
            # the partition boundary is below thresh, so everything
            # excluded is too: the candidate set is complete
            return [int(c) for c in kept], float("-inf")
        return [int(c) for c in kept], float(scores[ap[m]])

    def filtered_positions(self, sid: int, doc_filter: Optional[DocFilterSpec]):
        """Host-side replica of the device compaction for one slice:
        original in-slice offsets of the kept tokens."""
        ln = int(self._packed.slice_len[sid])
        if doc_filter is None:
            return np.arange(ln, dtype=np.int32)
        bi, r = self._slice_loc[sid]
        db = self._device_buckets[bi]
        tok = db["tokens_np"][r]
        pos = db["pos_np"][r]
        tag = db["tag_np"][r]
        keep = (
            ~doc_filter.pos_exclude[pos[:ln]]
            & ~doc_filter.tag_exclude[tag[:ln]]
            & ~doc_filter.token_exclude[tok[:ln]]
        )
        return np.flatnonzero(keep).astype(np.int32)

    def batch_slice_similarity(
        self,
        sids: Sequence[int],
        qp: QueryPlan,
        tag_weights: Optional[TagWeightingSpec] = None,
        sels: Optional[List[np.ndarray]] = None,
        device: bool = False,
    ):
        """[(S_weighted [len_i, T], S_unmodified)] for many slices with ONE
        device dispatch per touched bucket — the per-slice path costs a
        tunnel round trip each, which dominated interactive latency.

        ``device=True`` returns the raw per-bucket groups WITHOUT any host
        read: a list of dicts {idxs (positions into ``sids``), g, L
        (bucket capacity), Sw [gp, L, T], Su} with Sw/Su still on device —
        the dispatch half for callers that batch many independent rescores
        into one ``jax.device_get`` (each host read costs a tunnel round
        trip; one batched fetch of 32 arrays measured 25x faster than 32
        sequential reads)."""
        T = self._plan_width(qp)
        if tag_weights is not None:
            tw = tag_weights.device_args()
        else:
            tw = TagWeightingSpec.identity_args(T)
        out: List = [None] * len(sids)
        groups: List[dict] = []
        by_bucket: Dict[int, List[int]] = {}
        for j, sid in enumerate(sids):
            bi = int(self._slice_loc[sid, 0])
            if bi < 0:
                raise KeyError(sid)
            by_bucket.setdefault(bi, []).append(j)
        for bi, idxs in by_bucket.items():
            db = self._device_buckets[bi]
            L = db["capacity"]
            # pad the group to the next power of two (dummy rows repeat row
            # 0) so the jit cache sees a handful of shapes, not one trace
            # per way the top-k happens to distribute across buckets
            g = len(idxs)
            gp = _next_pow2(g)
            rows = np.zeros((gp,), np.int32)
            rows[:g] = [self._slice_loc[sids[j], 1] for j in idxs]
            if sels is not None:
                sel_pad = np.zeros((gp, L), np.int32)
                for k2, j in enumerate(idxs):
                    s = sels[j]
                    sel_pad[k2, : len(s)] = s
            else:
                sel_pad = np.zeros((1, L), np.int32)  # placeholder
            if self._paged:
                # upload just the requested rows (the whole-bucket device
                # view would page GBs in for a handful of rescores)
                static_sims = tuple(qp.static_sims)
                static_mags = tuple(qp.static_mags)
                ctx_q = tuple(qp.ctx_queries)
                weights = tuple(qp.mixed_weights)
                tok_in = jnp.asarray(db["tokens_np"][rows])
                pos_in = jnp.asarray(db["pos_np"][rows])
                ctx_all = tuple(
                    jnp.asarray(self._ctx_stores[nm][bi][rows])
                    for nm in qp.ctx_names
                )
                rows_d = jnp.arange(gp, dtype=jnp.int32)
            else:
                static_sims, static_mags, ctx_all, ctx_q, weights = (
                    self._plan_args(qp, bi)
                )
                tok_in, pos_in = db["tokens"], db["pos"]
                rows_d = jnp.asarray(rows)
            Sw, Su = _slices_similarity_batch(
                qp.plan,
                tok_in,
                pos_in,
                rows_d,
                jnp.asarray(sel_pad),
                static_sims,
                static_mags,
                ctx_all,
                ctx_q,
                weights,
                *tw,
                with_tags=tag_weights is not None,
                with_sel=sels is not None,
            )
            if device:
                groups.append(
                    {"idxs": idxs, "g": g, "L": L, "Sw": Sw, "Su": Su}
                )
                continue
            Sw = np.asarray(Sw)
            Su = np.asarray(Su)
            for k2, j in enumerate(idxs):
                ln = (
                    len(sels[j])
                    if sels is not None
                    else int(self._packed.slice_len[sids[j]])
                )
                out[j] = (Sw[k2, :ln], Su[k2, :ln])
        return groups if device else out

    def slice_similarity(
        self,
        sid: int,
        qp: QueryPlan,
        tag_weights: Optional[TagWeightingSpec] = None,
        sel: Optional[np.ndarray] = None,
    ):
        """(S_weighted [len, T], S_unmodified [len, T]) for one slice.
        ``sel``: kept in-slice offsets when a doc filter is active."""
        bi, r = self._slice_loc[sid]
        if bi < 0:
            raise KeyError(sid)
        db = self._device_buckets[bi]
        L = db["capacity"]
        if sel is not None:
            pad = np.zeros((L,), np.int32)
            pad[: len(sel)] = sel
            # host token copies (a device pull per slice costs a tunnel
            # RTT); the big contextual rows gather on DEVICE instead
            tok = jnp.asarray(db["tokens_np"][r][pad])[None]
            pos = jnp.asarray(db["pos_np"][r][pad])[None]
        elif self._paged:
            # paged engine: never touch the bucket's device view for one
            # row — upload the host row directly
            tok = jnp.asarray(db["tokens_np"][r])[None]
            pos = jnp.asarray(db["pos_np"][r])[None]
        else:
            tok = db["tokens"][r][None]
            pos = db["pos"][r][None]
        T = self._plan_width(qp)
        if tag_weights is not None:
            tw = tag_weights.device_args()
        else:
            tw = TagWeightingSpec.identity_args(T)
        static_sims = tuple(qp.static_sims)
        static_mags = tuple(qp.static_mags)
        ctx_q = tuple(qp.ctx_queries)
        weights = tuple(qp.mixed_weights)
        if self._paged:
            # one-row upload from the host bf16 store
            ctx_rows = tuple(
                jnp.asarray(self._ctx_stores[nm][bi][r])
                for nm in qp.ctx_names
            )
        else:
            ctx_rows = tuple(
                self._ctx_stores[nm][bi][r] for nm in qp.ctx_names
            )
        if sel is not None:
            pad_d = jnp.asarray(pad)
            ctx = tuple(
                c.astype(jnp.float32)[pad_d][None] for c in ctx_rows
            )
        else:
            ctx = tuple(c[None] for c in ctx_rows)
        Sw, Su = _slice_similarity(
            qp.plan, tok, static_sims, static_mags, ctx, ctx_q, weights,
            pos, *tw, with_tags=tag_weights is not None,
        )
        ln = int(self._packed.slice_len[sid]) if sel is None else len(sel)
        return np.asarray(Sw)[:ln], np.asarray(Su)[:ln]

    def rescore_scores(
        self,
        slice_ids: List[int],
        qp: QueryPlan,
        len_t: int,
        gaps: AffineGapParams,
        locality: str,
        tag_weights: Optional[TagWeightingSpec] = None,
        doc_filter: Optional[DocFilterSpec] = None,
        gap_costs=None,
        chunk: int = 8192,
    ) -> np.ndarray:
        """Exact f32 raw DP scores [k] for the chosen slices WITHOUT flow
        extraction — the cheap half of the finalizer for tie-bounded extra
        candidates (host tracebacks at Zipf tie volumes dominated batch
        latency).  Runs the IDENTICAL similarity + align_scores arithmetic
        as the flow finalizer (align_matrices_scores computes its raw
        scores with the same align_scores recurrence), so the returned
        scores are bit-equal to rescore_with_flows'."""
        (res,) = self.rescore_many(
            [
                {
                    "slice_ids": slice_ids,
                    "qp": qp,
                    "len_t": len_t,
                    "tag_weights": tag_weights,
                    "want_flows": False,
                }
            ],
            gaps, locality, gap_costs=gap_costs, doc_filter=doc_filter,
            chunk=chunk,
        )
        return res[2]

    def rescore_with_flows(
        self,
        slice_ids: List[int],
        qp: QueryPlan,
        len_t: int,
        gaps: AffineGapParams,
        locality: str,
        tag_weights: Optional[TagWeightingSpec] = None,
        doc_filter: Optional[DocFilterSpec] = None,
        gap_costs=None,
        on_sims=None,  # optional (sid, S_weighted, S_unmodified) observer
        with_scores: bool = False,
    ):
        """Recompute DP matrices for the chosen slices and extract injective
        flows via host traceback (the reference's finalizer pass,
        matcher_impl.h:172-174).  Mappings are translated back to unfiltered
        in-slice offsets when a doc filter is active.
        Returns (mappings, per-edge unmodified sims [T]); with
        ``with_scores`` also the exact f32 raw DP scores [k] (NEG_SCORE for
        empty slices) — the exact-rescore half of approximate (bf16) device
        ranking.

        Batched: one similarity dispatch per touched bucket + one batched
        DP-matrix dispatch per bucket group, host reads coalesced into one
        transfer (tunnel round trips, not compute, dominate the finalizer's
        latency)."""
        (res,) = self.rescore_many(
            [
                {
                    "slice_ids": slice_ids,
                    "qp": qp,
                    "len_t": len_t,
                    "tag_weights": tag_weights,
                    "want_flows": True,
                    "on_sims": on_sims,
                }
            ],
            gaps, locality, gap_costs=gap_costs, doc_filter=doc_filter,
        )
        mappings, edge_sims, raw_scores = res
        if with_scores:
            return mappings, edge_sims, raw_scores
        return mappings, edge_sims

    def rescore_many(
        self,
        requests: List[dict],
        gaps: AffineGapParams,
        locality: str,
        gap_costs=None,
        doc_filter: Optional[DocFilterSpec] = None,
        chunk: int = 8192,
    ):
        with trace.span("rescore_many"):
            return self._rescore_many(
                requests, gaps, locality, gap_costs=gap_costs,
                doc_filter=doc_filter, chunk=chunk,
            )

    def _rescore_many(
        self,
        requests: List[dict],
        gaps: AffineGapParams,
        locality: str,
        gap_costs=None,
        doc_filter: Optional[DocFilterSpec] = None,
        chunk: int = 8192,
    ):
        """Exact f32 rescore for MANY independent candidate sets (one per
        query) with every host read coalesced into a single
        ``jax.device_get``.

        Each request: {slice_ids, qp, len_t, tag_weights, want_flows,
        on_sims?}.  Gap model, locality and doc filter are index-level and
        shared.  Returns per-request (mappings, edge_sims, raw_scores)
        (mappings/edge_sims are identity placeholders for score-only
        requests).

        The serving batch previously looped queries through
        rescore_with_flows — 2 blocking tunnel reads per query; on the
        tunneled TPU a batched fetch of 32 small arrays measured ~37 ms
        vs ~940 ms for 32 sequential reads.  The DP runs per bucket group
        directly on the (pow2-row-padded) similarity output: the
        recurrences are prefix-causal and mask score reductions by
        (len_s, len_t), so junk pad rows/columns never change a real row's
        score bits (tests assert byte-equality against the single-query
        path).

        When every live request carries a static-only plan and the gap
        model is affine, the whole round collapses further into ONE
        dispatch per touched bucket (``_rescore_many_stacked``): per-query
        combined plan matrices stack into one table and each row gathers
        its own query's columns — byte-identical (see _stacked_rescore)."""
        _t_rm0 = time.perf_counter()
        live_reqs = [r for r in requests if len(r["slice_ids"])]
        if len(live_reqs) > 1 and all(
            r["qp"].is_static_only for r in live_reqs
        ):
            out = self._rescore_many_stacked(
                requests, gaps, locality, doc_filter, chunk,
                gap_costs=gap_costs,
            )
            if out is not None:
                return out
        states = []
        refs: List = []  # flat device arrays to fetch in one transfer
        for req in requests:
            slice_ids = list(req["slice_ids"])
            qp = req["qp"]
            len_t = req["len_t"]
            tagw = req.get("tag_weights")
            want_flows = req.get("want_flows", True)
            k = len(slice_ids)
            st = {
                "k": k,
                "qp": qp,
                "len_t": len_t,
                "want_flows": want_flows,
                "on_sims": req.get("on_sims"),
                "slice_ids": slice_ids,
                "mappings": [
                    np.full((len_t,), -1, np.int32) for _ in range(k)
                ],
                "edge_sims": [
                    np.zeros((len_t,), np.float32) for _ in range(k)
                ],
                "raw": np.full((k,), NEG_SCORE, np.float32),
                "groups": [],
            }
            states.append(st)
            if k == 0:
                continue
            sels = [
                self.filtered_positions(sid, doc_filter) for sid in slice_ids
            ]
            live = [j for j in range(k) if len(sels[j]) > 0]
            st["sels"] = sels
            if not live:
                continue
            Tw = self._plan_width(qp)
            # chunk big sets (tie-extras run to tens of thousands): bounds
            # one dispatch's similarity footprint and caps the pow2 shape
            # family the jit cache must hold
            for c0 in range(0, len(live), chunk):
                live_c = live[c0 : c0 + chunk]
                sim_groups = self.batch_slice_similarity(
                    [slice_ids[j] for j in live_c],
                    qp,
                    tagw,
                    sels=[sels[j] for j in live_c]
                    if doc_filter is not None
                    else None,
                    device=True,
                )
                for grp in sim_groups:
                    g, gp_rows = grp["g"], grp["Sw"].shape[0]
                    # original request positions for this group's rows
                    grp["js"] = [live_c[i] for i in grp["idxs"]]
                    ln_np = np.ones((gp_rows,), np.int32)
                    ln_np[:g] = [len(sels[j]) for j in grp["js"]]
                    ln_arr = jnp.asarray(ln_np)
                    lt_arr = jnp.full((gp_rows,), len_t, jnp.int32)
                    if gap_costs is not None:
                        w_s = gap_vec(gap_costs[0], grp["L"] + 1)
                        w_t = gap_vec(gap_costs[1], Tw + 1)
                        grp["w_s"], grp["w_t"] = w_s, w_t
                        if want_flows:
                            H, raw = align_matrices_scores_general(
                                grp["Sw"], ln_arr, lt_arr,
                                jnp.asarray(w_s), jnp.asarray(w_t), locality,
                            )
                        else:
                            H = None
                            raw = align_scores_general(
                                grp["Sw"], ln_arr, lt_arr,
                                jnp.asarray(w_s), jnp.asarray(w_t), locality,
                            )
                    else:
                        if want_flows:
                            H, _, _, raw = align_matrices_scores(
                                grp["Sw"], ln_arr, lt_arr, gaps, locality
                            )
                        else:
                            H = None
                            raw = align_scores(
                                grp["Sw"], ln_arr, lt_arr, gaps, locality
                            )
                    grp["r_raw"] = len(refs)
                    refs.append(raw)
                    if want_flows:
                        grp["r_H"] = len(refs)
                        refs.append(H)
                        grp["r_Sw"] = len(refs)
                        refs.append(grp["Sw"])
                        grp["r_Su"] = len(refs)
                        refs.append(grp["Su"])
                    grp.pop("Sw")
                    grp.pop("Su")
                    st["groups"].append(grp)

        trace.add("rescore.dispatch", time.perf_counter() - _t_rm0)
        with trace.span("rescore.fetch"):
            fetched = jax.device_get(refs) if refs else []

        _t_rm1 = time.perf_counter()
        results = []
        for st in states:
            mappings, edge_sims = st["mappings"], st["edge_sims"]
            raw_scores = st["raw"]
            len_t = st["len_t"]
            on_sims = st["on_sims"]
            for grp in st["groups"]:
                raw_np = np.asarray(fetched[grp["r_raw"]])
                js = grp["js"]
                raw_scores[np.asarray(js, np.int64)] = raw_np[: grp["g"]]
                if not st["want_flows"]:
                    continue
                H_np = np.asarray(fetched[grp["r_H"]])
                Sw_np = np.asarray(fetched[grp["r_Sw"]])
                Su_np = np.asarray(fetched[grp["r_Su"]])
                g = grp["g"]
                lens = np.asarray(
                    [len(st["sels"][j]) for j in js], np.int32
                )
                lts = np.full((g,), len_t, np.int32)
                maps = batch_tracebacks(
                    H_np[:g], Sw_np[:g], lens, lts, gaps, locality,
                    w_s=grp.get("w_s"), w_t=grp.get("w_t"),
                )
                for pos, j in enumerate(js):
                    sel = st["sels"][j]
                    ln = len(sel)
                    S = Sw_np[pos]
                    Su = Su_np[pos]
                    if on_sims is not None:
                        on_sims(
                            st["slice_ids"][j],
                            S[:ln, :len_t],
                            Su[:ln, :len_t],
                        )
                    mapping = maps[pos]
                    sims = edge_sims_of(mapping, Su, len_t)
                    # translate filtered offsets back to original slice
                    # offsets
                    mapping = np.where(
                        mapping >= 0, sel[np.maximum(mapping, 0)], -1
                    )
                    mappings[j] = mapping.astype(np.int32)
                    edge_sims[j] = sims
            results.append((mappings, edge_sims, raw_scores))
        trace.add("rescore.unpack", time.perf_counter() - _t_rm1)
        return results

    # cap on the stacked-table footprint ([Qp * V, Tmax] f32); beyond it
    # the per-query fallback is cheaper than the HBM churn
    STACKED_TABLE_MAX_BYTES = 512 << 20

    def _stacked_plan_tables(
        self, qps: List[QueryPlan], require_identity: bool = False
    ):
        """Stack per-request combined plan matrices into one flat
        [Qp * V, Tmax] gather table (row ``slot * V + token``).

        Returns (table, V, Tmax, Qp, slots) — ``slots[i]`` is plan i's row
        block in the table — or None when the requests cannot stack (vocab
        row counts differ) or the table would be too large.  The stack is
        a pure device-side copy of already-compiled plan matrices, so
        gathered values are bit-identical to per-query gathers.

        Single-slot memo: within one serving batch the fused top-k stacks
        ALL plans and the later rescore rounds stack SUBSETS of them — a
        subset reuses the memoized table through its slot map instead of
        rebuilding (the memo holds strong plan references so the id keys
        stay valid; ``release_stack_memo`` drops the pinned table at batch
        end).  ``require_identity``: only reuse when slots == 0..Q-1 (the
        fused kernels equate table slot with query index)."""
        cached = getattr(self, "_stack_memo", None)
        if cached is not None:
            slots_map = cached[0]
            if all(id(qp) in slots_map for qp in qps):
                slots = [slots_map[id(qp)] for qp in qps]
                if not require_identity or slots == list(range(len(qps))):
                    table, V, Tmax, Qp = cached[2]
                    return table, V, Tmax, Qp, slots
        mats = []
        V = None
        for qp in qps:
            if qp.plan == ("static", 0):
                m = qp.static_sims[0]
            else:
                m = combine_static_plan(
                    qp.plan, tuple(qp.static_sims), tuple(qp.mixed_weights)
                )
            if V is None:
                V = int(m.shape[0])
            elif int(m.shape[0]) != V:
                return None
            mats.append(m)
        Tmax = max(int(m.shape[1]) for m in mats)
        Qp = _next_pow2(len(mats))
        if Qp * V * Tmax * 4 > self.STACKED_TABLE_MAX_BYTES:
            return None
        if Qp == 1 and int(mats[0].shape[1]) == Tmax:
            # single-query fast path: the [V, T] plan matrix IS the
            # gather table — no copy dispatch (the stack build cost
            # ~4.8 ms of a warm find() p50, LATENCY_r05)
            table = mats[0]
        else:
            mats = mats + [mats[0]] * (Qp - len(mats))
            table = _pad_stack(
                tuple(mats),
                tuple(Tmax - int(m.shape[1]) for m in mats),
                axis=0,
            ).reshape(Qp * V, Tmax)
        self._stack_memo = (
            {id(qp): i for i, qp in enumerate(qps)},
            list(qps),
            (table, V, Tmax, Qp),
        )
        return table, V, Tmax, Qp, list(range(len(qps)))

    def release_stack_memo(self):
        """Drop the stacked-table memo (frees up to STACKED_TABLE_MAX_BYTES
        of device memory pinned for within-batch reuse)."""
        self._stack_memo = None

    def _rescore_many_stacked(
        self,
        requests: List[dict],
        gaps: AffineGapParams,
        locality: str,
        doc_filter: Optional[DocFilterSpec],
        chunk: int,
        gap_costs=None,
    ):
        """Stacked fast path of :meth:`rescore_many` (static-only plans,
        affine or shared general gap model): ONE similarity+DP dispatch per
        touched bucket for the WHOLE request batch.  Returns None when the
        requests cannot stack (the caller falls back to the per-query
        path)."""
        live_qps = [r["qp"] for r in requests if len(r["slice_ids"])]
        stacked = self._stacked_plan_tables(live_qps)
        if stacked is None:
            return None
        table, V, Tmax, Qp, slot_of = stacked
        # request index -> stacked table slot (live requests only)
        slot = {}
        states = []
        pairs = []  # (request index, candidate position, slice id)
        for ri, req in enumerate(requests):
            slice_ids = list(req["slice_ids"])
            len_t = req["len_t"]
            k = len(slice_ids)
            st = {
                "k": k,
                "len_t": len_t,
                "want_flows": req.get("want_flows", True),
                "on_sims": req.get("on_sims"),
                "slice_ids": slice_ids,
                "mappings": [
                    np.full((len_t,), -1, np.int32) for _ in range(k)
                ],
                "edge_sims": [
                    np.zeros((len_t,), np.float32) for _ in range(k)
                ],
                "raw": np.full((k,), NEG_SCORE, np.float32),
            }
            states.append(st)
            if k == 0:
                continue
            slot[ri] = slot_of[len(slot)]
            sels = [
                self.filtered_positions(sid, doc_filter) for sid in slice_ids
            ]
            st["sels"] = sels
            for j, sid in enumerate(slice_ids):
                if len(sels[j]) > 0:
                    pairs.append((ri, j, sid))
        if not pairs:
            return [
                (st["mappings"], st["edge_sims"], st["raw"]) for st in states
            ]
        want_flows = any(
            st["want_flows"] for st in states if st["k"] > 0
        )
        any_tags = any(
            requests[ri].get("tag_weights") is not None for ri in slot
        )
        tw_list = [None] * Qp
        for ri, si in slot.items():
            tw_list[si] = requests[ri].get("tag_weights")
        tw_args = _stack_tw(tw_list, Qp, Tmax)
        by_bucket: Dict[int, list] = {}
        for ri, j, sid in pairs:
            bi = int(self._slice_loc[sid, 0])
            if bi < 0:
                raise KeyError(sid)
            by_bucket.setdefault(bi, []).append((ri, j, sid))
        refs: List = []
        groups = []
        gv_t_np = gap_vec(
            gap_costs[1] if gap_costs is not None else None, Tmax + 1
        )
        gv_t_d = jnp.asarray(gv_t_np)
        for bi, plist in by_bucket.items():
            db = self._device_buckets[bi]
            L = db["capacity"]
            gv_s_np = gap_vec(
                gap_costs[0] if gap_costs is not None else None, L + 1
            )
            gv_s_d = jnp.asarray(gv_s_np)
            for c0 in range(0, len(plist), chunk):
                pc = plist[c0 : c0 + chunk]
                g = len(pc)
                gp = _next_pow2(g)
                rows = np.zeros((gp,), np.int32)
                qix = np.zeros((gp,), np.int32)
                ln = np.ones((gp,), np.int32)
                lt = np.ones((gp,), np.int32)
                for k2, (ri, j, sid) in enumerate(pc):
                    rows[k2] = self._slice_loc[sid, 1]
                    qix[k2] = slot[ri]
                    ln[k2] = len(states[ri]["sels"][j])
                    lt[k2] = requests[ri]["len_t"]
                if doc_filter is not None:
                    sel_pad = np.zeros((gp, L), np.int32)
                    for k2, (ri, j, sid) in enumerate(pc):
                        s = states[ri]["sels"][j]
                        sel_pad[k2, : len(s)] = s
                else:
                    sel_pad = np.zeros((1, L), np.int32)
                if self._paged:
                    tok_in = jnp.asarray(db["tokens_np"][rows])
                    pos_in = jnp.asarray(db["pos_np"][rows])
                    rows_d = jnp.arange(gp, dtype=jnp.int32)
                else:
                    tok_in, pos_in = db["tokens"], db["pos"]
                    rows_d = jnp.asarray(rows)
                out = _stacked_rescore(
                    tok_in,
                    pos_in,
                    rows_d,
                    jnp.asarray(qix),
                    jnp.asarray(sel_pad),
                    table,
                    *tw_args,
                    jnp.asarray(ln),
                    jnp.asarray(lt),
                    gaps,
                    gv_s_d,
                    gv_t_d,
                    V=V,
                    locality=locality,
                    with_sel=doc_filter is not None,
                    want_flows=want_flows,
                    any_tags=any_tags,
                    general=gap_costs is not None,
                )
                grp = {"pairs": pc, "w_s": gv_s_np, "w_t": gv_t_np}
                if want_flows:
                    raw, H, Sw, Su = out
                    grp["r_raw"] = len(refs)
                    refs.append(raw)
                    grp["r_H"] = len(refs)
                    refs.append(H)
                    grp["r_Sw"] = len(refs)
                    refs.append(Sw)
                    grp["r_Su"] = len(refs)
                    refs.append(Su)
                else:
                    grp["r_raw"] = len(refs)
                    refs.append(out)
                groups.append(grp)

        fetched = jax.device_get(refs)

        for grp in groups:
            raw_np = np.asarray(fetched[grp["r_raw"]])
            H_np = Sw_np = Su_np = nat_maps = None
            if want_flows:
                H_np = np.asarray(fetched[grp["r_H"]])
                Sw_np = np.asarray(fetched[grp["r_Sw"]])
                Su_np = np.asarray(fetched[grp["r_Su"]])
                g = len(grp["pairs"])
                lens = np.asarray(
                    [len(states[ri]["sels"][j]) for ri, j, _ in grp["pairs"]],
                    np.int32,
                )
                lts = np.asarray(
                    [states[ri]["len_t"] for ri, _, _ in grp["pairs"]],
                    np.int32,
                )
                maps = batch_tracebacks(
                    H_np[:g], Sw_np[:g], lens, lts, gaps, locality,
                    w_s=grp["w_s"] if gap_costs is not None else None,
                    w_t=grp["w_t"] if gap_costs is not None else None,
                )
            for pos_i, (ri, j, sid) in enumerate(grp["pairs"]):
                st = states[ri]
                st["raw"][j] = raw_np[pos_i]
                if not st["want_flows"]:
                    continue
                sel = st["sels"][j]
                ln_j = len(sel)
                len_t = st["len_t"]
                S = Sw_np[pos_i]
                Su = Su_np[pos_i]
                if st["on_sims"] is not None:
                    st["on_sims"](sid, S[:ln_j, :len_t], Su[:ln_j, :len_t])
                mapping = maps[pos_i]
                sims = edge_sims_of(mapping, Su, len_t)
                mapping = np.where(
                    mapping >= 0, sel[np.maximum(mapping, 0)], -1
                )
                st["mappings"][j] = mapping.astype(np.int32)
                st["edge_sims"][j] = sims
        return [
            (st["mappings"], st["edge_sims"], st["raw"]) for st in states
        ]

    def _slice_tokens(self, slice_id: int):
        bi, r = self._slice_loc[slice_id]
        if bi < 0:
            raise KeyError(slice_id)
        db = self._device_buckets[bi]
        return db["tokens_np"][r], db["pos_np"][r]


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return max(p, 1)


def reference_score(total: float, matched: float, submatch_weight: float) -> float:
    """metric/alignment.h:84-106."""
    if total <= 0:
        return 1.0
    unmatched_weight = ((total - matched) / total) ** submatch_weight
    return matched + unmatched_weight * (total - matched)
