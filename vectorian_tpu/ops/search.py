"""Brute-force batched search: gather -> DP -> top-k.

TPU-native replacement for the reference's matcher loop
(MatcherImpl::match, vectorian/core/cpp/match/matcher_impl.h:66-176 +
ThreadPool fan-out index.py:530-560): per length bucket, a chunked jitted
pipeline gathers per-slice similarity windows from the (vocab x needle)
matrix, runs the batched alignment DP and emits raw scores for *all* slices;
top-k selection replaces the bounded min-heap (result_set.h:40-60).

Score normalization follows the reference exactly
(metric/alignment.h:84-106 + match.h:295-336):

    score = raw / reference_score * boost
    reference_score = matched + ((total-matched)/total)^w * (total-matched)

With the default submatch_weight w=0 the reference score equals ``total``
(= sum over query tokens of max_similarity_for_t) and is alignment
independent — computed fully on device.  For w>0 the device scores with the
optimistic lower bound of reference_score and the exact score is recomputed
during the traceback pass over an overfetched candidate set.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from vectorian_tpu.ops.alignment import (
    AffineGapParams,
    align_matrices,
    align_scores,
    traceback,
)

DEFAULT_CHUNK = 4096


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
    static_argnames=("locality", "chunk", "with_tags"),
)
def _bucket_scores(
    token_ids: jnp.ndarray,  # [N, L] i32 (N padded to chunk multiple)
    pos_ids: jnp.ndarray,  # [N, L] i8
    lengths: jnp.ndarray,  # [N] i32 (0 for padding rows)
    sim_vocab: jnp.ndarray,  # [V, T] f32
    len_t: jnp.ndarray,  # scalar i32
    gaps: AffineGapParams,
    boost: jnp.ndarray,  # [N] f32
    norm_total: jnp.ndarray,  # scalar f32
    tw_weights: jnp.ndarray,  # [T] f32 (unused unless with_tags)
    tw_pos_t: jnp.ndarray,  # [T] i8
    tw_penalty: jnp.ndarray,  # scalar f32
    tw_threshold: jnp.ndarray,  # scalar f32
    locality: str,
    chunk: int,
    with_tags: bool,
):
    """Normalized scores for every slice of one bucket: [N] f32."""
    N, L = token_ids.shape
    T = sim_vocab.shape[1]
    n_chunks = N // chunk

    lt_full = jnp.full((chunk,), len_t, jnp.int32)

    def one_chunk(args):
        tok, pos, ln = args  # [chunk, L], [chunk, L], [chunk]
        S = sim_vocab[tok]  # [chunk, L, T] gather from HBM-resident matrix
        if with_tags:
            S = _apply_tag_weights(S, pos, tw_weights, tw_pos_t, tw_penalty, tw_threshold)
        ln1 = jnp.maximum(ln, 1)
        raw = align_scores(S, ln1, lt_full, gaps, locality)
        return jnp.where(ln > 0, raw, NEG_SCORE)

    xs = (
        token_ids.reshape(n_chunks, chunk, L),
        pos_ids.reshape(n_chunks, chunk, L),
        lengths.reshape(n_chunks, chunk),
    )
    raw = jax.lax.map(one_chunk, xs).reshape(N)
    scores = raw / jnp.maximum(norm_total, 1e-9) * boost
    return jnp.where(raw <= NEG_SCORE * 0.5, NEG_SCORE, scores)


NEG_SCORE = -1e30


@dataclass
class Candidate:
    slice_id: int
    score: float
    raw_score: float
    mapping: Optional[np.ndarray] = None  # t index -> s offset in slice (or -1)


class BruteForceEngine:
    """Scores a PackedCorpus against a compiled query similarity matrix."""

    def __init__(self, packed, device=None):
        self._packed = packed
        self._device_buckets = []
        # slice id -> (bucket index, row) for O(1) rescore lookups
        self._slice_loc = np.full((packed.n_slices, 2), -1, np.int32)
        for bi, b in enumerate(packed.buckets):
            n = b.n
            chunk = min(DEFAULT_CHUNK, _next_pow2(n))
            pad = (-n) % chunk
            tok = np.pad(b.token_ids, ((0, pad), (0, 0)))
            pos = np.pad(b.pos_ids, ((0, pad), (0, 0)))
            ln = np.pad(b.lengths, (0, pad))
            self._slice_loc[b.slice_index, 0] = bi
            self._slice_loc[b.slice_index, 1] = np.arange(n, dtype=np.int32)
            self._device_buckets.append(
                {
                    "capacity": b.capacity,
                    "chunk": chunk,
                    "tokens": jnp.asarray(tok),
                    "pos": jnp.asarray(pos.astype(np.int8)),
                    "lengths": jnp.asarray(ln),
                    "slice_index": b.slice_index,
                    "n": n,
                }
            )

    @property
    def packed(self):
        return self._packed

    @property
    def n_slices(self):
        return self._packed.n_slices

    def score_all(
        self,
        sim_vocab,
        len_t: int,
        gaps: AffineGapParams,
        locality: str,
        norm_total: float,
        boost: Optional[np.ndarray] = None,  # [n_slices] f32
        tag_weights: Optional[TagWeightingSpec] = None,
    ) -> np.ndarray:
        """Normalized score for every slice in the corpus ([n_slices] f32)."""
        T = int(sim_vocab.shape[1])
        out = np.full((self._packed.n_slices,), NEG_SCORE, np.float32)
        zero_t = jnp.zeros((T,), jnp.float32)
        zero_t8 = jnp.zeros((T,), jnp.int8)
        for db in self._device_buckets:
            if db["n"] == 0:
                continue
            if boost is not None:
                bvec = np.ones((db["tokens"].shape[0],), np.float32)
                bvec[: db["n"]] = boost[db["slice_index"]]
                bvec = jnp.asarray(bvec)
            else:
                bvec = jnp.ones((db["tokens"].shape[0],), jnp.float32)
            if tag_weights is not None:
                tw_w = jnp.asarray(tag_weights.t_pos_weights, jnp.float32)
                tw_p = jnp.asarray(tag_weights.pos_t, jnp.int8)
                tw_pen = jnp.asarray(tag_weights.pos_mismatch_penalty, jnp.float32)
                tw_thr = jnp.asarray(tag_weights.similarity_threshold, jnp.float32)
            else:
                tw_w, tw_p = zero_t, zero_t8
                tw_pen = jnp.asarray(0.0, jnp.float32)
                tw_thr = jnp.asarray(0.0, jnp.float32)
            scores = _bucket_scores(
                db["tokens"],
                db["pos"],
                db["lengths"],
                jnp.asarray(sim_vocab),
                jnp.asarray(len_t, jnp.int32),
                gaps,
                bvec,
                jnp.asarray(norm_total, jnp.float32),
                tw_w,
                tw_p,
                tw_pen,
                tw_thr,
                locality=locality,
                chunk=db["chunk"],
                with_tags=tag_weights is not None,
            )
            out[db["slice_index"]] = np.asarray(scores[: db["n"]])
        return out

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
        if n == 0:
            return []
        k = min(k, n)
        # overfetch then exact sort for deterministic ties
        cand = np.argpartition(-scores, min(4 * k, n - 1))[: min(4 * k, n)]
        cand = cand[scores[cand] >= min_score]
        packed = self._packed
        order = np.lexsort(
            (packed.slice_idx[cand], packed.slice_doc[cand], -scores[cand].astype(np.float64))
        )
        return [int(c) for c in cand[order][:k]]

    def rescore_with_flows(
        self,
        slice_ids: List[int],
        sim_vocab,
        len_t: int,
        gaps: AffineGapParams,
        locality: str,
        tag_weights: Optional[TagWeightingSpec] = None,
    ) -> List[np.ndarray]:
        """Recompute DP matrices for the chosen slices and extract injective
        flows via host traceback (finalizer pass)."""
        packed = self._packed
        sim_np = np.asarray(sim_vocab)
        mappings = []
        for sid in slice_ids:
            ln = int(packed.slice_len[sid])
            # find the bucket row for this slice to get its tokens
            tok, pos = self._slice_tokens(sid)
            S = sim_np[tok[:ln]]  # [ln, T]
            if tag_weights is not None:
                w = tag_weights.t_pos_weights[None, :] * np.where(
                    pos[:ln, None] == tag_weights.pos_t[None, :],
                    1.0,
                    1.0 - tag_weights.pos_mismatch_penalty,
                )
                S = S * w
                S = np.where(S > tag_weights.similarity_threshold, S, 0.0)
            S = S[:, :len_t].astype(np.float32)
            H, E, F = (
                np.asarray(x)
                for x in align_matrices(S[None], gaps, locality)
            )
            mapping = traceback(H[0], S, ln, len_t, gaps, locality)
            mappings.append(mapping)
        return mappings

    def _slice_tokens(self, slice_id: int):
        bi, r = self._slice_loc[slice_id]
        if bi < 0:
            raise KeyError(slice_id)
        db = self._device_buckets[bi]
        return np.asarray(db["tokens"][r]), np.asarray(db["pos"][r])


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
