"""Multi-chip data-parallel search over a jax.sharding.Mesh.

The reference scales with a document-level ThreadPool on one shared-memory
node (vectorian/index.py:514-560).  The TPU-native scale-out shards the
packed slice arrays over the mesh's 'data' axis: each chip gathers and
aligns its shard of slices against the replicated (vocab x needle)
similarity matrix, computes a local top-k, and the global top-k merge rides
the ICI via XLA's inserted collectives (SURVEY.md §2.4) — the
`ResultSet.extend` merge (result_set.h:70-93) becomes one all-gather of
(score, slice-id) pairs.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vectorian_tpu.ops.alignment import AffineGapParams, align_scores


def make_mesh(devices=None, axis: str = "data") -> Mesh:
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def _merge_local_topk(scores, axis, shard_n, n_dev, k, with_next):
    """Shared per-shard top-k + all-gather merge (runs INSIDE a shard_map
    shard function).  ``scores``: [c, Q] this shard's per-slice scores.
    Returns ([Q, kout] scores, [Q, kout] global indices[, [Q] next_best])
    with kout = min(k, n_dev * min(k, shard_n)); ``next_best`` upper-bounds
    every score outside the returned set (beyond-local-k and merge-cut)."""
    Q = scores.shape[1]
    ks = min(k, shard_n)  # per-shard contribution
    kout = min(k, n_dev * ks)  # merged result width
    kf = min(ks + 1, shard_n) if with_next else ks
    loc_s, loc_i = jax.lax.top_k(scores.T, kf)  # [Q, kf] per query
    shard_next = None
    if with_next:
        if kf > ks:
            shard_next = loc_s[:, ks]  # [Q]
        else:  # the shard is fully contributed — nothing outside
            shard_next = jnp.full((Q,), -jnp.inf, loc_s.dtype)
        loc_s, loc_i = loc_s[:, :ks], loc_i[:, :ks]
    my = jax.lax.axis_index(axis)
    glob_i = loc_i + my * shard_n
    all_s = jax.lax.all_gather(loc_s, axis)  # [d, Q, ks]
    all_i = jax.lax.all_gather(glob_i, axis)
    all_s = jnp.moveaxis(all_s, 0, 1).reshape(Q, n_dev * ks)
    all_i = jnp.moveaxis(all_i, 0, 1).reshape(Q, n_dev * ks)
    if with_next:
        # best score outside the merged set: either beyond some shard's
        # local ks, or gathered but cut by the global merge
        kk2 = min(kout + 1, n_dev * ks)
        top_s1, sel1 = jax.lax.top_k(all_s, kk2)
        top_s = top_s1[:, :kout]
        top_i = jnp.take_along_axis(all_i, sel1[:, :kout], axis=1)
        merge_next = (
            top_s1[:, kout]
            if kk2 > kout
            else jnp.full((Q,), -jnp.inf, top_s1.dtype)
        )
        next_best = jnp.maximum(
            jnp.max(jax.lax.all_gather(shard_next, axis), axis=0),
            merge_next,
        )
        return top_s, top_i, next_best
    top_s, sel = jax.lax.top_k(all_s, kout)  # [Q, kout]
    top_i = jnp.take_along_axis(all_i, sel, axis=1)
    return top_s, top_i


class MeshSearch:
    """Data-parallel bucket scoring + global top-k over a device mesh."""

    def __init__(self, mesh: Optional[Mesh] = None):
        self._mesh = mesh if mesh is not None else make_mesh()
        axis = self._mesh.axis_names[0]
        self._sharded = NamedSharding(self._mesh, P(axis))
        self._replicated = NamedSharding(self._mesh, P())

    @property
    def mesh(self) -> Mesh:
        return self._mesh

    @property
    def n_devices(self) -> int:
        return int(np.prod(self._mesh.devices.shape))

    def shard_bucket(self, token_ids: np.ndarray, lengths: np.ndarray):
        """Place padded bucket arrays sharded along the slice axis.
        Rows must be padded to a multiple of the mesh size."""
        n = token_ids.shape[0]
        pad = (-n) % self.n_devices
        tok = np.pad(token_ids, ((0, pad), (0, 0)))
        ln = np.pad(lengths, (0, pad))
        return (
            jax.device_put(tok, self._sharded),
            jax.device_put(ln, self._sharded),
        )

    def put_replicated(self, x):
        return jax.device_put(np.asarray(x), self._replicated)

    @functools.partial(jax.jit, static_argnames=("self", "locality", "k"))
    def score_topk_shardmap(
        self,
        token_ids: jnp.ndarray,  # [N, L] sharded over 'data'
        lengths: jnp.ndarray,  # [N] sharded
        sim_vocab: jnp.ndarray,  # [V, T] replicated
        len_t: jnp.ndarray,
        gaps: AffineGapParams,
        norm_total: jnp.ndarray,
        locality: str = "local",
        k: int = 10,
    ):
        """Explicit-collective variant: each shard computes its local top-k,
        one all_gather of (score, global-index) pairs rides the ICI, and the
        final merge runs replicated — communication is O(devices * k)
        instead of O(N) (the ResultSet.extend merge, result_set.h:70-93,
        as a collective)."""
        try:
            from jax import shard_map
        except ImportError:  # older jax
            from jax.experimental.shard_map import shard_map

        axis = self._mesh.axis_names[0]
        n_dev = self.n_devices
        shard_n = token_ids.shape[0] // n_dev

        def shard_fn(tok, ln):
            # tok: [N/d, L] local shard
            S = sim_vocab[tok]
            lt = jnp.full((tok.shape[0],), len_t, jnp.int32)
            raw = align_scores(S, jnp.maximum(ln, 1), lt, gaps, locality)
            scores = jnp.where(
                ln > 0, raw / jnp.maximum(norm_total, 1e-9), -jnp.inf
            )
            loc_s, loc_i = jax.lax.top_k(scores, k)
            my = jax.lax.axis_index(axis)
            glob_i = loc_i + my * shard_n
            all_s = jax.lax.all_gather(loc_s, axis)  # [d, k]
            all_i = jax.lax.all_gather(glob_i, axis)
            top_s, sel = jax.lax.top_k(all_s.reshape(-1), k)
            return top_s, all_i.reshape(-1)[sel]

        fn = shard_map(
            shard_fn,
            mesh=self._mesh,
            in_specs=(P(axis), P(axis)),
            out_specs=(P(), P()),
            check_vma=False,
        )
        return fn(token_ids, lengths)

    @functools.partial(
        jax.jit,
        static_argnames=(
            "self", "locality", "k", "use_pallas", "with_next", "with_tags",
            "general_gaps", "with_boost", "with_filter",
        ),
    )
    def score_topk_multiquery(
        self,
        token_ids: jnp.ndarray,  # [N, L] sharded over 'data'
        lengths: jnp.ndarray,  # [N] sharded
        sim_multi: jnp.ndarray,  # [V, T, Q] replicated (kernel-native layout)
        len_t: jnp.ndarray,  # [Q]
        gaps: AffineGapParams,
        norm_total: jnp.ndarray,  # [Q]
        locality: str = "local",
        k: int = 10,
        use_pallas: bool = False,
        sim_scale=1.0,  # traced f32: table in quantized units (int8/bf16)
        with_next: bool = False,
        pos_ids: Optional[jnp.ndarray] = None,  # [N, L] i8 sharded (tags)
        tag_ids: Optional[jnp.ndarray] = None,  # [N, L] i16 sharded (filter)
        tw_args=None,  # ([T,Q] w, [T,Q] pos_t, [Q] penalty, [Q] threshold)
        gap_vecs=None,  # ([L+1], [T+1]) replicated general gap-cost vectors
        boost: Optional[jnp.ndarray] = None,  # [N, Q] f32 sharded per-slice
        flt_args=None,  # ([n_pos], [n_tags], [V]) bool exclusion masks
        with_tags: bool = False,
        general_gaps: bool = False,
        with_boost: bool = False,
        with_filter: bool = False,
    ):
        """Serving-batch scale-out: Q queries share each shard's vocab
        gather; per-query local top-min(k, shard_n), then one all_gather of
        the per-shard candidates — communication is O(devices * Q * k).
        Returns ([Q, kout] scores, [Q, kout] indices) with
        kout = min(k, devices * min(k, shard_n)) — so a k >= the bucket's
        total rows returns EVERY slice — plus a [Q] ``next_best`` bound
        when ``with_next``.

        ``sim_multi`` may be an int8/bf16 quantized table with
        ``sim_scale`` its unit (see ops/search score_all_multi): max-plus
        homogeneity runs the quantized units through the unchanged DP —
        gap params scaled in, raw scores scaled out.  Quantized ranking
        callers MUST overfetch (k > n) with ``with_next=True``:
        ``next_best[q]`` upper-bounds every score outside the returned
        set, so after exact f32 rescoring of the k candidates the cut is
        provably safe iff ``next_best < exact_nth - eps`` (the mesh
        analogue of BruteForceIndex._finalize_quantized's loop; re-query
        with larger k otherwise).

        ``with_tags``: per-query tag-weighted similarity (TagWeightedSlice
        semantics) from the sharded ``pos_ids`` and replicated ``tw_args``.
        ``general_gaps``: WSB DP with the replicated ``gap_vecs`` cost
        vectors instead of the affine recurrence.  ``with_boost``: per-slice
        boost multipliers, sharded like ``lengths``.  ``with_filter``:
        document-side token exclusion (``flt_args`` masks over the sharded
        ``pos_ids``/``tag_ids``/token ids), compacted in-shard like the
        single-chip batch kernel."""
        try:
            from jax import shard_map
        except ImportError:  # older jax
            from jax.experimental.shard_map import shard_map

        from vectorian_tpu.ops.alignment import align_scores_general
        from vectorian_tpu.ops.search import _compact_slices

        axis = self._mesh.axis_names[0]
        n_dev = self.n_devices
        shard_n = token_ids.shape[0] // n_dev
        T, Q = sim_multi.shape[1], sim_multi.shape[2]
        gaps_q = AffineGapParams(
            *(jnp.asarray(g, jnp.float32) / sim_scale for g in gaps)
        )
        if general_gaps:
            gv_s = jnp.asarray(gap_vecs[0], jnp.float32) / sim_scale
            gv_t = jnp.asarray(gap_vecs[1], jnp.float32) / sim_scale
        if with_tags:
            tw_w, tw_p, tw_pen, tw_thr = tw_args
        if with_filter:
            flt_pos, flt_tag, flt_tok = flt_args

        def shard_fn(tok, ln, pos, tag, bst):
            c, L = tok.shape
            S = sim_multi[tok.T]  # [L, c, T, Q] gather-native
            if not use_pallas or with_tags or general_gaps:
                S = S.astype(jnp.float32)
            posT = pos.T
            if with_filter:
                perm, ln, _ = _compact_slices(
                    tok, pos, tag, ln, flt_pos, flt_tag, flt_tok
                )
                permT = perm.T  # [L, c]
                S = jnp.take_along_axis(S, permT[:, :, None, None], axis=0)
                posT = jnp.take_along_axis(posT, permT, axis=0)
            if with_tags:
                w = tw_w[None, None, :, :] * jnp.where(
                    posT[:, :, None, None] == tw_p[None, None, :, :],
                    1.0,
                    1.0 - tw_pen[None, None, None, :],
                )
                Sw = S * w
                S = jnp.where(Sw > tw_thr[None, None, None, :], Sw, 0.0)
            if use_pallas and not general_gaps:
                from vectorian_tpu.ops.pallas_dp import (
                    pallas_align_scores_multi_nt,
                )

                raw = pallas_align_scores_multi_nt(
                    S, jnp.maximum(ln, 1), len_t, gaps_q, locality
                )  # [c, Q]
            else:
                S2 = jnp.transpose(S, (1, 3, 0, 2)).reshape(c * Q, L, T)
                ln_rep = jnp.repeat(jnp.maximum(ln, 1), Q)
                lt_rep = jnp.tile(len_t, c)
                if general_gaps:
                    raw = align_scores_general(
                        S2, ln_rep, lt_rep, gv_s, gv_t, locality
                    ).reshape(c, Q)
                else:
                    raw = align_scores(
                        S2, ln_rep, lt_rep, gaps_q, locality
                    ).reshape(c, Q)
            raw = raw * sim_scale  # back from quantized units (no-op at 1.0)
            scores = raw / jnp.maximum(norm_total[None, :], 1e-9)
            if with_boost:
                scores = scores * bst
            scores = jnp.where(ln[:, None] > 0, scores, -jnp.inf)
            return _merge_local_topk(
                scores, axis, shard_n, n_dev, k, with_next
            )

        if pos_ids is None:
            pos_ids = jnp.zeros(token_ids.shape, jnp.int8)
        if tag_ids is None:
            tag_ids = jnp.zeros(token_ids.shape, jnp.int16)
        if boost is None:
            boost = jnp.ones((token_ids.shape[0], Q), jnp.float32)
        out_specs = (P(), P(), P()) if with_next else (P(), P())
        fn = shard_map(
            shard_fn,
            mesh=self._mesh,
            in_specs=(P(axis), P(axis), P(axis), P(axis), P(axis)),
            out_specs=out_specs,
            check_vma=False,
        )
        return fn(token_ids, lengths, pos_ids, tag_ids, boost)

    @functools.partial(
        jax.jit,
        static_argnames=(
            "self", "injective", "symmetric", "normalize_bow", "k",
            "with_next", "with_tags", "with_filter", "with_boost",
        ),
    )
    def rwmd_topk_multiquery(
        self,
        token_ids: jnp.ndarray,  # [N, L] sharded over 'data'
        lengths: jnp.ndarray,  # [N] sharded
        sim_multi: jnp.ndarray,  # [V, T, Q] replicated
        mass_t: jnp.ndarray,  # [T, Q] per-query deduped masses (0-padded)
        len_t: jnp.ndarray,  # [Q] i32 real token counts
        injective: bool,
        symmetric: bool,
        normalize_bow: bool,
        k: int = 10,
        with_next: bool = False,
        max_score_t=None,  # [Q] f32 max_sum_of_similarities (replicated)
        pos_ids=None,  # [N, L] i8 sharded (tags/filter)
        tag_ids=None,  # [N, L] i16 sharded
        boost=None,  # [N, Q] f32 sharded per-slice boosts
        tw_args=None,  # ([T, Q] w, [T, Q] pos, [Q] pen, [Q] thr) replicated
        df_args=None,  # (pos_ex, tag_ex, tok_ex) replicated
        with_tags: bool = False,
        with_filter: bool = False,
        with_boost: bool = False,
    ):
        """Relaxed-WMD serving batch over the mesh: each shard gathers its
        slices' similarity rows, runs the greedy transport fill
        (ops/wmd._rwmd_chunk_scores_multi — the SAME function the
        single-chip batch maps over chunks, so the two paths stay
        byte-equal), and the per-query top-k merges over one all-gather.
        Tag weighting, doc filters and per-slice boosts ride in-shard."""
        try:
            from jax import shard_map
        except ImportError:  # older jax
            from jax.experimental.shard_map import shard_map

        from vectorian_tpu.ops.wmd import (
            NEG_SCORE,
            _rwmd_chunk_scores_multi,
        )

        axis = self._mesh.axis_names[0]
        n_dev = self.n_devices
        shard_n = token_ids.shape[0] // n_dev
        Q = sim_multi.shape[2]
        if max_score_t is None:
            max_score_t = len_t.astype(jnp.float32)
        if pos_ids is None:
            pos_ids = jnp.zeros(token_ids.shape, jnp.int8)
        if tag_ids is None:
            tag_ids = jnp.zeros(token_ids.shape, jnp.int16)
        if boost is None:
            boost = jnp.ones((token_ids.shape[0], Q), jnp.float32)
        if tw_args is None:
            T = sim_multi.shape[1]
            tw_args = (
                jnp.ones((T, Q), jnp.float32),
                jnp.full((T, Q), -1, jnp.int8),
                jnp.zeros((Q,), jnp.float32),
                jnp.full((Q,), -1.0, jnp.float32),
            )
        if df_args is None:
            z = jnp.zeros((1,), bool)
            df_args = (z, z, z)

        def shard_fn(tok, ln, pos, tag, bst):
            scores = _rwmd_chunk_scores_multi(
                tok.T, ln, pos.T, tag.T, sim_multi, mass_t, len_t,
                max_score_t, *tw_args, *df_args,
                injective, symmetric, normalize_bow, with_tags,
                with_filter,
            )
            if with_boost:
                scores = jnp.where(
                    scores > NEG_SCORE * 0.5, scores * bst, NEG_SCORE
                )
            return _merge_local_topk(
                scores, axis, shard_n, n_dev, k, with_next
            )

        out_specs = (P(), P(), P()) if with_next else (P(), P())
        fn = shard_map(
            shard_fn,
            mesh=self._mesh,
            in_specs=(P(axis), P(axis), P(axis), P(axis), P(axis)),
            out_specs=out_specs,
            check_vma=False,
        )
        return fn(token_ids, lengths, pos_ids, tag_ids, boost)

    @functools.partial(
        jax.jit,
        static_argnames=(
            "self", "use_magnitudes", "normalize_mass", "k", "chunk",
            "with_next", "with_tags", "with_filter", "with_boost",
        ),
    )
    def emd_topk_multiquery(
        self,
        token_ids: jnp.ndarray,  # [N, L] sharded over 'data'
        lengths: jnp.ndarray,  # [N] sharded
        sim_multi: jnp.ndarray,  # [V, T, Q] replicated
        mags_vocab: jnp.ndarray,  # [V] replicated (WRD masses)
        mass_t: jnp.ndarray,  # [T, Q] per-query masses
        use_magnitudes: bool,
        normalize_mass: bool,
        k: int = 10,
        chunk: int = 64,  # greedy fill holds [chunk*Q, ., .]; divides N/d
        with_next: bool = False,
        pos_ids=None,  # [N, L] i8 sharded (tags/filter)
        tag_ids=None,  # [N, L] i16 sharded
        boost=None,  # [N, Q] f32 sharded per-slice boosts
        tw_args=None,  # ([T, Q] w, [T, Q] pos, [Q] pen, [Q] thr) replicated
        df_args=None,  # (pos_ex, tag_ex, tok_ex) replicated
        with_tags: bool = False,
        with_filter: bool = False,
        with_boost: bool = False,
    ):
        """Full-WMD / WRD serving batch over the mesh: each shard ranks its
        slices with the PROVABLE exact-score upper bound (_emd_score_bound,
        in ``chunk``-sized pieces), local top-k, one all-gather merge (the
        transport analogue of score_topk_multiquery).  ``next_best`` (when
        ``with_next``) upper-bounds every slice outside the returned set,
        so the caller's exact host EMD rescore can prove its cut — full
        wmd.h:194-270 exhaustive-exact semantics without solving every
        slice.  Tag weighting / doc filters / boosts ride in-shard (boosted
        bounds stay provable: bound*b >= exact*b for b >= 0)."""
        try:
            from jax import shard_map
        except ImportError:  # older jax
            from jax.experimental.shard_map import shard_map

        from vectorian_tpu.ops.wmd import NEG_SCORE, _emd_chunk_scores_multi

        axis = self._mesh.axis_names[0]
        n_dev = self.n_devices
        shard_n = token_ids.shape[0] // n_dev
        assert shard_n % chunk == 0, (shard_n, chunk)
        Q = sim_multi.shape[2]
        if pos_ids is None:
            pos_ids = jnp.zeros(token_ids.shape, jnp.int8)
        if tag_ids is None:
            tag_ids = jnp.zeros(token_ids.shape, jnp.int16)
        if boost is None:
            boost = jnp.ones((token_ids.shape[0], Q), jnp.float32)
        if tw_args is None:
            T = sim_multi.shape[1]
            tw_args = (
                jnp.ones((T, Q), jnp.float32),
                jnp.full((T, Q), -1, jnp.int8),
                jnp.zeros((Q,), jnp.float32),
                jnp.full((Q,), -1.0, jnp.float32),
            )
        if df_args is None:
            z = jnp.zeros((1,), bool)
            df_args = (z, z, z)

        def shard_fn(tok, ln, pos, tag, bst):
            sn, L = tok.shape
            n_chunks = sn // chunk

            def one_chunk(args):
                tok_c, ln_c, pos_c, tag_c = args  # [chunk, L], [chunk], ...
                return _emd_chunk_scores_multi(
                    tok_c.T, ln_c, pos_c.T, tag_c.T, sim_multi, mags_vocab,
                    mass_t, *tw_args, *df_args,
                    use_magnitudes, normalize_mass, with_tags, with_filter,
                )

            xs = (tok.reshape(n_chunks, chunk, L),
                  ln.reshape(n_chunks, chunk),
                  pos.reshape(n_chunks, chunk, L),
                  tag.reshape(n_chunks, chunk, L))
            scores = jax.lax.map(one_chunk, xs).reshape(sn, Q)
            if with_boost:
                scores = jnp.where(
                    scores > NEG_SCORE * 0.5, scores * bst, NEG_SCORE
                )
            return _merge_local_topk(
                scores, axis, shard_n, n_dev, k, with_next
            )

        out_specs = (P(), P(), P()) if with_next else (P(), P())
        fn = shard_map(
            shard_fn,
            mesh=self._mesh,
            in_specs=(P(axis), P(axis), P(axis), P(axis), P(axis)),
            out_specs=out_specs,
            check_vma=False,
        )
        return fn(token_ids, lengths, pos_ids, tag_ids, boost)

    @functools.partial(
        jax.jit,
        static_argnames=(
            "self", "plan", "relaxed", "injective", "symmetric",
            "normalize_bow", "use_magnitudes", "normalize_mass", "k",
            "chunk", "with_next", "unique_masses", "with_tags",
            "with_filter", "with_boost",
        ),
    )
    def plan_transport_topk_multiquery(
        self,
        plan: tuple,
        token_ids: jnp.ndarray,  # [N, L] sharded over 'data'
        lengths: jnp.ndarray,  # [N] sharded
        ctx_stores: tuple,  # k -> [N, L, d] sharded bucket stores
        static_sims: tuple,  # k -> [V, T*Q] replicated stacked tables
        static_mags: tuple,
        ctx_queries: tuple,  # k -> dict of [T*Q, ...] replicated
        mixed_weights: tuple,
        mass_t: jnp.ndarray,  # [T, Q] per-query masses (replicated)
        len_t: jnp.ndarray,  # [Q] i32 real token counts
        max_score_t: jnp.ndarray,  # [Q] f32 (relaxed bow mode only)
        relaxed: bool,
        injective: bool = False,
        symmetric: bool = False,
        normalize_bow: bool = True,
        use_magnitudes: bool = False,
        normalize_mass: bool = True,
        k: int = 10,
        chunk: int = 64,  # transport fills hold [chunk*Q, ., .]; divides N/d
        with_next: bool = False,
        pos_ids=None,  # [N, L] i8 sharded (tags/filter)
        tag_ids=None,  # [N, L] i16 sharded
        boost=None,  # [N, Q] f32 sharded per-slice boosts
        tw_args=None,  # ([T, Q] w, [T, Q] pos, [Q] pen, [Q] thr) replicated
        df_args=None,  # (pos_ex, tag_ex, tok_ex) replicated
        unique_masses: bool = True,
        with_tags: bool = False,
        with_filter: bool = False,
        with_boost: bool = False,
    ):
        """Contextual / mixed-tree TRANSPORT serving batch over the mesh:
        each shard evaluates the stacked-leaf plan (the SAME
        eval_plan_chunk the single-chip plan-stacked transport kernels
        run), feeds the [L, c, T, Q] similarity into the shared transport
        chunk tails (_rwmd_chunk_scores_multi / _emd_chunk_scores_multi
        with position-unique BOW masses), and merges per-query top-k over
        one all-gather.  ``relaxed`` selects the greedy-fill ranking;
        otherwise the provable exact-EMD score bound ranks (WRD doc-side
        masses come from eval_plan_chunk's per-position magnitudes —
        byte-equal ranking to the single-chip batch)."""
        try:
            from jax import shard_map
        except ImportError:  # older jax
            from jax.experimental.shard_map import shard_map

        from vectorian_tpu.ops.simmatrix import eval_plan_chunk
        from vectorian_tpu.ops.wmd import (
            NEG_SCORE,
            _emd_chunk_scores_multi,
            _rwmd_chunk_scores_multi,
        )

        axis = self._mesh.axis_names[0]
        n_dev = self.n_devices
        shard_n = token_ids.shape[0] // n_dev
        assert shard_n % chunk == 0, (shard_n, chunk)
        L = token_ids.shape[1]
        Q = int(len_t.shape[0])
        if pos_ids is None:
            pos_ids = jnp.zeros(token_ids.shape, jnp.int8)
        if tag_ids is None:
            tag_ids = jnp.zeros(token_ids.shape, jnp.int16)
        if boost is None:
            boost = jnp.ones((token_ids.shape[0], Q), jnp.float32)
        if tw_args is None:
            T = mass_t.shape[0]
            tw_args = (
                jnp.ones((T, Q), jnp.float32),
                jnp.full((T, Q), -1, jnp.int8),
                jnp.zeros((Q,), jnp.float32),
                jnp.full((Q,), -1.0, jnp.float32),
            )
        if df_args is None:
            z = jnp.zeros((1,), bool)
            df_args = (z, z, z)

        def shard_fn(tok, ln, pos, tag, bst, *ctx):
            sn = tok.shape[0]
            n_chunks = sn // chunk

            def one_chunk(args):
                tok_c, ln_c, pos_c, tag_c, ctx_c = args
                out = eval_plan_chunk(
                    plan, tok_c, static_sims, static_mags, ctx_c,
                    ctx_queries, mixed_weights,
                    needs_magnitudes=use_magnitudes,
                )
                S = out["similarity"]  # [chunk, L, T*Q]
                T = S.shape[-1] // Q
                S = jnp.transpose(
                    S.reshape(chunk, L, T, Q), (1, 0, 2, 3)
                )  # [L, chunk, T, Q]
                if relaxed:
                    return _rwmd_chunk_scores_multi(
                        tok_c.T, ln_c, pos_c.T, tag_c.T, None, mass_t,
                        len_t, max_score_t, *tw_args, *df_args,
                        injective, symmetric, normalize_bow, with_tags,
                        with_filter, S=S, unique=unique_masses,
                    )
                return _emd_chunk_scores_multi(
                    tok_c.T, ln_c, pos_c.T, tag_c.T, None,
                    jnp.zeros((1,), jnp.float32), mass_t,
                    *tw_args, *df_args,
                    use_magnitudes, normalize_mass, with_tags, with_filter,
                    S=S, unique=unique_masses,
                    mags_s=out.get("magnitudes_s"),
                )

            xs = (
                tok.reshape(n_chunks, chunk, L),
                ln.reshape(n_chunks, chunk),
                pos.reshape(n_chunks, chunk, -1),
                tag.reshape(n_chunks, chunk, -1),
                tuple(
                    c.reshape(n_chunks, chunk, L, c.shape[-1]) for c in ctx
                ),
            )
            scores = jax.lax.map(one_chunk, xs).reshape(sn, Q)
            if with_boost:
                scores = jnp.where(
                    scores > NEG_SCORE * 0.5, scores * bst, NEG_SCORE
                )
            return _merge_local_topk(
                scores, axis, shard_n, n_dev, k, with_next
            )

        n_ctx = len(ctx_stores)
        out_specs = (P(), P(), P()) if with_next else (P(), P())
        fn = shard_map(
            shard_fn,
            mesh=self._mesh,
            in_specs=(P(axis),) * 5 + (P(axis),) * n_ctx,
            out_specs=out_specs,
            check_vma=False,
        )
        return fn(token_ids, lengths, pos_ids, tag_ids, boost, *ctx_stores)

    @functools.partial(
        jax.jit,
        static_argnames=(
            "self", "plan", "locality", "k", "with_next", "general_gaps",
            "with_boost", "with_filter", "with_tags",
        ),
    )
    def tree_score_topk_multiquery(
        self,
        plan: tuple,
        token_ids: jnp.ndarray,  # [N, L] sharded over 'data'
        lengths: jnp.ndarray,  # [N] sharded
        ctx_stores: tuple,  # k -> [N, L, d] sharded bucket stores
        static_sims: tuple,  # k -> [V, T*Q] replicated stacked tables
        static_mags: tuple,
        ctx_queries: tuple,  # k -> dict of [T*Q, ...] replicated
        mixed_weights: tuple,
        len_t: jnp.ndarray,  # [Q]
        gaps: AffineGapParams,
        norm_total: jnp.ndarray,  # [Q]
        locality: str = "local",
        k: int = 10,
        with_next: bool = False,
        gap_vecs=None,  # ([L+1], [T+1]) replicated (general gaps)
        general_gaps: bool = False,
        boost=None,  # [N, Q] f32 sharded per-slice boosts
        with_boost: bool = False,
        pos_ids=None,  # [N, L] i8 sharded (tags/doc filters only)
        tag_ids=None,  # [N, L] i16 sharded
        flt_args=None,  # (pos_ex, tag_ex, tok_ex) bool masks, replicated
        with_filter: bool = False,
        tw_args=None,  # ([T, Q] w, [T, Q] pos, [Q] pen, [Q] thr) replicated
        with_tags: bool = False,
    ):
        """Mixed static+contextual modifier-tree serving batch over the
        mesh: each shard evaluates the SAME stacked-leaf tree as the
        single-chip kernel (ops/search._bucket_scores_multiquery_tree —
        static gathers of the [V, T*Q] tables + GEMMs against the [T*Q, d]
        contextual matrices, modifier ops elementwise), runs the multi DP,
        and merges per-query top-k over one all-gather.  Doc filters
        compact the post-eval similarity rows in-shard; per-query tag
        weighting applies to the combined tree similarity in-shard too."""
        try:
            from jax import shard_map
        except ImportError:  # older jax
            from jax.experimental.shard_map import shard_map

        from vectorian_tpu.ops.alignment import align_scores_general
        from vectorian_tpu.ops.search import _compact_slices
        from vectorian_tpu.ops.simmatrix import eval_plan_chunk

        axis = self._mesh.axis_names[0]
        n_dev = self.n_devices
        shard_n = token_ids.shape[0] // n_dev
        L = token_ids.shape[1]
        Q = int(len_t.shape[0])
        if general_gaps:
            gv_s = jnp.asarray(gap_vecs[0], jnp.float32)
            gv_t = jnp.asarray(gap_vecs[1], jnp.float32)

        if boost is None:
            boost = jnp.ones((token_ids.shape[0], Q), jnp.float32)
        if not (with_filter or with_tags):
            pos_ids = jnp.zeros((token_ids.shape[0], 1), jnp.int8)
            tag_ids = jnp.zeros((token_ids.shape[0], 1), jnp.int16)
        if not with_filter:
            flt_args = (jnp.zeros((1,), bool),) * 3
        if tw_args is None:
            tw_args = (
                jnp.ones((1, Q), jnp.float32),
                jnp.full((1, Q), -1, jnp.int8),
                jnp.zeros((Q,), jnp.float32),
                jnp.full((Q,), -1.0, jnp.float32),
            )
        tw_w, tw_p, tw_pen, tw_thr = tw_args

        def shard_fn(tok, ln, bst, pos, tag, *ctx):
            c = tok.shape[0]
            S = eval_plan_chunk(
                plan, tok, static_sims, static_mags, ctx, ctx_queries,
                mixed_weights,
            )["similarity"]  # [c, L, T*Q]
            T = S.shape[-1] // Q
            S = S.reshape(c, L, T, Q)
            if with_filter:
                perm, ln, _ = _compact_slices(tok, pos, tag, ln, *flt_args)
                S = jnp.take_along_axis(S, perm[:, :, None, None], axis=1)
                pos = jnp.take_along_axis(pos, perm, axis=1)
            if with_tags:
                # same arithmetic as _bucket_scores_multiquery_tree
                w = tw_w[None, None, :, :] * jnp.where(
                    pos[:, :, None, None] == tw_p[None, None, :, :],
                    1.0,
                    1.0 - tw_pen[None, None, None, :],
                )
                Sw = S * w
                S = jnp.where(Sw > tw_thr[None, None, None, :], Sw, 0.0)
            S2 = jnp.transpose(S, (0, 3, 1, 2)).reshape(c * Q, L, T)
            ln_rep = jnp.repeat(jnp.maximum(ln, 1), Q)
            lt_rep = jnp.tile(len_t, c)
            if general_gaps:
                raw = align_scores_general(
                    S2, ln_rep, lt_rep, gv_s, gv_t, locality
                ).reshape(c, Q)
            else:
                raw = align_scores(
                    S2, ln_rep, lt_rep, gaps, locality
                ).reshape(c, Q)
            scores = raw / jnp.maximum(norm_total[None, :], 1e-9)
            if with_boost:
                scores = scores * bst
            scores = jnp.where(ln[:, None] > 0, scores, -jnp.inf)
            return _merge_local_topk(
                scores, axis, shard_n, n_dev, k, with_next
            )

        n_ctx = len(ctx_stores)
        out_specs = (P(), P(), P()) if with_next else (P(), P())
        fn = shard_map(
            shard_fn,
            mesh=self._mesh,
            in_specs=(P(axis),) * 5 + (P(axis),) * n_ctx,
            out_specs=out_specs,
            check_vma=False,
        )
        return fn(token_ids, lengths, boost, pos_ids, tag_ids, *ctx_stores)

    @functools.partial(
        jax.jit,
        static_argnames=(
            "self", "metric", "locality", "k", "with_next", "general_gaps",
            "with_boost", "with_filter",
        ),
    )
    def ctx_score_topk_multiquery(
        self,
        ctx_store: jnp.ndarray,  # [N, L, d] sharded over 'data' (bf16 ok)
        lengths: jnp.ndarray,  # [N] sharded
        q_norm: jnp.ndarray,  # [T*Q, d] replicated stacked query vectors
        q_unmod: jnp.ndarray,  # [T*Q, d] replicated
        q_mags: jnp.ndarray,  # [T*Q] replicated
        len_t: jnp.ndarray,  # [Q]
        gaps: AffineGapParams,
        norm_total: jnp.ndarray,  # [Q]
        metric,
        locality: str = "local",
        k: int = 10,
        with_next: bool = False,
        gap_vecs=None,  # ([L+1], [T+1]) replicated (general gaps)
        general_gaps: bool = False,
        boost=None,  # [N, Q] f32 sharded per-slice boosts
        with_boost: bool = False,
        token_ids=None,  # [N, L] i32 sharded (doc filters only)
        pos_ids=None,  # [N, L] i8 sharded
        tag_ids=None,  # [N, L] i16 sharded
        flt_args=None,  # (pos_ex, tag_ex, tok_ex) bool masks, replicated
        with_filter: bool = False,
    ):
        """Contextual serving batch over the mesh: each shard computes its
        slices' similarity blocks with ONE GEMM against the stacked query
        matrix (the sharded analogue of _bucket_scores_multiquery_ctx),
        runs the DP, and merges per-query top-k over one all-gather.
        Per-slice boosts multiply the ranking scores in-shard (same f32
        multiply as the exact rescore applies host-side).
        Covers BASELINE's mixed-contextual multi-chip configuration."""
        try:
            from jax import shard_map
        except ImportError:  # older jax
            from jax.experimental.shard_map import shard_map

        from vectorian_tpu.ops.alignment import align_scores_general
        from vectorian_tpu.ops.search import _compact_slices
        from vectorian_tpu.ops.simmatrix import _ChunkVectors

        axis = self._mesh.axis_names[0]
        n_dev = self.n_devices
        shard_n = ctx_store.shape[0] // n_dev
        L, d = ctx_store.shape[1], ctx_store.shape[2]
        Q = int(len_t.shape[0])
        T = q_norm.shape[0] // Q
        if general_gaps:
            gv_s = jnp.asarray(gap_vecs[0], jnp.float32)
            gv_t = jnp.asarray(gap_vecs[1], jnp.float32)

        if boost is None:
            boost = jnp.ones((ctx_store.shape[0], Q), jnp.float32)
        if not with_filter:
            token_ids = jnp.zeros((ctx_store.shape[0], 1), jnp.int32)
            pos_ids = jnp.zeros((ctx_store.shape[0], 1), jnp.int8)
            tag_ids = jnp.zeros((ctx_store.shape[0], 1), jnp.int16)
            flt_args = (jnp.zeros((1,), bool),) * 3

        def shard_fn(ctx, ln, bst, tok, pos, tag):
            c = ctx.shape[0]
            flat = ctx.astype(jnp.float32).reshape(c * L, d)
            mags = jnp.linalg.norm(flat, axis=-1)
            normed = flat / jnp.maximum(mags, 1e-9)[:, None]
            a = _ChunkVectors(flat, normed, mags)
            b = _ChunkVectors(q_unmod, q_norm, q_mags)
            S = jnp.clip(metric.compute(a, b), 0.0, 1.0)  # [c*L, T*Q]
            S = S.reshape(c, L, T, Q)
            if with_filter:
                # doc filters compact the post-GEMM similarity rows (the
                # sharded replica of _bucket_scores_multiquery_ctx)
                perm, ln, _ = _compact_slices(tok, pos, tag, ln, *flt_args)
                S = jnp.take_along_axis(S, perm[:, :, None, None], axis=1)
            S2 = jnp.transpose(S, (0, 3, 1, 2)).reshape(c * Q, L, T)
            ln_rep = jnp.repeat(jnp.maximum(ln, 1), Q)
            lt_rep = jnp.tile(len_t, c)
            if general_gaps:
                raw = align_scores_general(
                    S2, ln_rep, lt_rep, gv_s, gv_t, locality
                ).reshape(c, Q)
            else:
                raw = align_scores(
                    S2, ln_rep, lt_rep, gaps, locality
                ).reshape(c, Q)
            scores = raw / jnp.maximum(norm_total[None, :], 1e-9)
            if with_boost:
                scores = scores * bst
            scores = jnp.where(ln[:, None] > 0, scores, -jnp.inf)
            return _merge_local_topk(
                scores, axis, shard_n, n_dev, k, with_next
            )

        out_specs = (P(), P(), P()) if with_next else (P(), P())
        fn = shard_map(
            shard_fn,
            mesh=self._mesh,
            in_specs=(P(axis),) * 6,
            out_specs=out_specs,
            check_vma=False,
        )
        return fn(ctx_store, lengths, boost, token_ids, pos_ids, tag_ids)

    @functools.partial(jax.jit, static_argnames=("self", "locality", "k"))
    def score_topk(
        self,
        token_ids: jnp.ndarray,  # [N, L] sharded over 'data'
        lengths: jnp.ndarray,  # [N] sharded
        sim_vocab: jnp.ndarray,  # [V, T] replicated
        len_t: jnp.ndarray,  # scalar
        gaps: AffineGapParams,
        norm_total: jnp.ndarray,  # scalar
        locality: str = "local",
        k: int = 10,
    ):
        """Per-shard gather+DP, then global top-k.  XLA partitions the
        elementwise DP over the slice axis with zero communication and
        inserts the all-gather only for the final top-k reduction."""
        N = token_ids.shape[0]
        T = sim_vocab.shape[1]
        S = sim_vocab[token_ids]  # [N, L, T] — sharded gather
        lt = jnp.full((N,), len_t, jnp.int32)
        raw = align_scores(S, jnp.maximum(lengths, 1), lt, gaps, locality)
        scores = jnp.where(lengths > 0, raw / jnp.maximum(norm_total, 1e-9), -jnp.inf)
        top_scores, top_idx = jax.lax.top_k(scores, k)
        return top_scores, top_idx
