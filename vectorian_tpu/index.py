"""Query construction, indexes and matches.

Reference: vectorian/index.py — Query/PreparedQuery (:25-106), Match ABC +
to_json (:249-292), CoreMatch region reconstruction (:295-379),
BruteForceIndex thread fan-out (:509-560), SpanEncoderIndex (:679) and
FaissCosineIndex (:733).

TPU mapping: the per-document ThreadPool disappears — the packed corpus is
scored in one batched device pass (ops/search.BruteForceEngine); the bounded
top-k heap becomes argpartition over the full score vector; flows are
recomputed for the global top-k only.
"""

from __future__ import annotations

import os
import time
from collections import namedtuple
from typing import Dict, List, Optional

import numpy as np

from vectorian_tpu.alignment import resolve_affine_gaps
from vectorian_tpu.ops.alignment import AffineGapParams
from vectorian_tpu.ops.prefilter import gaps_nonneg as prefilter_gaps_nonneg
from vectorian_tpu.ops.search import (
    NEG_SCORE,
    BruteForceEngine,
    HostVecSource,
    TagWeightingSpec,
    order_by_score,
    reference_score,
)
from vectorian_tpu.ops.simmatrix import (
    compile_plan,
    compile_similarity,
    plan_sim_upper,
    preload_leaf_inputs,
)
from vectorian_tpu.session import Result
from vectorian_tpu.utils import trace

def _reverse_plan(qp, n_tokens: int):
    """Plan with the needle axis reversed (bidirectional matching).  Only
    the first ``n_tokens`` columns are real — needle padding stays at the
    tail so the runtime len_t mask keeps working."""
    import jax.numpy as jnp
    from dataclasses import replace

    def rev(m):
        m = jnp.asarray(m)
        return jnp.concatenate([m[:, :n_tokens][:, ::-1], m[:, n_tokens:]], axis=1)

    def rev_rows(v):
        v = np.asarray(v)
        return np.concatenate([v[:n_tokens][::-1], v[n_tokens:]], axis=0)

    return replace(
        qp,
        static_sims=[rev(m) for m in qp.static_sims],
        ctx_queries=[
            {k: rev_rows(v) for k, v in q.items()} for q in qp.ctx_queries
        ],
    )


def _reverse_ctx_query(d: dict, n_tokens: int) -> dict:
    """Contextual query dict with the needle axis reversed (bidirectional
    matching) — the ctx analogue of _reverse_plan's rev_rows."""

    def rev_rows(v):
        v = np.asarray(v)
        return np.concatenate([v[:n_tokens][::-1], v[n_tokens:]], axis=0)

    return {k: rev_rows(v) for k, v in d.items()}


def _reverse_tagw(tagw, n_tokens: int):
    if tagw is None:
        return None
    from dataclasses import replace

    def rev(v):
        return np.concatenate([v[:n_tokens][::-1], v[n_tokens:]], axis=0).copy()

    return replace(
        tagw,
        t_pos_weights=rev(tagw.t_pos_weights),
        pos_t=rev(tagw.pos_t),
    )


def _submatch_upper_bound(
    device_score, norm_total: float, w: float, sim_max: float = 1.0
):
    """Upper bound on the submatch-rescored score of any slice whose
    device-normalized score is <= ``device_score`` (no boost).

    exact = raw / reference_score(total, matched, w) with
    raw <= matched * sim_max (every aligned similarity is at most its
    token's max weight times the metric's similarity ceiling — 1.0 for
    clipped metrics, ``plan_sim_upper`` for unary-kernel metrics) and
    matched <= total.  reference_score(m) = m + ((total-m)/total)^w
    (total-m) is minimized over m at m* = total(1 - (1+w)^(-1/w)), so
    min over m in [raw/sim_max, total] is ref(max(raw/sim_max, m*)) —
    giving a bound that is monotone in the device score, which makes
    device-ranked overfetch + exact rescore provably complete
    (reference_score semantics: metric/alignment.h:84-106)."""
    total = max(norm_total, 1e-9)
    sim_max = max(float(sim_max), 1e-9)
    d = np.asarray(device_score, np.float64)
    raw = np.maximum(d, 0.0) * total
    if w <= 0:
        return np.where(d < 0, d, np.minimum(d, sim_max))
    m_star = total * (1.0 - (1.0 / (1.0 + w)) ** (1.0 / w))
    m = np.minimum(np.maximum(raw / sim_max, m_star), total)
    ref = np.maximum(reference_score(total, m, w), 1e-12)
    ub = np.minimum(raw / ref, sim_max)
    return np.where(d < 0, d, ub)


def _submatch_fetch_thresh(
    t: float, norm_total: float, w: float, sim_max: float, eps_q: float
) -> float:
    """Largest device score provably unable to reach a submatch-rescored
    score of ``t``: every slice whose exact rescored score can reach t has
    device score STRICTLY above the returned threshold, so fetching
    everything >= it is a provably complete extras round.  The bound
    ``_submatch_upper_bound`` is monotone in the device score (``eps_q``
    covers device-vs-exact ranking drift), so the inverse is a bisection.
    Returns -inf when even deeply negative device scores can't be excluded
    (then the caller reads everything)."""

    def ub(d: float) -> float:
        return float(
            _submatch_upper_bound(d + eps_q, norm_total, w, sim_max)
        )

    lo = min(-1.0, float(t) - 1.0)
    hi = max(float(t), lo + 1.0)  # ub(d) >= d, so ub(hi) >= t
    if ub(lo) >= t:
        return -np.inf
    for _ in range(60):
        mid = 0.5 * (lo + hi)
        if ub(mid) >= t:
            hi = mid
        else:
            lo = mid
    return lo


def _submatch_bound_boosted(
    d, boost, norm_total: float, w: float, sim_max: float, eps_q: float = 0.0
) -> float:
    """Upper bound on the BOOSTED submatch-rescored score of any slice
    whose boosted device score is <= ``d``:

        exact_b = b_s * exact_u <= b_s * ub(d_b / b_s + eps_q)
                <= max over boost values b of b * ub(d / b + eps_q)

    with ub = ``_submatch_upper_bound`` (monotone in the device score;
    ``eps_q`` covers device-vs-exact drift in unboosted units) — the
    boost factors out of both the exact score and the in-kernel device
    multiply, so the unboosted bound applies at d/b.  Evaluated over the
    UNIQUE boost values present, so the proof needs no concavity
    assumption on ub.  Non-positive boosts contribute <= 0; negative
    boosts (no saliency mixture produces them) make the bound vacuous
    (+inf -> the caller reads everything — still exact, never wrong)."""
    b = np.unique(np.asarray(boost, np.float64))
    if b.size and b[0] < 0:
        return np.inf
    b = b[b > 0]
    if not b.size:
        return 0.0
    vals = b * _submatch_upper_bound(
        np.asarray(d, np.float64) / b + eps_q, norm_total, w, sim_max
    )
    return float(np.max(vals))


def _submatch_fetch_thresh_boosted(
    t: float, boost, norm_total: float, w: float, sim_max: float,
    eps_q: float,
) -> float:
    """Boosted variant of ``_submatch_fetch_thresh``: boosted device
    scores strictly below the return value provably cannot reach boosted
    rescored score ``t``.  Bisected inverse of ``_submatch_bound_boosted``
    (monotone in d, and >= d since ub(x) >= x)."""
    b = np.unique(np.asarray(boost, np.float64))
    if b.size and b[0] < 0:
        return -np.inf
    b = b[b > 0]
    if not b.size:
        # all-zero boosts: every boosted score is 0
        return np.inf if t > 0 else -np.inf

    def f(d: float) -> float:
        return float(
            np.max(
                b
                * _submatch_upper_bound(d / b + eps_q, norm_total, w, sim_max)
            )
        )

    lo = min(-1.0, float(t) - 1.0)
    hi = max(float(t), lo + 1.0)
    if f(lo) >= t:
        return -np.inf
    for _ in range(60):
        mid = 0.5 * (lo + hi)
        if f(mid) >= t:
            hi = mid
        else:
            lo = mid
    return lo


def _boosted_col(col: np.ndarray, boost) -> np.ndarray:
    """Host-side boosted ranking column: multiply valid scores, keep the
    NEG_SCORE sentinels intact (same f32 arithmetic as the in-kernel boost
    multiply on the static batch path)."""
    if boost is None:
        return col
    return np.where(
        col > NEG_SCORE * 0.5, col * boost, col
    ).astype(np.float32)


def _metric_ctx_names(token_sim):
    """Names of the contextual embeddings a token-sim tree actually uses."""
    return {
        e.name for e in token_sim.embeddings
        if not getattr(e, "is_static", True)
    }


def _pad_needle(query: "PreparedQuery", session, with_ctx: bool = True,
                ctx_names=None):
    """Pad the needle to a length bucket (multiple of 4): padded ids are -1,
    strings empty, contextual rows zero.  One compiled pipeline then serves
    a range of query lengths (the DP masks columns past the runtime len_t).
    Returns (token_ids, strings, ctx_queries, Tpad)."""
    T = query.n_tokens
    Tpad = max(4, -(-T // 4) * 4)
    pad_n = Tpad - T
    tok_ids = np.concatenate(
        [np.asarray(query.token_ids, np.int32), np.full((pad_n,), -1, np.int32)]
    )
    strings = list(query.token_strings) + [""] * pad_n
    ctx_q = {}
    if with_ctx:
        ctx_q = query.contextual_vectors(session, names=ctx_names)
        for name, d in ctx_q.items():
            ctx_q[name] = {
                k: np.pad(
                    np.asarray(v), ((0, pad_n),) + ((0, 0),) * (np.ndim(v) - 1)
                )
                for k, v in d.items()
            }
    return tok_ids, strings, ctx_q, Tpad


# per-query options the batched kernels do not take: find_batch delegates
# to the exact per-query path instead of silently ignoring them.  EVERY
# serving batch — static, contextual, and mixed-tree, single-chip and
# mesh — takes boosters, doc-side filters (in-kernel row compaction),
# ``submatch_weight`` (closed-form-bounded overfetch, boosted or not —
# ``_finalize_submatch_many`` / ``_submatch_bound_boosted``),
# ``bidirectional`` (both orientations ride the stacked queries;
# exact-score merge) and tag weights (incl. mixed-modifier trees).  Only
# ``debug`` remains delegated: its payloads are host-side per-query
# diagnostics, served single-chip on every path (a mesh argument is
# ignored for them; results stay byte-equal).
BATCH_HARD_OPTIONS = frozenset({"debug"})

Region = namedtuple("Region", ["s", "match", "gap_penalty"])
TokenMatch = namedtuple("TokenMatch", ["pos_s", "edges"])
TokenMatchEdge = namedtuple("TokenMatchEdge", ["t", "flow", "distance", "metric"])
TokenMatchT = namedtuple("TokenMatchT", ["text", "index", "pos"])


class Query:
    """An unprepared query (reference index.py:25-54)."""

    def __init__(self, index, text: str, options: dict):
        self._index = index
        self._text = text
        self._options = options
        self._aborted = False

    def abort(self):
        """Cooperative cancellation (reference Query::abort, query.h:183-189;
        checked per slice there, per bucket pass here)."""
        self._aborted = True

    @property
    def aborted(self):
        return self._aborted

    @property
    def index(self):
        return self._index

    @property
    def text(self):
        return self._text

    @property
    def options(self):
        return self._options

    def prepare(self, nlp):
        return PreparedQuery(self, nlp)


class PreparedQuery:
    """NLP-parsed, normalized query bound to the session vocabulary
    (reference index.py:56-106 + core Query::initialize query.cpp:32-154)."""

    def __init__(self, query: Query, nlp):
        self._query = query
        session = query.index.session
        doc = nlp(query.text)
        self._sdoc = doc
        j = doc.to_json() if hasattr(doc, "to_json") else doc

        tokens = j["tokens"]
        table = {
            "text": [query.text[t["start"] : t["end"]] for t in tokens],
            "pos": [t.get("pos", "X") for t in tokens],
            "tag": [t.get("tag", "XX") for t in tokens],
        }
        char_spans = [(t["start"], t["end"]) for t in tokens]
        mask = session.normalization.apply(table)

        # query-side pos/tag filters (reference index.py:78-83): tokens whose
        # pos/tag is listed are excluded from the needle.
        pos_filter = set(query.options.get("pos_filter") or ())
        tag_filter = set(query.options.get("tag_filter") or ())
        for i in range(len(tokens)):
            if table["pos"][i] in pos_filter or table["tag"][i] in tag_filter:
                mask[i] = False

        keep = np.flatnonzero(mask)
        self.token_strings = [table["text"][i] for i in keep]
        self.token_pos = [table["pos"][i] for i in keep]
        self.token_tag = [table["tag"][i] for i in keep]
        self.char_spans = [char_spans[i] for i in keep]
        self.all_char_spans = char_spans
        self.kept = keep
        # corpus vocab ids (-1 if OOV — the reference's incremental query
        # vocab; OOV tokens still get metric rows via their own vectors)
        self.token_ids = session.vocab.tokens.lookup_many(self.token_strings)
        self.pos_ids = np.asarray(
            [session.vocab.pos_id(p) for p in self.token_pos], np.int8
        )

    def contextual_vectors(self, session, names=None) -> dict:
        """name -> {unmodified, normalized, magnitudes} query-side vectors
        for the session's contextual embeddings (reference encodes the
        query through the same encoders, index.py:66-74).  ``names``
        restricts encoding to the embeddings the metric actually uses — a
        transformer embedding that a static-metric index never touches
        must not cost a forward pass per query."""
        out = {}
        for name in session.contextual_embeddings:
            if names is not None and name not in names:
                continue
            out[name] = session.encode_contextual_query(
                name, self._sdoc, self.text, self.kept
            )
        return out

    @property
    def query(self):
        return self._query

    @property
    def text(self):
        return self._query.text

    @property
    def options(self):
        return self._query.options

    @property
    def n_tokens(self):
        return len(self.token_strings)


class _FlowResolver:
    """Deferred flow extraction for one query's top-n matches.

    Serving batches report exact scores from the fused fetch; the flow
    MAPPINGS of matches whose payload did not ride the transfer are only
    needed when a consumer actually reads regions/edges (at Q=512 the
    eager flows rescore cost ~1.2 s/pass for 5120 mappings).  The first
    access to any member's mapping runs ONE batched rescore for the whole
    group and injects every member's flows — same rescore_many
    arithmetic, so resolved mappings are byte-identical to eager ones
    (the reference's finalizer computes flows for the top-k eagerly,
    matcher_impl.h:172-174; deferring to first access is this engine's
    latency trade)."""

    def __init__(
        self, index, plan, len_t, tagw, gaps, locality, gap_costs,
        doc_filter,
    ):
        self._index = index
        self._plan = plan
        self._len_t = len_t
        self._tagw = tagw
        self._gaps = gaps
        self._locality = locality
        self._gap_costs = gap_costs
        self._doc_filter = doc_filter
        self._members = []  # (match, sid)
        self._done = False

    def add(self, match, sid: int) -> None:
        self._members.append((match, sid))

    def resolve(self) -> None:
        if self._done:
            return
        self._done = True
        if not self._members:
            return
        (res,) = self._index._engine.rescore_many(
            [
                {
                    "slice_ids": [sid for _, sid in self._members],
                    "qp": self._plan,
                    "len_t": self._len_t,
                    "tag_weights": self._tagw,
                    "want_flows": True,
                }
            ],
            self._gaps,
            self._locality,
            gap_costs=self._gap_costs,
            doc_filter=self._doc_filter,
        )
        mappings, edge_sims, _raw = res
        for (m, _sid), mp, es in zip(self._members, mappings, edge_sims):
            m._set_flows(mp, es)


class Match:
    """A single search hit; JSON shape mirrors reference index.py:249-292."""

    def __init__(
        self,
        index: "Index",
        query: PreparedQuery,
        slice_id: int,
        score: float,
        metric: str = "",
        mapping: Optional[np.ndarray] = None,
        similarities: Optional[np.ndarray] = None,
        edge_list: Optional[list] = None,  # [(t, s, flow, distance)]
        level: str = "word",
        flow_resolver: Optional[_FlowResolver] = None,
    ):
        self._index = index
        self._query = query
        self._slice_id = int(slice_id)
        self._score = float(score)
        self._metric = metric
        self._mapping_v = mapping
        self._similarities_v = similarities
        self._edge_list = edge_list
        self._level = level
        self._flow_resolver = flow_resolver

    @property
    def _mapping(self):
        if self._mapping_v is None and self._flow_resolver is not None:
            self._flow_resolver.resolve()
        return self._mapping_v

    @property
    def _similarities(self):
        if self._similarities_v is None and self._flow_resolver is not None:
            self._flow_resolver.resolve()
        return self._similarities_v

    def _set_flows(self, mapping, similarities) -> None:
        self._mapping_v = np.asarray(mapping, np.int32)
        self._similarities_v = similarities
        self._flow_resolver = None

    @property
    def index(self):
        return self._index

    @property
    def query(self):
        return self._query

    @property
    def slice_id(self):
        return self._slice_id

    @property
    def score(self):
        return self._score

    @property
    def metric(self):
        return self._metric

    @property
    def level(self):
        return self._level

    @property
    def prepared_doc(self):
        packed = self._index.packed
        return self._index.session.documents[int(packed.slice_doc[self._slice_id])]

    @property
    def doc(self):
        return self.prepared_doc.doc

    @property
    def slice_span(self):
        """(token_start, token_len) of the matched slice in filtered space."""
        packed = self._index.packed
        return (
            int(packed.slice_start[self._slice_id]),
            int(packed.slice_len[self._slice_id]),
        )

    @property
    def span(self):
        """The matched slice as a browsable :class:`corpus.document.Span`
        of original document tokens (reference Span browsing objects,
        corpus/document.py:575-623)."""
        s, ln = self.slice_span
        return self.prepared_doc.span_from_filtered(s, s + ln)

    @property
    def flow(self):
        """Flow dict: injective (reference InjectiveFlow.to_py,
        match/flow.cpp:191-216) for alignments, sparse edge list (SparseFlow
        flow.cpp:243-258) for transport metrics."""
        if self._edge_list is not None:
            return {
                "type": "sparse",
                "edges": [
                    {"t": t, "s": s, "flow": f, "distance": d}
                    for (t, s, f, d) in self._edge_list
                ],
            }
        if self._mapping is None:
            return None
        t = np.asarray(self._mapping, np.int32)
        flow = (t >= 0).astype(np.float32)
        dist = np.where(
            t >= 0,
            1.0 - (self._similarities if self._similarities is not None else 0.0),
            1.0,
        ).astype(np.float32)
        return {"type": "injective", "target": t, "flow": flow, "distance": dist}

    def _edges_by_s(self) -> Dict[int, list]:
        """s offset -> [(t, flow, distance)] from whichever flow repr."""
        out: Dict[int, list] = {}
        if self._edge_list is not None:
            for t, s, f, d in self._edge_list:
                out.setdefault(int(s), []).append((int(t), float(f), float(d)))
        elif self._mapping is not None:
            for jt, s in enumerate(self._mapping):
                if s >= 0:
                    sim = (
                        float(self._similarities[jt])
                        if self._similarities is not None
                        else 0.0
                    )
                    out.setdefault(int(s), []).append((jt, 1.0, 1.0 - sim))
        return out

    @property
    def omitted(self) -> List[str]:
        matched_t = set()
        if self._edge_list is not None:
            matched_t = {t for (t, s, f, d) in self._edge_list}
        elif self._mapping is not None:
            matched_t = {jt for jt, s in enumerate(self._mapping) if s >= 0}
        else:
            return []
        out = []
        for jt in range(len(self._query.char_spans)):
            if jt not in matched_t:
                c0, c1 = self._query.char_spans[jt]
                out.append(self._query.text[c0:c1])
        return out

    def regions(self, context_size: int = 10) -> List[Region]:
        """Reconstruct text regions (reference Flow::py_regions,
        match/flow.cpp:8-167): context, gap runs with penalties, matched
        tokens with query-token edges."""
        pd = self.prepared_doc
        doc = pd.doc
        start, length = self.slice_span
        s_to_t = self._edges_by_s()  # s offset -> [(t, flow, distance)]

        def char_range(f_lo, f_hi):
            # filtered token positions [f_lo, f_hi) -> char range in doc text
            o_lo = pd.orig_index[start + f_lo]
            o_hi = pd.orig_index[start + f_hi - 1]
            c0 = int(doc.idx[o_lo])
            c1 = int(doc.idx[o_hi] + doc.len_[o_hi])
            return c0, c1

        regions: List[Region] = []
        text = doc.text
        if length == 0:
            return regions

        # leading context: context_size is measured in TOKENS (reference
        # py_regions last_anchor arithmetic, flow.cpp:44 + 157-164)
        c0, _ = char_range(0, 1)
        lead = min(context_size, start)
        if lead > 0:
            o_ctx = pd.orig_index[start - lead]
            ctx0 = int(doc.idx[o_ctx])
            if ctx0 < c0:
                regions.append(
                    Region(s=text[ctx0:c0], match=None, gap_penalty=0.0)
                )

        gaps = self._index.gap_costs()
        i = 0
        while i < length:
            if i in s_to_t:
                edges = []
                for jt, fl, dist in s_to_t[i]:
                    c0q, c1q = self._query.char_spans[jt]
                    edges.append(
                        TokenMatchEdge(
                            t=TokenMatchT(
                                text=self._query.text[c0q:c1q],
                                index=jt,
                                pos=self._query.token_pos[jt],
                            ),
                            flow=fl,
                            distance=dist,
                            metric=self._metric,
                        )
                    )
                c0, c1 = char_range(i, i + 1)
                o = pd.orig_index[start + i]
                pos_s = doc.pos[o]
                regions.append(
                    Region(
                        s=text[c0:c1],
                        match=TokenMatch(pos_s=pos_s, edges=edges),
                        gap_penalty=0.0,
                    )
                )
                i += 1
            else:
                i0 = i
                while i < length and i not in s_to_t:
                    i += 1
                c0, c1 = char_range(i0, i)
                gap_len = i - i0
                # a run counts as a PENALIZED gap only between matched
                # anchors (reference flow.cpp:103-112: p = 0 unless
                # last_matched); leading/trailing runs are plain context
                between = i0 > 0 and i < length
                penalty = (
                    float(gaps["s"].costs(gap_len + 1)[gap_len])
                    if gaps and between
                    else 0.0
                )
                regions.append(Region(s=text[c0:c1], match=None, gap_penalty=penalty))

        # trailing context, also token-measured
        _, c1 = char_range(length - 1, length)
        n_filtered = len(pd.orig_index)
        trail = min(context_size, n_filtered - (start + length))
        if trail > 0:
            o_ctx = pd.orig_index[start + length + trail - 1]
            ctx1 = int(doc.idx[o_ctx] + doc.len_[o_ctx])
            if c1 < ctx1:
                regions.append(
                    Region(s=text[c1:ctx1], match=None, gap_penalty=0.0)
                )
        return regions

    def to_json(self, context_size: int = 10) -> dict:
        packed = self._index.packed
        pd = self.prepared_doc
        slice_idx = int(packed.slice_idx[self._slice_id])
        location = dict(pd.doc.metadata)
        location.pop("locations", None)
        locations = pd.doc.metadata.get("locations")
        if locations and self._index.partition.level == "sentence":
            # importers record one location per SENTENCE; a windowed
            # partition's slice i starts at sentence i * window_step (the
            # window's location = its first sentence's, like the
            # reference's span metadata)
            sent_idx = slice_idx * self._index.partition.window_step
            if sent_idx < len(locations):
                location.update(locations[sent_idx])
        location["slice_start"] = int(packed.slice_start[self._slice_id])
        location["slice_len"] = int(packed.slice_len[self._slice_id])

        regions = []
        for region in self.regions(context_size):
            if region.match:
                regions.append(
                    dict(
                        s=region.s,
                        pos_s=region.match.pos_s,
                        edges=[
                            {
                                "t": {
                                    "text": e.t.text,
                                    "index": e.t.index,
                                    "pos": e.t.pos,
                                },
                                "flow": e.flow,
                                "distance": e.distance,
                                "metric": e.metric,
                            }
                            for e in region.match.edges
                        ],
                    )
                )
            else:
                regions.append(dict(s=region.s, gap_penalty=region.gap_penalty))

        return dict(
            slice=slice_idx,
            location=location,
            score=self._score,
            metric=self._metric,
            regions=regions,
            omitted=self.omitted,
            level=self._level,
        )


class Index:
    """Base index (reference index.py:406-506)."""

    def __init__(self, partition, nlp=None):
        self._partition = partition
        self._session = partition.session
        self._nlp = nlp if nlp is not None else self._session.nlp

    @property
    def partition(self):
        return self._partition

    @property
    def session(self):
        return self._session

    @property
    def packed(self):
        return self._session.packed_corpus(self._partition.spec)

    def make_query(self, text: str, n: int = 100, min_score: float = 0.2, **kwargs):
        """reference index.py:461-477: n -> max_matches."""
        options = dict(kwargs)
        options["max_matches"] = n
        options["min_score"] = min_score
        options["partition"] = self._partition.to_args()
        return Query(self, text, options)

    def find(
        self,
        text: str,
        n: int = 100,
        min_score: float = 0.2,
        debug=None,
        disable_progress=False,
        run_task=None,
        **kwargs,
    ) -> Result:
        """reference index.py:479-501.

        ``mesh=`` (a ``jax.sharding.Mesh`` / ``MeshSearch``) serves this
        ONE query with every chip: the corpus pass shards over the mesh
        exactly like ``find_batch(mesh=...)`` at Q=1 and merges local
        top-ks with the next-best bound — the reference parallelizes a
        single query across all cores the same way (index.py:530-560,
        ThreadPool imap_unordered + ResultSet merge).  Results are
        byte-identical to the single-chip path (the cross-path parity
        invariant).  ``debug`` queries stay single-chip (host-side
        diagnostics)."""
        mesh = kwargs.pop("mesh", None)
        if mesh is not None and debug is None and hasattr(self, "find_batch"):
            return self.find_batch(
                [text], n=n, min_score=min_score, mesh=mesh, **kwargs
            )[0]
        start_time = time.time()
        with trace.span("find.prep"):
            query = self.make_query(
                text, n=n, min_score=min_score, debug=debug, **kwargs
            )
            prepared = query.prepare(self._nlp)
        matches = self._find(prepared)
        return Result(self, matches, time.time() - start_time)

    def _find(self, query: PreparedQuery) -> List[Match]:
        raise NotImplementedError()

    def gap_costs(self):
        return None


class BruteForceIndex(Index):
    """Index-free brute-force search over all slices — the reference's
    flagship path (index.py:509-560), executed as one batched device pass."""

    def __init__(self, partition, span_sim, nlp=None, **kwargs):
        super().__init__(partition, nlp=nlp)
        self._span_sim = span_sim
        self._engine: BruteForceEngine = self._session.engine(partition.spec)
        args = span_sim.to_args(self)
        self._args = args
        alignment = args["alignment"]
        if alignment["algorithm"] != "alignment":
            # transport algorithms route to the transport engine (ops/wmd)
            self._algorithm = alignment["algorithm"]
        else:
            self._algorithm = "alignment"
        self._locality = alignment.get("locality", "local")
        self._gap_s = alignment.get("gap_s")
        self._gap_t = alignment.get("gap_t")

    @property
    def span_sim(self):
        return self._span_sim

    def gap_costs(self):
        if self._gap_s is None:
            return None
        return {"s": self._gap_s, "t": self._gap_t}

    def warmup(self, max_tokens: int = 12, n: int = 10) -> "BruteForceIndex":
        """Pre-compile the query pipeline for every needle-length bucket up
        to ``max_tokens`` (first queries otherwise pay multi-second XLA
        compiles; with length bucketing one dummy query per multiple of 4
        covers the whole range).  Pass the ``n`` (max_matches) production
        queries will use — the candidate-fetch and finalizer-batch jit
        shapes depend on it.  Returns self for chaining."""
        vocab_words = [
            w for w in self._session.vocab.tokens.strings[1:]
            if w and w.isalpha()  # survives the vanilla normalizer
        ][: max(max_tokens, 1)]
        if not vocab_words:
            return self
        # cover the bucket a max_tokens-token query actually pads to
        top_bucket = max(4, -(-max(max_tokens, 1) // 4) * 4)
        for t in range(4, top_bucket + 1, 4):
            words = [vocab_words[i % len(vocab_words)] for i in range(t)]
            # min_score low enough to keep >= 1 candidate: the finalizer
            # (batched similarity + fused DP matrices/scores + traceback)
            # must compile too, or the first real query still stalls
            self.find(" ".join(words), n=n, min_score=-1e30)
        return self

    def _affine_gaps(self) -> Optional[AffineGapParams]:
        """Affine params when the gap model is exactly affine (fast Gotoh
        kernel), else None — the engine then uses the general-gap WSB DP."""
        affine = resolve_affine_gaps(self._gap_s, self._gap_t)
        if affine is None:
            return None
        o_s, e_s, o_t, e_t = affine
        return AffineGapParams.of(o_s, e_s, o_t, e_t)

    def _doc_filter(self, query: PreparedQuery):
        """Document-side token filter from query options: pos_filter /
        tag_filter apply to both sides (reference index.py:78-83 +
        query.cpp:220-257); token_filter excludes document token strings."""
        from vectorian_tpu.ops.search import DocFilterSpec
        from vectorian_tpu.vocabulary import UPOS

        opts = query.options
        pos_filter = list(opts.get("pos_filter") or ())
        tag_filter = list(opts.get("tag_filter") or ())
        token_filter = list(opts.get("token_filter") or ())
        if not (pos_filter or tag_filter or token_filter):
            return None
        vocab = self._session.vocab
        pos_ex = np.zeros((len(UPOS),), bool)
        for p in pos_filter:
            pos_ex[vocab.pos_id(p)] = True
        tag_ex = np.zeros((max(len(vocab.tags), 1),), bool)
        for t in tag_filter:
            i = vocab.tags.get(t)
            if i >= 0:
                tag_ex[i] = True
        tok_ex = np.zeros((max(len(vocab.tokens), 1),), bool)
        for w in token_filter:
            nw = self._session.normalization.normalize_word(w)
            i = vocab.tokens.get(nw if nw else w)
            if i >= 0:
                tok_ex[i] = True
        return DocFilterSpec(pos_ex, tag_ex, tok_ex)

    def _tag_weighting(
        self, query: PreparedQuery, width: Optional[int] = None
    ) -> Optional[TagWeightingSpec]:
        tw = self._args.get("tag_weights")
        if not tw:
            return None
        # unknown tags default to weight 1.0 (reference parse_tag_weights,
        # match/instantiate.cpp:10-38)
        weights = np.asarray(
            [float(tw.get(t, 1.0)) for t in query.token_tag], np.float32
        )
        pos_t = np.asarray(query.pos_ids, np.int8)
        if width is not None and width > len(weights):
            d = width - len(weights)
            # padded needle columns: weight 0, pos sentinel (masked by len_t)
            weights = np.concatenate([weights, np.zeros((d,), np.float32)])
            pos_t = np.concatenate([pos_t, np.full((d,), -1, np.int8)])
        return TagWeightingSpec(
            t_pos_weights=weights,
            pos_t=pos_t,
            pos_mismatch_penalty=float(self._args.get("pos_mismatch_penalty", 0.0)),
            similarity_threshold=float(self._args.get("similarity_threshold", 0.0)),
        )

    def _find(self, query: PreparedQuery) -> List[Match]:
        opts = query.options
        debug = opts.get("debug")
        n = int(opts.get("max_matches", 100))
        min_score = float(opts.get("min_score", 0.2))
        submatch_weight = float(opts.get("submatch_weight", 0.0))
        booster = opts.get("booster")

        if query.n_tokens == 0:
            return []
        if self._algorithm != "alignment":
            return self._find_transport(query)

        token_sim = self._args["metric"]["token_sim"]
        T = query.n_tokens
        with trace.span("find.plan"):
            tok_ids_p, strings_p, ctx_q, Tpad = _pad_needle(
                query, self._session, ctx_names=_metric_ctx_names(token_sim)
            )
            qp = compile_plan(
                token_sim,
                self._session.compiled_embeddings,
                tok_ids_p,
                strings_p,
                ctx_q,
            )
        for name in qp.ctx_names:
            self._engine.ensure_contextual(
                name, self._session.documents, self._session._ctx_dims[name]
            )
        if debug and qp.is_static_only:
            debug(
                "static_similarity_matrix",
                {"similarity": np.asarray(qp.static_sims[0])},
            )

        tagw = self._tag_weighting(query, width=Tpad)
        norm_total = tagw.total if tagw is not None else float(T)
        gaps = self._affine_gaps()
        if gaps is None:
            gap_costs = (self._gap_s, self._gap_t)
            gaps = AffineGapParams.of(0, 0, 0, 0)  # unused placeholder
        else:
            gap_costs = None

        boost = None
        if booster is not None:
            boost = booster.compile(self._session, self._partition, query)

        doc_filter = self._doc_filter(query)

        t_match0 = time.time()

        def _exact_scores(top, raw):
            # reported scores always come from the finalizer's exact f32
            # rescore IN f32 ARITHMETIC (the same find_batch reports), so
            # find() and find_batch() are bit-identical: device scores
            # differ by ~1 ulp (XLA's reciprocal-multiply divide), which
            # can flip (doc, slice) tie-breaks between the two paths
            nt = np.float32(max(norm_total, 1e-9))
            out = {}
            for j, sid in enumerate(top):
                s = np.float32(raw[j]) / nt
                if boost is not None:
                    s = s * np.float32(boost[sid])
                out[sid] = float(s)
            return out

        if (
            debug is None
            and opts.get("bidirectional")
            and qp.is_static_only
        ):
            # fused bidirectional: both orientations ride ONE stacked-table
            # corpus pass through the same finalizer find_batch uses, then
            # merge by exact score with forward winning ties — so
            # find()/find_batch() stay byte-equal.  (The reference scores
            # both orientations exactly and keeps the better match,
            # query.cpp:81-84; the old two-pass full-read path below picked
            # the orientation by DEVICE score, which can differ at 1-ulp
            # ties — it remains only for debug/contextual/boosted-submatch.)
            qp_rev = _reverse_plan(qp, T)
            tagw_rev = _reverse_tagw(tagw, T)
            k_fetch = (4 * n + 32) if submatch_weight != 0.0 else (n + 32)
            # the MXU prefilter serves both orientations from ONE shared
            # candidate set: the bound's per-id weights are maxima over
            # needle positions, which reversal only permutes, so the
            # shared top-M covers fwd AND rev; the cut must prove against
            # the WEAKER orientation's n-th score
            pf_ok = (
                submatch_weight == 0.0
                and boost is None
                and tagw is None
                and doc_filter is None
                and prefilter_gaps_nonneg(
                    gaps, gap_costs, self._engine.packed.max_len, Tpad
                )
            )

            def _bidir_src(force_full: bool):
                if pf_ok and not force_full:
                    with trace.span("find.topk"):
                        return self._engine.score_topk_prefiltered(
                            [qp, qp_rev], [T, T], gaps, self._locality,
                            [norm_total, norm_total], k_fetch,
                            gap_costs=gap_costs,
                            needle_token_ids=[np.asarray(tok_ids_p)[:T]],
                        )
                return (
                    self._engine.score_topk_multi(
                        [qp, qp_rev], [T, T], gaps, self._locality,
                        [norm_total, norm_total], k_fetch,
                        tag_weights=(
                            [tagw, tagw_rev] if tagw is not None else None
                        ),
                        gap_costs=gap_costs, doc_filter=doc_filter,
                        boosts=[boost, boost] if boost is not None else None,
                    ),
                    False,
                )

            def _bidir_pair(src):
                items = [
                    (src.qview(0), qp, query, norm_total, tagw, boost),
                    (src.qview(1), qp_rev, query, norm_total, tagw_rev,
                     boost),
                ]
                if submatch_weight != 0.0:
                    return self._finalize_submatch_many(
                        items, gaps, n, min_score, 0.0, submatch_weight,
                        gap_costs=gap_costs, doc_filter=doc_filter,
                    )
                return self._finalize_quantized_many(
                    items, gaps, token_sim.name, n, min_score, 0.0,
                    gap_costs=gap_costs, doc_filter=doc_filter,
                )

            src, pf_used = _bidir_src(False)
            if query.query.aborted:
                return []
            pair = _bidir_pair(src)
            if pf_used:
                s_ns = [
                    (side[n - 1].score if len(side) >= n else min_score)
                    for side in pair
                ]
                s_n = min(s_ns)
                rest = src.prefilter_rest_raw / max(norm_total, 1e-9)
                if rest >= s_n - 1e-3 * max(1.0, abs(rest), abs(s_n)):
                    trace.add("find.pf_fallback", 1.0)
                    src, _ = _bidir_src(True)
                    if query.query.aborted:
                        return []
                    pair = _bidir_pair(src)
            return self._merge_bidirectional(pair[0], pair[1], query, n)

        if debug is None and not opts.get("bidirectional"):
            # low-latency path: device-side top-k, only O(buckets*k) values
            # cross to the host
            if submatch_weight == 0.0 and boost is None and qp.is_static_only:
                # the serving machinery with Q=1: the fused top-k dispatch
                # returns candidates WITH their exact f32 raw scores and
                # flow payloads, so a tie-safe query completes in ONE
                # device fetch; boundary ties resolve through tie-bounded
                # device column selects (never a full corpus re-read).
                # Results stay byte-identical to find_batch by
                # construction — both run _finalize_quantized_many.
                # compile_plan folds static-only modifier trees to one
                # matrix, so the plan is always ("static", 0) here.
                # Plain queries (no tag weights / filter, nonnegative gap
                # model) first try the provable MXU prefilter — the TPU
                # worst_score early-reject (result_set.h:32-38): only the
                # top-M slices by a GEMV upper bound pay the gather + DP.
                # Accepted ONLY when every pruned slice provably falls
                # below the exact n-th score; otherwise rerun unpruned —
                # results stay byte-identical either way.
                pf_ok = (
                    tagw is None
                    and doc_filter is None
                    and prefilter_gaps_nonneg(
                        gaps, gap_costs, self._engine.packed.max_len, Tpad
                    )
                )

                def _fused_src(force_full: bool):
                    if pf_ok and not force_full:
                        with trace.span("find.topk"):
                            return self._engine.score_topk_prefiltered(
                                [qp], [T], gaps, self._locality,
                                [norm_total], n + 32, gap_costs=gap_costs,
                                needle_token_ids=[
                                    np.asarray(tok_ids_p)[:T]
                                ],
                            )
                    with trace.span("find.topk"):
                        return (
                            self._engine.score_topk_multi(
                                [qp], [T], gaps, self._locality,
                                [norm_total], n + 32,
                                tag_weights=(
                                    [tagw] if tagw is not None else None
                                ),
                                gap_costs=gap_costs, doc_filter=doc_filter,
                            ),
                            False,
                        )

                def _fused_finalize(src):
                    with trace.span("find.finalize"):
                        return self._finalize_quantized_many(
                            [(src.qview(0), qp, query, norm_total, tagw,
                              None)],
                            gaps, token_sim.name, n, min_score, 0.0,
                            gap_costs=gap_costs, doc_filter=doc_filter,
                        )[0]

                src, pf_used = _fused_src(False)
                if query.query.aborted:
                    return []
                matches = _fused_finalize(src)
                if pf_used:
                    s_n = (
                        matches[n - 1].score
                        if len(matches) >= n
                        else min_score
                    )
                    rest = src.prefilter_rest_raw / max(norm_total, 1e-9)
                    # 1e-3 relative slack covers the bound's bf16 weight
                    # round-up compensation + f32 GEMV accumulation error
                    if rest >= s_n - 1e-3 * max(1.0, abs(rest), abs(s_n)):
                        trace.add("find.pf_fallback", 1.0)
                        src, _ = _fused_src(True)
                        if query.query.aborted:
                            return []
                        matches = _fused_finalize(src)
                return matches
            if submatch_weight == 0.0:
                # boosted or contextual-plan queries: device top-k with the
                # ulp-scaled membership slack (candidate MEMBERSHIP is
                # guarded like _finalize_quantized: device ranking drifts
                # ~1 ulp from the exact rescore; a loose constant here
                # would trigger device refetches — each a fresh top_k
                # compile on a tunneled runtime — whenever two scores are
                # merely CLOSE at the boundary)
                scale = 1e-6 if qp.is_static_only else self._ctx_floor(qp)
                ulp = lambda x: scale * max(1.0, abs(x))
                n_slices = self._engine.packed.n_slices
                top, _, rest = self._engine.score_topk(
                    qp, T, gaps, self._locality, norm_total,
                    k=n + 32, min_score=min_score - ulp(min_score),
                    boost=boost, tag_weights=tagw,
                    doc_filter=doc_filter, gap_costs=gap_costs,
                    with_next=True,
                )
                if query.query.aborted or not top:
                    return []
                mappings, edge_sims, raw = (
                    self._engine.rescore_with_flows(
                        top, qp, T, gaps, self._locality,
                        tag_weights=tagw, doc_filter=doc_filter,
                        gap_costs=gap_costs, with_scores=True,
                    )
                )
                exact = _exact_scores(top, raw)
                matches = self._build_matches(
                    query, token_sim, top, mappings, edge_sims,
                    exact.__getitem__, submatch_weight, tagw,
                    norm_total, min_score, n, debug,
                )
                s_n = (
                    matches[n - 1].score
                    if len(matches) >= n
                    else min_score
                )
                if n + 32 >= n_slices or rest < s_n - ulp(s_n):
                    return matches
                # unsafe cut (boundary tie): fall through to the full-read
                # score_all path below — its extras are TIE-BOUNDED
                # (slices reaching s_n - eps), never a corpus-wide rescore,
                # and score_all's jit shape is k-independent so no fresh
                # top_k compiles on the tunneled runtime
            else:
                # submatch_weight rescoring can lift a slice past
                # device-ranked candidates: overfetch with the closed-form
                # upper bound as the cut proof (boosted queries prove it
                # through the boost-factored bound, maximized over the
                # boost values present).  sim_max: the bound assumes sims
                # <= token weights; unary-kernel metrics can exceed 1, so
                # the bound is scaled by the plan's actual similarity
                # ceiling (inf for unknowable ctx plans — those take the
                # full-read path)
                sim_max = plan_sim_upper(qp)
                n_slices = self._engine.packed.n_slices
                top, _, rest = self._engine.score_topk(
                    qp, T, gaps, self._locality, norm_total,
                    k=4 * n, min_score=-1e30, boost=boost,
                    tag_weights=tagw, doc_filter=doc_filter,
                    gap_costs=gap_costs, with_next=True,
                )
                if query.query.aborted or not top:
                    return []
                mappings, edge_sims, raw = self._engine.rescore_with_flows(
                    top, qp, T, gaps, self._locality, tag_weights=tagw,
                    doc_filter=doc_filter, gap_costs=gap_costs,
                    with_scores=True,
                )
                exact = _exact_scores(top, raw)
                matches = self._build_matches(
                    query, token_sim, top, mappings, edge_sims,
                    exact.__getitem__, submatch_weight, tagw,
                    norm_total, min_score, n, debug,
                )
                if 4 * n >= n_slices:
                    return matches
                s_n = (
                    matches[n - 1].score if len(matches) >= n else min_score
                )
                if not np.isfinite(sim_max):
                    ub = np.inf
                elif boost is not None:
                    ub = _submatch_bound_boosted(
                        rest, boost, norm_total, submatch_weight, sim_max,
                        eps_q=1e-6,
                    )
                else:
                    ub = float(
                        _submatch_upper_bound(
                            rest, norm_total, submatch_weight, sim_max
                        )
                    )
                if ub < s_n - 1e-6:
                    return matches
                # unsafe: fall through to the full-read path (tie-bounded
                # extras via the closed-form bound over ALL scores)

        scores = self._engine.score_all(
            qp,
            T,
            gaps,
            self._locality,
            norm_total,
            boost=boost,
            tag_weights=tagw,
            doc_filter=doc_filter,
            gap_costs=gap_costs,
        )
        qp_rev = tagw_rev = None
        if opts.get("bidirectional"):
            # score the reversed needle as well; the better orientation per
            # slice is chosen by FINAL exact score after the rescore
            # (reference 'bidirectional' option, query.cpp:81-84 — its
            # matcher-side reverse_alignment is vestigial, so these
            # semantics are this repo's own: identical to find_batch's
            # _merge_bidirectional, keeping every path byte-equal)
            qp_rev = _reverse_plan(qp, T)
            tagw_rev = _reverse_tagw(tagw, T)
            scores_rev = self._engine.score_all(
                qp_rev, T, gaps, self._locality, norm_total,
                boost=boost, tag_weights=tagw_rev, doc_filter=doc_filter,
                gap_costs=gap_costs,
            )
            # the max over orientations upper-bounds both exact scores, so
            # candidate selection and completeness guards stay valid
            scores = np.maximum(scores, scores_rev)
        if debug:
            debug("scores", {"scores": scores})
            debug(
                "document/match_time",
                {"elapsed_us": int((time.time() - t_match0) * 1e6)},
            )
        if query.query.aborted:
            return []

        # membership guard like the low-latency path: fetch with a
        # plan-scaled slack and verify the cut after the exact rescore
        # (device ranking drifts from the finalizer scores)
        fb_scale = 1e-6 if qp.is_static_only else self._ctx_floor(qp)
        fb_eps = lambda x: fb_scale * max(1.0, abs(x))
        if submatch_weight == 0.0:
            first_top, rest_fb = self._engine.top_k_with_next(
                scores, n + 32, min_score - fb_eps(min_score)
            )
            order0 = order_by_score(
                self._engine.packed, first_top, scores[first_top]
            )
            first_top = [int(c) for c in np.asarray(first_top)[order0]]
        else:
            first_top = self._engine.top_k(scores, 4 * n, min_score=-1e30)
            rest_fb = None
        if not first_top:
            return []

        # per-slice contextual similarity blocks for the survivors,
        # observed from the finalizer's own similarity pass — no extra
        # dispatch, and consistent with the plan orientation actually used
        # (reference contextual_similarity_matrix hook,
        # metric/contextual.cpp:77-99 — per document there; per retained
        # slice here, the TPU unit of work)
        on_sims = None
        if debug and not qp.is_static_only:
            def on_sims(sid, Sw, Su):
                debug(
                    "contextual_similarity_matrix",
                    {"slice": sid, "similarity": Su},
                )

        def run(top):
            mappings, edge_sims, raw = self._engine.rescore_with_flows(
                top, qp, T, gaps, self._locality, tag_weights=tagw,
                doc_filter=doc_filter, gap_costs=gap_costs,
                on_sims=on_sims, with_scores=True,
            )
            exact = _exact_scores(top, raw)
            fwd = self._build_matches(
                query, token_sim, top, mappings, edge_sims,
                exact.__getitem__, submatch_weight, tagw,
                norm_total, min_score, n, debug,
            )
            if qp_rev is None:
                return fwd
            # bidirectional: rescore EVERY candidate in the reversed
            # orientation too and keep the better FINAL score per slice —
            # the same exact-score merge as find_batch
            m_r, s_r, r_r = self._engine.rescore_with_flows(
                top, qp_rev, T, gaps, self._locality, tag_weights=tagw_rev,
                doc_filter=doc_filter, gap_costs=gap_costs,
                on_sims=on_sims, with_scores=True,
            )
            exact_r = _exact_scores(top, r_r)
            rev = self._build_matches(
                query, token_sim, top, m_r, s_r,
                exact_r.__getitem__, submatch_weight, tagw_rev,
                norm_total, min_score, n, debug,
            )
            return self._merge_bidirectional(fwd, rev, query, n)

        def merge_cut(a, b):
            packed = self._engine.packed
            merged = sorted(
                a + b,
                key=lambda m: (
                    -m.score,
                    int(packed.slice_doc[m.slice_id]),
                    int(packed.slice_idx[m.slice_id]),
                ),
            )
            return merged[:n]

        matches = run(first_top)
        if submatch_weight == 0.0:
            # completeness: every slice whose device score could reach the
            # exact n-th (within the drift slack) must have been rescored
            # s_n falls back to min_score when unfilled, so the threshold
            # covers both displacement and fill-in candidates
            s_n = matches[n - 1].score if len(matches) >= n else min_score
            thresh = s_n - fb_eps(s_n)
            if rest_fb is not None and rest_fb >= thresh:
                seen = set(first_top)
                extra = [
                    int(c)
                    for c in np.flatnonzero(scores >= thresh)
                    if int(c) not in seen
                ]
                if extra:
                    matches = merge_cut(matches, run(extra))
        else:
            # completeness proof for the rescored ranking: every slice whose
            # closed-form upper bound could reach the exact n-th score must
            # have been rescored (boosted queries factor the per-slice
            # boost out of the device score first — exact_b = b * exact_u
            # <= b * ub(device_b / b)); only the EXTRA candidates are
            # rescored, then merged
            s_n = matches[n - 1].score if len(matches) >= n else min_score
            sim_max = plan_sim_upper(qp)
            if not np.isfinite(sim_max):
                # unknowable similarity ceiling (contextual plan with unary
                # kernels): rescore everything — still a provable cut
                ub_vec = np.full_like(scores, np.inf)
            elif boost is not None:
                b = np.asarray(boost, np.float64)
                if np.any(b < 0):
                    ub_vec = np.full_like(scores, np.inf)
                else:
                    safe = np.where(b > 0, b, 1.0)
                    d_u = scores / safe
                    # 1-ulp slack for the in-kernel boost multiply / the
                    # host divide not round-tripping exactly
                    d_u = d_u + 1e-6 * np.maximum(1.0, np.abs(d_u))
                    ub_vec = np.where(
                        b > 0,
                        b
                        * _submatch_upper_bound(
                            d_u, norm_total, submatch_weight, sim_max
                        ),
                        0.0,
                    )
            else:
                ub_vec = _submatch_upper_bound(
                    scores, norm_total, submatch_weight, sim_max
                )
            seen = set(first_top)
            extra = [
                int(c)
                for c in np.flatnonzero(ub_vec >= s_n - 1e-6)
                if int(c) not in seen
            ]
            if extra:
                matches = merge_cut(matches, run(extra))
        return matches

    def _build_matches(
        self, query, token_sim, top, mappings, edge_sims, score_of,
        submatch_weight, tagw, norm_total, min_score, n, debug,
    ) -> List[Match]:
        T = query.n_tokens
        packed = self._engine.packed
        matches = []
        for sid, mapping, sims in zip(top, mappings, edge_sims):
            score = score_of(sid)
            if submatch_weight != 0.0:
                # exact rescore: matched max-sims vs total (reference_score,
                # metric/alignment.h:84-106)
                if tagw is not None:
                    # the spec is padded to the needle bucket; mappings are
                    # sized by the real token count
                    max_sims = tagw.t_pos_weights[:T]
                else:
                    max_sims = np.ones((T,), np.float32)
                matched = float(np.sum(max_sims[mapping >= 0]))
                total = float(np.sum(max_sims))
                raw = score * norm_total  # invert the device normalization
                ref = reference_score(total, matched, submatch_weight)
                score = raw / ref if ref > 0 else 0.0
            if debug:
                debug(
                    "alignment",
                    {"slice": sid, "flow": mapping, "score": score},
                )
            matches.append(
                Match(
                    self,
                    query,
                    slice_id=sid,
                    score=score,
                    metric=token_sim.name,
                    mapping=mapping,
                    similarities=sims,
                )
            )
        matches.sort(
            key=lambda m: (
                -m.score,
                int(packed.slice_doc[m.slice_id]),
                int(packed.slice_idx[m.slice_id]),
            )
        )
        # strict: the reference accepts only score > worst_score
        # (result_set pruning, metric/alignment.h:284 + result_set.h:32-38)
        matches = [m for m in matches if m.score > min_score]
        return matches[:n]

    def find_batch(
        self,
        texts: List[str],
        n: int = 100,
        min_score: float = 0.2,
        sim_precision: Optional[str] = None,
        mesh=None,
        **kwargs,
    ) -> List[Result]:
        """Batched search: score Q queries in one corpus pass.

        The TPU bottleneck of a single query is the per-token vocab gather,
        whose cost is per-index rather than per-byte; stacking the Q query
        similarity matrices column-wise makes the same gather serve every
        query, so batch throughput scales ~Q-fold.  Tag weighting,
        boosters and doc-side filters all ride the batch kernels (filters
        compact tokens in-kernel, boosts multiply ranking and rescore
        alike); only the ``BATCH_HARD_OPTIONS`` delegate to the per-query
        path.

        ``sim_precision``: ``"int8"`` (the default) ranks with a symmetric
        int8 similarity table — quartering the corpus pass's HBM traffic —
        and then rescores an overfetched candidate set exactly in f32,
        expanding the set until the cut is *provably* below any score the
        quantization could have displaced (results are identical to
        ``"float32"``); ``"bfloat16"`` is the halved-traffic variant.  An
        explicit argument wins over the ``VECTORIAN_SIM_PRECISION`` env
        default.  Batches with tag weighting force f32 (the similarity
        threshold is a discontinuity no rounding bound survives).

        ``mesh``: a ``jax.sharding.Mesh`` or ``parallel.mesh.MeshSearch``
        shards the corpus pass over the mesh's devices (data-parallel
        slice sharding, per-query top-k merged over one all-gather) with
        the same exact-results guarantee.

        Transport metrics: relaxed-WMD batches report byte-identical
        scores to ``find()`` — device kernels rank, and every path
        reports the shared shape-independent host greedy arithmetic
        (ops/wmd.rwmd_score_host) over slack-padded tie-complete
        candidate pools.  Full-WMD and WRD batches rank on the
        device with a PROVABLE upper bound on the exact EMD score (the
        relaxed transport from the lighter-marginal side,
        ops/wmd._emd_score_bound) and exactly rescore candidates in
        descending-bound order until every remaining bound sits below the
        n-th exact score — both the reported scores and the top-k
        membership match the reference's exhaustive exact EMD
        (wmd.h:194-270) and ``find()`` byte-for-byte."""
        if self._algorithm != "alignment":
            return self._find_batch_transport(
                texts, n=n, min_score=min_score, mesh=mesh, **kwargs
            )
        token_sim = self._args["metric"]["token_sim"]
        from vectorian_tpu.sim.token import EmbeddingTokenSim as _ETS

        embs = list(token_sim.embeddings)
        statics = [getattr(e, "is_static", True) for e in embs]
        if not all(statics):
            if isinstance(token_sim, _ETS) and not self._args.get("tag_weights"):
                return self._find_batch_ctx(
                    texts, n=n, min_score=min_score, mesh=mesh, **kwargs
                )
            if BATCH_HARD_OPTIONS & set(kwargs):
                # debug hooks: served per query single-chip on every path
                # (the payloads are host-side diagnostics; a mesh argument
                # is ignored for them) — results stay byte-equal
                return [
                    self.find(t, n=n, min_score=min_score, **kwargs)
                    for t in texts
                ]
            # mixed static+contextual modifier trees ride a batched
            # stacked-leaf corpus pass (single-chip AND mesh)
            return self._find_batch_tree(
                texts, n=n, min_score=min_score, mesh=mesh, **kwargs
            )
        # options the batched kernel genuinely cannot take — delegate to
        # the exact single-query path rather than silently ignoring them
        submatch_w = float(kwargs.get("submatch_weight") or 0.0)
        bidirectional = bool(kwargs.get("bidirectional"))
        if BATCH_HARD_OPTIONS & set(kwargs):
            # debug hooks: single-chip per-query on every path (host-side
            # diagnostics; a mesh argument is ignored for them)
            return [
                self.find(t, n=n, min_score=min_score, **kwargs) for t in texts
            ]

        start_time = time.time()
        with trace.span("batch.prepare"):
            (
                prepared, plans, len_ts, norm_totals, tagws, gaps, gap_costs,
                sim_precision, quantize,
            ) = self._prepare_static_batch(
                texts, n, min_score, sim_precision, kwargs
            )
        any_tags = any(t is not None for t in tagws)

        # boosters and doc-side filters ride the batch kernels: the filter
        # compacts document tokens in-kernel (identical for every query in
        # the batch — the options are shared), boosts multiply the ranking
        # scores and the exact rescore alike (reference Booster,
        # document.h:175-187 + Score boost, match.h:295-336)
        booster = kwargs.get("booster")
        boosts = None
        if booster is not None:
            boosts = [
                np.asarray(
                    booster.compile(self._session, self._partition, pq),
                    np.float32,
                )
                if pq.n_tokens
                else None
                for pq in prepared
            ]
        doc_filter = None
        if {"pos_filter", "tag_filter", "token_filter"} & set(kwargs):
            live = [pq for pq in prepared if pq.n_tokens]
            if live:
                doc_filter = self._doc_filter(live[0])

        # bidirectional: both orientations ride the SAME stacked table as
        # extra subqueries (reversed needle columns); per-query results
        # merge by exact score afterwards (_merge_bidirectional) — the
        # reference scores both orientations exactly too (query.cpp:81-84)
        Q0 = len(prepared)
        if bidirectional:
            plans = plans + [
                _reverse_plan(qp, max(pq.n_tokens, 1))
                for qp, pq in zip(plans, prepared)
            ]
            tagws = tagws + [
                _reverse_tagw(tw, max(pq.n_tokens, 1)) if tw else None
                for tw, pq in zip(tagws, prepared)
            ]
            prepared = prepared + prepared
            len_ts = len_ts + len_ts
            norm_totals = norm_totals + norm_totals
            if boosts is not None:
                boosts = boosts + boosts

        if mesh is not None:
            return self._find_batch_mesh(
                prepared, plans, len_ts, norm_totals, tagws, gaps, gap_costs,
                sim_precision, quantize, token_sim.name, n, min_score,
                mesh, start_time, boosts=boosts, doc_filter=doc_filter,
                submatch_w=submatch_w,
                bidir_q0=Q0 if bidirectional else None,
            )

        # device-side per-bucket top-k for every batch — only
        # O(buckets * Q * k) pairs cross the tunnel instead of the
        # [n_slices, Q] matrix; per-query boosts multiply the ranking
        # in-kernel (the exact rescore re-applies them host-side under the
        # boost-scaled eps slack)
        entry_err = 0.0
        # submatch rescoring can lift slices past device-ranked candidates:
        # fetch the 4n closed-form-bounded overfetch (find()'s k)
        k_fetch = (4 * n + 32) if submatch_w != 0.0 else (n + 32)
        with trace.span("batch.topk"):
            if quantize:
                src, entry_err = self._engine.score_topk_multi(
                    plans, len_ts, gaps, self._locality, norm_totals,
                    k_fetch, sim_dtype=sim_precision, with_err=True,
                    gap_costs=gap_costs, doc_filter=doc_filter,
                    boosts=boosts,
                )
            else:
                src = self._engine.score_topk_multi(
                    plans, len_ts, gaps, self._locality, norm_totals,
                    k_fetch, tag_weights=tagws if any_tags else None,
                    gap_costs=gap_costs, doc_filter=doc_filter,
                    boosts=boosts,
                )

        # every batch (quantized, f32, tag-weighted) reports the
        # FINALIZER's exact f32 scores under the provable cut (entry_err
        # 0.0 on f32 paths, where the loop only guards tie-breaks) — so
        # every sim_precision AND find() return byte-identical matches;
        # device scores can differ from the rescore by ~1 ulp (XLA lowers
        # the normalization divide as a reciprocal multiply).  All queries
        # finalize through ONE batched rescore per round (sequential
        # per-query finalizes pay 2 blocking tunnel reads each).
        items, item_qis = [], []
        for qi, pq in enumerate(prepared):
            if pq.n_tokens == 0:
                continue
            items.append(
                (
                    src.qview(qi), plans[qi], pq, norm_totals[qi],
                    tagws[qi],
                    boosts[qi] if boosts is not None else None,
                )
            )
            item_qis.append(qi)
        if submatch_w != 0.0:
            per_q = self._finalize_submatch_many(
                items, gaps, n, min_score, entry_err, submatch_w,
                gap_costs=gap_costs, doc_filter=doc_filter,
            )
        else:
            per_q = self._finalize_quantized_many(
                items, gaps, token_sim.name, n, min_score, entry_err,
                gap_costs=gap_costs, doc_filter=doc_filter,
            )
        matches_by_qi = dict(zip(item_qis, per_q))
        if bidirectional:
            matches_by_qi = {
                qi: self._merge_bidirectional(
                    matches_by_qi.get(qi, []),
                    matches_by_qi.get(qi + Q0, []),
                    prepared[qi],
                    n,
                )
                for qi in range(Q0)
                if qi in matches_by_qi or (qi + Q0) in matches_by_qi
            }
        elapsed = time.time() - start_time
        return [
            Result(self, matches_by_qi[qi], elapsed)
            if qi in matches_by_qi
            else Result(self, [], 0.0)
            for qi in range(Q0)
        ]

    def _prepare_static_batch(self, texts, n, min_score, sim_precision, kwargs):
        """Shared find_batch front half: prepare Q queries, collapse their
        static token-sim trees to single matrices, resolve gap params and
        the ranking precision."""
        token_sim = self._args["metric"]["token_sim"]
        prepared, plans, len_ts, norm_totals, tagws = [], [], [], [], []
        padded = []
        for text in texts:
            q = self.make_query(text, n=n, min_score=min_score, **kwargs)
            pq = q.prepare(self._nlp)
            prepared.append(pq)
            padded.append(_pad_needle(pq, self._session, with_ctx=False))
        # batch the needle-side uploads: one transfer + one unstack dispatch
        # instead of 4 device_puts per query (dominates prep time at Q>=64
        # on tunneled runtimes)
        pre = preload_leaf_inputs(
            token_sim,
            self._session.compiled_embeddings,
            [(p[0], p[1]) for p in padded],
        )
        for pq, (tok_ids_p, strings_p, _, Tpad), pl in zip(
            prepared, padded, pre
        ):
            # compile the plan at the SAME padded needle width find() uses
            # (the leaf GEMM's tiling — and so its f32 rounding — depends
            # on the needle width) and through the SAME compile_plan fold
            # (static-only modifier trees collapse to one matrix inside
            # compile_plan), so find()/find_batch() gather identical bits
            qp = compile_plan(
                token_sim,
                self._session.compiled_embeddings,
                tok_ids_p,
                strings_p,
                {},
                preloaded=pl,
            )
            assert qp.plan == ("static", 0), "static batch requires fold"
            plans.append(qp)
            len_ts.append(max(pq.n_tokens, 1))
            tagw = self._tag_weighting(pq, width=Tpad)
            tagws.append(tagw)
            norm_totals.append(
                tagw.total if tagw is not None else float(max(pq.n_tokens, 1))
            )

        gaps = self._affine_gaps()
        if gaps is None:
            # non-affine gap model: the general-gap WSB DP takes per-length
            # cost vectors (one pair — the index's gap model is shared by
            # every query in the batch); the affine params become an unused
            # placeholder (mirrors find(), reference alignment.py:54-55)
            gap_costs = (self._gap_s, self._gap_t)
            gaps = AffineGapParams.of(0, 0, 0, 0)
        else:
            gap_costs = None
        if sim_precision is None:
            sim_precision = os.environ.get("VECTORIAN_SIM_PRECISION") or "int8"
        if sim_precision not in ("int8", "bfloat16", "float32"):
            raise ValueError(f"unknown sim_precision {sim_precision!r}")
        quantize = sim_precision != "float32" and not any(
            t is not None for t in tagws
        )
        return (
            prepared, plans, len_ts, norm_totals, tagws, gaps, gap_costs,
            sim_precision, quantize,
        )

    # floor on the normalized-score slack covering quantized ranking (the
    # per-batch bound is dynamic — see _finalize_quantized); also absorbs
    # f32 DP summation-order differences between the ranking kernel and
    # the exact rescore (~1e-6)
    QUANT_SCORE_EPS = 1e-4
    # contextual plans compute their ranking similarity with a DIFFERENT
    # einsum tiling than the per-slice finalizer (reduction reorder over
    # d dims: ~d * 2^-24 relative, ~5e-5 at d=768) — their membership
    # slack needs a larger floor, scaled with the embedding dimension by
    # _ctx_floor (a fixed 1e-3 would be overtaken near d=16k)
    CTX_SCORE_EPS = 1e-3

    def _ctx_floor(self, qp) -> float:
        d = max(
            (int(np.asarray(q["unmodified"]).shape[-1]) for q in qp.ctx_queries),
            default=0,
        )
        return max(self.CTX_SCORE_EPS, 4.0 * d * 2.0 ** -24)

    def _finalize_quantized(
        self, q_scores, plan, pq, gaps, norm_total, metric_name,
        n: int, min_score: float, entry_err: float, tagw=None,
        gap_costs=None, boost=None, doc_filter=None,
    ) -> List["Match"]:
        """Exact top-n from approximate (int8/bf16) ranking scores — or
        from exact f32 ranking with ``entry_err=0.0``, where the loop's
        only job is guarding (doc, slice) tie-breaks at the cut boundary.

        A DP path matches at most len_t similarity entries, each carrying
        at most ``entry_err`` rounding (gap costs are exact), so the
        normalized ranking score drifts at most
        entry_err * len_t / norm_total.  Overfetch candidates by quantized
        score, rescore them exactly in f32 (one batched finalizer
        dispatch), and accept the cut only when the best quantized score
        OUTSIDE the candidate set is provably below the exact n-th score
        minus that bound.  ``q_scores`` is the COMPLETE host-side score
        vector, so an unsafe first cut resolves in exactly ONE more step:
        the exact n-th score bounds the extra candidates to the slices
        whose device score reaches s_n - eps (tie-bounded — never a
        corpus-wide rescore; a full-coverage retry measured 100k+ host
        tracebacks on a Zipf corpus).  The returned matches (ids, scores,
        flows, order) are bit-identical to the pure-f32 path."""
        return self._finalize_quantized_many(
            [(q_scores, plan, pq, norm_total, tagw, boost)],
            gaps, metric_name, n, min_score, entry_err,
            gap_costs=gap_costs, doc_filter=doc_filter,
        )[0]

    def _finalize_quantized_many(
        self, items, gaps, metric_name, n: int, min_score: float,
        entry_err: float, gap_costs=None, doc_filter=None,
    ) -> List[List["Match"]]:
        """Batched finalizer: ``items`` is one (q_scores, plan, pq,
        norm_total, tagw, boost) tuple per query; every device round runs
        ONCE for the whole batch through ``rescore_many`` (sequential
        per-query finalizes cost 2 blocking tunnel reads each — the
        dominant term of find_batch latency at 1M slices).

        Three bounded rounds: (1) exact flows-rescore of each query's
        n+32 overfetch, (2) score-only rescore of the tie-bounded extras
        for queries whose cut is unsafe (no H readback / traceback — Zipf
        tie groups run to thousands of slices), (3) flow extraction for
        the handful of extras that enter a final top-n.  Results are
        bit-identical to the sequential path (same dispatch arguments,
        same arithmetic)."""
        engine = self._engine
        packed = engine.packed

        def key_of(sid, score):
            return (
                -score,
                int(packed.slice_doc[sid]),
                int(packed.slice_idx[sid]),
            )

        # round 1: candidate selection (host-complete score vectors or
        # device-top-k candidate sources).  Fused sources already carry
        # each candidate's exact raw DP score from the top-k dispatch
        # (initial_exact) — their flow extraction is DEFERRED to round 3,
        # which only touches the final top-n.  Unfused items (host score
        # vectors, filtered/general-gap rescores) keep the one batched
        # flows-rescore of the n+32 overfetch.
        meta = []
        reqs, req_qis = [], []
        _t_fin = time.perf_counter()
        for qi, (q_scores, plan, pq, norm_total, tagw, boost) in enumerate(
            items
        ):
            src = (
                HostVecSource(engine, q_scores)
                if isinstance(q_scores, np.ndarray)
                else q_scores
            )
            eps = self._quant_eps(entry_err, pq, norm_total, plan=plan)
            eps_b = (
                eps * max(1.0, float(np.max(boost)))
                if boost is not None
                else eps
            )
            raw_init = None
            if hasattr(src, "initial_exact"):
                cand, rest_max, raw_init = src.initial_exact(
                    n + 32, min_score - eps_b
                )
            else:
                cand, rest_max = src.initial(n + 32, min_score - eps_b)
            meta.append(
                {
                    "eps_b": eps_b,
                    "cand": cand,
                    "rest_max": rest_max,
                    "src": src,
                    "raw_init": raw_init,
                }
            )
            if raw_init is None:
                reqs.append(
                    {
                        "slice_ids": cand,
                        "qp": plan,
                        "len_t": pq.n_tokens,
                        "tag_weights": tagw,
                        "want_flows": True,
                    }
                )
                req_qis.append(qi)
        res1_by_qi = dict(
            zip(
                req_qis,
                engine.rescore_many(
                    reqs, gaps, self._locality, gap_costs=gap_costs,
                    doc_filter=doc_filter,
                )
                if reqs
                else [],
            )
        )
        trace.add("fin.r1", time.perf_counter() - _t_fin)
        _t_fin = time.perf_counter()

        # round 2: cut-safety per query; unsafe cuts are tie-BOUNDED —
        # the source covers every slice reaching the exact n-th minus the
        # drift slack (never a corpus-wide rescore: a full-coverage retry
        # measured 100k+ host tracebacks on a Zipf corpus); column reads
        # for device-top-k sources batch through parent.above_many
        above_calls = []  # (qi, view, thresh, seen)
        for qi, ((q_scores, plan, pq, norm_total, tagw, boost), m) in (
            enumerate(zip(items, meta))
        ):
            cand = m["cand"]
            if m["raw_init"] is not None:
                raw = m["raw_init"]
                mappings = edge_sims = None
            else:
                mappings, edge_sims, raw = res1_by_qi[qi]
            exact = raw / max(norm_total, 1e-9)
            if boost is not None:
                exact = exact * np.asarray(boost, np.float32)[
                    np.asarray(cand, np.int64)
                ]
            order = order_by_score(packed, cand, exact)
            keep = [j for j in order if exact[j] > min_score][:n]
            if mappings is not None:
                first = [
                    Match(
                        self, pq, slice_id=cand[j], score=float(exact[j]),
                        metric=metric_name, mapping=mappings[j],
                        similarities=edge_sims[j],
                    )
                    for j in keep
                ]
                m["first"] = first
                scores_kept = [mt.score for mt in first]
            else:
                # deferred flows: hold (sid, score) until round 3
                ents = [(cand[j], float(exact[j])) for j in keep]
                m["first_entries"] = ents
                scores_kept = [s for _, s in ents]
            s_n = scores_kept[n - 1] if len(scores_kept) >= n else min_score
            thresh = s_n - m["eps_b"]
            if m["src"].covers_all(n + 32) or m["rest_max"] < thresh:
                continue
            seen = set(int(c) for c in cand)
            above_calls.append((qi, m["src"], thresh, seen))
        extra_reqs, extra_qis = [], []
        if above_calls:
            by_parent = {}
            for call in above_calls:
                by_parent.setdefault(id(call[1].parent), []).append(call)
            extras_by_qi = {}
            raws_by_qi = {}
            for calls in by_parent.values():
                parent = calls[0][1].parent
                packed_reqs = [
                    (src, thresh, seen) for _, src, thresh, seen in calls
                ]
                if getattr(parent, "has_exact", False):
                    # fused select: exact raw scores arrive with the ids
                    found = parent.above_exact_many(packed_reqs)
                    for (qi, _, _, _), (ids, rmap) in zip(calls, found):
                        extras_by_qi[qi] = ids
                        raws_by_qi[qi] = rmap
                else:
                    found = parent.above_many(packed_reqs)
                    for (qi, _, _, _), ids in zip(calls, found):
                        extras_by_qi[qi] = ids
            for qi, _, _, _ in above_calls:
                extra = extras_by_qi.get(qi) or []
                if not extra:
                    continue
                _, plan, pq, _, tagw, _ = items[qi]
                meta[qi]["extra"] = extra
                rmap = raws_by_qi.get(qi, {})
                meta[qi]["extra_raws"] = rmap
                missing = [e for e in extra if e not in rmap]
                if missing:
                    meta[qi]["extra_missing"] = missing
                    extra_reqs.append(
                        {
                            "slice_ids": missing,
                            "qp": plan,
                            "len_t": pq.n_tokens,
                            "tag_weights": tagw,
                            "want_flows": False,
                        }
                    )
                    extra_qis.append(qi)
        res2 = (
            engine.rescore_many(
                extra_reqs, gaps, self._locality, gap_costs=gap_costs,
                doc_filter=doc_filter,
            )
            if extra_reqs
            else []
        )
        trace.add("fin.r2", time.perf_counter() - _t_fin)
        _t_fin = time.perf_counter()

        # round 3: merge extras by exact score; extract flows for ONLY the
        # entries that enter a final top-n (deferred-flow items fetch
        # their top-n flows here too — never the n+32 overfetch)
        missing_raws = {
            qi: dict(zip(meta[qi]["extra_missing"], res[2]))
            for qi, res in zip(extra_qis, res2)
        }
        for qi, m in enumerate(meta):
            if "extra" not in m:
                continue
            q_scores, plan, pq, norm_total, tagw, boost = items[qi]
            extra = m["extra"]
            rmap = dict(m.get("extra_raws", {}))
            rmap.update(missing_raws.get(qi, {}))
            raw_extra = np.asarray([rmap[e] for e in extra], np.float32)
            exact_extra = raw_extra / max(norm_total, 1e-9)
            if boost is not None:
                exact_extra = exact_extra * np.asarray(boost, np.float32)[
                    np.asarray(extra, np.int64)
                ]
            if "first" in m:
                entries = [
                    (key_of(mt.slice_id, mt.score), mt, None)
                    for mt in m["first"]
                ]
            else:
                entries = [
                    (key_of(sid, s), None, (sid, s))
                    for sid, s in m["first_entries"]
                ]
            entries += [
                (
                    key_of(e, float(exact_extra[i])),
                    None,
                    (e, float(exact_extra[i])),
                )
                for i, e in enumerate(extra)
                if exact_extra[i] > min_score
            ]
            entries.sort(key=lambda t: t[0])
            m["entries"] = entries[:n]
        # deferred items without extras still owe their top-n flows
        for m, (q_scores, plan, pq, norm_total, tagw, boost) in zip(
            meta, items
        ):
            if "entries" not in m and "first_entries" in m:
                m["entries"] = [
                    (key_of(sid, s), None, (sid, s))
                    for sid, s in m["first_entries"]
                ]
        # (deferred flows: no eager round-3 rescore requests)
        payload_flows = {}  # qi -> {sid: (mapping, edge_sims)}
        for qi, (m, (q_scores, plan, pq, norm_total, tagw, boost)) in (
            enumerate(zip(meta, items))
        ):
            if "entries" not in m:
                continue
            survivors = [t[2][0] for t in m["entries"] if t[2] is not None]
            # fused sources shipped flow payloads (H/Sw/Su) with the
            # initial fetch — traceback host-side, no extra round trip
            src = m["src"]
            if survivors and hasattr(src, "flows_payload"):
                got = {}
                rest = []
                len_t = pq.n_tokens
                for sid in survivors:
                    pay = src.flows_payload(sid)
                    if pay is None:
                        rest.append(sid)
                        continue
                    H_row, Sw_row, Su_row, ln = pay
                    sel = None
                    if doc_filter is not None:
                        # filtered payloads were compacted in-kernel; the
                        # host sel (same keep order) translates mappings
                        # back to original slice offsets
                        sel = engine.filtered_positions(sid, doc_filter)
                        ln = len(sel)
                    mp, es = self._flows_from_payload(
                        H_row, Sw_row, Su_row, ln, len_t, gaps,
                        gap_costs=gap_costs,
                    )
                    if sel is not None:
                        mp = np.where(
                            mp >= 0, sel[np.maximum(mp, 0)], -1
                        ).astype(np.int32)
                    got[sid] = (mp, es)
                if got:
                    payload_flows[qi] = got
                survivors = rest
            if survivors:
                # flows for payload-missing survivors are DEFERRED: one
                # shared resolver per query runs a single batched rescore
                # on first mapping access (eager extraction at Q=512 cost
                # ~1.2 s/pass; scores are already exact and final)
                meta[qi]["resolver"] = _FlowResolver(
                    self, plan, pq.n_tokens, tagw, gaps, self._locality,
                    gap_costs, doc_filter,
                )
        trace.add("fin.r3", time.perf_counter() - _t_fin)
        _t_fin = time.perf_counter()
        flow_maps = dict(payload_flows)

        out = []
        for qi, m in enumerate(meta):
            if "entries" not in m:
                out.append(m["first"])
                continue  # noqa: trace below counts build time
            _, plan, pq, _, _, _ = items[qi]
            s_map = flow_maps.get(qi, {})
            resolver = m.get("resolver")
            merged = []
            for _, mt, ex in m["entries"]:
                if mt is not None:
                    merged.append(mt)
                    continue
                sid, score = ex
                pair = s_map.get(sid)
                if pair is not None:
                    merged.append(
                        Match(
                            self, pq, slice_id=sid, score=score,
                            metric=metric_name, mapping=pair[0],
                            similarities=pair[1],
                        )
                    )
                else:
                    mt2 = Match(
                        self, pq, slice_id=sid, score=score,
                        metric=metric_name, flow_resolver=resolver,
                    )
                    resolver.add(mt2, sid)
                    merged.append(mt2)
            out.append(merged)
        trace.add("fin.build", time.perf_counter() - _t_fin)
        # the stacked-table memo only serves reuse WITHIN this batch's
        # rounds; drop it so it never pins device memory across batches
        with trace.span("fin.release"):
            engine.release_stack_memo()
        return out

    def _flows_from_payload(
        self, H, Sw, Su, ln: int, len_t: int, gaps, gap_costs=None
    ):
        """(mapping, edge_sims) from a fused-fetch flow payload — shares
        rescore_many's unpack helpers (batch_tracebacks/edge_sims_of), so
        payload and rescored flows are byte-identical.  Fused paths never
        have a doc filter, so the filtered-offset translation is the
        identity.  General gap models pass the index-level cost vectors
        (prefix-stable under the payload's padded widths)."""
        from vectorian_tpu.ops.search import batch_tracebacks, edge_sims_of

        w_s = w_t = None
        if gap_costs is not None:
            from vectorian_tpu.ops.search import gap_vec

            w_s = gap_vec(gap_costs[0], Sw.shape[0] + 1)
            w_t = gap_vec(gap_costs[1], Sw.shape[1] + 1)
        (mapping,) = batch_tracebacks(
            H[None], Sw[None], np.asarray([ln], np.int32),
            np.asarray([len_t], np.int32), gaps, self._locality,
            w_s=w_s, w_t=w_t,
        )
        sims = edge_sims_of(mapping, Su, len_t)
        return np.asarray(mapping, np.int32), sims

    def _submatch_matches(
        self, pq, cand, res, tagw, norm_total, submatch_w, min_score, n,
        boost=None,
    ) -> List["Match"]:
        """Submatch-rescored matches from one ``rescore_many`` result —
        the batched analogue of find()'s rescore_with_flows +
        ``_exact_scores`` + ``_build_matches`` chain, running the identical
        f32 arithmetic (boost multiply included) so find()/find_batch()
        stay byte-equal."""
        token_sim = self._args["metric"]["token_sim"]
        mappings, edge_sims, raw = res
        nt = np.float32(max(norm_total, 1e-9))
        exact = {}
        for j, sid in enumerate(cand):
            s = np.float32(raw[j]) / nt
            if boost is not None:
                s = s * np.float32(boost[sid])
            exact[sid] = float(s)
        return self._build_matches(
            pq, token_sim, cand, mappings, edge_sims, exact.__getitem__,
            submatch_w, tagw, norm_total, min_score, n, None,
        )

    def _submatch_cut_from_rescore(
        self, res, cand, rest_max, pq, plan, tagw, norm_total,
        n: int, min_score: float, eps_q: float, submatch_w: float,
        boost=None,
    ) -> Optional[List["Match"]]:
        """Submatch variant of ``_cut_from_rescore``: the cut is proved on
        the RESCORED scale — the closed-form bound lifts the best device
        score outside the candidate set (`rest_max`, drift-padded by
        ``eps_q``; boosted through ``_submatch_bound_boosted`` when boosts
        ride the ranking) to an upper bound on any unfetched slice's
        rescored score.  Returns None when unsafe."""
        matches = self._submatch_matches(
            pq, cand, res, tagw, norm_total, submatch_w, min_score, n,
            boost=boost,
        )
        s_n = matches[n - 1].score if len(matches) >= n else min_score
        sim_max = plan_sim_upper(plan)
        if np.isfinite(sim_max):
            if boost is None:
                ub = float(
                    _submatch_upper_bound(
                        rest_max + eps_q, norm_total, submatch_w, sim_max
                    )
                )
            else:
                ub = _submatch_bound_boosted(
                    rest_max, boost, norm_total, submatch_w, sim_max, eps_q
                )
            if ub < s_n - 1e-6:
                return matches
        return None

    def _finalize_submatch_many(
        self, items, gaps, n: int, min_score: float, entry_err: float,
        submatch_w: float, gap_costs=None, doc_filter=None,
    ) -> List[List["Match"]]:
        """Batched finalizer for submatch-rescored queries (w > 0,
        reference_score semantics metric/alignment.h:84-106).  Every
        candidate's exact score needs its FLOW mapping (the matched-token
        count enters reference_score), so round 1 always rescores with
        flows; the cut is proved through the closed-form submatch upper
        bound on the device next-best value (find()'s single-query logic),
        and unsafe queries fetch extras against the bound's bisected
        inverse threshold — provably complete, like the w=0 finalizer.

        ``items`` = (src_or_scores, plan, pq, norm_total, tagw, boost);
        boosted items prove their cut through the boost-factored bound
        (``_submatch_bound_boosted`` — the boost multiplies the exact
        score and the device ranking alike, so the closed-form bound
        applies at device_score / boost, maximized over the boost values
        present)."""
        engine = self._engine
        packed = engine.packed
        k0 = 4 * n + 32
        meta, reqs = [], []
        for (src_or_scores, plan, pq, norm_total, tagw, boost) in items:
            src = (
                HostVecSource(engine, src_or_scores)
                if isinstance(src_or_scores, np.ndarray)
                else src_or_scores
            )
            cand, rest_max = src.initial(k0, -1e30)
            meta.append({"src": src, "cand": cand, "rest_max": rest_max})
            reqs.append(
                {
                    "slice_ids": cand,
                    "qp": plan,
                    "len_t": pq.n_tokens,
                    "tag_weights": tagw,
                    "want_flows": True,
                }
            )
        res1 = engine.rescore_many(
            reqs, gaps, self._locality, gap_costs=gap_costs,
            doc_filter=doc_filter,
        )

        above_calls = []
        for qi, (item, m, res) in enumerate(zip(items, meta, res1)):
            (_s, plan, pq, norm_total, tagw, boost) = item
            matches = self._submatch_matches(
                pq, m["cand"], res, tagw, norm_total, submatch_w,
                min_score, n, boost=boost,
            )
            m["matches"] = matches
            if m["src"].covers_all(k0):
                continue
            s_n = matches[n - 1].score if len(matches) >= n else min_score
            eps_q = self._quant_eps(entry_err, pq, norm_total, plan=plan)
            sim_max = plan_sim_upper(plan)
            if np.isfinite(sim_max):
                if boost is None:
                    ub = float(
                        _submatch_upper_bound(
                            m["rest_max"] + eps_q, norm_total, submatch_w,
                            sim_max,
                        )
                    )
                else:
                    ub = _submatch_bound_boosted(
                        m["rest_max"], boost, norm_total, submatch_w,
                        sim_max, eps_q,
                    )
                if ub < s_n - 1e-6:
                    continue
                if boost is None:
                    thr = _submatch_fetch_thresh(
                        s_n - 1e-6, norm_total, submatch_w, sim_max, eps_q
                    )
                else:
                    thr = _submatch_fetch_thresh_boosted(
                        s_n - 1e-6, boost, norm_total, submatch_w, sim_max,
                        eps_q,
                    )
            else:
                # unknowable similarity ceiling: rescore everything —
                # still a provable cut (mirrors find()'s full-read branch)
                thr = -np.inf
            above_calls.append(
                (qi, m["src"], thr, set(int(c) for c in m["cand"]))
            )

        extra_reqs, extra_qis = [], []
        if above_calls:
            by_parent = {}
            for call in above_calls:
                by_parent.setdefault(id(call[1].parent), []).append(call)
            for calls in by_parent.values():
                parent = calls[0][1].parent
                found = parent.above_many(
                    [(src, thr, seen) for _, src, thr, seen in calls]
                )
                for (qi, _s, _t, _e), ids in zip(calls, found):
                    if ids:
                        meta[qi]["extra"] = ids
            for qi, m in enumerate(meta):
                if "extra" not in m:
                    continue
                (_s, plan, pq, _nt, tagw, _b) = items[qi]
                extra_reqs.append(
                    {
                        "slice_ids": m["extra"],
                        "qp": plan,
                        "len_t": pq.n_tokens,
                        "tag_weights": tagw,
                        "want_flows": True,
                    }
                )
                extra_qis.append(qi)
        res2 = (
            engine.rescore_many(
                extra_reqs, gaps, self._locality, gap_costs=gap_costs,
                doc_filter=doc_filter,
            )
            if extra_reqs
            else []
        )
        for qi, res in zip(extra_qis, res2):
            (_s, plan, pq, norm_total, tagw, boost) = items[qi]
            more = self._submatch_matches(
                pq, meta[qi]["extra"], res, tagw, norm_total, submatch_w,
                min_score, n, boost=boost,
            )
            merged = sorted(
                meta[qi]["matches"] + more,
                key=lambda mt: (
                    -mt.score,
                    int(packed.slice_doc[mt.slice_id]),
                    int(packed.slice_idx[mt.slice_id]),
                ),
            )
            meta[qi]["matches"] = merged[:n]
        engine.release_stack_memo()
        return [m["matches"] for m in meta]

    def _merge_bidirectional(self, fwd, rev, pq, n: int) -> List["Match"]:
        """Exact-score max over the two needle orientations (reference
        'bidirectional' option, query.cpp:81-84): sorting is a total order
        ((score desc, doc, slice)), so every combined top-n member appears
        in its winning orientation's own top-n — merging the two
        per-orientation top-n lists IS the combined top-n.  Forward wins
        score ties; reversed-orientation mappings translate back to
        forward needle positions (mapping[::-1], like find()'s old
        two-pass path)."""
        packed = self._engine.packed
        best = {mt.slice_id: mt for mt in fwd}
        for mt in rev:
            cur = best.get(mt.slice_id)
            if cur is None or mt.score > cur.score:
                best[mt.slice_id] = Match(
                    self,
                    pq,
                    slice_id=mt.slice_id,
                    score=mt.score,
                    metric=mt.metric,
                    mapping=np.asarray(mt._mapping)[::-1].copy(),
                    similarities=np.asarray(mt._similarities)[::-1].copy(),
                )
        out = sorted(
            best.values(),
            key=lambda mt: (
                -mt.score,
                int(packed.slice_doc[mt.slice_id]),
                int(packed.slice_idx[mt.slice_id]),
            ),
        )
        return out[:n]

    def _quant_eps(
        self, entry_err: float, pq, norm_total: float, plan=None
    ) -> float:
        floor = (
            self.QUANT_SCORE_EPS
            if plan is None or plan.is_static_only
            else self._ctx_floor(plan)
        )
        return max(
            2.0 * entry_err * max(pq.n_tokens, 1) / max(norm_total, 1e-9),
            floor,
        )

    def _try_exact_cut(
        self, cand, rest_max, plan, pq, gaps, norm_total, metric_name,
        n: int, min_score: float, eps: float, force: bool = False,
        tagw=None, gap_costs=None, boost=None, doc_filter=None,
    ) -> Optional[List["Match"]]:
        """Exact-rescore a candidate set and accept the top-n cut only when
        provably safe: the best approximate score OUTSIDE the set
        (``rest_max``) must be below the exact n-th score minus ``eps``.
        Returns None when unsafe (caller fetches more candidates);
        ``force`` accepts regardless (the set already covers everything).
        ``boost``: [n_slices] per-slice multipliers already present in the
        device ranking — the exact scores apply them too, and the drift
        slack scales with the largest boost."""
        res = self._engine.rescore_many(
            [
                {
                    "slice_ids": cand,
                    "qp": plan,
                    "len_t": pq.n_tokens,
                    "tag_weights": tagw,
                    "want_flows": True,
                }
            ],
            gaps, self._locality, gap_costs=gap_costs,
            doc_filter=doc_filter,
        )[0]
        return self._cut_from_rescore(
            res, cand, rest_max, pq, norm_total, metric_name, n,
            min_score, eps, force=force, boost=boost,
        )

    def _cut_from_rescore(
        self, res, cand, rest_max, pq, norm_total, metric_name,
        n: int, min_score: float, eps: float, force: bool = False,
        boost=None,
    ) -> Optional[List["Match"]]:
        """Cut decision + Match construction from an already-executed
        rescore (the decision half of ``_try_exact_cut``, shared with the
        batched mesh finalize which rescores many queries in one
        ``rescore_many`` round)."""
        mappings, edge_sims, raw = res
        exact = raw / max(norm_total, 1e-9)
        if boost is not None:
            b = np.asarray(boost, np.float32)
            exact = exact * b[np.asarray(cand, np.int64)]
            eps = eps * max(1.0, float(np.max(b)))
        order = order_by_score(self._engine.packed, cand, exact)
        keep = [j for j in order if exact[j] > min_score][:n]
        s_cut = float(exact[keep[-1]]) if keep and len(keep) == n else min_score
        if not force and rest_max >= s_cut - eps:
            return None
        return [
            Match(
                self,
                pq,
                slice_id=cand[j],
                score=float(exact[j]),
                metric=metric_name,
                mapping=mappings[j],
                similarities=edge_sims[j],
            )
            for j in keep
        ]

    def _mesh_shards(self, ms):
        """Bucket arrays sharded over the mesh's slice axis, cached per
        device set (the corpus upload happens once, like the reference's
        per-session document preparation)."""
        key = tuple(str(d) for d in ms.mesh.devices.flat)
        cache = getattr(self, "_mesh_shard_cache", None)
        if cache is None:
            cache = self._mesh_shard_cache = {}
        if key not in cache:
            import jax

            shards = []
            for db in self._engine._device_buckets:
                if db["n"] == 0:
                    continue
                lengths = db["lengths_np"]
                tok_d, len_d = ms.shard_bucket(db["tokens_np"], lengths)
                pad = (-db["pos_np"].shape[0]) % ms.n_devices
                pos_d = jax.device_put(
                    np.pad(db["pos_np"], ((0, pad), (0, 0))), ms._sharded
                )
                tag_d = jax.device_put(
                    np.pad(db["tag_np"], ((0, pad), (0, 0))), ms._sharded
                )
                shards.append((db, tok_d, len_d, pos_d, tag_d))
            cache[key] = shards
        return cache[key]

    def _find_batch_mesh(
        self, prepared, plans, len_ts, norm_totals, tagws, gaps, gap_costs,
        sim_precision, quantize, metric_name, n, min_score, mesh, start_time,
        boosts=None, doc_filter=None, submatch_w=0.0, bidir_q0=None,
    ) -> List[Result]:
        """Mesh-sharded serving batch: every bucket's slice axis is sharded
        over the mesh (SURVEY.md §2.4 — the reference's document ThreadPool
        becomes data parallelism over ICI), Q queries share each shard's
        vocab gather, and the per-query top-k merges over one all-gather.
        Exactness matches the single-chip path: candidates are overfetched
        with a per-query next-best bound and exactly rescored in f32, the
        cut accepted only when provably safe (``_try_exact_cut``).

        Covers the full static-alignment family: tag weighting (f32
        ranking), general (non-affine) gap models, per-query per-slice
        boosts (``boosts``: list of [n_slices] vectors), and document-side
        token filters (compacted in-shard)."""
        import jax
        import jax.numpy as jnp
        from jax.sharding import NamedSharding, PartitionSpec as P

        from vectorian_tpu.ops.search import (
            quantization_entry_err,
            stack_query_tables,
            use_pallas_default,
        )
        from vectorian_tpu.parallel.mesh import MeshSearch

        ms = mesh if isinstance(mesh, MeshSearch) else MeshSearch(mesh)
        shards = self._mesh_shards(ms)
        Q = len(plans)
        sim_dtype = sim_precision if quantize else None
        sim_multi, sim_scale, max_abs_dev, Tpad = stack_query_tables(
            plans, len_ts, sim_dtype
        )
        table = jax.device_put(sim_multi, NamedSharding(ms.mesh, P()))
        lt_arr = jnp.asarray(len_ts, jnp.int32)
        nt_arr = jnp.asarray(norm_totals, jnp.float32)
        up = use_pallas_default()

        with_tags = any(t is not None for t in tagws)
        tw_args = None
        if with_tags:
            # per-query [Tpad, Q] columns, identity for untagged queries
            # (same packing as score_all_multi)
            tw_w = np.ones((Tpad, Q), np.float32)
            tw_p = np.full((Tpad, Q), -1, np.int8)
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
            tw_args = tuple(
                ms.put_replicated(a) for a in (tw_w, tw_p, pen, thr)
            )

        # per-query boost columns -> per-bucket sharded [Npad, Q]
        with_boost = boosts is not None and any(
            b is not None for b in boosts
        )
        with_filter = doc_filter is not None
        flt_args = None
        if with_filter:
            flt_args = tuple(
                ms.put_replicated(a)
                for a in (
                    doc_filter.pos_exclude,
                    doc_filter.tag_exclude,
                    doc_filter.token_exclude,
                )
            )

        entry_err = None
        m = (4 * n + 32) if submatch_w != 0.0 else (n + 32)
        while True:
            pending = []
            complete = True
            for db, tok_d, len_d, pos_d, tag_d in shards:
                # k >= the bucket's total rows makes the merge return every
                # slice (score_topk_multiquery's kout), i.e. full coverage
                complete = complete and m >= tok_d.shape[0]
                gap_vecs = None
                if gap_costs is not None:
                    from vectorian_tpu.ops.search import gap_vec

                    gap_vecs = (
                        ms.put_replicated(
                            gap_vec(gap_costs[0], db["capacity"] + 1)
                        ),
                        ms.put_replicated(gap_vec(gap_costs[1], Tpad + 1)),
                    )
                bst_d = None
                if with_boost:
                    bmat = np.ones((tok_d.shape[0], Q), np.float32)
                    for qi, b in enumerate(boosts):
                        if b is not None:
                            bmat[: db["n"], qi] = b[db["slice_index"]]
                    bst_d = jax.device_put(bmat, ms._sharded)
                out = ms.score_topk_multiquery(
                    tok_d, len_d, table, lt_arr, gaps, nt_arr,
                    locality=self._locality, k=min(m, tok_d.shape[0]),
                    use_pallas=up, sim_scale=sim_scale, with_next=True,
                    pos_ids=pos_d if (with_tags or with_filter) else None,
                    tag_ids=tag_d if with_filter else None,
                    tw_args=tw_args, gap_vecs=gap_vecs, boost=bst_d,
                    flt_args=flt_args,
                    with_tags=with_tags,
                    general_gaps=gap_costs is not None,
                    with_boost=with_boost,
                    with_filter=with_filter,
                )
                pending.append((db, out))
            if entry_err is None:
                # deferred host read overlaps the dispatched shard passes
                entry_err = quantization_entry_err(sim_dtype, max_abs_dev)

            cands = [[] for _ in range(Q)]
            rest_max = np.full((Q,), -np.inf)
            full_scores = (
                np.full((Q, self._engine.packed.n_slices), -1e30, np.float32)
                if complete
                else None
            )
            for db, (s, i, nxt) in pending:
                s, i = np.asarray(s), np.asarray(i)
                rest_max = np.maximum(rest_max, np.asarray(nxt))
                for q in range(Q):
                    valid = (i[q] < db["n"]) & np.isfinite(s[q])
                    sids = db["slice_index"][i[q][valid]]
                    cands[q].extend(int(x) for x in sids)
                    if full_scores is not None:
                        full_scores[q, sids] = s[q][valid]

            live_qis = [q for q, pq in enumerate(prepared) if pq.n_tokens > 0]
            per_q = {}
            retry = False
            if complete:
                # full-coverage round: every device score is on the host —
                # finalize with TIE-BOUNDED extras (a forced cut over all
                # candidates would rescore the corpus); one batched rescore
                # per round across all queries
                f_items = [
                    (
                        full_scores[q], plans[q], prepared[q],
                        norm_totals[q], tagws[q],
                        boosts[q] if boosts is not None else None,
                    )
                    for q in live_qis
                ]
                if submatch_w != 0.0:
                    finalized = self._finalize_submatch_many(
                        f_items, gaps, n, min_score, entry_err,
                        submatch_w, gap_costs=gap_costs,
                        doc_filter=doc_filter,
                    )
                else:
                    finalized = self._finalize_quantized_many(
                        f_items, gaps, metric_name, n, min_score, entry_err,
                        gap_costs=gap_costs, doc_filter=doc_filter,
                    )
                per_q = dict(zip(live_qis, finalized))
            else:
                # one rescore_many round for every query's candidate set;
                # any unsafe cut triggers the full-coverage retry
                res_all = self._engine.rescore_many(
                    [
                        {
                            "slice_ids": cands[q],
                            "qp": plans[q],
                            "len_t": prepared[q].n_tokens,
                            "tag_weights": tagws[q],
                            "want_flows": True,
                        }
                        for q in live_qis
                    ],
                    gaps, self._locality, gap_costs=gap_costs,
                    doc_filter=doc_filter,
                )
                for q, res in zip(live_qis, res_all):
                    eps = self._quant_eps(entry_err, prepared[q], norm_totals[q])
                    if submatch_w != 0.0:
                        matches = self._submatch_cut_from_rescore(
                            res, cands[q], float(rest_max[q]), prepared[q],
                            plans[q], tagws[q], norm_totals[q], n,
                            min_score, eps, submatch_w,
                            boost=boosts[q] if boosts is not None else None,
                        )
                    else:
                        matches = self._cut_from_rescore(
                            res, cands[q], float(rest_max[q]), prepared[q],
                            norm_totals[q], metric_name, n, min_score, eps,
                            boost=boosts[q] if boosts is not None else None,
                        )
                    if matches is None:
                        retry = True
                        break
                    per_q[q] = matches
            if not retry:
                if bidir_q0 is not None:
                    per_q = {
                        q: self._merge_bidirectional(
                            per_q.get(q, []),
                            per_q.get(q + bidir_q0, []),
                            prepared[q],
                            n,
                        )
                        for q in range(bidir_q0)
                        if q in per_q or (q + bidir_q0) in per_q
                    }
                    Q = bidir_q0
                elapsed = time.time() - start_time
                return [
                    Result(self, per_q[q], elapsed)
                    if q in per_q
                    else Result(self, [], 0.0)
                    for q in range(Q)
                ]
            # unsafe cut: ONE full-coverage round — all scores reach the
            # host and the finalize above bounds the rescore by ties
            m = max(tok_d.shape[0] for _, tok_d, _, _, _ in shards)

    def _find_batch_transport(
        self, texts, n: int = 100, min_score: float = 0.2, mesh=None, **kwargs
    ) -> List[Result]:
        """Batched transport search: Q queries share one corpus pass
        (optionally sharded over a device mesh) for relaxed/full WMD and
        WRD over static plans, contextual plans and mixed modifier trees
        alike (stacked per-leaf query axes, search.stack_tree_plans); only
        per-query ``debug`` hooks fall back to exact per-query passes."""
        from vectorian_tpu.ops.wmd import WMDEngine

        a = self._args["alignment"]
        token_sim = self._args["metric"]["token_sim"]
        from vectorian_tpu.sim.token import EmbeddingTokenSim as _ETS

        relaxed = a["algorithm"] == "word-movers-distance" and a.get("relaxed")
        # tag weighting, boosters and doc-side filters now ride the batched
        # transport kernels (tag-weighted sims + (id, tag) BOW identity /
        # in-kernel mass exclusion / in-kernel score multiply), and
        # contextual / mixed static+contextual trees stack per leaf
        # (search.stack_tree_plans) through the plan-stacked transport
        # kernels; only ``debug`` (and the submatch/bidirectional no-ops,
        # which transport metrics ignore like find()) stays per-query
        from vectorian_tpu.sim.modifier import TokenSimilarityModifier

        supported = (
            isinstance(token_sim, (_ETS, TokenSimilarityModifier))
            and not (BATCH_HARD_OPTIONS & set(kwargs))
            and a["algorithm"] in (
                "word-movers-distance", "word-rotators-distance"
            )
        )
        if not supported:
            # per-query debug hooks (and exotic custom token-sim objects)
            # serve single-chip per query — host-side diagnostics; a mesh
            # argument is ignored for them (results stay byte-equal)
            return [
                self.find(t, n=n, min_score=min_score, **kwargs) for t in texts
            ]
        needs_mag = a["algorithm"] == "word-rotators-distance"
        ctx_names = _metric_ctx_names(token_sim)
        for name in sorted(ctx_names):
            self._engine.ensure_contextual(
                name, self._session.documents, self._session._ctx_dims[name]
            )

        start_time = time.time()
        booster = kwargs.get("booster")
        queries, qps, tagws, boosts, order = [], [], [], [], []
        results: List[Optional[Result]] = [None] * len(texts)
        doc_filter = None
        live = []  # (ti, pq, tok_ids_p, strings_p, ctx_p, Tpad)
        for ti, text in enumerate(texts):
            q = self.make_query(text, n=n, min_score=min_score, **kwargs)
            pq = q.prepare(self._nlp)
            if pq.n_tokens == 0:
                results[ti] = Result(self, [], 0.0)
                continue
            tok_ids_p, strings_p, ctx_p, Tpad = _pad_needle(
                pq, self._session, with_ctx=bool(ctx_names),
                ctx_names=ctx_names,
            )
            live.append((ti, pq, tok_ids_p, strings_p, ctx_p, Tpad))
        # batched needle uploads (see _prepare_static_batch)
        pre = preload_leaf_inputs(
            token_sim,
            self._session.compiled_embeddings,
            [(e[2], e[3]) for e in live],
        )
        for (ti, pq, tok_ids_p, strings_p, ctx_p, Tpad), pl in zip(live, pre):
            qp = compile_plan(
                token_sim,
                self._session.compiled_embeddings,
                tok_ids_p,
                strings_p,
                ctx_p,
                needs_magnitudes=needs_mag,
                preloaded=pl,
            )
            queries.append(pq)
            qps.append(qp)
            # per-query tag spec / boost vector (the specs pad to each
            # query's own plan width — the host rescore runs there; the
            # batch kernel packs them to the common Tmax itself)
            tagws.append(self._tag_weighting(pq, width=Tpad))
            boosts.append(
                np.asarray(
                    booster.compile(self._session, self._partition, pq),
                    np.float32,
                )
                if booster is not None
                else None
            )
            if doc_filter is None:
                doc_filter = self._doc_filter(pq)
            order.append(ti)
        if queries:
            wmd = WMDEngine(self._engine, a)
            match_lists = wmd.find_batch(
                self, queries, qps, n, min_score, mesh=mesh,
                tagws=tagws,
                boosts=boosts if booster is not None else None,
                doc_filter=doc_filter,
            )
            dur = time.time() - start_time
            for ti, ml in zip(order, match_lists):
                results[ti] = Result(self, ml, dur)
        return [r if r is not None else Result(self, [], 0.0) for r in results]

    def _find_batch_tree(
        self, texts, n: int = 100, min_score: float = 0.2, mesh=None, **kwargs
    ) -> List[Result]:
        """Batched search over a MIXED static+contextual modifier tree:
        every leaf evaluates against the Q-stacked query axis in one
        corpus pass (stacked [V, T*Q] static tables + [T*Q, d] contextual
        query matrices — ops/search.stack_tree_plans), the modifier ops
        vectorize elementwise, and the finalizer exactly rescores under
        the contextual membership floor.  Closes the round-2 exclusion:
        the reference serves every metric uniformly through its document
        ThreadPool (index.py:530-560, modifier factory
        metric/modifier.cpp:18-74).  Boosters, doc-side filters,
        ``submatch_weight`` and ``bidirectional`` all ride the batch (same
        mechanisms as the static path)."""
        submatch_w = float(kwargs.get("submatch_weight") or 0.0)
        bidirectional = bool(kwargs.get("bidirectional"))
        booster = kwargs.get("booster")
        token_sim = self._args["metric"]["token_sim"]
        ctx_names = _metric_ctx_names(token_sim)
        for name in sorted(ctx_names):
            self._engine.ensure_contextual(
                name, self._session.documents, self._session._ctx_dims[name]
            )
        gaps = self._affine_gaps()
        if gaps is None:
            gap_costs = (self._gap_s, self._gap_t)
            gaps = AffineGapParams.of(0, 0, 0, 0)  # unused placeholder
        else:
            gap_costs = None

        start_time = time.time()
        prepared, plans, len_ts, norm_totals, tagws = [], [], [], [], []
        order, results = [], [None] * len(texts)
        padded = []
        for ti, text in enumerate(texts):
            q = self.make_query(text, n=n, min_score=min_score, **kwargs)
            pq = q.prepare(self._nlp)
            if pq.n_tokens == 0:
                results[ti] = Result(self, [], 0.0)
                continue
            order.append(ti)
            prepared.append(pq)
            padded.append(_pad_needle(pq, self._session, ctx_names=ctx_names))
        # batched static-leaf uploads (see _prepare_static_batch); the ctx
        # leaves keep their per-query vectors
        pre = preload_leaf_inputs(
            token_sim,
            self._session.compiled_embeddings,
            [(p[0], p[1]) for p in padded],
        )
        for pq, (tok_ids_p, strings_p, ctx_p, Tpad), pl in zip(
            prepared, padded, pre
        ):
            qp = compile_plan(
                token_sim,
                self._session.compiled_embeddings,
                tok_ids_p,
                strings_p,
                ctx_p,
                preloaded=pl,
            )
            plans.append(qp)
            len_ts.append(max(pq.n_tokens, 1))
            tagw = self._tag_weighting(pq, width=Tpad)
            tagws.append(tagw)
            norm_totals.append(
                tagw.total if tagw is not None else float(max(pq.n_tokens, 1))
            )
        if not prepared:
            return [
                r if r is not None else Result(self, [], 0.0) for r in results
            ]

        boosts = (
            [
                np.asarray(
                    booster.compile(self._session, self._partition, pq),
                    np.float32,
                )
                for pq in prepared
            ]
            if booster is not None
            else None
        )
        doc_filter = None
        if {"pos_filter", "tag_filter", "token_filter"} & set(kwargs):
            doc_filter = self._doc_filter(prepared[0])

        # bidirectional: reversed-needle subqueries ride the same stacked
        # leaf tables (static columns and ctx rows both reverse)
        Q0 = len(prepared)
        if bidirectional:
            plans = plans + [
                _reverse_plan(qp, max(pq.n_tokens, 1))
                for qp, pq in zip(plans, prepared)
            ]
            tagws = tagws + [
                _reverse_tagw(tw, max(pq.n_tokens, 1)) if tw else None
                for tw, pq in zip(tagws, prepared)
            ]
            prepared = prepared + prepared
            len_ts = len_ts + len_ts
            norm_totals = norm_totals + norm_totals
            if boosts is not None:
                boosts = boosts + boosts

        if mesh is not None:
            ms_results = self._find_batch_tree_mesh(
                token_sim, prepared, plans, len_ts, norm_totals, gaps,
                gap_costs, n, min_score, mesh, start_time, boosts=boosts,
                doc_filter=doc_filter, submatch_w=submatch_w,
                bidir_q0=Q0 if bidirectional else None, tagws=tagws,
            )
            for qi, r in enumerate(ms_results):
                results[order[qi]] = r
            return [
                r if r is not None else Result(self, [], 0.0) for r in results
            ]

        any_tags = any(t is not None for t in tagws)
        scores = self._engine.score_all_multi_tree(
            plans, len_ts, gaps, self._locality, norm_totals,
            gap_costs=gap_costs, doc_filter=doc_filter,
            tag_weights=tagws if any_tags else None,
        )  # [n_slices, Q]
        items = [
            (
                _boosted_col(
                    scores[:, qi],
                    boosts[qi] if boosts is not None else None,
                ),
                plans[qi], pq, norm_totals[qi], tagws[qi],
                boosts[qi] if boosts is not None else None,
            )
            for qi, pq in enumerate(prepared)
        ]
        if submatch_w != 0.0:
            per_q = self._finalize_submatch_many(
                items, gaps, n, min_score, 0.0, submatch_w,
                gap_costs=gap_costs, doc_filter=doc_filter,
            )
        else:
            per_q = self._finalize_quantized_many(
                items, gaps, token_sim.name, n, min_score, 0.0,
                gap_costs=gap_costs, doc_filter=doc_filter,
            )
        matches_by_qi = dict(enumerate(per_q))
        if bidirectional:
            matches_by_qi = {
                qi: self._merge_bidirectional(
                    matches_by_qi.get(qi, []),
                    matches_by_qi.get(qi + Q0, []),
                    prepared[qi],
                    n,
                )
                for qi in range(Q0)
            }
        elapsed = time.time() - start_time
        for qi in range(Q0):
            results[order[qi]] = Result(
                self, matches_by_qi.get(qi, []), elapsed
            )
        return [r if r is not None else Result(self, [], 0.0) for r in results]

    def _find_batch_tree_mesh(
        self, token_sim, prepared, plans, len_ts, norm_totals, gaps,
        gap_costs, n, min_score, mesh, start_time, boosts=None,
        doc_filter=None, submatch_w=0.0, bidir_q0=None, tagws=None,
    ) -> List[Result]:
        """Mesh-sharded mixed-tree serving batch: token buckets AND every
        contextual bucket store shard over the slice axis, the stacked
        leaf tables replicate, and each shard runs the same tree
        evaluation + multi DP as the single-chip kernel before the
        per-query top-k all-gather merge.  Per-query tag weighting rides
        the shard kernels (same packing as the static mesh batch)."""
        import jax.numpy as jnp

        from vectorian_tpu.ops.search import gap_vec, stack_tree_plans
        from vectorian_tpu.parallel.mesh import MeshSearch

        ms = mesh if isinstance(mesh, MeshSearch) else MeshSearch(mesh)
        ctx_names = plans[0].ctx_names
        tok_shards = self._mesh_shards(ms)
        ctx_shards = [self._ctx_mesh_shards(ms, nm) for nm in ctx_names]
        Q = len(prepared)
        statics, ctx_qs, weights, Tpad = stack_tree_plans(plans, len_ts)
        statics = tuple(ms.put_replicated(np.asarray(t)) for t in statics)
        ctx_qs = tuple(
            {k: ms.put_replicated(np.asarray(v)) for k, v in d.items()}
            for d in ctx_qs
        )
        lt_arr = jnp.asarray(len_ts, jnp.int32)
        nt_arr = jnp.asarray(norm_totals, jnp.float32)
        with_boost = boosts is not None and any(
            b is not None for b in boosts
        )
        with_filter = doc_filter is not None
        flt_args = (
            tuple(
                ms.put_replicated(a)
                for a in (
                    doc_filter.pos_exclude,
                    doc_filter.tag_exclude,
                    doc_filter.token_exclude,
                )
            )
            if with_filter
            else None
        )
        if tagws is None:
            tagws = [None] * Q
        with_tags = any(t is not None for t in tagws)
        tw_args = None
        if with_tags:
            tw_w = np.ones((Tpad, Q), np.float32)
            tw_p = np.full((Tpad, Q), -1, np.int8)
            pen = np.zeros((Q,), np.float32)
            thr = np.full((Q,), -1.0, np.float32)
            for qi, tw in enumerate(tagws):
                if tw is None:
                    continue
                t = min(len(tw.t_pos_weights), Tpad)
                tw_w[:t, qi] = tw.t_pos_weights[:t]
                tw_p[:t, qi] = tw.pos_t[:t]
                pen[qi] = tw.pos_mismatch_penalty
                thr[qi] = tw.similarity_threshold
            tw_args = tuple(
                ms.put_replicated(a) for a in (tw_w, tw_p, pen, thr)
            )

        m = (4 * n + 32) if submatch_w != 0.0 else (n + 32)
        while True:
            pending = []
            complete = True
            for si, (db, tok_d, len_d, pos_d, tag_d) in enumerate(tok_shards):
                complete = complete and m >= tok_d.shape[0]
                gap_vecs = None
                if gap_costs is not None:
                    gap_vecs = (
                        ms.put_replicated(
                            gap_vec(gap_costs[0], db["capacity"] + 1)
                        ),
                        ms.put_replicated(gap_vec(gap_costs[1], Tpad + 1)),
                    )
                ctx_ds = tuple(cs[si][1] for cs in ctx_shards)
                bst_d = None
                if with_boost:
                    import jax

                    bmat = np.ones((tok_d.shape[0], Q), np.float32)
                    for qi, b in enumerate(boosts):
                        if b is not None:
                            bmat[: db["n"], qi] = b[db["slice_index"]]
                    bst_d = jax.device_put(bmat, ms._sharded)
                out = ms.tree_score_topk_multiquery(
                    plans[0].plan, tok_d, len_d, ctx_ds, statics,
                    tuple(plans[0].static_mags), ctx_qs, weights,
                    lt_arr, gaps, nt_arr,
                    locality=self._locality, k=min(m, tok_d.shape[0]),
                    with_next=True, gap_vecs=gap_vecs,
                    general_gaps=gap_costs is not None,
                    boost=bst_d, with_boost=with_boost,
                    pos_ids=pos_d if (with_filter or with_tags) else None,
                    tag_ids=tag_d if (with_filter or with_tags) else None,
                    flt_args=flt_args, with_filter=with_filter,
                    tw_args=tw_args, with_tags=with_tags,
                )
                pending.append((db, out))

            cands = [[] for _ in range(Q)]
            rest_max = np.full((Q,), -np.inf)
            full_scores = (
                np.full((Q, self._engine.packed.n_slices), -1e30, np.float32)
                if complete
                else None
            )
            for db, (s, i, nxt) in pending:
                s, i = np.asarray(s), np.asarray(i)
                rest_max = np.maximum(rest_max, np.asarray(nxt))
                for q in range(Q):
                    valid = (i[q] < db["n"]) & np.isfinite(s[q])
                    sids = db["slice_index"][i[q][valid]]
                    cands[q].extend(int(x) for x in sids)
                    if full_scores is not None:
                        full_scores[q, sids] = s[q][valid]

            per_q = {}
            retry = False
            if complete:
                f_items = [
                    (
                        full_scores[q], plans[q], pq, norm_totals[q],
                        tagws[q],
                        boosts[q] if boosts is not None else None,
                    )
                    for q, pq in enumerate(prepared)
                ]
                if submatch_w != 0.0:
                    finalized = self._finalize_submatch_many(
                        f_items, gaps, n, min_score, 0.0, submatch_w,
                        gap_costs=gap_costs, doc_filter=doc_filter,
                    )
                else:
                    finalized = self._finalize_quantized_many(
                        f_items, gaps, token_sim.name, n, min_score, 0.0,
                        gap_costs=gap_costs, doc_filter=doc_filter,
                    )
                per_q = dict(enumerate(finalized))
            else:
                res_all = self._engine.rescore_many(
                    [
                        {
                            "slice_ids": cands[q],
                            "qp": plans[q],
                            "len_t": pq.n_tokens,
                            "tag_weights": tagws[q],
                            "want_flows": True,
                        }
                        for q, pq in enumerate(prepared)
                    ],
                    gaps, self._locality, gap_costs=gap_costs,
                    doc_filter=doc_filter,
                )
                for (q, pq), res in zip(enumerate(prepared), res_all):
                    eps = self._quant_eps(
                        0.0, pq, norm_totals[q], plan=plans[q]
                    )
                    if submatch_w != 0.0:
                        matches = self._submatch_cut_from_rescore(
                            res, cands[q], float(rest_max[q]), pq,
                            plans[q], tagws[q], norm_totals[q], n,
                            min_score, eps, submatch_w,
                            boost=boosts[q] if boosts is not None else None,
                        )
                    else:
                        matches = self._cut_from_rescore(
                            res, cands[q], float(rest_max[q]), pq,
                            norm_totals[q], token_sim.name, n, min_score,
                            eps,
                            boost=boosts[q] if boosts is not None else None,
                        )
                    if matches is None:
                        retry = True
                        break
                    per_q[q] = matches
            if not retry:
                if bidir_q0 is not None:
                    per_q = {
                        q: self._merge_bidirectional(
                            per_q.get(q, []),
                            per_q.get(q + bidir_q0, []),
                            prepared[q],
                            n,
                        )
                        for q in range(bidir_q0)
                    }
                    Q = bidir_q0
                elapsed = time.time() - start_time
                return [
                    Result(self, per_q.get(q, []), elapsed)
                    for q in range(Q)
                ]
            # unsafe: one full-coverage round (see _find_batch_mesh)
            m = max(tok_d.shape[0] for _, tok_d, *_ in tok_shards)

    def _find_batch_ctx(
        self, texts, n: int = 100, min_score: float = 0.2, mesh=None, **kwargs
    ) -> List[Result]:
        """Batched search over ONE contextual embedding: the per-chunk
        metric evaluation becomes a single GEMM against the Q stacked query
        matrices (the contextual analogue of the static table batching).
        With ``mesh`` the [N, L, d] bucket stores shard over the device
        mesh and per-query top-k merges over one all-gather.  Boosters,
        doc-side filters, ``submatch_weight`` and ``bidirectional`` all
        ride the batch (same mechanisms as the static path: in-kernel
        compaction, closed-form submatch overfetch, reversed-needle
        subqueries); only ``BATCH_HARD_OPTIONS`` delegate."""
        submatch_w = float(kwargs.get("submatch_weight") or 0.0)
        bidirectional = bool(kwargs.get("bidirectional"))
        if BATCH_HARD_OPTIONS & set(kwargs):
            # debug hooks: single-chip per-query on every path (host-side
            # diagnostics; a mesh argument is ignored for them)
            return [
                self.find(t, n=n, min_score=min_score, **kwargs) for t in texts
            ]
        booster = kwargs.get("booster")
        token_sim = self._args["metric"]["token_sim"]
        emb = token_sim.embeddings[0]
        name = emb.name
        self._engine.ensure_contextual(
            name, self._session.documents, self._session._ctx_dims[name]
        )
        gaps = self._affine_gaps()
        if gaps is None:
            gap_costs = (self._gap_s, self._gap_t)
            gaps = AffineGapParams.of(0, 0, 0, 0)  # unused placeholder
        else:
            gap_costs = None

        start_time = time.time()
        prepared, plans, len_ts, norm_totals, ctx_qs = [], [], [], [], []
        order, results = [], [None] * len(texts)
        for ti, text in enumerate(texts):
            q = self.make_query(text, n=n, min_score=min_score, **kwargs)
            pq = q.prepare(self._nlp)
            if pq.n_tokens == 0:
                results[ti] = Result(self, [], 0.0)
                continue
            order.append(ti)
            prepared.append(pq)
            # padded needle, like find(): plan width changes the leaf
            # einsum tiling and therefore its f32 rounding
            tok_ids_p, strings_p, ctx_p, _ = _pad_needle(
                pq, self._session, ctx_names={name}
            )
            ctx_qs.append(ctx_p[name])
            qp = compile_plan(
                token_sim,
                self._session.compiled_embeddings,
                tok_ids_p,
                strings_p,
                ctx_p,
            )
            plans.append(qp)
            len_ts.append(max(pq.n_tokens, 1))
            norm_totals.append(float(max(pq.n_tokens, 1)))

        if not prepared:
            return [r if r is not None else Result(self, [], 0.0) for r in results]

        boosts = (
            [
                np.asarray(
                    booster.compile(self._session, self._partition, pq),
                    np.float32,
                )
                for pq in prepared
            ]
            if booster is not None
            else None
        )
        doc_filter = None
        if {"pos_filter", "tag_filter", "token_filter"} & set(kwargs):
            doc_filter = self._doc_filter(prepared[0])

        # bidirectional: reversed-needle subqueries ride the same stacked
        # query matrix; per-query halves merge by exact score afterwards
        # (same mechanism as the static batch, reference query.cpp:81-84)
        Q0 = len(prepared)
        if bidirectional:
            plans = plans + [
                _reverse_plan(qp, max(pq.n_tokens, 1))
                for qp, pq in zip(plans, prepared)
            ]
            ctx_qs = ctx_qs + [
                _reverse_ctx_query(d, max(pq.n_tokens, 1))
                for d, pq in zip(ctx_qs, prepared)
            ]
            prepared = prepared + prepared
            len_ts = len_ts + len_ts
            norm_totals = norm_totals + norm_totals
            if boosts is not None:
                boosts = boosts + boosts

        if mesh is not None:
            ms_results = self._find_batch_ctx_mesh(
                name, token_sim, prepared, plans, ctx_qs, len_ts,
                norm_totals, gaps, gap_costs, n, min_score, mesh, start_time,
                boosts=boosts, doc_filter=doc_filter, submatch_w=submatch_w,
                bidir_q0=Q0 if bidirectional else None,
            )
            for qi, r in enumerate(ms_results):
                results[order[qi]] = r
            return [
                r if r is not None else Result(self, [], 0.0) for r in results
            ]

        scores = self._engine.score_all_multi_ctx(
            name, token_sim.metric, ctx_qs, len_ts, gaps, self._locality,
            norm_totals, gap_costs=gap_costs, doc_filter=doc_filter,
        )  # [n_slices, Q]

        # finalizer-exact scores under the contextual membership floor
        # (the batched and per-slice einsums reduce in different orders,
        # so the ranking drift is larger than static ulp); all queries
        # finalize through ONE batched rescore per round
        items = [
            (
                _boosted_col(
                    scores[:, qi],
                    boosts[qi] if boosts is not None else None,
                ),
                plans[qi], pq, norm_totals[qi], None,
                boosts[qi] if boosts is not None else None,
            )
            for qi, pq in enumerate(prepared)
        ]
        if submatch_w != 0.0:
            per_q = self._finalize_submatch_many(
                items, gaps, n, min_score, 0.0, submatch_w,
                gap_costs=gap_costs, doc_filter=doc_filter,
            )
        else:
            per_q = self._finalize_quantized_many(
                items, gaps, token_sim.name, n, min_score, 0.0,
                gap_costs=gap_costs, doc_filter=doc_filter,
            )
        matches_by_qi = dict(enumerate(per_q))
        if bidirectional:
            matches_by_qi = {
                qi: self._merge_bidirectional(
                    matches_by_qi.get(qi, []),
                    matches_by_qi.get(qi + Q0, []),
                    prepared[qi],
                    n,
                )
                for qi in range(Q0)
            }
        elapsed = time.time() - start_time
        for qi in range(Q0):
            results[order[qi]] = Result(self, matches_by_qi.get(qi, []), elapsed)
        return [r if r is not None else Result(self, [], 0.0) for r in results]

    def _ctx_mesh_shards(self, ms, name: str):
        """[Npad, L, d] contextual bucket stores sharded over the mesh's
        slice axis (cached per device set + embedding, like _mesh_shards)."""
        import jax

        key = (tuple(str(d) for d in ms.mesh.devices.flat), name)
        cache = getattr(self, "_ctx_mesh_shard_cache", None)
        if cache is None:
            cache = self._ctx_mesh_shard_cache = {}
        if key not in cache:
            shards = []
            stores = self._engine._ctx_stores[name]
            for db, store in zip(
                [d for d in self._engine._device_buckets], stores
            ):
                if db["n"] == 0:
                    continue
                arr = np.asarray(store)
                pad = (-arr.shape[0]) % ms.n_devices
                arr = np.pad(arr, ((0, pad), (0, 0), (0, 0)))
                ln = np.pad(
                    db["lengths_np"], (0, pad)
                )
                shards.append(
                    (
                        db,
                        jax.device_put(arr, ms._sharded),
                        jax.device_put(ln, ms._sharded),
                    )
                )
            cache[key] = shards
        return cache[key]

    def _find_batch_ctx_mesh(
        self, name, token_sim, prepared, plans, ctx_qs, len_ts, norm_totals,
        gaps, gap_costs, n, min_score, mesh, start_time, boosts=None,
        doc_filter=None, submatch_w=0.0, bidir_q0=None,
    ) -> List[Result]:
        """Mesh-sharded contextual serving batch: sharded [N, L, d] bucket
        stores, one replicated stacked-query GEMM per shard, per-query
        top-k merge, exact per-slice rescore under the provable cut
        (BASELINE's mixed-contextual multi-chip configuration).  Doc-side
        filters compact in-shard (token shards ride along), submatch
        overfetches 4n under the closed-form bound, bidirectional halves
        are already stacked by the caller and merge here."""
        import jax.numpy as jnp

        from vectorian_tpu.ops.search import stack_ctx_queries
        from vectorian_tpu.parallel.mesh import MeshSearch

        ms = mesh if isinstance(mesh, MeshSearch) else MeshSearch(mesh)
        shards = self._ctx_mesh_shards(ms, name)
        with_filter = doc_filter is not None
        tok_shards = self._mesh_shards(ms) if with_filter else None
        flt_args = (
            tuple(
                ms.put_replicated(a)
                for a in (
                    doc_filter.pos_exclude,
                    doc_filter.tag_exclude,
                    doc_filter.token_exclude,
                )
            )
            if with_filter
            else None
        )
        Q = len(prepared)
        q_unmod, q_norm, q_mags, Tpad = stack_ctx_queries(ctx_qs, len_ts)
        q_unmod = ms.put_replicated(np.asarray(q_unmod))
        q_norm = ms.put_replicated(np.asarray(q_norm))
        q_mags = ms.put_replicated(np.asarray(q_mags))
        lt_arr = jnp.asarray(len_ts, jnp.int32)
        nt_arr = jnp.asarray(norm_totals, jnp.float32)
        Qb = len(plans)
        with_boost = boosts is not None and any(
            b is not None for b in boosts
        )

        m = (4 * n + 32) if submatch_w != 0.0 else (n + 32)
        while True:
            pending = []
            complete = True
            for si, (db, ctx_d, len_d) in enumerate(shards):
                complete = complete and m >= ctx_d.shape[0]
                gap_vecs = None
                if gap_costs is not None:
                    from vectorian_tpu.ops.search import gap_vec

                    gap_vecs = (
                        ms.put_replicated(
                            gap_vec(gap_costs[0], db["capacity"] + 1)
                        ),
                        ms.put_replicated(gap_vec(gap_costs[1], Tpad + 1)),
                    )
                bst_d = None
                if with_boost:
                    import jax

                    bmat = np.ones((ctx_d.shape[0], Qb), np.float32)
                    for qi, b in enumerate(boosts):
                        if b is not None:
                            bmat[: db["n"], qi] = b[db["slice_index"]]
                    bst_d = jax.device_put(bmat, ms._sharded)
                tok_d = pos_d = tag_d = None
                if with_filter:
                    _, tok_d, _, pos_d, tag_d = tok_shards[si]
                out = ms.ctx_score_topk_multiquery(
                    ctx_d, len_d, q_norm, q_unmod, q_mags, lt_arr, gaps,
                    nt_arr, metric=token_sim.metric,
                    locality=self._locality, k=min(m, ctx_d.shape[0]),
                    with_next=True, gap_vecs=gap_vecs,
                    general_gaps=gap_costs is not None,
                    boost=bst_d, with_boost=with_boost,
                    token_ids=tok_d, pos_ids=pos_d, tag_ids=tag_d,
                    flt_args=flt_args, with_filter=with_filter,
                )
                pending.append((db, out))

            cands = [[] for _ in range(Q)]
            rest_max = np.full((Q,), -np.inf)
            full_scores = (
                np.full((Q, self._engine.packed.n_slices), -1e30, np.float32)
                if complete
                else None
            )
            for db, (s, i, nxt) in pending:
                s, i = np.asarray(s), np.asarray(i)
                rest_max = np.maximum(rest_max, np.asarray(nxt))
                for q in range(Q):
                    valid = (i[q] < db["n"]) & np.isfinite(s[q])
                    sids = db["slice_index"][i[q][valid]]
                    cands[q].extend(int(x) for x in sids)
                    if full_scores is not None:
                        full_scores[q, sids] = s[q][valid]

            per_q = {}
            retry = False
            if complete:
                # full-coverage round: finalize with tie-bounded extras,
                # one batched rescore per round across all queries
                f_items = [
                    (
                        full_scores[q], plans[q], pq, norm_totals[q],
                        None,
                        boosts[q] if boosts is not None else None,
                    )
                    for q, pq in enumerate(prepared)
                ]
                if submatch_w != 0.0:
                    finalized = self._finalize_submatch_many(
                        f_items, gaps, n, min_score, 0.0, submatch_w,
                        gap_costs=gap_costs, doc_filter=doc_filter,
                    )
                else:
                    finalized = self._finalize_quantized_many(
                        f_items, gaps, token_sim.name, n, min_score, 0.0,
                        gap_costs=gap_costs, doc_filter=doc_filter,
                    )
                per_q = dict(enumerate(finalized))
            else:
                res_all = self._engine.rescore_many(
                    [
                        {
                            "slice_ids": cands[q],
                            "qp": plans[q],
                            "len_t": pq.n_tokens,
                            "tag_weights": None,
                            "want_flows": True,
                        }
                        for q, pq in enumerate(prepared)
                    ],
                    gaps, self._locality, gap_costs=gap_costs,
                    doc_filter=doc_filter,
                )
                for (q, pq), res in zip(enumerate(prepared), res_all):
                    eps = self._quant_eps(
                        0.0, pq, norm_totals[q], plan=plans[q]
                    )
                    if submatch_w != 0.0:
                        matches = self._submatch_cut_from_rescore(
                            res, cands[q], float(rest_max[q]), pq,
                            plans[q], None, norm_totals[q], n,
                            min_score, eps, submatch_w,
                            boost=boosts[q] if boosts is not None else None,
                        )
                    else:
                        matches = self._cut_from_rescore(
                            res, cands[q], float(rest_max[q]), pq,
                            norm_totals[q], token_sim.name, n, min_score,
                            eps,
                            boost=boosts[q] if boosts is not None else None,
                        )
                    if matches is None:
                        retry = True
                        break
                    per_q[q] = matches
            if not retry:
                if bidir_q0 is not None:
                    per_q = {
                        q: self._merge_bidirectional(
                            per_q.get(q, []),
                            per_q.get(q + bidir_q0, []),
                            prepared[q],
                            n,
                        )
                        for q in range(bidir_q0)
                    }
                    Q = bidir_q0
                elapsed = time.time() - start_time
                return [
                    Result(self, per_q.get(q, []), elapsed)
                    for q in range(Q)
                ]
            # unsafe: one full-coverage round (see _find_batch_mesh)
            m = max(ctx_d.shape[0] for _, ctx_d, _ in shards)

    def _find_transport(self, query: PreparedQuery) -> List[Match]:
        from vectorian_tpu.ops.wmd import WMDEngine

        token_sim = self._args["metric"]["token_sim"]
        needs_mag = self._args["alignment"]["algorithm"] == "word-rotators-distance"
        # needle padded to a length bucket (see _pad_needle): transport
        # kernels mask zero-mass entries
        tok_ids_p, strings_p, ctx_q, Tpad = _pad_needle(
            query, self._session, ctx_names=_metric_ctx_names(token_sim)
        )
        qp = compile_plan(
            token_sim,
            self._session.compiled_embeddings,
            tok_ids_p,
            strings_p,
            ctx_q,
            needs_magnitudes=needs_mag,
        )
        for name in qp.ctx_names:
            self._engine.ensure_contextual(
                name, self._session.documents, self._session._ctx_dims[name]
            )
        engine = WMDEngine(self._engine, self._args["alignment"])
        return engine.find(self, query, qp)


class SpanEncoderIndex(Index):
    """Span-embedding search: encode all slices once, then query = one GEMM
    + top-k (reference SpanEncoderIndex index.py:679-730; also subsumes
    FaissCosineIndex :733-767 — brute-force GEMM beats an ANN index at
    corpus sizes where both fit in HBM)."""

    def __init__(self, partition, span_sim, nlp=None, **kwargs):
        super().__init__(partition, nlp=nlp)
        self._span_sim = span_sim
        self._encoder = span_sim.embedding.create_encoder(self._session)
        self._corpus_vecs = None

    def _corpus_vectors(self):
        if self._corpus_vecs is None:
            self._corpus_vecs = self._encoder.encode_corpus(
                self._session, self._partition
            )
        return self._corpus_vecs

    def save(self, path):
        """Persist the encoded corpus vectors WITH provenance metadata
        (reference SpanEncoderIndex.save npy dump, index.py:638-658 — the
        load half there was commented out; here load validates the dump
        against the live corpus so a stale or foreign file can never be
        silently searched)."""
        np.savez(
            path,
            vectors=np.asarray(self._corpus_vectors().unmodified),
            corpus_digest=np.asarray(self._session._corpus_digest()),
            partition=np.asarray(
                [
                    self._partition.level,
                    str(self._partition.window_size),
                    str(self._partition.window_step),
                ]
            ),
            encoder=np.asarray(getattr(self._encoder, "name", "")),
        )

    def load(self, path):
        from vectorian_tpu.embedding.vectors import Vectors

        data = np.load(path, allow_pickle=False)
        if hasattr(data, "files"):  # .npz with provenance
            want = (
                str(self._session._corpus_digest()),
                [
                    self._partition.level,
                    str(self._partition.window_size),
                    str(self._partition.window_step),
                ],
                str(getattr(self._encoder, "name", "")),
            )
            got = (
                str(data["corpus_digest"]),
                [str(x) for x in data["partition"]],
                str(data["encoder"]),
            )
            if got != want:
                raise ValueError(
                    f"span-index dump {path} does not match this index: "
                    f"saved {got}, live {want}"
                )
            vecs = data["vectors"]
        else:  # legacy raw .npy array
            vecs = data
        if vecs.shape[0] != self.packed.n_slices:
            raise ValueError(
                f"span-index dump has {vecs.shape[0]} rows, corpus has "
                f"{self.packed.n_slices} slices"
            )
        self._corpus_vecs = Vectors(vecs)
        return self

    def _find(self, query: PreparedQuery) -> List[Match]:
        opts = query.options
        n = int(opts.get("max_matches", 100))
        min_score = float(opts.get("min_score", 0.2))
        qv = self._encoder.encode_text(query.text)  # Vectors [1, d]
        return self._topk_from_query_vectors(qv, query, n, min_score)[0]

    def _topk_from_query_vectors(self, qv, queries, n, min_score):
        """[S, Q] metric GEMM + per-query top-k.  ``queries`` is one
        PreparedQuery or a list of Q of them (batched serving: Q query
        vectors share one corpus GEMM)."""
        single = not isinstance(queries, list)
        qlist = [queries] if single else queries
        corpus_vecs = self._corpus_vectors()  # Vectors [S, d]
        sims = np.asarray(
            self._span_sim.vector_sim.compute(corpus_vecs, qv)
        )  # [S, Q]
        out_all = []
        for qi, query in enumerate(qlist):
            col = sims[:, qi]
            k = min(n, col.shape[0])
            if k <= 0:
                out_all.append([])
                continue
            # candidate pool = everything scoring >= the k-th largest value
            # so boundary ties resolve by the reference (doc, slice) order
            # (same rationale as BruteForceEngine.top_k)
            thr = -np.partition(-col, k - 1)[k - 1]
            cand = np.flatnonzero(col >= thr)
            order = order_by_score(self.packed, cand, col[cand])
            out = []
            for sid in cand[order]:
                score = float(col[sid])
                if score <= min_score:  # strict, like the reference
                    continue
                out.append(
                    Match(
                        self,
                        query,
                        slice_id=int(sid),
                        score=score,
                        metric=self._span_sim.vector_sim.name,
                        level="span",
                    )
                )
            out_all.append(out[:n])
        return out_all

    def find_batch(
        self, texts: List[str], n: int = 100, min_score: float = 0.2, **kwargs
    ) -> List[Result]:
        """Batched span-encoder search: Q query spans encode and score in
        ONE corpus GEMM (the span-level analogue of the brute-force
        multi-query batching)."""
        from vectorian_tpu.embedding.vectors import Vectors

        start_time = time.time()
        prepared, qvs = [], []
        for text in texts:
            q = self.make_query(text, n=n, min_score=min_score, **kwargs)
            prepared.append(q.prepare(self._nlp))
            qvs.append(self._encoder.encode_text(text))
        stacked = Vectors(
            np.concatenate([np.asarray(v.unmodified) for v in qvs], axis=0)
        )
        matches = self._topk_from_query_vectors(stacked, prepared, n, min_score)
        return [
            Result(self, ms, time.time() - start_time) for ms in matches
        ]


class ApproximateSpanIndex(SpanEncoderIndex):
    """IVF-style sub-linear span search (the reference's Faiss factory
    option, index.py:753-765, rebuilt without faiss): k-means coarse
    centroids over the normalized span vectors; a query scores the
    ``nlist`` centroids (one small GEMM), takes the ``nprobe`` nearest
    lists, and exactly rescores ONLY their members with the configured
    vector metric.

    APPROXIMATE by construction — a true neighbor assigned to an unprobed
    list is missed (same contract as the reference's Faiss path; recall
    rises with nprobe, nprobe=nlist degenerates to exact).  The exact
    GEMM index (SpanEncoderIndex) stays the default: brute force wins
    while the span matrix fits in HBM; this covers very large span sets."""

    def __init__(
        self, partition, span_sim, nlp=None, nlist: int = 64,
        nprobe: int = 8, **kwargs,
    ):
        super().__init__(partition, span_sim, nlp=nlp, **kwargs)
        self._nlist = int(nlist)
        self._nprobe = int(nprobe)
        self._centroids = None  # [nlist, d] L2-normalized
        self._invlists = None  # list of np.ndarray slice ids

    def _train(self):
        if self._centroids is not None:
            return
        vecs = np.asarray(self._corpus_vectors().normalized, np.float32)
        S = vecs.shape[0]
        nlist = max(1, min(self._nlist, S))
        rng = np.random.default_rng(0)
        cent = vecs[rng.choice(S, size=nlist, replace=False)].copy()
        for _ in range(10):  # spherical k-means (cosine coarse quantizer)
            assign = np.argmax(vecs @ cent.T, axis=1)
            for c in range(nlist):
                m = vecs[assign == c]
                if len(m):
                    v = m.sum(axis=0)
                    cent[c] = v / max(np.linalg.norm(v), 1e-9)
        assign = np.argmax(vecs @ cent.T, axis=1)
        self._centroids = cent
        self._invlists = [
            np.flatnonzero(assign == c).astype(np.int64)
            for c in range(nlist)
        ]

    def _shortlist(self, q_normed: np.ndarray) -> np.ndarray:
        self._train()
        nprobe = max(1, min(self._nprobe, len(self._invlists)))
        sims = self._centroids @ q_normed
        probes = np.argpartition(-sims, nprobe - 1)[:nprobe]
        lists = [self._invlists[int(c)] for c in probes]
        return np.concatenate(lists) if lists else np.zeros((0,), np.int64)

    def _topk_from_query_vectors(self, qv, queries, n, min_score):
        from vectorian_tpu.embedding.vectors import Vectors

        single = not isinstance(queries, list)
        qlist = [queries] if single else queries
        corpus_vecs = self._corpus_vectors()
        q_norm = np.asarray(qv.normalized, np.float32)
        out_all = []
        for qi, query in enumerate(qlist):
            cand = self._shortlist(q_norm[qi])
            if cand.size == 0:
                out_all.append([])
                continue
            sub = Vectors(np.asarray(corpus_vecs.unmodified)[cand])
            col = np.asarray(
                self._span_sim.vector_sim.compute(
                    sub, Vectors(np.asarray(qv.unmodified)[qi : qi + 1])
                )
            )[:, 0]
            k = min(n, col.shape[0])
            thr = -np.partition(-col, k - 1)[k - 1]
            keep = np.flatnonzero(col >= thr)
            ids = cand[keep]
            order = order_by_score(self.packed, ids, col[keep])
            out = []
            for j in order:
                score = float(col[keep[j]])
                if score <= min_score:
                    continue
                out.append(
                    Match(
                        self,
                        query,
                        slice_id=int(ids[j]),
                        score=score,
                        metric=self._span_sim.vector_sim.name,
                        level="span",
                    )
                )
            out_all.append(out[:n])
        return out_all
