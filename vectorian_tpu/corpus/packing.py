"""Corpus packing: prepared documents -> padded, length-bucketed device arrays.

This is the TPU-native replacement for the reference's per-slice iteration
(Spans::iterate, vectorian/core/cpp/document.h:147-169): instead of walking
sentence windows one at a time on CPU threads, every slice of a Partition
becomes one row of a padded [N, L] int32 token matrix, bucketed by length so
padding waste stays bounded.  The whole corpus then lives in HBM and a single
batched gather + DP kernel scores thousands of slices at once.

Packing is done once per (corpus, normalization, partition) and reused for
every query — preserving the reference's index-free interactivity
(README.md:17-19).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence

import numpy as np


@dataclass(frozen=True)
class Partition:
    """(level, window_size, window_step) — reference session.py:85-145."""

    level: str = "sentence"
    window_size: int = 1
    window_step: int = 1

    @property
    def contiguous(self) -> bool:
        return self.window_step <= self.window_size

    def to_args(self):
        return [self.level, self.window_size, self.window_step]


DEFAULT_BUCKETS = (8, 16, 32, 64, 128, 256, 512, 1024)


@dataclass
class PackedBucket:
    """All slices whose token length fits this bucket's capacity."""

    capacity: int
    token_ids: np.ndarray  # [N, L] i32, PAD=0
    pos_ids: np.ndarray  # [N, L] i8
    tag_ids: np.ndarray  # [N, L] i16
    lengths: np.ndarray  # [N] i32
    slice_index: np.ndarray  # [N] i32 — global slice ids into the slice table

    @property
    def n(self) -> int:
        return int(self.token_ids.shape[0])


@dataclass
class PackedCorpus:
    """Packed slice arrays for one (corpus, flavor, partition).

    The global slice table maps slice id -> (doc, slice index within doc,
    token start, token length) for result reconstruction.
    """

    partition: Partition
    buckets: List[PackedBucket]
    slice_doc: np.ndarray  # [S] i32 document index
    slice_idx: np.ndarray  # [S] i32 window index within the document
    slice_start: np.ndarray  # [S] i32 token start (filtered token space)
    slice_len: np.ndarray  # [S] i32
    n_docs: int

    @property
    def n_slices(self) -> int:
        return int(self.slice_doc.shape[0])

    @property
    def n_tokens(self) -> int:
        return int(self.slice_len.sum())

    @property
    def max_len(self) -> int:
        return int(self.slice_len.max()) if self.n_slices else 0


def save_packed(packed: PackedCorpus, path):
    """Persist packed arrays (npz) — the cache layer that keeps the
    reference's fast-loading contract (SURVEY §5 checkpoint hierarchy)."""
    data = {
        "partition": np.asarray(
            [packed.partition.window_size, packed.partition.window_step]
        ),
        "level": np.asarray([packed.partition.level]),
        "slice_doc": packed.slice_doc,
        "slice_idx": packed.slice_idx,
        "slice_start": packed.slice_start,
        "slice_len": packed.slice_len,
        "n_docs": np.asarray([packed.n_docs]),
        "n_buckets": np.asarray([len(packed.buckets)]),
    }
    for i, b in enumerate(packed.buckets):
        data[f"b{i}_cap"] = np.asarray([b.capacity])
        data[f"b{i}_tok"] = b.token_ids
        data[f"b{i}_pos"] = b.pos_ids
        data[f"b{i}_tag"] = b.tag_ids
        data[f"b{i}_len"] = b.lengths
        data[f"b{i}_idx"] = b.slice_index
    np.savez_compressed(path, **data)


def load_packed(path) -> PackedCorpus:
    z = np.load(path, allow_pickle=False)
    level = str(z["level"][0])
    ws, step = (int(x) for x in z["partition"])
    buckets = []
    for i in range(int(z["n_buckets"][0])):
        buckets.append(
            PackedBucket(
                capacity=int(z[f"b{i}_cap"][0]),
                token_ids=z[f"b{i}_tok"],
                pos_ids=z[f"b{i}_pos"],
                tag_ids=z[f"b{i}_tag"],
                lengths=z[f"b{i}_len"],
                slice_index=z[f"b{i}_idx"],
            )
        )
    return PackedCorpus(
        partition=Partition(level, ws, step),
        buckets=buckets,
        slice_doc=z["slice_doc"],
        slice_idx=z["slice_idx"],
        slice_start=z["slice_start"],
        slice_len=z["slice_len"],
        n_docs=int(z["n_docs"][0]),
    )


def pack_corpus(
    prepared_docs: Sequence,
    partition: Partition,
    bucket_sizes: Sequence[int] = DEFAULT_BUCKETS,
    max_len: Optional[int] = None,
) -> PackedCorpus:
    """Build the packed arrays.  Slices longer than the largest bucket (or
    ``max_len``) are truncated with a warning-free clamp — the reference caps
    DP indices at int16 and token lengths at uint8 similarly
    (corpus/document.py:49-51, match/matcher.h:58)."""
    cap = max_len or bucket_sizes[-1]

    slice_doc, slice_idx, slice_start, slice_len = [], [], [], []
    for pd in prepared_docs:
        ranges = pd.span_ranges(partition)
        for i, (s, e) in enumerate(ranges):
            slice_doc.append(pd.doc_index)
            slice_idx.append(i)
            slice_start.append(int(s))
            slice_len.append(min(int(e - s), cap))

    slice_doc = np.asarray(slice_doc, np.int32)
    slice_idx = np.asarray(slice_idx, np.int32)
    slice_start = np.asarray(slice_start, np.int32)
    slice_len = np.asarray(slice_len, np.int32)

    docs_by_index: Dict[int, object] = {pd.doc_index: pd for pd in prepared_docs}

    buckets: List[PackedBucket] = []
    nonempty = np.flatnonzero(slice_len > 0)
    lens_ne = slice_len[nonempty]
    order = np.argsort(lens_ne, kind="stable")
    sorted_ids = nonempty[order]
    sorted_lens = lens_ne[order]

    lo = 0
    for cap_i in bucket_sizes:
        if cap_i > cap:
            break
        hi = int(np.searchsorted(sorted_lens, cap_i, side="right"))
        ids = sorted_ids[lo:hi]
        lo = hi
        if ids.size == 0:
            continue
        n = ids.size
        tok = np.zeros((n, cap_i), np.int32)
        pos = np.zeros((n, cap_i), np.int8)
        tag = np.zeros((n, cap_i), np.int16)
        for r, sid in enumerate(ids):
            pd = docs_by_index[int(slice_doc[sid])]
            s = int(slice_start[sid])
            l = int(slice_len[sid])
            tok[r, :l] = pd.token_ids[s : s + l]
            pos[r, :l] = pd.pos_ids[s : s + l]
            tag[r, :l] = pd.tag_ids[s : s + l]
        buckets.append(
            PackedBucket(
                capacity=cap_i,
                token_ids=tok,
                pos_ids=pos,
                tag_ids=tag,
                lengths=slice_len[ids],
                slice_index=ids.astype(np.int32),
            )
        )

    return PackedCorpus(
        partition=partition,
        buckets=buckets,
        slice_doc=slice_doc,
        slice_idx=slice_idx,
        slice_start=slice_start,
        slice_len=slice_len,
        n_docs=len(prepared_docs),
    )
