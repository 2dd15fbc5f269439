"""Span (sentence/document) embeddings.

Reference: vectorian/embedding/span.py — SpanEmbedding aggregates token
embeddings (mean/min/max, AggregatedTokenImpl:27-93) or wraps pure-text
encoders (spaCy doc.vector / user lambda, _LambdaImpl:136), with a per-doc
disk+LRU cache keyed by (embedding, partition) (:219-324).

TPU mapping: corpus spans are encoded in one batched pass over the packed
bucket arrays (a masked segment-mean/min/max on device) and kept as a
[n_slices, d] device matrix — the "index" the reference builds via Faiss
(index.py:733-767) is here just this matrix + one GEMM per query.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax.numpy as jnp
import numpy as np

from vectorian_tpu.embedding.vectors import Vectors


class SpanEmbedding:
    """Embeds whole token spans into one vector."""

    def create_encoder(self, session):
        raise NotImplementedError()

    @property
    def name(self):
        raise NotImplementedError()


class AggregatedTokenEmbedding(SpanEmbedding):
    """agg(token vectors) over the span (reference span.py:27-93)."""

    def __init__(self, token_embedding, agg: str = "mean"):
        if agg not in ("mean", "min", "max"):
            raise ValueError(agg)
        self._token_embedding = token_embedding
        self._agg = agg

    @property
    def name(self):
        return f"{self._token_embedding.name}-{self._agg}"

    def create_encoder(self, session):
        return AggregatedSpanEncoder(self, session)


class AggregatedSpanEncoder:
    def __init__(self, spec: AggregatedTokenEmbedding, session):
        self._spec = spec
        self._session = session
        self._cache = {}

    @property
    def name(self):
        return self._spec.name

    def encode_corpus(self, session, partition) -> Vectors:
        """[n_slices, d] span vectors, cached per partition spec."""
        key = partition.spec
        hit = self._cache.get(key)
        if hit is not None:
            return hit
        emb = self._spec._token_embedding
        agg = self._spec._agg
        packed = session.packed_corpus(partition.spec)
        if getattr(emb, "is_static", True):
            comp = session.compiled_embeddings[emb.name]
            table = comp.unmodified  # [V, d] device
            d = int(table.shape[1])
        else:
            engine = session.engine(partition.spec)
            d = session._ctx_dims[emb.name]
            engine.ensure_contextual(emb.name, session.documents, d)
            table = None

        out = np.zeros((packed.n_slices, d), np.float32)
        engine = session.engine(partition.spec)
        for bi, db in enumerate(engine._device_buckets):
            if db["n"] == 0:
                continue
            L = db["capacity"]
            lengths = db["lengths"]
            mask = (
                jnp.arange(L, dtype=jnp.int32)[None, :] < lengths[:, None]
            )  # [N, L]
            if table is not None:
                vecs = table[db["tokens"]]  # [N, L, d]
            else:
                vecs = engine._ctx_stores[emb.name][bi]
            m = mask[:, :, None]
            if agg == "mean":
                s = jnp.sum(jnp.where(m, vecs, 0.0), axis=1)
                v = s / jnp.maximum(lengths[:, None].astype(jnp.float32), 1.0)
            elif agg == "max":
                v = jnp.max(jnp.where(m, vecs, -jnp.inf), axis=1)
                v = jnp.where(jnp.isfinite(v), v, 0.0)
            else:
                v = jnp.min(jnp.where(m, vecs, jnp.inf), axis=1)
                v = jnp.where(jnp.isfinite(v), v, 0.0)
            out[db["slice_index"]] = np.asarray(v[: db["n"]])
        result = Vectors(out)
        self._cache[key] = result
        return result

    def encode_text(self, text: str) -> Vectors:
        """Query-side: parse + normalize like a document, aggregate."""
        session = self._session
        emb = self._spec._token_embedding
        sdoc = session.nlp(text)
        j = sdoc.to_json()
        table = {
            "text": [text[t["start"] : t["end"]] for t in j["tokens"]],
            "pos": [t.get("pos", "X") for t in j["tokens"]],
            "tag": [t.get("tag", "XX") for t in j["tokens"]],
        }
        mask = session.normalization.apply(table)
        keep = np.flatnonzero(mask)
        strings = [table["text"][i] for i in keep]
        if getattr(emb, "is_static", True):
            comp = session.compiled_embeddings[emb.name]
            vecs = comp.encode_query(strings).unmodified
        else:
            qd = session.encode_contextual_query(emb.name, sdoc, text, keep)
            vecs = qd["unmodified"]
        if len(vecs) == 0:
            d = vecs.shape[1] if vecs.ndim == 2 else 1
            return Vectors(np.zeros((1, d), np.float32))
        agg = self._spec._agg
        if agg == "mean":
            v = vecs.mean(axis=0)
        elif agg == "max":
            v = vecs.max(axis=0)
        else:
            v = vecs.min(axis=0)
        return Vectors(np.asarray(v, np.float32)[None])


class TextSpanEmbedding(SpanEmbedding):
    """Pure-text span encoder: user fn(text) -> [d] (reference
    _LambdaImpl:136 / spaCy doc.vector impl)."""

    def __init__(self, name: str, fn: Callable[[str], np.ndarray], dimension: int):
        self._name = name
        self._fn = fn
        self._dimension = dimension

    @property
    def name(self):
        return self._name

    def create_encoder(self, session):
        return TextSpanEncoder(self, session)


class TextSpanEncoder:
    def __init__(self, spec: TextSpanEmbedding, session):
        self._spec = spec
        self._session = session
        self._cache = {}

    @property
    def name(self):
        return self._spec.name

    def encode_corpus(self, session, partition) -> Vectors:
        key = partition.spec
        hit = self._cache.get(key)
        if hit is not None:
            return hit
        packed = session.packed_corpus(partition.spec)
        out = np.zeros((packed.n_slices, self._spec._dimension), np.float32)
        for sid in range(packed.n_slices):
            d_i = int(packed.slice_doc[sid])
            pd = session.documents[d_i]
            s0 = int(packed.slice_start[sid])
            ln = int(packed.slice_len[sid])
            if ln == 0:
                continue
            o_lo = pd.orig_index[s0]
            o_hi = pd.orig_index[s0 + ln - 1]
            text = pd.doc.text[
                pd.doc.idx[o_lo] : pd.doc.idx[o_hi] + pd.doc.len_[o_hi]
            ]
            out[sid] = np.asarray(self._spec._fn(text), np.float32)
        result = Vectors(out)
        self._cache[key] = result
        return result

    def encode_text(self, text: str) -> Vectors:
        return Vectors(np.asarray(self._spec._fn(text), np.float32)[None])


def SentenceEmbedding(token_embedding, agg="mean"):
    """Convenience alias (reference span.py:357)."""
    return AggregatedTokenEmbedding(token_embedding, agg)
