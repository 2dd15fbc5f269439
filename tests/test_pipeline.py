"""NLP-pipeline decomposition (embedding/pipeline.py) — auto-derived span
embedding name/dimension, sentence-BERT pipe detection, custom decomposers
(reference embedding/pipeline.py:15-77, span.py:116-132)."""

import numpy as np
import pytest

from vectorian_tpu import Session, StringImporter
from vectorian_tpu.embedding.pipeline import (
    PipelineStats,
    SpacySpanEmbedding,
    decompose_nlp,
    register_decomposer,
    stats_from_meta,
    stats_from_sentence_bert,
)
from vectorian_tpu.sim.span import EmbeddedSpanSim

from .helpers import WORDS, make_corpus_texts, make_embedding, word_vector


class _Doc:
    def __init__(self, vec):
        self.vector = vec


class SentenceBert:  # detected by class name + model_name (duck-typed)
    def __init__(self, model_name):
        self.model_name = model_name


class _FakeNLP:
    """Stands in for a spaCy pipeline: meta + pipeline + __call__."""

    def __init__(self, meta=None, pipeline=(), dim=16, seed=3):
        self.meta = meta or {}
        self.pipeline = list(pipeline)
        self._dim = dim
        self._seed = seed

    def __call__(self, text):
        words = text.split()
        if not words:
            return _Doc(np.zeros(self._dim, np.float32))
        vecs = np.stack([word_vector(w, self._dim) for w in words])
        return _Doc(vecs.mean(axis=0).astype(np.float32))


def test_stats_from_sentence_bert():
    nlp = _FakeNLP(
        meta={"lang": "en", "vectors": {"width": 16}},
        pipeline=[("sbert", SentenceBert("paraphrase-v1"))],
    )
    stats = stats_from_sentence_bert(nlp)
    assert stats == PipelineStats("sentence-bert-en-paraphrase-v1", 16)
    # two sentence-BERT pipes -> ambiguous -> None
    nlp.pipeline.append(("sbert2", SentenceBert("other")))
    assert stats_from_sentence_bert(nlp) is None
    # no pipe -> None
    assert stats_from_sentence_bert(_FakeNLP()) is None


def test_stats_dimension_probed_from_empty_doc():
    # width missing from meta -> probe nlp("").vector
    nlp = _FakeNLP(
        meta={"lang": "de"},
        pipeline=[("sbert", SentenceBert("m"))],
        dim=24,
    )
    stats = decompose_nlp(nlp)
    assert stats.name == "sentence-bert-de-m"
    assert stats.dimension == 24


def test_stats_from_meta_fallback():
    nlp = _FakeNLP(meta={"vectors": {"name": "core-md-vectors", "width": 16}})
    assert stats_from_sentence_bert(nlp) is None
    stats = decompose_nlp(nlp)
    assert stats == PipelineStats("core-md-vectors", 16)
    # nameless vectors don't decompose
    assert stats_from_meta(_FakeNLP(meta={"vectors": {"width": 16}})) is None
    assert decompose_nlp(_FakeNLP()) is None


def test_register_decomposer():
    from vectorian_tpu.embedding import pipeline as mod

    marker = PipelineStats("custom", 4)

    def custom(nlp):
        return marker if getattr(nlp, "is_custom", False) else None

    register_decomposer(custom)
    try:
        nlp = _FakeNLP()
        nlp.is_custom = True
        assert decompose_nlp(nlp) is marker
    finally:
        mod._decomposers.remove(custom)


def test_spacy_span_embedding_end_to_end():
    """Lambda-free SpacySpanEmbedding(nlp) construction drives a span
    index: name/dimension are auto-derived, encoding runs nlp(text)."""
    rng = np.random.default_rng(11)
    planted = ["the old king rides the grey horse"]
    texts, locations = make_corpus_texts(
        rng, n_docs=3, sents_per_doc=6, planted=planted
    )
    imp = StringImporter()
    docs = [imp(t, title=f"d{i}") for i, t in enumerate(texts)]
    words = sorted(
        set(WORDS) | {"old", "king", "rides", "grey", "horse", "the"}
    )
    emb = make_embedding(words)
    session = Session(docs, embeddings=[emb])

    nlp = _FakeNLP(
        meta={"lang": "en", "vectors": {"width": 16}},
        pipeline=[("sbert", SentenceBert("mini"))],
    )
    span_emb = SpacySpanEmbedding(nlp)
    assert span_emb.name == "sentence-bert-en-mini"
    index = session.partition("sentence").index(EmbeddedSpanSim(span_emb))
    r = index.find("the old king rides the grey horse", n=5, min_score=0.2)
    assert len(r) >= 1
    packed = index.packed
    assert (
        int(packed.slice_doc[r[0].slice_id]),
        int(packed.slice_idx[r[0].slice_id]),
    ) == locations[0]
    assert r[0].score == pytest.approx(1.0, abs=1e-4)


def test_spacy_span_embedding_undecomposable_raises():
    with pytest.raises(RuntimeError, match="failed to decompose"):
        SpacySpanEmbedding(_FakeNLP())
