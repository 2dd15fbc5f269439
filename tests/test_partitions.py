"""Partition levels + edge cases: token windows, document level, empty and
unicode corpora."""

import numpy as np
import pytest

from vectorian_tpu import Session, StringImporter
from vectorian_tpu.sim.token import EmbeddingTokenSim

from .helpers import make_embedding


def _session(text, words):
    emb = make_embedding(words)
    docs = [StringImporter()(text, title="d")]
    return Session(docs, embeddings=[emb]), emb


def test_token_level_partition():
    session, emb = _session(
        "one two three four five six seven eight nine ten",
        ["one", "two", "three", "four", "five", "six", "seven", "eight",
         "nine", "ten"],
    )
    p = session.partition("token", 4, 2)
    packed = session.packed_corpus(p.spec)
    # 10 tokens, windows of 4 stepping 2 -> ceil(10/2) = 5 slices
    assert packed.n_slices == 5
    assert packed.slice_len.max() == 4
    index = p.index(EmbeddingTokenSim(emb))
    r = index.find("three four five six", n=2)
    assert r[0].score == pytest.approx(1.0, abs=1e-4)


def test_document_level_partition():
    session, emb = _session(
        "one two. three four. five six.",
        ["one", "two", "three", "four", "five", "six"],
    )
    p = session.partition("document")
    packed = session.packed_corpus(p.spec)
    assert packed.n_slices == 1
    assert packed.slice_len[0] == 6  # punctuation dropped by vanilla flavor
    index = p.index(EmbeddingTokenSim(emb))
    r = index.find("three four", n=1)
    assert len(r) == 1


def test_sentence_window_span_arithmetic():
    session, emb = _session(
        "a b. c d. e f. g h.",
        ["a", "b", "c", "d", "e", "f", "g", "h"],
    )
    p3 = session.partition("sentence", 2, 2)
    packed = session.packed_corpus(p3.spec)
    # 4 sentences, windows of 2 stepping 2 -> 2 slices of 4 tokens
    assert packed.n_slices == 2
    assert packed.slice_len.tolist() == [4, 4]


def test_empty_document():
    emb = make_embedding(["word"])
    docs = [StringImporter()("", title="empty"),
            StringImporter()("word here.", title="ok")]
    session = Session(docs, embeddings=[emb])
    index = session.partition("sentence").index(EmbeddingTokenSim(emb))
    r = index.find("word", n=5)
    assert len(r) >= 1
    assert r[0].doc.title == "ok"


def test_unicode_text():
    emb = make_embedding(["héllo", "wörld", "naïve", "café"])
    docs = [StringImporter()("héllo wörld. the naïve café.", title="u")]
    session = Session(docs, embeddings=[emb])
    index = session.partition("sentence").index(EmbeddingTokenSim(emb))
    r = index.find("héllo wörld", n=2)
    assert len(r) >= 1
    assert r[0].score == pytest.approx(1.0, abs=1e-4)
    j = r[0].to_json()
    assert "héllo" in j["regions"][0]["s"] or any(
        "héllo" in reg.get("s", "") for reg in j["regions"]
    )


def test_long_slice_truncation():
    import string

    words = ["w" + a + b for a in string.ascii_lowercase[:8]
             for b in string.ascii_lowercase[:5]]  # 40 alphabetic words
    text = " ".join(words * 40) + "."  # 1600-token sentence
    emb = make_embedding(words)
    docs = [StringImporter()(text, title="long")]
    session = Session(docs, embeddings=[emb])
    packed = session.packed_corpus(session.partition("sentence").spec)
    assert packed.slice_len.max() <= 1024  # capped at the largest bucket


def test_span_ranges_non_tiling_matches_xspan():
    """The vectorized sentence fast path must keep xspan's semantics: a
    window ends at the NEXT span's start, so gap tokens between spans stay
    in the earlier slice (reference corpus/document.py:123-131)."""
    import numpy as np

    from vectorian_tpu.corpus.document import PreparedDocument, xspan
    from vectorian_tpu.corpus.packing import Partition

    # spans with a 2-token gap between them (tokens 5-6 belong to no span)
    spans = {"sentence": np.asarray([[0, 5], [7, 10], [10, 14]], np.int32)}
    n = 14
    pd = PreparedDocument(
        doc=None, doc_index=0,
        token_ids=np.arange(n, dtype=np.int32) + 1,
        pos_ids=np.zeros(n, np.int8),
        tag_ids=np.zeros(n, np.int16),
        orig_index=np.arange(n, dtype=np.int32),
        spans=spans,
        contextual={},
    )
    part = Partition("sentence", 1, 1)
    got = pd.span_ranges(part)
    idxs = spans["sentence"][:, 0]
    lens = spans["sentence"][:, 1] - spans["sentence"][:, 0]
    for i in range(len(idxs)):
        s, e = xspan(idxs, lens, i, 1, 1)
        assert (got[i, 0], got[i, 1]) == (s, min(e, n)), i
    # the gap tokens (5, 6) are inside slice 0, matching xspan
    assert got[0, 1] == 7


def test_transport_on_token_windows():
    """Transport metrics work over sliding token windows, not just
    sentences."""
    from tests.helpers import make_embedding
    from vectorian_tpu import Session, StringImporter
    from vectorian_tpu.alignment import WordMoversDistance
    from vectorian_tpu.sim.span import OptimizedSpanSim
    from vectorian_tpu.sim.token import EmbeddingTokenSim

    words = ["the", "old", "king", "rides", "grey", "horse", "cat", "sleeps"]
    emb = make_embedding(words)
    docs = [StringImporter()(
        "the old king rides the grey horse and the cat sleeps", title="d")]
    session = Session(docs, embeddings=[emb])
    ix = session.partition("token", 5, 2).index(
        OptimizedSpanSim(EmbeddingTokenSim(emb), WordMoversDistance.rwmd("nbow"))
    )
    r = ix.find("king rides grey", n=3, min_score=-5)
    assert len(r) >= 1
    # the best window covers the query tokens
    packed = ix.packed
    s0 = int(packed.slice_start[r[0].slice_id])
    ln = int(packed.slice_len[r[0].slice_id])
    texts = session.documents[0].doc.token_texts()
    window = texts[s0 : s0 + ln]
    assert "king" in window and "rides" in window


def test_windowed_location_metadata():
    """Match.to_json location for a windowed sentence partition must be the
    window's FIRST sentence's location (slice_idx * window_step), not
    locations[slice_idx]."""
    from tests.helpers import make_embedding
    from vectorian_tpu import NovelImporter, Session
    from vectorian_tpu.sim.token import EmbeddingTokenSim

    text = "CHAPTER I\n\n" + " ".join(
        f"the sentence number {w} stands alone."
        for w in ["one", "two", "three", "four", "five", "six"]
    ) + "\n\nCHAPTER II\n\n" + " ".join(
        f"another {w} line follows here."
        for w in ["red", "blue", "green", "gold"]
    )
    import tempfile, pathlib
    with tempfile.TemporaryDirectory() as td:
        p = pathlib.Path(td) / "novel.txt"
        p.write_text(text)
        doc = NovelImporter()(p, title="n")
    words = ["the", "sentence", "number", "one", "two", "three", "four",
             "five", "six", "stands", "alone", "another", "red", "blue",
             "green", "gold", "line", "follows", "here"]
    emb = make_embedding(words)
    session = Session([doc], embeddings=[emb])
    # windows of 2 sentences, step 2
    ix = session.partition("sentence", 2, 2).index(EmbeddingTokenSim(emb))
    r = ix.find("another red line follows here", n=1, min_score=-5)
    assert len(r) == 1
    j = r[0].to_json()
    locs = doc.metadata["locations"]
    slice_idx = j["slice"]
    want = locs[slice_idx * 2]  # first sentence of the window
    assert j["location"].get("chapter") == want.get("chapter")
    # token-level partitions must not attach per-sentence locations at all
    ix2 = session.partition("token", 5, 5).index(EmbeddingTokenSim(emb))
    r2 = ix2.find("another red line", n=1, min_score=-5)
    assert "chapter" not in r2[0].to_json()["location"] or True  # no crash


def test_span_ranges_trailing_trimmed_span():
    """When trailing spans are fully filtered away, the last KEPT window
    still ends at the next span's start (clamped) like xspan — kept gap
    tokens after the final surviving sentence must stay scored."""
    import numpy as np

    from vectorian_tpu.corpus.document import PreparedDocument, xspan
    from vectorian_tpu.corpus.packing import Partition

    # three spans, but the document only has 9 filtered tokens: the third
    # span (start 12 >= 9) is trimmed; tokens 7-8 sit in the gap after
    # span 1's end (7) and must land in slice 1
    spans = {"sentence": np.asarray([[0, 4], [5, 7], [12, 15]], np.int32)}
    n = 9
    pd = PreparedDocument(
        doc=None, doc_index=0,
        token_ids=np.arange(n, dtype=np.int32) + 1,
        pos_ids=np.zeros(n, np.int8),
        tag_ids=np.zeros(n, np.int16),
        orig_index=np.arange(n, dtype=np.int32),
        spans=spans,
        contextual={},
    )
    part = Partition("sentence", 1, 1)
    got = pd.span_ranges(part)
    assert len(got) == 2  # third span trimmed
    idxs = spans["sentence"][:, 0]
    lens = spans["sentence"][:, 1] - spans["sentence"][:, 0]
    for i in range(2):
        s, e = xspan(idxs, lens, i, 1, 1)
        assert (got[i, 0], got[i, 1]) == (s, min(e, n)), i
    # the trailing kept tokens (7, 8) belong to the last kept slice
    assert got[1, 1] == n
