"""Importer + NLP fallback + vocabulary + native lib tests."""

import numpy as np
import pytest

from vectorian_tpu.importers import (
    MarkdownImporter,
    NovelImporter,
    PlayShakespeareImporter,
    StringImporter,
    compile_token_spans,
)
from vectorian_tpu.utils.nlp import SimpleNLP
from vectorian_tpu.vocabulary import IncrementalLexicon, Lexicon, Vocabulary


def test_simple_nlp():
    nlp = SimpleNLP()
    doc = nlp("The cat sleeps. A dog runs!")
    j = doc.to_json()
    texts = ["The cat sleeps. A dog runs!"[t["start"]:t["end"]] for t in j["tokens"]]
    assert texts == ["The", "cat", "sleeps", ".", "A", "dog", "runs", "!"]
    assert len(j["sents"]) == 2
    poss = [t["pos"] for t in j["tokens"]]
    assert poss[3] == "PUNCT" and poss[7] == "PUNCT"
    assert poss[0] == "DET"


def test_string_importer_spans():
    doc = StringImporter()("One two. Three four five.", title="t")
    assert doc.n_tokens == 7  # 5 words + 2 periods
    sent = doc.spans["sentence"]
    assert sent.shape == (2, 2)
    assert sent[0].tolist() == [0, 3]  # One two .
    assert sent[1].tolist() == [3, 7]


def test_compile_token_spans():
    idx = np.array([0, 4, 8])
    lens = np.array([3, 3, 3])
    spans = compile_token_spans([(0, 7), (8, 11)], idx, lens)
    assert spans.tolist() == [[0, 2], [2, 3]]


def test_novel_importer(tmp_path):
    p = tmp_path / "novel.txt"
    p.write_text(
        "Preface text here.\nCHAPTER 1\nIt was the best of times.\n"
        "CHAPTER 2\nIt was the worst of times.\n"
    )
    doc = NovelImporter()(p, title="Tale")
    locs = doc.metadata["locations"]
    assert len(locs) == 3
    assert locs[1]["chapter"] == 1 and locs[2]["chapter"] == 2


def test_markdown_importer(tmp_path):
    p = tmp_path / "doc.md"
    p.write_text("# Title\nSome **bold** text with a [link](http://x).\n\n## Sub\nMore text.")
    doc = MarkdownImporter()(p)
    assert "**" not in doc.text and "](" not in doc.text
    locs = doc.metadata["locations"]
    assert any(l.get("heading") == "Title" for l in locs)


def test_play_importer(tmp_path):
    p = tmp_path / "play.xml"
    p.write_text(
        """<play><title>Test Play</title>
        <act><scene>
        <speech><speaker>HAMLET</speaker><line>To be or not to be.</line></speech>
        <speech><speaker>OPHELIA</speaker><line>My lord.</line></speech>
        </scene></act></play>"""
    )
    doc = PlayShakespeareImporter()(p)
    assert doc.metadata["title"] == "Test Play"
    locs = doc.metadata["locations"]
    assert locs[0] == {"act": 1, "scene": 1, "speaker": "HAMLET"}
    assert "To be or not to be" in doc.text


def test_lexicon_and_incremental():
    lex = Lexicon()
    ids = lex.add_many(["a", "b", "a", "c"])
    assert ids.tolist() == [1, 2, 1, 3]
    frozen = lex.freeze()
    inc = IncrementalLexicon(frozen)
    assert inc.add("b") == 2
    assert inc.add("zzz") == len(frozen)  # new id beyond base
    assert inc.to_str(inc.add("zzz")) == "zzz"
    # base lexicon untouched
    assert frozen.get("zzz") == -1


def test_native_lexicon_if_available():
    from vectorian_tpu import native

    if not native.available():
        pytest.skip("native lib unavailable")
    lex = native.NativeLexicon()
    ids = lex.add_many(["x", "y", "x"])
    assert ids.tolist() == [1, 2, 1]
    assert lex.lookup_many(["y", "zz"]).tolist() == [2, -1]
    assert lex.to_str(1) == "x"


def test_native_fasttext_parity(tmp_path):
    from vectorian_tpu import native

    if not native.available():
        pytest.skip("native lib unavailable")
    from tests.test_fasttext import write_fake_bin
    from vectorian_tpu.embedding.fasttext import FastTextModel

    p = tmp_path / "m.bin"
    write_fake_bin(p, ["</s>", "king", "naïve"], dim=8)
    m = FastTextModel.load(p)
    words = ["king", "kingly", "naïve", "königin"]
    fast = native.fasttext_encode_batch(m, words)
    slow = np.stack([m.word_vector(w) for w in words])
    np.testing.assert_allclose(fast, slow, rtol=1e-5)
