"""fastText .bin parsing + subword hashing tests (synthetic model file)."""

import struct

import numpy as np
import pytest

from vectorian_tpu.embedding.fasttext import (
    EOS,
    FASTTEXT_MAGIC,
    FastTextEncoder,
    FastTextModel,
    fnv1a_hash,
    word_ngrams,
)


def write_fake_bin(path, words, dim=8, bucket=64, minn=2, maxn=3, seed=0):
    """Write a minimal valid fastText .bin (non-quantized)."""
    rng = np.random.default_rng(seed)
    nwords = len(words)
    rows = nwords + bucket
    mat = rng.normal(size=(rows, dim)).astype(np.float32)
    with open(path, "wb") as f:
        f.write(struct.pack("<ii", FASTTEXT_MAGIC, 12))
        f.write(struct.pack("<12i", dim, 5, 5, 1, 5, 1, 1, 1, bucket, minn, maxn, 100))
        f.write(struct.pack("<d", 1e-4))
        f.write(struct.pack("<3i", nwords, nwords, 0))
        f.write(struct.pack("<2q", 1000, 0))
        for w in words:
            f.write(w.encode("utf-8") + b"\x00")
            f.write(struct.pack("<q", 10))
            f.write(struct.pack("<b", 0))
        f.write(struct.pack("<b", 0))  # not quantized
        f.write(struct.pack("<2q", rows, dim))
        f.write(mat.tobytes())
    return mat


def test_word_ngrams():
    # '<ab>' with minn=2 maxn=3: <a, <ab, ab, ab>, b> (not the full <ab>)
    assert word_ngrams("ab", 2, 3) == ["<a", "<ab", "ab", "ab>", "b>"]


def test_fnv1a_known_values():
    # FNV-1a 32-bit of empty = offset basis; of "a" = 0xe40c292c
    assert fnv1a_hash(b"") == 2166136261
    assert fnv1a_hash(b"a") == 0xE40C292C
    # sign extension: byte 0xE4 must differ from the unsigned variant
    h_signed = fnv1a_hash(bytes([0xE4]))
    h = 2166136261 ^ 0xE4
    h_unsigned = (h * 16777619) & 0xFFFFFFFF
    assert h_signed != h_unsigned


def test_load_and_word_vector(tmp_path):
    words = [EOS, "king", "queen", "horse"]
    path = tmp_path / "model.bin"
    mat = write_fake_bin(path, words)
    m = FastTextModel.load(path)
    assert m.dim == 8 and m.nwords == 4 and m.bucket == 64
    assert m.words == words

    # in-vocab word: mean of word row + ngram rows
    ids = m.subword_ids("king")
    assert ids[0] == 1  # the word row
    assert all(i >= 4 for i in ids[1:])  # bucket rows
    want = mat[ids].mean(axis=0)
    np.testing.assert_allclose(m.word_vector("king"), want, rtol=1e-6)

    # OOV word: ngram rows only — still a nonzero vector
    v = m.word_vector("kingdom")
    assert np.linalg.norm(v) > 0
    assert m.word_index.get("kingdom") is None

    # EOS has no subwords beyond its row
    assert m.subword_ids(EOS) == [0]


def test_encoder_batch(tmp_path):
    words = [EOS, "alpha", "beta"]
    path = tmp_path / "m.bin"
    write_fake_bin(path, words)
    m = FastTextModel.load(path)
    enc = FastTextEncoder("ft-test", m)
    vecs = enc.encode_tokens(["alpha", "unseen", "beta"])
    assert vecs.unmodified.shape == (3, 8)
    np.testing.assert_allclose(vecs.unmodified[0], m.word_vector("alpha"), rtol=1e-6)
    np.testing.assert_allclose(vecs.unmodified[1], m.word_vector("unseen"), rtol=1e-6)


def test_quantized_rejected(tmp_path):
    path = tmp_path / "q.bin"
    with open(path, "wb") as f:
        f.write(struct.pack("<ii", FASTTEXT_MAGIC, 12))
        f.write(struct.pack("<12i", 4, 5, 5, 1, 5, 1, 1, 1, 8, 2, 3, 100))
        f.write(struct.pack("<d", 1e-4))
        f.write(struct.pack("<3i", 0, 0, 0))
        f.write(struct.pack("<2q", 0, 0))
        f.write(struct.pack("<b", 1))  # quantized!
    with pytest.raises(NotImplementedError):
        FastTextModel.load(path)


def test_session_with_fasttext(tmp_path):
    """fastText encoder end-to-end in a session (OOV query words get
    vectors, enabling matches the keyed path can't make)."""
    from vectorian_tpu import Session, StringImporter
    from vectorian_tpu.embedding.fasttext import PretrainedFastText
    from vectorian_tpu.sim.token import EmbeddingTokenSim

    words = [EOS, "king", "queen", "horse", "rides", "the"]
    path = tmp_path / "cc.xx.300.bin"
    write_fake_bin(path, words, dim=16)
    ft = PretrainedFastText("xx", path=path)

    docs = [StringImporter()("the king rides the horse. the queen sleeps.")]
    session = Session(docs, embeddings=[ft])
    index = session.partition("sentence").index(EmbeddingTokenSim(ft))
    r = index.find("the king rides the horse", n=2)
    assert len(r) >= 1
    assert r[0].score == pytest.approx(1.0, abs=1e-4)
    # morphological OOV variant still matches via shared ngrams
    r2 = index.find("kings rides horses", n=2, min_score=0.05)
    assert len(r2) >= 1
