"""fastText embeddings: native .bin parsing + subword ngram hashing.

Reference: vectorian/embedding/token/fasttext.py — PretrainedFastText wraps
the fasttext package (`ft.get_word_vector`, fasttext.py:63-74) which handles
OOV words by construction via hashed character ngrams.

No fasttext package here: the .bin model format and the FNV-1a subword
hashing are implemented directly (they are stable, documented formats), so
arbitrary query tokens get vectors exactly like upstream fastText.  The hot
part — summing ngram rows for a batch of words — also has a C++ fast path in
native/ (ngram hashing is pure byte-crunching the CPython interpreter is bad
at).
"""

from __future__ import annotations

import struct
from pathlib import Path
from typing import List, Optional, Sequence

import numpy as np

from vectorian_tpu.embedding.static import StaticEmbedding, cache_home
from vectorian_tpu.embedding.vectors import Vectors

FASTTEXT_MAGIC = 793712314
EOS = "</s>"
BOW, EOW = "<", ">"


def fnv1a_hash(s: bytes) -> int:
    """fastText's dictionary hash: FNV-1a 32-bit over *sign-extended* bytes
    (upstream XORs int8_t values, so bytes >= 0x80 flip the high bits)."""
    h = 2166136261
    for b in s:
        h = h ^ (b if b < 0x80 else (0xFFFFFF00 | b))
        h = (h * 16777619) & 0xFFFFFFFF
    return h


def word_ngrams(word: str, minn: int, maxn: int) -> List[str]:
    """Character ngrams of '<word>' with length minn..maxn (excluding the
    full '<word>' token itself, matching fastText's computeSubwords)."""
    w = BOW + word + EOW
    out = []
    n = len(w)
    for i in range(n):
        for l in range(minn, maxn + 1):
            if i + l <= n and not (i == 0 and l == n):
                out.append(w[i : i + l])
    return out


class FastTextModel:
    """A parsed fastText .bin model (non-quantized input matrix)."""

    def __init__(self, words, word_count, dim, bucket, minn, maxn, input_matrix):
        self.words = words
        self.word_index = {w: i for i, w in enumerate(words)}
        self.nwords = word_count
        self.dim = dim
        self.bucket = bucket
        self.minn = minn
        self.maxn = maxn
        self.input_matrix = input_matrix  # [nwords + bucket, dim]

    @staticmethod
    def load(path) -> "FastTextModel":
        with open(path, "rb") as f:
            magic, version = struct.unpack("<ii", f.read(8))
            if magic != FASTTEXT_MAGIC:
                raise ValueError(f"{path}: not a fastText model (magic {magic})")
            # args (fasttext/src/args.cc::load order)
            (dim, ws, epoch, min_count, neg, word_ngrams_n, loss, model,
             bucket, minn, maxn, lr_update_rate) = struct.unpack("<12i", f.read(48))
            (t,) = struct.unpack("<d", f.read(8))
            # dictionary
            size, nwords, nlabels = struct.unpack("<3i", f.read(12))
            ntokens, pruneidx_size = struct.unpack("<2q", f.read(16))
            words = []
            for _ in range(size):
                chars = bytearray()
                while True:
                    c = f.read(1)
                    if c == b"\x00":
                        break
                    chars.extend(c)
                words.append(chars.decode("utf-8", errors="replace"))
                _count = struct.unpack("<q", f.read(8))[0]
                _type = struct.unpack("<b", f.read(1))[0]
            for _ in range(max(pruneidx_size, 0)):
                f.read(8)  # pruneidx pairs (int32, int32)
            # input matrix
            (quant,) = struct.unpack("<b", f.read(1))
            if quant:
                raise NotImplementedError(
                    "quantized fastText models are not supported; use the "
                    "non-quantized .bin or a CompressedFastTextVectors file"
                )
            m, n = struct.unpack("<2q", f.read(16))
            data = np.frombuffer(f.read(m * n * 4), dtype=np.float32).reshape(m, n)
        return FastTextModel(
            words[:nwords], nwords, dim, bucket, minn, maxn, data.copy()
        )

    def subword_ids(self, word: str) -> List[int]:
        ids = []
        wi = self.word_index.get(word)
        if wi is not None and wi < self.nwords:
            ids.append(wi)
        if word != EOS and self.maxn > 0:
            for ng in word_ngrams(word, self.minn, self.maxn):
                h = fnv1a_hash(ng.encode("utf-8"))
                ids.append(self.nwords + (h % self.bucket))
        return ids

    def word_vector(self, word: str) -> np.ndarray:
        """Mean of subword rows (fastText getWordVector semantics)."""
        ids = self.subword_ids(word)
        if not ids:
            return np.zeros((self.dim,), np.float32)
        return self.input_matrix[ids].mean(axis=0)

    def save(self, path, words=None):  # for tests / cache round-trips
        raise NotImplementedError()


class FastTextEncoder:
    """Encoder with the StaticEmbeddingEncoder interface but OOV-capable."""

    def __init__(self, name: str, model: FastTextModel, normalizer=None):
        self._name = name
        self._model = model
        self._normalizer = normalizer
        self._cache = {}

    @property
    def name(self):
        return self._name

    @property
    def dimension(self):
        return self._model.dim

    def word_vec(self, w: str) -> np.ndarray:
        v = self._cache.get(w)
        if v is None:
            v = self._model.word_vector(w)
            self._cache[w] = v
        return v

    def encode_tokens(self, tokens: Sequence[str]) -> Vectors:
        try:
            from vectorian_tpu.native import fasttext_encode_batch

            return Vectors(
                fasttext_encode_batch(self._model, list(tokens))
            )
        except (ImportError, OSError):
            out = np.zeros((len(tokens), self._model.dim), np.float32)
            for i, t in enumerate(tokens):
                out[i] = self.word_vec(t)
            return Vectors(out)

    def transform_query(self, vectors):
        return vectors


class PretrainedFastText(StaticEmbedding):
    """cc.LANG.300.bin fastText model (reference fasttext.py:48-74); the
    file must be present locally (zero-egress) at ``path`` or in the cache
    dir as fasttext/cc.<lang>.300.bin."""

    def __init__(self, lang: str, path: Optional[str] = None):
        self._lang = lang
        self._path = (
            Path(path)
            if path
            else cache_home() / "fasttext" / f"cc.{lang}.300.bin"
        )
        self._model: Optional[FastTextModel] = None

    @property
    def name(self):
        return f"fasttext-{self._lang}"

    @property
    def model(self) -> FastTextModel:
        if self._model is None:
            if not self._path.exists():
                raise FileNotFoundError(
                    f"fastText model not found: {self._path} (download "
                    f"cc.{self._lang}.300.bin manually; this environment has "
                    f"no network egress)"
                )
            self._model = FastTextModel.load(self._path)
        return self._model

    def create_encoder(self, normalization=None):
        return FastTextEncoder(self.name, self.model)


class CompressedFastTextVectors(StaticEmbedding):
    """compress_fasttext product-quantized models (reference
    fasttext.py:15-45).  Requires the compress_fasttext package at load
    time; gated import."""

    def __init__(self, path):
        self._path = Path(path)

    @property
    def name(self):
        return f"compressed-fasttext-{self._path.stem}"

    def create_encoder(self, normalization=None):
        try:
            import compress_fasttext
        except ImportError as e:
            raise ImportError(
                "CompressedFastTextVectors requires the compress_fasttext "
                "package; install it or use PretrainedFastText with a .bin "
                "model"
            ) from e
        kv = compress_fasttext.models.CompressedFastTextKeyedVectors.load(
            str(self._path)
        )

        class _Enc:
            name = self.name
            dimension = kv.vector_size

            def word_vec(self, w):
                return np.asarray(kv[w], np.float32)

            def encode_tokens(self, tokens):
                return Vectors(
                    np.stack([np.asarray(kv[t], np.float32) for t in tokens])
                )

            def transform_query(self, vectors):
                return vectors

        return _Enc()
