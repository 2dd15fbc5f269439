"""Tests for span embeddings, saliency boosters, zoo, corpus persistence."""

import numpy as np
import pytest

from vectorian_tpu import Session, StringImporter
from vectorian_tpu.corpus.corpus import Corpus, TemporaryCorpus
from vectorian_tpu.embedding.span import (
    AggregatedTokenEmbedding,
    SentenceEmbedding,
    TextSpanEmbedding,
)
from vectorian_tpu.embedding.zoo import Zoo
from vectorian_tpu.saliency import GaussFilter, KeywordSignal, MaxFilter, Saliency
from vectorian_tpu.sim.span import EmbeddedSpanSim
from vectorian_tpu.sim.token import EmbeddingTokenSim

from .helpers import WORDS, make_corpus_texts, make_embedding, word_vector


@pytest.fixture(scope="module")
def small_session():
    rng = np.random.default_rng(11)
    planted = ["the old king rides the grey horse"]
    texts, locations = make_corpus_texts(rng, n_docs=3, sents_per_doc=8, planted=planted)
    imp = StringImporter()
    docs = [imp(t, title=f"d{i}") for i, t in enumerate(texts)]
    words = sorted(set(WORDS) | {"old", "king", "rides", "grey", "horse", "the"})
    emb = make_embedding(words)
    session = Session(docs, embeddings=[emb])
    return session, emb, locations


def test_span_encoder_index(small_session):
    session, emb, locations = small_session
    span_emb = SentenceEmbedding(emb, agg="mean")
    index = session.partition("sentence").index(EmbeddedSpanSim(span_emb))
    r = index.find("the old king rides the grey horse", n=5, min_score=0.2)
    assert len(r) >= 1
    packed = index.packed
    top = r[0]
    assert (
        int(packed.slice_doc[top.slice_id]),
        int(packed.slice_idx[top.slice_id]),
    ) == locations[0]
    assert top.score == pytest.approx(1.0, abs=1e-4)
    assert top.level == "span"


def test_span_corpus_vectors_match_manual(small_session):
    session, emb, locations = small_session
    span_emb = AggregatedTokenEmbedding(emb, agg="mean")
    enc = span_emb.create_encoder(session)
    p = session.partition("sentence")
    vecs = enc.encode_corpus(session, p).unmodified
    packed = session.packed_corpus(p.spec)
    comp = session.compiled_embeddings[emb.name]
    table = np.asarray(comp.unmodified)
    sid = 0
    d = int(packed.slice_doc[sid])
    s0 = int(packed.slice_start[sid])
    ln = int(packed.slice_len[sid])
    ids = session.documents[d].token_ids[s0 : s0 + ln]
    want = table[ids].mean(axis=0)
    np.testing.assert_allclose(vecs[sid], want, atol=1e-5)


def test_text_span_embedding(small_session):
    session, emb, locations = small_session
    fn = lambda text: word_vector(text.split()[0] if text.split() else "x", 16)
    span_emb = TextSpanEmbedding("first-word", fn, 16)
    index = session.partition("sentence").index(EmbeddedSpanSim(span_emb))
    r = index.find("the anything", n=3, min_score=0.5)
    assert len(r) >= 1


def test_saliency_booster(small_session):
    session, emb, locations = small_session
    p = session.partition("sentence")
    sal = Saliency(strength=1.0).add_signal(KeywordSignal("horse"), 1.0)
    boost = sal.compile(session, p)
    packed = session.packed_corpus(p.spec)
    assert boost.shape == (packed.n_slices,)
    # planted sentence contains 'horse' -> boost 1; most others 0
    d, s = locations[0]
    sid = np.flatnonzero((packed.slice_doc == d) & (packed.slice_idx == s))[0]
    assert boost[sid] == pytest.approx(1.0)
    assert boost.mean() < 0.5

    # booster plumbs into find()
    index = p.index(EmbeddingTokenSim(emb))
    r_boost = index.find("the old king rides the grey horse", n=5, booster=sal)
    r_plain = index.find("the old king rides the grey horse", n=5)
    assert r_boost[0].slice_id == r_plain[0].slice_id
    # non-keyword matches got suppressed by the boost
    if len(r_plain) > 1 and len(r_boost) > 1:
        assert r_boost[1].score <= r_plain[1].score + 1e-6


def test_saliency_smoothing():
    x = np.zeros(20, np.float32)
    x[10] = 1.0
    g = GaussFilter(5)(x)
    assert g[10] > g[8] > 0
    m = MaxFilter(3)(x)
    assert m[9] == 1.0 and m[11] == 1.0 and m[7] == 0.0


def test_zoo_list_and_load():
    names = Zoo.list()
    assert "fasttext-en" in names
    assert "glove-6B-300" in names
    emb = Zoo.load("fasttext-en")
    assert emb.name == "fasttext-en"
    assert Zoo.url("fasttext-en").startswith("https://")
    with pytest.raises(KeyError):
        Zoo.load("nope")


def test_corpus_persistence(tmp_path):
    imp = StringImporter()
    d1 = imp("The king rides. The queen sleeps.", title="t1", author="a")
    d2 = imp("Another text entirely.", title="t2")
    with Corpus(tmp_path / "c") as corpus:
        uid1 = corpus.add_doc(d1)
        uid2 = corpus.add_doc(d2)
        # dedup: same text -> same uid
        d1b = imp("The king rides. The queen sleeps.", title="t1-copy")
        assert corpus.add_doc(d1b) == uid1
        assert len(corpus) == 2

    with Corpus(tmp_path / "c") as corpus:
        assert len(corpus) == 2
        doc = corpus.get_doc(uid1)
        assert doc.text == d1.text
        assert doc.metadata["title"] == "t1"
        np.testing.assert_array_equal(doc.idx, d1.idx)
        assert doc.pos == d1.pos
        np.testing.assert_array_equal(doc.spans["sentence"], d1.spans["sentence"])
        # a session can be built straight from a reloaded corpus
        emb = make_embedding(["king", "rides", "queen", "sleeps", "the"])
        session = Session(corpus.docs, embeddings=[emb])
        index = session.partition("sentence").index(EmbeddingTokenSim(emb))
        r = index.find("The king rides", n=2)
        assert len(r) >= 1


def test_flavor_persistence_skips_normalization(tmp_path, monkeypatch):
    """A reopened corpus + session loads the persisted flavor: ZERO
    normalization/interning work, identical prepared and packed arrays,
    byte-identical search results (reference FlavorBuilder,
    corpus/corpus.py:68-192; VERDICT round-1 item 5)."""
    monkeypatch.setenv("VECTORIAN_CACHE_HOME", str(tmp_path / "cache"))
    imp = StringImporter()
    texts = [
        "The king rides the grey horse. The queen sleeps.",
        "A bird sings. Another text entirely.",
    ]
    emb = make_embedding(
        ["king", "rides", "queen", "sleeps", "the", "grey", "horse",
         "bird", "sings", "another", "text", "entirely", "a"]
    )
    with Corpus(tmp_path / "c") as corpus:
        for i, t in enumerate(texts):
            corpus.add_doc(imp(t, title=f"t{i}"))
        s1 = Session(corpus, embeddings=[emb])
        assert (tmp_path / "c" / "flavors").exists()
        assert list((tmp_path / "c" / "flavors").glob("*.h5"))
        ix1 = s1.partition("sentence").index(EmbeddingTokenSim(emb))
        want = [
            (m.slice_id, m.score)
            for m in ix1.find("the king rides", n=3, min_score=0.1)
        ]
        tok1 = [pd.token_ids.copy() for pd in s1.documents]
        vocab1 = list(s1.vocab.tokens.strings)
        p1 = s1.packed_corpus(s1.partition("sentence").spec)

    # reopening must never touch prepare_document (normalization + intern)
    import vectorian_tpu.session as session_mod

    def boom(*a, **k):
        raise AssertionError("normalization ran on a flavor-cached corpus")

    monkeypatch.setattr(session_mod, "prepare_document", boom)
    with Corpus(tmp_path / "c") as corpus:
        s2 = Session(corpus, embeddings=[emb])
        assert [pd.token_ids.tolist() for pd in s2.documents] == [
            t.tolist() for t in tok1
        ]
        assert list(s2.vocab.tokens.strings) == vocab1
        p2 = s2.packed_corpus(s2.partition("sentence").spec)
        np.testing.assert_array_equal(p1.slice_doc, p2.slice_doc)
        np.testing.assert_array_equal(
            p1.buckets[0].token_ids, p2.buckets[0].token_ids
        )
        ix2 = s2.partition("sentence").index(EmbeddingTokenSim(emb))
        got = [
            (m.slice_id, m.score)
            for m in ix2.find("the king rides", n=3, min_score=0.1)
        ]
        assert got == want

    # a DIFFERENT flavor must miss (and rebuild, not crash)
    monkeypatch.undo()
    from vectorian_tpu.normalization import LowercaseNormalization

    with Corpus(tmp_path / "c") as corpus:
        s3 = Session(
            corpus, embeddings=[emb], normalization=LowercaseNormalization()
        )
        assert len(list((tmp_path / "c" / "flavors").glob("*.h5"))) == 2
        # adding a doc invalidates the cached flavors (content key)
        corpus.add_doc(imp("Fresh content.", title="t9"))
        s4 = Session(corpus, embeddings=[emb])
        assert len(s4.documents) == 3


def test_temporary_corpus():
    imp = StringImporter()
    corpus = TemporaryCorpus()
    corpus.add_doc(imp("Some text here.", title="x"))
    assert len(corpus) == 1
    path = corpus.path
    corpus.close()
    assert not path.exists()


def test_packed_corpus_disk_cache(tmp_path, monkeypatch):
    """Packed arrays round-trip through the on-disk cache."""
    monkeypatch.setenv("VECTORIAN_CACHE_HOME", str(tmp_path))
    from vectorian_tpu import Session, StringImporter
    from vectorian_tpu.corpus.packing import load_packed, save_packed

    emb = make_embedding(["king", "rides", "the", "horse"])
    docs = [StringImporter()("the king rides the horse. the horse rides.", title="x")]
    s1 = Session(docs, embeddings=[emb])
    p1 = s1.packed_corpus(s1.partition("sentence").spec)
    cache_files = list((tmp_path / "packed").glob("*.npz"))
    assert len(cache_files) == 1

    # second session with identical corpus loads from cache
    s2 = Session(docs, embeddings=[emb])
    p2 = s2.packed_corpus(s2.partition("sentence").spec)
    np.testing.assert_array_equal(p1.slice_len, p2.slice_len)
    np.testing.assert_array_equal(
        p1.buckets[0].token_ids, p2.buckets[0].token_ids
    )
    # direct round trip
    save_packed(p1, tmp_path / "direct.npz")
    p3 = load_packed(tmp_path / "direct.npz")
    assert p3.partition == p1.partition
    np.testing.assert_array_equal(p3.slice_doc, p1.slice_doc)


def test_span_index_save_load_validated(small_session, tmp_path):
    """SpanEncoderIndex dumps carry provenance and are validated on load
    (reference save, index.py:638-658; the load half was commented out
    there)."""
    session, emb, locations = small_session
    span_emb = AggregatedTokenEmbedding(emb, agg="mean")
    ix = session.partition("sentence").index(EmbeddedSpanSim(span_emb))
    want = [(m.slice_id, m.score) for m in ix.find("the old king rides", n=3, min_score=-1)]
    p = tmp_path / "span_index.npz"
    ix.save(p)

    ix2 = session.partition("sentence").index(EmbeddedSpanSim(span_emb))
    ix2.load(p)
    got = [(m.slice_id, m.score) for m in ix2.find("the old king rides", n=3, min_score=-1)]
    assert got == want

    # wrong partition -> rejected
    ix3 = session.partition("document").index(EmbeddedSpanSim(span_emb))
    with pytest.raises(ValueError):
        ix3.load(p)


def test_approximate_span_index(small_session):
    """IVF shortlist index: nprobe=nlist is exhaustive (equals the exact
    GEMM index byte-for-byte); small nprobe returns a subset with exact
    scores (the documented approximate contract)."""
    session, emb, locations = small_session
    span_emb = AggregatedTokenEmbedding(emb, agg="mean")
    p = session.partition("sentence")
    exact = p.index(EmbeddedSpanSim(span_emb))
    want = [
        (m.slice_id, m.score)
        for m in exact.find("the old king rides", n=5, min_score=-1)
    ]

    full = p.index(
        EmbeddedSpanSim(span_emb), approximate={"nlist": 4, "nprobe": 4}
    )
    got = [
        (m.slice_id, m.score)
        for m in full.find("the old king rides", n=5, min_score=-1)
    ]
    assert got == want

    sparse = p.index(
        EmbeddedSpanSim(span_emb), approximate={"nlist": 4, "nprobe": 1}
    )
    got1 = [
        (m.slice_id, m.score)
        for m in sparse.find("the old king rides", n=5, min_score=-1)
    ]
    exact_map = dict(
        (m.slice_id, m.score)
        for m in exact.find(
            "the old king rides", n=exact.packed.n_slices, min_score=-1
        )
    )
    assert got1  # the probed list holds at least the nearest span
    for sid, score in got1:
        assert exact_map.get(sid) == score  # scores are exact on members
    # batched path agrees with per-query
    rb = sparse.find_batch(["the old king rides"], n=5, min_score=-1)
    assert [(m.slice_id, m.score) for m in rb[0]] == got1


def test_download_machinery(tmp_path):
    """download(): streaming fetch via injectable fetcher, sha256 verify,
    idempotence, gzip + zip post-processing — the reference's
    embedding/utils.py:42-85 pipeline, testable without egress."""
    import gzip
    import hashlib
    import io
    import zipfile

    import pytest as _pytest

    from vectorian_tpu.embedding.utils import download

    data = b"hello embedding bytes"

    def fetcher(url):
        yield data

    out = download(
        "http://host/y/plain.txt", tmp_path, fetcher=fetcher,
        checksum=hashlib.sha256(data).hexdigest(),
    )
    assert out == tmp_path / "plain.txt" and out.read_bytes() == data

    def boom(url):
        raise AssertionError("existing artifact must not refetch")

    assert download("http://host/y/plain.txt", tmp_path, fetcher=boom) == out

    # checksum mismatch: raise AND leave nothing behind
    with _pytest.raises(ValueError):
        download(
            "http://host/y/bad.txt", tmp_path, fetcher=fetcher,
            checksum="0" * 64,
        )
    assert not (tmp_path / "bad.txt").exists()

    # a failing fetch never leaves a torn file
    def torn(url):
        yield b"partial"
        raise IOError("connection reset")

    with _pytest.raises(IOError):
        download("http://host/y/torn.txt", tmp_path, fetcher=torn)
    assert not (tmp_path / "torn.txt").exists()

    # .gz decompresses to the stem
    gz = gzip.compress(b"unzipped!")
    out = download(
        "http://host/z/file.txt.gz", tmp_path, fetcher=lambda u: iter([gz])
    )
    assert out == tmp_path / "file.txt" and out.read_bytes() == b"unzipped!"
    assert not (tmp_path / "file.txt.gz").exists()

    # .zip: members flatten next to the archive; archive removed
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("nested/glove.6B.50d.txt", "the 1 0\n")
        zf.writestr("nested/glove.6B.100d.txt", "the 1 0 0 0\n")
    d2 = tmp_path / "z2"
    download(
        "http://host/glove.6B.zip", d2, fetcher=lambda u: iter([buf.getvalue()])
    )
    assert (d2 / "glove.6B.50d.txt").exists()
    assert (d2 / "glove.6B.100d.txt").exists()
    assert not (d2 / "glove.6B.zip").exists()


def test_zoo_fetch_glove_and_numberbatch(tmp_path, monkeypatch):
    """Zoo.fetch drives the full pipeline from a local fixture: glove zip
    -> cache file PretrainedGloVe loads; numberbatch gz dump -> extracted
    per-language word2vec text Word2VecVectors loads."""
    import gzip
    import io
    import zipfile

    monkeypatch.setenv("VECTORIAN_CACHE_HOME", str(tmp_path))
    from vectorian_tpu.embedding.zoo import Zoo
    from vectorian_tpu.normalization import VanillaNormalization

    # like the real archive, several dim variants per zip (a single-member
    # zip would be renamed to the archive stem — reference semantics)
    rng = np.random.default_rng(0)

    def glove_lines(d):
        return "\n".join(
            w + " " + " ".join(f"{x:.3f}" for x in rng.normal(size=d))
            for w in ("king", "queen", "horse")
        ) + "\n"

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("glove.6B.50d.txt", glove_lines(50))
        zf.writestr("glove.6B.100d.txt", glove_lines(100))

    path = Zoo.fetch(
        "glove-6B-50", fetcher=lambda u: iter([buf.getvalue()])
    )
    assert path.exists()
    emb = Zoo.load("glove-6B-50")
    enc = emb.create_encoder(VanillaNormalization())
    assert enc.word_vec("king").shape == (50,)
    assert np.abs(enc.word_vec("king")).sum() > 0

    # numberbatch: multilingual dump, en extracted to word2vec text
    nb_lines = ["6 4"]
    for lang in ("en", "de"):
        for i, w in enumerate(("sun", "moon", "sea")):
            nb_lines.append(f"/c/{lang}/{w} {i}.0 1.0 2.0 3.0")
    nb_gz = gzip.compress(("\n".join(nb_lines) + "\n").encode())
    path = Zoo.fetch(
        "numberbatch-19.08-en", fetcher=lambda u: iter([nb_gz])
    )
    assert path.name == "numberbatch-en-19.08.txt"
    emb = Zoo.load("numberbatch-19.08-en")
    enc = emb.create_encoder(VanillaNormalization())
    assert enc.word_vec("moon").shape == (4,)
    assert enc.word_vec("moon")[0] == pytest.approx(1.0)

    # load(fetch=True) short-circuits on the now-present artifact
    emb2 = Zoo.load("numberbatch-19.08-en", fetch=True, fetcher=None)
    assert emb2.name == emb.name


def test_custom_vector_metric_end_to_end(small_session):
    """User-defined VectorSim subclasses run on device inside the engine
    (the reference's python-metric plugin point, metric/static.cpp:42-55 +
    sim/vector.py)."""
    import jax
    import jax.numpy as jnp

    from vectorian_tpu.sim.span import OptimizedSpanSim
    from vectorian_tpu.sim.token import EmbeddingTokenSim
    from vectorian_tpu.sim.vector import VectorSim

    class SoftCosine(VectorSim):
        """cosine^p — a parameterized custom metric."""

        def __init__(self, power):
            self._power = float(power)

        @property
        def ident(self):  # jit-cache identity must cover parameters
            return (type(self).__name__, self._power)

        def compute(self, a, b):
            c = jnp.dot(
                jnp.asarray(a.normalized),
                jnp.asarray(b.normalized).T,
                precision=jax.lax.Precision.HIGHEST,
            )
            return jnp.clip(c, 0.0, 1.0) ** self._power

        @property
        def name(self):
            return f"soft-cosine-{self._power}"

    session, emb, _ = small_session
    p = session.partition("sentence")
    ix = p.index(
        OptimizedSpanSim(EmbeddingTokenSim(emb, SoftCosine(2.0)))
    )
    r = ix.find("the king rides the horse", n=3, min_score=-5)
    assert len(r) >= 1
    # exact self-match still scores 1 (exact-token override precedes ^p)
    assert r[0].score == pytest.approx(1.0, abs=1e-4)
    # squaring reduces sub-1 similarities: a fuzzier query scores lower
    # under SoftCosine(2) than under SoftCosine(1)
    ix1 = p.index(OptimizedSpanSim(EmbeddingTokenSim(emb, SoftCosine(1.0))))
    r2a = ix1.find("king horse rides", n=1, min_score=-5)
    r2b = ix.find("king horse rides", n=1, min_score=-5)
    assert r2b[0].score <= r2a[0].score + 1e-6


def test_parameterized_metric_jit_identity(small_session):
    """Metrics with parameters must key the jit cache on those parameters —
    two RBF gammas must give different scores (regression: ident collision
    reused the first trace)."""
    from vectorian_tpu.sim.kernel import DistanceToSimilarity, RadialBasis
    from vectorian_tpu.sim.span import OptimizedSpanSim
    from vectorian_tpu.sim.token import EmbeddingTokenSim
    from vectorian_tpu.sim.vector import ModifiedVectorSim, PNormDistance

    from vectorian_tpu.ops.simmatrix import compile_similarity

    session, emb, _ = small_session

    def matrix(gamma):
        m = ModifiedVectorSim(
            PNormDistance(2), DistanceToSimilarity(), RadialBasis(gamma)
        )
        # OOV needle id (-1) so the exact-match override can't mask the
        # metric values
        out = compile_similarity(
            EmbeddingTokenSim(emb, m),
            session.compiled_embeddings,
            np.asarray([-1], np.int32),
            ["king"],
        )
        return np.asarray(out["similarity"])

    m1, m2 = matrix(0.5), matrix(8.0)
    assert not np.allclose(m1, m2, atol=1e-6)
    # idents differ, so the two compiles were distinct
    m1 = ModifiedVectorSim(PNormDistance(2), RadialBasis(0.5))
    m2 = ModifiedVectorSim(PNormDistance(2), RadialBasis(8.0))
    assert m1.ident != m2.ident and hash(m1) != hash(m2)


def test_span_encoder_find_batch(small_session):
    """Batched span-encoder search: one corpus GEMM serves Q queries and
    must replicate the single-query results exactly."""
    session, emb, locations = small_session
    span_emb = SentenceEmbedding(emb, agg="mean")
    index = session.partition("sentence").index(EmbeddedSpanSim(span_emb))
    queries = [
        "the old king rides the grey horse",
        "a quick fox",
        "",
    ]
    batch = index.find_batch(queries, n=4, min_score=-5.0)
    assert len(batch) == 3
    for q, br in zip(queries, batch):
        sr = index.find(q, n=4, min_score=-5.0)
        # ids and order match exactly; scores agree to GEMM-tiling rounding
        # (a [S,d]x[d,Q] matmul reduces in a different order than [S,d]x[d,1])
        assert [m.slice_id for m in br] == [m.slice_id for m in sr], q
        np.testing.assert_allclose(
            [m.score for m in br], [m.score for m in sr], atol=1e-5
        )


def test_token_span_browsing_objects():
    """User-facing Token/Span handles (reference corpus/document.py:
    541-623): .text from the original document, iteration, html repr,
    Match.span reconstruction through the flavor mask."""
    import vectorian_tpu as vt
    from vectorian_tpu.sim.token import EmbeddingTokenSim

    from .helpers import make_embedding

    words = ["the", "old", "king", "rides", "horse"]
    emb = make_embedding(words, name="tsb")
    doc = vt.StringImporter()(
        "The old king rides, naturally. A horse sleeps.", title="d"
    )
    # raw Document browsing
    sent = doc.span("sentence", 0)
    assert isinstance(sent, vt.Span)
    assert sent.text == "The old king rides, naturally."
    assert [t.text for t in sent][:3] == ["The", "old", "king"]
    assert sent[1].pos in ("ADJ", "NOUN")
    assert "old" in sent._repr_html_()
    assert "sentence 2" in doc.structure
    with_idx = doc.token(2)
    assert with_idx.text == "king" and with_idx.index == 2

    # prepared (flavor-masked) browsing: punctuation is filtered but the
    # reconstructed span text still comes from the ORIGINAL characters
    session = vt.Session([doc], embeddings=[emb])
    ix = session.partition("sentence").index(EmbeddingTokenSim(emb))
    pd = session.documents[0]
    sp = pd.span(ix.partition, 0)
    assert "old king rides" in sp.text
    r = ix.find("old king rides", n=1, min_score=0.0)
    m = r[0]
    assert "king" in m.span.text
    assert len(m.span) >= 3
