"""ctypes fuzz tests for the native host library.

Random multi-byte UTF-8 through every binding, checked against the pure
python paths — the silent-corruption class (bad offsets, truncated copies,
mojibake) ASAN can't see from python but differential fuzzing can.  The
C++-side ASAN driver is native/test_native.cpp (`make -C native
check-asan`)."""

import numpy as np
import pytest

from vectorian_tpu import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native lib unavailable"
)

_POOL = list("azQ9_") + ["é", "ß", "日", "€", "😀", "́", "ओ"]


def _random_words(rng, n, max_chars=10):
    out = []
    for _ in range(n):
        k = int(rng.integers(0, max_chars + 1))
        out.append("".join(_POOL[int(i)] for i in rng.integers(0, len(_POOL), k)))
    return out


def test_fuzz_fasttext_encode(tmp_path):
    """Native ngram encoder vs the python FastTextModel.word_vector for
    random unicode words (incl. OOV, empty, combining marks, emoji)."""
    from tests.test_fasttext import write_fake_bin
    from vectorian_tpu.embedding.fasttext import FastTextModel

    rng = np.random.default_rng(0)
    vocab = ["the", "cat", "日本", "café"]
    binp = tmp_path / "f.bin"
    write_fake_bin(binp, vocab, dim=12, bucket=128)
    model = FastTextModel.load(binp)

    for _ in range(5):
        queries = vocab + _random_words(rng, 40)
        got = native.fasttext_encode_batch(model, queries)
        for qi, w in enumerate(queries):
            want = model.word_vector(w)
            np.testing.assert_allclose(
                got[qi], want, atol=1e-5, err_msg=repr(w)
            )


def test_fuzz_native_lexicon():
    """NativeLexicon vs the python Lexicon on random unicode batches:
    identical ids, round-tripping strings, -1 unknowns."""
    from vectorian_tpu.vocabulary import Lexicon

    rng = np.random.default_rng(1)
    nlex = native.NativeLexicon()
    plex = Lexicon()
    for _ in range(5):
        words = _random_words(rng, 200) + [
            "x" * 5000, "", "日本語のテキスト",
        ]
        n_ids = nlex.add_many(words)
        p_ids = plex.add_many(words)
        np.testing.assert_array_equal(n_ids, p_ids)
        for w, i in zip(words, n_ids):
            assert nlex.to_str(int(i)) == w
        unknown = ["-never-seen-" + w for w in _random_words(rng, 8)]
        lk = nlex.lookup_many(unknown)
        want = plex.lookup_many(unknown)
        np.testing.assert_array_equal(lk, want)
    assert len(nlex) == len(plex)


def test_fuzz_pack_fill():
    """Native row-memcpy packing vs a numpy reference, boundary lengths
    (0 and cap) included."""
    rng = np.random.default_rng(2)
    for _ in range(10):
        cap = int(rng.integers(1, 33))
        n = 64
        lens = rng.integers(0, cap + 1, size=n).astype(np.int32)
        starts = np.zeros((n,), np.int64)
        np.cumsum(lens[:-1], out=starts[1:])
        total = int(lens.sum())
        flat_tok = rng.integers(0, 1 << 30, size=max(total, 1)).astype(np.int32)
        flat_pos = rng.integers(-128, 128, size=max(total, 1)).astype(np.int8)
        flat_tag = rng.integers(-32768, 32768, size=max(total, 1)).astype(np.int16)
        tok, pos, tag = native.pack_fill(
            flat_tok, flat_pos, flat_tag, starts, lens, cap
        )
        want_tok = np.zeros((n, cap), np.int32)
        want_pos = np.zeros((n, cap), np.int8)
        want_tag = np.zeros((n, cap), np.int16)
        for i in range(n):
            s, l = int(starts[i]), int(lens[i])
            want_tok[i, :l] = flat_tok[s : s + l]
            want_pos[i, :l] = flat_pos[s : s + l]
            want_tag[i, :l] = flat_tag[s : s + l]
        np.testing.assert_array_equal(tok, want_tok)
        np.testing.assert_array_equal(pos, want_pos)
        np.testing.assert_array_equal(tag, want_tag)


def test_fuzz_native_emd():
    """Native successive-shortest-path EMD vs the scipy HiGHS LP: the
    optimal COST is the unique LP optimum so the two must agree to fp
    tolerance on every instance (flows may be different optimal vertices
    — check marginal feasibility and non-negativity instead).  Covers
    unbalanced sinks (both sides), zero supplies, tie-heavy rounded
    costs, and every extra_mass_penalty mode the serving path uses."""
    from vectorian_tpu.ops import emd_exact

    rng = np.random.default_rng(3)
    orig_native_emd = native.emd
    for trial in range(120):
        n1 = int(rng.integers(1, 14))
        n2 = int(rng.integers(1, 14))
        w1 = rng.uniform(0, 1, n1)
        w2 = rng.uniform(0, 1, n2)
        if rng.random() < 0.3:
            w1 = w1 / max(w1.sum(), 1e-9)
            w2 = w2 / max(w2.sum(), 1e-9)
        if rng.random() < 0.2:
            w1[int(rng.integers(0, n1))] = 0.0
        D = rng.uniform(0, 2, (n1, n2))
        if rng.random() < 0.3:
            D = np.round(D, 1)  # provoke cost ties / degenerate optima
        pen = float(rng.choice([-1.0, 0.0, 0.5, 2.0]))

        r_n = emd_exact.exact_emd(w1, w2, D, pen)
        try:
            native.emd = lambda *a, **k: None  # force the scipy path
            r_s = emd_exact.exact_emd(w1, w2, D, pen)
        finally:
            native.emd = orig_native_emd
        assert r_n.success == r_s.success, trial
        if not r_n.success:
            continue
        assert r_n.cost == pytest.approx(
            r_s.cost, abs=1e-8 * max(1.0, abs(r_s.cost))
        ), trial
        G = r_n.flow
        assert G.min() >= -1e-12, trial
        s1, s2 = w1.sum(), w2.sum()
        if s1 <= s2 + 1e-12:  # every supply fully shipped
            np.testing.assert_allclose(G.sum(1), w1, atol=1e-9)
        if s2 <= s1 + 1e-12:  # every demand fully met
            np.testing.assert_allclose(G.sum(0), w2, atol=1e-9)


def test_emd_batch_matches_sequential():
    """Threaded native batch EMD == per-call exact_emd bit-for-bit
    (same SSP routine; the batch only partitions problems over threads),
    including sink-padded unbalanced problems."""
    import numpy as np

    from vectorian_tpu.ops.emd_exact import exact_emd, exact_emd_batch

    rng = np.random.default_rng(3)
    specs = []
    for t in range(40):
        n1, n2 = rng.integers(2, 10, size=2)
        w1 = rng.uniform(0.05, 1, n1)
        w2 = rng.uniform(0.05, 1, n2)
        if t % 3:
            w2 = w2 * w1.sum() / w2.sum()  # balanced
        D = rng.uniform(0, 1, (n1, n2))
        specs.append((w1, w2, D, -1.0 if t % 2 else 0.5))
    batch = exact_emd_batch(specs)
    for r, (w1, w2, D, emp) in zip(batch, specs):
        s = exact_emd(w1, w2, D, emp)
        assert r.success == s.success
        if r.success:
            assert abs(r.cost - s.cost) < 1e-9
            np.testing.assert_allclose(r.flow, s.flow, atol=1e-12)
