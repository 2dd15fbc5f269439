"""The canonical PR1 benchmark configuration as a correctness test
(BASELINE config 1): 300d embedding + Smith-Waterman local alignment,
4-8 token queries over ~1k sentences, top-10 — recall@10 parity vs the
scalar numpy oracle."""

import numpy as np
import pytest

from vectorian_tpu import Session, StringImporter
from vectorian_tpu.alignment import LocalAlignment
from vectorian_tpu.sim.span import OptimizedSpanSim
from vectorian_tpu.sim.token import EmbeddingTokenSim

from .helpers import WORDS, make_embedding, word_vector
from .oracle import gotoh_align


@pytest.fixture(scope="module")
def corpus_1k():
    rng = np.random.default_rng(99)
    n_docs, sents = 10, 100  # ~1000 sentences
    texts = []
    for d in range(n_docs):
        s = [
            " ".join(rng.choice(WORDS, size=rng.integers(4, 14)))
            for _ in range(sents)
        ]
        texts.append(". ".join(s) + ".")
    docs = [StringImporter()(t, title=f"doc{i}") for i, t in enumerate(texts)]
    emb = make_embedding(sorted(set(WORDS)), dim=300, name="ft300")
    session = Session(docs, embeddings=[emb])
    return session, emb


def test_pr1_recall10_parity(corpus_1k):
    session, emb = corpus_1k
    index = session.partition("sentence").index(
        OptimizedSpanSim(EmbeddingTokenSim(emb), LocalAlignment())
    )
    packed = index.packed
    assert 900 <= packed.n_slices <= 1100

    rng = np.random.default_rng(7)
    for qlen in (4, 6, 8):
        qwords = [str(w) for w in rng.choice(WORDS, size=qlen)]
        query = " ".join(qwords)
        result = index.find(query, n=10, min_score=-10)
        got = [(m.slice_id, m.score) for m in result]

        # oracle over all slices with 300d vectors
        vocab_strings = session.vocab.tokens.strings
        w2v = {w: word_vector(w, 300) for w in set(vocab_strings) | set(qwords)}
        qn = np.stack([w2v[w] / np.linalg.norm(w2v[w]) for w in qwords])
        scores = np.zeros(packed.n_slices, np.float32)
        for sid in range(packed.n_slices):
            d = int(packed.slice_doc[sid])
            s0 = int(packed.slice_start[sid])
            ln = int(packed.slice_len[sid])
            if ln == 0:
                continue
            ids = session.documents[d].token_ids[s0 : s0 + ln]
            toks = [vocab_strings[i] for i in ids]
            dv = np.stack([w2v[t] / np.linalg.norm(w2v[t]) for t in toks])
            S = dv @ qn.T
            for j, qw in enumerate(qwords):
                for i, t in enumerate(toks):
                    if t == qw:
                        S[i, j] = 1.0
            S = np.clip(S, 0.0, 1.0).astype(np.float32)
            raw, _, _, _ = gotoh_align(S, 0, 0, 0, 0, "local")
            scores[sid] = raw / qlen

        want_ids = set(np.argsort(-scores.astype(np.float64), kind="stable")[:10].tolist())
        got_ids = {g[0] for g in got}
        # recall@10: allow 1 tie-boundary difference
        assert len(got_ids & want_ids) >= 9, (qlen, got_ids, want_ids)
        for sid, sc in got:
            assert sc == pytest.approx(float(scores[sid]), abs=3e-4)
