"""BASELINE config 4 integration: compressed fastText ngram embeddings +
PCA-compressed contextual embeddings with mixed-metric rescoring, end to
end through the public API (BASELINE.md "configs" (4))."""

import numpy as np
import pytest

from vectorian_tpu import Session, StringImporter
from vectorian_tpu.embedding.contextual import LambdaContextualEmbedding
from vectorian_tpu.sim.modifier import MixedTokenSimilarity
from vectorian_tpu.sim.token import EmbeddingTokenSim

from .test_contextual import DIM, ctx_fn
from .test_fasttext import write_fake_bin


@pytest.fixture(scope="module")
def config4_session(tmp_path_factory):
    from vectorian_tpu.embedding.fasttext import (
        FastTextModel,
        QuantizedFastText,
        QuantizedFastTextModel,
    )

    tmp = tmp_path_factory.mktemp("cfg4")
    words = ["the", "old", "king", "rides", "grey", "horse", "cat", "sleeps",
             "sun", "shines", "over", "sea", "a"]
    binp = tmp / "ft.bin"
    write_fake_bin(binp, words, dim=16, bucket=128)
    q = QuantizedFastTextModel.compress(
        FastTextModel.load(binp), n_subvectors=4, n_codes=32, n_train=1000,
        n_iters=8,
    )
    npz = tmp / "ft.quant.npz"
    q.save(npz)
    qft = QuantizedFastText(npz, name="qft")  # compressed ngram embedding

    ctx = LambdaContextualEmbedding("cfg4-ctx", ctx_fn, DIM).pca(8)

    docs = [
        StringImporter()(
            "the old king rides the grey horse. a cat sleeps. "
            "the sun shines over the sea.",
            title="d0",
        ),
    ]
    session = Session(docs, embeddings=[qft, ctx])
    return session, qft, ctx


def test_config4_mixed_compressed_search(config4_session):
    """Mixed metric over (compressed-ngram static, PCA contextual): the
    planted sentence must win with a near-perfect score, and the mixture
    must actually differ from either pure metric."""
    session, qft, ctx = config4_session
    p = session.partition("sentence")
    mixed = MixedTokenSimilarity(
        [EmbeddingTokenSim(qft), EmbeddingTokenSim(ctx)], [0.5, 0.5]
    )
    ix = p.index(mixed)
    r = ix.find("the old king rides the grey horse", n=3, min_score=-5.0)
    assert len(r) >= 1
    assert r[0].score == pytest.approx(1.0, abs=0.02)
    j = r[0].to_json()
    assert j["regions"]

    # OOV query tokens still get vectors (fastText ngram construction)
    r2 = ix.find("kingz ridez horze", n=3, min_score=-5.0)
    assert len(r2) >= 1

    pure_static = p.index(EmbeddingTokenSim(qft))
    pure_ctx = p.index(EmbeddingTokenSim(ctx))
    q = "old cat over the sea"
    sm = {m.slice_id: m.score for m in ix.find(q, n=5, min_score=-5.0)}
    ss = {m.slice_id: m.score for m in pure_static.find(q, n=5, min_score=-5.0)}
    sc = {m.slice_id: m.score for m in pure_ctx.find(q, n=5, min_score=-5.0)}
    sid = next(iter(sm))
    # the mixture lies between the two pure scores (weighted average of
    # similarities feeding the same DP; monotone in S)
    lo, hi = sorted([ss[sid], sc[sid]])
    assert lo - 0.05 <= sm[sid] <= hi + 0.05

    # PCA-compressed contextual vectors are genuinely 8-dim on disk
    for pd in session.documents:
        assert pd.contextual["cfg4-ctx"].shape[1] == 8
