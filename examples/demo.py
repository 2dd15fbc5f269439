"""End-to-end tour of vectorian_tpu on a small in-memory corpus.

Runs every metric family (alignment localities / gap models, tag weighting,
WMD variants, WRD, span encoder) plus batch serving, and prints top
matches.  Works on CPU (JAX_PLATFORMS=cpu) or a TPU.

    python examples/demo.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# this environment's jax build IGNORES the JAX_PLATFORMS env var; the
# config update is the only reliable pin (and only works pre-init)
if os.environ.get("JAX_PLATFORMS") == "cpu":
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np

import vectorian_tpu as vt
from vectorian_tpu.alignment import (
    ConstantGapCost,
    ExponentialGapCost,
    GlobalAlignment,
    LocalAlignment,
    WordMoversDistance,
    WordRotatorsDistance,
)
from vectorian_tpu.embedding.static import KeyedVectors
from vectorian_tpu.embedding.span import SentenceEmbedding
from vectorian_tpu.metrics import (
    CosineSim,
    EmbeddedSpanSim,
    EmbeddingTokenSim,
    OptimizedSpanSim,
)

TEXT = (
    "the old king rides the grey horse across the misty field. "
    "a young queen walks her white mare through the garden. "
    "the knight sharpens his long sword by the fire. "
    "a small bird sings in the apple tree at dawn. "
    "the old man tends the quiet garden near the river."
)


def main():
    rng = np.random.default_rng(0)
    words = sorted(set(w.strip(".") for w in TEXT.split()))
    emb = KeyedVectors(
        "demo", words, rng.normal(size=(len(words), 64)).astype("float32")
    )
    docs = [vt.StringImporter()(TEXT, title="demo")]
    session = vt.Session(docs, embeddings=[emb])
    partition = session.partition("sentence")
    query = "old king rides grey horse"

    def show(label, result):
        top = [f"{m.score:.3f}" for m in result]
        print(f"{label:42s} {top}")

    configs = [
        ("local alignment (Smith-Waterman)", LocalAlignment()),
        ("global alignment + constant gaps", GlobalAlignment(ConstantGapCost(0.4))),
        ("local + exponential gap costs (WSB)", LocalAlignment(ExponentialGapCost(3.0))),
        ("relaxed WMD (nbow, symmetric)", WordMoversDistance.rwmd("nbow")),
        ("full WMD (Sinkhorn + exact rescore)", WordMoversDistance.wmd("nbow")),
        ("Word Rotator's Distance", WordRotatorsDistance()),
    ]
    for label, opt in configs:
        index = partition.index(OptimizedSpanSim(EmbeddingTokenSim(emb), opt))
        show(label, index.find(query, n=3, min_score=-5))

    tagged = partition.index(
        OptimizedSpanSim(
            EmbeddingTokenSim(emb),
            tag_weights={"NN": 1.0, "VB": 1.2, "DT": 0.3},
            pos_mismatch_penalty=0.2,
        )
    )
    show("tag-weighted alignment (POST-STSS style)", tagged.find(query, n=3, min_score=-5))

    span_ix = partition.index(EmbeddedSpanSim(SentenceEmbedding(emb), CosineSim()))
    show("span-embedding search (GEMM top-k)", span_ix.find(query, n=3, min_score=-5))

    batch_ix = partition.index(EmbeddingTokenSim(emb))
    results = batch_ix.find_batch([query, "bird sings tree", "man tends garden"], n=2)
    print("\nbatch serving (one corpus pass):")
    for q, r in zip([query, "bird sings tree", "man tends garden"], results):
        print(f"  {q!r:34s} -> {[f'{m.score:.3f}' for m in r]}")

    best = batch_ix.find(query, n=1)[0]
    print("\ntop match JSON regions:")
    for region in best.to_json(context_size=6)["regions"]:
        print(" ", region)

    # evaluation metrics over a result (reference's notebook NDCG workflow)
    r = batch_ix.find(query, n=3, min_score=-5)
    relevant = {r[0].slice_id}
    print(
        f"\nevaluation: precision={r.precision(relevant):.2f} "
        f"recall={r.recall(relevant):.2f} ndcg={r.ndcg(relevant):.2f}"
    )

    # saliency boosting: slices mentioning 'garden' get boosted
    from vectorian_tpu.saliency import KeywordSignal, Saliency

    booster = Saliency(strength=0.8).add_signal(KeywordSignal("garden"))
    boosted = batch_ix.find("the old man", n=2, min_score=-5, booster=booster)
    show("saliency-boosted ('garden' slices favored)", boosted)

    # debug hooks: per-query introspection payloads (reference debug dicts)
    seen = []
    batch_ix.find(query, n=1, debug=lambda name, data: seen.append(name))
    print("debug payloads emitted:", sorted(set(seen)))

    # browsing objects (round 5): the matched slice as Token/Span handles
    span = best.span
    print("matched span text:", repr(span.text))
    print("matched tokens:", [(t.text, t.pos) for t in span][:6])

    # single-query multi-chip serving (round 5): one query, every chip —
    # byte-identical to single-chip find()
    from vectorian_tpu.parallel.mesh import MeshSearch, make_mesh

    ms = MeshSearch(make_mesh())
    mesh_best = batch_ix.find(query, n=1, mesh=ms)[0]
    assert (mesh_best.slice_id, mesh_best.score) == (
        best.slice_id, best.score,
    )
    print("find(mesh=...) byte-identical:", True)


if __name__ == "__main__":
    main()
    os._exit(0)
