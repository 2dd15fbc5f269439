"""Production serving patterns: warmup, batched queries, quantized
ranking precision, and multi-chip meshes.

Runs on CPU; to see a multi-device mesh without hardware:

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        FORCE_CPU=1 python examples/serving.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("FORCE_CPU"):
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np

import vectorian_tpu as vt
from vectorian_tpu.embedding.static import KeyedVectors
from vectorian_tpu.metrics import EmbeddingTokenSim

WORDS = (
    "the old king queen rides walks grey white horse mare field garden "
    "knight sword fire bird tree dawn man river sings small young misty"
).split()

TEXT = (
    "the old king rides the grey horse across the misty field. "
    "a young queen walks her white mare through the garden. "
    "the knight sharpens his long sword by the fire. "
    "a small bird sings in the apple tree at dawn. "
    "the old man tends the quiet garden near the river."
)


def main():
    rng = np.random.default_rng(0)
    emb = KeyedVectors(
        "demo", WORDS, rng.normal(size=(len(WORDS), 32)).astype(np.float32)
    )
    docs = [vt.StringImporter()(TEXT, title="demo")]
    session = vt.Session(docs, embeddings=[emb])

    # 1. warmup: precompile the needle-length buckets before traffic
    index = session.partition("sentence").index(EmbeddingTokenSim(emb))
    index.warmup(max_tokens=8)

    queries = [
        "the old king rides the grey horse",
        "a bird sings at dawn",
        "knight with a sword",
        "queen in the garden",
    ]

    # 2. batched throughput serving: Q queries share one corpus pass.
    # Ranking uses an int8 table by default; the final top-n is exactly
    # rescored in f32 (results identical to sim_precision="float32").
    t0 = time.time()
    results = index.find_batch(queries, n=3, min_score=0.1)
    print(f"batched ({len(queries)} queries, {time.time()-t0:.2f}s):")
    for q, r in zip(queries, results):
        best = r[0] if len(r) else None
        if best:
            text = " ".join(
                reg["s"].strip() for reg in best.to_json()["regions"]
                if reg["s"].strip()
            )
            print(f"  {q!r} -> {text[:45]!r} {best.score:.3f}")
        else:
            print(f"  {q!r} -> no match")

    # forcing full f32 ranking gives byte-identical results, slower pass
    f32 = index.find_batch(queries, n=3, min_score=0.1, sim_precision="float32")
    assert all(
        [(m.slice_id, m.score) for m in a] == [(m.slice_id, m.score) for m in b]
        for a, b in zip(results, f32)
    )
    print("int8 ranking == f32 ranking: verified")

    # 3. multi-chip: shard the corpus pass over a device mesh.  The same
    # exactness guarantee holds (per-query next-best bound + f32 rescore).
    import jax

    if len(jax.devices()) > 1:
        from vectorian_tpu.parallel.mesh import MeshSearch, make_mesh

        ms = MeshSearch(make_mesh())
        mesh_results = index.find_batch(queries, n=3, min_score=0.1, mesh=ms)
        assert all(
            [(m.slice_id, m.score) for m in a]
            == [(m.slice_id, m.score) for m in b]
            for a, b in zip(mesh_results, f32)
        )
        print(f"mesh serving over {ms.n_devices} devices: identical results")
    else:
        print("single device — run with the XLA_FLAGS above to demo the mesh")


if __name__ == "__main__":
    main()
    os._exit(0)
