"""Stepped timing of the REAL prefiltered serving chain on the bench
corpus: upload tables, prefilter kernel, fused top-k exact rescore, and
the batched fetch — each step closed with a host read so the device time
of each segment is explicit (the chained A/B only sees the total).

Usage: python scripts/profile_prefilter_steps.py [n_sents]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def log(msg):
    print(f"[pfstep {time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr,
          flush=True)


def main(n_sents=1_000_000):
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.expanduser("~/.cache/vectorian_jax"),
    )
    import jax.numpy as jnp

    import vectorian_tpu as vt
    from vectorian_tpu.embedding.static import KeyedVectors
    from vectorian_tpu.metrics import EmbeddingTokenSim

    os.environ.setdefault("VECTORIAN_PREFILTER", "1")

    rng = np.random.default_rng(0)
    V_words = 5_000

    def alpha_word(i):
        s = ""
        i += 1
        while i:
            s += chr(ord("a") + i % 26)
            i //= 26
        return "w" + s

    words = [alpha_word(i) for i in range(V_words)]
    emb = KeyedVectors(
        "syn", words, rng.normal(size=(V_words, 300)).astype(np.float32)
    )
    texts = []
    for _ in range(max(n_sents // 2000, 1)):
        ids = np.minimum(rng.zipf(1.2, size=(2000, 9)), V_words - 1)
        texts.append(
            " ".join(" ".join(words[i] for i in row) + "." for row in ids)
        )
    docs = [vt.StringImporter()(t, title=f"d{i}") for i, t in enumerate(texts)]
    session = vt.Session(docs, embeddings=[emb])
    index = session.partition("sentence").index(EmbeddingTokenSim(emb))
    log(f"packed {index.packed.n_slices} slices")
    engine = index._engine

    def zipf_query():
        return " ".join(
            words[int(i)]
            for i in np.minimum(rng.zipf(1.2, size=7), V_words - 1)
        )

    for _ in range(3):
        index.find(zipf_query(), n=10, min_score=0.2)
    log("warm")

    # step through score_topk_prefiltered manually for a few queries
    from vectorian_tpu.index import _pad_needle
    from vectorian_tpu.ops import prefilter as pf
    from vectorian_tpu.ops.search import (
        BucketTopKSource, gap_vec, stack_query_tables,
    )
    from vectorian_tpu.ops.simmatrix import compile_plan

    H, M, _ = pf.config()
    gaps = index._affine_gaps()

    for t in range(4):
        qtext = zipf_query()
        pq = index.make_query(qtext, n=10, min_score=0.2).prepare(index._nlp)
        if pq.n_tokens == 0:
            continue
        T = pq.n_tokens
        tok_ids_p, strings_p, ctx_q, Tpad = _pad_needle(
            pq, session, ctx_names=[]
        )
        qp = compile_plan(
            index._args["metric"]["token_sim"],
            session.compiled_embeddings, tok_ids_p, strings_p, ctx_q,
        )
        t0 = time.perf_counter()
        sim_multi, _, _, Tpad2 = stack_query_tables([qp], [T], None)
        _ = float(np.asarray(sim_multi[0, 0, 0]))
        t_tab = time.perf_counter() - t0

        Vv = int(sim_multi.shape[0])
        groups = pf.cold_groups(H, Vv)
        lt_arr = jnp.asarray([T], jnp.int32)
        nt_arr = jnp.asarray([float(T)], jnp.float32)
        gv_t = jnp.asarray(gap_vec(None, Tpad2 + 1))
        db = max(engine._device_buckets, key=lambda d: d["n"])
        cnt = engine._prefilter_counts(db, H, groups)
        if "_sidx_dev" not in db:
            db["_sidx_dev"] = jnp.asarray(
                np.pad(db["slice_index"], (0, db["n_pad"] - db["n"]))
            )
        gv_s = jnp.asarray(gap_vec(None, db["capacity"] + 1))
        needle_cold = jnp.asarray(
            pf.needle_cold_ids([np.asarray(tok_ids_p)[:T]], H)
        )
        t0 = time.perf_counter()
        out = pf.prefilter_select_score(
            cnt, db["tokens"], db["pos"], db["tag"],
            db["lengths"].astype(jnp.int32), db["_sidx_dev"],
            sim_multi, lt_arr, nt_arr, needle_cold, gaps, gv_s, gv_t,
            M=M, H=H, n=db["n"], locality=index._locality,
            general=False, groups=groups,
        )
        scores_c = out[0]
        _ = float(np.asarray(out[-1]))  # ub_rest read = chain barrier
        t_pf = time.perf_counter() - t0

        db_pref = {
            "capacity": db["capacity"], "chunk": min(db["chunk"], M),
            "n": M, "n_pad": M, "tokens": out[1], "pos": out[2],
            "tag": out[3], "lengths": out[4], "slice_index": None,
            "sid_dev": out[5], "ub_dev": out[6],
        }
        exact_ctx = engine._exact_ctx_of([qp], [T], gaps, index._locality,
                                         None, None, None)
        t0 = time.perf_counter()
        src = BucketTopKSource(engine, [(db_pref, scores_c)], 1, 42,
                               exact_ctx)
        t_src = time.perf_counter() - t0
        log(
            f"q{t}: table upload+read {t_tab*1e3:6.1f} ms | prefilter "
            f"kernel {t_pf*1e3:6.1f} ms | topk-exact+fetch "
            f"{t_src*1e3:6.1f} ms | rest={src.prefilter_rest_raw:.2f}"
        )
    os._exit(0)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000)
