"""Bound-quality analysis for the MXU prefilter on the bench corpus:
for real Zipf queries, compute the exact device scores (score_all) and
the host-side upper bounds (v1 = count GEMV bound; v2 = per-token
refined top1/top2 bound with the top-len_t cap), then report per query
the minimal M for a provable n-th cut: #slices with ub >= s_n.

If min-M is ~10^5 on this corpus, no selection kernel saves the
approach — that's the committed evidence VERDICT r4 item 1 asks for
either way.

Usage: python scripts/analyze_prefilter_bound.py [n_sents] [n_queries]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def log(msg):
    print(f"[pfan {time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr,
          flush=True)


def main(n_sents=1_000_000, n_q=8):
    import jax

    if os.environ.get("FORCE_CPU"):
        jax.config.update("jax_platforms", "cpu")
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.expanduser("~/.cache/vectorian_jax"),
    )
    import vectorian_tpu as vt
    from vectorian_tpu.embedding.static import KeyedVectors
    from vectorian_tpu.metrics import EmbeddingTokenSim

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
    sents_per_doc = 2_000
    texts = []
    for _ in range(max(n_sents // sents_per_doc, 1)):
        ids = np.minimum(rng.zipf(1.2, size=(sents_per_doc, 9)), V_words - 1)
        texts.append(
            " ".join(" ".join(words[i] for i in row) + "." for row in ids)
        )
    docs = [vt.StringImporter()(t, title=f"d{i}") for i, t in enumerate(texts)]
    session = vt.Session(docs, embeddings=[emb])
    index = session.partition("sentence").index(EmbeddingTokenSim(emb))
    n_slices = index.packed.n_slices
    log(f"packed {n_slices} slices")

    engine = index._engine

    # host token arrays per bucket
    from vectorian_tpu.index import _pad_needle
    from vectorian_tpu.ops.simmatrix import compile_plan

    def zipf_query():
        return " ".join(
            words[int(i)]
            for i in np.minimum(rng.zipf(1.2, size=7), V_words - 1)
        )

    index.find(zipf_query(), n=10, min_score=0.2)  # warm

    for t in range(n_q):
        qtext = zipf_query()
        query = index.make_query(qtext, n=10, min_score=0.2)
        pq = query.prepare(index._nlp)
        if pq.n_tokens == 0:
            continue
        tok_ids_p, strings_p, ctx_q, Tpad = _pad_needle(pq, session,
                                                        ctx_names=[])
        qp = compile_plan(
            index._args["metric"]["token_sim"],
            session.compiled_embeddings, tok_ids_p, strings_p, ctx_q,
        )
        T = pq.n_tokens
        from vectorian_tpu.ops.alignment import AffineGapParams

        gaps = index._affine_gaps()
        norm_total = float(T)
        scores = engine.score_all(
            qp, T, gaps, index._locality, norm_total
        )  # [n_slices] host
        order = np.argsort(-scores)
        s10 = scores[order[9]]
        raw_n = s10 * norm_total

        # host-side bounds from the static table
        table = np.asarray(qp.static_sims[0])[:, :T]  # [V, T]
        rel = np.maximum(table, 0.0)
        srt = np.sort(rel, axis=1)[:, ::-1]  # desc: [V, T] t1, t2, ...
        t1 = srt[:, 0]
        t2 = srt[:, 1] if T >= 2 else np.zeros_like(t1)
        # cumulative sums of the c-th largest values: csum[v, c] =
        # t1+..+tc; the depth-inf capped bound contribution of tf copies
        # of v is csum[v, min(tf, T)]
        csum = np.concatenate(
            [np.zeros((srt.shape[0], 1), np.float32), np.cumsum(srt, axis=1)],
            axis=1,
        )

        dup_hist = np.bincount(
            np.asarray(pq.token_ids)[np.asarray(pq.token_ids) >= 0]
        )
        max_ndup = int(dup_hist.max()) if dup_hist.size else 1

        ub1 = np.full(n_slices, -np.inf, np.float32)
        ub2 = np.full(n_slices, -np.inf, np.float32)
        ub3 = np.full(n_slices, -np.inf, np.float32)
        for db in engine._device_buckets:
            tok = db["tokens_np"][: db["n"]]
            ln = db["lengths_np"][: db["n"]]
            L = tok.shape[1]
            valid = np.arange(L)[None, :] < ln[:, None]
            ts = np.sort(np.where(valid, tok, -1), axis=1)
            first = np.ones_like(ts, bool)
            first[:, 1:] = ts[:, 1:] != ts[:, :-1]
            # occurrence index of each sorted token within its run (0-based)
            occ = np.zeros_like(ts)
            for c in range(1, L):
                occ[:, c] = np.where(first[:, c], 0, occ[:, c - 1] + 1)
            tsc = np.maximum(ts, 0)
            vals12 = np.where(
                ts >= 0, np.where(first, t1[tsc], t2[tsc]), 0.0
            )
            # v3: c-th occurrence of v credits the c-th largest needle
            # value of v (depth-inf form of the indicator-column scheme)
            vals_inf = np.where(
                ts >= 0,
                np.take_along_axis(
                    srt[tsc], np.minimum(occ, T - 1)[..., None], axis=2
                )[..., 0],
                0.0,
            )
            b1 = vals12.sum(axis=1)
            vs = -np.sort(-vals12, axis=1)
            b2 = vs[:, : min(T, L)].sum(axis=1)
            vs3 = -np.sort(-vals_inf, axis=1)
            b3 = vs3[:, : min(T, L)].sum(axis=1)
            ub1[db["slice_index"]] = b1
            ub2[db["slice_index"]] = b2
            ub3[db["slice_index"]] = b3

        m1 = int((ub1 >= raw_n).sum())
        m2 = int((ub2 >= raw_n).sum())
        m3 = int((ub3 >= raw_n).sum())
        # how deep could the exact scores themselves prune (oracle M)?
        m_oracle = int((scores * norm_total >= raw_n).sum())

        # host replica of the DEVICE GEMM bound (ops/prefilter.py):
        # depth-4 hot indicators + excess@t4 + masked cold groups
        # (distinct@g1/dup@g2) + exact needle-cold side-term
        from vectorian_tpu.ops import prefilter as pfm

        gemm = {}
        for Hg in (256, 512):
            groups = pfm.cold_groups(Hg, table.shape[0])
            Vv = table.shape[0]
            needle = set(
                int(x) for x in np.asarray(tok_ids_p)[:T] if int(x) >= Hg
            )
            t_cols = np.zeros((Vv, 5), np.float32)
            t_cols[:, : min(5, T)] = srt[:, : min(5, T)]
            g1 = np.zeros(len(groups), np.float32)
            g2 = np.zeros(len(groups), np.float32)
            t1m = t_cols[:, 0].copy()
            t2m = t_cols[:, 1].copy()
            if needle:
                nidx = np.asarray(sorted(needle))
                t1m[nidx] = 0.0
                t2m[nidx] = 0.0
            for gi, (lo, hi) in enumerate(groups):
                g1[gi] = t1m[lo:hi].max()
                g2[gi] = t2m[lo:hi].max()
            ubg = np.zeros(n_slices, np.float32)
            for db in engine._device_buckets:
                tok = db["tokens_np"][: db["n"]]
                ln = db["lengths_np"][: db["n"]]
                Lb = tok.shape[1]
                valid = np.arange(Lb)[None, :] < ln[:, None]
                ts = np.sort(np.where(valid, tok, -1), axis=1)
                first = np.ones_like(ts, bool)
                first[:, 1:] = ts[:, 1:] != ts[:, :-1]
                occ = np.zeros_like(ts)
                for c in range(1, Lb):
                    occ[:, c] = np.where(
                        first[:, c], 0, occ[:, c - 1] + 1
                    )
                tsc = np.maximum(ts, 0)
                hot = (ts >= 0) & (ts < Hg)
                # device scheme: occurrences 1..4 credit t1..t4, every
                # further copy credits t4 again (the excess column)
                depth_vals = np.where(
                    hot,
                    np.take_along_axis(
                        t_cols[tsc], np.minimum(occ, 3)[..., None], axis=2
                    )[..., 0],
                    0.0,
                )
                b = depth_vals.sum(axis=1)
                gidx = np.full(ts.shape, -1, np.int32)
                for gi, (lo, hi) in enumerate(groups):
                    gidx[(ts >= lo) & (ts < hi)] = gi
                cold = gidx >= 0
                gsel = np.maximum(gidx, 0)
                cold_vals = np.where(
                    cold,
                    np.where(first, g1[gsel], g2[gsel]),
                    0.0,
                )
                b = b + cold_vals.sum(axis=1)
                if needle:
                    for x in needle:
                        occx = ((tok == x) & valid).sum(axis=1)
                        csx = np.concatenate([[0.0], np.cumsum(t_cols[x])])
                        b = b + csx[np.minimum(occx, 5)] + np.maximum(
                            occx - 5, 0
                        ) * t_cols[x, 4]
                ubg[db["slice_index"]] = b
            gemm[Hg] = int((ubg >= raw_n).sum())
        log(
            f"q{t}: T={T} ndup={max_ndup} s10={s10:.3f} rawn={raw_n:.2f} "
            f"minM_v1={m1} minM_v2={m2} minM_v3={m3} "
            f"gemmH256={gemm[256]} gemmH512={gemm[512]} "
            f"oracle={m_oracle} ub3_max={ub3.max():.2f}"
        )
    os._exit(0)


if __name__ == "__main__":
    main(
        int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000,
        int(sys.argv[2]) if len(sys.argv) > 2 else 8,
    )
