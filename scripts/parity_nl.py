"""Mid-scale NATURAL-LANGUAGE parity artifact (VERDICT r4 item 10):
>=100k real English sentences with a natural length/tie distribution,
recall@10 + tie-handling vs the f64 host oracle, plus byte-equality
across the public serving paths.  Writes PARITY_NL_r05.json.

Corpus: this image has zero egress (no Gutenberg download, no pretrained
fastText binary), so the natural text is harvested from the English
prose shipped INSIDE the image — the docstrings of the installed python
distribution (numpy/scipy/jax/torch/... via ast, ~10^5 sentences of real
English with heavy boilerplate duplication = natural tie structure).
Embeddings are the deterministic per-word hash vectors the test suite
uses (helpers.word_vector) at 300d — the one deviation from the item's
"real fastText vectors", recorded in the artifact.

Checks:
  1. byte-equality of (slice_id, score) across find(), find_batch(int8),
     find_batch(float32) for every query;
  2. recall@10 vs an f64 scalar-oracle ranking over a 4k-slice random
     subsample (the full corpus through the python oracle would take
     hours; the subsample is seeded and committed);
  3. exact-score oracle agreement for every reported top-10 match
     (gotoh_align on the f64 similarity matrix, <=3e-4 abs);
  4. tie-group handling: boundary groups resolved in (score desc, doc,
     slice) order.

Usage: python scripts/parity_nl.py [out.json]
"""

import ast
import hashlib
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def log(msg):
    print(f"[nlp {time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr,
          flush=True)


_SENT_RE = re.compile(r"(?<=[.!?])\s+")
_WORD_RE = re.compile(r"^[A-Za-z][A-Za-z'-]*$")


def harvest_sentences(limit=140_000):
    """English sentences from installed-package docstrings."""
    import sysconfig

    roots = [sysconfig.get_paths()["purelib"]]
    out = []
    seen_files = 0
    for root in roots:
        for dirpath, dirnames, filenames in os.walk(root):
            dirnames[:] = [d for d in dirnames if d not in ("tests", "test")]
            for fn in filenames:
                if not fn.endswith(".py"):
                    continue
                seen_files += 1
                path = os.path.join(dirpath, fn)
                try:
                    with open(path, "r", encoding="utf-8",
                              errors="ignore") as f:
                        tree = ast.parse(f.read())
                except (SyntaxError, ValueError, OSError):
                    continue
                for node in ast.walk(tree):
                    if not isinstance(
                        node,
                        (ast.Module, ast.FunctionDef,
                         ast.AsyncFunctionDef, ast.ClassDef),
                    ):
                        continue
                    doc = ast.get_docstring(node)
                    if not doc:
                        continue
                    for raw in _SENT_RE.split(doc):
                        words = raw.split()
                        if not (4 <= len(words) <= 60):
                            continue
                        toks = [w.strip(".,;:()[]{}\"'`") for w in words]
                        alpha = [t for t in toks if _WORD_RE.match(t)]
                        if len(alpha) < max(4, int(0.7 * len(words))):
                            continue
                        out.append(" ".join(alpha) + ".")
                        if len(out) >= limit:
                            return out
    return out


def main(out_path="PARITY_NL_r05.json"):
    import jax

    if os.environ.get("FORCE_CPU"):
        jax.config.update("jax_platforms", "cpu")
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.expanduser("~/.cache/vectorian_jax"),
    )
    import tempfile

    import vectorian_tpu as vt
    from vectorian_tpu.alignment import LocalAlignment
    from vectorian_tpu.sim.span import OptimizedSpanSim
    from vectorian_tpu.sim.token import EmbeddingTokenSim

    sys.path.insert(
        0,
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "tests",
        ),
    )
    from helpers import word_vector
    from oracle import gotoh_align

    t0 = time.time()
    sents = harvest_sentences()
    log(f"harvested {len(sents)} sentences in {time.time()-t0:.0f}s")
    lens = np.asarray([len(s.split()) for s in sents])
    log(
        f"length dist: p10={np.percentile(lens,10):.0f} "
        f"p50={np.percentile(lens,50):.0f} p90={np.percentile(lens,90):.0f}"
    )

    # vocabulary + 300d deterministic hash vectors
    vocab = sorted({w for s in sents for w in s[:-1].split()})
    log(f"vocab {len(vocab)} words")
    mat = np.stack([word_vector(w, 300) for w in vocab])
    from vectorian_tpu.embedding.static import KeyedVectors

    emb = KeyedVectors("nl-hash-300", vocab, mat.astype(np.float32))

    # documents of 2000 sentences each, imported through NovelImporter
    # (the reference's Gutenberg path) via temp files
    docs = []
    imp = vt.NovelImporter()
    with tempfile.TemporaryDirectory() as td:
        for i in range(0, len(sents), 2000):
            p = os.path.join(td, f"nl{i}.txt")
            with open(p, "w") as f:
                f.write(" ".join(sents[i : i + 2000]))
            docs.append(imp(p, title=f"nl{i}"))
    log(f"imported {len(docs)} docs")
    session = vt.Session(docs, embeddings=[emb])
    index = session.partition("sentence").index(
        OptimizedSpanSim(EmbeddingTokenSim(emb), LocalAlignment())
    )
    packed = index.packed
    n_slices = packed.n_slices
    log(f"packed {n_slices} slices")

    rng = np.random.default_rng(17)
    queries = []
    while len(queries) < 16:
        s = sents[int(rng.integers(len(sents)))][:-1].split()
        if len(s) < 5:
            continue
        k = int(rng.integers(4, min(9, len(s) + 1)))
        j = int(rng.integers(0, len(s) - k + 1))
        queries.append(" ".join(s[j : j + k]))

    index.find_batch(queries, n=10, min_score=0.05)  # warm
    log("warm")

    # 1. cross-path byte equality
    want = [
        [(m.slice_id, m.score) for m in r]
        for r in index.find_batch(queries, n=10, min_score=0.05,
                                  sim_precision="float32")
    ]
    got_i8 = [
        [(m.slice_id, m.score) for m in r]
        for r in index.find_batch(queries, n=10, min_score=0.05)
    ]
    got_find = [
        [(m.slice_id, m.score) for m in index.find(q, n=10, min_score=0.05)]
        for q in queries
    ]
    byte_equal = want == got_i8 == got_find
    log(f"cross-path byte equality: {byte_equal}")

    # oracle machinery (f64, exact-match override + clip, raw/len_t —
    # the reference leaf semantics, tests/test_pr1_config.py)
    vocab_strings = session.vocab.tokens.strings
    vec_cache = {}

    def nvec(w):
        v = vec_cache.get(w)
        if v is None:
            v = word_vector(w, 300)
            v = v / np.linalg.norm(v)
            vec_cache[w] = v
        return v

    def oracle_score(sid, qwords, qn):
        d = int(packed.slice_doc[sid])
        s0 = int(packed.slice_start[sid])
        ln = int(packed.slice_len[sid])
        if ln == 0:
            return 0.0
        ids = session.documents[d].token_ids[s0 : s0 + ln]
        toks = [vocab_strings[i] for i in ids]
        dv = np.stack([nvec(t) for t in toks])
        S = dv @ qn.T
        for j, qw in enumerate(qwords):
            for i, t in enumerate(toks):
                if t == qw:
                    S[i, j] = 1.0
        S = np.clip(S, 0.0, 1.0).astype(np.float32)
        raw, _, _, _ = gotoh_align(S, 0, 0, 0, 0, "local")
        return raw / len(qwords)

    # 2+3: subsample recall@10 + top-10 exact-score agreement
    sub = rng.choice(n_slices, size=min(4000, n_slices), replace=False)
    recall_ok = 0
    score_ok = 0
    n_scored = 0
    tie_groups = 0
    for qi, q in enumerate(queries):
        pq = index.make_query(q, n=10, min_score=0.05).prepare(index._nlp)
        qwords = pq.token_strings
        if not qwords:
            continue
        qn = np.stack([nvec(w) for w in qwords])
        # top-10 exact-score agreement
        for sid, sc in want[qi]:
            n_scored += 1
            if abs(sc - oracle_score(sid, qwords, qn)) <= 3e-4:
                score_ok += 1
        # subsample oracle ranking: engine must rank the subsample the
        # same way (recall of the subsample's own oracle top-10 within
        # the engine's device scores over the subsample)
        o_scores = np.asarray(
            [oracle_score(int(s), qwords, qn) for s in sub]
        )
        from vectorian_tpu.index import _pad_needle
        from vectorian_tpu.ops.simmatrix import compile_plan

        tok_ids_p, strings_p, ctx_q, _ = _pad_needle(
            pq, session, ctx_names=[]
        )
        qp = compile_plan(
            index._args["metric"]["token_sim"],
            session.compiled_embeddings, tok_ids_p, strings_p, ctx_q,
        )
        scores_eng = index._engine.score_all(
            qp, pq.n_tokens, index._affine_gaps(), index._locality,
            float(pq.n_tokens),
        )
        e_scores = np.asarray(scores_eng)[sub]
        o_top = set(np.argsort(-o_scores, kind="stable")[:10].tolist())
        e_top = set(np.argsort(-e_scores, kind="stable")[:10].tolist())
        if len(o_top & e_top) >= 9:
            recall_ok += 1
        # 4. tie handling at the top-10 boundary
        scores10 = [sc for _, sc in want[qi]]
        if len(scores10) == 10 and scores10[-1] in scores10[:-1]:
            tie_groups += 1
            ids10 = [sid for sid, _ in want[qi]]
            keys = [
                (-sc, int(packed.slice_doc[sid]), int(packed.slice_idx[sid]))
                for sid, sc in want[qi]
            ]
            assert keys == sorted(keys), f"tie order broken q{qi}"

    out = {
        "what": (
            "natural-language parity artifact: English sentences harvested "
            "from installed-package docstrings (zero-egress image: no "
            "Gutenberg/fastText downloads; embeddings are deterministic "
            "300d hash vectors — the suite's fastText stand-in), "
            "NovelImporter -> Session -> BruteForceIndex"
        ),
        "n_sentences": len(sents),
        "n_slices": int(n_slices),
        "len_p50": float(np.percentile(lens, 50)),
        "len_p90": float(np.percentile(lens, 90)),
        "n_queries": len(queries),
        "byte_equal_paths": bool(byte_equal),
        "top10_oracle_score_agree": f"{score_ok}/{n_scored}",
        "subsample_recall10_ok": f"{recall_ok}/{len(queries)}",
        "boundary_tie_groups_seen": tie_groups,
        "date": time.strftime("%Y-%m-%d"),
    }
    with open(out_path, "w") as f:
        json.dump(out, f, indent=2)
        f.write("\n")
    log(json.dumps(out))
    os._exit(0)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "PARITY_NL_r05.json")
