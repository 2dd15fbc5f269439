"""Headline benchmark: sentence-alignments/sec/chip + end-to-end serving.

North-star target (BASELINE.json): >= 10M sentence-alignments/sec/chip on
TPU v5e.  One "sentence alignment" = one full Smith-Waterman DP of a
(sentence-slice x query) pair including the per-token similarity lookup —
the reference's per-slice unit of work (MatcherImpl::match loop,
vectorian/core/cpp/match/matcher_impl.h:66-176).

Measured configuration: fastText-style 50k x 300d vocabulary similarity
matrix, 8-token queries, <=32-token sentence slices, 131k-slice corpus,
local alignment (BASELINE config 1 scaled up), with the production
multi-query batching (Q=512) that amortizes the per-index vocab gather —
the single-chip throughput-serving configuration (latency-sensitive
serving uses smaller batches; see docs/performance.md).

The PRODUCT measurement (BASELINE.md north star: "alignments/sec/chip +
p50 query latency at recall@10 parity") additionally runs the full public
pipeline — Session build, corpus packing, vocab gather, DP, device top-k,
provable-cut f32 finalizer, Match construction — over a 1M-slice
synthetic Zipf corpus:

  e2e_alignments_per_sec : n_slices * Q / wall(find_batch(Q queries))
  p50_query_ms           : median wall latency of single index.find()

Prints ONE json line: {"metric", "value", "unit", "vs_baseline",
"e2e_alignments_per_sec", "p50_query_ms", "e2e_slices"}.  Set
VECTORIAN_BENCH_E2E=0 to skip the e2e stage (kernel headline only) or to
a smaller sentence count for quick runs.
"""

import json
import os
import sys
import time

import numpy as np


def _alpha_word(i: int) -> str:
    s = ""
    i += 1
    while i:
        s += chr(ord("a") + i % 26)
        i //= 26
    return "w" + s


def _log(msg: str) -> None:
    print(f"[bench {time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)


def bench_e2e(n_sents: int = 1_000_000, Q: int = 32, Q_tp: int = 512):
    """Full Session -> find_batch product measurement on a synthetic Zipf
    corpus; returns a dict of e2e fields.

    Protocol (mirrors the headline's): every measured figure is a MEDIAN
    over repeated warm passes — the tunneled runtime's throughput varies
    ±30% between runs, so single samples fabricate/hide real changes.
    find_batch is chained by construction (it blocks on host-materialized
    Match objects), so wall-clocking each pass is honest.  p50 latency is
    the median of >= 15 warm single-query find() calls.  The throughput
    mode additionally runs the SAME public path at the Q_tp=512/int8
    serving configuration, where the shared vocab gather amortizes across
    the batch (docs/performance.md)."""
    import vectorian_tpu as vt
    from vectorian_tpu.embedding.static import KeyedVectors
    from vectorian_tpu.metrics import EmbeddingTokenSim

    rng = np.random.default_rng(0)
    V_words = 5_000
    words = [_alpha_word(i) for i in range(V_words)]
    emb = KeyedVectors(
        "syn", words, rng.normal(size=(V_words, 300)).astype(np.float32)
    )
    sents_per_doc = 2_000
    n_docs = max(n_sents // sents_per_doc, 1)
    texts = []
    for _ in range(n_docs):
        ids = np.minimum(rng.zipf(1.2, size=(sents_per_doc, 9)), V_words - 1)
        texts.append(
            " ".join(
                " ".join(words[i] for i in row) + "." for row in ids
            )
        )
    _log(f"e2e: corpus text built ({n_sents} sents)")
    docs = [vt.StringImporter()(t, title=f"d{i}") for i, t in enumerate(texts)]
    _log("e2e: imported")
    session = vt.Session(docs, embeddings=[emb])
    _log("e2e: session built")
    index = session.partition("sentence").index(EmbeddingTokenSim(emb))
    n_slices = index.packed.n_slices
    _log(f"e2e: packed {n_slices} slices")

    def zipf_query():
        return " ".join(
            words[int(i)]
            for i in np.minimum(rng.zipf(1.2, size=7), V_words - 1)
        )

    queries = [zipf_query() for _ in range(Q)]
    # warm with the SAME queries: compiles every shape the measured pass
    # will touch (bucket pipeline, top-k, finalizer group sizes) — a warm
    # pass with different queries left fresh finalizer shapes to compile
    # inside the measured wall time
    index.find_batch(queries, n=10, min_score=0.2)
    _log("e2e: find_batch warm")
    for _ in range(3):
        index.find(zipf_query(), n=10, min_score=0.2)
    _log("e2e: find warm")

    # interactive single-query latency FIRST, in a clean window: a settle
    # gap after the CPU-heavy corpus build/import + warm compiles, and
    # nothing else running (CLAUDE.md: host contention inflates host-side
    # phases AND tunnel handling; BENCH_r04's p50 ran right after the
    # corpus build and came out 35% above the clean LATENCY artifact)
    time.sleep(3)
    lats = []
    for _ in range(21):
        q = zipf_query()
        t0 = time.perf_counter()
        index.find(q, n=10, min_score=0.2)
        lats.append(time.perf_counter() - t0)
    p50_ms = float(np.percentile(np.asarray(lats) * 1e3, 50))
    _log(f"e2e: p50 {p50_ms:.0f} ms over {len(lats)} queries")

    # amortized serving throughput: median over 4 warm batch passes, each
    # wall-clocked to the finished Match objects (scores are
    # host-materialized by then, so passes serialize naturally)
    pass_times = []
    for _ in range(4):
        t0 = time.perf_counter()
        res = index.find_batch(queries, n=10, min_score=0.2)
        pass_times.append(time.perf_counter() - t0)
        assert len(res) == Q
    dt_batch = float(np.median(pass_times))
    e2e_rate = n_slices * Q / dt_batch
    _log(
        f"e2e: batch pass median {dt_batch:.2f}s over {len(pass_times)} "
        f"(min {min(pass_times):.2f} max {max(pass_times):.2f})"
    )

    # throughput-mode serving: the same public find_batch path at the
    # Q=512/int8 configuration (the product's throughput envelope); its
    # own try so a compile timeout cannot lose the fields above
    tp_rate = None
    try:
        tp_queries = [zipf_query() for _ in range(Q_tp)]
        index.find_batch(tp_queries, n=10, min_score=0.2)  # warm/compile
        _log("e2e: throughput-mode warm")
        tp_times = []
        for _ in range(3):
            t0 = time.perf_counter()
            res_tp = index.find_batch(tp_queries, n=10, min_score=0.2)
            tp_times.append(time.perf_counter() - t0)
            assert len(res_tp) == Q_tp
        tp_rate = n_slices * Q_tp / float(np.median(tp_times))
        _log(
            f"e2e: throughput mode median {float(np.median(tp_times)):.2f}s"
            f"/pass = {tp_rate/1e6:.1f}M alignments/s"
        )
    except Exception as e:  # noqa: BLE001
        _log(f"e2e: throughput-mode stage failed: {e}")

    # recall@10 parity, co-measured in the SAME run (BASELINE's "p50 at
    # recall@10 parity" clause): the measured pass ranks with the default
    # int8 table — its top-10 must be byte-identical to the exact f32
    # ranking AND to per-query find() (the provable-cut guarantee, on the
    # bench hardware, not just the CPU test suite)
    def keys(rs):
        return [[(m.slice_id, m.score) for m in r] for r in rs]

    try:
        want = keys(res)
        got_f32 = keys(
            index.find_batch(queries, n=10, min_score=0.2,
                             sim_precision="float32")
        )
        parity = got_f32 == want
        for q, w in zip(queries[:4], want[:4]):
            got_one = [
                (m.slice_id, m.score)
                for m in index.find(q, n=10, min_score=0.2)
            ]
            parity = parity and got_one == w
        _log(f"e2e: recall@10 parity {'OK' if parity else 'FAILED'}")
    except Exception as e:  # never lose the measured e2e fields to the
        # parity stage (e.g. the e2e wall alarm firing inside the f32
        # compile) — report parity as unknown instead
        _log(f"e2e: recall@10 parity stage failed: {e}")
        parity = None
    out = {
        "e2e_alignments_per_sec": round(e2e_rate, 1),
        "p50_query_ms": round(p50_ms, 1),
        "e2e_slices": int(n_slices),
    }
    if tp_rate is not None:
        out["e2e_throughput_mode"] = round(tp_rate, 1)
    if parity is not None:
        out["recall10_parity"] = bool(parity)
    return out


def probe_backend(timeout_s: float = 150.0):
    """Check that the jax backend can initialize AT ALL, in a subprocess.

    The tunneled TPU runtime can wedge so hard that ``jax.devices()`` itself
    hangs for minutes or raises "Unable to initialize backend 'axon':
    UNAVAILABLE" (this killed round 2's bench before any JSON printed, see
    BENCH_r02.json).  A subprocess probe with a hard timeout is the only
    safe way to test it: an in-process hang would take the bench down with
    it.  Returns (ok, message).
    """
    import subprocess

    code = (
        "import jax, sys\n"
        "d = jax.devices()\n"
        "sys.stdout.write('OK %d %s' % (len(d), d[0].platform))\n"
    )
    try:
        r = subprocess.run(
            [sys.executable, "-c", code],
            capture_output=True,
            text=True,
            timeout=timeout_s,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
    except subprocess.TimeoutExpired:
        return False, f"probe timed out after {timeout_s:.0f}s (tunnel wedged?)"
    if r.returncode == 0 and r.stdout.startswith("OK"):
        return True, r.stdout.strip()
    tail = (r.stderr or r.stdout or "").strip().splitlines()
    return False, tail[-1] if tail else f"probe rc={r.returncode}"


def wait_for_backend(budget_s: float):
    """Retry the backend probe until it succeeds or the budget runs out.

    CLAUDE.md: a wedged tunnel clears by waiting — nothing host-side fixes
    it.  So we poll with a bounded per-probe timeout and sleep between
    attempts.  Returns (ok, last_message, waited_s).
    """
    t0 = time.time()
    attempt = 0
    last = ""
    while True:
        attempt += 1
        remaining = budget_s - (time.time() - t0)
        if remaining <= 0:
            return False, last, time.time() - t0
        ok, last = probe_backend(timeout_s=min(150.0, max(remaining, 30.0)))
        if ok:
            return True, last, time.time() - t0
        _log(f"backend probe #{attempt} failed: {last}")
        remaining = budget_s - (time.time() - t0)
        if remaining <= 0:
            return False, last, time.time() - t0
        time.sleep(min(60.0, max(remaining, 1.0)))


def main():
    import jax

    # persistent compilation cache: remote compiles through the tunnel cost
    # minutes; cached executables collapse repeat runs (incl. the driver's)
    cache_dir = os.environ.get(
        "VECTORIAN_JAX_CACHE", os.path.expanduser("~/.cache/vectorian_jax")
    )
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        pass

    t_start = time.time()
    import jax.numpy as jnp

    from vectorian_tpu.ops.alignment import AffineGapParams
    from vectorian_tpu.ops.search import (
        _bucket_scores_multiquery,
        use_pallas_default,
    )

    V, T, L = 50_000, 8, 32
    N = 1 << 17  # 131072 slices
    Q = 512  # batched queries per pass (throughput serving batch)
    # interleaved chunk A/B (r4): 256-512 plateau at ~187M/s vs 175M at
    # 1024 — smaller map bodies keep the gather+DP pipeline fuller
    CHUNK = 512

    rng = np.random.default_rng(0)
    # uniform-random token draw: the locality worst case (real corpora are
    # Zipf-distributed and gather faster under the frequency-ordered ids
    # the Session assigns)
    tokens = jnp.asarray(rng.integers(1, V, size=(N, L), dtype=np.int32))
    lengths = jnp.asarray(rng.integers(L // 2, L + 1, size=N).astype(np.int32))
    # [V, T, Q]: (T, Q)-minor so the gather output is kernel-native.
    # int8 is the production serving-table dtype (index.find_batch default):
    # it quarters the pass's HBM traffic; max-plus homogeneity runs the
    # quantized units through the unchanged f32 DP (gaps scaled in, raw
    # scores scaled out) and the final top-k is exactly rescored in f32
    # with a provable cut bound (BruteForceIndex._finalize_quantized), so
    # results equal the f32 path.
    sim_f32 = rng.uniform(0, 1, size=(V, T, Q)).astype(np.float32)
    sim_scale = float(np.abs(sim_f32).max()) / 127.0
    sim_multi = jnp.asarray(np.round(sim_f32 / sim_scale).astype(np.int8))
    sim_scale = jnp.asarray(sim_scale, jnp.float32)
    len_t = jnp.full((Q,), T, jnp.int32)
    norm_total = jnp.full((Q,), float(T), jnp.float32)
    gaps = AffineGapParams.of(0.0, 0.0, 0.0, 0.0)

    use_pallas = use_pallas_default()

    # Chained timing with a forced host read: on some TPU runtimes
    # block_until_ready does not actually synchronize, so each iteration's
    # input depends on the previous output (serializing execution) and the
    # clock stops only after a scalar of the final result reaches the host.
    sim0 = sim_multi

    import jax.numpy as _jnp

    pos_ids = _jnp.zeros((N, L), _jnp.int8)
    tag_ids = _jnp.zeros((N, L), _jnp.int16)
    boost = _jnp.ones((N,), _jnp.float32)
    tw_w = _jnp.ones((T, Q), _jnp.float32)
    tw_p = _jnp.full((T, Q), -1, _jnp.int8)
    pen = _jnp.zeros((Q,), _jnp.float32)
    thr = _jnp.full((Q,), -1.0, _jnp.float32)
    flt = (_jnp.zeros((1,), bool),) * 3
    gv_s = _jnp.zeros((L + 1,), _jnp.float32)
    gv_t = _jnp.zeros((T + 1,), _jnp.float32)

    def run_with(sim):
        return _bucket_scores_multiquery(
            tokens, pos_ids, tag_ids, lengths, sim, len_t, gaps, norm_total,
            boost, tw_w, tw_p, pen, thr, *flt, gv_s, gv_t,
            locality="local", chunk=CHUNK, n_queries=Q,
            use_pallas=use_pallas, sim_scale=sim_scale,
        )

    _log("headline: compiling")
    out = run_with(sim0)
    _ = float(out[0, 0])  # compile + warm
    _log("headline: compiled")
    # one extra warm pass absorbs first-dispatch effects before the clock
    # (the chain term is cast back so the table dtype never promotes)
    out = run_with(sim0 + (out[0, 0] * 0).astype(sim0.dtype))
    _ = float(out[0, 0])
    # tunnel throughput varies ±30% between time windows: measure three
    # independent chained runs (each amortizes dispatch overhead over 6
    # iterations) and report the MEDIAN chain rate
    n_iters = 6
    times = []
    for _chain in range(3):
        t0 = time.perf_counter()
        sim = sim0
        for _ in range(n_iters):
            out = run_with(sim)
            # chain: serialize iterations
            sim = sim0 + (out[0, 0] * 1e-12).astype(sim0.dtype)
        _ = float(out[0, 0])  # force completion
        times.append((time.perf_counter() - t0) / n_iters)
    dt = float(np.median(times))
    _log(f"headline: measured {dt:.3f}s/pass")

    alignments_per_sec = N * Q / dt
    baseline = 10_000_000.0  # north-star target, BASELINE.md

    out = {
        "metric": "sentence-alignments/sec/chip",
        "value": round(alignments_per_sec, 1),
        "unit": "alignments/s",
        "vs_baseline": round(alignments_per_sec / baseline, 4),
    }

    # loss-proof headline: print it BEFORE the e2e stage (a driver kill
    # inside one blocking remote compile would otherwise lose everything);
    # the final enriched line reprints the same keys plus the e2e fields,
    # so tail-parsing drivers pick up the richest line available
    print(json.dumps(out), flush=True)
    global _HEADLINE_PRINTED
    _HEADLINE_PRINTED = True

    e2e_env = os.environ.get("VECTORIAN_BENCH_E2E", "")
    n_e2e = 1_000_000 if e2e_env == "" else int(e2e_env or 0)
    # time budget: remote compiles can eat minutes; the driver must always
    # get the headline JSON line, so the e2e stage only starts when enough
    # budget remains (uncached worst case needs ~15 min of compiles)
    budget = float(os.environ.get("VECTORIAN_BENCH_BUDGET", "3000"))
    elapsed = time.time() - t_start
    if n_e2e and elapsed > budget * 0.45:
        out["e2e_error"] = (
            f"skipped: headline took {elapsed:.0f}s of the {budget:.0f}s "
            "budget (uncached remote compiles); rerun with a warm "
            "compilation cache"
        )
        n_e2e = 0
    if n_e2e:
        # smaller chunks compile ~3x faster on the tunneled remote-compile
        # runtime; per-pass dispatch overhead is amortized by Q anyway
        os.environ.setdefault("VECTORIAN_CHUNK", "512")
        # hard internal wall for the e2e stage: cold remote compiles can
        # exceed the driver's timeout, and a killed process loses the
        # HEADLINE json too — the alarm aborts e2e (raising between python
        # steps) so the headline always prints
        import signal

        def _alarm(_sig, _frm):
            raise TimeoutError("e2e stage exceeded its wall budget")

        try:
            signal.signal(signal.SIGALRM, _alarm)
            signal.alarm(int(max(budget - (time.time() - t_start) - 90, 60)))
        except (ValueError, OSError, AttributeError):
            pass  # non-main thread / platform without SIGALRM
        try:
            out.update(bench_e2e(n_e2e))
        except Exception as e:  # the headline must still report
            out["e2e_error"] = f"{type(e).__name__}: {e}"
        finally:
            try:
                signal.alarm(0)
            except (ValueError, OSError, AttributeError):
                pass

    print(json.dumps(out))


_HEADLINE_PRINTED = False


def _error_json(msg: str) -> None:
    """The driver tail-parses stdout for ONE json line; emit a diagnosable
    line (value 0, explicit error field) instead of dying with a stack."""
    if _HEADLINE_PRINTED:
        # a good headline already reached stdout — do not downgrade the
        # tail-parsed line to an error; log the failure to stderr instead
        _log(f"post-headline failure (headline stands): {msg}")
        return
    print(
        json.dumps(
            {
                "metric": "sentence-alignments/sec/chip",
                "value": 0.0,
                "unit": "alignments/s",
                "vs_baseline": 0.0,
                "error": msg,
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    # gate: never touch the device in-process until a subprocess probe says
    # the backend initializes — and wait out a wedged tunnel (bounded)
    probe_budget = float(os.environ.get("VECTORIAN_BENCH_PROBE_BUDGET", "1500"))
    ok, msg, waited = wait_for_backend(probe_budget)
    if not ok:
        _error_json(
            f"backend unavailable after {waited:.0f}s of probing: {msg}"
        )
        sys.exit(0)
    if waited > 10:
        _log(f"backend came up after {waited:.0f}s ({msg})")
    try:
        main()
    except Exception as e:  # noqa: BLE001 — the JSON line must still print
        import traceback

        traceback.print_exc()
        _error_json(f"{type(e).__name__}: {e}")
        sys.exit(0)
