"""Batched entropic optimal transport (Sinkhorn) on TPU.

Log-domain batched Sinkhorn for thousands of independent small transport
problems at once — pure elementwise + reduction work that XLA fuses
(the device-side analogue of the reference's exact EMD, pyemd emd_hat,
vectorian/core/cpp/alignment/transport.h:91-145).

STATUS — why this is NOT the production full-WMD/WRD ranking path
(BASELINE config 3 names "batched Sinkhorn"; the shipped design
deliberately replaced it, measured):

* Ranking by Sinkhorn is approximate, so serving needed generous
  overfetch + exact host rescore anyway; its iteration count also had to
  scale with the batch to keep ranking stable (round-3 figure: ~45
  ms/query for full WMD/WRD at Q=64).
* The shipped path ranks with a PROVABLE exact-score upper bound
  (ops/wmd._emd_score_bound — the relaxed transport from the lighter
  marginal side, one fused device pass, no iterations) and exactly
  rescores candidates in descending-bound order with the threaded native
  SSP batch (ops/emd_exact.vn_emd_batch) until every remaining bound is
  below the n-th exact score: provably identical top-k, measured 9.7
  (full WMD) / 19.5 (WRD) ms/query in the same harness.
* The one remaining production use is the OPT-IN Sinkhorn-DUAL consume
  filter (ops/wmd._sinkhorn_dual_score_ub, VECTORIAN_DUAL_FILTER=1):
  LP-dual-feasible potentials give a provable per-candidate score upper
  bound ~14x tighter than the greedy ranking bound — but the per-metric
  on-TPU A/Bs (Q=64, rounds 4 and 5, including WRD's large contested
  band) measured it net-slower than just solving with the threaded
  batch, so it stays off by default.

This module stays as the supported device-side entropic solver (tested
against the exact-EMD oracle in tests/test_wmd.py) for workloads that
want approximate dense transport ON device.

Masses may be unnormalized/unbalanced; problems are normalized internally
and masked rows/columns (zero mass, padding) are handled with -inf log
masses.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

NEG = -1e30


@functools.partial(jax.jit, static_argnames=("n_iters",))
def sinkhorn_log(
    w1: jnp.ndarray,  # [B, n1] supply (>= 0; zero = masked)
    w2: jnp.ndarray,  # [B, n2] demand
    D: jnp.ndarray,  # [B, n1, n2] cost
    eps: jnp.ndarray = 0.02,  # entropic regularization (runtime scalar)
    n_iters: int = 100,
):
    """Returns transport plans G [B, n1, n2] with marginals ~ (w1/s1, w2/s2).

    Log-domain (numerically stable) Sinkhorn; per-problem masses are
    normalized to 1 so `eps` has a consistent scale across the batch.
    """
    f32 = jnp.float32
    w1 = w1.astype(f32)
    w2 = w2.astype(f32)
    D = D.astype(f32)
    eps = jnp.asarray(eps, f32)

    s1 = jnp.maximum(jnp.sum(w1, axis=1, keepdims=True), 1e-20)
    s2 = jnp.maximum(jnp.sum(w2, axis=1, keepdims=True), 1e-20)
    a = w1 / s1
    b = w2 / s2

    log_a = jnp.where(a > 0, jnp.log(jnp.maximum(a, 1e-20)), NEG)
    log_b = jnp.where(b > 0, jnp.log(jnp.maximum(b, 1e-20)), NEG)

    # mask impossible cells so they never receive mass
    valid = (a[:, :, None] > 0) & (b[:, None, :] > 0)
    K = jnp.where(valid, -D / eps, NEG)  # log kernel

    u = jnp.zeros_like(log_a)
    v = jnp.zeros_like(log_b)

    def body(_, uv):
        u, v = uv
        # u_i = log a_i - logsumexp_j (K_ij + v_j)
        u = jnp.where(
            log_a > NEG * 0.5,
            log_a - jax.nn.logsumexp(K + v[:, None, :], axis=2),
            NEG,
        )
        v = jnp.where(
            log_b > NEG * 0.5,
            log_b - jax.nn.logsumexp(K + u[:, :, None], axis=1),
            NEG,
        )
        return u, v

    u, v = jax.lax.fori_loop(0, n_iters, body, (u, v))
    logG = K + u[:, :, None] + v[:, None, :]
    G = jnp.where(valid, jnp.exp(jnp.maximum(logG, -80.0)), 0.0)
    return G


@functools.partial(jax.jit, static_argnames=("n_iters",))
def sinkhorn_emd_score(
    w1: jnp.ndarray,  # [B, n1]
    w2: jnp.ndarray,  # [B, n2]
    D: jnp.ndarray,  # [B, n1, n2]
    eps: jnp.ndarray = 0.02,
    n_iters: int = 100,
):
    """Reference FullSolver score per problem:
    sum((1-D) * G) / sum(G)  (wmd.h:252, wrd.h:123-142)."""
    G = sinkhorn_log(w1, w2, D, eps, n_iters)
    num = jnp.sum((1.0 - D) * G, axis=(1, 2))
    den = jnp.maximum(jnp.sum(G, axis=(1, 2)), 1e-20)
    return num / den
