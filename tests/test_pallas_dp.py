"""Pallas DP kernel parity tests (interpret mode on CPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from vectorian_tpu.ops.alignment import (
    AffineGapParams,
    align_scores,
    align_scores_general,
)
from vectorian_tpu.ops.pallas_dp import (
    pallas_align_scores,
    pallas_align_scores_general,
    pallas_align_scores_multi_nt,
)


@pytest.mark.parametrize("locality", ["local", "global", "semiglobal"])
@pytest.mark.parametrize(
    "gapset",
    [(0.0, 0.0, 0.0, 0.0), (0.5, 0.1, 0.3, 0.2), (0.1, 0.4, 0.2, 0.6)],
)
def test_pallas_matches_jnp(rng, locality, gapset):
    B, L, T = 12, 10, 5
    S = rng.uniform(-0.4, 1.0, size=(B, L, T)).astype(np.float32)
    len_s = rng.integers(1, L + 1, size=B).astype(np.int32)
    lt = 4
    len_t = np.full(B, lt, np.int32)
    gaps = AffineGapParams.of(*gapset)
    want = np.asarray(align_scores(S[:, :, :lt], len_s, len_t, gaps, locality))
    got = np.asarray(
        pallas_align_scores(
            S[:, :, :lt],
            jnp.asarray(len_s),
            jnp.asarray(lt, jnp.int32),
            gaps,
            locality=locality,
            block_b=128,
            interpret=True,
        )
    )
    np.testing.assert_allclose(got, want, atol=1e-4)


@pytest.mark.parametrize("locality", ["local", "global", "semiglobal"])
@pytest.mark.parametrize("kind", ["exp", "rand"])
def test_pallas_general_matches_jnp(rng, locality, kind):
    """WSB kernel vs the (oracle-verified) jnp general-gap path."""
    from tests.test_general_gaps import _gap_vecs

    B, L, T = 16, 9, 5
    S = rng.uniform(-0.4, 1.0, size=(B, L, T)).astype(np.float32)
    len_s = rng.integers(1, L + 1, size=B).astype(np.int32)
    lt = 4
    len_t = np.full(B, lt, np.int32)
    w_s = _gap_vecs(rng, L + 1, kind)
    w_t = _gap_vecs(rng, lt + 1, kind)
    want = np.asarray(
        align_scores_general(
            S[:, :, :lt], len_s, len_t, jnp.asarray(w_s), jnp.asarray(w_t),
            locality,
        )
    )
    got = np.asarray(
        pallas_align_scores_general(
            S[:, :, :lt],
            jnp.asarray(len_s),
            jnp.asarray(lt, jnp.int32),
            jnp.asarray(w_s),
            jnp.asarray(w_t),
            locality=locality,
            block_b=128,
            interpret=True,
        )
    )
    np.testing.assert_allclose(got, want, atol=1e-4)


@pytest.mark.parametrize("locality", ["local", "global", "semiglobal"])
def test_pallas_multi_nt_matches_jnp(rng, locality):
    """No-transpose multi-query kernel ([L, c, T, Q] gather-native layout)
    vs the jnp scorer, with per-query lengths and c not a block multiple."""
    L, c, T, Q = 11, 20, 8, 128
    S4 = rng.uniform(-0.4, 1.0, size=(L, c, T, Q)).astype(np.float32)
    len_s = rng.integers(1, L + 1, size=c).astype(np.int32)
    len_t = rng.integers(1, T + 1, size=Q).astype(np.int32)
    gaps = AffineGapParams.of(0.3, 0.1, 0.2, 0.15)
    got = np.asarray(
        pallas_align_scores_multi_nt(
            jnp.asarray(S4), jnp.asarray(len_s), jnp.asarray(len_t), gaps,
            locality=locality, interpret=True,
        )
    )
    Sb = np.transpose(S4, (1, 3, 0, 2)).reshape(c * Q, L, T)
    want = np.asarray(
        align_scores(
            jnp.asarray(Sb), jnp.asarray(np.repeat(len_s, Q)),
            jnp.asarray(np.tile(len_t, c)), gaps, locality,
        )
    ).reshape(c, Q)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_pallas_block_padding(rng):
    """B not a multiple of the block size."""
    B, L, T = 300, 6, 3
    S = rng.uniform(0, 1, size=(B, L, T)).astype(np.float32)
    len_s = np.full(B, L, np.int32)
    gaps = AffineGapParams.of(0.2, 0.1, 0.2, 0.1)
    want = np.asarray(
        align_scores(S, len_s, np.full(B, T, np.int32), gaps, "local")
    )
    got = np.asarray(
        pallas_align_scores(
            S, jnp.asarray(len_s), jnp.asarray(T, jnp.int32), gaps,
            locality="local", block_b=128, interpret=True,
        )
    )
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_multi_nt_vmem_fallback_matches_jnp():
    """A block too large for VMEM even at CB=1 must fall back to the jnp
    scorer instead of handing Mosaic an over-budget allocation."""
    import numpy as np

    from vectorian_tpu.ops.alignment import AffineGapParams, align_scores
    from vectorian_tpu.ops.pallas_dp import pallas_align_scores_multi_nt

    # L * Tp * Q * 4 bytes * 2 > 8MB with CB=1 and Q <= 128 (no further
    # query split) -> jnp fallback path
    L, c, Tp, Q = 1024, 2, 16, 128
    rng = np.random.default_rng(0)
    S = jnp.asarray(rng.uniform(0, 1, size=(L, c, Tp, Q)).astype(np.float32))
    ln = jnp.full((c,), L, jnp.int32)
    lt = jnp.full((Q,), Tp, jnp.int32)
    gaps = AffineGapParams.of(0.2, 0.1, 0.2, 0.1)
    got = np.asarray(pallas_align_scores_multi_nt(S, ln, lt, gaps, "local"))
    S2 = jnp.transpose(S, (1, 3, 0, 2)).reshape(c * Q, L, Tp)
    want = np.asarray(
        align_scores(S2, jnp.repeat(ln, Q), jnp.tile(lt, c), gaps, "local")
    ).reshape(c, Q)
    np.testing.assert_allclose(got, want, atol=1e-5)
