"""Compiled (Mosaic) Pallas kernel parity on real TPU hardware.

The CPU suite exercises these kernels in interpret mode only
(tests/test_pallas_dp.py), which cannot catch Mosaic lowering or layout
regressions.  These tests compile the actual TPU kernels and compare
against the (oracle-verified) jnp scan paths on the same device.
VERDICT round-1 item 6; wired into .claude/skills/verify/SKILL.md.
"""

import numpy as np
import pytest

import jax

pytestmark = pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="needs real TPU hardware"
)

import jax.numpy as jnp

from vectorian_tpu.ops.alignment import (
    AffineGapParams,
    align_scores,
    align_scores_general,
)


@pytest.mark.parametrize("locality", ["local", "global", "semiglobal"])
def test_pallas_affine_on_tpu(rng, locality):
    from vectorian_tpu.ops.pallas_dp import pallas_align_scores

    B, L, T = 256, 16, 8
    S = rng.uniform(-0.4, 1.0, size=(B, L, T)).astype(np.float32)
    len_s = rng.integers(1, L + 1, size=B).astype(np.int32)
    len_t = np.full(B, T, np.int32)
    gaps = AffineGapParams.of(0.3, 0.1, 0.2, 0.05)
    want = np.asarray(align_scores(S, len_s, len_t, gaps, locality))
    got = np.asarray(
        pallas_align_scores(
            S, jnp.asarray(len_s), jnp.asarray(T, jnp.int32), gaps,
            locality=locality,
        )
    )
    np.testing.assert_allclose(got, want, atol=1e-4, err_msg=locality)


@pytest.mark.parametrize("locality", ["local", "global", "semiglobal"])
def test_pallas_general_on_tpu(rng, locality):
    from vectorian_tpu.ops.pallas_dp import pallas_align_scores_general

    B, L, T = 256, 12, 8
    S = rng.uniform(-0.4, 1.0, size=(B, L, T)).astype(np.float32)
    len_s = rng.integers(1, L + 1, size=B).astype(np.int32)
    len_t = np.full(B, T, np.int32)
    k_s = np.arange(L + 1, dtype=np.float32)
    w_s = (1.0 - np.power(2.0, -k_s / 3.0)).astype(np.float32)
    k_t = np.arange(T + 1, dtype=np.float32)
    w_t = (0.2 * np.sqrt(k_t)).astype(np.float32)
    want = np.asarray(
        align_scores_general(
            S, len_s, len_t, jnp.asarray(w_s), jnp.asarray(w_t), locality
        )
    )
    got = np.asarray(
        pallas_align_scores_general(
            S, jnp.asarray(len_s), jnp.asarray(T, jnp.int32),
            jnp.asarray(w_s), jnp.asarray(w_t), locality,
        )
    )
    np.testing.assert_allclose(got, want, atol=1e-4, err_msg=locality)


@pytest.mark.parametrize("locality", ["local", "semiglobal"])
def test_pallas_multi_nt_on_tpu(rng, locality):
    """The serving-batch NT kernel ([L, c, T, Q] gather-native layout)."""
    from vectorian_tpu.ops.pallas_dp import pallas_align_scores_multi_nt

    c, L, T, Q = 64, 16, 8, 128
    S = rng.uniform(-0.4, 1.0, size=(L, c, T, Q)).astype(np.float32)
    ln = rng.integers(1, L + 1, size=c).astype(np.int32)
    len_t = rng.integers(2, T + 1, size=Q).astype(np.int32)
    gaps = AffineGapParams.of(0.2, 0.1, 0.3, 0.05)
    got = np.asarray(
        pallas_align_scores_multi_nt(
            jnp.asarray(S), jnp.asarray(ln), jnp.asarray(len_t), gaps,
            locality,
        )
    )
    S2 = jnp.transpose(jnp.asarray(S), (1, 3, 0, 2)).reshape(c * Q, L, T)
    want = np.asarray(
        align_scores(
            S2,
            jnp.repeat(jnp.asarray(ln), Q),
            jnp.tile(jnp.asarray(len_t), c),
            gaps,
            locality,
        )
    ).reshape(c, Q)
    np.testing.assert_allclose(got, want, atol=1e-4, err_msg=locality)


def test_pallas_multi_nt_bf16_on_tpu(rng):
    """bf16 similarity blocks accumulate in f32 inside the kernel (the
    production serving-table path)."""
    from vectorian_tpu.ops.pallas_dp import pallas_align_scores_multi_nt

    c, L, T, Q = 64, 16, 8, 128
    S = rng.uniform(0, 1, size=(L, c, T, Q)).astype(np.float32)
    S_bf = jnp.asarray(S).astype(jnp.bfloat16)
    ln = np.full(c, L, np.int32)
    len_t = np.full(Q, T, np.int32)
    gaps = AffineGapParams.of(0.1, 0.05, 0.1, 0.05)
    got = np.asarray(
        pallas_align_scores_multi_nt(
            S_bf, jnp.asarray(ln), jnp.asarray(len_t), gaps, "local"
        )
    )
    S2 = jnp.transpose(
        S_bf.astype(jnp.float32), (1, 3, 0, 2)
    ).reshape(c * Q, L, T)
    want = np.asarray(
        align_scores(
            S2,
            jnp.repeat(jnp.asarray(ln), Q),
            jnp.tile(jnp.asarray(len_t), c),
            gaps,
            "local",
        )
    ).reshape(c, Q)
    np.testing.assert_allclose(got, want, atol=1e-3)
