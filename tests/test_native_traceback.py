"""Differential fuzzing: native batched DP traceback vs the python
reference (ops/alignment.traceback / traceback_general).

The native port must be bit-exact under numpy 2 promotion rules (f32 cell
arithmetic, f64-computed gap constants cast to f32, eps compared in f32) —
any drift changes flow mappings and therefore rendered regions."""

import numpy as np
import pytest

from vectorian_tpu import native
from vectorian_tpu.ops.alignment import (
    AffineGapParams,
    align_matrices,
    align_matrices_general,
    gap_cost_closure,
    traceback,
    traceback_general,
)

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable"
)


def _random_problem(rng, B, Ls, Lt):
    # quantized similarities make near-eps coincidences (ties between
    # diagonal and gap predecessors) common — the hard traceback cases
    S = (rng.integers(0, 20, size=(B, Ls, Lt)) / 20.0).astype(np.float32)
    len_s = rng.integers(1, Ls + 1, size=B).astype(np.int32)
    len_t = rng.integers(1, Lt + 1, size=B).astype(np.int32)
    return S, len_s, len_t


@pytest.mark.parametrize("locality", ["local", "global", "semiglobal"])
@pytest.mark.parametrize("trial", range(4))
def test_affine_traceback_parity(locality, trial):
    rng = np.random.default_rng(100 * trial + hash(locality) % 97)
    B, Ls, Lt = 48, 11, 7
    S, len_s, len_t = _random_problem(rng, B, Ls, Lt)
    gaps = AffineGapParams.of(
        float(rng.uniform(0, 0.5)),
        float(rng.uniform(0, 0.3)),
        float(rng.uniform(0, 0.5)),
        float(rng.uniform(0, 0.3)),
    )
    H, _, _ = align_matrices(S, gaps, locality)
    H = np.asarray(H)
    nat = native.traceback_affine_batch(H, S, len_s, len_t, gaps, locality)
    assert nat is not None
    for b in range(B):
        want = traceback(
            H[b], S[b], int(len_s[b]), int(len_t[b]), gaps, locality
        )
        np.testing.assert_array_equal(
            nat[b, : int(len_t[b])], want, err_msg=f"b={b} {locality}"
        )


@pytest.mark.parametrize("locality", ["local", "global", "semiglobal"])
def test_general_traceback_parity(locality):
    rng = np.random.default_rng(7 + hash(locality) % 11)
    B, Ls, Lt = 32, 9, 6
    S, len_s, len_t = _random_problem(rng, B, Ls, Lt)
    w_s = np.cumsum(rng.uniform(0.0, 0.4, size=Ls + 1)).astype(np.float32)
    w_t = np.cumsum(rng.uniform(0.0, 0.4, size=Lt + 1)).astype(np.float32)
    w_s[0] = w_t[0] = 0.0
    import jax.numpy as jnp

    H = np.asarray(
        align_matrices_general(S, jnp.asarray(w_s), jnp.asarray(w_t), locality)
    )
    nat = native.traceback_general_batch(
        H, S, len_s, len_t, w_s, w_t, locality
    )
    assert nat is not None
    for b in range(B):
        want = traceback_general(
            H[b], S[b], int(len_s[b]), int(len_t[b]), w_s, w_t, locality
        )
        np.testing.assert_array_equal(
            nat[b, : int(len_t[b])], want, err_msg=f"b={b} {locality}"
        )


def test_affine_traceback_end_cells():
    rng = np.random.default_rng(5)
    B, Ls, Lt = 16, 8, 5
    S, len_s, len_t = _random_problem(rng, B, Ls, Lt)
    gaps = AffineGapParams.of(0.2, 0.1, 0.2, 0.1)
    H, _, _ = align_matrices(S, gaps, "local")
    H = np.asarray(H)
    ends = np.stack([len_s, len_t], axis=1).astype(np.int32)
    nat = native.traceback_affine_batch(
        H, S, len_s, len_t, gaps, "local", end_cells=ends
    )
    for b in range(B):
        want = traceback(
            H[b], S[b], int(len_s[b]), int(len_t[b]), gaps, "local",
            end_cell=(int(len_s[b]), int(len_t[b])),
        )
        np.testing.assert_array_equal(nat[b, : int(len_t[b])], want)
