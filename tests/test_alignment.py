import numpy as np
import pytest

from vectorian_tpu.ops.alignment import (
    AffineGapParams,
    align_matrices,
    align_scores,
    traceback,
)
from .oracle import gotoh_align

GAP_SETS = [
    (0.0, 0.0, 0.0, 0.0),  # reference default: ConstantGapCost(0)
    (0.5, 0.0, 0.5, 0.0),  # constant gap cost 0.5
    (0.2, 0.2, 0.2, 0.2),  # linear
    (0.8, 0.1, 0.6, 0.05),  # affine, open > extend
    (0.1, 0.4, 0.1, 0.3),  # open < extend (re-opening optimal)
    (0.3, 0.1, 0.9, 0.2),  # asymmetric s/t
]


def _random_problems(rng, n, max_ls, max_lt):
    B = n
    S = rng.uniform(-0.4, 1.0, size=(B, max_ls, max_lt)).astype(np.float32)
    len_s = rng.integers(1, max_ls + 1, size=B).astype(np.int32)
    len_t = rng.integers(1, max_lt + 1, size=B).astype(np.int32)
    return S, len_s, len_t


@pytest.mark.parametrize("locality", ["local", "global", "semiglobal"])
@pytest.mark.parametrize("gapset", GAP_SETS)
def test_align_scores_vs_oracle(rng, locality, gapset):
    os_, es, ot, et = gapset
    S, len_s, len_t = _random_problems(rng, 24, 13, 7)
    gaps = AffineGapParams.of(os_, es, ot, et)
    got = np.asarray(align_scores(S, len_s, len_t, gaps, locality))
    for b in range(S.shape[0]):
        Sb = S[b, : len_s[b], : len_t[b]]
        want, _, _, _ = gotoh_align(Sb, os_, es, ot, et, locality)
        assert got[b] == pytest.approx(want, abs=1e-4), (b, len_s[b], len_t[b])


@pytest.mark.parametrize("locality", ["local", "global", "semiglobal"])
def test_align_matrices_vs_oracle(rng, locality):
    os_, es, ot, et = 0.6, 0.15, 0.3, 0.1
    S = rng.uniform(-0.5, 1.0, size=(4, 9, 5)).astype(np.float32)
    gaps = AffineGapParams.of(os_, es, ot, et)
    H, E, F = (np.asarray(x) for x in align_matrices(S, gaps, locality))
    for b in range(S.shape[0]):
        _, Ho, _, _ = gotoh_align(S[b], os_, es, ot, et, locality)
        np.testing.assert_allclose(H[b], np.asarray(Ho, np.float32), atol=1e-4)


def test_padding_invariance(rng):
    """Padded cells must never change the score of the valid region."""
    os_, es, ot, et = 0.4, 0.1, 0.4, 0.1
    gaps = AffineGapParams.of(os_, es, ot, et)
    for locality in ["local", "global", "semiglobal"]:
        S_small = rng.uniform(-0.5, 1.0, size=(6, 5, 4)).astype(np.float32)
        len_s = np.full(6, 5, np.int32)
        len_t = np.full(6, 4, np.int32)
        a = np.asarray(align_scores(S_small, len_s, len_t, gaps, locality))
        # embed into a larger padded buffer with hostile pad values
        S_big = np.full((6, 11, 9), 7.7, np.float32)
        S_big[:, :5, :4] = S_small
        b = np.asarray(align_scores(S_big, len_s, len_t, gaps, locality))
        np.testing.assert_allclose(a, b, atol=1e-5, err_msg=locality)


def test_local_score_nonnegative(rng):
    S = rng.uniform(-2.0, -0.1, size=(8, 6, 4)).astype(np.float32)
    gaps = AffineGapParams.of(1.0, 1.0, 1.0, 1.0)
    got = np.asarray(
        align_scores(S, np.full(8, 6, np.int32), np.full(8, 4, np.int32), gaps, "local")
    )
    assert (got == 0.0).all()


def test_identity_alignment():
    """A perfect diagonal should score len_t with zero gaps."""
    lt = 5
    S = np.full((1, 8, lt), 0.0, np.float32)
    for j in range(lt):
        S[0, j + 2, j] = 1.0  # query appears at offset 2
    gaps = AffineGapParams.of(0.0, 0.0, 0.0, 0.0)
    got = np.asarray(
        align_scores(S, np.array([8], np.int32), np.array([lt], np.int32), gaps, "local")
    )
    assert got[0] == pytest.approx(lt)


@pytest.mark.parametrize("locality", ["local", "global", "semiglobal"])
def test_traceback_recovers_score(rng, locality):
    """Sum of sims along the traceback path minus gap costs == raw score."""
    os_, es, ot, et = 0.5, 0.2, 0.4, 0.15
    gaps = AffineGapParams.of(os_, es, ot, et)
    S = rng.uniform(-0.3, 1.0, size=(6, 10, 5)).astype(np.float32)
    len_s = np.full(6, 10, np.int32)
    len_t = np.full(6, 5, np.int32)
    scores, pos = align_scores(S, len_s, len_t, gaps, locality, with_position=True)
    scores = np.asarray(scores)
    H, E, F = (np.asarray(x) for x in align_matrices(S, gaps, locality))
    for b in range(6):
        mapping = traceback(
            H[b], S[b], 10, 5, gaps, locality, end_cell=np.asarray(pos)[b]
        )
        matched = mapping >= 0
        assert matched.any() or scores[b] <= 1e-6
        # every matched edge must be a real cell
        for j, i in enumerate(mapping):
            if i >= 0:
                assert 0 <= i < 10
        # mapping must be strictly increasing over matched targets (injective,
        # order-preserving)
        tgts = mapping[matched]
        assert (np.diff(tgts) > 0).all()


def test_gap_params_are_runtime_not_static():
    """Changing gap costs must not retrigger compilation (interactivity)."""
    import jax

    S = np.ones((4, 6, 3), np.float32)
    ls = np.full(4, 6, np.int32)
    lt = np.full(4, 3, np.int32)
    with jax.log_compiles(False):
        n0 = align_scores._cache_size()
        align_scores(S, ls, lt, AffineGapParams.of(0.1, 0.1, 0.1, 0.1), "local")
        n1 = align_scores._cache_size()
        align_scores(S, ls, lt, AffineGapParams.of(0.9, 0.5, 0.3, 0.2), "local")
        n2 = align_scores._cache_size()
    assert n1 == n0 + 1
    assert n2 == n1  # cache hit — no recompile
