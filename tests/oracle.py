"""Trusted scalar numpy oracles used to validate the TPU kernels.

Implements textbook Gotoh affine-gap alignment one cell at a time —
deliberately naive, independent of the batched jax implementation.
"""

import numpy as np

NEG = -1e30


def gotoh_align(S, open_s, extend_s, open_t, extend_t, locality):
    """Return (score, H, E, F) for a single [ls, lt] similarity matrix.

    Gap of length k costs open + (k-1) * extend on its side.  Re-opening a
    gap mid-run is permitted (true Gotoh), which matters when open < extend.
    """
    ls, lt = S.shape
    H = np.full((ls + 1, lt + 1), NEG)
    E = np.full((ls + 1, lt + 1), NEG)
    F = np.full((ls + 1, lt + 1), NEG)

    H[0, 0] = 0.0
    for j in range(1, lt + 1):
        H[0, j] = -(open_t + (j - 1) * extend_t) if locality == "global" else 0.0
    for i in range(1, ls + 1):
        H[i, 0] = -(open_s + (i - 1) * extend_s) if locality == "global" else 0.0

    for i in range(1, ls + 1):
        for j in range(1, lt + 1):
            E[i, j] = max(H[i, j - 1] - open_t, E[i, j - 1] - extend_t)
            F[i, j] = max(H[i - 1, j] - open_s, F[i - 1, j] - extend_s)
            h = max(H[i - 1, j - 1] + S[i - 1, j - 1], E[i, j], F[i, j])
            if locality == "local":
                h = max(h, 0.0)
            H[i, j] = h

    if locality == "local":
        score = max(0.0, H[1:, 1:].max()) if ls > 0 and lt > 0 else 0.0
    elif locality == "global":
        score = H[ls, lt]
    else:  # semiglobal
        score = max(H[ls, :].max(), H[:, lt].max())
    return score, H, E, F


def wsb_align(S, w_s, w_t, locality):
    """Waterman-Smith-Beyer with arbitrary gap-cost vectors w[k] (scalar
    oracle for the general-gap DP)."""
    ls, lt = S.shape
    H = np.full((ls + 1, lt + 1), NEG)
    H[0, 0] = 0.0
    for j in range(1, lt + 1):
        H[0, j] = -w_t[j] if locality == "global" else 0.0
    for i in range(1, ls + 1):
        H[i, 0] = -w_s[i] if locality == "global" else 0.0
    for i in range(1, ls + 1):
        for j in range(1, lt + 1):
            h = H[i - 1, j - 1] + S[i - 1, j - 1]
            for g in range(1, i + 1):
                h = max(h, H[i - g, j] - w_s[g])
            for g in range(1, j + 1):
                h = max(h, H[i, j - g] - w_t[g])
            if locality == "local":
                h = max(h, 0.0)
            H[i, j] = h
    if locality == "local":
        score = max(0.0, H[1:, 1:].max())
    elif locality == "global":
        score = H[ls, lt]
    else:
        score = max(H[ls, :].max(), H[:, lt].max())
    return score, H


def brute_force_search(
    slices, query_sim, open_s, extend_s, open_t, extend_t, locality, submatch_weight=0.0
):
    """Score every slice; returns scores list.  ``slices`` is a list of
    [len_s, len_t] similarity matrices (already token-filtered/weighted);
    score normalization follows reference_score with submatch_weight=0:
    score = raw / len_t.
    """
    out = []
    for S in slices:
        raw, _, _, _ = gotoh_align(S, open_s, extend_s, open_t, extend_t, locality)
        lt = S.shape[1]
        out.append(raw / lt if lt else 0.0)
    return out
