"""Token-similarity modifiers combining several embeddings.

Reference: vectorian/sim/modifier.py — invoked there from C++
(ModifiedSimilarityMatrixFactory, metric/modifier.cpp:18-74) on numpy dicts;
here each modifier is a pure function over operand dicts of jnp arrays
({"similarity", "magnitudes_s", "magnitudes_t"}), fused by XLA.
"""

from __future__ import annotations

from typing import List

import jax.numpy as jnp

from vectorian_tpu.sim.kernel import Kernel, UnaryOperator
from vectorian_tpu.sim.token import TokenSim


class TokenSimilarityModifier(TokenSim):
    @property
    def is_modifier(self):
        return True

    @property
    def operands(self):
        raise NotImplementedError()

    def combine(self, operands: List[dict]) -> dict:
        """operands: list of dicts with 'similarity' [S, T] and optionally
        'magnitudes_s' [S] / 'magnitudes_t' [T]; returns combined dict."""
        raise NotImplementedError()


class UnaryTokenSimilarityModifier(TokenSimilarityModifier):
    def __init__(self, operand, operators: List[UnaryOperator]):
        self._operand = operand
        self._kernel = Kernel(operators)

    @property
    def operands(self):
        return [self._operand]

    def combine(self, operands):
        out = dict(operands[0])
        out["similarity"] = self._kernel(out["similarity"])
        return out

    @property
    def embeddings(self):
        return self._operand.embeddings

    @property
    def name(self):
        return self._kernel.name(self._operand.name)


class MixedTokenSimilarity(TokenSimilarityModifier):
    """Weighted average across embeddings (reference modifier.py:50-76)."""

    def __init__(self, metrics, weights):
        self._metrics = list(metrics)
        self._weights = [float(w) for w in weights]

    @property
    def operands(self):
        return self._metrics

    def combine(self, operands):
        w = jnp.asarray(self._weights, jnp.float32)
        w = w / jnp.sum(w)
        out = {}
        for k in operands[0].keys():
            stack = jnp.stack([o[k] for o in operands], axis=0)
            wb = w.reshape((-1,) + (1,) * (stack.ndim - 1))
            out[k] = jnp.sum(stack * wb, axis=0)
        return out

    @property
    def embeddings(self):
        return [e for m in self._metrics for e in m.embeddings]

    @property
    def name(self):
        total = sum(self._weights)
        terms = [f"{w / total} * {m.name}" for m, w in zip(self._metrics, self._weights)]
        return f'({" + ".join(terms)})'


class ExtremumTokenSimilarity(TokenSimilarityModifier):
    """Pick per-cell max (or min) similarity across embeddings; magnitudes
    are re-weighted by per-row selection counts (reference modifier.py:79-107)."""

    _sign = 1.0
    _name_ = "extremum"

    def __init__(self, metrics):
        self._metrics = list(metrics)

    @property
    def operands(self):
        return self._metrics

    def combine(self, operands):
        sims = jnp.stack([o["similarity"] for o in operands], axis=0)  # [K, S, T]
        sel = jnp.argmax(self._sign * sims, axis=0)  # [S, T]
        out = {"similarity": jnp.take_along_axis(sims, sel[None], axis=0)[0]}
        K = sims.shape[0]
        if "magnitudes_s" in operands[0]:
            # per-s-row histogram of which embedding won, used as weights
            counts = jnp.stack(
                [jnp.sum(sel == k, axis=1) for k in range(K)], axis=0
            ).astype(jnp.float32)  # [K, S]
            mags = jnp.stack([o["magnitudes_s"] for o in operands], axis=0)
            denom = jnp.maximum(jnp.sum(counts, axis=0), 1.0)
            out["magnitudes_s"] = jnp.sum(mags * counts, axis=0) / denom
        if "magnitudes_t" in operands[0]:
            counts = jnp.stack(
                [jnp.sum(sel == k, axis=0) for k in range(K)], axis=0
            ).astype(jnp.float32)  # [K, T]
            mags = jnp.stack([o["magnitudes_t"] for o in operands], axis=0)
            denom = jnp.maximum(jnp.sum(counts, axis=0), 1.0)
            out["magnitudes_t"] = jnp.sum(mags * counts, axis=0) / denom
        return out

    @property
    def embeddings(self):
        return [e for m in self._metrics for e in m.embeddings]

    @property
    def name(self):
        return f'{self._name_}({", ".join(x.name for x in self._metrics)})'


class MaximumTokenSimilarity(ExtremumTokenSimilarity):
    _sign = 1.0
    _name_ = "maximum"


class MinimumTokenSimilarity(ExtremumTokenSimilarity):
    _sign = -1.0
    _name_ = "minimum"
