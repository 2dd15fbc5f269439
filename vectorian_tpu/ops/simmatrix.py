"""Query similarity-matrix compiler.

Builds the (vocab x needle) similarity matrix — the TPU replacement for the
reference's StaticEmbeddingSimilarityMatrixFactory
(vectorian/core/cpp/metric/static.cpp:9-78): one batched metric evaluation
(a single MXU GEMM for cosine) instead of a C++->python callback per block,
with the exact-token-match override (static.cpp:58-67) and [0,1] clip
(static.cpp:75, metric/metric.h:28-30) applied as fused epilogues.

Modifier trees (mixed / extremum / unary chains over several embeddings —
reference metric/modifier.cpp) evaluate operand matrices and combine them
with pure jnp ops.
"""

from __future__ import annotations

from typing import Dict, Sequence

import jax.numpy as jnp
import numpy as np

from vectorian_tpu.embedding.vectors import Vectors
from vectorian_tpu.sim.modifier import TokenSimilarityModifier
from vectorian_tpu.sim.token import EmbeddingTokenSim


class CompiledEmbedding:
    """A session-compiled static embedding: vocab vectors on device.

    Reference: EmbeddingManager.compile_static -> core.StaticEmbedding
    materializing the (vocab x dim) matrix once per session
    (vocabulary.h:251-258, embedding/static.cpp:18-27).
    """

    def __init__(self, name: str, encoder, vocab_strings: Sequence[str]):
        self.name = name
        self.encoder = encoder
        vectors = encoder.encode_tokens(vocab_strings)
        # device-resident views
        self.unmodified = jnp.asarray(vectors.unmodified)
        self.normalized = jnp.asarray(vectors.normalized)
        self.magnitudes = jnp.asarray(vectors.magnitudes)

    @property
    def dimension(self):
        return int(self.unmodified.shape[1])

    def encode_query(self, token_strings: Sequence[str]) -> Vectors:
        return self.encoder.encode_tokens(token_strings)


class _DeviceVectors:
    """AbstractVectors facade over device arrays for VectorSim.compute."""

    def __init__(self, unmodified, normalized, magnitudes):
        self.unmodified = unmodified
        self.normalized = normalized
        self.magnitudes = magnitudes


def _leaf_matrix(
    sim: EmbeddingTokenSim,
    compiled: Dict[str, CompiledEmbedding],
    needle_token_ids: np.ndarray,  # [T] corpus-vocab ids (or -1 for OOV)
    needle_strings: Sequence[str],
    needs_magnitudes: bool,
) -> dict:
    emb = compiled[sim.embedding.name]
    t_vecs = emb.encode_query(needle_strings)
    s = _DeviceVectors(emb.unmodified, emb.normalized, emb.magnitudes)
    t = _DeviceVectors(
        jnp.asarray(t_vecs.unmodified),
        jnp.asarray(t_vecs.normalized),
        jnp.asarray(t_vecs.magnitudes),
    )
    matrix = sim.metric.compute(s, t)  # [V, T]

    # exact-token-match override: needle token j IS vocab token k -> sim 1.0
    ids = jnp.asarray(needle_token_ids, jnp.int32)
    T = ids.shape[0]
    cols = jnp.arange(T, dtype=jnp.int32)
    valid = ids >= 0
    matrix = matrix.at[jnp.where(valid, ids, 0), cols].set(
        jnp.where(valid, 1.0, matrix[0, cols])
    )
    matrix = jnp.clip(matrix, 0.0, 1.0)
    # PAD row (vocab id 0) must never contribute similarity
    matrix = matrix.at[0, :].set(0.0)

    out = {"similarity": matrix}
    if needs_magnitudes:
        out["magnitudes_s"] = emb.magnitudes
        mag_t = jnp.where(valid, emb.magnitudes[jnp.maximum(ids, 0)], 0.0)
        # OOV needle tokens still have their own (encoder) magnitude
        enc_mag = jnp.asarray(t_vecs.magnitudes)
        out["magnitudes_t"] = jnp.where(valid, mag_t, enc_mag)
    return out


def compile_similarity(
    token_sim,
    compiled: Dict[str, CompiledEmbedding],
    needle_token_ids: np.ndarray,
    needle_strings: Sequence[str],
    needs_magnitudes: bool = False,
) -> dict:
    """Evaluate a TokenSim tree to {'similarity': [V, T], 'magnitudes_*'}.

    Mirrors Query::create_strategy's metric compilation walk
    (query.cpp:156-218): modifiers recurse into operands, leaves build
    per-embedding matrices.
    """
    if isinstance(token_sim, TokenSimilarityModifier):
        operands = [
            compile_similarity(
                op, compiled, needle_token_ids, needle_strings, needs_magnitudes
            )
            for op in token_sim.operands
        ]
        return token_sim.combine(operands)
    if isinstance(token_sim, EmbeddingTokenSim):
        return _leaf_matrix(
            token_sim, compiled, needle_token_ids, needle_strings, needs_magnitudes
        )
    raise TypeError(f"cannot compile token similarity {token_sim!r}")
