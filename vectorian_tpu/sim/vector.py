"""Pairwise vector similarity strategies (reference: vectorian/sim/vector.py).

Each ``VectorSim`` computes a full [n_a, n_b] similarity matrix in one
batched expression.  On TPU the cosine path is a single MXU GEMM — the
reference's per-query ``np.linalg.multi_dot`` (sim/vector.py:78) plus its
optional cupy dispatch collapse into this.

These are also the plugin point for custom user metrics: subclass
``VectorSim`` and implement ``compute`` with jax.numpy ops; it runs under jit
on device (replaces the reference's C++->python callback at
metric/static.cpp:42-55).
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp

from vectorian_tpu.sim.kernel import Kernel, UnaryOperator


class VectorSim:
    """A strategy computing a similarity matrix from two sets of vectors."""

    def __call__(self, a, b):
        return self.compute(a, b)

    @property
    def ident(self):
        """Stable hashable identity used as a jit-cache key for compiled
        query plans; parameterized metrics must extend this."""
        return (type(self).__name__,)

    def __hash__(self):
        return hash(self.ident)

    def __eq__(self, other):
        return type(other) is type(self) and other.ident == self.ident

    def compute(self, a, b):
        """Given vectors ``a`` ([n_a, d]) and ``b`` ([n_b, d]) as
        AbstractVectors, return sim [n_a, n_b]; 0 = dissimilar, 1 = identical.
        """
        raise NotImplementedError()

    @property
    def name(self) -> str:
        raise NotImplementedError()


class CosineSim(VectorSim):
    """Cosine of the angle between vectors — one bf16->f32 GEMM on the MXU."""

    def compute(self, a, b):
        return jnp.dot(
            jnp.asarray(a.normalized),
            jnp.asarray(b.normalized).T,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )

    @property
    def name(self):
        return "cosine"


class FuzzyJaccardSim(VectorSim):
    """sum(min(a,b)) / sum(max(a,b)) (reference sim/vector.py:85-95)."""

    def compute(self, a, b):
        av = jnp.asarray(a.unmodified)[:, None, :]
        bv = jnp.asarray(b.unmodified)[None, :, :]
        p = jnp.sum(jnp.minimum(av, bv), axis=-1)
        q = jnp.sum(jnp.maximum(av, bv), axis=-1)
        return p / jnp.where(q == 0, 1.0, q)

    @property
    def name(self):
        return "fuzzy-jaccard"


class ImprovedSqrtCosineSim(VectorSim):
    """Sohangir & Wang 2017; non-negativized like the reference
    (sim/vector.py:98-132): each component is split into a positive and a
    negated-positive channel before the sqrt-cosine."""

    @staticmethod
    def _to_non_negative(x):
        t = jnp.repeat(x, 2, axis=-1)
        sign = jnp.tile(jnp.array([1.0, -1.0], x.dtype), x.shape[-1])
        return jnp.maximum(0.0, t * sign)

    def compute(self, a, b):
        a_pos = self._to_non_negative(jnp.asarray(a.unmodified))
        b_pos = self._to_non_negative(jnp.asarray(b.unmodified))
        # sqrt(a_i * b_j) summed over dims == <sqrt(a), sqrt(b)> — a GEMM.
        num = jnp.dot(
            jnp.sqrt(a_pos),
            jnp.sqrt(b_pos).T,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        x = jnp.sqrt(jnp.sum(a_pos, axis=-1))
        y = jnp.sqrt(jnp.sum(b_pos, axis=-1))
        denom = x[:, None] * y[None, :]
        return jnp.where(denom > 0, num / jnp.where(denom == 0, 1.0, denom), 0.0)

    @property
    def name(self):
        return "improved-sqrt-cosine"


class PNormDistance(VectorSim):
    """p-norm distance; combine with DistanceToSimilarity to get a
    similarity (reference sim/vector.py:135-160)."""

    def __init__(self, p: float = 2):
        self._p = p

    @property
    def ident(self):
        return (type(self).__name__, self._p)

    def compute(self, a, b):
        if self._p == 2:
            # ||a-b||^2 = ||a||^2 + ||b||^2 - 2 a.b — GEMM form, MXU-friendly
            av = jnp.asarray(a.unmodified)
            bv = jnp.asarray(b.unmodified)
            sq = (
                jnp.sum(av * av, axis=-1)[:, None]
                + jnp.sum(bv * bv, axis=-1)[None, :]
                - 2.0
                * jnp.dot(
                    av,
                    bv.T,
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )
            )
            return jnp.sqrt(jnp.maximum(sq, 0.0))
        d = jnp.asarray(a.unmodified)[:, None, :] - jnp.asarray(b.unmodified)[None, :, :]
        d = jnp.sum(jnp.power(jnp.abs(d), self._p), axis=-1)
        return jnp.power(d, 1.0 / self._p)

    @property
    def name(self):
        return f"p-norm({self._p})"


class EuclideanDistance(PNormDistance):
    def __init__(self):
        super().__init__(p=2)


class DirectionalDistance(VectorSim):
    """Projection of difference vectors onto a direction (reference
    sim/vector.py:170-177)."""

    def __init__(self, dir):
        self._dir = jnp.asarray(dir)

    @property
    def ident(self):
        import numpy as _np

        return (type(self).__name__, _np.asarray(self._dir).tobytes())

    def compute(self, a, b):
        d = jnp.asarray(a.unmodified)[:, None, :] - jnp.asarray(b.unmodified)[None, :, :]
        return jnp.einsum("abd,kd->ab", d, jnp.atleast_2d(self._dir))

    @property
    def name(self):
        return "directional"


class LoggingSimilarity(VectorSim):
    """Records every (a, b) pair fed to the wrapped metric (reference
    sim/vector.py:48-60) — debugging/tracing aid.  ``host_only`` keeps it
    out of jit (it writes a file with concrete values per call)."""

    host_only = True

    def __init__(self, path, base):
        self._path = path
        self._base = base

    @property
    def ident(self):
        return (type(self).__name__, str(self._path), self._base.ident)

    def compute(self, a, b):
        import json

        with open(self._path, "a") as f:
            f.write(
                json.dumps(
                    {
                        "a": jnp.asarray(a.unmodified).tolist(),
                        "b": jnp.asarray(b.unmodified).tolist(),
                    }
                )
                + "\n"
            )
        return self._base(a, b)

    @property
    def name(self):
        return self._base.name


class ModifiedVectorSim(VectorSim):
    """VectorSim whose output is post-processed by unary operators."""

    def __init__(self, source: VectorSim, *operators: List[UnaryOperator]):
        self._source = source
        self._kernel = Kernel(operators)
        # a host-only source (e.g. LoggingSimilarity) must keep the whole
        # modified metric off the jit path
        self.host_only = getattr(source, "host_only", False)

    @property
    def ident(self):
        # parameterized: the jit cache must key on source AND operator
        # parameters (a bare class name would silently reuse stale traces)
        return (type(self).__name__, self._source.ident, self._kernel.ident)

    def compute(self, a, b):
        return self._kernel(self._source(a, b))

    @property
    def name(self):
        return self._kernel.name(self._source.name)
