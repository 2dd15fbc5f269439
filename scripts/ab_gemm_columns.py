"""Are leaf-GEMM columns bit-stable under the needle column count?

The serving batch compiles Q per-query [V, T] leaf matrices (one GEMM
dispatch each, ops/simmatrix._leaf_matrix_device); a single [V, T*Q] GEMM
would replace Q dispatches IF each column's bits are independent of how
many other columns ride the same GEMM (byte-equality across
find/find_batch hangs on the plan matrices' bits).  This A/Bs the actual
metric.compute under jit at HIGHEST precision: T=8 columns alone vs the
same 8 columns inside T=512 / T=64 stacks.

Usage: [FORCE_CPU=1] python scripts/ab_gemm_columns.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    if os.environ.get("FORCE_CPU"):
        import jax

        jax.config.update("jax_platforms", "cpu")
    from vectorian_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()

    import jax
    import jax.numpy as jnp

    from vectorian_tpu.sim.vector import CosineSim, EuclideanDistance, ImprovedSqrtCosineSim

    rng = np.random.default_rng(0)
    V, d = 50_000, 300
    S = rng.normal(size=(V, d)).astype(np.float32)
    Sn = (S / np.linalg.norm(S, axis=1, keepdims=True)).astype(np.float32)
    T0 = 8

    class _Vecs:
        def __init__(self, u):
            self.unmodified = u
            self.normalized = u
            self.magnitudes = jnp.ones((u.shape[0],), jnp.float32)

    for name, metric in (
        ("cosine", CosineSim()),
        ("euclidean", EuclideanDistance()),
        ("isc", ImprovedSqrtCosineSim()),
    ):
        def compute(su, tu, m=metric):
            return jax.jit(
                lambda a, b: m.compute(_Vecs(a), _Vecs(b))
            )(su, tu)
        ok_all = True
        for Tbig in (64, 512):
            t_big = rng.normal(size=(Tbig, d)).astype(np.float32)
            t_big = (
                t_big / np.linalg.norm(t_big, axis=1, keepdims=True)
            ).astype(np.float32)
            t_small = t_big[:T0].copy()

            big = np.asarray(compute(jnp.asarray(Sn), jnp.asarray(t_big)))[:, :T0]
            small = np.asarray(compute(jnp.asarray(Sn), jnp.asarray(t_small)))
            same = np.array_equal(
                big.view(np.uint32), small.view(np.uint32)
            )
            ok_all = ok_all and same
            diff = np.abs(big - small)
            print(
                f"{name:10s} T={T0} vs slice of T={Tbig}: "
                f"{'BIT-EQUAL' if same else 'DIFFERS'}"
                + ("" if same else f" (max |d|={diff.max():.3e}, "
                   f"n={np.count_nonzero(diff)})"),
                flush=True,
            )
        print(f"{name:10s} => {'SAFE to batch' if ok_all else 'NOT safe'}")
    os._exit(0)


if __name__ == "__main__":
    main()
