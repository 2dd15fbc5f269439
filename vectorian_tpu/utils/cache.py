"""Persistent jax compilation cache opt-in.

Remote compiles through the tunneled TPU runtime cost minutes per kernel;
a persistent on-disk executable cache collapses repeat runs (including the
driver's bench run).  Shared by bench.py and every scripts/ entry point so
any kernel shape compiled once — by a profile run, a parity suite, or the
bench itself — is warm for all of them.
"""

import os


def enable_compile_cache() -> str:
    """Point jax at the shared persistent compilation cache directory
    (``VECTORIAN_JAX_CACHE``, default ``~/.cache/vectorian_jax``) and
    return the path.  Safe to call before or after device init; a jax
    build without the cache config knobs is silently left alone."""
    import jax

    cache_dir = os.environ.get(
        "VECTORIAN_JAX_CACHE", os.path.expanduser("~/.cache/vectorian_jax")
    )
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        pass
    return cache_dir
