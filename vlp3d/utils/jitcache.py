"""Persistent XLA compilation cache.

The TPU compiles of the canonical-shape JointNet programs are expensive
(the remote compiler takes minutes at batch 8 x 40960 points), and every
benchmark / CLI / driver session re-pays them. JAX's persistent
compilation cache keys executables by HLO fingerprint, so enabling a
shared on-disk cache makes every rerun of an unchanged program start in
seconds. Works with the axon TPU backend (verified: cache entries are
written and hit).
"""

from __future__ import annotations

import os

_DEFAULT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".jax_cache_tpu",
)


def enable_persistent_cache(cache_dir: str | None = None) -> str:
    """Point jax at an on-disk compilation cache (idempotent).

    Must be called before the first compilation to be effective; safe to
    call after jax import. Returns the cache directory used.
    """
    import jax

    cache_dir = cache_dir or os.environ.get("VLP3D_JIT_CACHE", _DEFAULT)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    return cache_dir
