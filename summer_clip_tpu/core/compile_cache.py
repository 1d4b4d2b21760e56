"""Persistent XLA executable cache, shared policy for every entry surface.

Compiles through the tunneled-TPU transport have been measured at 10-570s
for the SAME program depending on remote load (docs/KERNELS.md); caching
compiled executables on local disk makes repeat runs immune. One helper so
bench.py, __graft_entry__ and tests/conftest.py cannot drift on policy.
"""

from __future__ import annotations

import os

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
DEFAULT_CACHE_DIR = os.path.join(_REPO_ROOT, ".jax_cache")


def enable_persistent_cache(cache_dir: str | None = None) -> str:
    """Point jax's persistent compilation cache at ``cache_dir``.

    Must run before the program whose compile should be cached (any time
    before is fine — the setting is read at compile time). Returns the dir.
    """
    import jax

    cache_dir = cache_dir or DEFAULT_CACHE_DIR
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return cache_dir
