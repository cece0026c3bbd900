"""Persistent XLA compilation cache.

Cold compiles of the jitted denoise scan / finetune programs cost 1-10 min
over a remote-compile TPU attachment (and ~20-40 s locally); jax's
persistent compilation cache reuses the compiled executable across
*processes* for identical programs, so a second `sample` or `finetune` run
of the same shapes skips compilation entirely (`bench.py` opts in only when
SE3DIFF_COMPILATION_CACHE_DIR is set explicitly: the driver runs it
unattended). The reference has no analogue (torch eager); this is
TPU-native operational plumbing.

Enabled by the CLIs by default; opt out with SE3DIFF_NO_COMPILATION_CACHE=1
(or point SE3DIFF_COMPILATION_CACHE_DIR somewhere else). Backends that
cannot serialize executables make jax skip the cache with a one-time
warning — never an error.
"""

from __future__ import annotations

import os

DEFAULT_CACHE_DIR = os.path.join(
    os.path.expanduser("~"), ".se3diff_xla_cache"
)

# LRU bound so shape sweeps don't grow $HOME without limit.
DEFAULT_MAX_SIZE_BYTES = 4 * 1024**3

_FALSY = {"", "0", "false", "no"}


def enable_compilation_cache(cache_dir: str | None = None) -> str | None:
    """Turn on jax's persistent compilation cache; returns the dir used
    (None when disabled via SE3DIFF_NO_COMPILATION_CACHE)."""
    if os.environ.get("SE3DIFF_NO_COMPILATION_CACHE", "").lower() not in _FALSY:
        return None
    import jax

    cache_dir = str(
        cache_dir
        or os.environ.get("SE3DIFF_COMPILATION_CACHE_DIR")
        or DEFAULT_CACHE_DIR
    )
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # Cache every program: even "fast" compiles are slow over a remote
    # tunnel, and entries are content-addressed (no collision risk).
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_compilation_cache_max_size", DEFAULT_MAX_SIZE_BYTES)
    return cache_dir
