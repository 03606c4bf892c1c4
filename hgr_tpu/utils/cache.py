"""Persistent XLA compilation cache.

TPU compiles in this environment go through a remote-compile tunnel at
1-10 minutes per graph; JAX's persistent cache cuts warm starts to
sub-second (measured 192.6s -> 0.40s). Enabled by every CLI/bench entry
point; set HGR_TPU_CACHE_DIR to relocate or HGR_TPU_NO_CACHE=1 to
disable.
"""

from __future__ import annotations

import os


def enable_compilation_cache(default_dir: str = "") -> str:
    """Turn on jax's persistent compilation cache. Returns the dir."""
    if os.environ.get("HGR_TPU_NO_CACHE"):
        return ""
    cache_dir = (os.environ.get("HGR_TPU_CACHE_DIR")
                 or default_dir
                 or os.path.join(os.path.expanduser("~"), ".hgr_tpu_cache"))
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        return ""
    return cache_dir
