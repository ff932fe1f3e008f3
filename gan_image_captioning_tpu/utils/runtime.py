"""Runtime setup shared by every entry point.

Enables the persistent XLA compilation cache (compiles over the remote TPU
tunnel take minutes; cached reloads take seconds) and centralizes
backend-selection quirks of this environment.
"""

from __future__ import annotations

import os


def setup(cache_dir: str = ""):
    """Call before the first jit compilation in any entry point."""
    import jax

    # TPU only: CPU AOT cache entries record exact machine features and can
    # load with feature mismatches (SIGILL risk) when the compiling and
    # executing hosts differ; CPU compiles are fast anyway.
    if jax.default_backend() != "tpu":
        return
    cache_dir = cache_dir or os.environ.get(
        "GIC_COMPILE_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "gic_xla"))
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax or read-only fs — cache is an optimization only
