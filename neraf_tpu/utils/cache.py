"""Persistent XLA compilation cache.

TPU compiles are expensive (remote compile in this environment can take
minutes for large fused graphs); the persistent cache makes every CLI
invocation after the first start hot. Enabled by all entry points.
"""

from __future__ import annotations

import os
from pathlib import Path


def enable_compilation_cache(cache_dir: str | None = None) -> None:
    import jax

    path = Path(cache_dir or os.environ.get(
        "NERAF_COMPILATION_CACHE", Path.home() / ".cache" / "neraf_jax_cache"))
    path.mkdir(parents=True, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", str(path))
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax without these flags: cache is best-effort
