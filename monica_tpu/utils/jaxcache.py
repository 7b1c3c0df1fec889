"""Persistent XLA compilation cache.

TPU compiles of the full classify program take minutes through a
remote-compile backend; the program is shape-stable across runs
(length-bucketed batches), so a persistent cache turns every rerun
(benchmarks, the streaming runtime, CI) into a cache hit.  No-op if the
backend does not support executable serialization.
"""

from __future__ import annotations

import os
from pathlib import Path


def enable_compilation_cache(cache_dir: str | os.PathLike | None = None) -> None:
    import jax

    d = Path(
        cache_dir
        or os.environ.get("JAX_COMPILATION_CACHE_DIR")
        or Path.home() / ".cache" / "monica_tpu" / "jax"
    )
    try:
        d.mkdir(parents=True, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", str(d))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # unsupported backend/config — caching is best-effort
