"""Persistent XLA compilation cache.

The headline solve costs ~24 s of fresh-process compile (BENCH_r01.json);
jax's persistent compilation cache amortizes that to a disk read for every
process after the first.  Call ``enable_compilation_cache()`` BEFORE the
first jit execution (it only sets config, so any time before the first
compile works).

The cache lives inside the repo (.jax_cache/, gitignored) because this
container must not write outside it; point TPU3DRECON_CACHE_DIR elsewhere in
real deployments.
"""

from __future__ import annotations

import os
from pathlib import Path

_DEFAULT_DIR = Path(__file__).resolve().parents[2] / ".jax_cache"


def enable_compilation_cache(cache_dir: str | os.PathLike | None = None) -> str:
    """Enable jax's persistent compilation cache; returns the cache dir.

    ``TPU3DRECON_CACHE_DISABLE=1`` makes this a no-op: the test suite sets
    it because jax's cache WRITE path (executable serialization + zstd) has
    segfaulted suite runs twice under concurrent load, and the cache buys
    nothing on the fast-compiling virtual CPU mesh.
    """
    import jax

    if os.environ.get("TPU3DRECON_CACHE_DISABLE"):
        return ""
    path = Path(
        cache_dir
        or os.environ.get("TPU3DRECON_CACHE_DIR")
        or _DEFAULT_DIR
    )
    path.mkdir(parents=True, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(path))
    # Cache everything that takes >=1s to compile, regardless of size.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return str(path)


def cache_entry_count(cache_dir: str | os.PathLike | None = None) -> int:
    """Number of cached executables currently on disk (0 if no cache yet)."""
    path = Path(cache_dir or os.environ.get("TPU3DRECON_CACHE_DIR") or _DEFAULT_DIR)
    if not path.is_dir():
        return 0
    return sum(1 for p in path.iterdir() if p.is_file())
