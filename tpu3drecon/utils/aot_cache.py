"""Persistent ahead-of-time executable cache (the compile-wall killer).

jax's built-in persistent compilation cache never hits on the axon TPU
plugin (RESULTS.md round 2: entries written, every process recompiles), so
BAL-scale wtt solves paid ~300-650 s of compile per process.  This module
caches at the level the plugin demonstrably supports
(experiments/tpu_aot_cache.py): `jax.experimental.serialize_executable` —
serialize the compiled executable once, deserialize in every later process.

Design:
  - ``cached_compile(jitfn, *args)`` lowers the jitted function (local
    trace+lowering — seconds, not minutes), fingerprints the StableHLO
    module together with the backend identity, and either deserializes a
    hit or compiles+stores a miss.  The returned callable has jit-call
    semantics for the SAME arg structure.
  - Keying on the lowered module makes the key exact: any change to code,
    shapes, dtypes, static config, or jax version changes the HLO bytes.
  - Entries are (payload, in_tree, out_tree) pickles; treedefs of the
    registered problem dataclasses pickle by reference to their module
    path.

The reference kept compile-once accounting per process
(src/benchmark/jaxopt_benchmark/benchmark_pose_optimization.py:231-233);
this makes the compile once per CLUSTER of processes.
"""

from __future__ import annotations

import hashlib
import os
import pickle
from pathlib import Path
from typing import Any, Callable, Optional

_DEFAULT_DIR = Path(__file__).resolve().parents[2] / ".aot_cache"


def _cache_dir(cache_dir=None) -> Path:
    return Path(
        cache_dir
        or os.environ.get("TPU3DRECON_AOT_CACHE_DIR")
        or _DEFAULT_DIR
    )


def _backend_fingerprint() -> str:
    import jax

    dev = jax.devices()[0]
    client = dev.client
    return f"{jax.__version__}|{client.platform}|{client.platform_version}|{dev.device_kind}"


def lowered_fingerprint(lowered) -> str:
    """Content hash of a jax.stages.Lowered: StableHLO text + backend.

    Hashes the pretty-printed module, NOT ``module_to_bytecode``: measured
    on the axon TPU plugin, the bytecode of a byte-identical module text
    differs between processes (two stable variants — some unstable
    embedded metadata), which made cache keys miss ~half the time.  The
    text proved byte-stable across processes on both backends.
    """
    module = lowered.compiler_ir(dialect="stablehlo")
    h = hashlib.sha256()
    h.update(_backend_fingerprint().encode())
    h.update(b"\x00")
    h.update(str(module).encode())
    return h.hexdigest()[:32]


def cached_compile(
    jitfn,
    *args: Any,
    cache_dir=None,
    verbose: bool = False,
) -> Callable:
    """Compile ``jitfn`` for ``args`` through the persistent AOT cache.

    Returns a callable with the compiled executable's calling convention
    (same positional arg structure as ``args``).  Falls back to plain
    ``lowered.compile()`` (and then to ``jitfn`` itself) if serialization
    is unsupported; a corrupt/stale cache entry is deleted and recompiled.

    Disable with TPU3DRECON_AOT_CACHE_DISABLE=1 (then this is exactly
    ``jitfn.lower(*args).compile()``).
    """
    import time

    from jax.experimental.serialize_executable import (
        deserialize_and_load,
        serialize,
    )

    t0 = time.perf_counter()
    lowered = jitfn.lower(*args)
    t_lower = time.perf_counter() - t0
    disabled = bool(os.environ.get("TPU3DRECON_AOT_CACHE_DISABLE"))
    path: Optional[Path] = None
    if not disabled:
        key = lowered_fingerprint(lowered)
        path = _cache_dir(cache_dir) / f"{key}.aot"
        if os.environ.get("TPU3DRECON_AOT_DEBUG"):
            dbg = _cache_dir(cache_dir) / f"{key}.stablehlo.txt"
            dbg.parent.mkdir(parents=True, exist_ok=True)
            dbg.write_text(
                "// backend_fp: " + _backend_fingerprint() + "\n"
                + str(lowered.compiler_ir(dialect="stablehlo"))
            )
        if path.is_file():
            try:
                import jax

                t0 = time.perf_counter()
                with open(path, "rb") as f:
                    payload, in_tree, out_tree, n_dev = pickle.load(f)
                # Load onto the same NUMBER of devices the executable was
                # built for (the library default is ALL local devices, which
                # breaks single-device executables on multi-device hosts).
                loaded = deserialize_and_load(
                    payload, in_tree, out_tree,
                    execution_devices=jax.devices()[:n_dev],
                )
                if verbose:
                    print(
                        f"aot_cache: HIT {path.name} "
                        f"(lower {t_lower:.1f}s, load "
                        f"{time.perf_counter() - t0:.1f}s)"
                    )
                return loaded
            except Exception as e:  # stale jaxlib, corrupt file, ...
                if verbose:
                    print(f"aot_cache: stale entry {path.name}: {e!r}")
                try:
                    path.unlink()
                except OSError:
                    pass

    t0 = time.perf_counter()
    compiled = lowered.compile()
    t_compile = time.perf_counter() - t0
    if path is not None:
        try:
            payload, in_tree, out_tree = serialize(compiled)
            try:
                n_dev = len(compiled._executable.xla_executable.local_devices())
            except AttributeError:
                n_dev = 1
            path.parent.mkdir(parents=True, exist_ok=True)
            tmp = path.with_suffix(f".tmp{os.getpid()}")
            with open(tmp, "wb") as f:
                pickle.dump((payload, in_tree, out_tree, n_dev), f)
            tmp.replace(path)  # atomic vs concurrent writers
            if verbose:
                print(
                    f"aot_cache: MISS -> stored {path.name} "
                    f"(lower {t_lower:.1f}s, compile {t_compile:.1f}s, "
                    f"{len(payload)} bytes)"
                )
        except Exception as e:
            if verbose:
                print(f"aot_cache: serialization unsupported: {e!r}")
    return compiled


def aot_wrap(jitfn, cache_dir=None, verbose: Optional[bool] = None) -> Callable:
    """Wrap a jitted function so each argument-shape signature compiles
    through the persistent AOT cache (memoized in-process).

    Drop-in replacement for calling ``jitfn`` directly: same args, same
    outputs.  First call per shape signature pays lower + (cache load |
    compile); later calls dispatch the compiled executable directly.
    """
    import jax

    if verbose is None:
        verbose = bool(os.environ.get("TPU3DRECON_AOT_VERBOSE"))
    memo = {}

    def call(*args):
        leaves, treedef = jax.tree_util.tree_flatten(args)
        key = (
            treedef,
            tuple((tuple(x.shape), str(getattr(x, "dtype", type(x)))) for x in leaves),
        )
        compiled = memo.get(key)
        if compiled is None:
            compiled = cached_compile(
                jitfn, *args, cache_dir=cache_dir, verbose=verbose
            )
            memo[key] = compiled
        return compiled(*args)

    return call


def clear(cache_dir=None) -> int:
    """Delete all cache entries; returns the number removed."""
    d = _cache_dir(cache_dir)
    n = 0
    if d.is_dir():
        for p in d.glob("*.aot"):
            p.unlink()
            n += 1
    return n


def entry_count(cache_dir=None) -> int:
    d = _cache_dir(cache_dir)
    return sum(1 for _ in d.glob("*.aot")) if d.is_dir() else 0
