"""Persistent ahead-of-time executable cache (the compile-wall killer).

jax's built-in persistent compilation cache never hits on the axon TPU
plugin (RESULTS.md round 2: entries written, every process recompiles), so
BAL-scale wtt solves paid ~300-650 s of compile per process.  This module
caches at the level the plugin demonstrably supports
(experiments/tpu_aot_cache.py): `jax.experimental.serialize_executable` —
serialize the compiled executable once, deserialize in every later process.

Design (two key levels):
  - **Exact key** — ``cached_compile(jitfn, *args)`` lowers the jitted
    function (local trace+lowering — seconds, not minutes), fingerprints
    the StableHLO module together with the backend identity, and either
    deserializes a hit or compiles+stores a miss.  Keying on the lowered
    module makes the key exact: any change to code, shapes, dtypes,
    static config, or jax version changes the HLO bytes.  But the key
    costs a trace+lower (~6 s for the bench program) before it can hit.
  - **Semantic key** — when the caller supplies ``semantic_key`` (a
    string capturing every static input to program construction, e.g.
    ``f"tt|{static_config!r}|k{kernels}"``), a sidecar index maps
    sha256(backend, jax version, package source-tree hash, semantic_key,
    arg treedef+shapes+dtypes) -> the exact entry.  A semantic hit skips
    trace+lowering entirely (~1-2 s to executable-ready).  The source
    tree hash makes any code edit a clean miss; the fallback is the exact
    path, which then refreshes the index.
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

# XLA:CPU AOT results are NOT safely loadable in another process: a
# deserialized whole-solver executable segfaults at execution (measured —
# a small matmul program survives, the tt solver does not; the loader
# also warns about compile-machine-feature mismatch).  The TPU path is
# verified cross-process (experiments/tpu_aot_cache.py).  CPU entries are
# therefore tagged with a per-process token and only reloaded by the
# process that wrote them (which keeps the in-process tests meaningful).
import uuid

_PROC_TAG = uuid.uuid4().hex


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


_SRC_HASH: Optional[str] = None


def _source_tree_hash() -> str:
    """Content hash of every .py file in the tpu3drecon package (memoized
    per process; ~0.7 MB, <50 ms).  Any code edit invalidates semantic
    keys — correctness falls back to the exact StableHLO key."""
    global _SRC_HASH
    if _SRC_HASH is None:
        pkg = Path(__file__).resolve().parents[1]
        h = hashlib.sha256()
        for p in sorted(pkg.rglob("*.py")):
            h.update(str(p.relative_to(pkg)).encode())
            h.update(b"\x00")
            h.update(p.read_bytes())
            h.update(b"\x01")
        _SRC_HASH = h.hexdigest()[:16]
    return _SRC_HASH


def _args_signature(args) -> str:
    import jax

    leaves, treedef = jax.tree_util.tree_flatten(args)
    sig = tuple(
        (tuple(getattr(x, "shape", ())), str(getattr(x, "dtype", type(x))))
        for x in leaves
    )
    return f"{treedef}|{sig}"


def semantic_fingerprint(semantic_key: str, args) -> str:
    """Fast cache key: no tracing/lowering required.  Sound iff
    ``semantic_key`` captures every static input to program construction
    (config, flags) — shapes/dtypes/treedef and the package source come
    from here, backend+jax version from the backend fingerprint."""
    h = hashlib.sha256()
    for part in (
        _backend_fingerprint(),
        _source_tree_hash(),
        semantic_key,
        _args_signature(args),
    ):
        h.update(part.encode())
        h.update(b"\x00")
    return h.hexdigest()[:32]


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


def _max_entry_bytes() -> int:
    """Entries above this size are neither stored nor reloaded.

    MEASURED on the axon TPU plugin: a 46 MB serialized solver (bench
    scale) deserializes in ~1 s and runs immediately — the verified win
    this cache exists for.  112-140 MB whole-solver executables (BAL
    scale) deserialize quickly but the FIRST execution either re-pays the
    entire server-side compile (~320 s, worse than compiling fresh) or
    aborts the TPU backend outright ("ABORTED: TPU backend error").  With
    the batched linearization the BAL program compiles in ~22 s anyway,
    so large programs just recompile."""
    return int(os.environ.get("TPU3DRECON_AOT_MAX_BYTES", 64_000_000))


def _load_entry(path: Path, verbose: bool, label: str, prefix_s: float = 0.0):
    """Deserialize one cache entry; returns the loaded executable or None
    (deleting the entry if it is corrupt/stale)."""
    import time

    import jax
    from jax.experimental.serialize_executable import deserialize_and_load

    try:
        if path.stat().st_size > _max_entry_bytes():
            if verbose:
                print(
                    f"aot_cache: skip oversized entry {path.name} "
                    f"({path.stat().st_size / 1e6:.0f} MB > cap; axon "
                    "first-exec of large deserialized executables "
                    "recompiles or aborts — recompiling fresh)"
                )
            return None
        t0 = time.perf_counter()
        with open(path, "rb") as f:
            entry = pickle.load(f)
        payload, in_tree, out_tree, n_dev = entry[:4]
        writer_tag = entry[4] if len(entry) > 4 else None
        if jax.devices()[0].platform == "cpu" and writer_tag != _PROC_TAG:
            # Cross-process XLA:CPU AOT loads segfault (see module
            # docstring); treat as a miss and recompile.
            if verbose:
                print(f"aot_cache: skip cross-process CPU entry {path.name}")
            return None
        # Load onto the same NUMBER of devices the executable was built
        # for (the library default is ALL local devices, which breaks
        # single-device executables on multi-device hosts).
        loaded = deserialize_and_load(
            payload, in_tree, out_tree,
            execution_devices=jax.devices()[:n_dev],
        )
        if verbose:
            print(
                f"aot_cache: {label} {path.name} "
                f"(prior {prefix_s:.1f}s, load "
                f"{time.perf_counter() - t0:.1f}s)"
            )
        return loaded
    except FileNotFoundError:
        return None
    except Exception as e:  # stale jaxlib, corrupt file, ...
        if verbose:
            print(f"aot_cache: stale entry {path.name}: {e!r}")
        try:
            path.unlink()
        except OSError:
            pass
        return None


def cached_compile(
    jitfn,
    *args: Any,
    cache_dir=None,
    verbose: bool = False,
    semantic_key: Optional[str] = None,
) -> Callable:
    """Compile ``jitfn`` for ``args`` through the persistent AOT cache.

    Returns a callable with the compiled executable's calling convention
    (same positional arg structure as ``args``).  Falls back to plain
    ``lowered.compile()`` (and then to ``jitfn`` itself) if serialization
    is unsupported; a corrupt/stale cache entry is deleted and recompiled.

    ``semantic_key`` enables the fast key level: a string capturing every
    static input to program construction.  A semantic hit skips
    trace+lowering entirely.

    Disable with TPU3DRECON_AOT_CACHE_DISABLE=1 (then this is exactly
    ``jitfn.lower(*args).compile()``).
    """
    import time

    from jax.experimental.serialize_executable import serialize

    disabled = bool(os.environ.get("TPU3DRECON_AOT_CACHE_DISABLE"))
    cdir = _cache_dir(cache_dir)
    sem_path: Optional[Path] = None
    if not disabled and semantic_key is not None:
        sem_path = cdir / f"{semantic_fingerprint(semantic_key, args)}.sem"
        if sem_path.is_file():
            exact = sem_path.read_text().strip()
            loaded = _load_entry(cdir / f"{exact}.aot", verbose, "SEM-HIT")
            if loaded is not None:
                return loaded

    t0 = time.perf_counter()
    lowered = jitfn.lower(*args)
    t_lower = time.perf_counter() - t0
    path: Optional[Path] = None
    if not disabled:
        key = lowered_fingerprint(lowered)
        path = cdir / f"{key}.aot"
        if os.environ.get("TPU3DRECON_AOT_DEBUG"):
            dbg = cdir / f"{key}.stablehlo.txt"
            dbg.parent.mkdir(parents=True, exist_ok=True)
            dbg.write_text(
                "// backend_fp: " + _backend_fingerprint() + "\n"
                + str(lowered.compiler_ir(dialect="stablehlo"))
            )
        loaded = _load_entry(path, verbose, "HIT", prefix_s=t_lower)
        if loaded is not None:
            _write_sem_index(sem_path, key, verbose)
            return loaded

    t0 = time.perf_counter()
    compiled = lowered.compile()
    t_compile = time.perf_counter() - t0
    if path is not None:
        try:
            payload, in_tree, out_tree = serialize(compiled)
            if len(payload) > _max_entry_bytes():
                if verbose:
                    print(
                        f"aot_cache: not storing {path.name} "
                        f"({len(payload) / 1e6:.0f} MB > cap — large "
                        "deserialized executables are pathological on the "
                        "axon plugin; see _max_entry_bytes)"
                    )
                return compiled
            try:
                n_dev = len(compiled._executable.xla_executable.local_devices())
            except AttributeError:
                n_dev = 1
            path.parent.mkdir(parents=True, exist_ok=True)
            tmp = path.with_suffix(f".tmp{os.getpid()}")
            with open(tmp, "wb") as f:
                pickle.dump(
                    (payload, in_tree, out_tree, n_dev, _PROC_TAG), f
                )
            tmp.replace(path)  # atomic vs concurrent writers
            _write_sem_index(sem_path, path.stem, verbose)
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


def _write_sem_index(sem_path: Optional[Path], exact_key: str,
                     verbose: bool) -> None:
    if sem_path is None:
        return
    try:
        sem_path.parent.mkdir(parents=True, exist_ok=True)
        tmp = sem_path.with_suffix(f".semtmp{os.getpid()}")
        tmp.write_text(exact_key)
        tmp.replace(sem_path)
        if verbose:
            print(f"aot_cache: sem index {sem_path.name} -> {exact_key}")
    except OSError as e:
        if verbose:
            print(f"aot_cache: sem index write failed: {e!r}")


def aot_wrap(jitfn, cache_dir=None, verbose: Optional[bool] = None,
             semantic_key: Optional[str] = None) -> Callable:
    """Wrap a jitted function so each argument-shape signature compiles
    through the persistent AOT cache (memoized in-process).

    Drop-in replacement for calling ``jitfn`` directly: same args, same
    outputs.  First call per shape signature pays (semantic-index load |
    lower + cache load | lower + compile); later calls dispatch the
    compiled executable directly.  ``semantic_key`` (recommended): see
    ``cached_compile`` — hits then skip trace+lowering entirely.
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
                jitfn, *args, cache_dir=cache_dir, verbose=verbose,
                semantic_key=semantic_key,
            )
            memo[key] = compiled
        return compiled(*args)

    return call


def clear(cache_dir=None) -> int:
    """Delete all cache entries; returns the number removed."""
    d = _cache_dir(cache_dir)
    n = 0
    if d.is_dir():
        for p in list(d.glob("*.aot")) + list(d.glob("*.sem")):
            p.unlink()
            n += 1
    return n


def entry_count(cache_dir=None) -> int:
    d = _cache_dir(cache_dir)
    return sum(1 for _ in d.glob("*.aot")) if d.is_dir() else 0
