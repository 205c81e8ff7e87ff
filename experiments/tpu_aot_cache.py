"""Does AOT executable serialization work on the axon TPU plugin?

The persistent XLA compilation cache never hits on this plugin (RESULTS.md
round 2c/2d: entries written, second process recompiles anyway).  If
`jax.experimental.serialize_executable` round-trips cross-process we can
build our own executable cache keyed by (backend, fingerprint of the
lowered program) and kill the BAL-scale ~300-650 s compile wall
(VERDICT round 2, next-round item #1).

Phases (run SEQUENTIALLY — a child process cannot claim the TPU while the
parent still holds it; the first smoke deadlocked exactly so):
  save        — tiny jitted fn: compile, run, serialize to /tmp, exit.
  child-smoke — fresh process: deserialize + run, compare to expected.
  bench-save / bench-load — same two phases for the REAL tt bench solve
           via utils/aot_cache.cached_compile (the cross-process
           time-to-first-solve measurement that kills the compile wall).

Run:
  python experiments/tpu_aot_cache.py save
  python experiments/tpu_aot_cache.py child-smoke /tmp/aot_smoke.pkl
  python experiments/tpu_aot_cache.py bench-save
  python experiments/tpu_aot_cache.py bench-load
"""

from __future__ import annotations

import os
import pickle
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _child_smoke(payload_path: str) -> None:
    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax.experimental.serialize_executable import deserialize_and_load

    t0 = time.perf_counter()
    with open(payload_path, "rb") as f:
        payload, in_tree, out_tree = pickle.load(f)
    loaded = deserialize_and_load(payload, in_tree, out_tree)
    t_load = time.perf_counter() - t0
    x = jnp.full((256, 256), 0.5)
    y = jnp.full((256, 256), 2.0)
    t0 = time.perf_counter()
    out = np.asarray(loaded(x, y))
    t_run = time.perf_counter() - t0
    print(
        f"child: load {t_load:.2f}s run {t_run:.2f}s "
        f"sum={out.sum():.3f} backend={jax.default_backend()}",
        flush=True,
    )


def save() -> None:
    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax.experimental.serialize_executable import serialize

    print("backend:", jax.default_backend(), flush=True)

    @jax.jit
    def f(x, y):
        return jnp.sin(x) @ y + 1.0

    x = jnp.full((256, 256), 0.5)
    y = jnp.full((256, 256), 2.0)
    t0 = time.perf_counter()
    comp = f.lower(x, y).compile()
    print(f"parent compile: {time.perf_counter() - t0:.2f}s", flush=True)
    expected = float(np.asarray(f(x, y)).sum())

    t0 = time.perf_counter()
    payload, in_tree, out_tree = serialize(comp)
    print(
        f"parent serialize: {time.perf_counter() - t0:.2f}s, "
        f"{len(payload)} bytes",
        flush=True,
    )
    path = "/tmp/aot_smoke.pkl"
    with open(path, "wb") as f_out:
        pickle.dump((payload, in_tree, out_tree), f_out)

    from jax.experimental.serialize_executable import deserialize_and_load

    loaded = deserialize_and_load(payload, in_tree, out_tree)
    got = float(np.asarray(loaded(x, y)).sum())
    print(f"in-process round trip: got {got:.3f} expected {expected:.3f}",
          flush=True)


def _bench_setup():
    from tpu3drecon.benchmark.medium_config import BENCH_CONFIG, build_problem
    from tpu3drecon.problems.tt import tt_from_flat
    from tpu3drecon.solvers.ba_tt import _TT_JIT_CACHE  # noqa: F401
    from tpu3drecon.solvers.bundle_adjust import (
        dynamic_operands,
        merge_dynamic_config,
        static_config,
    )
    from tpu3drecon.utils.placement import commit

    import jax

    from tpu3drecon.solvers.ba_tt import ba_solve_tt

    flat_host = build_problem(on_host=True)
    problem = commit(tt_from_flat(flat_host))
    static = static_config(BENCH_CONFIG)
    jitfn = jax.jit(
        lambda p, d, s=static: ba_solve_tt(p, merge_dynamic_config(s, d))
    )
    return jitfn, problem, dynamic_operands(BENCH_CONFIG)


def bench_phase(expect_hit: bool) -> None:
    """Time-to-first-solve of the REAL bench executable via the AOT cache."""
    import jax

    from tpu3drecon.utils.aot_cache import cached_compile, entry_count
    from tpu3drecon.utils.timing import device_sync

    print(f"backend: {jax.default_backend()}, aot entries: {entry_count()}",
          flush=True)
    t_all = time.perf_counter()
    jitfn, problem, dyn = _bench_setup()
    t_setup = time.perf_counter() - t_all
    t0 = time.perf_counter()
    compiled = cached_compile(jitfn, problem, dyn, verbose=True)
    t_ready = time.perf_counter() - t0
    t0 = time.perf_counter()
    cams, pts, state = compiled(problem, dyn)
    device_sync(state.loss)
    t_first = time.perf_counter() - t0
    t0 = time.perf_counter()
    cams, pts, state = compiled(problem, dyn)
    device_sync(state.loss)
    t_steady = time.perf_counter() - t0
    print(
        f"setup {t_setup:.1f}s, executable-ready {t_ready:.1f}s "
        f"(expected {'HIT' if expect_hit else 'MISS'}), first solve "
        f"{t_first:.3f}s, steady {t_steady:.3f}s, loss "
        f"{float(state.loss):.6e}, accepted {int(state.accepted)}",
        flush=True,
    )


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "save"
    if mode == "save":
        save()
    elif mode == "child-smoke":
        _child_smoke(sys.argv[2])
    elif mode == "bench-save":
        bench_phase(expect_hit=False)
    elif mode == "bench-load":
        bench_phase(expect_hit=True)
    else:
        raise SystemExit(f"unknown mode {mode}")
