"""Re-measure the >64 MB AOT-cache pathology on the BATCHED BAL program.

Round-3 trap (CLAUDE.md): a >100 MB serialized TPU executable deserialized
in ~1 s but its FIRST execution re-paid the entire server-side compile
(~320 s) or aborted the backend — measured on the PRE-batching 165-plane
program.  The round-3 batched (diagonal-slice) program is structurally far
simpler at similar byte size, so the pathology may be program-complexity-,
not byte-, driven (round-3 verdict item 4).  This measures it honestly:

  phase store: compile the BAL-scale wtt solver with the AOT cache's size
    cap lifted, serialize, report entry size;
  phase load (FRESH process): deserialize, time to first LM solve.

Verdict bar: warm-cache BAL cold-process time-to-first-iteration <= 10 s,
or a measured negative confirming the cap.

Run:  python experiments/tpu_aot_bal.py store
      python experiments/tpu_aot_bal.py load
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

# Lift the 64 MB cap for this experiment only.
os.environ["TPU3DRECON_AOT_MAX_BYTES"] = str(512 << 20)


def main(phase: str):
    import jax

    from tpu3drecon.benchmark.balscale import bal_sequential_wtt
    from tpu3drecon.problems.wtt import expand_onehots
    from tpu3drecon.solvers.ba_wtt import make_wtt_ba_solver
    from tpu3drecon.solvers.bundle_adjust import BAConfig
    from tpu3drecon.utils.placement import commit
    from tpu3drecon.utils import aot_cache

    t_start = time.time()
    problem = bal_sequential_wtt(verbose=True)
    t0 = time.time()
    problem = expand_onehots(commit(problem))
    print(f"problem ready: load {t0-t_start:.1f}s, place+expand "
          f"{time.time()-t0:.1f}s", flush=True)

    config = BAConfig(
        maxiter=3, gtol=0.0, ftol=0.0, cg_maxiter=8, cg_rtol=0.0,
        precond="schur_jacobi",
    )
    entries_before = aot_cache.entry_count()
    solver = make_wtt_ba_solver(config, aot=True)

    t0 = time.time()
    cams, pts, state = solver(problem)
    jax.block_until_ready(pts)
    loss = float(jax.device_get(state.loss))
    t_first = time.time() - t0
    print(f"[{phase}] entries_before={entries_before} "
          f"first solve {t_first:.1f}s, loss {loss:.4e}, "
          f"time-to-first-solution since process start "
          f"{time.time()-t_start:.1f}s", flush=True)

    t0 = time.time()
    cams, pts, state = solver(problem)
    jax.block_until_ready(pts)
    float(jax.device_get(state.loss))
    print(f"[{phase}] second solve {time.time()-t0:.2f}s", flush=True)

    cache_dir = aot_cache._cache_dir()
    sizes = sorted(
        (os.path.getsize(os.path.join(cache_dir, f)), f)
        for f in os.listdir(cache_dir)
        if os.path.isfile(os.path.join(cache_dir, f))
    )
    for sz, f in sizes[-3:]:
        print(f"[{phase}] cache entry {f}: {sz/1e6:.1f} MB", flush=True)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "store")
