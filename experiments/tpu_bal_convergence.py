"""BAL-scale convergence ladder: schur_jacobi vs ssor, loss vs wall time.

The 3-LM-iter probes (balscale_dryrun precond mode) showed ssor reaching
~4x lower loss than schur_jacobi per LM iteration at ~1.4x the cost —
but production cares about TIME TO A TARGET, not per-iteration quality.
maxiter is a dynamic operand (one compile per precond serves the whole
ladder), so this sweeps maxiter and records (wall s, loss) pairs for
both preconditioners in ONE process (interleaved, drift-safe).

Run: cd /root/repo && python experiments/tpu_bal_convergence.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MAXITERS = [3, 6, 10, 15, 20, 25]


def main() -> None:
    import jax

    from tpu3drecon.problems.wtt import expand_onehots
    from tpu3drecon.solvers.ba_wtt import make_wtt_ba_solver
    from tpu3drecon.solvers.bundle_adjust import BAConfig
    from tpu3drecon.utils.placement import commit

    print("backend:", jax.default_backend(), flush=True)

    from tpu3drecon.benchmark.balscale import bal_sequential_wtt

    wtt = bal_sequential_wtt()
    wtt = expand_onehots(commit(wtt))
    jax.device_get(wtt.buckets[0].uv[0, 0, 0, 0])

    # Headline-config CG budget for both; only the preconditioner differs.
    solvers = {}
    for name in ("schur_jacobi", "ssor"):
        cfg = BAConfig(maxiter=MAXITERS[-1], gtol=0.0, ftol=0.0,
                       cg_maxiter=8, cg_rtol=1e-4, precond=name)
        t0 = time.time()
        s = make_wtt_ba_solver(cfg)
        out = s(wtt)
        jax.device_get(out[2].loss)
        print(f"{name}: compile {time.time()-t0:.1f}s", flush=True)
        solvers[name] = cfg

    # maxiter is dynamic: same jit executable serves every rung.
    for mi in MAXITERS:
        for name, base in solvers.items():
            cfg = base._replace(maxiter=mi)
            s = make_wtt_ba_solver(cfg)
            t0 = time.time()
            out = s(wtt)
            loss = float(jax.device_get(out[2].loss))
            dt = time.time() - t0
            print(json.dumps({
                "mode": "bal_convergence", "precond": name, "maxiter": mi,
                "wall_s": round(dt, 3), "s_per_lm_iter": round(dt / mi, 3),
                "loss": loss,
                "accepted": int(jax.device_get(out[2].accepted)),
            }), flush=True)


if __name__ == "__main__":
    main()
