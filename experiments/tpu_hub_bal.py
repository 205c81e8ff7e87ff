"""Hub-structured (photo-tourism co-visibility) BAL scale on the real TPU.

Round-4 verdict item 1: prove the dislocal-scene story at 1712 cams / ~1M
pts.  Interleaved in-process A/B (the only trustworthy comparison through
the TPU session drift, RESULTS.md):

  A. sequential BAL problem (benchmark/balscale.bal_sequential_wtt) — the
     recorded 0.128 s/LM-iter configuration;
  B. hub-structured problem (bal_hub_wtt): 5% overview cameras observing
     scene-wide, packed through wtt auto mode (hub/global split).

Reports s/LM-iter for both, window/one-hot stats, and the hub split the
packer chose.  Target: hub within ~2x of sequential.

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/tpu_hub_bal.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")


def main():
    import jax

    from tpu3drecon.benchmark.balscale import bal_hub_wtt, bal_sequential_wtt
    from tpu3drecon.problems.wtt import expand_onehots
    from tpu3drecon.solvers.ba_wtt import make_wtt_ba_solver
    from tpu3drecon.solvers.bundle_adjust import BAConfig
    from tpu3drecon.utils.placement import commit

    lm_iters = 3
    config = BAConfig(
        maxiter=lm_iters, gtol=0.0, ftol=0.0, cg_maxiter=8, cg_rtol=0.0,
        precond="schur_jacobi",
    )
    solver = make_wtt_ba_solver(config)

    def run(tag, problem):
        t0 = time.time()
        problem = expand_onehots(commit(problem))
        oh_bytes = sum(
            b.onehot.size * b.onehot.dtype.itemsize for b in problem.buckets
        )
        print(f"[{tag}] place+expand {time.time()-t0:.1f}s, one-hots "
              f"{oh_bytes/1e9:.2f} GB, windows "
              f"{[(b.window, b.global_tiles) for b in problem.buckets]}",
              flush=True)
        t0 = time.time()
        cams, pts, state = solver(problem)
        jax.block_until_ready(pts)
        float(jax.device_get(state.loss))
        print(f"[{tag}] compile+first {time.time()-t0:.1f}s", flush=True)
        times = []
        for _ in range(3):
            t0 = time.time()
            cams, pts, state = solver(problem)
            jax.block_until_ready(pts)
            float(jax.device_get(state.loss))
            times.append(time.time() - t0)
        med = sorted(times)[1]
        print(f"[{tag}] {med/lm_iters:.4f} s/LM-iter (times {times}), "
              f"loss {float(jax.device_get(state.loss)):.4e}, "
              f"accepted {int(jax.device_get(state.accepted))}/{lm_iters}",
              flush=True)
        return med / lm_iters

    print("building/loading problems (host)...", flush=True)
    t0 = time.time()
    seq = bal_sequential_wtt()
    print(f"sequential ready {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    hub = bal_hub_wtt()
    print(f"hub ready {time.time()-t0:.1f}s", flush=True)

    s_seq = run("seq", seq)
    del seq
    s_hub = run("hub", hub)
    # Re-run sequential to bracket session drift.
    print(f"RESULT: seq {s_seq:.4f} s/LM-iter, hub {s_hub:.4f} s/LM-iter "
          f"(ratio {s_hub/s_seq:.2f}x)", flush=True)


if __name__ == "__main__":
    main()
