"""Headline benchmark: medium bundle adjustment, 100 cams / 100k pts / 200k obs.

BASELINE.json config #3 ("Medium BA with intrinsics refinement: ~100 cams /
100k points"; north-star: >= 20x CPU-reference time-to-convergence).  Runs a
fixed 30-outer-iteration implicit-Schur LM solve (identical deterministic
work on every backend) and reports wall time against the recorded CPU
reference of THIS solver on this host.

Engine: the windowed track-table engine with both index kernels
(solvers/ba_wtt.py + ops/pallas/{wtt_matvec,wtt_linearize}.py) on TPU —
measured 0.1333 s vs the tt engine's 0.1413 in interleaved A/B
(experiments/tpu_bench_wtt.py, RESULTS.md round 4b) — falling back to the
gather-free tt engine, then the Pallas fused-kernel grid path, then the
flat XLA engine; the CPU baseline is the flat engine (the fastest CPU
configuration).

vs_baseline semantics: CPU_BASELINE_S / tpu_time — i.e. the speedup over the
strongest available CPU reference.  Note the original reference
(jaxopt dense-J LM) cannot run this problem size at all (dense J would be
~200k x 300k; its driver caps at 15 cams / 400 pts,
benchmark_impl_bundle_adjustment.py:28-29), so our own solver on CPU is a
*stricter* baseline than the reference's.

Prints exactly one JSON line.
"""

from __future__ import annotations

import json
import sys


# Measured 2026-08-17 on this container's host CPU (single jax CPU device,
# all cores): 30 LM iters of the identical solve, f32, after warm-up.  Host
# CPU wall time varies with shared-host conditions (8-12 s when loaded;
# 6.14/6.19 s on two idle-host runs); the FASTEST observed run is recorded
# (conservative: it understates the TPU speedup).  Round-1 pin was 8.078 s
# under load.  Reproduce with: python bench.py --cpu; re-measure and record
# provenance with: python bench.py --repin (the headline JSON self-reports
# the pin's date and warns when the latest recorded measurement drifts).
CPU_BASELINE_S = 6.1356
CPU_PIN_RECORDED = "2026-08-17"
CPU_PIN_HOST_STATE = "idle host, fastest of repeated runs"


# The probe body: a trivial jax op whose output proves a live device.
# Module-level so the probe tests can substitute a jax-free stand-in
# (the real one would claim the actual TPU from inside the test suite).
_PROBE_SRC = "import jax, jax.numpy as jnp; print(float(jnp.arange(4.0).sum()))"


def _probe_once(timeout_s: float) -> tuple:
    """One TPU probe attempt in a fresh subprocess; (ok, waited_s).

    CRITICAL: never kill the probe — killing a process mid-TPU-claim is
    itself what wedges the tunnel for the next claimer.  If the probe
    doesn't finish in time we abandon it (it keeps running and exits
    cleanly whenever the device frees up).
    """
    import subprocess
    import sys
    import time

    t0 = time.monotonic()
    proc = subprocess.Popen(
        [sys.executable, "-c", _PROBE_SRC],
        stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL,
    )
    deadline = t0 + timeout_s
    while time.monotonic() < deadline:
        rc = proc.poll()
        if rc is not None:
            out = proc.stdout.read() if proc.stdout else b""
            return rc == 0 and b"6.0" in out, time.monotonic() - t0
        time.sleep(2.0)
    return False, time.monotonic() - t0  # abandoned, NOT killed


def _tpu_alive(attempts: int | None = None,
               timeout_s: float | None = None) -> dict:
    """Probe the TPU with N sequential fresh-subprocess attempts.

    The round-4 driver artifact recorded a CPU fallback because ONE probe
    happened to straddle an unavailable-TPU window (BENCH_r04.json:
    tpu_probe_failed) — a single-shot probe makes the headline artifact a
    coin flip on tunnel health.  Retries matter because the failure modes
    are transient and per-process: device CLAIMS take 2-5 minutes when any
    process used the chip recently (measured 127 s / 292 s), and a wedged
    tunnel hangs the PROCESS that hit it, not necessarily the next fresh
    claimer.  Each attempt is a new subprocess; timed-out probes are
    abandoned, never killed (see _probe_once).

    Budget is env-tunable: TPU3DRECON_BENCH_PROBE_ATTEMPTS (default 3) x
    TPU3DRECON_BENCH_PROBE_TIMEOUT_S (default 600 each).  Returns
    {"ok", "attempts", "wait_s"} so callers can record probe provenance
    in the benchmark JSON.
    """
    import os

    if attempts is None:
        attempts = int(os.environ.get("TPU3DRECON_BENCH_PROBE_ATTEMPTS", "3"))
    if timeout_s is None:
        timeout_s = float(
            os.environ.get("TPU3DRECON_BENCH_PROBE_TIMEOUT_S", "600")
        )
    waited = 0.0
    for i in range(1, max(attempts, 1) + 1):
        ok, w = _probe_once(timeout_s)
        waited += w
        if ok:
            return {"ok": True, "attempts": i, "wait_s": round(waited, 1)}
        print(
            f"bench: TPU probe attempt {i}/{attempts} failed after "
            f"{w:.0f}s (abandoned, not killed); "
            + ("retrying with a fresh claim..." if i < attempts
               else "falling back to CPU."),
            file=sys.stderr,
        )
    return {"ok": False, "attempts": attempts, "wait_s": round(waited, 1)}


def emit_headline(force_cpu: bool = False, cg: int | None = None,
                  repin: bool = False, probe: bool = True) -> None:
    import jax

    from tpu3drecon.utils.aot_cache import entry_count as aot_entry_count
    from tpu3drecon.utils.compile_cache import cache_entry_count, enable_compilation_cache

    tpu_fell_back = False
    probe_info = None
    if not force_cpu and probe:
        probe_info = _tpu_alive()
        if not probe_info["ok"]:
            tpu_fell_back = True
            force_cpu = True
            print(
                "bench: FALLING BACK TO CPU — the TPU never answered "
                f"{probe_info['attempts']} probe attempts over "
                f"{probe_info['wait_s']:.0f}s (tunnel wedged or device "
                "claimed elsewhere).  The emitted number is the CPU "
                "baseline, NOT a TPU measurement.",
                file=sys.stderr,
            )
    if force_cpu:
        jax.config.update("jax_platforms", "cpu")
    cache_entries_before = cache_entry_count()
    aot_entries_before = aot_entry_count()
    enable_compilation_cache()

    from tpu3drecon.benchmark.medium_config import (
        BENCH_CONFIG,
        build_grid_problem,
        build_problem,
        timed_solve_stats,
    )
    from tpu3drecon.solvers.bundle_adjust import make_ba_solver, reprojection_rmse

    # --cg N overrides the CG budget on BOTH sides (dynamic operand: the
    # TPU solver reuses the cg=8 executable).  The headline stays cg=8;
    # this exists so speed-mode claims (cg=5) carry a same-config CPU
    # baseline instead of borrowing the cg=8 one.
    cfg = BENCH_CONFIG if cg is None else BENCH_CONFIG._replace(cg_maxiter=cg)

    # TPU reps are cheap (~0.16 s each); CPU ones cost ~6 s — 5 vs 2 reps
    # keeps the TPU median meaningful against its ±10% session drift without
    # making the CPU baseline run interminable.
    reps = 2 if force_cpu else 5
    fallback_reason = None
    engine = "wtt"
    if force_cpu:
        engine = "flat"  # device engines target TPU; CPU baseline = flat XLA
    if engine == "wtt":
        # The windowed track-table engine with BOTH index kernels (Pallas
        # matvec + fused contribution linearize) — measured 0.1333 s vs the
        # tt engine's 0.1413 in interleaved A/B at this exact config
        # (experiments/tpu_bench_wtt.py, RESULTS.md round 4b).  At 100
        # cameras the window covers the whole camera range, so wtt is
        # tt-with-windows and the kernels' one-hot byte elimination is the
        # entire difference.
        try:
            from tpu3drecon.problems.wtt import wtt_from_flat
            from tpu3drecon.solvers.ba_wtt import make_wtt_ba_solver
            from tpu3drecon.utils.placement import commit

            flat_host = build_problem(on_host=True)
            # Fully indexed (both kernels): the dense one-hot is never
            # read, so it is never materialized (defer_onehot).
            problem = commit(wtt_from_flat(flat_host, defer_onehot=True))
            solver = make_wtt_ba_solver(
                cfg._replace(matvec_kernel="index", linearize_kernel="index"),
                aot=True,
            )
            compile_s, times, (cams, pts, state) = timed_solve_stats(
                solver, problem, repeats=reps
            )
        except Exception:
            import traceback

            print("bench: wtt engine failed, falling back to tt:",
                  file=sys.stderr)
            traceback.print_exc()
            fallback_reason = traceback.format_exc().strip().splitlines()[-1]
            engine = "tt"
    if engine == "tt":
        try:
            from tpu3drecon.problems.tt import tt_from_flat
            from tpu3drecon.solvers.ba_tt import make_tt_ba_solver

            flat_host = build_problem(on_host=True)
            from tpu3drecon.utils.placement import commit

            problem = commit(tt_from_flat(flat_host))
            # AOT executable cache: later processes skip XLA compilation
            # entirely (the jax persistent cache never hits on this TPU
            # plugin — RESULTS.md round 2).  kernels=False: since the
            # batched (diagonal-slice) linearization landed, the plain XLA
            # path beats the Pallas fused-linearization kernels in
            # interleaved A/B (best 0.1443 vs 0.1497, median 0.1499 vs
            # 0.1572 — experiments/tpu_tt_fused.py, RESULTS.md round 3);
            # the fused paths stay available via make_tt_ba_solver(kernels=).
            solver = make_tt_ba_solver(cfg, aot=True)
            compile_s, times, (cams, pts, state) = timed_solve_stats(
                solver, problem, repeats=reps
            )
        except Exception:
            import traceback

            print("bench: tt engine failed, falling back to pallas:",
                  file=sys.stderr)
            traceback.print_exc()
            fallback_reason = traceback.format_exc().strip().splitlines()[-1]
            engine = "pallas"
    if engine == "pallas":
        try:
            from tpu3drecon.solvers.ba_pallas import make_pallas_ba_solver

            problem = build_grid_problem()
            solver = make_pallas_ba_solver(cfg)
            compile_s, times, (cams, pts, state) = timed_solve_stats(
                solver, problem, repeats=reps
            )
        except Exception:
            import traceback

            print("bench: pallas engine failed, falling back to flat:",
                  file=sys.stderr)
            traceback.print_exc()
            fallback_reason = traceback.format_exc().strip().splitlines()[-1]
            engine = "flat"
    if engine == "flat":
        problem = build_problem()
        solver = make_ba_solver(cfg)
        compile_s, times, (cams, pts, state) = timed_solve_stats(
            solver, problem, repeats=reps
        )
    times = sorted(times)
    run_s = times[len(times) // 2] if len(times) % 2 else 0.5 * (
        times[len(times) // 2 - 1] + times[len(times) // 2]
    )

    eval_problem = (
        build_problem(on_host=not force_cpu)
        if engine in ("wtt", "tt", "pallas")
        else problem
    )
    rmse = float(jax.device_get(reprojection_rmse(eval_problem, cams, pts)))

    # In-band CPU baseline bookkeeping: --cpu records its measurement; the
    # headline run warns when the pinned constant has drifted >20% from the
    # latest recorded measurement on this host.
    import pathlib

    baseline_file = pathlib.Path(__file__).parent / ".bench_cpu_baseline.json"
    cpu_baseline_drift = None
    if force_cpu and not tpu_fell_back and cg is None:
        import datetime
        import os

        record = {
            "cpu_s": round(run_s, 4),
            "recorded": datetime.date.today().isoformat(),
            "loadavg_1m": round(os.getloadavg()[0], 2),
            "min_s": round(times[0], 4),
            "max_s": round(times[-1], 4),
        }
        baseline_file.write_text(json.dumps(record))
        if repin:
            drift = abs(times[0] - CPU_BASELINE_S) / CPU_BASELINE_S
            print(
                f"bench --repin: CPU re-measured min {times[0]:.4f} s "
                f"(pin {CPU_BASELINE_S}, drift {drift:.1%}, loadavg "
                f"{record['loadavg_1m']}); recorded to {baseline_file.name}."
                + (" Update CPU_BASELINE_S + RESULTS.md if the host was idle."
                   if drift > 0.2 else " Pin stands."),
                file=sys.stderr,
            )
    elif baseline_file.exists():
        measured = json.loads(baseline_file.read_text()).get("cpu_s")
        if measured:
            drift = abs(measured - CPU_BASELINE_S) / CPU_BASELINE_S
            if drift > 0.2:
                cpu_baseline_drift = round(drift, 3)

    result = {
        "metric": "ba_medium_100cam_100kpt_30lm_iters",
        "value": round(run_s, 4),
        "unit": "s",
        "vs_baseline": round(CPU_BASELINE_S / run_s, 2),
        "extra": {
            "median_s": round(run_s, 4),
            "min_s": round(times[0], 4),
            "max_s": round(times[-1], 4),
            "reps": len(times),
            "compile_s": round(compile_s, 2),
            "reproj_rmse_px": float(f"{rmse:.3e}"),
            "accepted_steps": int(jax.device_get(state.accepted)),
            "engine": engine,
            "n_obs": 200704,
            "backend": jax.default_backend(),
            "cpu_baseline_s": CPU_BASELINE_S,
            "cpu_pin_recorded": CPU_PIN_RECORDED,
            "cpu_pin_host_state": CPU_PIN_HOST_STATE,
            "tpu_probe_failed": tpu_fell_back,
            "probe_attempts": probe_info["attempts"] if probe_info else 0,
            "probe_wait_s": probe_info["wait_s"] if probe_info else 0.0,
            # compile_s <= ~5s together with warm_aot_cache=True demonstrates
            # the persistent AOT executable cache (utils/aot_cache.py; cold
            # process pays the full XLA compile once per config+shape).
            "warm_cache": cache_entries_before > 0,
            "warm_aot_cache": aot_entries_before > 0,
        },
    }
    if cg is not None:
        result["extra"]["cg_maxiter"] = cg
    if cpu_baseline_drift is not None:
        result["extra"]["cpu_baseline_drift_warning"] = cpu_baseline_drift
    if fallback_reason is not None:
        result["extra"]["engine_fallback_reason"] = fallback_reason
    print(json.dumps(result))


def main(force_cpu: bool = False, cg: int | None = None) -> None:
    """Back-compat alias for the plain driver contract."""
    emit_headline(force_cpu=force_cpu, cg=cg)


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser(
        description="Headline benchmark (one JSON line); --suite runs every "
        "BASELINE.md config (one JSON line each)."
    )
    ap.add_argument("--cpu", action="store_true", help="force the CPU backend")
    ap.add_argument("--cg", type=int, default=None, metavar="N",
                    help="override the CG budget on both sides (headline is 8)")
    ap.add_argument("--repin", action="store_true",
                    help="re-measure the CPU baseline (implies --cpu) and "
                    "record date/load provenance to .bench_cpu_baseline.json")
    ap.add_argument("--suite", action="store_true",
                    help="run all five BASELINE.md configs (PnP parity, "
                    "small BA, medium BA, 500-frame tracking, BAL s/LM-iter)")
    args = ap.parse_args()

    if args.suite:
        import jax

        if args.cpu or not _tpu_alive()["ok"]:
            jax.config.update("jax_platforms", "cpu")
        from tpu3drecon.benchmark.suite import run_suite

        # Backend already pinned above; the delegated headline must not
        # re-probe (its probe subprocess would race the suite's device use).
        run_suite(force_cpu=jax.default_backend() == "cpu", cg=args.cg)
    else:
        emit_headline(
            force_cpu=args.cpu or args.repin, cg=args.cg, repin=args.repin
        )
