"""Command-line interface: solve / refine / bench / info.

The production entry point around the library (the reference drives
everything from notebooks; a deployable framework needs a CLI):

    python -m tpu3drecon info
    python -m tpu3drecon solve-bal problem.txt [-o solved.txt] [--engine pallas]
    python -m tpu3drecon solve-colmap sparse/ -o sparse_opt/ [--binary]
    python -m tpu3drecon bench [--cpu]
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def _split_windows_arg(value: str):
    """``--split-windows`` value: auto/on/off or a positive int class cap."""
    if value in ("auto", "on", "off"):
        return value
    try:
        cap = int(value)
    except ValueError:
        cap = 0
    if cap <= 0:
        raise argparse.ArgumentTypeError(
            f"expected auto, on, off, or a positive integer class cap "
            f"(got {value!r})"
        )
    return cap


def _add_common(p):
    p.add_argument("--cpu", action="store_true", help="force the CPU backend")
    p.add_argument("--f64", action="store_true", help="solve in float64")
    p.add_argument("--maxiter", type=int, default=50)
    p.add_argument("--cg-maxiter", type=int, default=30)
    p.add_argument(
        "--engine", choices=("flat", "grid", "pallas", "tt", "wtt"),
        default="flat",
        help="BA engine (tt = gather-free track table, the fastest "
        "single-chip path; wtt = windowed track table for BAL-scale "
        "camera counts on sequential captures; pallas = fused kernels)",
    )
    p.add_argument("--no-focal", action="store_true", help="freeze focal lengths")
    p.add_argument("--loss", choices=("trivial", "cauchy"), default="trivial")
    p.add_argument(
        "--precond",
        choices=("auto", "schur_jacobi", "ssor", "tridiag", "jacobi_u"),
        default="auto",
        help="CG preconditioner for the reduced camera system.  auto "
        "follows the measured TPU guidance (RESULTS.md round 3): "
        "block-SSOR for track-table engines at >=1000 cameras (~2x faster "
        "to any loss target on large sequential scenes), SCHUR_JACOBI "
        "otherwise",
    )
    p.add_argument(
        "--matvec",
        choices=("auto", "xla", "fused", "index", "index2", "index1"),
        default="auto",
        help="PCG coupling matvec implementation (wtt engine).  auto "
        "follows the measured TPU A/B (RESULTS.md round 4b): the "
        "index-encoded Pallas kernel ('index', f32-faithful split dots, "
        "BAL 0.159 -> 0.129 s/LM-iter) on TPU, the XLA two-pass path "
        "elsewhere; 'index2' drops the third bf16 split term "
        "(~1e-5 operator fidelity, ~1.1 ms/matvec cheaper) and "
        "'index1' is the fast single-pass bf16 mode (~2e-3 operator "
        "perturbation)",
    )
    p.add_argument(
        "--linearize", choices=("auto", "xla", "index", "index2"),
        default="auto",
        help="linearization contribution-reduction implementation (wtt "
        "engine).  auto follows the measured TPU A/B (RESULTS.md round "
        "4b): the fused Pallas contribution kernel ('index', f32-faithful "
        "split dots, BAL linearize 42 -> 18 ms, solve 0.123 -> 0.102 "
        "s/LM-iter with --matvec index; band-precond pair rows "
        "included) on TPU, the batched-XLA path elsewhere",
    )
    p.add_argument(
        "--split-windows", type=_split_windows_arg, default="auto",
        metavar="{auto,on,off,N}",
        help="micro-chunk window classes for the wtt packer "
        "(problems/wtt.py split_windows): narrower per-chunk windows cut "
        "the dominant one-hot selection passes (measured BAL marginals "
        "52.1 -> 37.9 ms/LM-iter sequential, 105.7 -> 62.6 hub — "
        "RESULTS.md round 4c) at the cost of more kernel variants to "
        "compile.  auto = on exactly when the solve runs the Pallas "
        "index kernels on TPU; the XLA einsum paths prefer few large "
        "batches, so off elsewhere.  An integer N > 0 sets the "
        "per-bucket window-class cap directly ('on' = 4): larger caps "
        "trade compile time for selection MACs — measured hub-BAL "
        "ladder 43.7 (cap 4, 48 s compile) -> 42.7 ms/LM-iter (cap 6, "
        "79 s) with <=5%% MAC headroom left at cap 12 "
        "(experiments/tpu_hub_cap_ladder.py)",
    )
    p.add_argument(
        "--checkpoint-dir", default=None,
        help="run the solve as resumable chunks with orbax checkpoints in "
        "this directory; a killed run re-invoked with the same directory "
        "resumes from the last completed chunk (utils/checkpoint.py)",
    )
    p.add_argument(
        "--checkpoint-every", type=int, default=10, metavar="N",
        help="outer LM iterations per checkpoint chunk (default 10)",
    )
    p.add_argument(
        "--aot", action="store_true",
        help="compile through the persistent AOT executable cache "
        "(utils/aot_cache.py): pays the full XLA compile once per "
        "config+shape, every later process deserializes in seconds — "
        "the fix for the minutes-long BAL-scale compile on the axon TPU "
        "plugin (tt/wtt engines)",
    )


def _setup_backend(args):
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    if getattr(args, "f64", False):
        # Without this a fresh process would silently downcast the f64
        # problem arrays to f32 (tests run under conftest's global x64).
        jax.config.update("jax_enable_x64", True)
    from tpu3drecon.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    return jax


def _config(args, n_cameras: int = 0):
    from tpu3drecon.geometry.losses import RobustLoss
    from tpu3drecon.solvers.bundle_adjust import BAConfig

    precond = getattr(args, "precond", "auto")
    if precond in ("ssor", "tridiag") and args.engine not in ("tt", "wtt"):
        print(
            f"[tpu3drecon] --precond {precond} requires --engine tt or wtt "
            "(band preconditioners need the track-table pair one-hots)",
            file=sys.stderr,
        )
        raise SystemExit(2)
    if precond == "auto":
        # Measured TPU guidance (RESULTS.md round 3): the band information
        # pays ~2x in time-to-target at BAL-scale camera counts, loses at
        # 100-256 cams; band preconditioners exist for the tt/wtt engines.
        if args.engine in ("tt", "wtt") and n_cameras >= 1000:
            precond = "ssor"
        else:
            precond = "schur_jacobi"
    import jax

    matvec = getattr(args, "matvec", "auto")
    if matvec != "auto" and matvec != "xla" and args.engine != "wtt":
        print(
            f"[tpu3drecon] --matvec {matvec} applies to --engine wtt only",
            file=sys.stderr,
        )
        raise SystemExit(2)
    if matvec == "auto":
        # Measured TPU A/B (RESULTS.md round 4b): the index kernel is
        # f32-faithful and 19% faster at BAL scale; off-TPU it would run
        # in slow Pallas interpret mode, so keep the XLA path there.
        matvec = (
            "index"
            if args.engine == "wtt" and jax.default_backend() == "tpu"
            else "xla"
        )
    matvec_kernel = False if matvec == "xla" else matvec
    linearize = getattr(args, "linearize", "auto")
    if linearize not in ("auto", "xla") and args.engine != "wtt":
        print(
            f"[tpu3drecon] --linearize {linearize} applies to --engine "
            "wtt only",
            file=sys.stderr,
        )
        raise SystemExit(2)
    sw = getattr(args, "split_windows", "auto")
    if sw != "auto" and args.engine != "wtt":
        print(
            f"[tpu3drecon] --split-windows {sw} applies to --engine wtt "
            "only (micro-chunk window classes are a wtt packing concept)",
            file=sys.stderr,
        )
        raise SystemExit(2)
    if linearize == "auto":
        # Measured TPU A/B (RESULTS.md round 4b): the fused contribution
        # kernel is f32-faithful and cuts the BAL linearize 42 -> 18 ms
        # (band preconditioners included — the kernel emits their
        # adjacent-pair rows); off-TPU it would run in slow Pallas
        # interpret mode, so keep the XLA path there.
        linearize = (
            "index"
            if args.engine == "wtt" and jax.default_backend() == "tpu"
            else "xla"
        )
    return BAConfig(
        maxiter=args.maxiter,
        cg_maxiter=args.cg_maxiter,
        gtol=1e-10,
        cg_rtol=1e-6,
        optimize_focal=not args.no_focal,
        loss=RobustLoss.CAUCHY if args.loss == "cauchy" else RobustLoss.TRIVIAL,
        precond=precond,
        matvec_kernel=matvec_kernel,
        linearize_kernel=False if linearize == "xla" else linearize,
    )


def _solve(problem, args, jax):
    import jax.numpy as jnp

    from tpu3drecon.solvers.bundle_adjust import make_ba_solver, reprojection_rmse

    config = _config(args, n_cameras=int(problem.n_cameras))
    rmse0 = float(reprojection_rmse(problem, problem.cameras, problem.points3d))
    # Each engine branch yields (packed problem, solver factory by config);
    # the factories cache compiled executables by config, and iteration
    # bounds ride as dynamic operands — so the checkpointed chunked driver
    # below reuses ONE executable across chunks.
    if args.engine == "wtt":
        from tpu3drecon.problems.wtt import wtt_from_flat
        from tpu3drecon.solvers.ba_wtt import make_wtt_ba_solver

        from tpu3drecon.utils.placement import commit

        sw = getattr(args, "split_windows", "auto")
        if sw == "auto":
            # Measured TPU A/B (experiments/tpu_split_windows.py, RESULTS.md
            # round 4c): micro-chunk window classes cut the index kernels'
            # dominant selection passes (BAL marginals 52.1 -> 37.9
            # ms/LM-iter sequential, 105.7 -> 62.6 hub) but are a
            # wash-to-loss for the XLA einsum paths, which want few large
            # batches — so split exactly when both kernels run.
            split = bool(config.matvec_kernel and config.linearize_kernel)
        elif isinstance(sw, int):
            split = sw  # explicit per-bucket window-class cap
        else:
            split = sw == "on"
        # Fully-indexed configs never read the dense one-hot: defer it so
        # it is never materialized (~1 GB HBM at BAL scale).
        fully_indexed = config.matvec_kernel in (
            "index", "index1", "index2"
        ) and config.linearize_kernel in ("index", "index2")
        try:
            packed = commit(wtt_from_flat(
                problem, split_windows=split, defer_onehot=fully_indexed,
            ))
        except ValueError as e:
            # Dislocal scene beyond even the hub/global split: the camera
            # windows exceed the one-hot memory budget.  Fall back to a
            # layout-agnostic engine rather than dying: the Pallas fused
            # bucketed-grid engine on TPU (the fastest dislocal path —
            # RESULTS.md), the plain grid engine elsewhere (Pallas would
            # run in slow interpret mode off-TPU).
            fallback = "pallas" if jax.default_backend() == "tpu" else "grid"
            precond_note = ""
            if config.precond in ("ssor", "tridiag"):
                # Band preconditioners are tt/wtt-only (they need the
                # track-table pair one-hots).
                precond_note = (
                    f"; band preconditioner {config.precond!r} replaced "
                    "with schur_jacobi (ssor/tridiag are tt/wtt-only)"
                )
                config = config._replace(precond="schur_jacobi")
            if config.matvec_kernel:
                # The coupling matvec kernels are wtt-only.
                precond_note += (
                    f"; matvec kernel {config.matvec_kernel!r} replaced "
                    "with the XLA matvec (kernels are wtt-only)"
                )
                config = config._replace(matvec_kernel=False)
            if config.linearize_kernel:
                # The fused contribution kernel is wtt-only.
                precond_note += (
                    f"; linearize kernel {config.linearize_kernel!r} "
                    "replaced with the batched-XLA linearization "
                    "(kernels are wtt-only)"
                )
                config = config._replace(linearize_kernel=False)
            print(
                f"[tpu3drecon] wtt layout infeasible ({e}); "
                f"falling back to the {fallback} engine{precond_note}",
                file=sys.stderr,
            )
            args.engine = fallback  # the summary line reports reality
        else:
            if config.precond in ("ssor", "tridiag") and any(
                b.global_tiles for b in packed.buckets
            ):
                # Hub/global split layout (dislocal scene): the band
                # preconditioners' pair one-hots don't cover hub couplings.
                print(
                    f"[tpu3drecon] hub/global camera split in effect; band "
                    f"preconditioner {config.precond!r} replaced with "
                    "schur_jacobi (ssor/tridiag need pure window locality)",
                    file=sys.stderr,
                )
                config = config._replace(precond="schur_jacobi")
            make_solver = lambda c: make_wtt_ba_solver(c, aot=args.aot)  # noqa: E731
    if args.engine == "pallas":
        from tpu3drecon.problems.grid import grid_bucketed_from_flat
        from tpu3drecon.solvers.ba_pallas import make_pallas_ba_solver

        from tpu3drecon.utils.placement import commit

        packed = commit(grid_bucketed_from_flat(problem))
        interpret = jax.default_backend() != "tpu"
        make_solver = lambda c: make_pallas_ba_solver(c, interpret=interpret)  # noqa: E731
    elif args.engine == "grid":
        from tpu3drecon.problems.grid import grid_from_flat
        from tpu3drecon.solvers.ba_grid import make_grid_ba_solver

        from tpu3drecon.utils.placement import commit

        packed = commit(grid_from_flat(problem))
        make_solver = make_grid_ba_solver
    elif args.engine == "tt":
        from tpu3drecon.problems.tt import tt_from_flat
        from tpu3drecon.solvers.ba_tt import make_tt_ba_solver

        from tpu3drecon.utils.placement import commit

        packed = commit(tt_from_flat(problem))
        make_solver = lambda c: make_tt_ba_solver(c, aot=args.aot)  # noqa: E731
    elif args.engine == "flat":
        packed = problem
        make_solver = make_ba_solver

    checkpoint_dir = getattr(args, "checkpoint_dir", None)
    if checkpoint_dir:
        from tpu3drecon.utils.checkpoint import ba_solve_checkpointed

        # Resumable chunked solve: a killed run restarts from the last
        # completed chunk (reference only checkpoints whole benchmark
        # pickles: src/benchmark/benchmark.py:46-70 — this exceeds it).
        t0 = time.perf_counter()
        cams, pts, state = ba_solve_checkpointed(
            packed, config, checkpoint_dir,
            chunk_iters=args.checkpoint_every,
            solver_fn=lambda p, c: make_solver(c)(p),
        )
        jax.block_until_ready(pts)
        solve_s = time.perf_counter() - t0
        compile_s = 0.0
        if state is None:
            print(
                f"[tpu3drecon] checkpoint at {checkpoint_dir} already covers "
                f"maxiter={config.maxiter}; returning checkpointed solution",
                file=sys.stderr,
            )
            rmse1 = float(reprojection_rmse(problem, cams, pts))
            print(
                f"[tpu3drecon] {args.engine} engine on "
                f"{jax.default_backend()}: RMSE {rmse0:.4f} -> {rmse1:.5f} px "
                "(resumed complete)",
                file=sys.stderr,
            )
            return cams, pts, state
    else:
        solver = make_solver(config)
        run = lambda: solver(packed)  # noqa: E731
        t0 = time.perf_counter()
        cams, pts, state = run()
        jax.block_until_ready(pts)
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        cams, pts, state = run()
        jax.block_until_ready(pts)
        solve_s = time.perf_counter() - t0
    rmse1 = float(reprojection_rmse(problem, cams, pts))
    print(
        f"[tpu3drecon] {args.engine} engine on {jax.default_backend()}: "
        f"RMSE {rmse0:.4f} -> {rmse1:.5f} px, "
        f"{int(state.accepted)}/{int(state.iter_num)} iters accepted, "
        f"solve {solve_s:.2f}s (compile {compile_s:.1f}s)",
        file=sys.stderr,
    )
    return cams, pts, state


def cmd_solve_bal(args):
    jax = _setup_backend(args)
    import jax.numpy as jnp

    from tpu3drecon.io.bal import ba_problem_from_bal, export_bal

    dtype = jnp.float64 if args.f64 else jnp.float32
    problem, meta = ba_problem_from_bal(args.input, dtype=dtype)
    print(
        f"[tpu3drecon] loaded {args.input}: {problem.n_cameras} cams / "
        f"{problem.n_points} pts / {meta.n_real_obs} obs",
        file=sys.stderr,
    )
    cams, pts, state = _solve(problem, args, jax)
    if args.output:
        export_bal(args.output, problem, cams, pts)
        print(f"[tpu3drecon] wrote {args.output}", file=sys.stderr)
    return 0


def cmd_solve_colmap(args):
    jax = _setup_backend(args)
    import numpy as np
    import jax.numpy as jnp

    from tpu3drecon.io import colmap as cio
    from tpu3drecon.problems.packing import ba_problem_from_colmap

    model = cio.read_model(args.input)
    dtype = jnp.float64 if args.f64 else jnp.float32
    problem, meta = ba_problem_from_colmap(model, dtype=dtype)
    print(
        f"[tpu3drecon] loaded {args.input}: {problem.n_cameras} cams / "
        f"{problem.n_points} pts / {meta.n_real_obs} obs",
        file=sys.stderr,
    )
    cams, pts, state = _solve(problem, args, jax)
    if args.output:
        from tpu3drecon.problems.packing import colmap_model_with_solution

        solved = colmap_model_with_solution(model, cams, pts, meta)
        cio.write_model(solved, args.output, binary=args.binary)
        print(f"[tpu3drecon] wrote {args.output}", file=sys.stderr)
    return 0


def cmd_bench(args):
    import subprocess

    cmd = [sys.executable, "bench.py"] + (["--cpu"] if args.cpu else [])
    return subprocess.call(cmd)


def cmd_info(args):
    import jax

    import tpu3drecon
    from tpu3drecon.io.colmap import native

    devs = jax.devices()
    print(json.dumps({
        "version": getattr(tpu3drecon, "__version__", "0.2"),
        "backend": jax.default_backend(),
        "devices": [str(d) for d in devs],
        "native_io": native.load_library() is not None,
        "engines": ["flat (implicit Schur)", "grid (scatter-free)",
                    "pallas (fused kernels)", "tt (gather-free track table)",
                    "wtt (windowed track table, BAL-scale)",
                    "sharded_grid (multi-chip)", "sharded_tt (multi-chip)"],
    }, indent=2))
    return 0


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="tpu3drecon")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("solve-bal", help="bundle-adjust a BAL problem file")
    p.add_argument("input")
    p.add_argument("-o", "--output", default=None, help="write solved BAL file")
    _add_common(p)
    p.set_defaults(fn=cmd_solve_bal)

    p = sub.add_parser("solve-colmap", help="bundle-adjust a COLMAP sparse model")
    p.add_argument("input")
    p.add_argument("-o", "--output", default=None, help="write solved sparse model")
    p.add_argument("--binary", action="store_true", help="write .bin (default .txt)")
    _add_common(p)
    p.set_defaults(fn=cmd_solve_colmap)

    p = sub.add_parser("bench", help="run the headline benchmark")
    p.add_argument("--cpu", action="store_true")
    p.set_defaults(fn=cmd_bench)

    p = sub.add_parser("info", help="backend + capability report")
    p.set_defaults(fn=cmd_info)

    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
