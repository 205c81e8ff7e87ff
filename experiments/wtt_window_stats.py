"""Window-class statistics of the packed wtt problems: the sub-bucketing lever.

The fully-indexed engine is no longer HBM-bound (RESULTS.md round-4b
roofline: floor 13% of the 52 ms marginal); the binding resource is the
one-hot selection MAC passes, whose count is sum over groups of
window_rows x slot_columns.  problems/wtt.py gives every group of a
track-length bucket the bucket-MAX window, so one wide chunk inflates
everyone.  This script measures, per bucket and per group, the window
each group actually NEEDS (128-aligned max local wcam + global tiles
only when a global slot exists) and reports the achievable MAC
reduction from sub-bucketing groups by (window class, needs-global).

Host-only (reads the cached problems' numpy leaves).

Run: cd /root/repo && python experiments/wtt_window_stats.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def stats(problem, name: str) -> None:
    import numpy as np

    print(f"\n=== {name} ===", flush=True)
    tot_cur = 0.0
    tot_need = 0.0
    for bi, b in enumerate(problem.buckets):
        wcam = np.asarray(b.wcam)  # (G, n)
        g, n = wcam.shape
        tb = b.uv.shape[2]
        n_gt = b.global_tiles
        wl = b.window - 128 * n_gt  # local rows
        local = np.where(wcam < wl, wcam, -1)  # -1 also for padding
        need_local = local.max(axis=1) + 1  # (G,)
        need_local = np.maximum(need_local, 0)
        need_local_pad = ((need_local + 127) // 128) * 128
        has_global = (wcam >= wl).any(axis=1)
        need_rows = need_local_pad + 128 * n_gt * has_global
        cur = float(b.window) * g * n
        need = float(need_rows.sum()) * n
        tot_cur += cur
        tot_need += need
        classes, counts = np.unique(
            np.stack([need_local_pad, has_global.astype(np.int64)]),
            axis=1, return_counts=True,
        )
        cls_str = ", ".join(
            f"W{int(w)}{'+g' if gl else ''}:{c}"
            for (w, gl), c in zip(classes.T, counts)
        )
        print(
            f"bucket {bi}: Tb={tb} G={g} n={n} window={b.window} "
            f"(local {wl} + {n_gt} gt) -> group classes {{{cls_str}}}  "
            f"MACs {need / cur:.3f}x",
            flush=True,
        )
    print(f"TOTAL selection-MAC ratio need/current: {tot_need / tot_cur:.3f}",
          flush=True)


def main() -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    from tpu3drecon.benchmark.balscale import bal_hub_wtt, bal_sequential_wtt

    stats(bal_sequential_wtt(), "BAL sequential (1712 cams)")
    stats(bal_hub_wtt(), "BAL hub (photo-tourism)")


if __name__ == "__main__":
    main()
