"""Micro-chunk-granularity window simulation: the real sub-bucketing lever.

wtt_window_stats.py showed GROUP-level narrowing is worthless (0.99x):
groups merge ~133 micro-chunks, so they genuinely span 256 rows.  This
script re-simulates the packing at MICRO-chunk (512-point) granularity
from the cached problems' wcam tables:

  - per 512-column micro-chunk: its own 128-aligned base, local window
    class (128-padded span), and has-global flag;
  - for the hub problem additionally a point RE-SORT by
    (has_global, min_local_cam) so hub-observing points cluster and the
    majority of chunks can skip the 2x128 global tiles entirely;
  - groups = runs of equal (base, class, has_g) with the existing
    _choose_cap padding policy (<=12.5% waste), because padded columns
    pay selection MACs too.

Reports the selection-MAC ratio (new/current), which the rate model
(1.68e12 window-row-slots/s, RESULTS.md round-4b roofline) maps directly
onto ~79% of the 52 ms BAL marginal / ~91% of the hub's 106 ms.

Run: cd /root/repo && python experiments/wtt_window_stats2.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PC = 512


def simulate(problem, name: str, resort_hub: bool) -> None:
    import numpy as np

    from tpu3drecon.problems.wtt import _choose_cap

    print(f"\n=== {name} (resort_hub={resort_hub}) ===", flush=True)
    tot_cur = 0.0
    tot_new = 0.0
    for bi, b in enumerate(problem.buckets):
        wcam = np.asarray(b.wcam)  # (G, n)
        g, n = wcam.shape
        tb = b.uv.shape[2]
        n_gt = b.global_tiles
        wl = b.window - 128 * n_gt
        base = np.asarray(b.cam_base)[:, None]  # (G, 1)
        pc_eff = n // tb
        # Recover per-column (point) camera lists in GLOBAL ids.
        wc = wcam.reshape(g, tb, pc_eff)
        local_cam = np.where((wc >= 0) & (wc < wl), wc + base[:, None], -1)
        has_g_slot = wc >= wl
        # flatten points: (G * pc_eff) columns, each with tb rows
        local_cam = np.transpose(local_cam, (0, 2, 1)).reshape(-1, tb)
        has_gp = np.transpose(has_g_slot, (0, 2, 1)).reshape(-1, tb).any(axis=1)
        real = (local_cam >= 0).any(axis=1) | has_gp
        local_cam = local_cam[real]
        has_gp = has_gp[real]
        minc = np.where(
            (local_cam >= 0).any(axis=1),
            np.where(local_cam >= 0, local_cam, 10**9).min(axis=1),
            10**9,
        )
        maxc = local_cam.max(axis=1)
        if resort_hub and n_gt:
            order = np.lexsort((minc, has_gp))
            minc, maxc, has_gp = minc[order], maxc[order], has_gp[order]
        npts = minc.size
        nchunks = (npts + PC - 1) // PC
        keys = []  # (base, wclass, has_g) per chunk
        for ci in range(nchunks):
            sl = slice(ci * PC, (ci + 1) * PC)
            mn, mx = minc[sl], maxc[sl]
            has_local = (mn < 10**9).any()
            if has_local:
                cb = (int(mn.min()) // 128) * 128
                wcls = ((int(mx.max()) - cb + 1) + 127) // 128 * 128
            else:
                cb, wcls = 0, 0
            keys.append((cb, wcls, bool(has_gp[sl].any())))
        # runs of equal key -> _choose_cap per (wclass, has_g) class
        from collections import defaultdict

        runs_by_class = defaultdict(list)
        cur_key, cur_len = None, 0
        for k in keys + [None]:
            if k == cur_key:
                cur_len += 1
                continue
            if cur_key is not None:
                runs_by_class[cur_key[1:]].append(cur_len)
            cur_key, cur_len = k, 1
        new_mac = 0.0
        groups_desc = []
        for (wcls, hg), runs in sorted(runs_by_class.items()):
            cap = _choose_cap(runs)
            ngroups = sum((r + cap - 1) // cap for r in runs)
            rows = wcls + 128 * n_gt * hg
            new_mac += float(rows) * ngroups * tb * cap * PC
            groups_desc.append(
                f"W{wcls}{'+g' if hg else ''}:{ngroups}x{cap}"
            )
        cur = float(b.window) * g * n
        tot_cur += cur
        tot_new += new_mac
        print(
            f"bucket {bi}: Tb={tb} pts={npts} cur window={b.window} G={g} "
            f"-> {{{', '.join(groups_desc)}}}  MACs {new_mac / cur:.3f}x",
            flush=True,
        )
    print(f"TOTAL selection-MAC ratio new/current: {tot_new / tot_cur:.3f}",
          flush=True)


def main() -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    from tpu3drecon.benchmark.balscale import bal_hub_wtt, bal_sequential_wtt

    simulate(bal_sequential_wtt(), "BAL sequential", resort_hub=False)
    hub = bal_hub_wtt()
    simulate(hub, "BAL hub", resort_hub=False)
    simulate(hub, "BAL hub", resort_hub=True)


if __name__ == "__main__":
    main()
