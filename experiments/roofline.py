"""HBM-bandwidth roofline accounting for the track-table engines.

Round-4 verdict item 3: convert "43x the CPU pin" into an absolute claim a
TPU engineer can audit.  Bundle adjustment's Schur solve is bandwidth-bound
(the repo's measured rate model: per-row transport and one-hot streams, not
FLOPs), so the roofline resource is HBM bytes per LM iteration.

The model below counts the MINIMUM bytes each phase must move, from the
real packed problem shapes: every input array read the number of times the
algorithm consumes it, plus every materialized large intermediate (dot
operands are materialized by XLA; elementwise chains in between are assumed
perfectly fused — so this is a LOWER bound on traffic and the resulting
time is the physical floor).  Compute (MXU) time for the one-hot matmuls
is reported alongside to show it is not the binding resource.

Per LM iteration (trust_region_solve body): 1 linearization + 1 rhs build +
cg_maxiter Schur matvecs + 1 back-substitution + 1 candidate cost eval.

Run host-side: python experiments/roofline.py  (no TPU needed; prints the
RESULTS.md table).
"""

import sys

sys.path.insert(0, "/root/repo")

HBM_GBPS = 819.0  # TPU v5e HBM bandwidth (public spec)
MXU_TFLOPS_F32HIGH = 49.0  # ~bf16 peak/4: f32-highest splits operands


def wtt_model(problem, cg_iters=8, np_cam=8):
    """Itemized bytes/LM-iter for solvers/ba_wtt.py (schur_jacobi path)."""
    items = {}
    f32 = 4

    def add(name, nbytes):
        items[name] = items.get(name, 0) + nbytes

    flops = 0.0
    n_triu = np_cam * (np_cam + 1) // 2
    for b in problem.buckets:
        g, _, tb, pc = b.uv.shape
        S = g * tb * pc  # slot columns
        P = g * pc  # point columns
        W = b.window
        # one-hot bytes: deferred problems carry onehot=None and expand to
        # the int8 default (problems/wtt.py expand_onehots).
        oh_itemsize = 1 if b.onehot is None else b.onehot.dtype.itemsize
        O = W * S * oh_itemsize

        # -- linearization --
        add("lin: one-hot read (cam planes)", O)
        add("lin: cam planes write+read", 2 * 19 * S * f32)
        add("lin: uv+mask read", 3 * S * f32)
        add("lin: jc/jp/r write", (2 * np_cam + 6 + 2) * S * f32)
        add("lin: jp/r read (V, g_pt)", (6 + 2 + 6 + 2) * S * f32)
        add("lin: v6/v_inv point planes", 3 * 6 * P * f32)
        # contribution planes: u(n_triu)+g(np)+coupling(n_triu), written
        # as a dot operand then read by the one-hot reduce; their inputs
        # jc/r/jp re-read once.
        k = 2 * n_triu + np_cam
        add("lin: jc/jp/r re-read (contribs)", (2 * np_cam + 2 + 6) * S * f32)
        add("lin: contrib planes write+read", 2 * k * S * f32)
        add("lin: one-hot read (contrib reduce)", O)
        flops += 2 * W * S * (19 + k)  # the two big one-hot matmuls

        # -- rhs b = W V^-1 g_pt - g_cam --
        add("rhs: jc/jp read", (2 * np_cam + 6) * S * f32)
        add("rhs: one-hot read", O)
        flops += 2 * W * S * np_cam

        # -- CG: cg_iters matvecs, each W^T x then W y --
        per_mv = (
            2 * O  # one-hot read in gather (W^T x) and reduce (W y)
            + 2 * (2 * np_cam + 6) * S * f32  # jc+jp read in both halves
            + 2 * np_cam * S * f32  # xg planes write+read (dot output)
        )
        add("cg: matvec streams", cg_iters * per_mv)
        flops += cg_iters * 2 * 2 * W * S * np_cam

        # -- back-substitution dp = V^-1(-g - W^T dc) --
        add("backsub: one-hot + jc/jp read", O + (2 * np_cam + 6) * S * f32)
        flops += 2 * W * S * np_cam

        # -- candidate cost --
        add("cost: one-hot read (cam planes)", O)
        add("cost: cam planes write+read", 2 * 19 * S * f32)
        add("cost: uv+mask read", 3 * S * f32)
        flops += 2 * W * S * 19
    return items, flops


MXU_TFLOPS_BF16 = 197.0  # v5e bf16 peak (public spec)


def wtt_indexed_model(problem, cg_iters=8, np_cam=8, terms=3):
    """Bytes + MXU passes for the FULLY-INDEXED engine (round 4b): every
    one-hot consumer is a Pallas kernel reading ``wcam`` (2 B/slot) and
    rebuilding one-hot tiles in VMEM; contribution planes and the cost's
    cam planes never touch HBM.  The selection dots cost
    ``terms x W x S x 128`` lane-padded MACs each (measured ~1.1 ms per
    term per dot at BAL scale — the MXU, not HBM, is the binding
    resource for the dots now)."""
    items = {}
    f32 = 4

    def add(name, nbytes):
        items[name] = items.get(name, 0) + nbytes

    mxu_flops = 0.0
    n_triu = np_cam * (np_cam + 1) // 2
    for b in problem.buckets:
        g, _, tb, pc = b.uv.shape
        S = g * tb * pc
        P = g * pc
        W = b.window
        wc = 2 * S  # int16 wcam read per kernel launch

        def dot_flops(n_dots):
            # selection units: (window-row x slot) per term pass
            return n_dots * terms * W * S

        # -- linearization --
        add("lin: wcam reads (cam planes + contrib)", 2 * wc)
        add("lin: cam planes write+read", 2 * 19 * S * f32)
        add("lin: uv+mask read", 3 * S * f32)
        add("lin: jc/jp/r write", (2 * np_cam + 6 + 2) * S * f32)
        add("lin: jp/r read (V, g_pt)", (6 + 2 + 6 + 2) * S * f32)
        add("lin: v6/v_inv point planes", 3 * 6 * P * f32)
        add("lin: jc/jp/r re-read (contrib kernel)",
            (2 * np_cam + 2 + 6) * S * f32)
        mxu_flops += dot_flops(2)  # cam-plane selection + contrib reduce

        # -- rhs --
        add("rhs: wcam + jc/jp read", wc + (2 * np_cam + 6) * S * f32)
        mxu_flops += dot_flops(1)

        # -- CG matvecs (single-pass kernel: wcam + jc/jp read once) --
        add("cg: matvec streams",
            cg_iters * (wc + (2 * np_cam + 6) * S * f32))
        mxu_flops += cg_iters * dot_flops(2)

        # -- back-substitution --
        add("backsub: wcam + jc/jp read", wc + (2 * np_cam + 6) * S * f32)
        mxu_flops += dot_flops(1)

        # -- candidate cost (fused kernel: no cam-plane round trip) --
        add("cost: wcam + pts + uv + mask read",
            wc + (3 * P + 3 * S) * f32)
        mxu_flops += dot_flops(1)
    return items, mxu_flops


# Measured selection-pass rate: the index matvec kernel runs 2 dots x 3
# terms over (W=256, S=4.26M) in 3.9 ms (experiments/tpu_index_matvec3.py)
# -> 0.65 ms per dot-term-pass = 1.68e12 (window-row x slot) units/s.
# The 128-lane-padded spec model (terms x W x S x 128 MACs at bf16 peak)
# OVERPREDICTS by ~2x (measured beats it — partial-lane dots don't pay the
# full pad), so this empirical rate is the honest attribution basis.
SELECT_UNITS_PER_S = 256 * 4_259_840 * 6 / 3.9e-3  # 1.68e12 units/s


def report_indexed(tag, items, select_units, measured_s_per_iter):
    total = sum(items.values())
    t_hbm = total / (HBM_GBPS * 1e9)
    t_sel = select_units / SELECT_UNITS_PER_S
    print(f"\n== {tag} ==")
    for k, v in sorted(items.items(), key=lambda kv: -kv[1]):
        print(f"  {k:44s} {v/1e9:8.3f} GB")
    print(f"  {'TOTAL bytes/LM-iter':44s} {total/1e9:8.3f} GB")
    print(f"  HBM floor {t_hbm*1e3:.1f} ms ({100*t_hbm/measured_s_per_iter:.0f}% "
          f"of measured) — the engine is NOT bandwidth-bound any more;")
    print(f"  selection passes (measured-rate model) {t_sel*1e3:.1f} ms = "
          f"{100*t_sel/measured_s_per_iter:.0f}% of the measured "
          f"{measured_s_per_iter*1e3:.1f} ms/LM-iter marginal")
    print("  -> remaining levers: fewer split terms (index2/index1) or "
          "narrower windows; byte elimination is done.")
    return total, t_sel


def tt_model(problem, cg_iters=8, np_cam=8):
    """Same accounting for the dense track table (solvers/ba_tt.py): the
    one-hot is (C, S) instead of per-chunk windows; plane math identical."""

    class _B:
        pass

    fake = _B()
    buckets = []
    for b in problem.buckets:
        tb, pb = b.mask.shape
        nb = _B()
        nb.uv = type("A", (), {"shape": (1, 2, tb, pb)})()
        nb.window = b.onehot.shape[0]  # C (dense one-hot rows)
        nb.onehot = b.onehot
        buckets.append(nb)
    fake.buckets = buckets
    return wtt_model(fake, cg_iters, np_cam)


def report(tag, items, flops, measured_s_per_iter):
    total = sum(items.values())
    t_hbm = total / (HBM_GBPS * 1e9)
    t_mxu = flops / (MXU_TFLOPS_F32HIGH * 1e12)
    print(f"\n== {tag} ==")
    for k, v in sorted(items.items(), key=lambda kv: -kv[1]):
        print(f"  {k:44s} {v/1e9:8.3f} GB")
    print(f"  {'TOTAL bytes/LM-iter':44s} {total/1e9:8.3f} GB")
    print(f"  model floor: HBM {t_hbm*1e3:.1f} ms + MXU {t_mxu*1e3:.2f} ms "
          f"(not additive; max = {max(t_hbm, t_mxu)*1e3:.1f} ms)")
    print(f"  measured: {measured_s_per_iter*1e3:.1f} ms/LM-iter -> "
          f"{100*max(t_hbm, t_mxu)/measured_s_per_iter:.0f}% of the "
          "bandwidth roofline")
    return total, t_hbm


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")

    from tpu3drecon.benchmark.balscale import bal_sequential_wtt
    from tpu3drecon.benchmark.medium_config import build_problem
    from tpu3drecon.problems.tt import tt_from_flat

    # Medium bench problem, tt engine: 0.1365 s / 30 LM iters (round 4).
    flat = build_problem(on_host=True)
    tt = tt_from_flat(flat)
    items, flops = tt_model(tt, cg_iters=8)
    report("tt engine, medium bench (100 cams / 200k obs)", items, flops,
           0.1365 / 30)

    # BAL sequential, wtt engine: 0.1141 s/LM-iter (round-4 int8 one-hots,
    # interleaved with the hub run below; bf16 measured 0.1481 same config).
    seq = bal_sequential_wtt(verbose=False)
    items, flops = wtt_model(seq, cg_iters=8)
    report("wtt engine, BAL sequential (1712 cams / 3.8M obs)", items,
           flops, 0.1141)

    # BAL hub (round 4, int8 one-hots): 0.2168 s/LM-iter (bf16: 0.2657).
    from tpu3drecon.benchmark.balscale import bal_hub_wtt

    hub = bal_hub_wtt(verbose=False)
    items, flops = wtt_model(hub, cg_iters=8)
    report("wtt engine, BAL hub split (1712 cams / 3.96M obs)", items,
           flops, 0.2168)

    # Fully-indexed engine (round 4b): measured MARGINAL rates
    # (tpu_index2_ladder.py 52.0 ms seq / tpu_hub_kernels.py 106.1 hub).
    items, mxu = wtt_indexed_model(seq, cg_iters=8)
    report_indexed(
        "wtt FULLY INDEXED, BAL sequential (marginal rate)", items, mxu,
        0.0520,
    )
    items, mxu = wtt_indexed_model(hub, cg_iters=8)
    report_indexed(
        "wtt FULLY INDEXED, BAL hub split (marginal rate)", items, mxu,
        0.1061,
    )


if __name__ == "__main__":
    main()
