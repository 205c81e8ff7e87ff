"""Mosaic smoke test: pallas tt kernels with int8 one-hots on the real TPU.

Round 4 flipped the default one-hot storage dtype to int8.  The XLA
engines were measured end-to-end, but the opt-in pallas paths
(ops/pallas/tt_linearize.py) cast the dense one-hot tile inside the
kernel (`_expand_onehot`'s ``oh_raw.astype(acc_t)``), and Mosaic's cast
support is dtype-specific (uint8 -> float needed an int32 widening).
CPU-mesh tests run the interpret/XLA:CPU path and cannot catch a Mosaic
lowering failure, so this must execute on the TPU.

Run: cd /root/repo && python experiments/tpu_pallas_int8_smoke.py
"""

import sys

sys.path.insert(0, "/root/repo")


def main() -> None:
    import jax
    import jax.numpy as jnp

    from tpu3drecon.dataset.synthetic import (
        make_sequential_scene,
        perturb_scene,
        scene_to_ba_problem,
    )
    from tpu3drecon.problems.tt import tt_from_flat
    from tpu3drecon.solvers.ba_tt import ba_solve_tt
    from tpu3drecon.solvers.bundle_adjust import BAConfig

    print("backend:", jax.default_backend(), flush=True)
    # 16 cameras: the Pallas TPU block specs need the camera dim divisible
    # by 8 (12 cams fails lowering for bf16 and int8 alike).
    scene = make_sequential_scene(
        n_cameras=16, points_per_camera=40, track_span=3, seed=3
    )
    noisy = perturb_scene(scene, seed=4)
    flat, _ = scene_to_ba_problem(noisy, observed=scene, dtype=jnp.float32)
    config = BAConfig(maxiter=3, gtol=0.0, ftol=0.0, cg_maxiter=8, cg_rtol=0.0)

    for label, kwargs in (
        ("int8 default", {}),
        ("bf16 explicit", {"onehot_dtype": jnp.bfloat16}),
        ("bit-packed", {"onehot_dtype": "bits"}),
    ):
        pb = 1024 if kwargs.get("onehot_dtype") == "bits" else 64
        tt = tt_from_flat(flat, point_block=pb, **kwargs)
        for kernels in (True, "full"):
            if kwargs.get("onehot_dtype") == "bits" and kernels is True:
                continue  # bits requires the fully-fused engine
            try:
                _, _, st = ba_solve_tt(tt, config, kernels=kernels)
                loss = float(jax.device_get(st.loss))
                print(f"{label} / kernels={kernels}: OK loss {loss:.6e}",
                      flush=True)
            except Exception as e:
                print(f"{label} / kernels={kernels}: FAILED "
                      f"{type(e).__name__}: {str(e)[:300]}", flush=True)


if __name__ == "__main__":
    main()
