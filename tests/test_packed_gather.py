"""complex64-packed gathers must be bit-exact vs plain indexing."""

import jax.numpy as jnp
import numpy as np

from tpu3drecon.ops.packed_gather import gather_rows_packed, pack_rows, unpack_rows


def test_pack_unpack_round_trip_even_and_odd(rng):
    for d in (2, 3, 6, 8, 9):
        x = jnp.asarray(rng.normal(size=(37, d)), jnp.float32)
        np.testing.assert_array_equal(np.asarray(unpack_rows(pack_rows(x), d)), np.asarray(x))


def test_gather_matches_plain_indexing(rng):
    for d in (2, 3, 8):
        src = jnp.asarray(rng.normal(size=(200, d)), jnp.float32)
        idx = jnp.asarray(rng.integers(0, 200, size=(50, 7)), jnp.int32)
        np.testing.assert_array_equal(
            np.asarray(gather_rows_packed(src, idx)), np.asarray(src[idx])
        )


def test_pallas_engine_packed_equals_unpacked():
    import jax

    from tpu3drecon.dataset.synthetic import make_scene, perturb_scene, scene_to_ba_problem
    from tpu3drecon.problems.grid import grid_bucketed_from_flat
    from tpu3drecon.solvers.ba_pallas import ba_solve_pallas
    from tpu3drecon.solvers.bundle_adjust import BAConfig

    scene = make_scene(n_cameras=6, n_points=200, seed=55)
    noisy = perturb_scene(scene, seed=56, point2d_noise=0.0)
    problem, _ = scene_to_ba_problem(noisy, observed=scene, dtype=jnp.float64)
    grid = grid_bucketed_from_flat(problem)
    base = dict(maxiter=8, gtol=1e-14, cg_maxiter=20, cg_rtol=1e-10)
    _, pts_p, st_p = ba_solve_pallas(
        grid, BAConfig(packed_gathers=True, **base), interpret=True
    )
    _, pts_u, st_u = ba_solve_pallas(
        grid, BAConfig(packed_gathers=False, **base), interpret=True
    )
    # Packing is a bitwise-identical data movement: identical trajectories.
    np.testing.assert_array_equal(np.asarray(pts_p), np.asarray(pts_u))
    assert int(st_p.accepted) == int(st_u.accepted)
