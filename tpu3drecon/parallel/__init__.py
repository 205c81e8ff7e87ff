"""Parallelism layer: meshes, sharded solvers, multi-host init."""

from tpu3drecon.parallel.distributed import (
    global_obs_mesh,
    initialize_distributed,
    process_local_obs_slice,
)
from tpu3drecon.parallel.mesh import (
    OBS_AXIS,
    make_mesh,
    obs_sharding,
    replicated_sharding,
    shard_ba_problem,
)
from tpu3drecon.parallel.sharded_ba import ba_solve_sharded, make_sharded_ba_solver
from tpu3drecon.parallel.sharded_pose import refine_poses_sharded, shard_pose_problem
