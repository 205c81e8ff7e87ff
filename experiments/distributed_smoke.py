"""Two-process jax.distributed smoke test on the CPU backend.

Launch: python experiments/distributed_smoke.py        (spawns both workers)
Worker: python experiments/distributed_smoke.py worker <pid> <nproc> <addr>

Exercises parallel/distributed.py's initialize_distributed +
global_obs_mesh + process_local_obs_slice for real (VERDICT round-1 item 9:
that code path had never executed).  Each process contributes one CPU
device; a psum across the 2-process mesh must see both contributions.
"""

import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def worker(pid: int, nproc: int, addr: str) -> None:
    # Must run before any jax computation: pin CPU platform first.
    import jax

    jax.config.update("jax_platforms", "cpu")

    from tpu3drecon.parallel.distributed import (
        global_obs_mesh,
        initialize_distributed,
        process_local_obs_slice,
    )

    initialize_distributed(
        coordinator_address=addr, num_processes=nproc, process_id=pid
    )
    assert jax.process_count() == nproc, jax.process_count()
    assert jax.process_index() == pid

    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = global_obs_mesh()
    assert mesh.devices.size == nproc  # one CPU device per process

    # Host-sharded input: each process materializes only its obs slice.
    n_obs = 64
    sl = process_local_obs_slice(n_obs)
    local = jnp.arange(sl.start, sl.stop, dtype=jnp.float32)
    arr = jax.make_array_from_single_device_arrays(
        (n_obs,),
        NamedSharding(mesh, P("obs")),
        [jax.device_put(local, jax.local_devices()[0])],
    )

    @jax.jit
    def total(x):
        return x.sum()

    got = float(jax.device_get(total(arr)))
    want = n_obs * (n_obs - 1) / 2.0
    assert got == want, (got, want)
    if pid == 0:
        print(
            f"distributed smoke ok: {nproc} processes, "
            f"{mesh.devices.size}-device global mesh, psum={got}",
            flush=True,
        )


def main() -> None:
    addr = "127.0.0.1:56789"
    nproc = 2
    env = dict(os.environ)
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "worker", str(pid), str(nproc), addr],
            env=env,
        )
        for pid in range(nproc)
    ]
    rcs = [p.wait(timeout=600) for p in procs]
    assert rcs == [0, 0], rcs
    print("both workers exited 0")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "worker":
        worker(int(sys.argv[2]), int(sys.argv[3]), sys.argv[4])
    else:
        main()
