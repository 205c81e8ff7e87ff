"""Why is the SAME einsum 220x slower on the transferred one-hot?

tpu_window_ops.py measured einsum(tw, onehot) at 1.8 s with the problem's
one-hot but 8 ms with a random array of identical shape/dtype/density.
Hypothesis: HOW an array gets to the device determines its usable layout
on the axon remote TPU — device_put of a CPU-**jax** array (the packing
scripts build under jax.default_device(cpu)) lands in a degenerate
storage that every consumer pays for, while numpy->device transfers land
native.  Measure one pure-read reduction over the same values shipped
four ways.

  python experiments/tpu_transfer_hygiene.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from tpu3drecon.utils.timing import device_sync

    rng = np.random.default_rng(0)
    shape = (7, 256, 137216)
    host = (rng.random(shape) < 0.004).astype(np.float32)

    def bench(name, arr):
        def fn(a):
            def body(acc, _):
                return acc + jnp.sum(a * a), None

            s, _ = jax.lax.scan(body, jnp.float32(0), None, length=10)
            return s

        jfn = jax.jit(fn)
        out = jfn(arr)
        device_sync(out)
        t0 = time.time()
        out = jfn(arr)
        device_sync(out)
        print(json.dumps({
            "case": name,
            "per_read_ms": round((time.time() - t0) / 10 * 1e3, 2),
        }), flush=True)

    # 1. numpy -> device_put (the clean path).
    a1 = jax.device_put(host)
    bench("numpy_device_put", a1)

    # 2. CPU jax array -> device_put (what the packing scripts do).
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        a_cpu = jnp.asarray(host)
    a2 = jax.device_put(a_cpu)
    bench("cpujax_device_put", a2)

    # 3. jit-identity rematerialization of (2).
    a3 = jax.jit(lambda x: x * jnp.float32(1.0))(a2)
    bench("cpujax_then_jit_identity", a3)

    # 4. device_put of the device_get round trip of (2).
    a4 = jax.device_put(np.asarray(jax.device_get(a2)))
    bench("cpujax_roundtrip_numpy", a4)


if __name__ == "__main__":
    main()
