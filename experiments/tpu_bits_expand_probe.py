"""Probe Mosaic-supported in-kernel uint8 bit-expansion strategies.

The fully-fused tt engine streams bit-packed one-hots (uint8, 1/16th the
bf16 bytes) and expands them in VMEM.  The natural expansion
(stack bit planes, reshape minor axis) hits "unsupported shape cast" in
this Mosaic version; this probe checks which alternatives lower:

  A. pltpu.repeat(wide, 8, axis=1) then variable right-shift by lane%8
     (keeps the byte-interleaved packing: bit j of byte k = slot 8k+j)
  B. per-tile bit-plane concat: 8 shifted planes concatenated on the lane
     axis (needs the packer to emit bit-plane-within-tile order)

Run: cd /root/repo && python experiments/tpu_bits_expand_probe.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    print("backend:", jax.default_backend(), flush=True)
    C, NB = 100, 1024

    def kernel_a(packed_ref, out_ref):
        wide = packed_ref[:, :].astype(jnp.int32)  # (C, NB//8)
        rep = pltpu.repeat(wide, 8, axis=1)  # (C, NB): lane m -> byte m//8
        shift = jax.lax.broadcasted_iota(jnp.int32, rep.shape, 1) % 8
        out_ref[:, :] = ((rep >> shift) & 1).astype(jnp.float32)

    def kernel_b(packed_ref, out_ref):
        wide = packed_ref[:, :].astype(jnp.int32)  # (C, NB//8)
        planes = [((wide >> j) & 1).astype(jnp.float32) for j in range(8)]
        out_ref[:, :] = jnp.concatenate(planes, axis=1)

    rng = np.random.default_rng(0)
    packed = rng.integers(0, 256, size=(C, NB // 8), dtype=np.uint8)

    for name, kernel in [("A repeat+shift", kernel_a), ("B concat-planes", kernel_b)]:
        try:
            out = pl.pallas_call(
                kernel,
                in_specs=[pl.BlockSpec((C, NB // 8), lambda: (0, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((C, NB), lambda: (0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((C, NB), jnp.float32),
            )(packed)
            got = np.asarray(jax.device_get(out))
            if name.startswith("A"):
                want = ((packed[:, np.arange(NB) // 8]
                         >> (np.arange(NB) % 8)) & 1).astype(np.float32)
            else:
                want = np.concatenate(
                    [((packed >> j) & 1).astype(np.float32) for j in range(8)],
                    axis=1,
                )
            ok = np.array_equal(got, want)
            print(f"{name}: compiled, correct={ok}", flush=True)
        except Exception as e:  # noqa: BLE001
            msg = str(e).split("\n")[0][:160]
            print(f"{name}: FAILED — {type(e).__name__}: {msg}", flush=True)


if __name__ == "__main__":
    main()
