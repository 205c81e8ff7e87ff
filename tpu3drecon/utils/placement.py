"""Device placement that avoids the remote-TPU cross-backend streaming trap.

MEASURED (experiments/tpu_transfer_hygiene.py, axon remote TPU): an array
that reaches the device via ``jax.device_put`` of a **CPU-backend jax
array** is readable only at ~0.5 GB/s — every consumer effectively
re-streams it from the host through the tunnel (316x slower than HBM) —
while the SAME bytes shipped as numpy (or rematerialized by a jitted
identity) read at full device bandwidth.  Host-side problem packing
(anything built under ``jax.default_device(cpu)``) hits this on every
array it hands to a solver.

``commit`` is the safe placement: numpy-round-trip any jax leaf that is
not already resident on the target platform, then ``device_put``.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np


def sharded_put(x: Any, sharding: Any) -> Any:
    """``jax.device_put`` onto a (Named)Sharding, round-tripping
    cross-platform jax leaves through numpy first (see module docstring:
    a CPU-jax array device_put onto the remote TPU is host-streamed on
    every read).  Host-side packers build arrays on whatever backend is
    default, so the sharded placement paths must not trust them."""
    if isinstance(x, jax.Array):
        src = {d.platform for d in getattr(x.sharding, "device_set", set())}
        tgt = {d.platform for d in sharding.device_set}
        if src and src != tgt:
            x = np.asarray(jax.device_get(x))
    return jax.device_put(x, sharding)


def commit(tree: Any, device: Optional[Any] = None) -> Any:
    """Place a pytree on ``device`` (default: the default jax device),
    round-tripping cross-platform jax leaves through numpy so they land as
    native device arrays instead of host-streamed views."""
    tgt = device if device is not None else jax.devices()[0]

    def put(x):
        if isinstance(x, jax.Array):
            devs = getattr(x.sharding, "device_set", None)
            if devs == {tgt}:
                return x
            x = np.asarray(jax.device_get(x))
        return jax.device_put(x, tgt)

    return jax.tree_util.tree_map(put, tree)
