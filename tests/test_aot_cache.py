"""Persistent AOT executable cache (utils/aot_cache.py).

Correctness on the CPU backend; the cross-process TPU proof lives in
experiments/tpu_aot_cache.py (recorded in RESULTS.md round 3).
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpu3drecon.utils import aot_cache


@pytest.fixture
def cache_dir(tmp_path, monkeypatch):
    # conftest sets TPU3DRECON_AOT_CACHE_DISABLE for the whole suite; these
    # tests exercise the cache itself in an isolated tmp dir.
    monkeypatch.delenv("TPU3DRECON_AOT_CACHE_DISABLE", raising=False)
    return tmp_path / "aot"


def test_miss_then_hit_same_results(cache_dir):
    @jax.jit
    def f(x, y):
        return jnp.sin(x) @ y + 1.0

    x = jnp.full((64, 64), 0.5)
    y = jnp.full((64, 64), 2.0)
    expected = np.asarray(f(x, y))

    assert aot_cache.entry_count(cache_dir) == 0
    c1 = aot_cache.cached_compile(f, x, y, cache_dir=cache_dir)
    np.testing.assert_allclose(np.asarray(c1(x, y)), expected, rtol=1e-6)
    stored = aot_cache.entry_count(cache_dir)

    c2 = aot_cache.cached_compile(f, x, y, cache_dir=cache_dir)
    np.testing.assert_allclose(np.asarray(c2(x, y)), expected, rtol=1e-6)
    assert aot_cache.entry_count(cache_dir) == stored
    if stored == 0:
        pytest.skip("backend does not support executable serialization")


def test_size_cap_skips_store_and_load(cache_dir, monkeypatch):
    """Entries above TPU3DRECON_AOT_MAX_BYTES are neither stored nor
    reloaded: measured on the axon TPU plugin, first execution of a large
    (>100 MB) deserialized executable re-pays the whole server-side
    compile or aborts the backend, so large programs must recompile."""
    @jax.jit
    def f(x):
        return x @ x + 1.0

    x = jnp.full((64, 64), 0.5)
    expected = np.asarray(f(x))

    # Cap below any real payload -> store is skipped.
    monkeypatch.setenv("TPU3DRECON_AOT_MAX_BYTES", "10")
    c1 = aot_cache.cached_compile(f, x, cache_dir=cache_dir)
    np.testing.assert_allclose(np.asarray(c1(x)), expected, rtol=1e-6)
    assert aot_cache.entry_count(cache_dir) == 0

    # Store normally, then shrink the cap -> load is skipped (recompile),
    # and the oversized entry is left in place for higher-cap processes.
    monkeypatch.setenv("TPU3DRECON_AOT_MAX_BYTES", str(64_000_000))
    aot_cache.cached_compile(f, x, cache_dir=cache_dir)
    stored = aot_cache.entry_count(cache_dir)
    if stored == 0:
        pytest.skip("backend does not support executable serialization")
    monkeypatch.setenv("TPU3DRECON_AOT_MAX_BYTES", "10")
    c3 = aot_cache.cached_compile(f, x, cache_dir=cache_dir)
    np.testing.assert_allclose(np.asarray(c3(x)), expected, rtol=1e-6)
    assert aot_cache.entry_count(cache_dir) == stored


def test_fingerprint_sensitive_to_shape_and_code(cache_dir):
    @jax.jit
    def f(x):
        return x * 2.0

    @jax.jit
    def g(x):
        return x * 3.0

    a = jnp.ones((32, 32))
    b = jnp.ones((64, 32))
    k_fa = aot_cache.lowered_fingerprint(f.lower(a))
    k_fb = aot_cache.lowered_fingerprint(f.lower(b))
    k_ga = aot_cache.lowered_fingerprint(g.lower(a))
    assert k_fa != k_fb  # shape changes the key
    assert k_fa != k_ga  # code changes the key
    assert k_fa == aot_cache.lowered_fingerprint(f.lower(a))  # deterministic


def test_semantic_key_hit_and_isolation(cache_dir):
    @jax.jit
    def f(x):
        return jnp.cos(x) * 2.0

    x = jnp.ones((32, 64))
    expected = np.asarray(f(x))

    c1 = aot_cache.cached_compile(f, x, cache_dir=cache_dir,
                                  semantic_key="semtest|v1")
    np.testing.assert_allclose(np.asarray(c1(x)), expected, rtol=1e-6)
    if aot_cache.entry_count(cache_dir) == 0:
        pytest.skip("backend does not support executable serialization")
    sems = list(cache_dir.glob("*.sem"))
    assert len(sems) == 1  # index written on the miss path

    # Same semantic key: hits via the index (no new entries).
    n_aot = len(list(cache_dir.glob("*.aot")))
    c2 = aot_cache.cached_compile(f, x, cache_dir=cache_dir,
                                  semantic_key="semtest|v1")
    np.testing.assert_allclose(np.asarray(c2(x)), expected, rtol=1e-6)
    assert len(list(cache_dir.glob("*.aot"))) == n_aot

    # A different semantic key for the same program: new index entry,
    # same executable store.
    aot_cache.cached_compile(f, x, cache_dir=cache_dir,
                             semantic_key="semtest|v2")
    assert len(list(cache_dir.glob("*.sem"))) == 2
    assert len(list(cache_dir.glob("*.aot"))) == n_aot

    # Different arg shape under the same key: distinct semantic entry.
    y = jnp.ones((16, 64))
    aot_cache.cached_compile(f, y, cache_dir=cache_dir,
                             semantic_key="semtest|v1")
    assert len(list(cache_dir.glob("*.sem"))) == 3


def test_semantic_signature_sees_static_treedef(cache_dir):
    # Static dataclass fields land in the treedef repr, so problems that
    # differ only in static metadata cannot collide on the semantic key.
    from tpu3drecon.problems.wtt import WTTBucket

    def bucket(window):
        return WTTBucket(
            uv=jnp.zeros((1, 2, 2, 4)), mask=jnp.zeros((1, 2, 4)),
            onehot=jnp.zeros((1, 8, 8)),
            cam_base=jnp.zeros((1,), jnp.int32), wcam=None, window=window,
        )

    s1 = aot_cache.semantic_fingerprint("k", (bucket(128),))
    s2 = aot_cache.semantic_fingerprint("k", (bucket(256),))
    assert s1 != s2


def test_cpu_entries_are_process_local(cache_dir, monkeypatch):
    # Cross-process XLA:CPU AOT loads segfault (module docstring); the
    # guard must treat another process's CPU entry as a miss.
    if jax.devices()[0].platform != "cpu":
        pytest.skip("CPU-backend guard")

    @jax.jit
    def f(x):
        return x * 4.0 + 1.0

    x = jnp.ones((8, 128))
    aot_cache.cached_compile(f, x, cache_dir=cache_dir)
    if aot_cache.entry_count(cache_dir) == 0:
        pytest.skip("backend does not support executable serialization")

    monkeypatch.setattr(aot_cache, "_PROC_TAG", "other-process")
    c = aot_cache.cached_compile(f, x, cache_dir=cache_dir)
    np.testing.assert_allclose(np.asarray(c(x)), 5.0)


def test_corrupt_entry_recompiles(cache_dir):
    @jax.jit
    def f(x):
        return jnp.tanh(x) + 1.0

    x = jnp.ones((16, 128))
    aot_cache.cached_compile(f, x, cache_dir=cache_dir)
    entries = list(cache_dir.glob("*.aot"))
    if not entries:
        pytest.skip("backend does not support executable serialization")
    entries[0].write_bytes(b"garbage")
    c = aot_cache.cached_compile(f, x, cache_dir=cache_dir)
    np.testing.assert_allclose(
        np.asarray(c(x)), np.tanh(np.ones((16, 128))) + 1.0, rtol=1e-6
    )


def test_disable_env(cache_dir, monkeypatch):
    monkeypatch.setenv("TPU3DRECON_AOT_CACHE_DISABLE", "1")

    @jax.jit
    def f(x):
        return x + 1.0

    x = jnp.ones((8, 128))
    c = aot_cache.cached_compile(f, x, cache_dir=cache_dir)
    np.testing.assert_allclose(np.asarray(c(x)), 2.0)
    assert aot_cache.entry_count(cache_dir) == 0


def test_aot_wrap_solver(cache_dir):
    # End-to-end through a real solver factory: aot=True must produce the
    # same solve as the plain path.
    from tpu3drecon.dataset.synthetic import (
        make_scene,
        perturb_scene,
        scene_to_ba_problem,
    )
    from tpu3drecon.problems.tt import tt_from_flat
    from tpu3drecon.solvers.ba_tt import make_tt_ba_solver
    from tpu3drecon.solvers.bundle_adjust import BAConfig

    os.environ["TPU3DRECON_AOT_CACHE_DIR"] = str(cache_dir)
    try:
        scene = make_scene(n_cameras=6, n_points=128, seed=5)
        noisy = perturb_scene(scene, seed=6, point2d_noise=0.0)
        flat, _ = scene_to_ba_problem(noisy, observed=scene, dtype=jnp.float64)
        tt = tt_from_flat(flat, point_block=64)
        config = BAConfig(maxiter=3, gtol=0.0, ftol=0.0, cg_maxiter=10,
                          cg_rtol=1e-8)
        cams_p, pts_p, st_p = make_tt_ba_solver(config)(tt)
        cams_a, pts_a, st_a = make_tt_ba_solver(config, aot=True)(tt)
        assert int(st_a.accepted) == int(st_p.accepted)
        np.testing.assert_allclose(np.array(pts_a), np.array(pts_p), atol=1e-12)
    finally:
        os.environ.pop("TPU3DRECON_AOT_CACHE_DIR", None)
