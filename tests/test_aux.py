"""Auxiliary subsystems: profiling helpers, native-library fallback paths,
checkpoint npz fallback, compiled() wrapper."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import sparse_tpu as sparse


def test_profiling_benchmark_and_throughput():
    from sparse_tpu.profiling import benchmark, nnz_throughput

    f = jax.jit(lambda x: x * 2)
    x = jnp.ones((128,))
    dt = benchmark(f, (x,), iters=3)
    assert dt > 0
    assert nnz_throughput(dt, 1000) == 1000 / dt


def test_profiling_benchmark_scan_methodology():
    """benchmark() times inside one scan with per-iteration perturbation of
    every float leaf (hoist-proof) and subtracts the calibrated RTT."""
    from sparse_tpu.profiling import benchmark, _default_perturb

    # the default perturbation touches float leaves and leaves ints alone
    args = (jnp.ones((4,), jnp.float32), jnp.arange(4, dtype=jnp.int32))
    bumped = _default_perturb(args, jnp.int32(3))
    np.testing.assert_allclose(np.asarray(bumped[0]), 1.0 + 3e-6)
    assert bumped[1].dtype == jnp.int32
    np.testing.assert_array_equal(np.asarray(bumped[1]), np.arange(4))

    # gather workload (the LICM-prone shape): must time, not crash, and the
    # perturb must reach the gather TABLE (a float leaf)
    table = jnp.ones((64, 8), jnp.float32)
    idx = jnp.zeros((16,), jnp.int32)
    dt = benchmark(lambda t, i: jnp.take(t, i, axis=0), (table, idx), iters=3)
    assert dt > 0

    # perturb=None still runs (explicitly opting out of hoist-proofing)
    dt2 = benchmark(lambda t, i: jnp.take(t, i, axis=0), (table, idx), iters=3, perturb=None)
    assert dt2 > 0

    # pytree (tuple) outputs are supported
    dt3 = benchmark(lambda x: (x * 2, x + 1), (jnp.ones((8,)),), iters=2)
    assert dt3 > 0


def test_compiled_wrapper():
    from sparse_tpu import compiled
    from sparse_tpu.kernels import coo_spmm

    a = sparse.random((10, 8), density=0.3, random_state=0)

    @compiled
    def f(a, b):
        return coo_spmm(jnp.asarray(a.coords[0]), jnp.asarray(a.coords[1]), jnp.asarray(a.data), b, n_rows=a.shape[0])

    b = jnp.asarray(np.random.default_rng(1).random((8, 3)))
    np.testing.assert_allclose(np.asarray(f(a, b)), a.todense() @ np.asarray(b))


def test_native_radix_path():
    # force the radix fallback (keys too wide for packing)
    from sparse_tpu.native import argsort_i64, get_lib

    if get_lib() is None:
        pytest.skip("native lib unavailable")
    rng = np.random.default_rng(0)
    n = 1 << 17
    keys = rng.integers(0, 1 << 62, n)  # 62-bit keys + 17 idx bits > 63 -> radix
    perm = argsort_i64(keys)
    np.testing.assert_array_equal(perm, np.argsort(keys, kind="stable"))


def test_native_dedup_nonfloat_fallback():
    from sparse_tpu.native import dedup_sum_sorted

    keys = np.array([0, 0, 1, 2, 2, 2], dtype=np.int64)
    vals = np.array([1, 2, 3, 4, 5, 6], dtype=np.int32)  # non-f64 -> numpy path
    starts, sums = dedup_sum_sorted(keys, vals)
    np.testing.assert_array_equal(starts, [0, 2, 3])
    np.testing.assert_array_equal(sums, [3, 3, 15])


def test_checkpoint_npz_fallback(tmp_path, monkeypatch):
    import sparse_tpu.checkpoint as ck
    from sparse_tpu.parallel import partition_coo_rows

    a = sparse.random((40, 30), density=0.2, random_state=0)
    pcoo = partition_coo_rows(a, 4)

    # simulate orbax being unavailable
    import builtins

    real_import = builtins.__import__

    def fake_import(name, *args, **kwargs):
        if name.startswith("orbax"):
            raise ImportError("no orbax")
        return real_import(name, *args, **kwargs)

    monkeypatch.setattr(builtins, "__import__", fake_import)
    ck.save_partitioned(str(tmp_path / "np"), pcoo)
    restored = ck.load_partitioned(str(tmp_path / "np"))
    np.testing.assert_allclose(np.asarray(restored.data), np.asarray(pcoo.data))


def test_trace_context(tmp_path):
    from sparse_tpu.profiling import trace

    with trace(str(tmp_path / "tr")) as d:
        _ = jnp.ones(8).sum()
    import os

    assert os.path.isdir(d)


def test_pickle_roundtrip():
    import pickle

    for fmt in ("coo", "gcxs", "dok"):
        s = sparse.random((6, 7), density=0.3, random_state=1, format=fmt)
        s2 = pickle.loads(pickle.dumps(s))
        np.testing.assert_allclose(s2.todense(), s.todense())
        assert type(s2) is type(s)


def test_copy_deepcopy():
    import copy

    s = sparse.random((5, 5), density=0.4, random_state=2)
    c = copy.deepcopy(s)
    np.testing.assert_allclose(c.todense(), s.todense())
    assert c.coords is not s.coords


def test_jax_export_serving_roundtrip():
    # serving artifact: export a sparse-attention step to a portable
    # StableHLO blob and run the deserialized function
    import jax.numpy as jnp
    from jax import export

    from sparse_tpu.nn import banded_attention

    q = jnp.asarray(np.random.default_rng(0).standard_normal((64, 16)).astype(np.float32))
    fn = lambda q, k, v: banded_attention(q, k, v, window=8, block=16, causal=True)
    exp = export.export(jax.jit(fn))(q, q, q)
    re = export.deserialize(exp.serialize())
    np.testing.assert_allclose(np.asarray(re.call(q, q, q)), np.asarray(fn(q, q, q)), atol=1e-6)


def test_jax_export_spmm_pytree():
    import jax.numpy as jnp
    from jax import export

    from sparse_tpu import jitops

    a = sparse.random((40, 30), density=0.2, random_state=0)
    b = jnp.asarray(np.random.default_rng(1).random((30, 4)))
    fn = jax.jit(jitops.spmm)
    exp = export.export(fn)(a, b)
    re = export.deserialize(exp.serialize())
    np.testing.assert_allclose(np.asarray(re.call(a, b)), a.todense() @ np.asarray(b), rtol=1e-10)
