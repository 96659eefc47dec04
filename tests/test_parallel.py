"""Distributed layer tests on the 8-virtual-device CPU mesh (the fake
cluster of SURVEY §4): sharded runs must match single-device runs."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

import sparse_tpu as sparse
from sparse_tpu.parallel import (
    bucket_columns,
    make_mesh,
    mttkrp_sharded,
    partition_coo_rows,
    spmm_replicated,
    spmm_ring,
)

N_DEV = 8


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= N_DEV
    return make_mesh(N_DEV)


@pytest.mark.parametrize("shape,density", [((1000, 800), 0.01), ((257, 130), 0.05), ((64, 64), 0.1)])
def test_spmm_replicated(mesh, shape, density):
    a = sparse.random(shape, density=density, random_state=0)
    b = np.random.default_rng(1).random((shape[1], 16))
    expected = a.todense() @ b
    pcoo = partition_coo_rows(a, N_DEV, mesh=mesh)
    out = spmm_replicated(pcoo, jnp.asarray(b), mesh)
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-10)


def test_spmm_ring(mesh):
    a = sparse.random((1000, 800), density=0.01, random_state=0)
    b = np.random.default_rng(1).random((800, 32))
    expected = a.todense() @ b
    pcoo = partition_coo_rows(a, N_DEV)
    bucketed = bucket_columns(pcoo, N_DEV)
    block_cols = bucketed[3]
    b_pad = np.zeros((N_DEV * block_cols, 32))
    b_pad[:800] = b
    b_sharded = jax.device_put(jnp.asarray(b_pad), NamedSharding(mesh, P("x", None)))
    out = spmm_ring(bucketed, (1000, 800), pcoo.block_rows, b_sharded, mesh)
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-10)


def test_partition_preserves_all_entries():
    a = sparse.random((100, 50), density=0.1, random_state=0)
    pcoo = partition_coo_rows(a, N_DEV)
    total = float(np.asarray(pcoo.data).sum())
    assert np.isclose(total, float(np.asarray(a.data).sum()))


def test_mttkrp_sharded(mesh):
    m = 64
    t = sparse.random((m, 10, 12), density=0.05, random_state=2)
    coords = np.asarray(t.coords)
    data = np.asarray(t.data)
    block_rows = -(-m // N_DEV)
    shard_of = coords[0] // block_rows
    cap = max(int(np.bincount(shard_of, minlength=N_DEV).max()), 1)
    ci = np.zeros((N_DEV, cap), dtype=np.int32)
    cj = np.zeros((N_DEV, cap), dtype=np.int32)
    ck = np.zeros((N_DEV, cap), dtype=np.int32)
    cv = np.zeros((N_DEV, cap), dtype=data.dtype)
    for s in range(N_DEV):
        sel = shard_of == s
        k = int(sel.sum())
        ci[s, :k] = coords[0][sel] - s * block_rows
        cj[s, :k] = coords[1][sel]
        ck[s, :k] = coords[2][sel]
        cv[s, :k] = data[sel]
    c = np.random.default_rng(3).random((10, 4))
    d = np.random.default_rng(4).random((12, 4))
    res = mttkrp_sharded(
        jnp.asarray(ci), jnp.asarray(cj), jnp.asarray(ck), jnp.asarray(cv), jnp.asarray(c), jnp.asarray(d), m, mesh
    )
    expected = np.einsum("ijk,jr,kr->ir", t.todense(), c, d)
    np.testing.assert_allclose(np.asarray(res), expected, rtol=1e-10)


def test_graft_entry_dryrun():
    import sys

    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out[0].shape == (8192, 128)
    ge.dryrun_multichip(4)


def test_spmm_nnz_balanced(mesh):
    # skewed matrix: most entries in the first rows
    rng = np.random.default_rng(5)
    n_skew = 5000
    rows = np.concatenate([rng.integers(0, 20, n_skew), rng.integers(20, 500, 500)])
    cols = np.concatenate([rng.integers(0, 300, n_skew), rng.integers(0, 300, 500)])
    data = rng.random(rows.size)
    a = sparse.COO(np.stack([rows, cols]), data, shape=(500, 300))
    b = rng.random((300, 8))
    expected = a.todense() @ b

    pcoo = partition_coo_rows(a, N_DEV, mesh=mesh, balance="nnz")
    # balanced: max shard population within 2x of mean
    counts = (np.asarray(pcoo.data) != 0).sum(axis=1)
    assert counts.max() <= 2.5 * counts.mean()
    out = spmm_replicated(pcoo, jnp.asarray(b), mesh)
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-10)


def test_nnz_balance_zipf_worst_case(mesh):
    """Evidence behind docs/scaling.md's >=70% weak-scaling efficiency claim:
    under a Zipf row-degree distribution (the adversarial case for row
    partitioning) the nnz-balanced partitioner's worst shard must stay within
    the provable bound  nnz/n + max_row_nnz  (a whole row can't be split),
    and the resulting compute efficiency (mean/max shard load) must beat 70%
    — while even-rows partitioning collapses on the same input."""
    rng = np.random.default_rng(42)
    M, K = 100_000, 2_000
    # Zipf(1.3) row ids: a few hub rows carry a large share of the entries
    raw = rng.zipf(1.3, size=400_000)
    rows = (raw[raw <= M] - 1).astype(np.int64)
    cols = rng.integers(0, K, size=rows.size)
    # dedup coordinates
    lin = np.unique(rows * K + cols)
    rows, cols = lin // K, lin % K
    data = rng.random(rows.size)
    a = sparse.COO(np.stack([rows, cols]), data, shape=(M, K))
    nnz = rows.size

    p_nnz = partition_coo_rows(a, N_DEV, balance="nnz")
    p_rows = partition_coo_rows(a, N_DEV, balance="rows")

    def shard_loads(p):
        return (np.asarray(p.data) != 0).sum(axis=1)

    loads = shard_loads(p_nnz)
    max_row_nnz = int(np.bincount(rows).max())
    assert loads.sum() == nnz
    # provable worst-case bound for quantile row splitting
    assert loads.max() <= nnz / N_DEV + max_row_nnz
    eff = loads.mean() / loads.max()
    assert eff >= 0.70, f"nnz-balanced efficiency {eff:.2f} < 0.70"
    # the even-rows split must be demonstrably worse on this input
    eff_rows = shard_loads(p_rows).mean() / shard_loads(p_rows).max()
    assert eff_rows < eff

    # and the sharded SpMM on the balanced partition stays correct
    b = rng.random((K, 4))
    expected = a.tocsr() @ b  # scipy oracle: todense() at this shape is 1.6 GB
    out = spmm_replicated(
        partition_coo_rows(a, N_DEV, mesh=mesh, balance="nnz"), jnp.asarray(b), mesh
    )
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-8)


def test_checkpoint_roundtrip(tmp_path, mesh):
    from sparse_tpu.checkpoint import load_partitioned, save_partitioned

    a = sparse.random((200, 100), density=0.05, random_state=9)
    pcoo = partition_coo_rows(a, N_DEV, mesh=mesh)
    save_partitioned(str(tmp_path / "ckpt"), pcoo)
    restored = load_partitioned(str(tmp_path / "ckpt"), mesh=mesh)
    assert restored.shape == pcoo.shape
    assert restored.block_rows == pcoo.block_rows
    np.testing.assert_array_equal(np.asarray(restored.rows), np.asarray(pcoo.rows))
    np.testing.assert_allclose(np.asarray(restored.data), np.asarray(pcoo.data))
    b = np.random.default_rng(1).random((100, 4))
    out = spmm_replicated(restored, jnp.asarray(b), mesh)
    np.testing.assert_allclose(np.asarray(out), a.todense() @ b, rtol=1e-10)


def test_spmm_2d_mesh():
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from sparse_tpu.parallel import spmm_2d

    devs = np.array(jax.devices()[:8]).reshape(2, 4)
    mesh2 = Mesh(devs, ("x", "y"))
    a = sparse.random((200, 100), density=0.05, random_state=0)
    b = np.random.default_rng(1).random((100, 16))
    # row-partition over x (2 shards), replicate over y
    pcoo = partition_coo_rows(a, 2)
    rows = jax.device_put(jnp.asarray(np.asarray(pcoo.rows)), NamedSharding(mesh2, P("x", None)))
    cols = jax.device_put(jnp.asarray(np.asarray(pcoo.cols)), NamedSharding(mesh2, P("x", None)))
    data = jax.device_put(jnp.asarray(np.asarray(pcoo.data)), NamedSharding(mesh2, P("x", None)))
    from sparse_tpu.parallel.sharding import PartitionedCOO

    pc = PartitionedCOO(rows, cols, data, pcoo.shape, pcoo.block_rows)
    bd = jax.device_put(jnp.asarray(b), NamedSharding(mesh2, P(None, "y")))
    out = spmm_2d(pc, bd, mesh2)
    np.testing.assert_allclose(np.asarray(out), a.todense() @ b, rtol=1e-10)


def test_spgemm_sharded(mesh):
    from sparse_tpu.parallel import assemble_spgemm_result, spgemm_sharded

    a = sparse.random((240, 60), density=0.05, random_state=0)
    b = sparse.random((60, 80), density=0.05, random_state=1)
    pcoo = partition_coo_rows(a, N_DEV, mesh=mesh)
    shard_out = spgemm_sharded(pcoo, b, mesh)
    res = assemble_spgemm_result(shard_out, pcoo, 80)
    expected = a.todense() @ b.todense()
    np.testing.assert_allclose(res.todense(), expected, rtol=1e-10)


def test_checkpoint_elastic_restore(tmp_path, mesh):
    # save on the 8-device mesh, restore onto a 4-device mesh (2 shards/device)
    from sparse_tpu.checkpoint import load_partitioned, save_partitioned

    a = sparse.random((160, 50), density=0.1, random_state=3)
    pcoo = partition_coo_rows(a, N_DEV, mesh=mesh)
    save_partitioned(str(tmp_path / "ck"), pcoo)
    mesh4 = make_mesh(4)
    restored = load_partitioned(str(tmp_path / "ck"), mesh=mesh4)
    b = np.random.default_rng(2).random((50, 4))
    out = spmm_replicated(restored, jnp.asarray(b), mesh4)
    np.testing.assert_allclose(np.asarray(out), a.todense() @ b, rtol=1e-10)


def test_sddmm_sharded(mesh):
    from sparse_tpu.parallel import sddmm_sharded

    s = sparse.random((200, 150), density=0.05, random_state=6)
    lhs = np.random.default_rng(1).random((200, 8))
    rhs = np.random.default_rng(2).random((8, 150))
    pcoo = partition_coo_rows(s, N_DEV, mesh=mesh)
    vals = np.asarray(sddmm_sharded(pcoo, lhs, rhs, mesh))
    # oracle per shard: data * (lhs @ rhs) at global coords
    full = lhs @ rhs
    rows = np.asarray(pcoo.rows)
    cols = np.asarray(pcoo.cols)
    data = np.asarray(pcoo.data)
    for sdx in range(N_DEV):
        grow = rows[sdx] + sdx * pcoo.block_rows
        expected = data[sdx] * full[np.minimum(grow, 199), cols[sdx]] * (data[sdx] != 0)
        np.testing.assert_allclose(vals[sdx] * (data[sdx] != 0), expected, rtol=1e-10)


def test_elemwise_partitioned():
    import jax.numpy as jnp
    from sparse_tpu.parallel import elemwise_partitioned, make_mesh, partition_coo_rows

    mesh = make_mesh(8)
    a = sparse.random((70, 40), density=0.15, random_state=1)
    b = sparse.random((70, 40), density=0.15, random_state=2)
    pa = partition_coo_rows(a, 8, mesh=mesh)
    pb = partition_coo_rows(b, 8, mesh=mesh)
    for func, ref in ((jnp.add, np.add), (jnp.multiply, np.multiply), (jnp.maximum, np.maximum)):
        out, nnz = elemwise_partitioned(func, pa, pb, mesh)
        dense = np.zeros(a.shape)
        r, c, d = np.asarray(out.rows), np.asarray(out.cols), np.asarray(out.data)
        n = np.asarray(nnz)
        for s in range(8):
            k = int(n[s])
            np.add.at(dense, (r[s][:k] + s * out.block_rows, c[s][:k]), d[s][:k])
        np.testing.assert_allclose(dense, ref(a.todense(), b.todense()), rtol=1e-12)


def test_elemwise_partitioned_rejects_bad_funcs_and_partitions():
    import jax.numpy as jnp
    from sparse_tpu.parallel import elemwise_partitioned, make_mesh, partition_coo_rows

    mesh = make_mesh(8)
    a = sparse.random((70, 40), density=0.15, random_state=1)
    b = sparse.random((70, 40), density=0.15, random_state=2)
    pa = partition_coo_rows(a, 8, mesh=mesh)
    pb = partition_coo_rows(b, 8, mesh=mesh)
    with pytest.raises(ValueError, match="func"):
        elemwise_partitioned(jnp.logaddexp, pa, pb, mesh)
    pb_nnz = partition_coo_rows(b, 8, mesh=mesh, balance="nnz")
    with pytest.raises(ValueError, match="partition"):
        elemwise_partitioned(jnp.add, pa, pb_nnz, mesh)


@pytest.mark.parametrize("balance", ["rows", "nnz"])
def test_sum_partitioned(balance):
    from sparse_tpu.parallel import make_mesh, partition_coo_rows, sum_partitioned

    mesh = make_mesh(8)
    a = sparse.random((70, 40), density=0.15, random_state=5)
    pa = partition_coo_rows(a, 8, mesh=mesh, balance=balance)
    np.testing.assert_allclose(sum_partitioned(pa, mesh, axis=1), a.todense().sum(axis=1), rtol=1e-12)
    np.testing.assert_allclose(sum_partitioned(pa, mesh, axis=0), a.todense().sum(axis=0), rtol=1e-12)
    np.testing.assert_allclose(sum_partitioned(pa, mesh), a.todense().sum(), rtol=1e-12)


def test_spmm_sharded_ell_matches_oracle():
    # scatter-free sharded SpMM (r4): one-hot MXU block kernel per shard
    from sparse_tpu.parallel import make_mesh, partition_spmm_ell, spmm_sharded_ell

    rng = np.random.default_rng(27)
    mesh = make_mesh(8)
    a = sparse.random((2100, 500), density=0.02, random_state=27)  # ragged over 8 shards
    a = sparse.COO(np.asarray(a.coords), np.asarray(a.data, np.float32), shape=a.shape)
    b = rng.random((500, 16)).astype(np.float32)
    er, ec, ed, br = partition_spmm_ell(a, 8)
    out = np.asarray(spmm_sharded_ell(er, ec, ed, jnp.asarray(b), 2100, mesh))
    np.testing.assert_allclose(out, a.todense() @ b, rtol=1e-4, atol=1e-5)


def test_spmm_sharded_ell_empty_shard():
    from sparse_tpu.parallel import make_mesh, partition_spmm_ell, spmm_sharded_ell

    mesh = make_mesh(8)
    d = np.zeros((2048, 64), dtype=np.float32)
    d[:10, :5] = np.random.default_rng(3).random((10, 5))  # later shards empty
    a = sparse.COO.from_numpy(d)
    b = np.random.default_rng(4).random((64, 4)).astype(np.float32)
    er, ec, ed, br = partition_spmm_ell(a, 8)
    out = np.asarray(spmm_sharded_ell(er, ec, ed, jnp.asarray(b), 2048, mesh))
    np.testing.assert_allclose(out, d @ b, rtol=1e-5, atol=1e-6)


def test_spmm_2d_ell_matches_oracle():
    from jax.sharding import Mesh
    from sparse_tpu.parallel import partition_spmm_ell, spmm_2d_ell

    devs = np.asarray(jax.devices()[:8]).reshape(4, 2)
    mesh = Mesh(devs, ("x", "y"))
    rng = np.random.default_rng(35)
    a = sparse.random((1000, 300), density=0.04, random_state=35)
    a = sparse.COO(np.asarray(a.coords), np.asarray(a.data, np.float32), shape=a.shape)
    b = rng.random((300, 16)).astype(np.float32)
    er, ec, ed, br = partition_spmm_ell(a, 4)
    out = np.asarray(spmm_2d_ell(er, ec, ed, 1000, jnp.asarray(b), mesh))
    np.testing.assert_allclose(out, a.todense() @ b, rtol=1e-4, atol=1e-5)


def test_spmm_ring_ell_matches_oracle():
    # scatter-free ring SpMM (r4): ELL bucket kernel + ppermute rotations
    from jax.sharding import NamedSharding, PartitionSpec as P
    from sparse_tpu.parallel import bucket_columns_ell, make_mesh, spmm_ring_ell

    rng = np.random.default_rng(33)
    mesh = make_mesh(8)
    m, k, n = 1100, 700, 8  # ragged over 8 shards/buckets
    a = sparse.random((m, k), density=0.03, random_state=33)
    a = sparse.COO(np.asarray(a.coords), np.asarray(a.data, np.float32), shape=a.shape)
    b = rng.random((k, n)).astype(np.float32)
    bucketed = bucket_columns_ell(a, 8)
    block_cols = bucketed[4]
    b_pad = np.zeros((8 * block_cols, n), dtype=np.float32)
    b_pad[:k] = b
    b_sh = jax.device_put(jnp.asarray(b_pad), NamedSharding(mesh, P("x", None)))
    out = np.asarray(spmm_ring_ell(bucketed, m, b_sh, mesh))
    np.testing.assert_allclose(out, a.todense() @ b, rtol=1e-4, atol=1e-5)


def test_spmm_ring_ell_rejects_bucket_ring_mismatch():
    # advisor r4 (low): the rotation assumes n_buckets == ring size; a
    # mismatch must raise, not silently read jnp.take-clamped buckets
    from jax.sharding import NamedSharding, PartitionSpec as P
    from sparse_tpu.parallel import bucket_columns_ell, make_mesh, spmm_ring_ell

    mesh = make_mesh(8)
    a = sparse.random((256, 256), density=0.05, random_state=7)
    a = sparse.COO(np.asarray(a.coords), np.asarray(a.data, np.float32), shape=a.shape)
    bucketed = bucket_columns_ell(a, 4)  # 4 buckets on an 8-device ring
    block_cols = bucketed[4]
    b_pad = np.zeros((4 * block_cols, 8), dtype=np.float32)
    b_sh = jax.device_put(jnp.asarray(b_pad), NamedSharding(mesh, P("x", None)))
    with pytest.raises(ValueError, match="n_buckets"):
        spmm_ring_ell(bucketed, 256, b_sh, mesh)


def test_mttkrp_sharded_ell_matches_oracle():
    from sparse_tpu.parallel import make_mesh, mttkrp_sharded_ell, partition_mttkrp_ell

    rng = np.random.default_rng(21)
    mesh = make_mesh(8)
    I, J, K, R = 2100, 40, 50, 8  # ragged over 8 shards
    lin = np.unique(rng.integers(0, I * J * K, 30000))
    ci = (lin // (J * K)).astype(np.int32)
    cj = ((lin // K) % J).astype(np.int32)
    ck = (lin % K).astype(np.int32)
    tv = rng.random(lin.size).astype(np.float32)
    C = rng.random((J, R)).astype(np.float32)
    D = rng.random((K, R)).astype(np.float32)
    er, ej, ek, ed, br = partition_mttkrp_ell(np.stack([ci, cj, ck]), tv, I, 8)
    out = np.asarray(mttkrp_sharded_ell(er, ej, ek, ed, C, D, I, br, mesh))
    dense = np.zeros((I, J, K))
    dense[ci, cj, ck] = tv
    np.testing.assert_allclose(out, np.einsum("ijk,jr,kr->ir", dense, C, D), atol=1e-3)


def test_mttkrp_sharded_ell_empty_shard():
    from sparse_tpu.parallel import make_mesh, mttkrp_sharded_ell, partition_mttkrp_ell

    mesh = make_mesh(8)
    # all entries in the first rows: later shards are empty
    rng = np.random.default_rng(22)
    I, J, K, R = 1024, 10, 12, 4
    n = 500
    ci = rng.integers(0, 100, n).astype(np.int32)
    cj = rng.integers(0, J, n).astype(np.int32)
    ck = rng.integers(0, K, n).astype(np.int32)
    lin = np.unique(ci.astype(np.int64) * J * K + cj * K + ck)
    ci, cj, ck = (lin // (J * K)).astype(np.int32), ((lin // K) % J).astype(np.int32), (lin % K).astype(np.int32)
    tv = rng.random(lin.size).astype(np.float32)
    C = rng.random((J, R)).astype(np.float32)
    D = rng.random((K, R)).astype(np.float32)
    er, ej, ek, ed, br = partition_mttkrp_ell(np.stack([ci, cj, ck]), tv, I, 8)
    out = np.asarray(mttkrp_sharded_ell(er, ej, ek, ed, C, D, I, br, mesh))
    dense = np.zeros((I, J, K))
    dense[ci, cj, ck] = tv
    np.testing.assert_allclose(out, np.einsum("ijk,jr,kr->ir", dense, C, D), atol=1e-4)


def test_random_partitioned_matches_global_law():
    # shard-direct generation must agree with global-sample-then-partition
    # in law: exact nnz, uniform coverage, and identical SpMM oracle result
    import numpy as np

    from sparse_tpu import parallel

    M, K, n_shards = 40, 24, 8
    mesh = parallel.make_mesh(8)
    p = parallel.random_partitioned((M, K), nnz=200, n_shards=n_shards, mesh=mesh, random_state=0)
    rows = np.asarray(p.rows)
    cols = np.asarray(p.cols)
    data = np.asarray(p.data)
    valid = data != 0
    assert int(valid.sum()) == 200
    # local rows in range, cols global
    for s in range(n_shards):
        v = valid[s]
        assert (rows[s][v] >= 0).all() and (rows[s][v] < p.block_rows).all()
        assert (cols[s][v] >= 0).all() and (cols[s][v] < K).all()
        # no duplicate cells within a shard
        lin = rows[s][v].astype(np.int64) * K + cols[s][v]
        assert len(np.unique(lin)) == v.sum()
    # SpMM against the densified oracle
    dense = np.zeros((M, K))
    for s in range(n_shards):
        v = valid[s]
        dense[rows[s][v] + s * p.block_rows, cols[s][v]] = data[s][v]
    b = np.random.default_rng(1).standard_normal((K, 3))
    out = parallel.spmm_replicated(p, b, mesh=mesh)
    np.testing.assert_allclose(np.asarray(out), dense @ b, rtol=1e-12)
    # density path + statistical sanity: mean count per shard ~ cells share
    p2 = parallel.random_partitioned((1000, 100), density=0.02, n_shards=8, random_state=2)
    total = int((np.asarray(p2.data) != 0).sum())
    assert total == round(1000 * 100 * 0.02)


def test_spmm_ring_hlo_overlap_tpu_aot():
    """The whole premise of the ring schedule is that the ppermute rotation
    overlaps the local contraction.  AOT-compile the ring step against a
    deviceless 8-chip TPU topology (v5e:2x4) and assert the scheduled
    module issues the rotation as an async ``collective-permute-start`` /
    ``-done`` pair with the local compute scheduled BETWEEN them — overlap
    by construction, not hope.  (The CPU-mesh compile keeps
    collective-permute synchronous, so only the TPU target can express
    this assertion.)"""
    try:
        from jax.experimental import topologies

        topo = topologies.get_topology_desc(platform="tpu", topology_name="v5e:2x4")
        devices = topo.devices
    except Exception as e:  # no libtpu / plugin in this environment
        pytest.skip(f"TPU topology unavailable: {e}")

    from jax.sharding import Mesh
    from sparse_tpu.parallel.sharding import _spmm_ring_fn

    mesh_t = Mesh(np.array(devices), ("x",))
    n_dev = len(devices)
    block_rows, n_buckets, bcap, block_cols, n = 16, n_dev, 32, 16, 8

    f = _spmm_ring_fn(mesh_t, "x", block_rows)
    sh_trip = NamedSharding(mesh_t, P("x", None, None))
    sh_dense = NamedSharding(mesh_t, P("x", None))
    args = (
        jax.ShapeDtypeStruct((n_dev, n_buckets, bcap), jnp.int32, sharding=sh_trip),
        jax.ShapeDtypeStruct((n_dev, n_buckets, bcap), jnp.int32, sharding=sh_trip),
        jax.ShapeDtypeStruct((n_dev, n_buckets, bcap), jnp.float32, sharding=sh_trip),
        jax.ShapeDtypeStruct((n_dev * block_cols, n), jnp.float32, sharding=sh_dense),
    )
    txt = f.lower(*args).compile().as_text()

    assert txt.count("collective-permute-start") >= 1, "rotation not lowered async"
    assert txt.count("collective-permute-done") >= 1

    # the local contraction must be scheduled between at least one
    # start/done pair (true overlap in the instruction schedule)
    overlap = False
    for i, line in enumerate(lines := txt.splitlines()):
        if "collective-permute-start" in line and "=" in line:
            for after in lines[i + 1 :]:
                if "collective-permute-done" in after:
                    break
                if "fusion" in after or "dot(" in after or "scatter" in after:
                    overlap = True
            if overlap:
                break
    assert overlap, "no compute scheduled between collective-permute start/done"


def test_spmm_ring_ell_hlo_overlap_tpu_aot():
    """Same AOT overlap assertion for the scatter-free ELL ring (r4): the
    one-hot MXU bucket contraction must schedule between the async
    collective-permute start/done pair."""
    try:
        from jax.experimental import topologies

        topo = topologies.get_topology_desc(platform="tpu", topology_name="v5e:2x4")
        devices = topo.devices
    except Exception as e:  # no libtpu / plugin in this environment
        pytest.skip(f"TPU topology unavailable: {e}")

    from jax.sharding import Mesh
    from sparse_tpu.parallel.sharding import _spmm_ring_ell_fn

    mesh_t = Mesh(np.array(devices), ("x",))
    n_dev = len(devices)
    block_rows, nb, cap, block_cols, n = 256, n_dev, 32, 16, 8

    f = _spmm_ring_ell_fn(mesh_t, "x", block_rows, 128)
    sh_ell = NamedSharding(mesh_t, P("x", None, None, None))
    sh_dense = NamedSharding(mesh_t, P("x", None))
    args = (
        jax.ShapeDtypeStruct((n_dev, n_dev, block_rows // 128, cap), jnp.int32, sharding=sh_ell),
        jax.ShapeDtypeStruct((n_dev, n_dev, block_rows // 128, cap), jnp.int32, sharding=sh_ell),
        jax.ShapeDtypeStruct((n_dev, n_dev, block_rows // 128, cap), jnp.float32, sharding=sh_ell),
        jax.ShapeDtypeStruct((n_dev * block_cols, n), jnp.float32, sharding=sh_dense),
    )
    txt = f.lower(*args).compile().as_text()
    assert txt.count("collective-permute-start") >= 1
    overlap = False
    for i, line in enumerate(lines := txt.splitlines()):
        if "collective-permute-start" in line and "=" in line:
            for after in lines[i + 1 :]:
                if "collective-permute-done" in after:
                    break
                if "fusion" in after or "dot(" in after or "convolution" in after:
                    overlap = True
            if overlap:
                break
    assert overlap, "no compute scheduled between collective-permute start/done"


def test_adversarial_shard_shapes(mesh):
    """Ragged/degenerate partitions (VERDICT r2 item 7): m,k,n coprime to
    the device count, a zero-nnz shard, nnz-balanced with empty blocks,
    and a 2-D mesh whose factors divide neither M nor N."""
    import sys

    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    ge._dryrun_adversarial(mesh, N_DEV)
