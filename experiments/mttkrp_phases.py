import sys
sys.path.insert(0, "/root/repo")
sys.setrecursionlimit(100000)
import numpy as np, jax, jax.numpy as jnp
import experiments.pallas_spmv_onehot as E
from sparse_tpu.kernels.ell import build_block_ell_3d, ell_mttkrp

rng = np.random.default_rng(0)
I, J, K, r = 100_000, 2000, 2000, 32
lin = np.unique(rng.integers(0, I*J*K, size=10_000_000, dtype=np.int64))
ci = (lin // (J*K)).astype(np.int32); cj = ((lin // K) % J).astype(np.int32); ck = (lin % K).astype(np.int32)
tv = rng.random(lin.size, dtype=np.float32)
nnz = lin.size
C = jnp.asarray(rng.random((J, r), dtype=np.float32))
D = jnp.asarray(rng.random((K, r), dtype=np.float32))
er, ej, ek, ed = build_block_ell_3d(ci, cj, ck, tv, I)
print("cap:", ej.shape, flush=True)

def full(Cv, Dv):
    return ell_mttkrp(er, ej, ek, ed, Cv, Dv, n_rows=I)

def gathers_only(Cv, Dv):
    n_blocks, cap = ej.shape
    g = (jnp.take(Cv, ej.reshape(-1), axis=0) * jnp.take(Dv, ek.reshape(-1), axis=0)).reshape(n_blocks, cap, r)
    prod = ed[:, :, None] * g
    return prod.sum(axis=1)  # cheap reduce, keeps everything live

for name, f in [("gathers+prod only", gathers_only), ("full ell_mttkrp", full)]:
    dt = E.bench(jax.jit(f), (C, D), iters=20)
    print(f"{name}: {dt*1e3:.2f} ms = {nnz/dt/1e6:.0f} M nnz/s", flush=True)
