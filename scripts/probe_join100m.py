import sys, os, time
sys.path.insert(0, '/root/repo')
os.environ.setdefault('KMERTOOLS_QUIET','1')
import numpy as np, jax, jax.numpy as jnp
from kmertools_tpu.ops import count as cops

rng = np.random.default_rng(1)
k = 21; n = 100_000_000
space = 1 << (2*k)
keys = np.unique(np.minimum(rng.integers(0, space, n, dtype=np.uint64),
                            rng.integers(0, space, n, dtype=np.uint64)))
cnts = np.ones(len(keys), np.int32)
dt = cops.direct_table(keys, cnts, k, 5, 16, mem_cap_bytes=2<<30)
rows_np, p, bb, pl = dt
print('table: %.0f MB, p=%d planes=%d S=%d (%.1f B/key, %.1fM keys)' % (
    rows_np.nbytes/1e6, p, pl, rows_np.shape[1], rows_np.nbytes/len(keys), len(keys)/1e6))
n_q = 4_000_000
q = rng.choice(keys, n_q)
nlo = min(k, 16)
qh = jnp.asarray((q >> np.uint64(2*nlo)).astype(np.uint32))
ql = jnp.asarray((q & np.uint64((1<<(2*nlo))-1)).astype(np.uint32))
t0=time.perf_counter()
drows = jax.device_put(jnp.asarray(rows_np))
drows.block_until_ready()
print('upload issued in %.1fs (async)' % (time.perf_counter()-t0))

def make_step(nn):
    def run(drows):
        def body(i, carry):
            qlc, acc = carry
            res = cops.lookup_bins_direct(qh, qlc, drows, k, p, bb, pl)
            acc = acc + res.reshape(-1)[0].astype(jnp.int32)
            return qlc ^ (acc & 1).astype(qlc.dtype), acc
        _, acc = jax.lax.fori_loop(0, nn, body, (ql, jnp.int32(0)))
        return acc
    return run

f1 = jax.jit(make_step(1))
t0=time.perf_counter(); v=int(np.asarray(f1(drows))); print('first (compile+load+upload-wait): %.1fs' % (time.perf_counter()-t0))
lat_f = jax.jit(lambda x: x.sum()); lat_x = jnp.zeros(8, jnp.int32)
np.asarray(lat_f(lat_x))
lat = min(time.perf_counter()-t0 for t0 in [time.perf_counter()] if True or np.asarray(lat_f(lat_x)) is None)
import statistics
lats=[]
for _ in range(5):
    t0=time.perf_counter(); np.asarray(lat_f(lat_x)); lats.append(time.perf_counter()-t0)
lat = statistics.median(lats)
fc = jax.jit(make_step(8))
np.asarray(fc(drows))
best=1e9
for _ in range(3):
    t0=time.perf_counter(); np.asarray(fc(drows)); best=min(best, time.perf_counter()-t0)
per = (best - lat) / 8
print('join rate: %.1f Mlookups/s (%.3fs per %dM queries, floor %.0fms)' % (n_q/per/1e6, per, n_q//1e6, lat*1e3))
