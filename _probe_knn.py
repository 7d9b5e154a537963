import time, sys
t0=time.time()
def log(m): print(f"[{time.time()-t0:7.1f}s] {m}", flush=True)
import numpy as np
import jax, jax.numpy as jnp
log(f"jax imported, devices={jax.devices()}")
from plotpointe_tpu.graphs.knn import _knn_blocks, cosine_knn
n, d, k, br = 63_001, 384, 20, 1024
rng = np.random.default_rng(0)
x = rng.normal(size=(n, d)).astype(np.float32)
x /= np.linalg.norm(x, axis=1, keepdims=True)
log("data made")
xd = jnp.asarray(x)
jax.block_until_ready(xd)
log("data on device")
idx, sim, valid = cosine_knn(xd, k=k, min_similarity=0.3, block_rows=br, impl="xla")
log(f"xla warmup done, edges={valid.sum()}")
t=time.perf_counter(); idx, sim, valid = cosine_knn(xd, k=k, min_similarity=0.3, block_rows=br, impl="xla")
log(f"xla timed: {time.perf_counter()-t:.3f}s")
