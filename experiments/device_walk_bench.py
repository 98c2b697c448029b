"""Device vs host walk throughput (VERDICT r3 #5 'Done' criterion:
device walks/s >= 10x host at 1M-node scale)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pgl_tpu.utils.platform import select_platform  # noqa: E402

select_platform()
import jax                                           # noqa: E402
import numpy as np                                   # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "..", ".jax_cache"))
from pgl_tpu.datasets import powerlaw_graph          # noqa: E402
from pgl_tpu.sampling import DeviceWalker, random_walk  # noqa: E402

N, deg, L, B = 1_000_000, 16, 20, 65536
g = powerlaw_graph(num_nodes=N, avg_degree=deg, feat_dim=0, seed=0)
print(f"graph: {N} nodes, {g.num_edges} edges; walks B={B} len={L}",
      flush=True)

rng = np.random.default_rng(0)
starts = rng.integers(0, N, B).astype(np.int32)

# host C++ path
t0 = time.perf_counter()
w_host = random_walk(g, starts[:8192], L, seed=1)
t_host = (time.perf_counter() - t0)
host_rate = 8192 * L / t_host
print(f"host walks: {host_rate:,.0f} node-steps/s "
      f"({t_host*1e3:.0f} ms for 8192 walks)", flush=True)

wk = DeviceWalker(g)
k = jax.random.key(0)
w = wk.random_walk(starts, L, k)
w.block_until_ready()                       # compile + upload
t0 = time.perf_counter()
R = 8
for i in range(R):
    w = wk.random_walk(starts, L, jax.random.fold_in(k, i))
w.block_until_ready()
float(np.asarray(w[0, 0]))
t_dev = (time.perf_counter() - t0) / R
dev_rate = B * L / t_dev
print(f"device walks: {dev_rate:,.0f} node-steps/s "
      f"({t_dev*1e3:.1f} ms per {B}-walk block)", flush=True)
print(f"speedup: {dev_rate / host_rate:.1f}x", flush=True)
