"""Dedup SDDMM kernel vs XLA send_uv on the bench graph (2M edges,
D=128, f32), full-E consumers (reshape-sum) so nothing elides.

Run on TPU: python experiments/sddmm_dedup_bench.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np
import jax
import jax.numpy as jnp

from pgl_tpu.datasets.synthetic import powerlaw_graph
from pgl_tpu.ops.pallas.sddmm_kernels import (build_sddmm_layout,
                                              sddmm_dedup)

R = 64


def main():
    g = powerlaw_graph(num_nodes=131072, avg_degree=16, feat_dim=128,
                       seed=0)
    idx = g.adj_dst_index
    t0 = time.time()
    lay = build_sddmm_layout(np.asarray(idx.indptr),
                             np.asarray(idx.sorted_v), g.num_nodes)
    print(f"layout build: {time.time() - t0:.2f}s  slots={lay.slots} "
          f"(E={g.num_edges}, {lay.slots / g.num_edges:.3f}x) "
          f"tiles={lay.tile_start.shape[0]} "
          f"uniq={lay.uv.shape[0]}", flush=True)
    gt = g.tensor()
    x = gt.node_feat["h"]
    N = g.num_nodes
    src = gt.edges[:, 0]
    dst = gt.edges[:, 1]

    def timed(loop, *args):
        o = loop(*args); jax.block_until_ready(o)
        t0 = time.perf_counter()
        o = loop(*args); jax.block_until_ready(o)
        return (time.perf_counter() - t0) / R * 1000

    # chained loops; optimization_barrier pins the full [E, D] product
    # in place (without it XLA slices the gathers down to the consumed
    # rows), and the consumer then only needs one element
    @jax.jit
    def loop_kernel(x):
        def step(i, x):
            y = sddmm_dedup(x, x, lay, "mul")
            y = jax.lax.optimization_barrier(y)
            return x + y[0, 0] * 1e-9
        return jax.lax.fori_loop(0, R, step, x)

    @jax.jit
    def loop_xla(x):
        def step(i, x):
            y = jnp.take(x, src, 0) * jnp.take(x, dst, 0)
            y = jax.lax.optimization_barrier(y)
            return x + y[0, 0] * 1e-9
        return jax.lax.fori_loop(0, R, step, x)

    # correctness on device first
    out = np.asarray(sddmm_dedup(x, x, lay, "mul"))
    xs = np.asarray(x)
    csc_src = np.asarray(idx.sorted_v)
    csc_dst = np.repeat(np.arange(N), np.asarray(idx.degree))
    real = lay.eid >= 0
    ref = xs[csc_src[lay.eid[real]]] * xs[csc_dst[lay.eid[real]]]
    err = np.max(np.abs(out[real] - ref) / (np.abs(ref) + 1e-3))
    print(f"maxerr vs numpy: {err:.2e}", flush=True)

    tk = timed(loop_kernel, x)
    tx = timed(loop_xla, x)
    E, D = g.num_edges, 128
    model = (3 * E * D * 4 + 2 * E * 4) / (819e9) * 1000
    print(f"kernel: {tk:.2f} ms  (sol {model / tk:.3f})")
    print(f"xla:    {tx:.2f} ms  (sol {model / tx:.3f})")
    print(f"speedup {tx / tk:.2f}x")


if __name__ == "__main__":
    main()
