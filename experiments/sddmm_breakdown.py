"""Where do the SDDMM 8.5 ms go? Chained-loop timings of each piece on
the bench graph shapes (2M edges, D=128, f32): src gather, dst gather,
both+mul (the real send_uv), and sorted (CSC) variants.

Every [E, D] product is consumed by a full reshape-sum (E = 16*N on the
bench graph) so XLA cannot slice away part of the gather.

Run on TPU: python experiments/sddmm_breakdown.py
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

R = 64


def timed(fn, *args):
    o = fn(*args); jax.block_until_ready(o)
    t0 = time.perf_counter()
    o = fn(*args); jax.block_until_ready(o)
    return (time.perf_counter() - t0) / R * 1000  # ms/iter


def chain(body, N):
    """Chained x_{t+1} = x_t + consume(body(x_t)); consume folds all E
    rows back to [N, D] so nothing is sliced away."""
    @jax.jit
    def loop(x):
        def step(i, x):
            y = body(x)
            k = y.shape[0] // N
            return x + y[:k * N].reshape(k, N, -1).sum(0) * 1e-9
        return jax.lax.fori_loop(0, R, step, x)
    return loop


def main():
    g = powerlaw_graph(num_nodes=131072, avg_degree=16, feat_dim=128,
                       seed=0).tensor()
    E, N, D = g.num_edges, g.num_nodes, 128
    x = g.node_feat["h"]
    src = g.edges[:, 0]
    dst = g.edges[:, 1]
    idx = g.adj_dst_index
    src_csc = idx.sorted_v
    dst_csc = jnp.asarray(np.repeat(np.arange(N), np.asarray(idx.degree)))
    seg_ids = dst_csc
    print(f"E={E} N={N} D={D} (E/N={E//N})", flush=True)

    for name, body in [
        ("src gather (random)", lambda x: jnp.take(x, src, 0)),
        ("dst gather (random)", lambda x: jnp.take(x, dst, 0)),
        ("dst gather (sorted ids)", lambda x: jnp.take(x, dst_csc, 0)),
        ("send_uv mul (both random)",
         lambda x: jnp.take(x, src, 0) * jnp.take(x, dst, 0)),
        ("send_uv mul (CSC order)",
         lambda x: jnp.take(x, src_csc, 0) * jnp.take(x, dst_csc, 0)),
        ("dst expand via segment-repeat (CSC)",
         lambda x: jnp.repeat(x, jnp.bincount(seg_ids, length=N), axis=0,
                              total_repeat_length=E)),
    ]:
        t = timed(chain(body, N), x)
        print(f"{name:42s} {t:7.2f} ms")


if __name__ == "__main__":
    main()
