"""Phase breakdown of the two-phase dedup SpMM on the bench graph.

Times, each as a chained loop inside one jit (so iterations can't overlap):
  * phase 1 alone:  uniq = feature[uv]        (XLA hardware gather, U rows)
  * phase 2 alone:  kernel on pre-gathered uniq
  * both (prod):    spmm_dedup as shipped
  * base kernel:    gather-all + one-hot reduce (spmm)

Run on the real TPU:  python experiments/dedup_breakdown/measure.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))
from pgl_tpu.utils.platform import select_platform  # noqa: E402

select_platform()

import jax                                           # noqa: E402
import jax.numpy as jnp                              # noqa: E402
import numpy as np                                   # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "..", "..", ".jax_cache"))

from pgl_tpu.datasets import powerlaw_graph          # noqa: E402
from pgl_tpu.ops.pallas import dedup_kernels as dk   # noqa: E402
from pgl_tpu.ops.pallas import segment_kernels as sk # noqa: E402

R = 8


def chain_time(fn, *args):
    """fn(x, *args) -> y with y.shape == x.shape; chained R times in jit."""
    @jax.jit
    def loop(x, *a):
        def body(i, x):
            y = fn(x, *a)
            return y * (1.0 / (1.0 + jnp.max(jnp.abs(y)) * 1e-6))
        return jax.lax.fori_loop(0, R, body, x)

    o = loop(*args); float(o.reshape(-1)[0])
    t0 = time.perf_counter()
    o = loop(*args); float(o.reshape(-1)[0])
    return (time.perf_counter() - t0) / R


def main():
    g = powerlaw_graph(num_nodes=131072, avg_degree=16, feat_dim=128,
                       seed=0)
    N, E = g.num_nodes, g.num_edges
    dst_idx = g.adj_dst_index
    src_idx = g.adj_src_index
    csc_d = dk.build_dedup_layout(np.asarray(dst_idx.indptr),
                                  np.asarray(dst_idx.sorted_v), N)
    csr_d = dk.build_dedup_layout(np.asarray(src_idx.indptr),
                                  np.asarray(src_idx.sorted_v), N)
    csc = sk.build_blocked_layout(np.asarray(dst_idx.indptr),
                                  np.asarray(dst_idx.sorted_v), N)
    csr = sk.build_blocked_layout(np.asarray(src_idx.indptr),
                                  np.asarray(src_idx.sorted_v), N)
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(N, 128)).astype(np.float32))
    Upad = int(csc_d.uv.shape[0])
    Ep = int(csc_d.padded_v.shape[0])
    P = int(csc_d.pair_ts.shape[0])
    print(f"N={N} E={E} Upad={Upad} ({Upad/E:.3f}E) Ep={Ep} pairs={P}")

    # phase 1 alone: gather U rows, fold back to [N, D] via slice (keeps
    # chain shape); the fold-back slice is ~free
    def p1(x, uv):
        u = jnp.take(x, uv, axis=0)
        return x + u[:x.shape[0]] * 1e-9

    t = chain_time(p1, x, csc_d.uv)
    print(f"phase1 gather {Upad} rows: {t*1e3:.2f} ms "
          f"({t/Upad*1e9:.1f} ns/row)")

    # gather-all comparison (base kernel's bill): Ep rows
    t = chain_time(p1, x, csc_d.padded_v)
    print(f"gather-all {Ep} rows:     {t*1e3:.2f} ms "
          f"({t/Ep*1e9:.1f} ns/row)")

    # phase 2 alone: uniq pre-gathered once outside the chain
    uniq0 = jnp.take(x, csc_d.uv, axis=0)

    def p2(u):
        y = dk._dedup_call(u, csc_d, N, dk.NBD_DEFAULT, dk.ETD_DEFAULT,
                           dk.W_DEFAULT, False)
        return u + y[:u.shape[0]] * 1e-9 if u.shape[0] <= N else \
            u.at[:N].add(y * 1e-9)

    @jax.jit
    def p2loop(u):
        def body(i, u):
            y = dk._dedup_call(u[:Upad], csc_d, N, dk.NBD_DEFAULT,
                               dk.ETD_DEFAULT, dk.W_DEFAULT, False)
            return u * (1.0 / (1.0 + jnp.max(jnp.abs(y)) * 1e-6))
        return jax.lax.fori_loop(0, R, body, u)

    o = p2loop(uniq0); float(o[0, 0])
    t0 = time.perf_counter()
    o = p2loop(uniq0); float(o[0, 0])
    t = (time.perf_counter() - t0) / R
    print(f"phase2 kernel alone:      {t*1e3:.2f} ms")

    # production dedup spmm (both phases)
    def prod(x):
        y = dk.spmm_dedup(x, csc_d, csr_d)
        return y * (1.0 / (1.0 + jnp.max(jnp.abs(y)) * 1e-6))

    @jax.jit
    def prodloop(x):
        return jax.lax.fori_loop(0, R, lambda i, x: prod(x), x)

    o = prodloop(x); float(o[0, 0])
    t0 = time.perf_counter()
    o = prodloop(x); float(o[0, 0])
    t = (time.perf_counter() - t0) / R
    print(f"dedup spmm (p1+p2):       {t*1e3:.2f} ms")

    # base kernel
    def base(x):
        y = sk.spmm(x, csc, csr)
        return y * (1.0 / (1.0 + jnp.max(jnp.abs(y)) * 1e-6))

    @jax.jit
    def baseloop(x):
        return jax.lax.fori_loop(0, R, lambda i, x: base(x), x)

    o = baseloop(x); float(o[0, 0])
    t0 = time.perf_counter()
    o = baseloop(x); float(o[0, 0])
    t = (time.perf_counter() - t0) / R
    print(f"base spmm:                {t*1e3:.2f} ms")


if __name__ == "__main__":
    main()
