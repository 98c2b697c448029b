"""TPU A/B: two-phase dedup SpMM vs gather+one-hot base SpMM.

Chained (data-dependent) timing so XLA cannot overlap iterations —
see the overlapped-iteration trap in experiments/fused_gather/README.md.
"""

import sys
import os
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))

import numpy as np
import jax
import jax.numpy as jnp


def chain_time(f, x, iters=20):
    x = jnp.asarray(x)

    @jax.jit
    def run(x):
        def body(_, x):
            y = f(x)
            # feed output back (N-row → N-row, shapes match)
            return x * 0.999 + y[: x.shape[0]] * 1e-6
        return jax.lax.fori_loop(0, iters, body, x)

    run(x).block_until_ready()
    t0 = time.perf_counter()
    run(x).block_until_ready()
    return (time.perf_counter() - t0) / iters


def main():
    from pgl_tpu.datasets import powerlaw_graph
    from pgl_tpu.ops.pallas.segment_kernels import (build_blocked_layout,
                                                    spmm)
    from pgl_tpu.ops.pallas.dedup_kernels import (build_dedup_layout,
                                                  spmm_dedup)

    n, D = 131072, 128
    g = powerlaw_graph(num_nodes=n, avg_degree=16, feat_dim=8, seed=0)
    gt = g.tensor()
    dst_idx = g.adj_dst_index
    src_idx = g.adj_src_index
    E = g.num_edges
    print(f"graph n={n} E={E} D={D} backend={jax.default_backend()}")

    csc = build_blocked_layout(np.asarray(dst_idx.indptr),
                               np.asarray(dst_idx.sorted_v), n)
    csr = build_blocked_layout(np.asarray(src_idx.indptr),
                               np.asarray(src_idx.sorted_v), n)
    feat = np.random.default_rng(1).normal(size=(n, D)).astype(np.float32)

    t = chain_time(lambda x: spmm(x, csc, csr), feat)
    print(f"base   fwd: {t * 1e3:8.2f} ms   {E / t / 1e6:8.1f} Me/s")

    # (y**2).sum() so the cotangent depends on x — grad of .sum() is the
    # ones vector and XLA hoists the whole bwd out of the timing loop
    tg = chain_time(lambda x: jax.grad(
        lambda y: (spmm(y, csc, csr) ** 2).sum())(x), feat)
    print(f"base   f+b: {tg * 1e3:8.2f} ms")

    for nb, et, w in ((256, 512, 128), (256, 1024, 128), (256, 512, 256),
                      (512, 512, 128)):
        t0 = time.time()
        csc_d = build_dedup_layout(np.asarray(dst_idx.indptr),
                                   np.asarray(dst_idx.sorted_v), n,
                                   nb=nb, et=et, w=w)
        csr_d = build_dedup_layout(np.asarray(src_idx.indptr),
                                   np.asarray(src_idx.sorted_v), n,
                                   nb=nb, et=et, w=w)
        build_s = time.time() - t0
        uv, ep = int(csc_d.uv.shape[0]), int(csc_d.padded_v.shape[0])
        P = int(csc_d.pair_ts.shape[0])
        t = chain_time(lambda x: spmm_dedup(x, csc_d, csr_d, nb, et, w),
                       feat)
        tg = chain_time(lambda x: jax.grad(
            lambda y: (spmm_dedup(y, csc_d, csr_d, nb, et, w) ** 2).sum()
        )(x), feat)
        print(f"dedup nb={nb} et={et:4d} w={w:3d}: "
              f"fwd {t * 1e3:7.2f} ms ({E / t / 1e6:7.1f} Me/s)  "
              f"f+b {tg * 1e3:7.2f} ms  "
              f"[uv={uv} ({uv / E:.3f}E) P={P} build={build_s:.1f}s]")

    # parity spot-check on TPU
    csc_d = build_dedup_layout(np.asarray(dst_idx.indptr),
                               np.asarray(dst_idx.sorted_v), n)
    csr_d = build_dedup_layout(np.asarray(src_idx.indptr),
                               np.asarray(src_idx.sorted_v), n)
    a = np.asarray(spmm(jnp.asarray(feat), csc, csr))
    b = np.asarray(spmm_dedup(jnp.asarray(feat), csc_d, csr_d))
    print("parity maxerr:", np.abs(a - b).max(),
          "rel:", np.abs(a - b).max() / (np.abs(a).max() + 1e-9))


if __name__ == "__main__":
    main()
