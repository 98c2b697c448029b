"""Bisect the restructured dedup kernel's phase-2 cost on the bench graph.

Variants (unweighted, bench shapes NB=256 ET=1024 W=128 D=128):
  build      one-hot construction only (VPU + bf16 stores), dummy C
  cmat       build + C += oh_dst · oh_wᵀ (the (1,1)-contraction bf16 MXU)
  full       shipped kernel (build + cmat + per-pair C @ win)
  bf16cmp    like full, but one-hots built via clamp→bf16 compare (no
             f32→bf16 relayout on the stores)
"""
import functools
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
from jax.experimental import pallas as pl            # noqa: E402
from jax.experimental.pallas import tpu as pltpu     # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "..", "..", ".jax_cache"))

from pgl_tpu.datasets import powerlaw_graph          # noqa: E402
from pgl_tpu.ops.pallas import dedup_kernels as dk   # noqa: E402

NB, ET, W, D = 256, 1024, 128, 128
R = 64


def make_kernel(mode):
    def kern(ts_ref, te_ref, blk_ref, wb_ref, uniq_ref, ids_ref, rows_ref,
             out_ref, win_tile, ids_tile, rows_tile, oh_dst, oh_w, c_acc,
             sem_w, sem_i, sem_r, *, P):
        p = pl.program_id(0)
        e0 = ts_ref[p]
        e1 = te_ref[p]
        num_tiles = (e1 - e0 + ET - 1) // ET
        row_base = blk_ref[p] * NB
        wb = wb_ref[p]
        ER = ET // 128

        def win_dma(slot, q):
            return pltpu.make_async_copy(
                uniq_ref.at[pl.ds(pl.multiple_of(wb_ref[q], W), W), :],
                win_tile.at[slot], sem_w.at[slot])

        @pl.when(p == 0)
        def _():
            win_dma(0, 0).start()

        @pl.when(p + 1 < P)
        def _():
            win_dma((p + 1) % 2, p + 1).start()

        def tile_dma(slot, t):
            start = pl.multiple_of(e0 + t * ET, ET)
            return (
                pltpu.make_async_copy(
                    ids_ref.at[pl.ds(start // 128, ER), :],
                    ids_tile.at[slot], sem_i.at[slot]),
                pltpu.make_async_copy(
                    rows_ref.at[pl.ds(start // 128, ER), :],
                    rows_tile.at[slot], sem_r.at[slot]),
            )

        @pl.when(num_tiles > 0)
        def _():
            for c in tile_dma(0, 0):
                c.start()

        @pl.when((p == 0) | (blk_ref[jnp.maximum(p - 1, 0)] != blk_ref[p]))
        def _():
            out_ref[:] = jnp.zeros((NB, D), out_ref.dtype)

        c_acc[:] = jnp.zeros((NB, W), c_acc.dtype)

        def body(t, _):
            slot = t % 2
            nxt = (t + 1) % 2

            @pl.when(t + 1 < num_tiles)
            def _():
                for c in tile_dma(nxt, t + 1):
                    c.start()

            for c in tile_dma(slot, t):
                c.wait()

            if mode == "bf16cmp":
                rows_d = jax.lax.broadcasted_iota(
                    jnp.int32, (NB, 128), 0).astype(jnp.bfloat16)
                rows_w = jax.lax.broadcasted_iota(
                    jnp.int32, (W, 128), 0).astype(jnp.bfloat16)
                one = jnp.ones((), jnp.bfloat16)
                zero = jnp.zeros((), jnp.bfloat16)
                for r in range(ER):
                    loc = jnp.clip(ids_tile[slot, r].reshape(1, 128)
                                   - row_base, -1, NB).astype(jnp.bfloat16)
                    oh_dst[:, r * 128:(r + 1) * 128] = jnp.where(
                        rows_d == loc, one, zero)
                    rnk = jnp.clip(rows_tile[slot, r].reshape(1, 128) - wb,
                                   -1, W).astype(jnp.bfloat16)
                    oh_w[:, r * 128:(r + 1) * 128] = jnp.where(
                        rows_w == rnk, one, zero)
            else:
                rows_d = jax.lax.broadcasted_iota(jnp.int32, (NB, 128), 0)
                rows_w = jax.lax.broadcasted_iota(jnp.int32, (W, 128), 0)
                for r in range(ER):
                    ids_row = ids_tile[slot, r].reshape(1, 128) - row_base
                    oh_dst[:, r * 128:(r + 1) * 128] = jnp.where(
                        rows_d == ids_row, 1.0, 0.0).astype(oh_dst.dtype)
                    rank_row = rows_tile[slot, r].reshape(1, 128) - wb
                    oh_w[:, r * 128:(r + 1) * 128] = jnp.where(
                        rows_w == rank_row, 1.0, 0.0).astype(oh_w.dtype)
            if mode == "build":
                c_acc[:] = c_acc[:] + oh_dst[:, :W].astype(jnp.float32)
            else:
                c = jax.lax.dot_general(
                    oh_dst[:], oh_w[:], (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                c_acc[:] = c_acc[:] + c
            return ()

        jax.lax.fori_loop(0, num_tiles, body, ())
        win_dma(p % 2, p).wait()
        if mode == "cmat" or mode == "build":
            out_ref[:] = out_ref[:] + c_acc[:, :1] * win_tile[p % 2][:1, :1]
        else:
            out_ref[:] = out_ref[:] + jax.lax.dot(
                c_acc[:], win_tile[p % 2].astype(jnp.float32),
                preferred_element_type=jnp.float32).astype(out_ref.dtype)

    return kern


def run(mode, layout, uniq, N):
    P = int(layout.pair_ts.shape[0])
    n_pad = (N + NB - 1) // NB * NB

    def call(u):
        return pl.pallas_call(
            functools.partial(make_kernel(mode), P=P),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=4,
                grid=(P,),
                in_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)]
                * 3,
                out_specs=pl.BlockSpec(
                    (NB, D), lambda p, ts, te, blk, wb: (blk[p], 0),
                    memory_space=pltpu.VMEM),
                scratch_shapes=[
                    pltpu.VMEM((2, W, D), jnp.float32),
                    pltpu.VMEM((2, ET // 128, 128), jnp.int32),
                    pltpu.VMEM((2, ET // 128, 128), jnp.int32),
                    pltpu.VMEM((NB, ET), jnp.bfloat16),
                    pltpu.VMEM((W, ET), jnp.bfloat16),
                    pltpu.VMEM((NB, W), jnp.float32),
                    pltpu.SemaphoreType.DMA((2,)),
                    pltpu.SemaphoreType.DMA((2,)),
                    pltpu.SemaphoreType.DMA((2,)),
                ],
            ),
            out_shape=jax.ShapeDtypeStruct((n_pad, D), jnp.float32),
        )(layout.pair_ts, layout.pair_te, layout.pair_blk, layout.pair_wb,
          u, layout.padded_ids,
          # padded_rows is host-only aux now (the production kernel
          # dropped it); this historical variant still needs it on device
          jnp.asarray(np.asarray(layout.padded_rows).reshape(-1, 128)))

    @jax.jit
    def loop(u):
        def body(i, u):
            y = call(u)
            return u * (1.0 + y[0, 0] * 1e-30)
        return jax.lax.fori_loop(0, R, body, u)

    o = loop(uniq); float(o[0, 0])
    t0 = time.perf_counter()
    o = loop(uniq); float(o[0, 0])
    t = (time.perf_counter() - t0) / R
    print(f"{mode:8s}: {t*1e3:.2f} ms/iter")
    return t


def main():
    g = powerlaw_graph(num_nodes=131072, avg_degree=16, feat_dim=128,
                       seed=0)
    N = g.num_nodes
    dst_idx = g.adj_dst_index
    lay = dk.build_dedup_layout(np.asarray(dst_idx.indptr),
                                np.asarray(dst_idx.sorted_v), N,
                                debug_rows=True)
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(N, 128)).astype(np.float32))
    uniq = jnp.take(x, lay.uv, axis=0)
    print(f"pairs={int(lay.pair_ts.shape[0])} "
          f"tiles≈{int(lay.padded_v.shape[0])//ET}")
    for mode in ("build", "cmat", "full"):
        run(mode, lay, uniq, N)


if __name__ == "__main__":
    main()
