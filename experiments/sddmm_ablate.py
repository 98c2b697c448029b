"""Ablate the dedup SDDMM kernel body to find the 3.5 us/tile cost.

Variants: full | no_out (skip out DMAs) | no_dst (skip ohd+3 matmuls)
| no_src (skip ohr+3 matmuls) | floor (no matmuls, no one-hots).

Run on TPU: python experiments/sddmm_ablate.py
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pgl_tpu.ops.pallas import sddmm_kernels as sk
from pgl_tpu.datasets.synthetic import powerlaw_graph

R = 64
_KP, _KI = 8, 4     # the tile-grid prototype's buffer slotting


def make_kernel(NB, ET, W, D, T, QS, variant):
    def kernel(start_ref, pidx_ref, wb_ref, blk_ref, nsub_ref, pord_ref,
               uniq_ref, dstp_ref, ids_ref, rts_ref, rte_ref, out_ref,
               win_f, dst_f, win_b, dst_b, ids_t, rts_t, rte_t,
               ohr, out_t, sem_w, sem_d, sem_i, sem_b, sem_o):
        t = pl.program_id(0)
        p = pidx_ref[t]
        slot_p = pord_ref[t] % _KP
        first = (t == 0) | (pidx_ref[jnp.maximum(t - 1, 0)] != p)
        ER = ET // 128

        def pair_dmas(q, slot):
            return (
                pltpu.make_async_copy(
                    uniq_ref.at[pl.ds(pl.multiple_of(wb_ref[q], W), W), :],
                    win_f.at[slot], sem_w.at[slot]),
                pltpu.make_async_copy(
                    dstp_ref.at[pl.ds(
                        pl.multiple_of(blk_ref[q] * NB, NB), NB), :],
                    dst_f.at[slot], sem_d.at[slot]),
                pltpu.make_async_copy(rts_ref.at[pidx_ref[q]],
                                      rts_t.at[slot], sem_b.at[slot, 0]),
                pltpu.make_async_copy(rte_ref.at[pidx_ref[q]],
                                      rte_t.at[slot], sem_b.at[slot, 1]),
            )

        def ids_dma(q, slot):
            return pltpu.make_async_copy(
                ids_ref.at[pl.ds(start_ref[q] // 128, ER), :],
                ids_t.at[slot], sem_i.at[slot])

        def is_first(q):
            return (q == 0) | (pidx_ref[jnp.maximum(q - 1, 0)]
                               != pidx_ref[q])

        use_pair = variant not in ("floor_nopair",)

        @pl.when(t == 0)
        def _():
            if use_pair:
                for j in range(3):
                    q = jnp.minimum(jnp.int32(j), T - 1)

                    @pl.when((j < T) & is_first(q))
                    def _(q=q):
                        for c in pair_dmas(q, pord_ref[q] % _KP):
                            c.start()
            for j in range(2):
                @pl.when(j < T)
                def _(j=j):
                    q = jnp.minimum(jnp.int32(j), T - 1)
                    ids_dma(q, q % _KI).start()

        if use_pair:
            @pl.when((t + 3 < T) & is_first(jnp.minimum(t + 3, T - 1)))
            def _():
                q = jnp.minimum(t + 3, T - 1)
                for c in pair_dmas(q, pord_ref[q] % _KP):
                    c.start()

        @pl.when(t + 2 < T)
        def _():
            q = jnp.minimum(t + 2, T - 1)
            ids_dma(q, q % _KI).start()

        if use_pair:
            @pl.when(first)
            def _():
                for c in pair_dmas(t, slot_p):
                    c.wait()
                if variant != "floor_nosplit":
                    sk._split3(win_f[slot_p], win_b)
                    sk._split3(dst_f[slot_p], dst_b)

        ids_dma(t, t % _KI).wait()

        sub = jax.lax.broadcasted_iota(jnp.int32, (128, 1), 0)
        rows_d = jax.lax.broadcasted_iota(jnp.int32, (NB, 128), 0)
        row_base = blk_ref[t] * NB
        use_src = variant in ("full", "no_out", "no_dst")
        use_dst = variant in ("full", "no_out", "no_src")
        if variant in ("floor_nopair", "floor_noout", "floor_nosplit",
                       "floor_smallout", "floor_zero"):
            use_src = use_dst = False
        ohd_chunks = []
        if use_src or use_dst:
            for r in range(ER):
                s_glob = start_ref[t] + r * 128 + sub
                if use_src:
                    m = ((s_glob >= rts_t[slot_p, 0:1, :])
                         & (s_glob < rte_t[slot_p, 0:1, :]))
                    ohr[r * 128:(r + 1) * 128, :] = \
                        jnp.where(m, 1.0, 0.0).astype(ohr.dtype)
                if use_dst:
                    ids_row = ids_t[t % _KI, r].reshape(1, 128) - row_base
                    ohd_chunks.append(
                        jnp.where(rows_d == ids_row, 1.0, 0.0)
                        .astype(jnp.bfloat16))
        acc = jnp.zeros((ET, D), jnp.float32)
        if use_dst:
            ohd = jnp.concatenate(ohd_chunks, axis=1)
            xdst = jnp.zeros((ET, D), jnp.float32)
            for k in range(3):
                xdst = xdst + jax.lax.dot_general(
                    ohd, dst_b[k], (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
        if use_src:
            xsrc = jnp.zeros((ET, D), jnp.float32)
            for k in range(3):
                xsrc = xsrc + jax.lax.dot_general(
                    ohr[:], win_b[k], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
        if use_src and use_dst:
            valid = jnp.sum(ohr[:].astype(jnp.float32), axis=1,
                            keepdims=True)
            acc = jnp.where(valid > 0, xsrc * xdst, 0.0)
        elif use_src:
            acc = xsrc
        elif use_dst:
            acc = xdst
        elif variant == "floor_zero":
            acc = jnp.zeros((ET, D), jnp.float32)
        else:
            acc = jnp.broadcast_to(
                ids_t[t % _KI, 0, 0].astype(jnp.float32), (ET, D))

        slot_o = t % 2
        NQ = ET // QS

        def out_dma(q, slot, nq):
            return pltpu.make_async_copy(
                out_t.at[slot, pl.ds(0, nq * QS), :],
                out_ref.at[pl.ds(start_ref[q], nq * QS), :],
                sem_o.at[slot])

        def wait_out(q, slot):
            for nq in range(1, NQ + 1):
                @pl.when(nsub_ref[q] == nq * (QS // 128))
                def _(nq=nq):
                    out_dma(q, slot, nq).wait()

        no_out = variant in ("no_out", "floor_noout", "floor_nosplit",
                             "floor_smallout")
        if not no_out:
            @pl.when(t >= 2)
            def _():
                wait_out(jnp.maximum(t - 2, 0), slot_o)

        if variant == "floor_smallout":
            out_t[slot_o, 0:128] = acc[0:128]
        else:
            out_t[slot_o] = acc

        if not no_out:
            for nq in range(1, NQ + 1):
                @pl.when(nsub_ref[t] == nq * (QS // 128))
                def _(nq=nq):
                    out_dma(t, slot_o, nq).start()

            @pl.when(t == T - 1)
            def _():
                @pl.when(T >= 2)
                def _():
                    wait_out(jnp.maximum(T - 2, 0), (t + 1) % 2)
                wait_out(t, slot_o)
    return kernel


def main():
    g = powerlaw_graph(num_nodes=131072, avg_degree=16, feat_dim=128,
                       seed=0)
    idx = g.adj_dst_index
    lay = sk.build_sddmm_layout(np.asarray(idx.indptr),
                                np.asarray(idx.sorted_v), g.num_nodes)
    x = g.tensor().node_feat["h"]
    N = g.num_nodes
    D = 128
    NB, ET, W = lay.nb, lay.et, lay.w
    n_pad = (N + NB - 1) // NB * NB
    T = int(lay.tile_start.shape[0])
    S = lay.slots
    uniq0 = jnp.take(x, lay.uv, axis=0)
    dstp0 = jnp.zeros((n_pad, D)).at[:N].set(x)
    print(f"T={T} S={S} ({S / g.num_edges:.3f}x)", flush=True)

    # reconstruct the tile-grid prototype's per-tile tables from the
    # pair-packed layout (this experiment keeps the old kernel shape)
    nt = np.asarray(lay.pair_nt)
    tile_pidx = jnp.asarray(np.repeat(np.arange(len(nt)), nt)
                            .astype(np.int32))
    tile_wb = jnp.asarray(np.repeat(np.asarray(lay.pair_wb), nt))
    tile_blk = jnp.asarray(np.repeat(np.asarray(lay.pair_blk), nt))
    tile_pord = tile_pidx
    # rank tables in the old kernel are indexed by tile_pidx → already
    # active-packed, consistent
    lay_tile_start = lay.tile_start
    lay_tile_nsub = lay.tile_nsub

    import sys as _sys
    variants = (_sys.argv[1:] if len(_sys.argv) > 1 else
                ["full", "no_out", "no_dst", "no_src", "floor",
                 "floor_nopair", "floor_noout"])
    for variant in variants:
        kern = make_kernel(NB, ET, W, D, T, lay.quant, variant)

        def call(uniq, dstp):
            return pl.pallas_call(
                kern,
                grid_spec=pltpu.PrefetchScalarGridSpec(
                    num_scalar_prefetch=6, grid=(T,),
                    in_specs=[pl.BlockSpec(
                        memory_space=pltpu.MemorySpace.ANY)] * 5,
                    out_specs=pl.BlockSpec(
                        memory_space=pltpu.MemorySpace.ANY),
                    scratch_shapes=[
                        pltpu.VMEM((_KP, W, D), jnp.float32),
                        pltpu.VMEM((_KP, NB, D), jnp.float32),
                        pltpu.VMEM((3, W, D), jnp.bfloat16),
                        pltpu.VMEM((3, NB, D), jnp.bfloat16),
                        pltpu.VMEM((_KI, ET // 128, 128), jnp.int32),
                        pltpu.VMEM((_KP, W // 128, 128), jnp.int32),
                        pltpu.VMEM((_KP, W // 128, 128), jnp.int32),
                        pltpu.VMEM((ET, W), jnp.bfloat16),
                        pltpu.VMEM((2, ET, D), jnp.float32),
                        pltpu.SemaphoreType.DMA((_KP,)),
                        pltpu.SemaphoreType.DMA((_KP,)),
                        pltpu.SemaphoreType.DMA((_KI,)),
                        pltpu.SemaphoreType.DMA((_KP, 2)),
                        pltpu.SemaphoreType.DMA((2,)),
                    ]),
                out_shape=jax.ShapeDtypeStruct((S + ET, D), jnp.float32),
            )(lay_tile_start, tile_pidx, tile_wb, tile_blk,
              lay_tile_nsub, tile_pord,
              uniq, dstp, lay.slot_ids,
              # packed intervals split back for this old prototype
              lay.rank_iv[:, :1], lay.rank_iv[:, 1:])

        @jax.jit
        def loop(uniq, dstp):
            def step(i, u):
                y = call(u, dstp)
                k = y.shape[0] // u.shape[0]
                return u + y[:k * u.shape[0]].reshape(
                    k, u.shape[0], -1).sum(0) * 1e-9
            return jax.lax.fori_loop(0, R, step, uniq)

        o = loop(uniq0, dstp0); jax.block_until_ready(o)
        t0 = time.perf_counter()
        o = loop(uniq0, dstp0); jax.block_until_ready(o)
        dt = (time.perf_counter() - t0) / R * 1000
        print(f"{variant:8s} {dt:7.2f} ms  ({dt * 1000 / T:.2f} us/tile)",
              flush=True)


if __name__ == "__main__":
    main()
