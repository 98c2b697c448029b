"""Localize the dedup attention forward's ~9.3 us/pair (GAT layer0,
H=8, 1M edges: 9.9 ms of the 33 ms train step).

Variants strip pieces of `_attn_fwd_kernel`'s per-head loop:
  full       shipped kernel behavior (additive scores)
  no_pv      skip the [NB,W]@[W,DVH] value matmuls (8 skinny per pair)
  no_exp     skip exp/max (scores used raw) — isolates transcendentals
  count_only just the count pass + window DMAs (floor)
  pv_stack   ONE [H*NB, W]@[W, DV] matmul for all heads (8x FLOPs,
             full MXU width) instead of 8 skinny ones

Run on TPU: python experiments/gat_fwd_ablate.py
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

from pgl_tpu.ops.pallas import dedup_kernels as dk
from pgl_tpu.ops.pallas.dedup_attention import _count_tiles, _hp
from pgl_tpu.datasets.synthetic import powerlaw_graph

R = 32
H, DVH, DV = 8, 8, 128
NB, ET, W = 256, 1024, 128


def make_kernel(P, variant):
    def kern(ts_ref, te_ref, blk_ref, wb_ref,
             adst_ref, asrcT_ref, vu_ref, ids_ref, iv_ref,
             out_ref, lse_ref,
             win_s, win_v, ids_tile, iv_tile,
             oh_dst, oh_rankT, c_acc, m_s, l_s, acc,
             sem_ws, sem_wv, sem_i, sem_b):
        p = pl.program_id(0)
        Hp = _hp(H)

        def ws_dma(slot, q):
            return pltpu.make_async_copy(
                asrcT_ref.at[:, pl.ds(pl.multiple_of(wb_ref[q], W), W)],
                win_s.at[slot], sem_ws.at[slot])

        def wv_dma(slot, q):
            return pltpu.make_async_copy(
                vu_ref.at[pl.ds(pl.multiple_of(wb_ref[q], W), W), :],
                win_v.at[slot], sem_wv.at[slot])

        @pl.when(p == 0)
        def _():
            ws_dma(0, 0).start()
            wv_dma(0, 0).start()

        @pl.when(p + 1 < P)
        def _():
            ws_dma((p + 1) % 2, p + 1).start()
            wv_dma((p + 1) % 2, p + 1).start()

        new_blk = (p == 0) | (blk_ref[jnp.maximum(p - 1, 0)]
                              != blk_ref[p])

        @pl.when(new_blk)
        def _():
            m_s[:] = jnp.full((NB, Hp), -1e30, jnp.float32)
            l_s[:] = jnp.zeros((NB, Hp), jnp.float32)
            acc[:] = jnp.zeros((NB, DV), jnp.float32)

        _count_tiles(ts_ref, te_ref, blk_ref, ids_ref, iv_ref,
                     ids_tile, iv_tile, oh_dst, oh_rankT, c_acc,
                     sem_i, sem_b, NB=NB, ET=ET, W=W, P=P)

        ws_dma(p % 2, p).wait()
        wv_dma(p % 2, p).wait()
        C = c_acc[:]
        has = C > 0.0
        if variant == "count_only":
            out_ref[:] = C[:, :DV] * win_v[p % 2][0, 0]
            lse_ref[:] = C[:, :128]
            return
        m_prev = m_s[:]
        l_prev = l_s[:]
        acc_prev = acc[:]
        m_new_h, l_new_h, pmats = [], [], []
        for h in range(H):
            s = adst_ref[:, h][:, None] + win_s[p % 2][h:h + 1, :]
            s = jnp.where(s >= 0, s, s * 0.2)
            s = jnp.where(has, s, -1e30)
            if variant == "no_exp":
                m_new = m_prev[:, h]
                pmat = C * s
            else:
                m_new = jnp.maximum(m_prev[:, h], jnp.max(s, axis=1))
                pmat = C * jnp.exp(s - m_new[:, None])
            scale = jnp.exp(m_prev[:, h] - m_new) \
                if variant != "no_exp" else m_prev[:, h]
            l_new = l_prev[:, h] * (scale if variant != "no_exp"
                                    else 1.0) + jnp.sum(pmat, axis=1)
            m_new_h.append(m_new)
            l_new_h.append(l_new)
            pmats.append(pmat)
        if variant == "no_pv":
            acc_new = acc_prev
        elif variant == "pv_stack":
            pm_all = jnp.concatenate(pmats, axis=0)       # [H*NB, W]
            pv_all = jax.lax.dot(pm_all, win_v[p % 2],
                                 preferred_element_type=jnp.float32)
            parts = [pv_all[h * NB:(h + 1) * NB,
                            h * DVH:(h + 1) * DVH] for h in range(H)]
            parts.append(jnp.zeros((NB, DV - H * DVH), jnp.float32))
            acc_new = acc_prev + jnp.concatenate(parts, axis=1)
        else:
            parts = []
            for h in range(H):
                pv = jax.lax.dot(pmats[h],
                                 win_v[p % 2][:, h * DVH:(h + 1) * DVH],
                                 preferred_element_type=jnp.float32)
                parts.append(pv)
            parts.append(jnp.zeros((NB, DV - H * DVH), jnp.float32))
            acc_new = acc_prev + jnp.concatenate(parts, axis=1)
        m_s[:] = jnp.stack(m_new_h + [m_new_h[-1]] * (Hp - H), axis=1)
        l_s[:] = jnp.stack(l_new_h + [l_new_h[-1]] * (Hp - H), axis=1)
        acc[:] = acc_new
        out_ref[:] = acc_new
        lse_ref[:] = jnp.concatenate(
            [jnp.stack(l_new_h, 1),
             jnp.zeros((NB, 128 - H), jnp.float32)], axis=1)
    return kern


def main():
    g = powerlaw_graph(num_nodes=65536, avg_degree=16, feat_dim=128,
                       seed=1)
    idx = g.adj_dst_index
    lay = dk.build_dedup_layout(np.asarray(idx.indptr),
                                np.asarray(idx.sorted_v), g.num_nodes)
    N = g.num_nodes
    P = int(lay.pair_ts.shape[0])
    n_pad = (N + NB - 1) // NB * NB
    Upw = int(lay.uv.shape[0])
    rng = np.random.default_rng(0)
    adst = jnp.asarray(rng.normal(size=(n_pad, 128)).astype(np.float32))
    asrcT = jnp.asarray(rng.normal(size=(_hp(H), Upw)).astype(np.float32))
    vu = jnp.asarray(rng.normal(size=(Upw, DV)).astype(np.float32))
    print(f"P={P} pairs", flush=True)

    for variant in ["full", "no_pv", "pv_stack", "no_exp", "count_only"]:
        kern = make_kernel(P, variant)

        def call(adst, asrcT, vu):
            return pl.pallas_call(
                kern,
                grid_spec=pltpu.PrefetchScalarGridSpec(
                    num_scalar_prefetch=4,
                    grid=(P,),
                    in_specs=[
                        pl.BlockSpec((NB, 128),
                                     lambda p, ts, te, blk, wb:
                                     (blk[p], 0),
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
                        pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
                        pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
                        pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
                    ],
                    out_specs=(
                        pl.BlockSpec((NB, DV),
                                     lambda p, ts, te, blk, wb:
                                     (blk[p], 0),
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec((NB, 128),
                                     lambda p, ts, te, blk, wb:
                                     (blk[p], 0),
                                     memory_space=pltpu.VMEM),
                    ),
                    scratch_shapes=[
                        pltpu.VMEM((2, _hp(H), W), jnp.float32),
                        pltpu.VMEM((2, W, DV), jnp.float32),
                        pltpu.VMEM((2, ET // 128, 128), jnp.int32),
                        pltpu.VMEM((2 * (W // 128), 128), jnp.int32),
                        pltpu.VMEM((NB, ET), jnp.bfloat16),
                        pltpu.VMEM((ET, W), jnp.bfloat16),
                        pltpu.VMEM((NB, W), jnp.float32),
                        pltpu.VMEM((NB, _hp(H)), jnp.float32),
                        pltpu.VMEM((NB, _hp(H)), jnp.float32),
                        pltpu.VMEM((NB, DV), jnp.float32),
                        pltpu.SemaphoreType.DMA((2,)),
                        pltpu.SemaphoreType.DMA((2,)),
                        pltpu.SemaphoreType.DMA((2,)),
                        pltpu.SemaphoreType.DMA,
                    ],
                ),
                out_shape=(
                    jax.ShapeDtypeStruct((n_pad, DV), jnp.float32),
                    jax.ShapeDtypeStruct((n_pad, 128), jnp.float32)),
            )(lay.pair_ts, lay.pair_te, lay.pair_blk, lay.pair_wb,
              adst, asrcT, vu, lay.padded_ids, lay.rank_iv)

        @jax.jit
        def loop(adst, asrcT, vu):
            def step(i, a):
                o, _ = call(a, asrcT, vu)
                return a * (1.0 + o[0, 0] * 1e-30)
            return jax.lax.fori_loop(0, R, step, adst)

        o = loop(adst, asrcT, vu); jax.block_until_ready(o)
        t0 = time.perf_counter()
        o = loop(adst, asrcT, vu); jax.block_until_ready(o)
        dt = (time.perf_counter() - t0) / R * 1000
        print(f"{variant:10s} {dt:7.2f} ms ({dt * 1000 / P:.2f} us/pair)",
              flush=True)


if __name__ == "__main__":
    main()
