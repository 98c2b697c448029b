"""Pallas TPU fused graph attention: SDDMM scores → per-destination softmax
→ weighted aggregation in a single pass over the edges.

This is the SDDMM + edge_softmax + send_ue_recv triple behind
GAT/TransformerConv (reference ``pgl/nn/conv.py:333-339,808-846``,
``pgl/nn/functional/graph_op.py:101``) fused flash-attention-style:

  * Edges are CSC-sorted, so all edges of an output row block are
    contiguous — the grid iterates row blocks, streaming edge tiles of
    gathered ``k``/``v`` rows with double-buffered DMA.
  * Scores for a tile are one ``dot_general`` on the MXU:
    ``S[r, e] = q[r] · k_e[e]`` masked by the row-membership one-hot.
    Additive attention (GAT) and precomputed logits reduce to the same dot
    by augmenting q/k with constant columns (see ``gat_score_features``).
  * Softmax is **online**: running (max, sum) per row with rescaling across
    tiles — exactly the blockwise-softmax recipe; no [E]-sized
    intermediate, no second pass.

Backward is fused too (flash-attention style): two kernels recompute the
per-edge probabilities **in-kernel** from the saved per-(row, head) LSE —
no ``[E, H]`` probability tensor, no XLA scatter in either direction:

  * CSC pass (grid over *dst* row blocks): streams gathered ``k``/``v``
    edge tiles, recomputes ``p = exp(s − lse)``, forms
    ``ds = p·(g·vᵀ − delta)`` and accumulates ``dq = ds @ k`` — all MXU.
  * CSR pass (grid over *src* row blocks): ``k``/``v`` rows are resident,
    the dst-side values (``q``, ``lse``, ``delta`` packed into one
    gathered stream) arrive per edge tile; accumulates ``dk = ds @ q`` and
    ``dv = p @ g`` together.

Each pass costs two row-gathers (the TPU gather floor, ~10 ns/row) plus
dense MXU work — measured well below XLA's recompute-differentiate, which
pays unsorted scatter-adds.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .segment_kernels import BlockedLayout

__all__ = ["fused_graph_attention", "gat_score_features",
           "logits_score_features"]


def _attn_kernel(tile_starts_ref, tile_ends_ref,
                 q_ref,                 # [NB, DS] VMEM (this block's rows)
                 k_ref,                 # [Ep, DS] HBM (gathered, CSC order)
                 v_ref,                 # [Ep, DV] HBM (gathered, CSC order)
                 ids_ref,               # [Ep/128, 128] HBM int32
                 out_ref,               # [NB, DV] VMEM
                 lse_ref,               # [NB, H] VMEM
                 k_tile, v_tile, ids_tile, acc, m_s, l_s, sem_k, sem_v,
                 sem_i,
                 *, NB: int, ET: int, DS: int, DV: int, H: int,
                 DSH: int, DVH: int, leaky_slope: float):
    i = pl.program_id(0)
    e0 = tile_starts_ref[i]
    e1 = tile_ends_ref[i]
    num_tiles = (e1 - e0 + ET - 1) // ET
    row_base = i * NB
    ER = ET // 128

    def tile_dma(slot, t):
        start = pl.multiple_of(e0 + t * ET, ET)
        return (
            pltpu.make_async_copy(k_ref.at[pl.ds(start, ET), :],
                                  k_tile.at[slot], sem_k.at[slot]),
            pltpu.make_async_copy(v_ref.at[pl.ds(start, ET), :],
                                  v_tile.at[slot], sem_v.at[slot]),
            pltpu.make_async_copy(ids_ref.at[pl.ds(start // 128, ER), :],
                                  ids_tile.at[slot], sem_i.at[slot]),
        )

    @pl.when(num_tiles > 0)
    def _():
        for d in tile_dma(0, 0):
            d.start()

    # online-softmax state: m (running max), l (running sum) per (row, head)
    m_s[:] = jnp.full((NB, H), -1e30, jnp.float32)
    l_s[:] = jnp.zeros((NB, H), jnp.float32)
    acc[:] = jnp.zeros((NB, DV), jnp.float32)

    def body(t, _):
        slot = t % 2
        nxt = (t + 1) % 2

        @pl.when(t + 1 < num_tiles)
        def _():
            for d in tile_dma(nxt, t + 1):
                d.start()

        for d in tile_dma(slot, t):
            d.wait()

        # row-membership mask [NB, ET] from the sorted ids
        rows = jax.lax.broadcasted_iota(jnp.int32, (NB, 128), 0)
        mask_parts = []
        for r in range(ER):
            local = ids_tile[slot, r].reshape(1, 128) - row_base
            mask_parts.append(rows == local)
        mask = jnp.concatenate(mask_parts, axis=1)          # [NB, ET]

        m_prev = m_s[:]
        l_prev = l_s[:]
        acc_prev = acc[:]
        m_new_h = []
        l_new_h = []
        acc_new_h = []
        for h in range(H):
            q_h = q_ref[:, h * DSH:(h + 1) * DSH]           # [NB, DSH]
            k_h = k_tile[slot, :, h * DSH:(h + 1) * DSH]    # [ET, DSH]
            s = jax.lax.dot_general(
                q_h, k_h, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)          # [NB, ET]
            if leaky_slope:
                s = jnp.where(s >= 0, s, s * leaky_slope)
            s = jnp.where(mask, s, -1e30)
            tile_max = jnp.max(s, axis=1)                    # [NB]
            m_new = jnp.maximum(m_prev[:, h], tile_max)
            scale = jnp.exp(m_prev[:, h] - m_new)            # [NB]
            p = jnp.exp(s - m_new[:, None])
            p = jnp.where(mask, p, 0.0)
            l_new = l_prev[:, h] * scale + jnp.sum(p, axis=1)
            v_h = v_tile[slot, :, h * DVH:(h + 1) * DVH]     # [ET, DVH]
            pv = jax.lax.dot(p.astype(v_h.dtype), v_h,
                             preferred_element_type=jnp.float32)
            acc_h = acc_prev[:, h * DVH:(h + 1) * DVH] * scale[:, None] + pv
            m_new_h.append(m_new)
            l_new_h.append(l_new)
            acc_new_h.append(acc_h)
        m_s[:] = jnp.stack(m_new_h, axis=1)
        l_s[:] = jnp.stack(l_new_h, axis=1)
        acc[:, :H * DVH] = jnp.concatenate(acc_new_h, axis=1)
        return ()

    jax.lax.fori_loop(0, num_tiles, body, ())

    l = l_s[:]
    out_parts = []
    for h in range(H):
        denom = jnp.maximum(l[:, h], 1e-30)[:, None]
        out_parts.append(acc[:, h * DVH:(h + 1) * DVH] / denom)
    if H * DVH < DV:   # zero tail when heads don't fill the padded width
        out_parts.append(jnp.zeros((NB, DV - H * DVH), jnp.float32))
    out = jnp.concatenate(out_parts, axis=1)
    # rows with no incoming edges produce zeros (reference contract)
    out = jnp.where((l.max(axis=1) > 0.0)[:, None], out, 0.0)
    out_ref[:] = out.astype(out_ref.dtype)
    lse_ref[:] = jnp.where(l > 0.0, m_s[:] + jnp.log(jnp.maximum(l, 1e-30)),
                           0.0)


@functools.partial(jax.jit, static_argnames=("num_segments", "num_heads",
                                             "nb", "et", "leaky_slope",
                                             "interpret", "dsh", "dvh"))
def _fused_attention_fwd(q, k, v, padded_v, padded_ids, tile_starts,
                         tile_ends, num_segments, num_heads: int,
                         leaky_slope: float, nb: int, et: int,
                         interpret: bool, dsh=None, dvh=None):
    DS = q.shape[1]
    DV = v.shape[1]
    dsh = dsh or DS // num_heads
    dvh = dvh or DV // num_heads
    n_pad = (num_segments + nb - 1) // nb * nb
    G = n_pad // nb
    q_pad = jnp.zeros((n_pad, DS), q.dtype).at[:num_segments].set(q)
    k_e = jnp.take(k, padded_v, axis=0)
    v_e = jnp.take(v, padded_v, axis=0)
    out = pl.pallas_call(
        functools.partial(_attn_kernel, NB=nb, ET=et, DS=DS, DV=DV,
                          H=num_heads, DSH=dsh, DVH=dvh,
                          leaky_slope=leaky_slope),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(G,),
            in_specs=[
                pl.BlockSpec((nb, DS), lambda i, *_: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
                pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
                pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            ],
            out_specs=(pl.BlockSpec((nb, DV), lambda i, *_: (i, 0),
                                    memory_space=pltpu.VMEM),
                       pl.BlockSpec((nb, num_heads), lambda i, *_: (i, 0),
                                    memory_space=pltpu.VMEM)),
            scratch_shapes=[
                pltpu.VMEM((2, et, DS), k_e.dtype),
                pltpu.VMEM((2, et, DV), v_e.dtype),
                pltpu.VMEM((2, et // 128, 128), jnp.int32),
                pltpu.VMEM((nb, DV), jnp.float32),
                pltpu.VMEM((nb, num_heads), jnp.float32),
                pltpu.VMEM((nb, num_heads), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=(jax.ShapeDtypeStruct((n_pad, DV), v.dtype),
                   jax.ShapeDtypeStruct((n_pad, num_heads), jnp.float32)),
        interpret=interpret,
    )(tile_starts, tile_ends, q_pad, k_e, v_e, padded_ids)
    out, lse = out
    return out[:num_segments], lse[:num_segments]


def _attn_bwd_dq_kernel(tile_starts_ref, tile_ends_ref,
                        q_ref,                  # [NB, DS] VMEM (dst rows)
                        g_ref,                  # [NB, DV] VMEM (cotangent)
                        lse_ref,                # [NB, H] VMEM
                        delta_ref,              # [NB, H] VMEM (Σ g·out)
                        k_hbm,                  # [Ep, DS] HBM (gathered CSC)
                        v_hbm,                  # [Ep, DV] HBM (gathered CSC)
                        ids_hbm,                # [Ep/128, 128] HBM int32
                        dq_ref,                 # [NB, DS] VMEM out
                        k_tile, v_tile, ids_tile, sem_k, sem_v, sem_i,
                        *, NB: int, ET: int, DS: int, DV: int, H: int,
                        DSH: int, DVH: int, leaky_slope: float):
    i = pl.program_id(0)
    e0 = tile_starts_ref[i]
    e1 = tile_ends_ref[i]
    num_tiles = (e1 - e0 + ET - 1) // ET
    row_base = i * NB
    ER = ET // 128

    def tile_dma(slot, t):
        start = pl.multiple_of(e0 + t * ET, ET)
        return (
            pltpu.make_async_copy(k_hbm.at[pl.ds(start, ET), :],
                                  k_tile.at[slot], sem_k.at[slot]),
            pltpu.make_async_copy(v_hbm.at[pl.ds(start, ET), :],
                                  v_tile.at[slot], sem_v.at[slot]),
            pltpu.make_async_copy(ids_hbm.at[pl.ds(start // 128, ER), :],
                                  ids_tile.at[slot], sem_i.at[slot]),
        )

    @pl.when(num_tiles > 0)
    def _():
        for d in tile_dma(0, 0):
            d.start()

    dq_ref[:] = jnp.zeros((NB, DS), dq_ref.dtype)

    def body(t, _):
        slot = t % 2
        nxt = (t + 1) % 2

        @pl.when(t + 1 < num_tiles)
        def _():
            for d in tile_dma(nxt, t + 1):
                d.start()

        for d in tile_dma(slot, t):
            d.wait()

        rows = jax.lax.broadcasted_iota(jnp.int32, (NB, 128), 0)
        mask_parts = []
        for r in range(ER):
            local = ids_tile[slot, r].reshape(1, 128) - row_base
            mask_parts.append(rows == local)
        mask = jnp.concatenate(mask_parts, axis=1)          # [NB, ET]

        dq_new = []
        for h in range(H):
            q_h = q_ref[:, h * DSH:(h + 1) * DSH]           # [NB, DSH]
            k_h = k_tile[slot, :, h * DSH:(h + 1) * DSH]    # [ET, DSH]
            s_raw = jax.lax.dot_general(
                q_h, k_h, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)          # [NB, ET]
            if leaky_slope:
                s_act = jnp.where(s_raw >= 0, s_raw, s_raw * leaky_slope)
            else:
                s_act = s_raw
            # exact probs from the saved LSE (no online pass needed)
            p = jnp.exp(jnp.where(mask, s_act - lse_ref[:, h][:, None],
                                  -1e30))                    # [NB, ET]
            g_h = g_ref[:, h * DVH:(h + 1) * DVH]           # [NB, DVH]
            v_h = v_tile[slot, :, h * DVH:(h + 1) * DVH]    # [ET, DVH]
            gv = jax.lax.dot_general(
                g_h, v_h, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)          # [NB, ET]
            ds = p * (gv - delta_ref[:, h][:, None])
            if leaky_slope:
                ds = ds * jnp.where(s_raw >= 0, 1.0, leaky_slope)
            dq_new.append(jax.lax.dot(
                ds.astype(k_h.dtype), k_h,
                preferred_element_type=jnp.float32))         # [NB, DSH]
        upd = jnp.concatenate(dq_new, axis=1)
        dq_ref[:, :H * DSH] = (dq_ref[:, :H * DSH]
                               + upd.astype(dq_ref.dtype))
        return ()

    jax.lax.fori_loop(0, num_tiles, body, ())


def _attn_bwd_dkv_kernel(tile_starts_ref, tile_ends_ref,
                         k_ref,                 # [NB, DS] VMEM (src rows)
                         v_ref,                 # [NB, DV] VMEM (src rows)
                         q_hbm,                 # [Ep, DS] HBM gathered CSR
                         g_hbm,                 # [Ep, DV] HBM gathered CSR
                         ld_hbm,                # [Ep/128, 2H, 128] HBM:
                                                #   per-edge lse/delta rows
                         ids_hbm,               # [Ep/128, 128] HBM int32
                         dk_ref,                # [NB, DS] VMEM out
                         dv_ref,                # [NB, DV] VMEM out
                         q_tile, g_tile, ld_tile, ids_tile,
                         sem_q, sem_g, sem_l, sem_i,
                         *, NB: int, ET: int, DS: int, DV: int,
                         H: int, DSH: int, DVH: int, leaky_slope: float):
    i = pl.program_id(0)
    e0 = tile_starts_ref[i]
    e1 = tile_ends_ref[i]
    num_tiles = (e1 - e0 + ET - 1) // ET
    row_base = i * NB
    ER = ET // 128

    def tile_dma(slot, t):
        start = pl.multiple_of(e0 + t * ET, ET)
        return (
            pltpu.make_async_copy(q_hbm.at[pl.ds(start, ET), :],
                                  q_tile.at[slot], sem_q.at[slot]),
            pltpu.make_async_copy(g_hbm.at[pl.ds(start, ET), :],
                                  g_tile.at[slot], sem_g.at[slot]),
            pltpu.make_async_copy(ld_hbm.at[pl.ds(start // 128, ER), :, :],
                                  ld_tile.at[slot], sem_l.at[slot]),
            pltpu.make_async_copy(ids_hbm.at[pl.ds(start // 128, ER), :],
                                  ids_tile.at[slot], sem_i.at[slot]),
        )

    @pl.when(num_tiles > 0)
    def _():
        for d in tile_dma(0, 0):
            d.start()

    dk_ref[:] = jnp.zeros((NB, DS), dk_ref.dtype)
    dv_ref[:] = jnp.zeros((NB, DV), dv_ref.dtype)

    def body(t, _):
        slot = t % 2
        nxt = (t + 1) % 2

        @pl.when(t + 1 < num_tiles)
        def _():
            for d in tile_dma(nxt, t + 1):
                d.start()

        for d in tile_dma(slot, t):
            d.wait()

        rows = jax.lax.broadcasted_iota(jnp.int32, (NB, 128), 0)
        mask_parts = []
        for r in range(ER):
            local = ids_tile[slot, r].reshape(1, 128) - row_base
            mask_parts.append(rows == local)
        mask = jnp.concatenate(mask_parts, axis=1)          # [NB, ET]

        def edge_row(idx):
            """[1, ET] per-edge values assembled from the 128-lane rows —
            same trick as the id mask (lane-major, no transpose)."""
            return jnp.concatenate(
                [ld_tile[slot, r, idx].reshape(1, 128) for r in range(ER)],
                axis=1)

        dk_new, dv_new = [], []
        for h in range(H):
            k_h = k_ref[:, h * DSH:(h + 1) * DSH]           # [NB, DSH]
            q_h = q_tile[slot, :, h * DSH:(h + 1) * DSH]    # [ET, DSH]
            s_raw = jax.lax.dot_general(
                k_h, q_h, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)          # [NB, ET]
            if leaky_slope:
                s_act = jnp.where(s_raw >= 0, s_raw, s_raw * leaky_slope)
            else:
                s_act = s_raw
            lse_e = edge_row(h)                              # [1, ET]
            delta_e = edge_row(H + h)                        # [1, ET]
            p = jnp.exp(jnp.where(mask, s_act - lse_e, -1e30))
            v_h = v_ref[:, h * DVH:(h + 1) * DVH]           # [NB, DVH]
            g_h = g_tile[slot, :, h * DVH:(h + 1) * DVH]    # [ET, DVH]
            gv = jax.lax.dot_general(
                v_h, g_h, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)          # [NB, ET]
            ds = p * (gv - delta_e)
            if leaky_slope:
                ds = ds * jnp.where(s_raw >= 0, 1.0, leaky_slope)
            dk_new.append(jax.lax.dot(
                ds.astype(q_h.dtype), q_h,
                preferred_element_type=jnp.float32))         # [NB, DSH]
            dv_new.append(jax.lax.dot(
                p.astype(g_h.dtype), g_h,
                preferred_element_type=jnp.float32))         # [NB, DVH]
        dk_ref[:, :H * DSH] = (dk_ref[:, :H * DSH]
                               + jnp.concatenate(dk_new, axis=1)
                               .astype(dk_ref.dtype))
        dv_ref[:, :H * DVH] = (dv_ref[:, :H * DVH]
                               + jnp.concatenate(dv_new, axis=1)
                               .astype(dv_ref.dtype))
        return ()

    jax.lax.fori_loop(0, num_tiles, body, ())


@functools.partial(jax.jit, static_argnames=("num_segments", "num_heads",
                                             "nb", "et", "leaky_slope",
                                             "interpret", "dsh", "dvh"))
def _fused_attention_bwd(q, k, v, g, out, lse,
                         csc_v, csc_ids, csc_ts, csc_te,
                         csr_v, csr_ids, csr_ts, csr_te,
                         num_segments, num_heads: int, leaky_slope: float,
                         nb: int, et: int, interpret: bool, dsh, dvh):
    DS, DV = q.shape[1], v.shape[1]
    H = num_heads
    DSH = dsh or DS // H
    DVH = dvh or DV // H
    n_pad = (num_segments + nb - 1) // nb * nb
    G = n_pad // nb

    def pad_rows(x):
        return jnp.zeros((n_pad,) + x.shape[1:], x.dtype
                         ).at[:num_segments].set(x)

    delta = jnp.sum(g[:, :H * DVH].reshape(-1, H, DVH)
                    * out[:, :H * DVH].reshape(-1, H, DVH), axis=-1)

    # ---- CSC pass: dq --------------------------------------------------
    k_e = jnp.take(k, csc_v, axis=0)
    v_e = jnp.take(v, csc_v, axis=0)
    dq = pl.pallas_call(
        functools.partial(_attn_bwd_dq_kernel, NB=nb, ET=et, DS=DS, DV=DV,
                          H=H, DSH=DSH, DVH=DVH, leaky_slope=leaky_slope),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(G,),
            in_specs=[
                pl.BlockSpec((nb, DS), lambda i, *_: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((nb, DV), lambda i, *_: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((nb, H), lambda i, *_: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((nb, H), lambda i, *_: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
                pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
                pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            ],
            out_specs=pl.BlockSpec((nb, DS), lambda i, *_: (i, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, et, DS), k_e.dtype),
                pltpu.VMEM((2, et, DV), v_e.dtype),
                pltpu.VMEM((2, et // 128, 128), jnp.int32),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((n_pad, DS), q.dtype),
        interpret=interpret,
    )(csc_ts, csc_te, pad_rows(q), pad_rows(g), pad_rows(lse),
      pad_rows(delta), k_e, v_e, csc_ids)

    # ---- CSR pass: dk, dv ----------------------------------------------
    q_e = jnp.take(q, csr_v, axis=0)
    g_e = jnp.take(g, csr_v, axis=0)
    # per-edge lse/delta in the ids-style lane-major layout
    # [Ep/128, 2H, 128] so the kernel assembles [1, ET] rows with no
    # transpose (one gather of the [N, 2H] pair — row-count-bound, cheap)
    ld = jnp.concatenate([lse.astype(q.dtype), delta.astype(q.dtype)],
                         axis=1)                               # [N, 2H]
    ld_e = jnp.take(ld, csr_v, axis=0)                         # [Ep, 2H]
    ld_e = ld_e.reshape(-1, 128, 2 * H).transpose(0, 2, 1)     # lane-major
    dk, dv = pl.pallas_call(
        functools.partial(_attn_bwd_dkv_kernel, NB=nb, ET=et, DS=DS,
                          DV=DV, H=H, DSH=DSH, DVH=DVH,
                          leaky_slope=leaky_slope),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(G,),
            in_specs=[
                pl.BlockSpec((nb, DS), lambda i, *_: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((nb, DV), lambda i, *_: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
                pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
                pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
                pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            ],
            out_specs=(pl.BlockSpec((nb, DS), lambda i, *_: (i, 0),
                                    memory_space=pltpu.VMEM),
                       pl.BlockSpec((nb, DV), lambda i, *_: (i, 0),
                                    memory_space=pltpu.VMEM)),
            scratch_shapes=[
                pltpu.VMEM((2, et, DS), q_e.dtype),
                pltpu.VMEM((2, et, DV), g_e.dtype),
                pltpu.VMEM((2, et // 128, 2 * H, 128), ld_e.dtype),
                pltpu.VMEM((2, et // 128, 128), jnp.int32),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=(jax.ShapeDtypeStruct((n_pad, DS), k.dtype),
                   jax.ShapeDtypeStruct((n_pad, DV), v.dtype)),
        interpret=interpret,
    )(csr_ts, csr_te, pad_rows(k), pad_rows(v), q_e, g_e, ld_e, csr_ids)

    return (dq[:num_segments], dk[:num_segments], dv[:num_segments])


def _xla_reference(q, k, v, src, dst, num_segments, num_heads, leaky_slope,
                   dsh=None, dvh=None):
    """Unfused composition (gather → scores → segment softmax → weighted
    aggregation); used for the backward pass and as the numerics oracle."""
    DS, DV = q.shape[1], v.shape[1]
    DSH = dsh or DS // num_heads
    DVH = dvh or DV // num_heads
    E = src.shape[0]
    q_e = jnp.take(q[:, :num_heads * DSH], dst, axis=0).reshape(
        E, num_heads, DSH)
    k_e = jnp.take(k[:, :num_heads * DSH], src, axis=0).reshape(
        E, num_heads, DSH)
    v_e = jnp.take(v[:, :num_heads * DVH], src, axis=0).reshape(
        E, num_heads, DVH)
    s = jnp.sum(q_e * k_e, axis=-1)                      # [E, H]
    if leaky_slope:
        s = jnp.where(s >= 0, s, s * leaky_slope)
    from ..segment import segment_softmax
    p = segment_softmax(s, dst, num_segments=num_segments)
    msg = (v_e * p[..., None]).reshape(E, num_heads * DVH)
    out = jax.ops.segment_sum(msg, dst, num_segments=num_segments)
    if num_heads * DVH < DV:
        out = jnp.concatenate(
            [out, jnp.zeros((num_segments, DV - num_heads * DVH),
                            out.dtype)], axis=1)
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9, 10, 11))
def fused_graph_attention(q, k, v, layout: BlockedLayout, bwd_aux,
                          num_heads: int, leaky_slope: float = 0.0,
                          nb: int = 256, et: int = 1024,
                          interpret: bool = False, dsh=None, dvh=None):
    """out[r] = Σ_{e: dst=r} softmax_r(q[r]·k[src_e]) · v[src_e].

    Args:
      q: [N, DS] destination-side score features (DS = H·dsh, lane-aligned).
      k: [N, DS] source-side score features.
      v: [N, DV] value features (DV = H·dvh).
      layout: the Graph's CSC BlockedLayout.
      bwd_aux: None (XLA-recompute backward), or ``(csr_layout, perm)``
        where ``perm[j]`` maps CSC edge position j to its CSR position —
        enables the analytical flash-style backward built from the
        weighted-SpMM kernel (3 kernel calls, no scatter).
      num_heads: H.
      leaky_slope: if nonzero, leaky_relu applied to raw scores (GAT).
    """
    out, _ = _fused_attention_fwd(q, k, v, layout.padded_v,
                                  layout.padded_ids, layout.tile_starts,
                                  layout.tile_ends, layout.num_segments,
                                  num_heads, leaky_slope, nb, et, interpret,
                                  dsh, dvh)
    return out


def _fga_fwd(q, k, v, layout, bwd_aux, num_heads, leaky_slope, nb, et,
             interpret, dsh, dvh):
    out, lse = _fused_attention_fwd(
        q, k, v, layout.padded_v, layout.padded_ids, layout.tile_starts,
        layout.tile_ends, layout.num_segments, num_heads, leaky_slope,
        nb, et, interpret, dsh, dvh)
    return out, (q, k, v, layout, bwd_aux, out, lse)


def _fga_bwd(num_heads, leaky_slope, nb, et, interpret, dsh, dvh, res, g):
    q, k, v, layout, bwd_aux, out, lse = res
    H = num_heads

    import os as _os
    use_fused = (bwd_aux is not None
                 and _os.environ.get("PGL_TPU_ATTN_XLA_BWD", "0") != "1")
    if not use_fused:
        # Fallback: differentiate the unfused composition (pays XLA's
        # unsorted scatter-adds; only used when no CSR layout exists or
        # PGL_TPU_ATTN_XLA_BWD=1 forces it for A/B measurement).
        E = layout.num_edges
        src = layout.padded_v[:E]
        dst = layout.padded_ids.reshape(-1)[:E]

        def ref(q, k, v):
            return _xla_reference(q, k, v, src, dst, layout.num_segments,
                                  H, leaky_slope, dsh, dvh)

        _, vjp = jax.vjp(ref, q, k, v)
        dq, dk, dv = vjp(g)
        return dq, dk, dv, None, None

    csr = bwd_aux[0]
    dq, dk, dv = _fused_attention_bwd(
        q, k, v, g, out, lse,
        layout.padded_v, layout.padded_ids, layout.tile_starts,
        layout.tile_ends,
        csr.padded_v, csr.padded_ids, csr.tile_starts, csr.tile_ends,
        layout.num_segments, H, leaky_slope, nb, et, interpret, dsh, dvh)
    return dq, dk, dv, None, None


fused_graph_attention.defvjp(_fga_fwd, _fga_bwd)


def gat_score_features(attn_dst, attn_src, pad_to: int = 128):
    """Reduce GAT's additive score ``a_dst[r] + a_src[s]`` to the dot form:
    per head, q' = [a_dst_h, 1], k' = [1, a_src_h], zero-padded to
    ``pad_to`` lanes. Returns (q', k', heads_dsh)."""
    N, H = attn_dst.shape
    dsh = max(2, pad_to // H)
    q = jnp.zeros((N, H * dsh), attn_dst.dtype)
    k = jnp.zeros((N, H * dsh), attn_src.dtype)
    for h in range(H):
        q = q.at[:, h * dsh].set(attn_dst[:, h])
        q = q.at[:, h * dsh + 1].set(1.0)
        k = k.at[:, h * dsh].set(1.0)
        k = k.at[:, h * dsh + 1].set(attn_src[:, h])
    return q, k


def logits_score_features(node_logits_dst, num_heads, pad_to: int = 128):
    """Precomputed per-(dst)-node logits as dot form (rarely needed; for
    per-edge logits use the unfused path)."""
    raise NotImplementedError
