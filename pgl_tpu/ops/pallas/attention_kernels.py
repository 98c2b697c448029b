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

  * CSC pass (grid over *dst* row blocks): streams the forward's gathered
    ``k|v`` edge stream (kept as a residual — ZERO new gathers), recomputes
    ``p = exp(s − lse)``, forms ``ds`` and accumulates
    ``dq = ds @ k`` — all MXU.
  * CSR pass (grid over *src* row blocks): ``k``/``v`` rows are resident;
    ``q``, the cotangent ``g``, and the per-edge ``lse``/``delta`` pair
    ride ONE fused gathered stream (trailing 128-lane chunk, transposed
    in-kernel); accumulates ``dk = ds @ q`` and ``dv = p @ g`` together.

The TPU row gather is row-count-bound (~10 ns/row regardless of width),
so the whole train step pays exactly TWO gathers per layer — one fused
``k|v`` in the forward (reused by the CSC pass) and one fused ``q|g|lse``
in the CSR pass — instead of the naive seven.

Two score modes share these kernels:
  * dot (``fused_graph_attention``): true q·k scores on the MXU, at
    HIGHEST precision (fwd/bwd lowering consistency — see in-kernel note);
  * additive (``fused_gat_attention``): GAT's a_dst + a_src as an exact
    f32 VPU outer sum — a_src rides the kv stream, the per-edge a_dst
    rides the CSR ld chunk; d a_dst / d a_src are per-head row sums.
    Attention-prob dropout runs IN-KERNEL (reference semantics: mask on
    the post-softmax probs, denominator undropped): a counter-based hash
    of the CSC edge index reproduces the identical mask in all three
    passes, with ``ds = q·gv − p·delta`` (dropped q, undropped p).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .segment_kernels import _take_ib, BlockedLayout

__all__ = ["fused_graph_attention", "fused_gat_attention",
           "gat_score_features"]



def _drop_keep(idx, seed, h, rate):
    """Deterministic per-(edge, head) Bernoulli(1-rate) keep mask from the
    edge's CSC index — a counter-based multiplicative hash, so the forward
    and both backward passes (which walk the edges in different orders)
    reproduce the identical mask from the identical (idx, seed, h).

    int32 arithmetic wraps (two's complement) on both XLA and Mosaic; the
    sign bit is cleared before the threshold compare (2^-31 bias)."""
    hc = (h * 0x632BE5AB) & 0xFFFFFFFF
    if hc >= 1 << 31:
        hc -= 1 << 32
    x = idx ^ (seed + jnp.int32(hc))
    x = x * jnp.int32(-1640531535)            # 0x9E3779B1
    x = x ^ jax.lax.shift_right_logical(x, 16)
    x = x * jnp.int32(-2048144789)            # 0x85EBCA6B
    x = x ^ jax.lax.shift_right_logical(x, 13)
    thresh = jnp.int32(int((1.0 - rate) * (1 << 31)))
    return (x & jnp.int32(0x7FFFFFFF)) < thresh


def _attn_kernel(tile_starts_ref, tile_ends_ref, seed_ref,
                 q_ref,                 # [NB, DS] VMEM (this block's rows)
                 kv_ref,                # [Ep, DS+DV] HBM (gathered, CSC)
                 ids_ref,               # [Ep/128, 128] HBM int32
                 out_ref,               # [NB, DV] VMEM
                 lse_ref,               # [NB, H] VMEM
                 kv_tile, ids_tile, ast, acc, m_s, l_s, sem_kv, sem_i,
                 *, NB: int, ET: int, DS: int, DV: int, H: int,
                 DSH: int, DVH: int, leaky_slope: float, additive: bool,
                 drop_rate: float):
    i = pl.program_id(0)
    e0 = tile_starts_ref[i]
    e1 = tile_ends_ref[i]
    num_tiles = (e1 - e0 + ET - 1) // ET
    row_base = i * NB
    ER = ET // 128

    def tile_dma(slot, t):
        start = pl.multiple_of(e0 + t * ET, ET)
        return (
            pltpu.make_async_copy(kv_ref.at[pl.ds(start, ET), :],
                                  kv_tile.at[slot], sem_kv.at[slot]),
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

        if additive:
            # GAT additive scores: a_src rides the leading 128-col chunk of
            # the kv stream; transpose it once per tile so each head's
            # per-edge values are a [1, ET] row. Scores are then an exact
            # f32 outer sum — no matmul, no MXU rounding at all.
            ast[:] = jnp.transpose(kv_tile[slot, :, :128]
                                   ).astype(jnp.float32)

        if drop_rate:
            # per-edge CSC index (edges of this tile are contiguous)
            start = pl.multiple_of(e0 + t * ET, ET)
            eidx = start + jax.lax.broadcasted_iota(jnp.int32, (1, ET), 1)
            seed = seed_ref[0]

        m_prev = m_s[:]
        l_prev = l_s[:]
        acc_prev = acc[:]
        m_new_h = []
        l_new_h = []
        acc_new_h = []
        for h in range(H):
            if additive:
                s = q_ref[:, h][:, None] + ast[h:h + 1, :]   # [NB, ET]
            else:
                q_h = q_ref[:, h * DSH:(h + 1) * DSH]        # [NB, DSH]
                k_h = kv_tile[slot, :, h * DSH:(h + 1) * DSH]
                # HIGHEST on ALL score dots (fwd + both bwd recomputes):
                # the MXU default truncates f32 inputs to bf16 and, with
                # excess precision allowed, each call site may lower
                # differently — the backward's p = exp(s - lse) then
                # disagrees with the forward's softmax and
                # ds = p*(gv - delta) loses its cancellation (measured 0.2
                # rel err in dq on chip; 5e-3 with exact scores).
                s = jax.lax.dot_general(
                    q_h, k_h, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)     # [NB, ET]
            if leaky_slope:
                s = jnp.where(s >= 0, s, s * leaky_slope)
            s = jnp.where(mask, s, -1e30)
            tile_max = jnp.max(s, axis=1)                    # [NB]
            m_new = jnp.maximum(m_prev[:, h], tile_max)
            scale = jnp.exp(m_prev[:, h] - m_new)            # [NB]
            p = jnp.exp(s - m_new[:, None])
            p = jnp.where(mask, p, 0.0)
            l_new = l_prev[:, h] * scale + jnp.sum(p, axis=1)
            if drop_rate:
                # reference semantics: dropout on the *post-softmax* probs —
                # the softmax denominator (l, lse) stays undropped; only
                # the value aggregation sees the mask.
                p = jnp.where(_drop_keep(eidx, seed, h, drop_rate), p, 0.0)
            v_h = kv_tile[slot, :,
                          DS + h * DVH:DS + (h + 1) * DVH]   # [ET, DVH]
            # (default precision: output-side rounding only, no
            # cancellation — bf16-level grad noise is acceptable, HIGHEST
            # here measured 2x the whole train step)
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
    inv_keep = 1.0 / (1.0 - drop_rate) if drop_rate else 1.0
    out_parts = []
    for h in range(H):
        denom = jnp.maximum(l[:, h], 1e-30)[:, None]
        out_parts.append(acc[:, h * DVH:(h + 1) * DVH] * (inv_keep / denom))
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
                                             "interpret", "dsh", "dvh",
                                             "additive", "drop_rate"))
def _fused_attention_fwd(q, k, v, padded_v, padded_ids, tile_starts,
                         tile_ends, num_segments, num_heads: int,
                         leaky_slope: float, nb: int, et: int,
                         interpret: bool, dsh=None, dvh=None,
                         additive: bool = False, drop_rate: float = 0.0,
                         drop_seed=None):
    DS = q.shape[1]
    DV = v.shape[1]
    dsh = dsh or DS // num_heads
    dvh = dvh or DV // num_heads
    n_pad = (num_segments + nb - 1) // nb * nb
    G = n_pad // nb
    q_pad = jnp.zeros((n_pad, DS), q.dtype).at[:num_segments].set(q)
    # ONE row gather for both streams — the gather is row-count-bound
    # (~10 ns/row regardless of width), so fusing k|v halves its cost.
    kv_e = _take_ib(jnp.concatenate([k, v], axis=1), padded_v)
    seed_arr = (jnp.zeros((1,), jnp.int32) if drop_seed is None
                else jnp.asarray(drop_seed, jnp.int32).reshape(1))
    out = pl.pallas_call(
        functools.partial(_attn_kernel, NB=nb, ET=et, DS=DS, DV=DV,
                          H=num_heads, DSH=dsh, DVH=dvh,
                          leaky_slope=leaky_slope, additive=additive,
                          drop_rate=drop_rate),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(G,),
            in_specs=[
                pl.BlockSpec((nb, DS), lambda i, *_: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
                pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            ],
            out_specs=(pl.BlockSpec((nb, DV), lambda i, *_: (i, 0),
                                    memory_space=pltpu.VMEM),
                       pl.BlockSpec((nb, num_heads), lambda i, *_: (i, 0),
                                    memory_space=pltpu.VMEM)),
            scratch_shapes=[
                pltpu.VMEM((2, et, DS + DV), kv_e.dtype),
                pltpu.VMEM((2, et // 128, 128), jnp.int32),
                pltpu.VMEM((128 if additive else 8, et), jnp.float32),
                pltpu.VMEM((nb, DV), jnp.float32),
                pltpu.VMEM((nb, num_heads), jnp.float32),
                pltpu.VMEM((nb, num_heads), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=(jax.ShapeDtypeStruct((n_pad, DV), v.dtype),
                   jax.ShapeDtypeStruct((n_pad, num_heads), jnp.float32)),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )(tile_starts, tile_ends, seed_arr, q_pad, kv_e, padded_ids)
    out, lse = out
    return out[:num_segments], lse[:num_segments], kv_e


def _attn_bwd_dq_kernel(tile_starts_ref, tile_ends_ref, seed_ref,
                        q_ref,                  # [NB, DS] VMEM (dst rows)
                        g_ref,                  # [NB, DV] VMEM (cotangent)
                        lse_ref,                # [NB, H] VMEM
                        delta_ref,              # [NB, H] VMEM (Σ g·out)
                        kv_hbm,                 # [Ep, DS+DV] HBM (CSC,
                                                #   reused from the fwd)
                        ids_hbm,                # [Ep/128, 128] HBM int32
                        dq_ref,                 # [NB, DS] VMEM out
                        kv_tile, ids_tile, ast, sem_kv, sem_i,
                        *, NB: int, ET: int, DS: int, DV: int, H: int,
                        DSH: int, DVH: int, leaky_slope: float,
                        additive: bool, drop_rate: float):
    i = pl.program_id(0)
    e0 = tile_starts_ref[i]
    e1 = tile_ends_ref[i]
    num_tiles = (e1 - e0 + ET - 1) // ET
    row_base = i * NB
    ER = ET // 128

    def tile_dma(slot, t):
        start = pl.multiple_of(e0 + t * ET, ET)
        return (
            pltpu.make_async_copy(kv_hbm.at[pl.ds(start, ET), :],
                                  kv_tile.at[slot], sem_kv.at[slot]),
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

        if additive:
            ast[:] = jnp.transpose(kv_tile[slot, :, :128]
                                   ).astype(jnp.float32)

        if drop_rate:
            start = pl.multiple_of(e0 + t * ET, ET)
            eidx = start + jax.lax.broadcasted_iota(jnp.int32, (1, ET), 1)
            seed = seed_ref[0]

        dq_new = []
        for h in range(H):
            if additive:
                s_raw = q_ref[:, h][:, None] + ast[h:h + 1, :]
            else:
                q_h = q_ref[:, h * DSH:(h + 1) * DSH]        # [NB, DSH]
                k_h = kv_tile[slot, :, h * DSH:(h + 1) * DSH]
                s_raw = jax.lax.dot_general(
                    q_h, k_h, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)     # [NB, ET]
            if leaky_slope:
                s_act = jnp.where(s_raw >= 0, s_raw, s_raw * leaky_slope)
            else:
                s_act = s_raw
            # exact probs from the saved LSE (no online pass needed)
            p = jnp.exp(jnp.where(mask, s_act - lse_ref[:, h][:, None],
                                  -1e30))                    # [NB, ET]
            if drop_rate:
                # dropped probs q feed the gv term; the softmax-Jacobian
                # delta term keeps the UNdropped p:
                # ds = q*gv - p*delta (q == p when rate == 0)
                q_eff = jnp.where(_drop_keep(eidx, seed, h, drop_rate),
                                  p, 0.0) * (1.0 / (1.0 - drop_rate))
            else:
                q_eff = p
            g_h = g_ref[:, h * DVH:(h + 1) * DVH]           # [NB, DVH]
            v_h = kv_tile[slot, :,
                          DS + h * DVH:DS + (h + 1) * DVH]   # [ET, DVH]
            gv = jax.lax.dot_general(
                g_h, v_h, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)          # [NB, ET]
            ds = q_eff * gv - p * delta_ref[:, h][:, None]
            if leaky_slope:
                ds = ds * jnp.where(s_raw >= 0, 1.0, leaky_slope)
            if additive:
                # d a_dst[r, h] = Σ_e ds[r, e]
                dq_new.append(jnp.sum(ds, axis=1)[:, None])  # [NB, 1]
            else:
                dq_new.append(jax.lax.dot(
                    ds.astype(k_h.dtype), k_h,
                    preferred_element_type=jnp.float32))     # [NB, DSH]
        upd = jnp.concatenate(dq_new, axis=1)
        W_out = H if additive else H * DSH
        dq_ref[:, :W_out] = (dq_ref[:, :W_out]
                             + upd.astype(dq_ref.dtype))
        return ()

    jax.lax.fori_loop(0, num_tiles, body, ())


def _attn_bwd_dkv_kernel(tile_starts_ref, tile_ends_ref, seed_ref,
                         k_ref,                 # [NB, DS] VMEM (src rows)
                         v_ref,                 # [NB, DV] VMEM (src rows)
                         qgl_hbm,               # [Ep, DS+DV+LDW] HBM: one
                                                #   gathered CSR stream of
                                                #   q | g | (lse,delta)
                         eidx_hbm,              # [Ep/128, 128] HBM int32:
                                                #   CSC index of each CSR
                                                #   edge (dropout only)
                         ids_hbm,               # [Ep/128, 128] HBM int32
                         dk_ref,                # [NB, DS] VMEM out
                         dv_ref,                # [NB, DV] VMEM out
                         qgl_tile, ldt, ids_tile, eidx_tile,
                         sem_qgl, sem_i, sem_e,
                         *, NB: int, ET: int, DS: int, DV: int, LDW: int,
                         H: int, DSH: int, DVH: int, leaky_slope: float,
                         additive: bool, drop_rate: float):
    # additive mode: no q part in the stream (QW=0); the ld chunk carries
    # lse (rows 0..H-1), delta (H..2H-1) AND the per-edge a_dst (2H..3H-1).
    QW = 0 if additive else DS
    i = pl.program_id(0)
    e0 = tile_starts_ref[i]
    e1 = tile_ends_ref[i]
    num_tiles = (e1 - e0 + ET - 1) // ET
    row_base = i * NB
    ER = ET // 128

    def tile_dma(slot, t):
        start = pl.multiple_of(e0 + t * ET, ET)
        copies = [
            pltpu.make_async_copy(qgl_hbm.at[pl.ds(start, ET), :],
                                  qgl_tile.at[slot], sem_qgl.at[slot]),
            pltpu.make_async_copy(ids_hbm.at[pl.ds(start // 128, ER), :],
                                  ids_tile.at[slot], sem_i.at[slot]),
        ]
        if drop_rate:
            copies.append(
                pltpu.make_async_copy(
                    eidx_hbm.at[pl.ds(start // 128, ER), :],
                    eidx_tile.at[slot], sem_e.at[slot]))
        return copies

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

        # per-edge lse/delta arrive as trailing COLUMNS of the fused
        # stream; transpose each 128-col chunk once per tile so heads can
        # slice [1, ET] rows out of it.
        for w in range(LDW // 128):
            c0 = QW + DV + w * 128
            ldt[w * 128:(w + 1) * 128, :] = jnp.transpose(
                qgl_tile[slot, :, c0:c0 + 128]).astype(jnp.float32)

        if drop_rate:
            seed = seed_ref[0]
            eidx = jnp.concatenate(
                [eidx_tile[slot, r].reshape(1, 128) for r in range(ER)],
                axis=1)                                      # [1, ET]

        dk_new, dv_new = [], []
        for h in range(H):
            if additive:
                s_raw = k_ref[:, h][:, None] + ldt[2 * H + h:2 * H + h + 1, :]
            else:
                k_h = k_ref[:, h * DSH:(h + 1) * DSH]        # [NB, DSH]
                q_h = qgl_tile[slot, :, h * DSH:(h + 1) * DSH]
                s_raw = jax.lax.dot_general(
                    k_h, q_h, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)     # [NB, ET]
            if leaky_slope:
                s_act = jnp.where(s_raw >= 0, s_raw, s_raw * leaky_slope)
            else:
                s_act = s_raw
            lse_e = ldt[h:h + 1, :]                          # [1, ET]
            delta_e = ldt[H + h:H + h + 1, :]                # [1, ET]
            p = jnp.exp(jnp.where(mask, s_act - lse_e, -1e30))
            if drop_rate:
                q_eff = jnp.where(_drop_keep(eidx, seed, h, drop_rate),
                                  p, 0.0) * (1.0 / (1.0 - drop_rate))
            else:
                q_eff = p
            v_h = v_ref[:, h * DVH:(h + 1) * DVH]           # [NB, DVH]
            g_h = qgl_tile[slot, :,
                           QW + h * DVH:QW + (h + 1) * DVH]  # [ET, DVH]
            gv = jax.lax.dot_general(
                v_h, g_h, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)          # [NB, ET]
            ds = q_eff * gv - p * delta_e
            if leaky_slope:
                ds = ds * jnp.where(s_raw >= 0, 1.0, leaky_slope)
            if additive:
                # d a_src[r, h] = Σ_e ds[r, e]
                dk_new.append(jnp.sum(ds, axis=1)[:, None])  # [NB, 1]
            else:
                dk_new.append(jax.lax.dot(
                    ds.astype(q_h.dtype), q_h,
                    preferred_element_type=jnp.float32))     # [NB, DSH]
            dv_new.append(jax.lax.dot(
                q_eff.astype(g_h.dtype), g_h,
                preferred_element_type=jnp.float32))         # [NB, DVH]
        Wk = H if additive else H * DSH
        dk_ref[:, :Wk] = (dk_ref[:, :Wk]
                          + jnp.concatenate(dk_new, axis=1)
                          .astype(dk_ref.dtype))
        dv_ref[:, :H * DVH] = (dv_ref[:, :H * DVH]
                               + jnp.concatenate(dv_new, axis=1)
                               .astype(dv_ref.dtype))
        return ()

    jax.lax.fori_loop(0, num_tiles, body, ())


@functools.partial(jax.jit, static_argnames=("num_segments", "num_heads",
                                             "nb", "et", "leaky_slope",
                                             "interpret", "dsh", "dvh",
                                             "additive", "drop_rate"))
def _fused_attention_bwd(q, k, v, g, out, lse, kv_e,
                         csc_v, csc_ids, csc_ts, csc_te,
                         csr_v, csr_ids, csr_ts, csr_te,
                         num_segments, num_heads: int, leaky_slope: float,
                         nb: int, et: int, interpret: bool, dsh, dvh,
                         additive: bool = False, drop_rate: float = 0.0,
                         drop_seed=None, csr_perm=None):
    DS, DV = q.shape[1], v.shape[1]
    H = num_heads
    DSH = dsh or DS // H
    DVH = dvh or DV // H
    n_pad = (num_segments + nb - 1) // nb * nb
    G = n_pad // nb
    # the src table may be a different node space than the dst rows (e.g.
    # a halo shard's [local + remote] table): its row count comes from k/v
    num_src = k.shape[0]
    ns_pad = (num_src + nb - 1) // nb * nb
    Gs = ns_pad // nb

    def pad_rows(x, to=None, n=None):
        to = to or n_pad
        n = n or num_segments
        return jnp.zeros((to,) + x.shape[1:], x.dtype).at[:n].set(x)

    delta = jnp.sum(g[:, :H * DVH].reshape(-1, H, DVH)
                    * out[:, :H * DVH].reshape(-1, H, DVH), axis=-1)

    # ---- CSC pass: dq --------------------------------------------------
    if kv_e is None:
        # residual not kept (size cap) — re-gather, still one fused gather
        kv_e = _take_ib(jnp.concatenate([k, v], axis=1), csc_v)
    seed_arr = (jnp.zeros((1,), jnp.int32) if drop_seed is None
                else jnp.asarray(drop_seed, jnp.int32).reshape(1))
    dq = pl.pallas_call(
        functools.partial(_attn_bwd_dq_kernel, NB=nb, ET=et, DS=DS, DV=DV,
                          H=H, DSH=DSH, DVH=DVH, leaky_slope=leaky_slope,
                          additive=additive, drop_rate=drop_rate),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
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
            ],
            out_specs=pl.BlockSpec((nb, DS), lambda i, *_: (i, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, et, DS + DV), kv_e.dtype),
                pltpu.VMEM((2, et // 128, 128), jnp.int32),
                pltpu.VMEM((128 if additive else 8, et), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((n_pad, DS), q.dtype),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )(csc_ts, csc_te, seed_arr, pad_rows(q), pad_rows(g), pad_rows(lse),
      pad_rows(delta), kv_e, csc_ids)

    # ---- CSR pass: dk, dv ----------------------------------------------
    # ONE gathered stream of q | g | (lse, delta): the gather is
    # row-count-bound, so fusing the three streams (q, g, and the per-edge
    # lse/delta pair) cuts its cost 3x. The lse/delta pair rides as
    # trailing columns padded to a full 128-lane chunk; the kernel
    # transposes that chunk per tile to recover [1, ET] rows.
    if additive:
        # a_dst joins lse/delta in the ld chunk — the q stream vanishes
        # entirely (3H values ≤ 128 lanes).
        LDW = 128
        ld = jnp.zeros((num_segments, LDW), q.dtype)
        ld = ld.at[:, :H].set(lse.astype(q.dtype))
        ld = ld.at[:, H:2 * H].set(delta.astype(q.dtype))
        ld = ld.at[:, 2 * H:3 * H].set(q[:, :H])
        qgl = jnp.concatenate([g, ld], axis=1)      # [N, DV+LDW]
    else:
        LDW = -(-2 * H // 128) * 128
        ld = jnp.zeros((num_segments, LDW), q.dtype)
        ld = ld.at[:, :H].set(lse.astype(q.dtype))
        ld = ld.at[:, H:2 * H].set(delta.astype(q.dtype))
        qgl = jnp.concatenate([q, g, ld], axis=1)   # [N, DS+DV+LDW]
    qgl_e = _take_ib(qgl, csr_v)
    if drop_rate:
        # CSC index of every CSR edge position, lane-major like the ids —
        # a cheap sequential side stream (NOT a gather); lets both backward
        # passes rebuild the forward's exact dropout mask.
        Ep_csr = csr_ids.size
        eidx_lm = jnp.full((Ep_csr,), -1, jnp.int32).at[
            :csr_perm.shape[0]].set(csr_perm).reshape(-1, 128)
    else:
        eidx_lm = jnp.zeros((csr_ids.size // 128, 128), jnp.int32)
    dk, dv = pl.pallas_call(
        functools.partial(_attn_bwd_dkv_kernel, NB=nb, ET=et, DS=DS,
                          DV=DV, LDW=LDW, H=H, DSH=DSH, DVH=DVH,
                          leaky_slope=leaky_slope, additive=additive,
                          drop_rate=drop_rate),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(Gs,),
            in_specs=[
                pl.BlockSpec((nb, DS), lambda i, *_: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((nb, DV), lambda i, *_: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
                pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
                pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            ],
            out_specs=(pl.BlockSpec((nb, DS), lambda i, *_: (i, 0),
                                    memory_space=pltpu.VMEM),
                       pl.BlockSpec((nb, DV), lambda i, *_: (i, 0),
                                    memory_space=pltpu.VMEM)),
            scratch_shapes=[
                pltpu.VMEM((2, et, (0 if additive else DS) + DV + LDW),
                           qgl_e.dtype),
                pltpu.VMEM((LDW, et), jnp.float32),
                pltpu.VMEM((2, et // 128, 128), jnp.int32),
                pltpu.VMEM((2, et // 128, 128), jnp.int32),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=(jax.ShapeDtypeStruct((ns_pad, DS), k.dtype),
                   jax.ShapeDtypeStruct((ns_pad, DV), v.dtype)),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )(csr_ts, csr_te, seed_arr, pad_rows(k, ns_pad, num_src),
      pad_rows(v, ns_pad, num_src), qgl_e, eidx_lm, csr_ids)

    return (dq[:num_segments], dk[:num_src], dv[:num_src])


def _apply_hash_dropout(p, rate, seed, H):
    """The fused kernels' exact dropout (hash of the CSC edge position),
    applied to [E, H] probs in XLA — keeps the unfused fallback/oracle
    bit-consistent with the fused forward."""
    E = p.shape[0]
    idx = jnp.arange(E, dtype=jnp.int32)
    seed = jnp.int32(0) if seed is None else jnp.asarray(seed, jnp.int32)
    keep = jnp.stack([_drop_keep(idx, seed, h, rate) for h in range(H)],
                     axis=1)
    return jnp.where(keep, p, 0.0) * (1.0 / (1.0 - rate))


def _xla_additive_reference(a_dst, a_src, v, src, dst, num_segments,
                            leaky_slope, dvh, DV, attn_drop=0.0,
                            drop_seed=None):
    """Unfused additive-score composition; numerics oracle and XLA-backward
    fallback for :func:`fused_gat_attention`."""
    H = a_dst.shape[1]
    DVH = dvh or DV // H
    E = src.shape[0]
    s = jnp.take(a_dst, dst, axis=0) + jnp.take(a_src, src, axis=0)  # [E, H]
    if leaky_slope:
        s = jnp.where(s >= 0, s, s * leaky_slope)
    from ..segment import segment_softmax
    p = segment_softmax(s, dst, num_segments=num_segments)
    if attn_drop:
        p = _apply_hash_dropout(p, attn_drop, drop_seed, H)
    v_e = jnp.take(v[:, :H * DVH], src, axis=0).reshape(E, H, DVH)
    msg = (v_e * p[..., None]).reshape(E, H * DVH)
    out = jax.ops.segment_sum(msg, dst, num_segments=num_segments)
    if H * DVH < DV:
        out = jnp.concatenate(
            [out, jnp.zeros((num_segments, DV - H * DVH), out.dtype)],
            axis=1)
    return out


def _xla_reference(q, k, v, src, dst, num_segments, num_heads, leaky_slope,
                   dsh=None, dvh=None, attn_drop=0.0, drop_seed=None):
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
    if attn_drop:
        p = _apply_hash_dropout(p, attn_drop, drop_seed, num_heads)
    msg = (v_e * p[..., None]).reshape(E, num_heads * DVH)
    out = jax.ops.segment_sum(msg, dst, num_segments=num_segments)
    if num_heads * DVH < DV:
        out = jnp.concatenate(
            [out, jnp.zeros((num_segments, DV - num_heads * DVH),
                            out.dtype)], axis=1)
    return out


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(5, 6, 7, 8, 9, 10, 11, 12))
def fused_graph_attention(q, k, v, layout: BlockedLayout, bwd_aux,
                          num_heads: int, leaky_slope: float = 0.0,
                          nb: int = 256, et: int = 1024,
                          interpret: bool = False, dsh=None, dvh=None,
                          attn_drop: float = 0.0, drop_seed=None):
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
      attn_drop / drop_seed: in-kernel dropout on the post-softmax probs
        (deterministic counter-based mask; needs ``bwd_aux`` for the
        fused backward and ``2H + 1 ≤ LDW``, i.e. any practical H).
    """
    out, _, _ = _fused_attention_fwd(q, k, v, layout.padded_v,
                                     layout.padded_ids, layout.tile_starts,
                                     layout.tile_ends, layout.num_segments,
                                     num_heads, leaky_slope, nb, et,
                                     interpret, dsh, dvh,
                                     drop_rate=attn_drop,
                                     drop_seed=drop_seed)
    return out


# Keep the forward's gathered k|v stream alive as a residual (the CSC
# backward pass reads the exact same stream) unless it exceeds this cap —
# re-gathering costs ~10 ns/edge, keeping it costs (DS+DV)*4 bytes/edge.
_SAVE_KV_MB_DEFAULT = 4096


def _fga_fwd(q, k, v, layout, bwd_aux, num_heads, leaky_slope, nb, et,
             interpret, dsh, dvh, attn_drop, drop_seed):
    out, lse, kv_e = _fused_attention_fwd(
        q, k, v, layout.padded_v, layout.padded_ids, layout.tile_starts,
        layout.tile_ends, layout.num_segments, num_heads, leaky_slope,
        nb, et, interpret, dsh, dvh, drop_rate=attn_drop,
        drop_seed=drop_seed)
    import os as _os
    cap = int(_os.environ.get("PGL_TPU_ATTN_SAVE_KV_MB",
                              _SAVE_KV_MB_DEFAULT)) * (1 << 20)
    if kv_e.size * kv_e.dtype.itemsize > cap:
        kv_e = None
    return out, (q, k, v, layout, bwd_aux, out, lse, kv_e, drop_seed)


def _fga_bwd(num_heads, leaky_slope, nb, et, interpret, dsh, dvh,
             attn_drop, res, g):
    q, k, v, layout, bwd_aux, out, lse, kv_e, drop_seed = res
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
                                  H, leaky_slope, dsh, dvh,
                                  attn_drop, drop_seed)

        _, vjp = jax.vjp(ref, q, k, v)
        dq, dk, dv = vjp(g)
        return dq, dk, dv, None, None, None

    csr, perm = bwd_aux[0], bwd_aux[1]
    dq, dk, dv = _fused_attention_bwd(
        q, k, v, g, out, lse, kv_e,
        layout.padded_v, layout.padded_ids, layout.tile_starts,
        layout.tile_ends,
        csr.padded_v, csr.padded_ids, csr.tile_starts, csr.tile_ends,
        layout.num_segments, H, leaky_slope, nb, et, interpret, dsh, dvh,
        drop_rate=attn_drop, drop_seed=drop_seed, csr_perm=perm)
    return dq, dk, dv, None, None, None


fused_graph_attention.defvjp(_fga_fwd, _fga_bwd)


def _pad128(x):
    n, h = x.shape
    if h == 128:
        return x
    return jnp.concatenate([x, jnp.zeros((n, 128 - h), x.dtype)], axis=1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9, 10))
def fused_gat_attention(a_dst, a_src, v, layout, bwd_aux,
                        leaky_slope: float = 0.2, nb: int = 256,
                        et: int = 1024, interpret: bool = False, dvh=None,
                        attn_drop: float = 0.0, drop_seed=None):
    """GAT additive attention, fused:
    ``out[r] = Σ_{e: dst=r} softmax_r(leaky(a_dst[r] + a_src[src_e])) ·
    v[src_e]``.

    Unlike :func:`fused_graph_attention` (dot scores via MXU, which needs
    HIGHEST-precision matmuls for fwd/bwd consistency), additive scores are
    an exact f32 VPU outer sum — faster AND exact. Requires
    ``3·H ≤ 128`` (the per-edge lse/delta/a_dst triple rides one 128-lane
    stream chunk).

    Args:
      a_dst: [N, H] destination-side attention coefficients.
      a_src: [N, H] source-side attention coefficients.
      v: [N, DV] value features (DV lane-aligned; per-head width ``dvh``).
      layout / bwd_aux: as in :func:`fused_graph_attention`.
    """
    H = a_dst.shape[1]
    out, _, _ = _fused_attention_fwd(
        _pad128(a_dst), _pad128(a_src), v, layout.padded_v,
        layout.padded_ids, layout.tile_starts, layout.tile_ends,
        layout.num_segments, H, leaky_slope, nb, et, interpret,
        dsh=1, dvh=dvh, additive=True, drop_rate=attn_drop,
        drop_seed=drop_seed)
    return out


def _fga_add_fwd(a_dst, a_src, v, layout, bwd_aux, leaky_slope, nb, et,
                 interpret, dvh, attn_drop, drop_seed):
    H = a_dst.shape[1]
    out, lse, kv_e = _fused_attention_fwd(
        _pad128(a_dst), _pad128(a_src), v, layout.padded_v,
        layout.padded_ids, layout.tile_starts, layout.tile_ends,
        layout.num_segments, H, leaky_slope, nb, et, interpret,
        dsh=1, dvh=dvh, additive=True, drop_rate=attn_drop,
        drop_seed=drop_seed)
    import os as _os
    cap = int(_os.environ.get("PGL_TPU_ATTN_SAVE_KV_MB",
                              _SAVE_KV_MB_DEFAULT)) * (1 << 20)
    if kv_e.size * kv_e.dtype.itemsize > cap:
        kv_e = None
    return out, (a_dst, a_src, v, layout, bwd_aux, out, lse, kv_e,
                 drop_seed)


def _fga_add_bwd(leaky_slope, nb, et, interpret, dvh, attn_drop, res, g):
    a_dst, a_src, v, layout, bwd_aux, out, lse, kv_e, drop_seed = res
    H = a_dst.shape[1]

    import os as _os
    use_fused = (bwd_aux is not None
                 and _os.environ.get("PGL_TPU_ATTN_XLA_BWD", "0") != "1")
    if not use_fused:
        E = layout.num_edges
        src = layout.padded_v[:E]
        dst = layout.padded_ids.reshape(-1)[:E]

        def ref(a_dst, a_src, v):
            return _xla_additive_reference(a_dst, a_src, v, src, dst,
                                           layout.num_segments,
                                           leaky_slope, dvh, v.shape[1],
                                           attn_drop, drop_seed)

        _, vjp = jax.vjp(ref, a_dst, a_src, v)
        da, dk_, dv_ = vjp(g)
        return da, dk_, dv_, None, None, None

    csr, perm = bwd_aux[0], bwd_aux[1]
    dq, dk, dv = _fused_attention_bwd(
        _pad128(a_dst), _pad128(a_src), v, g, out, lse, kv_e,
        layout.padded_v, layout.padded_ids, layout.tile_starts,
        layout.tile_ends,
        csr.padded_v, csr.padded_ids, csr.tile_starts, csr.tile_ends,
        layout.num_segments, H, leaky_slope, nb, et, interpret,
        dsh=1, dvh=dvh, additive=True, drop_rate=attn_drop,
        drop_seed=drop_seed, csr_perm=perm)
    return dq[:, :H], dk[:, :H], dv, None, None, None


fused_gat_attention.defvjp(_fga_add_fwd, _fga_add_bwd)


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
