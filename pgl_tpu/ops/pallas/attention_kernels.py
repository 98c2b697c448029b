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

Backward currently recomputes through the unfused XLA composition (exact
same math) — the forward is the hot inference/serving path; the training
backward reuses the spmm kernel where it applies.
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
    E = layout.num_edges
    src = layout.padded_v[:E]
    dst = layout.padded_ids.reshape(-1)[:E]
    H = num_heads
    DS, DV = q.shape[1], v.shape[1]
    DSH = dsh or DS // H
    DVH = dvh or DV // H

    import os as _os
    analytic = (_os.environ.get("PGL_TPU_ATTN_ANALYTIC_BWD", "0") == "1"
                or interpret)
    if bwd_aux is None or 128 % H != 0 or not analytic:
        # The analytical flash-style backward below is numerically exact
        # but gather-bound (each weighted SpMM re-gathers edge rows) and
        # measured *slower* than XLA's recompute-differentiate on v5e
        # (588ms vs 333ms for a 2-layer GAT step) — keep it opt-in until a
        # fused-gather kernel lands. interpret mode always exercises it so
        # tests keep covering the math.
        def ref(q, k, v):
            return _xla_reference(q, k, v, src, dst, layout.num_segments,
                                  H, leaky_slope, dsh, dvh)

        _, vjp = jax.vjp(ref, q, k, v)
        dq, dk, dv = vjp(g)
        return dq, dk, dv, None, None

    # Flash-style analytical backward: recompute per-edge scores/probs from
    # the saved LSE, then three per-head-weighted SpMMs (no scatter).
    from .segment_kernels import _blocked_spmm
    csr, perm = bwd_aux
    qs = q[:, :H * DSH].reshape(-1, H, DSH)
    ks = k[:, :H * DSH].reshape(-1, H, DSH)
    vs = v[:, :H * DVH].reshape(-1, H, DVH)
    gs = g[:, :H * DVH].reshape(-1, H, DVH)
    os_ = out[:, :H * DVH].reshape(-1, H, DVH)
    q_e = jnp.take(qs, dst, axis=0)                  # [E, H, DSH]
    k_e = jnp.take(ks, src, axis=0)
    s_raw = jnp.sum(q_e * k_e, axis=-1)              # [E, H]
    if leaky_slope:
        s_act = jnp.where(s_raw >= 0, s_raw, s_raw * leaky_slope)
    else:
        s_act = s_raw
    p = jnp.exp(s_act - jnp.take(lse, dst, axis=0))  # [E, H]
    g_e = jnp.take(gs, dst, axis=0)                  # [E, H, DVH]
    v_e = jnp.take(vs, src, axis=0)
    gv = jnp.sum(g_e * v_e, axis=-1)                 # [E, H]
    delta = jnp.sum(gs * os_, axis=-1)               # [N, H]
    ds = p * (gv - jnp.take(delta, dst, axis=0))     # [E, H]
    if leaky_slope:
        ds = ds * jnp.where(s_raw >= 0, 1.0, leaky_slope)

    Ep_csc = layout.padded_v.shape[0]
    Ep_csr = csr.padded_v.shape[0]

    def pad_w(w_e, Ep):
        return jnp.zeros((Ep, H), w_e.dtype).at[:E].set(w_e)

    def pad128(x, width):
        """Head-major features padded so every per-head block is 128/H wide
        (keeps the per-head weight multiply aligned with head slices)."""
        dh = width // H
        dh_pad = -(-dh * H // 128) * 128 // H if (dh * H) % 128 else dh
        if dh_pad == dh:
            return x[:, :width], dh
        xs = x[:, :width].reshape(-1, H, dh)
        xs = jnp.concatenate(
            [xs, jnp.zeros((xs.shape[0], H, dh_pad - dh), x.dtype)],
            axis=2)
        return xs.reshape(-1, H * dh_pad), dh_pad

    def unpad(y, dh_pad, dh, width):
        if dh_pad == dh:
            return y
        return y.reshape(-1, H, dh_pad)[:, :, :dh].reshape(-1, width)

    k_in, kdh = pad128(k, H * DSH)
    q_in, qdh = pad128(q, H * DSH)
    g_in, gdh = pad128(g, H * DVH)

    # dq[r] = Σ_{e: dst=r} ds_e · k[src_e]  — CSC-side weighted SpMM
    dq_h = _blocked_spmm(k_in, layout.padded_v,
                         layout.padded_ids, layout.tile_starts,
                         layout.tile_ends, layout.num_segments, nb, et,
                         interpret, edge_w=pad_w(ds, Ep_csc))
    dq_h = unpad(dq_h, kdh, DSH, H * DSH)
    # dk[s] = Σ_{e: src=s} ds_e · q[dst_e]  — CSR-side (perm moves weights)
    ds_csr = jnp.take(ds, perm, axis=0)
    dk_h = _blocked_spmm(q_in, csr.padded_v, csr.padded_ids,
                         csr.tile_starts, csr.tile_ends, csr.num_segments,
                         nb, et, interpret, edge_w=pad_w(ds_csr, Ep_csr))
    dk_h = unpad(dk_h, qdh, DSH, H * DSH)
    # dv[s] = Σ_{e: src=s} p_e · g[dst_e]
    p_csr = jnp.take(p, perm, axis=0)
    dv_h = _blocked_spmm(g_in, csr.padded_v, csr.padded_ids,
                         csr.tile_starts, csr.tile_ends, csr.num_segments,
                         nb, et, interpret, edge_w=pad_w(p_csr, Ep_csr))
    dv_h = unpad(dv_h, gdh, DVH, H * DVH)

    def widen(x, D_full):
        if x.shape[1] < D_full:
            x = jnp.concatenate(
                [x, jnp.zeros((x.shape[0], D_full - x.shape[1]),
                              x.dtype)], axis=1)
        return x

    return (widen(dq_h, DS), widen(dk_h, DS), widen(dv_h, DV), None, None)


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
