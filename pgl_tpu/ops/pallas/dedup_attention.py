"""Dedup (count-matrix) fused GAT attention — attention over *(dst, src)
pairs* instead of edges.

Additive GAT scores depend only on the endpoints:
``s_e = a_dst[dst_e] + a_src[src_e]``. Within one (dst block, rank window)
pair of the dedup layout (``dedup_kernels.py``), every distinct source is
one window rank, so the entire attention tile is a dense ``S[NB, W]``
outer sum, and the per-edge multiplicity is exactly the count matrix
``C[NB, W]`` the dedup SpMM already builds on the MXU:

    l_i   = Σ_j C_ij · e^{S_ij}
    out_i = Σ_j C_ij · e^{S_ij} · v_j  / l_i

(multi-edges contribute C_ij > 1 — identical semantics to the per-edge
softmax, since duplicates share the score). Work per pair is the dedup
SpMM's count pass plus O(NB·W·H) VPU — ~(edges-per-pair / W) ≈ 7× less
score work than the per-edge flash kernel (``attention_kernels.py``), and
the gathers shrink to the unique-src tables (U ≈ 0.13·E measured).

Backward is flash-style with the same structure: recompute C and
``p̃ = C·e^{S − lse}`` per pair, then
``ds = p̃ ⊙ (g·vᵀ − delta)``; ``d a_dst = Σ_j ds``,
``d a_srcᵀ / dv`` land in the pair's OWN slot rows of ``[P·W, ·]``
outputs (exclusive ownership even under dense uniq packing), and a
final slot→node sorted reduce (host-built ``BlockedLayout`` over the
uv table) folds them back onto nodes — no XLA scatter anywhere.

Replaces the SDDMM+edge_softmax+send_ue_recv triple
(``pgl/nn/conv.py:333-339``, ``pgl/nn/functional/graph_op.py:101``) on
dedup-eligible graphs. Attention-prob dropout runs IN-KERNEL on simple
graphs (``DedupLayout.simple``): one count-matrix cell is one edge
there, so the per-cell hash mask is exactly the reference's per-edge
post-softmax dropout. Multigraphs default to the per-edge kernels (the
reference drops each duplicate edge independently; the count form drops
a cell's duplicates together) — ``attn_drop_mode="cell"`` on the conv
layers opts into the count form there too, which matches per-edge
dropout in expectation (the output is linear in the mask and the
denominator is undropped).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .dedup_kernels import DedupLayout, _count_tiles
from .segment_kernels import _take_ib, BlockedLayout, build_blocked_layout, \
    _blocked_spmm
from .attention_kernels import _drop_keep

__all__ = ["dedup_gat_attention", "dedup_dot_attention",
           "build_uniq_reduce"]



def build_uniq_reduce(layout: DedupLayout, num_nodes: int) -> BlockedLayout:
    """Host-built sorted reduce from PAIR-SLOT rows back to nodes.

    The attention backward writes ``dsrcT``/``dv`` into each pair's OWN
    [W] slot rows (row ``p·W + k`` belongs to node ``uv[wb[p] + k]``) —
    exclusive ownership regardless of whether the uniq table is
    window-aligned or densely packed. Slot rows whose rank has no edges
    in the pair carry zeros and fold harmlessly. One argsort at build
    time makes the reduce a sorted segment-sum (base SpMM kernel).
    """
    uv = np.asarray(layout.uv).astype(np.int64)
    wb = np.asarray(layout.pair_wb).astype(np.int64)
    w = layout.w
    slot_uv = uv[(wb[:, None] + np.arange(w, dtype=np.int64)).ravel()]
    order = np.argsort(slot_uv, kind="stable").astype(np.int64)
    counts = np.bincount(slot_uv, minlength=num_nodes)
    indptr = np.concatenate([[0], np.cumsum(counts)])
    return build_blocked_layout(indptr, order, num_nodes)


def _uniq_reduce(rows, red: BlockedLayout, interpret: bool = False):
    """[P·W, D] pair-slot values → [N, D] per-node sums."""
    return _blocked_spmm(rows, red.padded_v, red.padded_ids,
                         red.tile_starts, red.tile_ends, red.num_segments,
                         256, 1024, interpret)


# ----------------------------------------------------------------------
# forward kernel
# ----------------------------------------------------------------------

def _cell_idx(blk, wb, NB, W):
    """int32 identity of each (global dst row, global uniq row) cell of
    the current pair — the dropout-mask key. Must match the XLA replica
    in tests/conv references bit-for-bit (int32 wrap-around math)."""
    rows = blk * NB + jax.lax.broadcasted_iota(jnp.int32, (NB, W), 0)
    cols = wb + jax.lax.broadcasted_iota(jnp.int32, (NB, W), 1)
    return rows * jnp.int32(-1640531535) + cols    # 0x9E3779B1, wraps


def _attn_fwd_kernel(ts_ref, te_ref, blk_ref, wb_ref, seed_ref,
                     adst_ref,              # [NB, SDp] VMEM (block rows)
                     comb_ref,              # [Upad+W, DV+SDT] HBM (v|score)
                     ids_ref, iv_ref,
                     out_ref,               # [NB, DV] VMEM (revisit blk)
                     lse_ref,               # [H·NB, 1] VMEM (head-stacked)
                     win_c, ids_tile, iv_tile,
                     oh_dst, oh_rankT, c_acc, m_s, l_s, acc,
                     sem_wc, sem_i, sem_b,
                     *, NB, ET, W, DV, H, DVH, Hp, P, leaky: float,
                     additive: bool = True, DSH: int = 0,
                     rate: float = 0.0,
                     c_ref=None, c_tile=None, sem_c=None):
    p = pl.program_id(0)
    wb = wb_ref[p]
    cached = c_ref is not None       # counts-cache path: C is a DMA

    # ONE combined window DMA per pair (double-buffered across grid
    # steps): uniq v rides lanes [:DV], uniq scores lanes [DV:]. The
    # table is ROW-sliced — densely packed wb offsets are arbitrary and
    # Mosaic only allows unaligned dynamic slices on the sublane (row)
    # dimension; the score chunk transposes IN-KERNEL once per pair
    def wc_dma(slot, q):
        return pltpu.make_async_copy(
            comb_ref.at[pl.ds(pl.multiple_of(wb_ref[q], 8), W), :],
            win_c.at[slot], sem_wc.at[slot])

    def c_dma(slot, q):
        return pltpu.make_async_copy(
            c_ref.at[pl.ds(pl.multiple_of(q * NB, NB), NB), :],
            c_tile.at[slot], sem_c.at[slot])

    @pl.when(p == 0)
    def _():
        wc_dma(0, 0).start()
        if cached:
            c_dma(0, 0).start()

    @pl.when(p + 1 < P)
    def _():
        wc_dma((p + 1) % 2, p + 1).start()
        if cached:
            c_dma((p + 1) % 2, p + 1).start()

    new_blk = (p == 0) | (blk_ref[jnp.maximum(p - 1, 0)] != blk_ref[p])

    @pl.when(new_blk)
    def _():
        # m/l live head-STACKED ([H·NB, 1] columns) so the stacked
        # softmax math below never lane-slices or re-concats them
        m_s[:] = jnp.full((H * NB, 1), -1e30, jnp.float32)
        l_s[:] = jnp.zeros((H * NB, 1), jnp.float32)
        acc[:] = jnp.zeros((NB, DV), jnp.float32)

    if not cached:
        _count_tiles(ts_ref, te_ref, blk_ref, ids_ref, iv_ref,
                     ids_tile, iv_tile, oh_dst, oh_rankT, c_acc,
                     sem_i, sem_b, NB=NB, ET=ET, W=W, P=P)

    wc_dma(p % 2, p).wait()

    if cached:
        c_dma(p % 2, p).wait()
        C = c_tile[p % 2][:].astype(jnp.float32)
    else:
        C = c_acc[:]
    if rate:
        # per-cell dropout identity: (global dst row, global uniq row)
        # — on a SIMPLE graph (layout.simple) each cell is one edge, so
        # this is exactly the reference's per-edge attention dropout
        didx = _cell_idx(blk_ref[p], wb, NB, W)
    m_prev = m_s[:]
    l_prev = l_s[:]
    acc_prev = acc[:]
    win_v = win_c[p % 2][:, :DV]
    # the score chunk transposes once per pair ([W, SDT] → [SDT, W]);
    # every head then reads its [1/DSH, W] rows as before
    wsT = win_c[p % 2][:, DV:].T
    # raw scores per head (the only step whose shape differs by mode)
    s_parts = []
    for h in range(H):
        if additive:
            s = adst_ref[:, h][:, None] + wsT[h:h + 1, :]
        else:
            # dot scores: q_h · k_winᵀ — HIGHEST so the backward's
            # recomputed p = exp(s − lse) matches bit-for-bit (see
            # attention_kernels.py precision note)
            s = jax.lax.dot_general(
                adst_ref[:, h * DSH:(h + 1) * DSH],
                wsT[h * DSH:(h + 1) * DSH, :],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
        s_parts.append(s)
    # everything from leaky/mask/max/exp on runs HEAD-STACKED on M
    # ([H·NB, W]) — larger vector ops amortize per-op overhead, and the
    # stacked p-matrix is exactly what the M-stacked value matmul wants
    # (a per-head [NB, W] @ [W, DVH] is an 8-lane output at DVH=8 —
    # 1/16 of the MXU width; [H·NB, W] @ [W, DV] computes H× extra
    # columns at full width and still measures faster,
    # experiments/gat_fwd_ablate.py)
    S = jnp.concatenate(s_parts, axis=0) if H > 1 else s_parts[0]
    if leaky:
        S = jnp.where(S >= 0, S, S * leaky)
    # stacked per-head scalars ride as [H·NB, 1] COLUMNS (the scratch
    # layout) — 1-D vectors lay out on lanes, where Mosaic cannot slice
    # past the first 128-lane tile, and concat-of-lane-slices does not
    # lower either; columns on sublanes avoid both
    m_prev_all = m_prev
    l_prev_all = l_prev
    C_all = jnp.concatenate([C] * H, axis=0) if H > 1 else C
    # absent (C == 0) cells MUST be masked out of the scores: window
    # tiles include real scores of NON-neighbors (uv pad rows alias
    # node 0, densely-packed windows straddle blocks), and an absent
    # score more than ~88 above a row's true max would underflow every
    # real exp(S - m) to 0 → out = 0 silently. One select on the
    # stacked tile (C_all is materialized anyway); masked cells then
    # exp to exactly 0, so no clamp is needed
    S = jnp.where(C_all > 0.0, S, -1e30)
    m_new_all = jnp.maximum(m_prev_all,
                            jnp.max(S, axis=1, keepdims=True))
    scale_all = jnp.exp(m_prev_all - m_new_all)
    P_all = C_all * jnp.exp(S - m_new_all)
    # dropout applies to the NORMALIZED attention (reference semantics:
    # drop after softmax) — the l denominator uses the full p-matrix,
    # the value accumulation the masked one
    l_new_all = l_prev_all * scale_all + jnp.sum(P_all, axis=1,
                                                 keepdims=True)
    if rate:
        keep_all = jnp.concatenate(
            [_drop_keep(didx, seed_ref[0], h, rate) for h in range(H)],
            axis=0)
        P_v = jnp.where(keep_all, P_all, 0.0) * (1.0 / (1.0 - rate))
    else:
        P_v = P_all
    if H > 1:
        pv_all = jax.lax.dot(P_v, win_v,
                             preferred_element_type=jnp.float32)
        pv_h = [pv_all[h * NB:(h + 1) * NB, h * DVH:(h + 1) * DVH]
                for h in range(H)]
    else:
        pv_h = [jax.lax.dot(P_v, win_v[:, :DVH],
                            preferred_element_type=jnp.float32)]
    acc_new_h = []
    for h in range(H):
        acc_h = acc_prev[:, h * DVH:(h + 1) * DVH] \
            * scale_all[h * NB:(h + 1) * NB] + pv_h[h]
        acc_new_h.append(acc_h)
    m_s[:] = m_new_all
    l_s[:] = l_new_all
    acc[:, :H * DVH] = jnp.concatenate(acc_new_h, axis=1)

    # finalize (normalize + lse) ONLY on the block's last pair: the
    # out/lse VMEM blocks revisit the same index until the block changes,
    # so intermediate pairs can skip the div/log/write chain (~1 us/pair
    # of VPU passes on the H-stacked shapes; blocks average several
    # pairs, so most grid steps skip it)
    last_of_blk = (p == P - 1) | \
        (blk_ref[jnp.minimum(p + 1, P - 1)] != blk_ref[p])

    @pl.when(last_of_blk)
    def _():
        out_h = []
        for h in range(H):
            lcol = l_new_all[h * NB:(h + 1) * NB]
            denom = jnp.maximum(lcol, 1e-30)
            out_h.append(jnp.where(lcol > 0.0, acc_new_h[h] / denom, 0.0))
        if H * DVH < DV:
            out_h.append(jnp.zeros((NB, DV - H * DVH), jnp.float32))
        out_ref[:] = jnp.concatenate(out_h, axis=1).astype(out_ref.dtype)
        # lse lives HEAD-STACKED ([H·NB, 1], same layout as m/l) — one
        # where/log instead of a per-head stack, and the backward can
        # broadcast it to [H·NB, W] in one op instead of H broadcasts
        # + a concat per pair
        lse_ref[:] = jnp.where(
            l_new_all > 0.0,
            m_new_all + jnp.log(jnp.maximum(l_new_all, 1e-30)), 0.0)


# ----------------------------------------------------------------------
# backward kernel
# ----------------------------------------------------------------------

def _attn_bwd_kernel(ts_ref, te_ref, blk_ref, wb_ref, seed_ref,
                     adst_ref,              # [NB, SDp] VMEM block
                     g_ref,                 # [NB, DV] VMEM block
                     lse_ref,               # [H·NB, 1] VMEM block (stacked)
                     delta_ref,             # [H·NB, 1] VMEM block (stacked)
                     comb_ref,              # [Upad+W, DV+SDT] HBM (v|score)
                     ids_ref, iv_ref,
                     dadst_ref,             # [NB, SDp] VMEM out (revisit)
                     dsrcT_ref,             # [SDo, W] VMEM out (own slots)
                     dv_ref,                # [W, DV] VMEM out (own slots)
                     win_c, ids_tile, iv_tile,
                     oh_dst, oh_rankT, c_acc,
                     sem_wc, sem_i, sem_b,
                     *, NB, ET, W, DV, H, DVH, Hp, P, leaky: float,
                     additive: bool = True, DSH: int = 0,
                     rate: float = 0.0,
                     c_ref=None, c_tile=None, sem_c=None):
    p = pl.program_id(0)
    wb = wb_ref[p]
    cached = c_ref is not None       # counts-cache path: C is a DMA

    # ONE combined row-sliced window DMA per pair (see forward kernel)
    def wc_dma(slot, q):
        return pltpu.make_async_copy(
            comb_ref.at[pl.ds(pl.multiple_of(wb_ref[q], 8), W), :],
            win_c.at[slot], sem_wc.at[slot])

    def c_dma(slot, q):
        return pltpu.make_async_copy(
            c_ref.at[pl.ds(pl.multiple_of(q * NB, NB), NB), :],
            c_tile.at[slot], sem_c.at[slot])

    @pl.when(p == 0)
    def _():
        wc_dma(0, 0).start()
        if cached:
            c_dma(0, 0).start()

    @pl.when(p + 1 < P)
    def _():
        wc_dma((p + 1) % 2, p + 1).start()
        if cached:
            c_dma((p + 1) % 2, p + 1).start()

    new_blk = (p == 0) | (blk_ref[jnp.maximum(p - 1, 0)] != blk_ref[p])

    @pl.when(new_blk)
    def _():
        dadst_ref[:] = jnp.zeros(dadst_ref.shape, dadst_ref.dtype)

    if not cached:
        _count_tiles(ts_ref, te_ref, blk_ref, ids_ref, iv_ref,
                     ids_tile, iv_tile, oh_dst, oh_rankT, c_acc,
                     sem_i, sem_b, NB=NB, ET=ET, W=W, P=P)

    wc_dma(p % 2, p).wait()

    if cached:
        c_dma(p % 2, p).wait()
        C = c_tile[p % 2][:].astype(jnp.float32)
    else:
        C = c_acc[:]
    if rate:
        didx = _cell_idx(blk_ref[p], wb, NB, W)
    dadst_cols = []
    dsrc_rows = []
    dv_parts = []
    SDp = dadst_ref.shape[1]
    # score recompute per head (mode-specific shapes), then the
    # leaky/exp/mask/dsc chain runs HEAD-STACKED on M like the forward;
    # lse/delta broadcasts stack as full-width [NB, W] blocks (Mosaic
    # cannot lower concat-of-lane-slices, broadcast-then-concat is fine)
    wsT = win_c[p % 2][:, DV:].T          # [SDT, W], once per pair
    wvT = win_c[p % 2][:, :DV].T          # [DV, W], once per pair
    s_parts, gv_parts = [], []
    for h in range(H):
        if additive:
            s_parts.append(adst_ref[:, h][:, None]
                           + wsT[h:h + 1, :])
        else:
            s_parts.append(jax.lax.dot_general(
                adst_ref[:, h * DSH:(h + 1) * DSH],
                wsT[h * DSH:(h + 1) * DSH, :],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST))
        # gv_h[NB, W] = g_h · v_winᵀ (contract DVH with vuT rows)
        gv_parts.append(jax.lax.dot_general(
            g_ref[:, h * DVH:(h + 1) * DVH],
            wvT[h * DVH:(h + 1) * DVH, :],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32))
    S = jnp.concatenate(s_parts, axis=0) if H > 1 else s_parts[0]
    GV = jnp.concatenate(gv_parts, axis=0) if H > 1 else gv_parts[0]
    # head-stacked side-channels: one broadcast each, no concat
    LSE = jnp.broadcast_to(lse_ref[:], (H * NB, W))
    DLT = jnp.broadcast_to(delta_ref[:], (H * NB, W))
    if leaky:
        ds_dS_all = jnp.where(S >= 0, 1.0, leaky)
        S = jnp.where(S >= 0, S, S * leaky)
    C_all = jnp.concatenate([C] * H, axis=0) if H > 1 else C
    # absent (C == 0) cells self-mask through the product; the clamp
    # keeps exp finite where LSE is 0 (edgeless rows) so 0·inf can't
    # produce NaN — one VPU min instead of the H-stacked has-mask select
    P_til = C_all * jnp.exp(jnp.minimum(S - LSE, 80.0))
    if rate:
        # same mask as the forward: dropped cells contribute no direct
        # g·v term (delta already reflects the masked out)
        keep_all = jnp.concatenate(
            [_drop_keep(didx, seed_ref[0], h, rate) for h in range(H)],
            axis=0) if H > 1 else _drop_keep(didx, seed_ref[0], 0, rate)
        inv = 1.0 / (1.0 - rate)
        GV = jnp.where(keep_all, GV * inv, 0.0)
        P_v = jnp.where(keep_all, P_til * inv, 0.0)
    else:
        P_v = P_til
    DSC = P_til * (GV - DLT)                               # d score
    if leaky:
        DSC = DSC * ds_dS_all
    for h in range(H):
        dsc = DSC[h * NB:(h + 1) * NB] if H > 1 else DSC
        ptil_v = P_v[h * NB:(h + 1) * NB] if H > 1 else P_v
        g_h = g_ref[:, h * DVH:(h + 1) * DVH]              # [NB, DVH]
        if additive:
            dadst_cols.append(jnp.sum(dsc, axis=1))        # [NB]
            dsrc_rows.append(jnp.sum(dsc, axis=0,
                                     keepdims=True))       # [1, W]
        else:
            # dq_h[NB, DSH] = ds · k_win — the row-sliced window is
            # [W, SD], so this is the standard A·B form directly
            dadst_cols.append(jax.lax.dot_general(
                dsc, win_c[p % 2][:, DV + h * DSH:DV + (h + 1) * DSH],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32))       # [NB, DSH]
            # dk_h[DSH, W] = q_hᵀ · ds  (native AᵀB, already transposed
            # to match the dsrcT output layout)
            dsrc_rows.append(jax.lax.dot_general(
                adst_ref[:, h * DSH:(h + 1) * DSH], dsc,
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32))       # [DSH, W]
        # dv_h[W, DVH] = p̃ᵀ · g_h  (native AᵀB; masked under dropout)
        dv_parts.append(jax.lax.dot_general(
            ptil_v, g_h, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32))

    if additive:
        dadst_ref[:] = dadst_ref[:] + jnp.stack(
            dadst_cols + [jnp.zeros((NB,), jnp.float32)] * (SDp - H),
            axis=1)
        pad = dsrcT_ref.shape[0] - H
        dsrcT_ref[:] = jnp.concatenate(
            dsrc_rows + [jnp.zeros((1, W), jnp.float32)] * pad, axis=0)
    else:
        full = jnp.concatenate(dadst_cols, axis=1)
        if full.shape[1] < SDp:
            full = jnp.concatenate(
                [full, jnp.zeros((NB, SDp - full.shape[1]), jnp.float32)],
                axis=1)
        dadst_ref[:] = dadst_ref[:] + full
        dk_full = jnp.concatenate(dsrc_rows, axis=0)
        pad = dsrcT_ref.shape[0] - dk_full.shape[0]
        if pad:
            dk_full = jnp.concatenate(
                [dk_full, jnp.zeros((pad, W), jnp.float32)], axis=0)
        dsrcT_ref[:] = dk_full
    dv_full = jnp.concatenate(dv_parts, axis=1)
    if H * DVH < DV:
        dv_full = jnp.concatenate(
            [dv_full, jnp.zeros((W, DV - H * DVH), jnp.float32)], axis=1)
    dv_ref[:] = dv_full


# ----------------------------------------------------------------------
# wrappers
# ----------------------------------------------------------------------

def _hp(h):
    return max(8, -(-h // 8) * 8)


def _pad_lanes(d):
    return max(128, -(-d // 128) * 128)


def _common(layout, nb):
    P = int(layout.pair_ts.shape[0])
    n_pad = (layout.num_segments + nb - 1) // nb * nb
    return P, n_pad


def _gather_comb(v, ss, sd_cols, SDT, layout):
    """ONE fused uniq gather for values AND scores (row-count-bound, so
    the score lanes are ~free): scores ride lanes [DV:DV+SDT], lane-
    padded to a full 128 tile (Mosaic DMA tiles must be lane-aligned).
    The barrier pins the concat BEFORE the gather — XLA otherwise
    rewrites gather(concat(x, zeros)) -> concat(gather(x), zeros) and a
    narrow gather degenerates to 1-D (899 vs 248 us, xplane-measured)."""
    comb = jax.lax.optimization_barrier(jnp.concatenate(
        [v.astype(jnp.float32), ss,
         jnp.zeros((ss.shape[0], SDT - sd_cols), jnp.float32)], 1))
    return _take_ib(comb, layout.uv)


@functools.partial(jax.jit, static_argnames=("num_heads", "dvh", "dsh",
                                             "additive", "leaky", "nb",
                                             "et", "w", "interpret",
                                             "rate"))
def _dedup_attn_fwd_call(score_dst, score_src, v, layout: DedupLayout,
                         num_heads: int, dvh: int, dsh: int,
                         additive: bool, leaky: float,
                         nb: int, et: int, w: int, interpret: bool,
                         rate: float = 0.0, seed=None):
    """score_dst/score_src: additive → [N, H] halves; dot → [N, DS] q/k."""
    H, DV = num_heads, v.shape[1]
    P, n_pad = _common(layout, nb)
    N = layout.num_segments
    if additive:
        SD, SDp = _hp(H), 128
    else:
        SD = H * dsh
        SDp = _pad_lanes(SD)
    sd_cols = H if additive else SD
    adst_pad = jnp.zeros((n_pad, SDp), jnp.float32).at[:N, :sd_cols].set(
        score_dst.astype(jnp.float32))
    # pad score lanes BEFORE the uniq gather: a sub-8-lane (esp. 1-head)
    # gather degenerates to a 1-D gather, ~4x slower than the 8-lane
    # row gather (xplane-measured 899 vs 248 us on the 65k GAT graph)
    ss = score_src.astype(jnp.float32)
    SDT = _pad_lanes(SD)
    cu = _gather_comb(v, ss, sd_cols, SDT, layout)

    if seed is None:
        seed = jnp.zeros((1,), jnp.int32)
    else:
        seed = jnp.asarray(seed, jnp.int32).reshape(1)
    cached = layout.counts is not None
    kpar = dict(NB=nb, ET=et, W=w, DV=DV, H=H, DVH=dvh, Hp=_hp(H), P=P,
                leaky=leaky, additive=additive, DSH=dsh, rate=rate)
    blkmap = lambda p, ts, te, blk, wb, sd: (blk[p], 0)
    common_scratch = [
        pltpu.VMEM((2, w, DV + SDT), jnp.float32),
    ]
    tail_scratch = [
        pltpu.VMEM((H * nb, 1), jnp.float32),   # m (head-stacked)
        pltpu.VMEM((H * nb, 1), jnp.float32),   # l (head-stacked)
        pltpu.VMEM((nb, DV), jnp.float32),
        pltpu.SemaphoreType.DMA((2,)),
    ]
    if cached:
        def kern(ts, te, blk, wb, sd, adst, comb_r, c_r,
                 out_r, lse_r, win_c, c_t, m_s, l_s, acc,
                 s_wc, s_c):
            _attn_fwd_kernel(ts, te, blk, wb, sd, adst, comb_r,
                             None, None, out_r, lse_r, win_c,
                             None, None, None, None, None, m_s, l_s, acc,
                             s_wc, None, None,
                             c_ref=c_r, c_tile=c_t, sem_c=s_c, **kpar)
        in_specs_tail = [pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)]
        operands_tail = (layout.counts,)
        scratch = common_scratch + [
            pltpu.VMEM((2, nb, w), jnp.bfloat16),
        ] + tail_scratch + [pltpu.SemaphoreType.DMA((2,))]
    else:
        kern = functools.partial(_attn_fwd_kernel, **kpar)
        in_specs_tail = [pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
                         pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)]
        operands_tail = (layout.padded_ids, layout.rank_iv)
        scratch = common_scratch + [
            pltpu.VMEM((2, et // 128, 128), jnp.int32),
            pltpu.VMEM((2 * (w // 128), 128), jnp.int32),
            pltpu.VMEM((nb, et), jnp.bfloat16),
            pltpu.VMEM((et, w), jnp.bfloat16),
            pltpu.VMEM((nb, w), jnp.float32),
        ] + tail_scratch + [pltpu.SemaphoreType.DMA((2,)),
                            pltpu.SemaphoreType.DMA]
    out, lse = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=5,
            grid=(P,),
            in_specs=[
                pl.BlockSpec((nb, SDp), blkmap, memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            ] + in_specs_tail,
            out_specs=(
                pl.BlockSpec((nb, DV), blkmap, memory_space=pltpu.VMEM),
                # lse rides HEAD-STACKED [H*nb, 1] blocks (the m/l
                # scratch layout) — no per-head stack in the kernel and
                # the backward broadcasts it in one op
                pl.BlockSpec((H * nb, 1), blkmap,
                             memory_space=pltpu.VMEM),
            ),
            scratch_shapes=scratch,
        ),
        out_shape=(jax.ShapeDtypeStruct((n_pad, DV), v.dtype),
                   jax.ShapeDtypeStruct((n_pad * H, 1), jnp.float32)),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )(layout.pair_ts, layout.pair_te, layout.pair_blk, layout.pair_wb,
      seed,
      adst_pad, cu, *operands_tail)
    return out[:N], lse


@functools.partial(jax.jit, static_argnames=("num_heads", "dvh", "dsh",
                                             "additive", "leaky", "nb",
                                             "et", "w", "interpret",
                                             "rate"))
def _dedup_attn_bwd_call(score_dst, score_src, v, g, out, lse,
                         layout: DedupLayout, red: BlockedLayout,
                         num_heads: int, dvh: int, dsh: int,
                         additive: bool, leaky: float, nb: int, et: int,
                         w: int, interpret: bool,
                         rate: float = 0.0, seed=None):
    H, DV = num_heads, v.shape[1]
    Hp = _hp(H)
    P, n_pad = _common(layout, nb)
    N = layout.num_segments
    if additive:
        SD, SDp, SDo = Hp, 128, Hp
    else:
        SD = H * dsh
        SDp = _pad_lanes(SD)
        SDo = max(8, SD)
    sd_cols = H if additive else SD
    adst_pad = jnp.zeros((n_pad, SDp), jnp.float32).at[:N, :sd_cols].set(
        score_dst.astype(jnp.float32))
    g_pad = jnp.zeros((n_pad, DV), jnp.float32).at[:N].set(
        g.astype(jnp.float32))
    lse_pad = lse                      # already head-stacked [n_pad*H, 1]
    # per-head Σ g⊙out over that head's dvh columns; slice off the lane
    # padding FIRST (DV is ceil-128-padded and need not divide by dvh)
    delta = (g[:, :H * dvh].astype(jnp.float32)
             * out[:, :H * dvh].astype(jnp.float32)).reshape(
        N, H, dvh).sum(-1)
    # head-stack delta to the lse layout: row blk*H*nb + h*nb + i
    delta_pad = jnp.zeros((n_pad, H), jnp.float32).at[:N].set(delta)
    delta_pad = delta_pad.reshape(n_pad // nb, nb, H).transpose(
        0, 2, 1).reshape(n_pad * H, 1)
    ss = score_src.astype(jnp.float32)
    SDT = _pad_lanes(SD)
    cu = _gather_comb(v, ss, sd_cols, SDT, layout)

    if seed is None:
        seed = jnp.zeros((1,), jnp.int32)
    else:
        seed = jnp.asarray(seed, jnp.int32).reshape(1)
    cached = layout.counts is not None
    kpar = dict(NB=nb, ET=et, W=w, DV=DV, H=H, DVH=dvh, Hp=Hp, P=P,
                leaky=leaky, additive=additive, DSH=dsh, rate=rate)
    blkmap = lambda p, ts, te, blk, wb, sd: (blk[p], 0)
    if cached:
        def kern(ts, te, blk, wb, sd, adst, g_r, lse_r, dlt_r,
                 comb_r, c_r,
                 dadst_r, dsrcT_r, dv_r, win_c, c_t,
                 s_wc, s_c):
            _attn_bwd_kernel(ts, te, blk, wb, sd, adst, g_r, lse_r,
                             dlt_r, comb_r, None, None,
                             dadst_r, dsrcT_r, dv_r, win_c,
                             None, None, None, None, None,
                             s_wc, None, None,
                             c_ref=c_r, c_tile=c_t, sem_c=s_c, **kpar)
        in_specs_tail = [pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)]
        operands_tail = (layout.counts,)
        mid_scratch = [pltpu.VMEM((2, nb, w), jnp.bfloat16)]
        sem_scratch = [pltpu.SemaphoreType.DMA((2,)),
                       pltpu.SemaphoreType.DMA((2,))]
    else:
        kern = functools.partial(_attn_bwd_kernel, **kpar)
        in_specs_tail = [pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
                         pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)]
        operands_tail = (layout.padded_ids, layout.rank_iv)
        mid_scratch = [
            pltpu.VMEM((2, et // 128, 128), jnp.int32),
            pltpu.VMEM((2 * (w // 128), 128), jnp.int32),
            pltpu.VMEM((nb, et), jnp.bfloat16),
            pltpu.VMEM((et, w), jnp.bfloat16),
            pltpu.VMEM((nb, w), jnp.float32),
        ]
        sem_scratch = [pltpu.SemaphoreType.DMA((2,)),
                       pltpu.SemaphoreType.DMA((2,)),
                       pltpu.SemaphoreType.DMA]
    dadst, dsrcT, dvu = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=5,
            grid=(P,),
            in_specs=[
                pl.BlockSpec((nb, SDp), blkmap, memory_space=pltpu.VMEM),
                pl.BlockSpec((nb, DV), blkmap, memory_space=pltpu.VMEM),
                pl.BlockSpec((H * nb, 1), blkmap,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((H * nb, 1), blkmap,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            ] + in_specs_tail,
            out_specs=(
                pl.BlockSpec((nb, SDp), blkmap, memory_space=pltpu.VMEM),
                # dsrcT/dv land in the pair's OWN slot rows ([P·W]
                # space, block index = p) — exclusive ownership that
                # stays valid when the uniq table is densely packed
                # (window offsets then straddle block boundaries, so
                # window-indexed outputs would overlap)
                pl.BlockSpec((SDo, w),
                             lambda p, ts, te, blk, wb, sd: (0, p),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((w, DV),
                             lambda p, ts, te, blk, wb, sd: (p, 0),
                             memory_space=pltpu.VMEM),
            ),
            scratch_shapes=[
                pltpu.VMEM((2, w, DV + SDT), jnp.float32),
            ] + mid_scratch + sem_scratch,
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_pad, SDp), jnp.float32),
            jax.ShapeDtypeStruct((SDo, P * w), jnp.float32),
            jax.ShapeDtypeStruct((P * w, DV), jnp.float32),
        ),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )(layout.pair_ts, layout.pair_te, layout.pair_blk, layout.pair_wb,
      seed,
      adst_pad, g_pad, lse_pad, delta_pad, cu,
      *operands_tail)

    da_dst = dadst[:N, :sd_cols].astype(score_dst.dtype)
    # fold pair-slot rows back onto nodes (sorted reduce, no scatter;
    # ``red`` maps slot row p*W+k -> node uv[wb[p]+k])
    dsrc_rows = dsrcT.T
    dv_rows = dvu
    src_pad = _pad_lanes(SDo)
    da_src = _uniq_reduce(
        jnp.concatenate([dsrc_rows,
                         jnp.zeros((P * w, src_pad - SDo), jnp.float32)],
                        axis=1), red, interpret)[:, :sd_cols]
    dv = _uniq_reduce(dv_rows, red, interpret)
    return da_dst, da_src.astype(score_src.dtype), dv.astype(v.dtype)


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(5, 6, 7, 8, 9, 10, 11))
def dedup_gat_attention(a_dst, a_src, v, layout: DedupLayout,
                        red: BlockedLayout, num_heads: int, dvh: int,
                        leaky: float = 0.2, nb: int = 256, et: int = 1024,
                        interpret: bool = False, attn_drop: float = 0.0,
                        drop_seed=None):
    """out[r] = Σ_{e: dst=r} softmax_r(leaky(a_dst[r] + a_src[src_e]))
    · v[src_e], via the count-matrix pair form.

    a_dst/a_src: [N, H] per-head additive score halves; v: [N, DV] with
    heads at DVH strides (DV lane-aligned, tail ignored).

    ``attn_drop`` > 0 applies in-kernel post-softmax attention dropout
    keyed by the deterministic ``_drop_keep`` hash of each (dst, uniq
    src) cell — on SIMPLE graphs (``layout.simple``) that is exactly the
    reference's per-edge dropout; pass a multigraph through the
    per-edge kernels instead.
    """
    out, _ = _dedup_attn_fwd_call(a_dst, a_src, v, layout, num_heads, dvh,
                                  0, True, leaky, nb, et, layout.w,
                                  interpret, attn_drop, drop_seed)
    return out


def _dga_fwd(a_dst, a_src, v, layout, red, num_heads, dvh, leaky, nb, et,
             interpret, attn_drop, drop_seed=None):
    out, lse = _dedup_attn_fwd_call(a_dst, a_src, v, layout, num_heads,
                                    dvh, 0, True, leaky, nb, et, layout.w,
                                    interpret, attn_drop, drop_seed)
    return out, (a_dst, a_src, v, out, lse, layout, red, drop_seed)


def _dga_bwd(num_heads, dvh, leaky, nb, et, interpret, attn_drop, res, g):
    a_dst, a_src, v, out, lse, layout, red, drop_seed = res
    da_dst, da_src, dv = _dedup_attn_bwd_call(
        a_dst, a_src, v, g, out, lse, layout, red, num_heads, dvh, 0,
        True, leaky, nb, et, layout.w, interpret, attn_drop, drop_seed)
    return da_dst, da_src, dv, None, None, None


dedup_gat_attention.defvjp(_dga_fwd, _dga_bwd)


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(5, 6, 7, 8, 9, 10, 11, 12))
def dedup_dot_attention(q, k, v, layout: DedupLayout, red: BlockedLayout,
                        num_heads: int, dsh: int, dvh: int,
                        leaky: float = 0.0, nb: int = 256, et: int = 1024,
                        interpret: bool = False, attn_drop: float = 0.0,
                        drop_seed=None):
    """out[r] = Σ_{e: dst=r} softmax_r(q[r]·k[src_e]) · v[src_e] — the
    TransformerConv/UniMP triple (``pgl/nn/conv.py:808-846``) in
    count-matrix pair form. q/k: [N, H·dsh]; v: [N, DV] (lane-aligned).
    ``attn_drop``: see :func:`dedup_gat_attention` (simple graphs)."""
    out, _ = _dedup_attn_fwd_call(q, k, v, layout, num_heads, dvh, dsh,
                                  False, leaky, nb, et, layout.w,
                                  interpret, attn_drop, drop_seed)
    return out


def _dda_fwd(q, k, v, layout, red, num_heads, dsh, dvh, leaky, nb, et,
             interpret, attn_drop, drop_seed=None):
    out, lse = _dedup_attn_fwd_call(q, k, v, layout, num_heads, dvh, dsh,
                                    False, leaky, nb, et, layout.w,
                                    interpret, attn_drop, drop_seed)
    return out, (q, k, v, out, lse, layout, red, drop_seed)


def _dda_bwd(num_heads, dsh, dvh, leaky, nb, et, interpret, attn_drop,
             res, g):
    q, k, v, out, lse, layout, red, drop_seed = res
    dq, dk, dv = _dedup_attn_bwd_call(
        q, k, v, g, out, lse, layout, red, num_heads, dvh, dsh, False,
        leaky, nb, et, layout.w, interpret, attn_drop, drop_seed)
    return dq, dk, dv, None, None, None


dedup_dot_attention.defvjp(_dda_fwd, _dda_bwd)
