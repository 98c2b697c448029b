"""Dedup SDDMM: per-edge combine of endpoint rows at HBM speed-of-light.

``send_uv`` (reference ``pgl/graph.py:939-973``) is two random ``[E, D]``
row gathers plus an ``[E, D]`` write. On TPU the gathers are row-count
bound (~2.8 ns/row at 2M rows, ``experiments/fused_gather/README.md``) —
a full-E f32 SDDMM measures ~14.5 ms at 2M edges × 128d where the HBM
model says 3.9 ms (``experiments/sddmm_breakdown.py``).

This kernel removes both gathers:

  * src side — the dedup trick (``dedup_kernels.py``): gather each
    distinct src once per 128-row dst block (U ≈ 0.15·E rows), then
    expand on the MXU: ``xsrc[ET, D] = onehot_rank[ET, W] @ win[W, D]``.
    Within a pair edges are rank-sorted, so the one-hot is two compares
    of a slot-position iota against a host-built interval table.
  * dst side — dst rows of a block are one contiguous ``[NB, D]`` DMA;
    expansion is the transposed one-hot product
    ``xdst[ET, D] = onehot_dst[NB, ET]ᵀ @ dstrows[NB, D]`` (MXU handles
    the sublane contraction natively — no transpose materialised).

f32 precision through bf16 matmuls: the window / dst-row tiles split
into hi+mid+lo bf16 pieces (three matmuls per side, |err| ≲ 2⁻²⁶·|x| —
the same split the weighted dedup SpMM uses for edge weights). The
one-hots are 0/1, bf16-exact.

Output is written in the layout's **slot order** (dedup edge order,
pair spans padded to 128-slot exclusivity so every 128-row output block
has exactly one writer — no read-modify-write, no scatter). Real edges
map back via ``layout.eid`` (slot → CSC edge position); pads hold 0.
Consumers that need per-dst segments (edge softmax, attention) read
slot order natively — it is dst-block-major like CSC.

Unlike the SpMM there is no count-matrix collapse (the output stays
per-edge), so the MXU bill is the expansion itself:
``S·(W+NB)·D·2·3`` FLOPs ≈ 530 GFLOP at bench shape — ~1.4 ms at the
v5e bf16 peak vs the 12 ms of gathers it replaces.
"""

from __future__ import annotations

import functools
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .segment_kernels import _take_ib

__all__ = ["SddmmLayout", "build_sddmm_layout", "sddmm_dedup",
           "NB_SDDMM", "ET_SDDMM", "W_SDDMM"]

NB_SDDMM = 128    # dst rows per block (no count collapse → small blocks)
ET_SDDMM = 1024   # edge slots per tile
W_SDDMM = 128     # uniq rows per rank window

_ROW_SENTINEL = np.int32(-(1 << 30))

_COMBINE = {
    "add": lambda a, b: a + b,
    "sub": lambda a, b: a - b,
    "mul": lambda a, b: a * b,
    "div": lambda a, b: a / b,
}



@jax.tree_util.register_pytree_node_class
class SddmmLayout:
    """Device-resident slot layout for the dedup SDDMM.

    uv:        [Upad + W] int32 — per-block unique src ids, runs padded
               to W multiples (pad = 0); +W tail for the window DMA
    slot_src:  [S] int32 src id per slot (0 at pads) — backward fallback
    slot_ids:  [S/128, 128] int32 dst id per slot, sentinel ``n_pad``
    rank_iv:   [Pa, 2·W/128, 128] int32 slot-position interval per
               (ACTIVE pair, rank-in-window) — starts then ends, packed
               so each pair costs one tiny DMA
    pair_*:    [Pa] int32 per-active-pair tables — slot start, tile
               count, global tile index of tile 0, window uniq-row
               base, dst block (empty pairs are dropped: the grid runs
               one step per active pair)
    tile_*:    [T] int32 per-global-tile tables — quant-aligned slot
               start and owned 128-row subblock count (out-DMA
               descriptor reconstruction across pair boundaries)
    eid:       [S] int64 host numpy — CSC edge position per slot, -1 at
               pads (NOT traced; use from host code / tests)
    """

    def __init__(self, uv, slot_src, slot_ids, rank_iv,
                 pair_ts, pair_nt, pair_gt0, pair_wb, pair_blk,
                 tile_start, tile_nsub,
                 num_segments: int, num_edges: int, slots: int,
                 nb: int, et: int, w: int, quant: int = 512, eid=None):
        self.uv = uv
        self.slot_src = slot_src
        self.slot_ids = slot_ids
        self.rank_iv = rank_iv
        self.pair_ts = pair_ts
        self.pair_nt = pair_nt
        self.pair_gt0 = pair_gt0
        self.pair_wb = pair_wb
        self.pair_blk = pair_blk
        self.tile_start = tile_start
        self.tile_nsub = tile_nsub
        self.num_segments = num_segments
        self.num_edges = num_edges
        self.slots = slots
        self.nb = nb
        self.et = et
        self.w = w
        self.quant = quant
        self.eid = eid          # host-only aux

    def tree_flatten(self):
        return ((self.uv, self.slot_src, self.slot_ids,
                 self.rank_iv,
                 self.pair_ts, self.pair_nt, self.pair_gt0,
                 self.pair_wb, self.pair_blk,
                 self.tile_start, self.tile_nsub),
                (self.num_segments, self.num_edges, self.slots,
                 self.nb, self.et, self.w, self.quant))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)


def build_sddmm_layout(indptr, sorted_v, num_segments: int,
                       nb: int = NB_SDDMM, et: int = ET_SDDMM,
                       w: int = W_SDDMM,
                       quant: int = 128) -> Optional[SddmmLayout]:
    """Host-side (numpy) construction from the CSC index; O(E log E).

    Differs from ``build_dedup_layout`` in one structural way: pair
    spans are padded to **exclusive ``quant``-slot multiples** (instead
    of sharing 128-aligned boundary blocks), because SDDMM writes
    per-edge rows — every output block must have exactly one writing
    pair, and a coarse quant keeps it to one DMA per tile (quant must
    divide ``et`` and be a multiple of 128; 512 costs ~7% pad slots on
    the bench graph). Returns None for empty graphs.
    """
    assert quant % 128 == 0 and et % quant == 0
    from .dedup_kernels import _LayoutPrefix
    if len(np.asarray(sorted_v)) == 0:
        return None
    pre = _LayoutPrefix(indptr, sorted_v, num_segments, nb, w)
    E, N, n_pad = pre.E, pre.N, pre.n_pad
    uv, grow_o, dst_o, src_o, order = (pre.uv, pre.grow_o, pre.dst_o,
                                       pre.src_o, pre.order)
    P, pair_blk, pair_wb = pre.P, pre.pair_blk, pre.pair_wb
    starts, ends = pre.starts, pre.ends
    span = ends - starts
    span_pad = (span + quant - 1) // quant * quant  # exclusive pads
    slot_off = np.zeros(P + 1, np.int64)
    np.cumsum(span_pad, out=slot_off[1:])
    S = int(slot_off[-1])

    # slot arrays (edge → slot position: slot_off[pair] + pos-in-span)
    epair = np.repeat(np.arange(P, dtype=np.int64), span)
    epos = np.arange(E, dtype=np.int64) - np.repeat(starts, span)
    eslot = slot_off[epair] + epos                  # for edge k of order
    S_alloc = S + et                                # DMA overrun tail
    slot_ids = np.full(S_alloc, n_pad, np.int32)
    slot_ids[eslot] = dst_o
    slot_src = np.zeros(S, np.int32)
    slot_src[eslot] = src_o
    eid = np.full(S, -1, np.int64)
    eid[eslot] = order

    # per-(pair, rank) slot-position intervals: searchsorted over the
    # span-ordered grow, then shifted into slot coordinates
    q = (pair_wb[:, None] + np.arange(w, dtype=np.int64)[None, :]).ravel()
    rts = np.searchsorted(grow_o, q, side="left")
    rte = np.searchsorted(grow_o, q, side="right")
    shift = (slot_off[:-1] - starts).repeat(w)      # per (pair, rank)
    # ranks outside the pair's own span keep empty intervals; clamp so a
    # foreign pair's edges can never satisfy the compare
    lo = np.repeat(slot_off[:-1], w)
    hi = np.repeat(slot_off[:-1] + span, w)
    rank_ts = np.clip(rts + shift, lo, hi).astype(np.int32)
    rank_te = np.clip(rte + shift, lo, hi).astype(np.int32)

    # per-tile + active-pair-packed tables
    nt = np.maximum((span_pad + et - 1) // et, 0)   # 0 tiles if empty
    nt[span_pad == 0] = 0
    T = int(nt.sum())
    if T == 0:
        return None
    tile_pidx = np.repeat(np.arange(P, dtype=np.int64), nt)
    tile_k = np.arange(T, dtype=np.int64) - np.repeat(
        np.concatenate([[0], np.cumsum(nt)[:-1]]), nt)
    tile_start = slot_off[tile_pidx] + tile_k * et
    tile_nsub = np.minimum(
        (slot_off[tile_pidx] + span_pad[tile_pidx] - tile_start) // 128,
        et // 128)

    act = np.flatnonzero(nt > 0)
    a_nt = nt[act]
    a_gt0 = np.concatenate([[0], np.cumsum(a_nt)[:-1]])

    return SddmmLayout(
        jnp.asarray(uv),
        jnp.asarray(slot_src),
        jnp.asarray(slot_ids.reshape(-1, 128)),
        jnp.asarray(np.concatenate(
            [rank_ts.reshape(P, w // 128, 128)[act],
             rank_te.reshape(P, w // 128, 128)[act]], axis=1)),
        jnp.asarray(slot_off[act].astype(np.int32)),
        jnp.asarray(a_nt.astype(np.int32)),
        jnp.asarray(a_gt0.astype(np.int32)),
        jnp.asarray(pair_wb[act].astype(np.int32)),
        jnp.asarray(pair_blk[act].astype(np.int32)),
        jnp.asarray(tile_start.astype(np.int32)),
        jnp.asarray(tile_nsub.astype(np.int32)),
        int(N), int(E), S, nb, et, w, quant=quant, eid=eid)


def _split3(x32, out_ref):
    """f32 → (hi, mid, lo) bf16 pieces stacked along the row dim of
    ``out_ref`` ([3·R, D]); the sum reconstructs to 2⁻²⁶. Stacking puts
    the three pieces on the matmul's K axis, so the expansion runs as
    ONE K=3R product instead of three shallow K=R ones."""
    R = x32.shape[0]
    hi = x32.astype(jnp.bfloat16)
    r1 = x32 - hi.astype(jnp.float32)               # exact (Sterbenz)
    mid = r1.astype(jnp.bfloat16)
    lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    out_ref[0:R] = hi
    out_ref[R:2 * R] = mid
    out_ref[2 * R:3 * R] = lo


def _sddmm_kernel(ts_ref, nt_ref, gt0_ref, wb_ref, blk_ref,       # [Pa]
                  tstart_ref, tnsub_ref,                          # [T]
                  uniq_ref, dstp_ref, ids_ref, iv_ref,            # HBM
                  out_ref,                                        # HBM
                  win_f, dst_f, win_b, dst_b, ids_t, iv_t,
                  ohr, out_t,
                  sem_w, sem_d, sem_i, sem_b, sem_o,
                  *, NB: int, ET: int, W: int, D: int, P: int, T: int,
                  QS: int, op: str):
    """Pair-grid skeleton (mirrors ``dedup_kernels._dedup_kernel``):
    grid step p = one ACTIVE (dst block, rank window) pair; window /
    dst-block / interval DMAs double-buffer across grid steps, ids and
    out tiles double-buffer across the inner tile loop. Out DMAs are
    addressed through per-global-tile tables so the cross-pair reuse
    wait (global tile g-2) reconstructs the right descriptor even when
    it belongs to an earlier pair."""
    p = pl.program_id(0)
    slot_p = p % 2
    e0 = ts_ref[p]
    nt = nt_ref[p]
    g0 = gt0_ref[p]
    ER = ET // 128
    HW = W // 128
    NQ = ET // QS

    def pair_dmas(q, slot):
        return (
            pltpu.make_async_copy(
                uniq_ref.at[pl.ds(pl.multiple_of(wb_ref[q], 8), W), :],
                win_f.at[slot], sem_w.at[slot]),
            pltpu.make_async_copy(
                dstp_ref.at[pl.ds(
                    pl.multiple_of(blk_ref[q] * NB, NB), NB), :],
                dst_f.at[slot], sem_d.at[slot]),
            pltpu.make_async_copy(iv_ref.at[q], iv_t.at[slot],
                                  sem_b.at[slot]),
        )

    @pl.when(p == 0)
    def _():
        for c in pair_dmas(0, 0):
            c.start()

    @pl.when(p + 1 < P)
    def _():
        for c in pair_dmas(jnp.minimum(p + 1, P - 1), (p + 1) % 2):
            c.start()

    def ids_dma(k, slot):
        return pltpu.make_async_copy(
            ids_ref.at[pl.ds(e0 // 128 + k * ER, ER), :],
            ids_t.at[slot], sem_i.at[slot])

    def out_dma(g, slot, nq):
        return pltpu.make_async_copy(
            out_t.at[slot, pl.ds(0, nq * QS), :],
            out_ref.at[pl.ds(tstart_ref[g], nq * QS), :],
            sem_o.at[slot])

    def wait_out(g):
        for nq in range(1, NQ + 1):
            @pl.when(tnsub_ref[g] == nq * (QS // 128))
            def _(nq=nq):
                out_dma(g, g % 2, nq).wait()

    ids_dma(0, 0).start()
    for c in pair_dmas(p, slot_p):
        c.wait()
    _split3(win_f[slot_p], win_b)
    _split3(dst_f[slot_p], dst_b)

    sub = jax.lax.broadcasted_iota(jnp.int32, (128, 1), 0)
    rows_d = jax.lax.broadcasted_iota(jnp.int32, (NB, 128), 0)
    row_base = blk_ref[p] * NB

    def body(k, _):
        g = g0 + k
        slot_i = k % 2

        @pl.when(k + 1 < nt)
        def _():
            ids_dma(k + 1, (k + 1) % 2).start()

        ids_dma(k, slot_i).wait()

        ohd_chunks = []
        for r in range(ER):
            s_glob = e0 + k * ET + r * 128 + sub     # [128, 1] slot pos
            for h in range(HW):
                m = ((s_glob >= iv_t[slot_p, h:h + 1, :])
                     & (s_glob < iv_t[slot_p, HW + h:HW + h + 1, :]))
                ohr[r * 128:(r + 1) * 128, h * 128:(h + 1) * 128] = \
                    jnp.where(m, 1.0, 0.0).astype(ohr.dtype)
            ids_row = ids_t[slot_i, r].reshape(1, 128) - row_base
            ohd_chunks.append(jnp.where(rows_d == ids_row, 1.0, 0.0)
                              .astype(jnp.bfloat16))
        ohd = jnp.concatenate(ohd_chunks, axis=1)    # [NB, ET]
        xdst = jnp.zeros((ET, D), jnp.float32)
        xsrc = jnp.zeros((ET, D), jnp.float32)
        for j in range(3):
            xdst = xdst + jax.lax.dot_general(
                ohd, dst_b[j * NB:(j + 1) * NB], (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            xsrc = xsrc + jax.lax.dot_general(
                ohr[:], win_b[j * W:(j + 1) * W], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        c = _COMBINE[op](xsrc, xdst)
        if op == "div":
            # pads have no rank hit → xsrc = xdst = 0 → 0/0; everywhere
            # else 0/x or the true quotient matches the XLA reference
            valid = jnp.sum(ohr[:].astype(jnp.float32), axis=1,
                            keepdims=True)
            c = jnp.where(valid > 0, c, 0.0)

        @pl.when(g >= 2)
        def _():
            wait_out(g - 2)

        out_t[g % 2] = c
        for nq in range(1, NQ + 1):
            @pl.when(tnsub_ref[g] == nq * (QS // 128))
            def _(nq=nq):
                out_dma(g, g % 2, nq).start()
        return ()

    jax.lax.fori_loop(0, nt, body, ())

    # final drain: the last grid step waits the last two global tiles
    @pl.when(p == P - 1)
    def _():
        if T >= 2:
            wait_out(jnp.int32(T - 2))
        wait_out(jnp.int32(T - 1))


@functools.partial(jax.jit, static_argnames=("op", "interpret"))
def _sddmm_call(src_feat, dst_feat, layout: SddmmLayout, op: str,
                interpret: bool):
    D = src_feat.shape[1]
    NB, ET, W = layout.nb, layout.et, layout.w
    N = layout.num_segments
    n_pad = (N + NB - 1) // NB * NB
    T = int(layout.tile_start.shape[0])
    S = layout.slots
    qs = layout.quant
    P = int(layout.pair_ts.shape[0])

    uniq = _take_ib(src_feat, layout.uv)
    dstp = jnp.zeros((n_pad, D), dst_feat.dtype).at[:N].set(dst_feat)

    kernel = functools.partial(_sddmm_kernel, NB=NB, ET=ET, W=W, D=D,
                               P=P, T=T, QS=qs, op=op)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=7,
            grid=(P,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY)] * 4,
            out_specs=pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
            scratch_shapes=[
                pltpu.VMEM((2, W, D), jnp.float32),       # win_f
                pltpu.VMEM((2, NB, D), jnp.float32),      # dst_f
                pltpu.VMEM((3 * W, D), jnp.bfloat16),     # win_b
                pltpu.VMEM((3 * NB, D), jnp.bfloat16),    # dst_b
                pltpu.VMEM((2, ET // 128, 128), jnp.int32),
                pltpu.VMEM((2, 2 * (W // 128), 128), jnp.int32),
                pltpu.VMEM((ET, W), jnp.bfloat16),        # ohr
                pltpu.VMEM((2, ET, D), jnp.float32),      # out_t
                pltpu.SemaphoreType.DMA((2,)),            # sem_w
                pltpu.SemaphoreType.DMA((2,)),            # sem_d
                pltpu.SemaphoreType.DMA((2,)),            # sem_i
                pltpu.SemaphoreType.DMA((2,)),            # sem_b
                pltpu.SemaphoreType.DMA((2,)),            # sem_o
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((S + ET, D), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * 3 * T * ET * (W + NB) * D,
            bytes_accessed=(int(layout.uv.shape[0]) * D * 4
                            + n_pad * D * 4 + S * D * 4),
            transcendentals=0),
    )(layout.pair_ts, layout.pair_nt, layout.pair_gt0,
      layout.pair_wb, layout.pair_blk,
      layout.tile_start, layout.tile_nsub,
      uniq, dstp, layout.slot_ids, layout.rank_iv)
    return out[:S]


def sddmm_xla_slots(src_feat, dst_feat, layout: SddmmLayout,
                    op: str = "mul"):
    """Slot-order SDDMM on the plain XLA gather path — same output
    contract as the kernel ([S, D] f32, pads 0); the non-TPU backend
    fallback (interpret mode is far too slow at real sizes)."""
    N = layout.num_segments
    n_pad = (N + layout.nb - 1) // layout.nb * layout.nb
    ids = layout.slot_ids.reshape(-1)[:layout.slots]
    valid = (ids < n_pad)[:, None]
    xs = _take_ib(src_feat, layout.slot_src)
    xd = jnp.take(dst_feat, jnp.minimum(ids, N - 1), axis=0)
    out = _COMBINE[op](xs.astype(jnp.float32), xd.astype(jnp.float32))
    return jnp.where(valid, out, 0.0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def sddmm_dedup(src_feat, dst_feat, layout: SddmmLayout,
                op: str = "mul", interpret: bool = False):
    """``out[slot] = src_feat[src_slot] ⊛ dst_feat[dst_slot]`` in the
    layout's slot order ([S, D] f32; pads are 0). Map real edges back
    with ``layout.eid`` (host aux). Forward runs the Pallas kernel;
    backward is the XLA gather/segment fallback (attention training
    should use the fused attention kernels instead)."""
    return _sddmm_call(src_feat, dst_feat, layout, op, interpret)


def _sddmm_fwd(src_feat, dst_feat, layout, op, interpret):
    out = _sddmm_call(src_feat, dst_feat, layout, op, interpret)
    return out, (src_feat, dst_feat, layout)


def _sddmm_bwd(op, interpret, res, g):
    src_feat, dst_feat, layout = res
    N = layout.num_segments
    NB = layout.nb
    n_pad = (N + NB - 1) // NB * NB
    S = layout.slots
    ids = layout.slot_ids.reshape(-1)[:S]
    valid = (ids < n_pad)[:, None]
    gv = jnp.where(valid, g, 0.0)
    xs = _take_ib(src_feat, layout.slot_src)
    xd = jnp.take(dst_feat, jnp.minimum(ids, N - 1), axis=0)
    if op == "add":
        gs, gd = gv, gv
    elif op == "sub":
        gs, gd = gv, -gv
    elif op == "mul":
        gs, gd = gv * xd, gv * xs
    else:                                            # div
        gs = gv / xd
        gd = -gv * xs / (xd * xd)
        gs = jnp.where(valid, gs, 0.0)
        gd = jnp.where(valid, gd, 0.0)
    dsrc = jax.ops.segment_sum(gs, layout.slot_src, num_segments=N)
    ddst = jax.ops.segment_sum(gd, jnp.minimum(ids, N - 1),
                               num_segments=N)
    return dsrc.astype(src_feat.dtype), ddst.astype(dst_feat.dtype), None


sddmm_dedup.defvjp(_sddmm_fwd, _sddmm_bwd)
