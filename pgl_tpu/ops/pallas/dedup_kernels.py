"""Two-phase unique-src SpMM: beat the XLA gather floor by gathering each
distinct source row once per dst row block.

The single-chip SpMM floor is the ``[E, D]`` gather of source rows (~10
ns/row, insensitive to locality — ``experiments/fused_gather/README.md``).
But on the graphs that matter (powerlaw / preferential attachment, the
bench graph, real social/citation graphs) the edges of one ``NB``-row dst
block reference far fewer than ``E_block`` distinct sources — hubs repeat:
measured U/E = 0.106 at NB=256 on the 2M-edge bench graph
(``experiments/unique_dedup/measure_ratio.py``). So:

  phase 1 (XLA)    ``uniq = feature[uv]`` — one hardware gather of
                   ``U ≈ 0.13·E`` rows instead of ``E``.
  phase 2 (Pallas) per (dst block, rank window): DMA the window's ``W``
                   uniq rows (contiguous!) into VMEM and expand+reduce on
                   the MXU:
                   ``acc += onehot_dst[NB,ET] @ (onehot_rankᵀ[ET,W] @ win[W,D])``

Within a block, edges are sorted by their source's rank in the block's
unique table, so each ``W``-rank window owns a contiguous edge span — the
window DMA is a plain slice, never a gather. Both one-hot compares use the
aligned-superset trick of the base kernel (`segment_kernels._kernel`):
edges outside the current block fail the dst compare, edges outside the
current window fail the rank compare, so ET-aligned tile DMAs need no
masking. Edge weights fold into the rank one-hot (its nonzero value is the
edge's weight instead of 1.0) at zero extra cost.

MXU work grows ~1.9× (measured packing: slots 1.28×E at W=128/ET=512, each
paying (NB+W)·D MACs vs NB·D), but the gather bill — the actual floor —
drops ~7.6×.

Replaces the same CUDA fused ops as the base kernel (``pgl/graph.py:860``,
``pgl/math.py:36``); this variant has no reference analog — it exists
because TPU's gather is the bottleneck where CUDA's scatter was.
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

__all__ = ["DedupLayout", "build_dedup_layout", "spmm_dedup",
           "spmm_dedup_weighted", "materialize_counts",
           "NBD_DEFAULT", "ETD_DEFAULT", "W_DEFAULT"]

NBD_DEFAULT = 256     # output rows per dst block
ETD_DEFAULT = 1024    # edges per DMA tile
W_DEFAULT = 128       # uniq rows per rank window

_ROW_SENTINEL = np.int32(-(1 << 30))



@jax.tree_util.register_pytree_node_class
class DedupLayout:
    """Device-resident layout for the two-phase SpMM.

    uv:          [Upad] int32 — concatenated per-block unique src ids,
                 DENSELY packed (each block's run padded only to the
                 8-row sublane tile; pad = 0) — window offsets may
                 straddle block boundaries, which every consumer
                 tolerates (see _LayoutPrefix)
    padded_v:    [Ep] int32 src id per edge in dedup order (backward dw)
    padded_ids:  [Ep/128, 128] int32 dst ids, dedup edge order, sentinel
                 ``n_pad`` at pads
    padded_rows: host-only numpy aux ([Ep] int32 global uniq-row index
                 per edge, ``uv_off[blk] + rank``) — the interval-table
                 kernel no longer reads it, so it stays OFF the device
                 and out of the pytree (kept for layout debugging and
                 the historical kernel variants in
                 ``experiments/dedup_breakdown``)
    rank_iv:     [P, 2·W/128, 128] int32 — per (pair, rank-in-window)
                 the start (first W/128 rows) and exclusive-end (last
                 W/128 rows) *edge position* of that rank's run (edges
                 are rank-sorted within a pair, so each rank owns one
                 contiguous interval — the kernel's rank "one-hot" is
                 two position compares, born pre-transposed [ET, W]).
                 Packed into ONE array so each pair costs a single tiny
                 DMA instead of two
    pair_ts/te:  [P] int32 ET-aligned start / exclusive end edge offsets
                 per (block, window) pair
    pair_blk:    [P] int32 output block index per pair (sorted ascending)
    pair_wb:     [P] int32 global uniq-row offset of the pair's window
    eid:         [E] int32 — for dedup position i, the CSC/CSR-order edge
                 position it came from (permute weights with ``w[eid]``)
    counts:      optional [P·NB, W] bf16 — the MATERIALIZED count matrix
                 (``materialize_counts``). C is purely structural (it
                 depends only on the graph, never on features), yet the
                 kernels rebuilt it from ids+intervals on every SpMM /
                 attention fwd / attention bwd call — the measured
                 ~1-2 µs/pair count-pass floor. Cached, each pair costs
                 one [NB, W] DMA (~0.1 µs) instead. bf16 holds counts
                 exactly up to 256 (gated by ``max_count``); HBM cost is
                 NB·W·2 bytes per pair ≈ 33 B/edge, so caching is gated
                 by a size budget at the call site.
    """

    def __init__(self, uv, padded_v, padded_ids,
                 rank_iv,
                 pair_ts, pair_te, pair_blk, pair_wb, eid,
                 counts=None,
                 num_segments: int = 0, num_edges: int = 0, w: int = 128,
                 simple: bool = False, max_count: int = 0,
                 padded_rows=None):
        self.uv = uv
        self.padded_v = padded_v
        self.padded_ids = padded_ids
        self.padded_rows = padded_rows      # host-only aux (may be None)
        self.rank_iv = rank_iv
        self.pair_ts = pair_ts
        self.pair_te = pair_te
        self.pair_blk = pair_blk
        self.pair_wb = pair_wb
        self.eid = eid
        self.counts = counts
        self.num_segments = num_segments
        self.num_edges = num_edges
        self.w = w
        # no duplicate (dst, src) pairs: every count-matrix cell is 0/1,
        # so per-(pair)-cell dropout in the dedup attention IS per-edge
        # dropout (multigraphs keep the per-edge kernel fallback)
        self.simple = simple
        # largest per-(dst, src) edge multiplicity (0 = unknown): bf16
        # count caching is exact only when <= 256
        self.max_count = max_count

    def tree_flatten(self):
        return ((self.uv, self.padded_v, self.padded_ids,
                 self.rank_iv,
                 self.pair_ts, self.pair_te, self.pair_blk, self.pair_wb,
                 self.eid, self.counts),
                (self.num_segments, self.num_edges, self.w, self.simple,
                 self.max_count))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, num_segments=aux[0], num_edges=aux[1],
                   w=aux[2], simple=aux[3], max_count=aux[4])


class _LayoutPrefix:
    """Shared host-side construction both dedup layouts start from: the
    per-block unique-src table, rank assignment, dedup edge order, and
    (block, window) pair enumeration with exact edge spans. One
    implementation so a fix (e.g. the M modulus for global src ids, or
    the empty-block ``nw = 1`` convention) cannot silently diverge
    between the SpMM (`build_dedup_layout`) and SDDMM
    (`sddmm_kernels.build_sddmm_layout`) builders."""

    __slots__ = ("E", "N", "n_pad", "G", "uv", "uv_off", "Upad",
                 "grow_o", "dst_o", "src_o", "order",
                 "nw", "P", "pair_blk", "win_in_blk", "pair_wb",
                 "starts", "ends", "ubp_sum", "n_uniq", "max_count",
                 "rejected")

    def __init__(self, indptr, sorted_v, num_segments: int, nb: int,
                 w: int, max_ratio: float = 0.0,
                 want_simple: bool = False):
        indptr = np.asarray(indptr, dtype=np.int64)
        src = np.asarray(sorted_v, dtype=np.int64)
        E = len(src)
        N = num_segments
        n_pad = (N + nb - 1) // nb * nb
        G = n_pad // nb

        dst = np.repeat(np.arange(N, dtype=np.int64), np.diff(indptr))
        blk = dst // nb

        # per-block unique src table + per-edge rank. src ids may exceed
        # N (chunked sub-problems gather from a GLOBAL feature table,
        # ops/pallas/streaming.py), so the composite key uses its own
        # modulus
        M = max(N, int(src.max()) + 1 if E else 1)
        key = blk * M + src
        uniq, inv = np.unique(key, return_inverse=True)
        ublk = (uniq // M).astype(np.int64)
        ub = np.bincount(ublk, minlength=G)          # uniques per block
        ubp = (ub + w - 1) // w * w                  # padded to W windows
        self.ubp_sum = float(ubp.sum())
        # bail out BEFORE the expensive passes (lexsort, searchsorteds)
        # when the caller's unique-ratio eligibility check fails — this
        # runs for every tensor() graph in the dedup size band, and the
        # whole point of the check is to reject near-regular graphs
        self.rejected = bool(max_ratio and E
                             and self.ubp_sum / E > max_ratio)
        self.n_uniq = -1
        self.max_count = 0
        if self.rejected:
            return
        # DENSE packing (round 5): per-block unique runs are concatenated
        # padded only to the f32 SUBLANE tile (8 rows — Mosaic requires
        # dynamic row offsets divisible by the sublane tiling), not to W
        # — window offsets (pair_wb) may straddle block boundaries,
        # which the kernels tolerate: a window DMA reads W contiguous
        # rows at any 8-aligned offset, spilled rows belong to ANOTHER
        # block whose edges fail the dst compare (and the SDDMM
        # intervals clamp to the pair's own span). W-aligned packing
        # gathered ~18% dead rows on the bench graph vs ~1% at 8; the
        # uniq gather is half the counts-cached SpMM, so density pays.
        uv_off = np.zeros(G + 1, np.int64)
        np.cumsum((ub + 7) // 8 * 8, out=uv_off[1:])
        Upad = int(uv_off[-1])
        # rank indexes into the DENSE np.unique output, so its block
        # offsets are the UNpadded cumulative uniques (uv_off is padded)
        blk_first = np.zeros(G, np.int64)
        np.cumsum(ub, out=blk_first)                 # exclusive via shift
        blk_first = np.concatenate([[0], blk_first[:-1]])
        rank = np.arange(len(uniq), dtype=np.int64) - blk_first[ublk]
        # +w tail: the last window (and empty blocks') DMA reads up to
        # [Upad - 1 + w); the rows are never referenced but must exist
        uv = np.zeros(Upad + w, np.int32)
        uv[uv_off[ublk] + rank] = (uniq % M).astype(np.int32)

        grow = uv_off[blk] + rank[inv]               # per-edge global row
        # dedup edge order: by (block, grow); blocks are already
        # contiguous. grow is globally non-decreasing in this order, so
        # each unique row's (= rank's) edges occupy ONE contiguous
        # position interval — the kernels' transposed rank one-hot is
        # two position compares against a tiny host-precomputed
        # interval table (no per-edge rank DMA).
        order = np.lexsort((grow, blk))
        blk_o = blk[order]
        self.grow_o = grow[order]
        self.dst_o = dst[order]
        self.src_o = src[order]
        self.order = order

        # (block, window) pairs: windows per block = max(ceil(ub/w), 1)
        nw = np.maximum(ubp // w, 1)
        P = int(nw.sum())
        pair_blk = np.repeat(np.arange(G, dtype=np.int64), nw)
        win_in_blk = np.arange(P, dtype=np.int64) - np.repeat(
            np.concatenate([[0], np.cumsum(nw)[:-1]]), nw)
        self.pair_wb = uv_off[pair_blk] + win_in_blk * w
        # exact edge span per pair: edges sorted by (blk, grow) →
        # searchsorted on the composite (blk, window) key
        ekey = blk_o * (int(nw.max()) + 1) + \
            (self.grow_o - uv_off[blk_o]) // w
        pkey = pair_blk * (int(nw.max()) + 1) + win_in_blk
        self.starts = np.searchsorted(ekey, pkey, side="left")
        self.ends = np.searchsorted(ekey, pkey, side="right")
        if want_simple:
            # duplicate (dst, src) detection: same dst AND same global
            # uniq row ⇔ the same count-matrix cell (a multi-edge);
            # one extra O(E log E) pass, so only when the caller needs
            # the `simple` flag (the attention-dropout dispatch). The
            # per-cell multiplicities double as the counts-cache
            # exactness gate (bf16 cells hold counts <= 256 exactly).
            if E:
                _, cell_counts = np.unique(
                    self.dst_o.astype(np.int64) * (Upad + 1) + self.grow_o,
                    return_counts=True)
                self.n_uniq = len(cell_counts)
                self.max_count = int(cell_counts.max())
            else:
                self.n_uniq = 0
                self.max_count = 0
        self.E, self.N, self.n_pad, self.G = E, N, n_pad, G
        self.uv, self.uv_off, self.Upad = uv, uv_off, Upad
        self.nw, self.P = nw, P
        self.pair_blk, self.win_in_blk = pair_blk, win_in_blk


def build_dedup_layout(indptr, sorted_v, num_segments: int,
                       nb: int = NBD_DEFAULT, et: int = ETD_DEFAULT,
                       w: int = W_DEFAULT,
                       max_ratio: float = 0.0,
                       debug_rows: bool = False) -> Optional[DedupLayout]:
    """Host-side (numpy) construction from a CSC/CSR index; O(E log E).

    ``max_ratio`` > 0: return None when the padded unique-row count exceeds
    ``max_ratio * E`` — on such graphs (near-regular, no src repetition
    within blocks) the two-phase kernel pays its extra inner matmul without
    a gather saving, so the caller should stay on the base kernel.

    ``debug_rows``: keep the host-only ``padded_rows`` aux (~4·E bytes of
    host RAM) for layout debugging / historical kernel variants; the
    production kernels never read it.
    """
    pre = _LayoutPrefix(indptr, sorted_v, num_segments, nb, w,
                        max_ratio=max_ratio, want_simple=True)
    if pre.rejected:
        return None
    E, N = pre.E, pre.N
    n_pad = pre.n_pad
    uv, grow_o, dst_o, src_o, order = (pre.uv, pre.grow_o, pre.dst_o,
                                       pre.src_o, pre.order)
    P, pair_blk, pair_wb = pre.P, pre.pair_blk, pre.pair_wb
    starts, ends = pre.starts, pre.ends
    # starts are 128-aligned (the DMA tile granularity), NOT et-aligned:
    # et-aligned supersets cost ~2× the edge slots when the mean pair
    # span is below et
    pair_ts = (starts // 128) * 128
    pair_te = ends

    # per-(pair, rank-in-window) edge-position intervals over sorted grow
    q = (pair_wb[:, None] + np.arange(w, dtype=np.int64)[None, :]).ravel()
    rank_ts = np.searchsorted(grow_o, q, side="left").astype(np.int32)
    rank_te = np.searchsorted(grow_o, q, side="right").astype(np.int32)

    Ep = max(((E + et - 1) // et) * et + et, et)
    padded_v = np.zeros(Ep, np.int32)
    padded_v[:E] = src_o
    padded_ids = np.full(Ep, n_pad, np.int32)
    padded_ids[:E] = dst_o
    padded_rows = None
    if debug_rows:
        padded_rows = np.full(Ep, _ROW_SENTINEL, np.int32)
        padded_rows[:E] = grow_o
    return DedupLayout(
        jnp.asarray(uv), jnp.asarray(padded_v),
        jnp.asarray(padded_ids.reshape(-1, 128)),
        jnp.asarray(np.concatenate(
            [rank_ts.reshape(P, w // 128, 128),
             rank_te.reshape(P, w // 128, 128)], axis=1)),
        jnp.asarray(pair_ts.astype(np.int32)),
        jnp.asarray(pair_te.astype(np.int32)),
        jnp.asarray(pair_blk.astype(np.int32)),
        jnp.asarray(pair_wb.astype(np.int32)),
        jnp.asarray(order.astype(np.int32)),
        num_segments=int(N), num_edges=int(E), w=int(w),
        simple=bool(pre.n_uniq == E),
        max_count=int(pre.max_count),
        padded_rows=padded_rows)


def _count_tiles(ts_ref, te_ref, blk_ref, ids_ref, iv_ref,
                 ids_tile, iv_tile, oh_dst, oh_rankT, c_acc,
                 sem_i, sem_b, *, NB, ET, W, P):
    """Shared count-matrix pass: leaves ``C[NB, W]`` (f32) in ``c_acc``.

    Identical machinery to ``dedup_kernels._dedup_kernel``'s tile loop:
    natural dst one-hot (bf16), interval-built transposed rank one-hot,
    one native bf16 matmul per tile.
    """
    p = pl.program_id(0)
    e0 = ts_ref[p]
    e1 = te_ref[p]
    num_tiles = (e1 - e0 + ET - 1) // ET
    row_base = blk_ref[p] * NB
    ER = ET // 128
    HW = W // 128

    b_dma = pltpu.make_async_copy(iv_ref.at[p], iv_tile, sem_b)
    b_dma.start()

    def tile_dma(slot, t):
        start = pl.multiple_of(e0 + t * ET, 128)
        return (pltpu.make_async_copy(
            ids_ref.at[pl.ds(start // 128, ER), :],
            ids_tile.at[slot], sem_i.at[slot]),)

    @pl.when(num_tiles > 0)
    def _():
        for c in tile_dma(0, 0):
            c.start()

    c_acc[:] = jnp.zeros((NB, W), c_acc.dtype)
    b_dma.wait()

    def body(t, _):
        slot = t % 2
        nxt = (t + 1) % 2

        @pl.when(t + 1 < num_tiles)
        def _():
            for c in tile_dma(nxt, t + 1):
                c.start()

        for c in tile_dma(slot, t):
            c.wait()

        rows_d = jax.lax.broadcasted_iota(jnp.int32, (NB, 128), 0)
        sub = jax.lax.broadcasted_iota(jnp.int32, (128, 1), 0)
        for r in range(ER):
            ids_row = ids_tile[slot, r].reshape(1, 128) - row_base
            oh_dst[:, r * 128:(r + 1) * 128] = jnp.where(
                rows_d == ids_row, 1.0, 0.0).astype(oh_dst.dtype)
            e_glob = e0 + t * ET + r * 128 + sub
            for h in range(HW):
                sh = iv_tile[h:h + 1, :]
                eh = iv_tile[HW + h:HW + h + 1, :]
                m = (e_glob >= sh) & (e_glob < eh)
                oh_rankT[r * 128:(r + 1) * 128, h * 128:(h + 1) * 128] = \
                    jnp.where(m, 1.0, 0.0).astype(oh_rankT.dtype)
        c = jax.lax.dot_general(
            oh_dst[:], oh_rankT[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        c_acc[:] = c_acc[:] + c.astype(c_acc.dtype)
        return ()

    jax.lax.fori_loop(0, num_tiles, body, ())



def _dedup_kernel(ts_ref, te_ref, blk_ref, wb_ref,   # [P] SMEM prefetch
                  uniq_ref,                          # [Upad, D] HBM
                  ids_ref,                           # [Ep/128, 128] HBM
                  iv_ref,                            # [P, 2·W/128, 128]
                  out_ref,                           # [NB, D] VMEM
                  win_tile, ids_tile, iv_tile,
                  oh_dst, oh_rankT, c_acc,
                  sem_w, sem_i, sem_b,
                  *, NB: int, ET: int, W: int, D: int, P: int,
                  weighted: bool, w_ref=None, w_tile=None, sem_e=None,
                  oh_dst_lo=None, oh_dst_lo2=None):
    """Count-matrix scheme, MXU-native forms only. Per (dst block, rank
    window) pair, accumulate over the pair's edge tiles

        C[NB, W] += onehot_dst[NB, ET] @ onehot_rankᵀ[ET, W]

    then apply the window's unique rows once per pair:

        out[NB, D] += C @ win[W, D].

    Both one-hots hold 0/1 — bf16-exact — so the per-tile matmul runs at
    the MXU's bf16 rate with f32 accumulation and *exact* counts: 1.5×
    fewer MACs than the expand+reduce formulation at ~4× the issue rate.
    The dst one-hot builds naturally (dst rows on sublanes, edges on
    lanes, straight from the ids DMA). The rank one-hot needs edges on
    *sublanes* — instead of a transpose, the layout keeps each pair's
    edges rank-sorted, so every rank owns one contiguous edge-position
    interval and the transposed one-hot is two compares of a position
    iota against the pair's [W] interval table (no per-edge rank DMA).
    Edge weights fold into the dst one-hot as a 3-term bf16 split
    (hi+mid+lo, three matmuls, |err| ≲ 2⁻²⁶·|w| — f32-grade)."""
    p = pl.program_id(0)
    e0 = ts_ref[p]
    e1 = te_ref[p]
    num_tiles = (e1 - e0 + ET - 1) // ET
    row_base = blk_ref[p] * NB
    ER = ET // 128
    HW = W // 128

    def win_dma(slot, q):
        return pltpu.make_async_copy(
            uniq_ref.at[pl.ds(pl.multiple_of(wb_ref[q], 8), W), :],
            win_tile.at[slot], sem_w.at[slot])

    # window double-buffer across grid steps: step p waits the DMA started
    # at step p-1 and prefetches pair p+1's window
    @pl.when(p == 0)
    def _():
        win_dma(0, 0).start()

    @pl.when(p + 1 < P)
    def _():
        win_dma((p + 1) % 2, p + 1).start()

    # this pair's rank interval table (ts+te packed: ONE tiny DMA per
    # pair; latency hides behind the tile DMA)
    b_dma = pltpu.make_async_copy(iv_ref.at[p], iv_tile, sem_b)
    b_dma.start()

    def tile_dma(slot, t):
        start = pl.multiple_of(e0 + t * ET, 128)
        cps = (
            pltpu.make_async_copy(
                ids_ref.at[pl.ds(start // 128, ER), :],
                ids_tile.at[slot], sem_i.at[slot]),
        )
        if weighted:
            cps += (pltpu.make_async_copy(
                w_ref.at[pl.ds(start // 128, ER), :],
                w_tile.at[slot], sem_e.at[slot]),)
        return cps

    @pl.when(num_tiles > 0)
    def _():
        for c in tile_dma(0, 0):
            c.start()

    @pl.when((p == 0) | (blk_ref[jnp.maximum(p - 1, 0)] != blk_ref[p]))
    def _():
        out_ref[:] = jnp.zeros((NB, D), out_ref.dtype)

    c_acc[:] = jnp.zeros((NB, W), c_acc.dtype)
    b_dma.wait()

    def body(t, _):
        slot = t % 2
        nxt = (t + 1) % 2

        @pl.when(t + 1 < num_tiles)
        def _():
            for c in tile_dma(nxt, t + 1):
                c.start()

        for c in tile_dma(slot, t):
            c.wait()

        # selects run in f32 (the compare mask's native tiling), then cast
        # to bf16 — all values are bf16-representable, so this is exact
        rows_d = jax.lax.broadcasted_iota(jnp.int32, (NB, 128), 0)
        sub = jax.lax.broadcasted_iota(jnp.int32, (128, 1), 0)
        for r in range(ER):
            ids_row = ids_tile[slot, r].reshape(1, 128) - row_base
            hit = rows_d == ids_row
            if weighted:
                wv = w_tile[slot, r].reshape(1, 128)
                w_hi = wv.astype(oh_dst.dtype).astype(wv.dtype)
                oh_dst[:, r * 128:(r + 1) * 128] = jnp.where(
                    hit, w_hi, 0.0).astype(oh_dst.dtype)
                r1 = wv - w_hi                           # exact (Sterbenz)
                w_mid = r1.astype(oh_dst.dtype).astype(wv.dtype)
                oh_dst_lo[:, r * 128:(r + 1) * 128] = jnp.where(
                    hit, w_mid, 0.0).astype(oh_dst.dtype)
                w_lo = r1 - w_mid
                oh_dst_lo2[:, r * 128:(r + 1) * 128] = jnp.where(
                    hit, w_lo, 0.0).astype(oh_dst.dtype)
            else:
                oh_dst[:, r * 128:(r + 1) * 128] = jnp.where(
                    hit, 1.0, 0.0).astype(oh_dst.dtype)
            e_glob = e0 + t * ET + r * 128 + sub         # [128, 1]
            for h in range(HW):
                sh = iv_tile[h:h + 1, :]                 # [1, 128]
                eh = iv_tile[HW + h:HW + h + 1, :]
                m = (e_glob >= sh) & (e_glob < eh)
                oh_rankT[r * 128:(r + 1) * 128, h * 128:(h + 1) * 128] = \
                    jnp.where(m, 1.0, 0.0).astype(oh_rankT.dtype)
        # C[NB, W] += oh_dst @ oh_rankT — the standard A·B MXU form
        # (bf16 in, f32 accumulate: counts / weight-sums are exact)
        c = jax.lax.dot_general(
            oh_dst[:], oh_rankT[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        if weighted:
            c = c + jax.lax.dot_general(
                oh_dst_lo[:], oh_rankT[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            c = c + jax.lax.dot_general(
                oh_dst_lo2[:], oh_rankT[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        c_acc[:] = c_acc[:] + c.astype(c_acc.dtype)
        return ()

    jax.lax.fori_loop(0, num_tiles, body, ())

    # apply the window once per pair: out += C @ win (standard A·B)
    win_dma(p % 2, p).wait()
    out_ref[:] = out_ref[:] + jax.lax.dot(
        c_acc[:], win_tile[p % 2].astype(jnp.float32),
        preferred_element_type=jnp.float32).astype(out_ref.dtype)


def _materialize_kernel(ts_ref, te_ref, blk_ref, wb_ref,
                        ids_ref, iv_ref, out_ref,
                        ids_tile, iv_tile, oh_dst, oh_rankT, c_acc,
                        sem_i, sem_b, *, NB, ET, W, P):
    _count_tiles(ts_ref, te_ref, blk_ref, ids_ref, iv_ref,
                 ids_tile, iv_tile, oh_dst, oh_rankT, c_acc,
                 sem_i, sem_b, NB=NB, ET=ET, W=W, P=P)
    out_ref[:] = c_acc[:].astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("nb", "et", "w", "interpret"))
def _materialize_counts_call(layout: DedupLayout, nb: int, et: int, w: int,
                             interpret: bool):
    P = int(layout.pair_ts.shape[0])
    return pl.pallas_call(
        functools.partial(_materialize_kernel, NB=nb, ET=et, W=w, P=P),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(P,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)] * 2,
            out_specs=pl.BlockSpec(
                (nb, w), lambda p, ts, te, blk, wb: (p, 0),
                memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, et // 128, 128), jnp.int32),
                pltpu.VMEM((2 * (w // 128), 128), jnp.int32),
                pltpu.VMEM((nb, et), jnp.bfloat16),
                pltpu.VMEM((et, w), jnp.bfloat16),
                pltpu.VMEM((nb, w), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA,
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((P * nb, w), jnp.bfloat16),
        interpret=interpret,
    )(layout.pair_ts, layout.pair_te, layout.pair_blk, layout.pair_wb,
      layout.padded_ids, layout.rank_iv)


def materialize_counts(layout: DedupLayout, nb: int = NBD_DEFAULT,
                       et: int = ETD_DEFAULT,
                       interpret: bool = False) -> DedupLayout:
    """Materialize the structural count matrix once (device pass over the
    ids+interval tables — the same machinery every kernel re-ran per
    call) and attach it to the layout. Returns the layout with
    ``counts`` set; no-op if counts exist or bf16 can't hold the counts
    exactly (``max_count`` > 256)."""
    if layout.counts is not None or layout.max_count > 256:
        return layout
    layout.counts = _materialize_counts_call(layout, nb, et, layout.w,
                                             interpret)
    return layout


def _dedup_cached_kernel(ts_ref, te_ref, blk_ref, wb_ref,
                         uniq_ref,              # [Upad, D] HBM
                         c_ref,                 # [P·NB, W] bf16 HBM
                         out_ref,               # [NB, D] VMEM (revisit blk)
                         win_tile, c_tile,
                         sem_w, sem_c,
                         *, NB: int, W: int, D: int, P: int):
    """Counts-cached apply: per pair, DMA ``C[NB, W]`` and the window's
    uniq rows, then ``out += C @ win``. No ids/interval DMAs, no one-hot
    builds, no count matmul — the whole per-call count pass collapses to
    one [NB, W] read (the cache is valid because C is structural)."""
    p = pl.program_id(0)

    def win_dma(slot, q):
        return pltpu.make_async_copy(
            uniq_ref.at[pl.ds(pl.multiple_of(wb_ref[q], 8), W), :],
            win_tile.at[slot], sem_w.at[slot])

    def c_dma(slot, q):
        return pltpu.make_async_copy(
            c_ref.at[pl.ds(pl.multiple_of(q * NB, NB), NB), :],
            c_tile.at[slot], sem_c.at[slot])

    @pl.when(p == 0)
    def _():
        win_dma(0, 0).start()
        c_dma(0, 0).start()

    @pl.when(p + 1 < P)
    def _():
        win_dma((p + 1) % 2, p + 1).start()
        c_dma((p + 1) % 2, p + 1).start()

    @pl.when((p == 0) | (blk_ref[jnp.maximum(p - 1, 0)] != blk_ref[p]))
    def _():
        out_ref[:] = jnp.zeros((NB, D), out_ref.dtype)

    win_dma(p % 2, p).wait()
    c_dma(p % 2, p).wait()
    out_ref[:] = out_ref[:] + jax.lax.dot(
        c_tile[p % 2][:].astype(jnp.float32),
        win_tile[p % 2].astype(jnp.float32),
        preferred_element_type=jnp.float32).astype(out_ref.dtype)


def _dedup_call_cached(uniq, layout, num_segments: int, nb: int, w: int,
                       interpret: bool):
    D = uniq.shape[1]
    n_pad = (num_segments + nb - 1) // nb * nb
    P = int(layout.pair_ts.shape[0])
    out = pl.pallas_call(
        functools.partial(_dedup_cached_kernel, NB=nb, W=w, D=D, P=P),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(P,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)] * 2,
            out_specs=pl.BlockSpec(
                (nb, D), lambda p, ts, te, blk, wb: (blk[p], 0),
                memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, w, D), uniq.dtype),
                pltpu.VMEM((2, nb, w), jnp.bfloat16),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((n_pad, D), uniq.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * P * nb * w * D,
            bytes_accessed=(P * nb * w * 2
                            + int(layout.uv.shape[0]) * D * 4 * 2
                            + n_pad * D * 4),
            transcendentals=0),
    )(layout.pair_ts, layout.pair_te, layout.pair_blk, layout.pair_wb,
      uniq, layout.counts)
    return out[:num_segments]


@functools.partial(jax.jit,
                   static_argnames=("num_segments", "nb", "et", "w",
                                    "interpret"))
def _blocked_spmm_dedup(feature, layout: DedupLayout, num_segments: int,
                        nb: int, et: int, w: int, interpret: bool,
                        edge_w=None):
    uniq = _take_ib(feature, layout.uv)
    return _dedup_call(uniq, layout, num_segments, nb, et, w, interpret,
                       edge_w)


def _dedup_call(uniq, layout, num_segments: int, nb: int, et: int, w: int,
                interpret: bool, edge_w=None):
    """Kernel dispatch given the already-gathered unique-src table
    (``uniq = feature[layout.uv]``) — the host-streamed path gathers on
    the host instead (``ops/pallas/streaming.py``)."""
    if edge_w is None and layout.counts is not None:
        return _dedup_call_cached(uniq, layout, num_segments, nb, w,
                                  interpret)
    D = uniq.shape[1]
    n_pad = (num_segments + nb - 1) // nb * nb
    P = int(layout.pair_ts.shape[0])

    import os as _os
    oh_dt = (jnp.float32 if _os.environ.get("PGL_TPU_DEDUP_F32") == "1"
             else jnp.bfloat16)
    weighted = edge_w is not None
    in_specs = [pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)] * 3
    operands = [uniq, layout.padded_ids, layout.rank_iv]
    scratch = [
        pltpu.VMEM((2, w, D), uniq.dtype),
        pltpu.VMEM((2, et // 128, 128), jnp.int32),
        pltpu.VMEM((2 * (w // 128), 128), jnp.int32),   # iv_tile
        pltpu.VMEM((nb, et), oh_dt),
        pltpu.VMEM((et, w), oh_dt),
        pltpu.VMEM((nb, w), jnp.float32),
        pltpu.SemaphoreType.DMA((2,)),
        pltpu.SemaphoreType.DMA((2,)),
        pltpu.SemaphoreType.DMA,
    ]
    if weighted:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM))
        operands.append(edge_w.reshape(-1, 128))
        scratch += [pltpu.VMEM((2, et // 128, 128), uniq.dtype),
                    pltpu.SemaphoreType.DMA((2,)),
                    pltpu.VMEM((nb, et), oh_dt),
                    pltpu.VMEM((nb, et), oh_dt)]

        def kernel(ts, te, blk, wb, uniq_r, ids_r, iv_r, w_r,
                   out_r, win, ids_t, iv_t, ohd, ohr, cacc,
                   sw, si, sb, w_t, se, ohd_lo, ohd_lo2):
            _dedup_kernel(ts, te, blk, wb, uniq_r, ids_r, iv_r,
                          out_r, win, ids_t, iv_t, ohd, ohr, cacc,
                          sw, si, sb,
                          NB=nb, ET=et, W=w, D=D, P=P, weighted=True,
                          w_ref=w_r, w_tile=w_t, sem_e=se,
                          oh_dst_lo=ohd_lo, oh_dst_lo2=ohd_lo2)
    else:
        kernel = functools.partial(_dedup_kernel, NB=nb, ET=et, W=w, D=D,
                                   P=P, weighted=False)

    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(P,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec(
                (nb, D), lambda p, ts, te, blk, wb: (blk[p], 0),
                memory_space=pltpu.VMEM),
            scratch_shapes=scratch,
        ),
        out_shape=jax.ShapeDtypeStruct((n_pad, D), uniq.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=(2 * int(layout.padded_v.shape[0]) * nb * w
                   * (3 if weighted else 1) + 2 * P * nb * w * D),
            bytes_accessed=(int(layout.uv.shape[0]) * D * 4 * 2
                            + n_pad * D * 4),
            transcendentals=0),
    )(layout.pair_ts, layout.pair_te, layout.pair_blk, layout.pair_wb,
      *operands)
    return out[:num_segments]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def spmm_dedup(feature, csc_d: DedupLayout, csr_d: DedupLayout,
               nb: int = NBD_DEFAULT, et: int = ETD_DEFAULT,
               w: int = W_DEFAULT, interpret: bool = False):
    """out[d] = Σ_{edges s→d} feature[s] via the two-phase dedup kernel.

    ``csc_d`` drives the forward (dst blocks); ``csr_d`` the transposed
    backward (src blocks)."""
    return _blocked_spmm_dedup(feature, csc_d, csc_d.num_segments,
                               nb, et, w, interpret)


def _spmm_dedup_fwd(feature, csc_d, csr_d, nb, et, w, interpret):
    return spmm_dedup(feature, csc_d, csr_d, nb, et, w, interpret), csr_d


def _spmm_dedup_bwd(nb, et, w, interpret, csr_d, g):
    dx = _blocked_spmm_dedup(g, csr_d, csr_d.num_segments, nb, et, w,
                             interpret)
    return dx, None, None


spmm_dedup.defvjp(_spmm_dedup_fwd, _spmm_dedup_bwd)


def _pad_edge_w(wv, Ep):
    return jnp.zeros(Ep, wv.dtype).at[:wv.shape[0]].set(wv)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def spmm_dedup_weighted(feature, w_csc, w_csr, csc_d: DedupLayout,
                        csr_d: DedupLayout, nb: int = NBD_DEFAULT,
                        et: int = ETD_DEFAULT, w: int = W_DEFAULT,
                        interpret: bool = False):
    """Edge-weighted dedup SpMM: out[d] = Σ_e w_e · feature[src_e].

    ``w_csc``/``w_csr`` are per-edge scalar weights permuted into the
    layouts' dedup edge orders and zero-padded to ``padded_v`` length
    (``w_csr`` is auxiliary, used only by the transposed backward)."""
    return _blocked_spmm_dedup(feature, csc_d, csc_d.num_segments,
                               nb, et, w, interpret, edge_w=w_csc)


def _spmm_dw_fwd(feature, w_csc, w_csr, csc_d, csr_d, nb, et, w, interpret):
    out = _blocked_spmm_dedup(feature, csc_d, csc_d.num_segments,
                              nb, et, w, interpret, edge_w=w_csc)
    return out, (feature, w_csr, csc_d, csr_d)


def _spmm_dw_bwd(nb, et, w, interpret, res, g):
    feature, w_csr, csc_d, csr_d = res
    dx = _blocked_spmm_dedup(g, csr_d, csr_d.num_segments, nb, et, w,
                             interpret, edge_w=w_csr)
    # dw (dedup-CSC order): <g[dst_e], x[src_e]> per edge
    g_e = jnp.take(g, csc_d.padded_ids.reshape(-1), axis=0,
                   mode="fill", fill_value=0)
    x_e = _take_ib(feature, csc_d.padded_v)
    dw = jnp.sum(g_e * x_e, axis=1)
    return dx, dw, jnp.zeros_like(w_csr), None, None


spmm_dedup_weighted.defvjp(_spmm_dw_fwd, _spmm_dw_bwd)
