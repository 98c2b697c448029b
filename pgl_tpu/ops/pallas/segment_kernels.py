"""Pallas TPU SpMM: gather + sorted-segment-sum — the kernel behind
``send_u_recv``/``recv`` (replacing the reference's CUDA
``paddle.geometric`` scatter kernels, ``pgl/math.py:36``, ``pgl/graph.py:860``).

Design (TPU-first):
  * The Graph stores edges dst-sorted (CSC), so the edges of output row
    block ``[i*NB, (i+1)*NB)`` are contiguous. The kernel grid iterates row
    blocks; each step streams the covering edge tiles HBM→VMEM with
    double-buffered DMA and reduces ``ET`` messages onto ``NB`` rows as a
    **one-hot matmul on the MXU**:
    ``acc += onehot(ids - row_base)[NB, ET] @ msgs[ET, D]`` — the scatter
    XLA would serialize becomes dense systolic work.
  * Tiles are ``ET``-aligned *supersets* of the block's edge range: because
    segment ids are globally sorted, edges outside the range simply fail
    the one-hot compare — no per-block padding, only a trailing sentinel
    pad to a tile multiple. Every DMA offset/shape is tile-aligned.
  * The backward of the SpMM is the transposed SpMM; ``spmm`` takes the
    CSR (src-sorted) layout too and runs the same kernel over it, so no XLA
    scatter appears in either direction.
"""

from __future__ import annotations

import functools
import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["BlockedLayout", "build_blocked_layout", "spmm",
           "spmm_weighted",
           "sorted_segment_sum", "available", "NB_DEFAULT", "ET_DEFAULT"]

NB_DEFAULT = 256      # output rows per grid step
ET_DEFAULT = 1024     # edges per DMA tile (1-D int32 slices tile at 1024)



def _take_ib(x, idx):
    """Row gather with no bounds handling — indices are layout-built and
    in-bounds by construction (clip/fill modes add a lane pass per call)."""
    return jnp.asarray(x).at[idx].get(mode="promise_in_bounds")

@jax.tree_util.register_pytree_node_class
class BlockedLayout:
    """Device-resident tile-aligned CSC/CSR layout for the SpMM kernel.

    padded_v:     [Ep] int32 gather indices (src for CSC), 0 at tail pad
    padded_ids:   [Ep/128, 128] int32 sorted segment ids (row-major),
                  sentinel at tail pad
    tile_starts:  [G] int32 ET-aligned first edge offset per row block
    tile_ends:    [G] int32 (exclusive, unaligned) last edge per row block
    num_segments: static node count (pytree aux data, stays a python int
                  under jit)
    chunks:       optional static tuple of (block_lo, block_hi) row-block
                  ranges — when set, the SpMM runs chunk-by-chunk so only
                  ``chunk_cap`` gathered edge rows exist at a time (the
                  [E, D] message buffer never exceeds the budget)
    chunk_cap:    static per-chunk edge capacity (ET-aligned)
    """

    def __init__(self, padded_v, padded_ids, tile_starts, tile_ends,
                 num_segments: int, num_edges: int = 0,
                 chunks=None, chunk_cap: int = 0):
        self.padded_v = padded_v
        self.padded_ids = padded_ids
        self.tile_starts = tile_starts
        self.tile_ends = tile_ends
        self.num_segments = num_segments
        self.num_edges = num_edges
        self.chunks = chunks
        self.chunk_cap = chunk_cap

    def tree_flatten(self):
        return ((self.padded_v, self.padded_ids, self.tile_starts,
                 self.tile_ends), (self.num_segments, self.num_edges,
                                   self.chunks, self.chunk_cap))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)


def build_blocked_layout(indptr, sorted_v, num_segments: int,
                         nb: int = NB_DEFAULT,
                         et: int = ET_DEFAULT,
                         chunk_edges: int = 0) -> BlockedLayout:
    """Host-side (numpy) construction; call once at Graph.tensor() time.

    ``chunk_edges`` > 0 plans row-block chunks whose edge spans fit that
    budget (grown to the largest single block's span if a hub row block
    exceeds it); the SpMM then materializes at most ~``chunk_edges``
    gathered message rows at a time instead of all ``E``.
    """
    indptr = np.asarray(indptr, dtype=np.int64)
    sorted_v = np.asarray(sorted_v, dtype=np.int64)
    E = len(sorted_v)
    n_pad = (num_segments + nb - 1) // nb * nb
    G = n_pad // nb
    lo_idx = np.minimum(np.arange(G) * nb, num_segments)
    hi_idx = np.minimum((np.arange(G) + 1) * nb, num_segments)
    tile_starts = (indptr[lo_idx] // et) * et
    tile_ends = indptr[hi_idx]
    Ep = max(((E + et - 1) // et) * et + et, et)

    chunks, cap = None, 0
    if chunk_edges and G:
        cap = (int(chunk_edges) + et - 1) // et * et

        def tight(span):
            # per-window tight capacity: total gathered rows stay ≈ E
            # instead of num_windows × budget
            return max((int(span) + et - 1) // et * et, et)

        # plan (block_lo, block_hi, window_sizes): ``window_sizes`` are the
        # static per-window edge capacities. Range chunks have one tight
        # window; a hub block whose span exceeds the budget is processed
        # in several accumulating passes (full-budget windows plus a tight
        # tail) instead of growing the budget (which would degenerate the
        # whole plan to ~E).
        plan, b0 = [], 0
        for b in range(G):
            span_b = int(tile_ends[b] - tile_starts[b])
            if span_b > cap:
                if b > b0:
                    plan.append((b0, b,
                                 (tight(tile_ends[b - 1]
                                        - tile_starts[b0]),)))
                pieces = -(-span_b // cap)
                tail = span_b - (pieces - 1) * cap
                plan.append((b, b + 1,
                             (cap,) * (pieces - 1) + (tight(tail),)))
                b0 = b + 1
            elif int(tile_ends[b] - tile_starts[b0]) > cap and b > b0:
                plan.append((b0, b,
                             (tight(tile_ends[b - 1] - tile_starts[b0]),)))
                b0 = b
        if b0 < G:
            plan.append((b0, G, (tight(tile_ends[G - 1]
                                       - tile_starts[b0]),)))
        chunks = tuple(plan)
        # every window [start + Σ previous sizes, + size) must stay in
        # bounds
        Ep = max(Ep, max(int(tile_starts[lo]) + sum(sizes)
                         for lo, _, sizes in chunks))

    padded_v = np.zeros(Ep, dtype=np.int32)
    padded_v[:E] = sorted_v
    padded_ids = np.full(Ep, n_pad, dtype=np.int32)  # sentinel
    padded_ids[:E] = np.repeat(np.arange(num_segments, dtype=np.int32),
                               np.diff(indptr))
    padded_ids = padded_ids.reshape(-1, 128)
    return BlockedLayout(jnp.asarray(padded_v), jnp.asarray(padded_ids),
                         jnp.asarray(tile_starts.astype(np.int32)),
                         jnp.asarray(tile_ends.astype(np.int32)),
                         int(num_segments), int(E), chunks, cap)


def _kernel(tile_starts_ref, tile_ends_ref,   # [G] SMEM scalar prefetch
            msgs_ref,                         # [Ep, D] HBM
            ids_ref,                          # [Ep/128, 128] HBM int32
            out_ref,                          # [NB, D] VMEM
            msg_tile, ids_tile, onehot_tile, sem_m, sem_i,
            *, NB: int, ET: int, D: int, RB0: int = 0):
    i = pl.program_id(0)
    e0 = tile_starts_ref[i]          # ET-aligned
    e1 = tile_ends_ref[i]
    num_tiles = (e1 - e0 + ET - 1) // ET
    # RB0: first global row of this pallas_call (nonzero for chunked runs)
    row_base = RB0 + i * NB
    ER = ET // 128                   # id rows per tile

    def tile_dma(slot, t):
        start = pl.multiple_of(e0 + t * ET, ET)
        return (
            pltpu.make_async_copy(
                msgs_ref.at[pl.ds(start, ET), :],
                msg_tile.at[slot], sem_m.at[slot]),
            pltpu.make_async_copy(
                ids_ref.at[pl.ds(start // 128, ER), :],
                ids_tile.at[slot], sem_i.at[slot]),
        )

    @pl.when(num_tiles > 0)
    def _():
        for d in tile_dma(0, 0):
            d.start()

    out_ref[:] = jnp.zeros((NB, D), out_ref.dtype)

    def body(t, _):
        slot = t % 2
        nxt = (t + 1) % 2

        @pl.when(t + 1 < num_tiles)
        def _():
            for d in tile_dma(nxt, t + 1):
                d.start()

        for d in tile_dma(slot, t):
            d.wait()

        # ids sorted globally: anything outside [row_base, row_base+NB)
        # fails the compare, which masks both the aligned-superset head and
        # the next block's edges in the tail — no explicit masking needed.
        # Build the full [NB, ET] one-hot in VMEM, then a single wide dot
        # (K=ET) so the MXU pipeline stays filled.
        rows = jax.lax.broadcasted_iota(jnp.int32, (NB, 128), 0)
        for r in range(ER):          # 128-edge sub-tiles, unrolled
            local = ids_tile[slot, r].reshape(1, 128) - row_base
            onehot_tile[:, r * 128:(r + 1) * 128] = jnp.where(
                rows == local, 1.0, 0.0).astype(onehot_tile.dtype)
        out_ref[:] = out_ref[:] + jax.lax.dot(
            onehot_tile[:], msg_tile[slot],
            preferred_element_type=jnp.float32).astype(out_ref.dtype)
        return ()

    jax.lax.fori_loop(0, num_tiles, body, ())


def _fused_kernel(tile_starts_ref, tile_ends_ref,  # [G] SMEM scalar prefetch
                  feature_ref,                     # [N, D] HBM
                  v_ref,                           # [Ep] HBM int32 (src ids)
                  ids_ref,                         # [Ep/128, 128] HBM int32
                  out_ref,                         # [NB, D] VMEM
                  msg_tile, ids_tile, v_tile, onehot_tile,
                  sem_ring, sem_i, sem_v,
                  *, NB: int, ET: int, D: int, K: int):
    """Fused-gather variant: instead of consuming a pre-gathered ``msgs``
    operand, each edge tile's source rows are gathered HBM→VMEM inside the
    kernel by a ring of ``K`` outstanding per-row DMAs (measured ≥ XLA's
    gather throughput — see ``experiments/fused_gather/``), so the ``[E,D]``
    message buffer never exists in HBM. Src ids are staged per-tile into
    SMEM (SMEM caps ids at ~256k, hence per-tile staging, not prefetch)."""
    i = pl.program_id(0)
    e0 = tile_starts_ref[i]
    e1 = tile_ends_ref[i]
    num_tiles = (e1 - e0 + ET - 1) // ET
    row_base = i * NB
    ER = ET // 128

    out_ref[:] = jnp.zeros((NB, D), out_ref.dtype)

    def body(t, _):
        start = pl.multiple_of(e0 + t * ET, ET)
        cp_v = pltpu.make_async_copy(v_ref.at[pl.ds(start, ET)],
                                     v_tile, sem_v)
        cp_i = pltpu.make_async_copy(ids_ref.at[pl.ds(start // 128, ER), :],
                                     ids_tile, sem_i)
        cp_v.start()
        cp_i.start()
        cp_v.wait()

        # K-deep ring of per-row gathers HBM -> msg_tile
        def row_cp(g):
            return pltpu.make_async_copy(
                feature_ref.at[pl.ds(v_tile[g], 1), :],
                msg_tile.at[pl.ds(g, 1), :], sem_ring.at[g % K])

        jax.lax.fori_loop(0, K, lambda g, c: (row_cp(g).start(), c)[1], 0)

        def ring(g, c):
            row_cp(g - K).wait()
            row_cp(g).start()
            return c

        jax.lax.fori_loop(K, ET, ring, 0)
        jax.lax.fori_loop(ET - K, ET,
                          lambda g, c: (row_cp(g).wait(), c)[1], 0)
        cp_i.wait()

        rows = jax.lax.broadcasted_iota(jnp.int32, (NB, 128), 0)
        for r in range(ER):
            local = ids_tile[r].reshape(1, 128) - row_base
            onehot_tile[:, r * 128:(r + 1) * 128] = jnp.where(
                rows == local, 1.0, 0.0).astype(onehot_tile.dtype)
        out_ref[:] = out_ref[:] + jax.lax.dot(
            onehot_tile[:], msg_tile[:],
            preferred_element_type=jnp.float32).astype(out_ref.dtype)
        return ()

    jax.lax.fori_loop(0, num_tiles, body, ())


@functools.partial(jax.jit,
                   static_argnames=("num_segments", "nb", "et", "interpret"))
def _blocked_spmm_fused(feature, padded_v, padded_ids, tile_starts,
                        tile_ends, num_segments: int, nb: int, et: int,
                        interpret: bool):
    """Fused-gather SpMM forward (opt-in: ``PGL_TPU_FUSED_GATHER=1``)."""
    D = feature.shape[1]
    K = 32
    n_pad = (num_segments + nb - 1) // nb * nb
    G = n_pad // nb
    if tile_starts.shape[0] != G:
        raise ValueError(
            f"layout was built for a different row-block size: "
            f"{tile_starts.shape[0]} blocks vs grid {G} — pass the same "
            f"nb/et to build_blocked_layout and the kernel")
    out = pl.pallas_call(
        functools.partial(_fused_kernel, NB=nb, ET=et, D=D, K=K),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(G,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
                pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
                pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            ],
            out_specs=pl.BlockSpec(
                (nb, D), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((et, D), feature.dtype),
                pltpu.VMEM((et // 128, 128), jnp.int32),
                pltpu.SMEM((et,), jnp.int32),
                pltpu.VMEM((nb, et), feature.dtype),
                pltpu.SemaphoreType.DMA((K,)),
                pltpu.SemaphoreType.DMA,
                pltpu.SemaphoreType.DMA,
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((n_pad, D), feature.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * int(padded_v.shape[0]) * nb * D,
            bytes_accessed=int(padded_v.shape[0]) * D * 4 + n_pad * D * 4,
            transcendentals=0),
    )(tile_starts, tile_ends, feature, padded_v, padded_ids)
    return out[:num_segments]


def _fused_gather_enabled() -> bool:
    """Opt-in (``PGL_TPU_FUSED_GATHER=1``). The fused kernel is
    bit-identical to the default path and wins on small graphs (no
    separate gather dispatch), but the K-deep per-row DMA ring cannot hide
    HBM latency at large E — its in-flight bytes (K×row) sit far below the
    bandwidth-delay product, and per-descriptor scalar issue (~20 ns/row)
    bounds any ring — so XLA's hardware gather path stays the default.
    Measurements in ``experiments/fused_gather/``."""
    import os
    return os.environ.get("PGL_TPU_FUSED_GATHER", "0") == "1"


def _spmm_pallas(msgs, padded_ids, tile_starts, tile_ends, n_rows: int,
                 nb: int, et: int, interpret: bool, rb0: int = 0):
    """One pallas_call over ``tile_starts.shape[0]`` row blocks; edge
    offsets are relative to ``msgs``/``padded_ids``, and ``rb0`` is the
    first global row id of the call (ids stay global). [n_rows, D]."""
    D = msgs.shape[1]
    G = tile_starts.shape[0]
    return pl.pallas_call(
        functools.partial(_kernel, NB=nb, ET=et, D=D, RB0=rb0),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(G,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
                pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            ],
            out_specs=pl.BlockSpec(
                (nb, D), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, et, D), msgs.dtype),
                pltpu.VMEM((2, et // 128, 128), jnp.int32),
                pltpu.VMEM((nb, et), msgs.dtype),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((n_rows, D), msgs.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * int(msgs.shape[0]) * nb * D,
            bytes_accessed=int(msgs.shape[0]) * D * 4 + n_rows * D * 4,
            transcendentals=0),
    )(tile_starts, tile_ends, msgs, padded_ids)


def _weighted_msgs(msgs, edge_w, D, op: str = "mul"):
    """Combine gathered source rows with per-edge features before the
    reduce — the general ``send_ue_recv`` message op (reference
    ``pgl/graph.py:930``: fused for ANY tensor edge feature).

    edge_w shapes: [Ep] scalar; [Ep, H] per-head / vector with H | D
    (H == D is full elementwise; dh = D // H broadcasts within heads).
    """
    if edge_w.ndim == 2:
        H = edge_w.shape[1]
        dh = D // H
        if op == "add":
            return (msgs.reshape(-1, H, dh)
                    + edge_w[:, :, None]).reshape(-1, D)
        return (msgs.reshape(-1, H, dh) * edge_w[:, :, None]).reshape(-1, D)
    if op == "add":
        return msgs + edge_w[:, None]
    return msgs * edge_w[:, None]


@functools.partial(jax.jit,
                   static_argnames=("num_segments", "nb", "et", "interpret",
                                    "chunks", "chunk_cap", "msg_op"))
def _blocked_spmm(feature, padded_v, padded_ids, tile_starts, tile_ends,
                  num_segments: int, nb: int, et: int, interpret: bool,
                  edge_w=None, chunks=None, chunk_cap: int = 0,
                  msg_op: str = "mul"):
    D = feature.shape[1]
    n_pad = (num_segments + nb - 1) // nb * nb
    G = n_pad // nb
    if tile_starts.shape[0] != G:
        raise ValueError(
            f"layout was built for a different row-block size: "
            f"{tile_starts.shape[0]} blocks vs grid {G} — pass the same "
            f"nb/et to build_blocked_layout and the kernel")

    if chunks is None or len(chunks) <= 1:
        msgs = _take_ib(feature, padded_v)
        if edge_w is not None:
            msgs = _weighted_msgs(msgs, edge_w, D, msg_op)
        out = _spmm_pallas(msgs, padded_ids, tile_starts, tile_ends, n_pad,
                           nb, et, interpret)
        return out[:num_segments]

    # chunked: only ~budget gathered rows live at a time (bounded HBM) —
    # each chunk's row blocks cover disjoint output rows, so the results
    # simply concatenate; a hub block split into windows sums its passes.
    # Edges outside a block's [ts, te) span never enter its accumulation,
    # so window overlap is harmless. Window sizes are tight (static per
    # chunk), so total gathered rows ≈ E, same as the unchunked path.
    def window(off, size):
        v_c = jax.lax.dynamic_slice(padded_v, (off,), (size,))
        ids_c = jax.lax.dynamic_slice(
            padded_ids, (off // 128, 0), (size // 128, 128))
        msgs = _take_ib(feature, v_c)
        if edge_w is not None:
            w_c = jax.lax.dynamic_slice(
                edge_w, (off,) + (0,) * (edge_w.ndim - 1),
                (size,) + edge_w.shape[1:])
            msgs = _weighted_msgs(msgs, w_c, D, msg_op)
        return msgs, ids_c

    outs = []
    for b0, b1, sizes in chunks:
        base = tile_starts[b0]                      # ET-aligned
        acc = None
        start = 0
        for size in sizes:
            off = base + start
            start += size
            msgs, ids_c = window(off, size)
            ts = jnp.maximum(tile_starts[b0:b1] - off, 0)
            te = jnp.clip(tile_ends[b0:b1] - off, 0, size)
            out_c = _spmm_pallas(msgs, ids_c, ts, te, (b1 - b0) * nb,
                                 nb, et, interpret, rb0=b0 * nb)
            acc = out_c if acc is None else acc + out_c
        outs.append(acc)
    out = jnp.concatenate(outs, axis=0)
    return out[:num_segments]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def spmm(feature, csc: BlockedLayout, csr: BlockedLayout,
         nb: int = NB_DEFAULT, et: int = ET_DEFAULT,
         interpret: bool = False):
    """out[d] = Σ_{edges s→d} feature[s], via the one-hot-MXU kernel.

    ``csc`` aggregates by dst (forward); ``csr`` is the same graph grouped
    by src, used to run the *transposed* SpMM in the backward pass.
    """
    return _spmm_one(feature, csc, nb, et, interpret)


def _spmm_one(feature, layout, nb, et, interpret):
    if _fused_gather_enabled():
        return _blocked_spmm_fused(feature, layout.padded_v,
                                   layout.padded_ids, layout.tile_starts,
                                   layout.tile_ends, layout.num_segments,
                                   nb, et, interpret)
    return _blocked_spmm(feature, layout.padded_v, layout.padded_ids,
                         layout.tile_starts, layout.tile_ends,
                         layout.num_segments, nb, et, interpret,
                         chunks=layout.chunks, chunk_cap=layout.chunk_cap)


def _spmm_fwd(feature, csc, csr, nb, et, interpret):
    return _spmm_one(feature, csc, nb, et, interpret), csr


def _spmm_bwd(nb, et, interpret, csr, g):
    # d/dfeature: transposed SpMM — aggregate cotangents over out-edges.
    return _spmm_one(g, csr, nb, et, interpret), None, None


spmm.defvjp(_spmm_fwd, _spmm_bwd)


def sorted_segment_sum(msgs, seg_ids, indptr, num_segments: int,
                       nb: int = NB_DEFAULT, et: int = ET_DEFAULT,
                       interpret: bool = False):
    """Standalone sorted segment sum (messages already materialized).

    Builds the layout on the fly from *concrete* inputs — intended for
    tests and one-off use; hot paths pre-build a :class:`BlockedLayout`
    and call :func:`spmm`. Backward is a gather.
    """
    layout = build_blocked_layout(np.asarray(indptr),
                                  np.arange(len(np.asarray(seg_ids))),
                                  num_segments, nb, et)
    return _segsum_vjp(msgs, seg_ids, layout, num_segments, nb, et,
                       interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _segsum_vjp(msgs, seg_ids, layout, num_segments, nb, et, interpret):
    return _blocked_spmm(msgs, layout.padded_v, layout.padded_ids,
                         layout.tile_starts, layout.tile_ends, num_segments,
                         nb, et, interpret)


def _segsum_fwd(msgs, seg_ids, layout, num_segments, nb, et, interpret):
    out = _blocked_spmm(msgs, layout.padded_v, layout.padded_ids,
                        layout.tile_starts, layout.tile_ends, num_segments,
                        nb, et, interpret)
    return out, seg_ids


def _segsum_bwd(num_segments, nb, et, interpret, seg_ids, g):
    return jnp.take(g, seg_ids, axis=0, mode="clip"), None, None


_segsum_vjp.defvjp(_segsum_fwd, _segsum_bwd)


def available() -> bool:
    return jax.default_backend() == "tpu"


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def spmm_weighted(feature, w_csc, w_csr, csc: BlockedLayout,
                  csr: BlockedLayout, nb: int = NB_DEFAULT,
                  et: int = ET_DEFAULT, interpret: bool = False,
                  msg_op: str = "mul"):
    """Edge-featured SpMM: out[d] = Σ_e (feature[src_e] OP w_e).

    Covers the reference's fused ``send_ue_recv`` for ANY tensor edge
    feature (``pgl/graph.py:930``): w may be [Ep] scalar or [Ep, H] with
    H | D (H == D elementwise vector features; smaller H broadcasts per
    head). ``msg_op`` is "mul" or "add".

    ``w_csc``/``w_csr`` are the per-edge features permuted into CSC/CSR
    edge order and zero-padded to the layouts' lengths (``w_csr`` is
    auxiliary — used only to run the transposed SpMM in the backward
    pass; its cotangent is zero, so route weight gradients through
    ``w_csc`` only).
    """
    return _blocked_spmm(feature, csc.padded_v, csc.padded_ids,
                         csc.tile_starts, csc.tile_ends, csc.num_segments,
                         nb, et, interpret, edge_w=w_csc,
                         chunks=csc.chunks, chunk_cap=csc.chunk_cap,
                         msg_op=msg_op)


def _spmm_w_fwd(feature, w_csc, w_csr, csc, csr, nb, et, interpret,
                msg_op):
    out = _blocked_spmm(feature, csc.padded_v, csc.padded_ids,
                        csc.tile_starts, csc.tile_ends, csc.num_segments,
                        nb, et, interpret, edge_w=w_csc,
                        chunks=csc.chunks, chunk_cap=csc.chunk_cap,
                        msg_op=msg_op)
    return out, (feature, w_csc, w_csr, csc, csr)


def _spmm_w_bwd(nb, et, interpret, msg_op, res, g):
    feature, w_csc, w_csr, csc_l, csr_l = res
    if msg_op == "add":
        # out = Σ (x[src] + w): dx is the UNWEIGHTED transposed SpMM,
        # dw_e = g[dst_e] reduced onto w's head width
        dx = _blocked_spmm(g, csr_l.padded_v, csr_l.padded_ids,
                           csr_l.tile_starts, csr_l.tile_ends,
                           csr_l.num_segments, nb, et, interpret,
                           chunks=csr_l.chunks, chunk_cap=csr_l.chunk_cap)
        g_e = jnp.take(g, csc_l.padded_ids.reshape(-1), axis=0,
                       mode="fill", fill_value=0)
        if w_csc.ndim == 2:
            H = w_csc.shape[1]
            dw_csc = g_e.reshape(g_e.shape[0], H, -1).sum(-1)
        else:
            dw_csc = g_e.sum(-1)
        return dx, dw_csc, jnp.zeros_like(w_csr), None, None
    # mul: dx via the transposed weighted SpMM over the CSR layout
    dx = _blocked_spmm(g, csr_l.padded_v, csr_l.padded_ids,
                       csr_l.tile_starts, csr_l.tile_ends,
                       csr_l.num_segments, nb, et, interpret, edge_w=w_csr,
                       chunks=csr_l.chunks, chunk_cap=csr_l.chunk_cap,
                       msg_op=msg_op)
    # dw (CSC order): <g[dst_e], x[src_e]> per edge (per-head reduced)
    g_e = jnp.take(g, csc_l.padded_ids.reshape(-1), axis=0,
                   mode="fill", fill_value=0)
    x_e = _take_ib(feature, csc_l.padded_v)
    prod = g_e * x_e
    if w_csc.ndim == 2:
        H = w_csc.shape[1]
        dw_csc = prod.reshape(prod.shape[0], H, -1).sum(-1)
    else:
        dw_csc = prod.sum(-1)
    return dx, dw_csc, jnp.zeros_like(w_csr), None, None


spmm_weighted.defvjp(_spmm_w_fwd, _spmm_w_bwd)
