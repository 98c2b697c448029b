"""Pallas TPU kernel: sorted-segment sum — the SpMM reduction behind
``send_u_recv``/``recv`` (replaces the reference's CUDA
``paddle.geometric.segment_sum`` scatter kernels, ``pgl/math.py:36``).

Design (TPU-first):
  * The Graph stores edges dst-sorted (CSC), so all messages destined for an
    output row block ``[i*NB, (i+1)*NB)`` are **contiguous** in the message
    array: block ``i`` owns edge range ``indptr[i*NB] : indptr[(i+1)*NB]``.
  * Grid iterates output row blocks. Each step streams that block's edge
    tiles HBM→VMEM with a double-buffered DMA pipeline and reduces a tile of
    ``ET`` messages onto ``NB`` rows as a **one-hot matmul on the MXU**:
    ``acc += onehot(local_dst)[NB, ET] @ msgs[ET, D]`` — turning the scatter
    XLA would serialize into dense systolic work.
  * Per-row-block edge offsets ride in as scalar-prefetch (SMEM), messages
    and segment ids stay in HBM (``pl.ANY``) and are DMA'd manually.

The backward of segment-sum is a gather (``g[seg_ids]``), provided via
``jax.custom_vjp`` so the op is fully differentiable.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["sorted_segment_sum", "available"]


def _kernel(block_starts_ref,    # [G+1] SMEM scalar prefetch
            msgs_ref,            # [E_pad, D] HBM
            ids_ref,             # [E_pad, 1] HBM (int32, dst-sorted)
            out_ref,             # [NB, D] VMEM (this block's output rows)
            msg_tile, ids_tile, sem_m, sem_i,   # scratch
            *, NB: int, ET: int, D: int, N_BUF: int):
    i = pl.program_id(0)
    e0 = block_starts_ref[i]
    e1 = block_starts_ref[i + 1]
    num_tiles = (e1 - e0 + ET - 1) // ET

    row_base = i * NB

    def tile_dma(slot, t):
        start = e0 + t * ET
        return (
            pltpu.make_async_copy(
                msgs_ref.at[pl.ds(start, ET), :],
                msg_tile.at[slot], sem_m.at[slot]),
            pltpu.make_async_copy(
                ids_ref.at[pl.ds(start, ET), :],
                ids_tile.at[slot], sem_i.at[slot]),
        )

    @pl.when(num_tiles > 0)
    def _():
        for d in tile_dma(0, 0):
            d.start()

    out_ref[:] = jnp.zeros((NB, D), out_ref.dtype)

    def body(t, acc):
        slot = t % N_BUF
        nxt = (t + 1) % N_BUF

        @pl.when(t + 1 < num_tiles)
        def _():
            for d in tile_dma(nxt, t + 1):
                d.start()

        for d in tile_dma(slot, t):
            d.wait()

        ids = ids_tile[slot]                      # [ET, 1] int32
        local = ids.reshape(1, ET) - row_base     # [1, ET]
        # mask tail beyond e1 (the DMA may overread into the next block's
        # edges; their ids fall outside [0, NB) only if the next block is
        # different — same-value ids from the next block's range can't
        # happen because ids are sorted and >= (i+1)*NB there)
        e_idx = e0 + t * ET + jax.lax.broadcasted_iota(
            jnp.int32, (1, ET), 1)
        valid = (e_idx < e1)
        rows = jax.lax.broadcasted_iota(jnp.int32, (NB, ET), 0)
        onehot = jnp.where(
            (rows == local) & valid, 1.0, 0.0).astype(msg_tile.dtype)
        acc = acc + jax.lax.dot(
            onehot, msg_tile[slot], preferred_element_type=jnp.float32)
        return acc

    acc = jax.lax.fori_loop(
        0, num_tiles, body,
        jnp.zeros((NB, D), jnp.float32))
    out_ref[:] = acc.astype(out_ref.dtype)


def _round_up(x, m):
    return (x + m - 1) // m * m


@functools.partial(jax.jit, static_argnames=("num_segments", "nb", "et",
                                             "interpret"))
def _sorted_segment_sum_impl(msgs, seg_ids, indptr, num_segments: int,
                             nb: int = 256, et: int = 512,
                             interpret: bool = False):
    E, D = msgs.shape
    NB, ET = nb, et
    N_pad = _round_up(max(num_segments, NB), NB)
    G = N_pad // NB
    # overread slack: tiles may read up to ET rows past e1
    E_pad = _round_up(E, ET) + ET
    msgs_p = jnp.zeros((E_pad, D), msgs.dtype).at[:E].set(msgs)
    # padding ids point at an out-of-range row so they never hit a one-hot
    ids_p = jnp.full((E_pad, 1), jnp.int32(N_pad), jnp.int32)
    ids_p = ids_p.at[:E, 0].set(seg_ids.astype(jnp.int32))
    # per-block edge offsets from indptr (indptr[N] == E)
    indptr = indptr.astype(jnp.int32)
    idx = jnp.minimum(
        jnp.arange(G + 1, dtype=jnp.int32) * NB, num_segments)
    block_starts = indptr[idx]

    out = pl.pallas_call(
        functools.partial(_kernel, NB=NB, ET=ET, D=D, N_BUF=2),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(G,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec(memory_space=pltpu.ANY),
            ],
            out_specs=pl.BlockSpec(
                (NB, D), lambda i, *_: (i, 0),
                memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, ET, D), msgs.dtype),
                pltpu.VMEM((2, ET, 1), jnp.int32),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((N_pad, D), msgs.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * (E_pad // ET) * NB * ET * D,
            bytes_accessed=E_pad * D * msgs.dtype.itemsize
            + N_pad * D * msgs.dtype.itemsize,
            transcendentals=0),
    )(block_starts, msgs_p, ids_p)
    return out[:num_segments]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def sorted_segment_sum(msgs, seg_ids, indptr, num_segments: int,
                       nb: int = 256, et: int = 512,
                       interpret: bool = False):
    """Segment sum over *sorted* segment ids via one-hot MXU matmuls.

    Args:
      msgs: ``[E, D]`` float messages, dst-sorted (Graph CSC order).
      seg_ids: ``[E]`` int32 sorted segment ids.
      indptr: ``[num_segments+1]`` CSC row pointer (``indptr[k]`` = first
        edge of segment ``k``).
      num_segments: output rows (static).
      nb / et: output row-block size and edge-tile size (tuning knobs).
    """
    return _sorted_segment_sum_impl(msgs, seg_ids, indptr, num_segments,
                                    nb, et, interpret)


def _fwd(msgs, seg_ids, indptr, num_segments, nb, et, interpret):
    out = _sorted_segment_sum_impl(msgs, seg_ids, indptr, num_segments,
                                   nb, et, interpret)
    return out, seg_ids


def _bwd(num_segments, nb, et, interpret, seg_ids, g):
    # d/dmsgs of segment-sum = gather of the output cotangent
    return jnp.take(g, seg_ids, axis=0), None, None


sorted_segment_sum.defvjp(_fwd, _bwd)


def available() -> bool:
    """Pallas TPU path usable on this backend?"""
    return jax.default_backend() == "tpu"
