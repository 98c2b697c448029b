"""Segment reduction primitives — the TPU-native backbone of message passing.

Capability parity with the reference's ``pgl/math.py`` (segment_{sum,mean,max,min},
segment_softmax at ``pgl/math.py:181``, segment_padding at ``pgl/math.py:227``,
segment_topk at ``pgl/math.py:299``), where the reference delegates to Paddle's
CUDA ``paddle.geometric.segment_*`` kernels. Here the segment reduces compile to
XLA scatter/reduce ops (fast on TPU when segment ids are sorted, which the Graph
guarantees by storing CSC/CSR-sorted edges), with empty-segment semantics matching
the reference contract: *segments that receive no element produce zeros*
(``pgl/graph.py:806-808``).

All functions require a static ``num_segments`` when used under ``jax.jit``.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

__all__ = [
    "segment_sum",
    "segment_mean",
    "segment_max",
    "segment_min",
    "segment_pool",
    "segment_softmax",
    "segment_padding",
    "segment_topk",
    "segment_topk_mask",
    "segment_count",
]


def _infer_num_segments(segment_ids, num_segments: Optional[int]) -> int:
    if num_segments is not None:
        return int(num_segments)
    # Only valid outside jit (concrete values).
    return int(jnp.max(segment_ids)) + 1 if segment_ids.size else 0


def segment_count(segment_ids, num_segments: Optional[int] = None,
                  indices_are_sorted: bool = False):
    """Number of elements in each segment, shape ``[num_segments]`` (int32)."""
    num_segments = _infer_num_segments(segment_ids, num_segments)
    return jax.ops.segment_sum(
        jnp.ones(segment_ids.shape, dtype=jnp.int32), segment_ids,
        num_segments=num_segments, indices_are_sorted=indices_are_sorted)


def segment_sum(data, segment_ids, num_segments: Optional[int] = None,
                indices_are_sorted: bool = False):
    """Sum of ``data`` rows sharing a segment id (reference: ``pgl/math.py:49``)."""
    num_segments = _infer_num_segments(segment_ids, num_segments)
    return jax.ops.segment_sum(data, segment_ids, num_segments=num_segments,
                               indices_are_sorted=indices_are_sorted)


def segment_mean(data, segment_ids, num_segments: Optional[int] = None,
                 indices_are_sorted: bool = False):
    """Mean per segment; empty segments yield 0 (reference: ``pgl/math.py:83``)."""
    num_segments = _infer_num_segments(segment_ids, num_segments)
    total = jax.ops.segment_sum(data, segment_ids, num_segments=num_segments,
                                indices_are_sorted=indices_are_sorted)
    count = segment_count(segment_ids, num_segments, indices_are_sorted)
    count = jnp.maximum(count, 1).astype(total.dtype)
    return total / count.reshape((-1,) + (1,) * (total.ndim - 1))


def segment_max(data, segment_ids, num_segments: Optional[int] = None,
                indices_are_sorted: bool = False):
    """Max per segment; empty segments yield 0 (reference: ``pgl/math.py:120``)."""
    num_segments = _infer_num_segments(segment_ids, num_segments)
    out = jax.ops.segment_max(data, segment_ids, num_segments=num_segments,
                              indices_are_sorted=indices_are_sorted)
    count = segment_count(segment_ids, num_segments, indices_are_sorted)
    mask = (count > 0).reshape((-1,) + (1,) * (out.ndim - 1))
    return jnp.where(mask, out, jnp.zeros_like(out))


def segment_min(data, segment_ids, num_segments: Optional[int] = None,
                indices_are_sorted: bool = False):
    """Min per segment; empty segments yield 0 (reference: ``pgl/math.py:150``)."""
    num_segments = _infer_num_segments(segment_ids, num_segments)
    out = jax.ops.segment_min(data, segment_ids, num_segments=num_segments,
                              indices_are_sorted=indices_are_sorted)
    count = segment_count(segment_ids, num_segments, indices_are_sorted)
    mask = (count > 0).reshape((-1,) + (1,) * (out.ndim - 1))
    return jnp.where(mask, out, jnp.zeros_like(out))


_POOLS = {"sum": segment_sum, "mean": segment_mean,
          "max": segment_max, "min": segment_min}


def segment_pool(data, segment_ids, pool_type: str,
                 num_segments: Optional[int] = None,
                 indices_are_sorted: bool = False):
    """Dispatch by pool type (reference: ``pgl/math.py:30``)."""
    fn = _POOLS.get(pool_type.lower())
    if fn is None:
        raise ValueError(
            "We only support sum, mean, max, min pool types in segment_pool.")
    return fn(data, segment_ids, num_segments, indices_are_sorted)


def segment_softmax(data, segment_ids, num_segments: Optional[int] = None,
                    indices_are_sorted: bool = False):
    """Numerically stable softmax within each segment.

    Matches the reference composite (max-shift → exp → segment-sum → divide)
    at ``pgl/math.py:181-224``. Returns an array the same shape as ``data``
    (one probability per element, normalized within its segment).
    """
    num_segments = _infer_num_segments(segment_ids, num_segments)
    seg_max = jax.ops.segment_max(
        jax.lax.stop_gradient(data), segment_ids, num_segments=num_segments,
        indices_are_sorted=indices_are_sorted)
    # Guard empty segments (-inf) so the gather below stays finite.
    seg_max = jnp.where(jnp.isfinite(seg_max), seg_max, 0.0)
    shifted = data - seg_max[segment_ids]
    exp = jnp.exp(shifted)
    denom = jax.ops.segment_sum(exp, segment_ids, num_segments=num_segments,
                                indices_are_sorted=indices_are_sorted)
    denom = jnp.maximum(denom, jnp.finfo(exp.dtype).tiny)
    return exp / denom[segment_ids]


def segment_padding(data, segment_ids, num_segments: Optional[int] = None,
                    max_len: Optional[int] = None):
    """Scatter segments into a dense ``[num_segments, max_len, dim]`` tensor.

    Mirrors the reference ``pgl/math.py:227-272`` (used by ``to_dense_batch`` /
    GMT pooling). Returns ``(padded, mask, max_len)`` where ``mask`` is a
    boolean ``[num_segments, max_len]`` marking valid positions. Requires
    ``segment_ids`` sorted ascending (the caller sorts, as the reference does).
    ``max_len`` must be static under jit; if None it is computed eagerly.
    """
    num_segments = _infer_num_segments(segment_ids, num_segments)
    count = segment_count(segment_ids, num_segments, indices_are_sorted=True)
    if max_len is None:
        max_len = int(jnp.max(count)) if count.size else 0
    # Position of each element inside its segment: i - indptr[segment_ids[i]].
    starts = jnp.cumsum(count) - count
    pos = jnp.arange(segment_ids.shape[0]) - starts[segment_ids]
    # when max_len caps below a segment's size, route the overflow to an
    # out-of-bounds index — jax drops OOB scatter updates, so capped
    # elements are truncated instead of spilling into the next segment
    flat_index = jnp.where(pos < max_len, segment_ids * max_len + pos,
                           num_segments * max_len)
    out_shape = (num_segments * max_len,) + data.shape[1:]
    padded = jnp.zeros(out_shape, dtype=data.dtype).at[flat_index].set(
        data, mode="drop")
    padded = padded.reshape((num_segments, max_len) + data.shape[1:])
    mask = (jnp.arange(max_len)[None, :]
            < jnp.minimum(count, max_len)[:, None])
    return padded, mask, max_len


def segment_topk_mask(score, segment_ids, num_segments: Optional[int] = None,
                      ratio: float = 0.5, min_score: Optional[float] = None):
    """Device-side, jittable per-segment top-k as a boolean keep-mask.

    The static-shape counterpart of :func:`segment_topk` (reference
    ``pgl/math.py:299-364`` runs on device; this matches its selection):
    returns ``keep [n] bool`` with ``keep[i]`` true iff element ``i`` is
    among the ``ceil(ratio * segment_size)`` highest-scored elements of its
    segment (ties broken toward the earlier index, like the host path's
    stable sort), or — when ``min_score`` is given — iff
    ``score[i] > min_score``. Fully static shapes, so SAGPool-style layers
    can jit by masking instead of materializing a smaller graph.
    """
    score = score.reshape(-1)
    if min_score is not None:
        # reference semantics (pgl/math.py:338-341): threshold at
        # min(segment_max, min_score) so the top-scored element of every
        # segment always survives — a plain score > min_score could drop
        # every node of a graph (softmaxed scores shrink with its size)
        num_segments = _infer_num_segments(segment_ids, num_segments)
        smax = segment_max(score, segment_ids, num_segments=num_segments)
        thresh = jnp.minimum(smax, min_score)
        # >= : the docstring contract removes nodes with value LOWER than
        # the threshold, and the segment max (== thresh when every score
        # falls below min_score) must survive
        return score >= thresh[segment_ids]
    num_segments = _infer_num_segments(segment_ids, num_segments)
    n = score.shape[0]
    count = segment_count(segment_ids, num_segments)
    # order by (segment, score desc); lexsort is stable so ties keep the
    # earlier original index, matching the host path's stable argsort
    order = jnp.lexsort((-score, segment_ids))
    starts = jnp.cumsum(count) - count
    seg_sorted = segment_ids[order]
    pos_in_seg = jnp.arange(n) - starts[seg_sorted]
    k = jnp.ceil(ratio * count.astype(score.dtype)).astype(jnp.int32)
    keep_sorted = pos_in_seg < k[seg_sorted]
    return jnp.zeros((n,), bool).at[order].set(keep_sorted)


def segment_topk(data, score, segment_ids, num_segments: Optional[int] = None,
                 ratio: float = 0.5, min_score: Optional[float] = None,
                 return_index: bool = True):
    """Per-segment top-k selection (SAGPool support; reference ``pgl/math.py:299``).

    With ``min_score`` set, keeps elements whose score exceeds it; otherwise
    keeps ``ceil(ratio * segment_size)`` highest-scored elements per segment.
    This host-friendly implementation returns dynamically-shaped outputs, so it
    must run *outside* jit (the reference's is likewise dynamic). Returns
    ``(selected_data, selected_index)`` or just ``selected_data``.
    """
    import numpy as np

    score = np.asarray(score).reshape(-1)
    segment_ids_np = np.asarray(segment_ids)
    num_segments = _infer_num_segments(segment_ids_np, num_segments)
    keep = []
    if min_score is not None:
        smax = np.full(num_segments, -np.inf)
        np.maximum.at(smax, segment_ids_np, score)
        thresh = np.minimum(smax, float(min_score))
        keep = np.nonzero(score >= thresh[segment_ids_np])[0]
    else:
        order = np.argsort(segment_ids_np, kind="stable")
        bounds = np.searchsorted(segment_ids_np[order],
                                 np.arange(num_segments + 1))
        sel = []
        for s in range(num_segments):
            idx = order[bounds[s]:bounds[s + 1]]
            if idx.size == 0:
                continue
            k = int(np.ceil(ratio * idx.size))
            top = idx[np.argsort(-score[idx], kind="stable")[:k]]
            sel.append(np.sort(top))
        keep = np.concatenate(sel) if sel else np.zeros((0,), dtype=np.int64)
    keep = jnp.asarray(np.asarray(keep, dtype=np.int32))
    selected = jnp.asarray(data)[keep]
    if return_index:
        return selected, keep
    return selected
