"""Message — the segment-bucketed view handed to ``recv`` reduce UDFs.

Capability parity with the reference ``pgl/message.py`` (``reduce`` at ``:34``,
``reduce_sum/mean/max/min`` at ``:55-105``, ``edge_expand`` at ``:107``,
``reduce_softmax`` at ``:159``, ``__getitem__`` at ``:172``).

TPU-native form: the message dict is paired with precomputed *sorted* segment
ids (dst-major from the Graph's CSC index), so every reduce lowers to a sorted
segment reduce — no bucketing loops, no dynamic shapes.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax.numpy as jnp

from .ops import segment as S

__all__ = ["Message"]


class Message:
    def __init__(self, msg: Dict, segment_ids, num_segments: int,
                 eid=None, indices_are_sorted: bool = True):
        """``msg`` maps name → per-edge tensor in *original* edge order;
        ``eid`` (optional) permutes it into segment order lazily on access."""
        self._msg = msg
        self._segment_ids = segment_ids
        self._num_segments = num_segments
        self._eid = eid
        self._sorted = indices_are_sorted
        self._permuted = {}

    @property
    def segment_ids(self):
        return self._segment_ids

    def __getitem__(self, name):
        value = self._msg[name]
        if self._eid is not None:
            cached = self._permuted.get(name)
            if cached is not None:
                return cached
            value = jnp.take(value, self._eid, axis=0)
            # memoize: a recv UDF reading the same key several times
            # would otherwise re-issue the [E]-row gather each access
            self._permuted[name] = value
        return value

    def reduce(self, msg, pool_type: str = "sum"):
        """Reduce a per-edge tensor (already in segment order) by segment."""
        return S.segment_pool(msg, self._segment_ids, pool_type,
                              num_segments=self._num_segments,
                              indices_are_sorted=self._sorted)

    def reduce_sum(self, msg):
        return self.reduce(msg, "sum")

    def reduce_mean(self, msg):
        return self.reduce(msg, "mean")

    def reduce_max(self, msg):
        return self.reduce(msg, "max")

    def reduce_min(self, msg):
        return self.reduce(msg, "min")

    def reduce_softmax(self, msg):
        """Per-segment softmax of per-edge logits (attention normalizer)."""
        return S.segment_softmax(msg, self._segment_ids,
                                 num_segments=self._num_segments,
                                 indices_are_sorted=self._sorted)

    def edge_expand(self, msg):
        """Broadcast per-segment values back onto edges (inverse of reduce,
        reference ``pgl/message.py:107``)."""
        return jnp.take(msg, self._segment_ids, axis=0)
