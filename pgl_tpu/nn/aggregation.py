"""Sequence aggregators over incoming messages — the UDF-LSTM capability.

The reference's headline UDF benchmark aggregates each node's neighbor
messages with an LSTM (8.8–13.6× faster than DGL's degree bucketing;
``legacy/docs/source/md/introduction.md:58-63``). TPU-native form: messages
are already dst-sorted (CSC), so ``segment_padding`` packs them into a dense
``[N, max_len, d]`` tensor in one scatter; a masked LSTM scan then runs as
regular batched compute — no per-degree buckets, one compilation.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from .. import math as gmath

__all__ = ["LSTMAggregation", "lstm_aggregate"]


class LSTMAggregation(nn.Module):
    """Aggregate each destination's incoming messages with an LSTM.

    Args:
      hidden_size: LSTM width (output is the final hidden state per node).
      max_degree: static cap on messages per node (higher-degree nodes keep
        their first ``max_degree`` incoming edges in CSC order). Must be set
        for jit (static shape).

    Call with the *graph* and per-edge messages in original edge order
    (e.g. gathered source features); nodes without messages output zeros.
    """
    hidden_size: int
    max_degree: int = 32

    @nn.compact
    def __call__(self, graph, msgs):
        idx = graph.adj_dst_index
        msgs_sorted = jnp.take(msgs, idx.sorted_eid, axis=0)
        padded, mask, _ = gmath.segment_padding(
            msgs_sorted, idx.segment_ids, num_segments=graph.num_nodes,
            max_len=self.max_degree)
        # padded: [N, L, d]; mask True at valid positions
        seq_lengths = mask.sum(axis=1).astype(jnp.int32)
        rnn = nn.RNN(nn.OptimizedLSTMCell(self.hidden_size),
                     return_carry=True, name="lstm")
        final_carry, _ = rnn(padded, seq_lengths=seq_lengths)
        h_final = final_carry[1]
        has_msgs = seq_lengths > 0
        return jnp.where(has_msgs[:, None], h_final, 0.0)


def lstm_aggregate(graph, msgs, params, hidden_size: int,
                   max_degree: int = 32):
    """Functional wrapper around :class:`LSTMAggregation`."""
    return LSTMAggregation(hidden_size, max_degree).apply(
        params, graph, msgs)
