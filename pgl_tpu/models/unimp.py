"""UniMP and R-UniMP model assemblies.

Capability parity with the reference's OGB leaderboard code
(``ogb_examples/nodeproppred/unimp/`` — TransformerConv stacks with masked
label embedding, and ``examples/kddcup2021/MAG240M/r_unimp`` — relation-wise
hetero attention with label + metapath2vec features).

UniMP = "Unified Message Passing" (Shi et al., 2020): node features are
augmented with an embedding of the *known* labels (train nodes, randomly
masked during training so the model learns to propagate labels), then a
stack of graph-transformer layers classifies every node.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..nn import TransformerConv

__all__ = ["UniMP", "RUniMP", "label_propagation_smooth"]


def label_propagation_smooth(graph, probs, gold_onehot, train_mask,
                             alpha: float = 0.2, hops: int = 3):
    """Post-smoothing by pinned-label propagation — the R-UniMP
    leaderboard trick (reference
    ``examples/kddcup2021/MAG240M/r_unimp/post_smoothing.py:57-80``):

    each hop replaces every node's class distribution with
    ``(1-α)·(Σ_in-neighbors y + y) / (indeg+1) + α·y0``, renormalized,
    with train nodes pinned to their gold one-hot labels throughout.
    The reference runs it host-side in 50k-node batches; here it is a
    jittable device loop that runs on a ``Graph`` or a halo-sharded
    ``HaloGraph`` unchanged (``probs``/masks in the graph's node layout).

    Args:
      probs: ``[..., N, C]`` base predictions (rows should be
        probability-like; train rows are overwritten).
      gold_onehot: same shape — one-hot gold labels (zeros off-train).
      train_mask: ``[..., N]`` float/bool — where to pin gold labels.
      alpha: weight of the original predictions each hop.
      hops: number of propagation steps.

    Returns the smoothed ``[..., N, C]`` distribution.
    """
    m = jnp.asarray(train_mask, probs.dtype)[..., None]
    y0 = probs * (1 - m) + gold_onehot * m
    norm = (1.0 / (graph.indegree().astype(probs.dtype) + 1.0))[..., None]
    y = y0
    for _ in range(hops):
        agg = graph.send_recv(y, "sum") + y
        y = (1 - alpha) * agg * norm + alpha * y0
        y = y / jnp.maximum(jnp.sum(y, -1, keepdims=True), 1e-12)
        y = y * (1 - m) + gold_onehot * m
    return y


class UniMP(nn.Module):
    """TransformerConv stack with masked-label embedding
    (reference ``ogb_examples/nodeproppred/unimp``)."""
    input_size: int
    num_class: int
    num_layers: int = 3
    hidden_size: int = 128
    num_heads: int = 2
    dropout: float = 0.3
    use_label_embed: bool = True

    @nn.compact
    def __call__(self, graph, feature, label=None, label_mask=None,
                 training: bool = False):
        """``label``: [N] int labels; ``label_mask``: [N] bool — True where
        the label may be fed to the model (train nodes, minus the random
        mask-out the caller applies during training)."""
        if self.use_label_embed and label is not None:
            embed = nn.Embed(self.num_class, self.input_size,
                             name="label_embed")(jnp.maximum(label, 0))
            mask = (label_mask if label_mask is not None
                    else jnp.zeros(label.shape, bool))
            feature = feature + jnp.where(mask[..., None], embed, 0.0)
        h = feature
        for i in range(self.num_layers):
            last = i == self.num_layers - 1
            in_size = self.input_size if i == 0 \
                else self.hidden_size * self.num_heads
            h = TransformerConv(
                in_size,
                self.num_class if last else self.hidden_size,
                num_heads=1 if last else self.num_heads,
                feat_drop=self.dropout, attn_drop=self.dropout,
                concat=not last, gate=last, layer_norm=not last,
                activation=None if last else "relu",
                name=f"conv_{i}")(graph, h, training=training)
        return h


class RUniMP(nn.Module):
    """Relation-wise UniMP over a HeterGraph: one TransformerConv per edge
    type per layer, outputs summed (the R-GCN pattern of
    ``examples/kddcup2021/MAG240M/r_unimp/models/r_unimp.py``)."""
    input_size: int
    num_class: int
    etypes: Sequence[str]
    num_layers: int = 2
    hidden_size: int = 128
    num_heads: int = 2
    dropout: float = 0.3

    @nn.compact
    def __call__(self, hetergraph, feature, label=None, label_mask=None,
                 training: bool = False):
        if label is not None:
            embed = nn.Embed(self.num_class, self.input_size,
                             name="label_embed")(jnp.maximum(label, 0))
            mask = (label_mask if label_mask is not None
                    else jnp.zeros(label.shape, bool))
            feature = feature + jnp.where(mask[..., None], embed, 0.0)
        h = feature
        for i in range(self.num_layers):
            last = i == self.num_layers - 1
            in_size = self.input_size if i == 0 \
                else self.hidden_size * self.num_heads
            outs = []
            for etype in self.etypes:
                outs.append(TransformerConv(
                    in_size,
                    self.num_class if last else self.hidden_size,
                    num_heads=1 if last else self.num_heads,
                    feat_drop=self.dropout, attn_drop=self.dropout,
                    concat=not last, layer_norm=not last,
                    activation=None,
                    name=f"conv_{i}_{etype}")(
                        hetergraph[etype], h, training=training))
            h = sum(outs)
            if not last:
                h = jax.nn.relu(h)
        return h
