"""Graph Multiset Transformer pooling (reference: ``pgl/nn/gmt_pool.py``).

Blocks: MAB (multi-head attention block, ``gmt_pool.py:27``), SAB (self
attention, ``:115``), PMA (seed-query pooling, ``:155``), and the
``GraphMultisetTransformer`` orchestrator (``:198``).

Note: the reference normalizes attention with ``softmax(axis=1)`` (over
queries); we use the standard key-axis softmax (as in the paper and the PyG
implementation) — masked with -1e9 at dummy key positions.
"""

from __future__ import annotations

import math as pymath
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..utils.transform import to_dense_batch

__all__ = ["MAB", "SAB", "PMA", "GraphMultisetTransformer"]


class MAB(nn.Module):
    """Multi-head attention block; K/V optionally produced by a graph conv
    over the (graph, node-features) pair (GMH variant)."""
    dim_Q: int
    dim_K: int
    dim_V: int
    num_heads: int
    conv: Any = None
    layer_norm: bool = False
    max_num_nodes: Optional[int] = None  # static dense-batch cap (jit)

    @nn.compact
    def __call__(self, Q, K, graph=None, mask=None):
        H = self.num_heads
        Q = nn.Dense(self.dim_V, name="proj_q")(Q)
        if graph is not None:
            g, x = graph
            k = self.conv(self.dim_K, self.dim_V, name="layer_k")(g, x)
            v = self.conv(self.dim_K, self.dim_V, name="layer_v")(g, x)
            K, _ = to_dense_batch(k, g, max_num_nodes=self.max_num_nodes)
            V, _ = to_dense_batch(v, g, max_num_nodes=self.max_num_nodes)
        else:
            # both projections act on the RAW input (reference
            # gmt_pool.py:84 evaluates the tuple before assignment) — a
            # sequential reassignment silently rank-limits V through W_k
            K, V = (nn.Dense(self.dim_V, name="layer_k")(K),
                    nn.Dense(self.dim_V, name="layer_v")(K))

        B, Lq, _ = Q.shape
        Lk = K.shape[1]
        dh = self.dim_V // H
        q = Q.reshape(B, Lq, H, dh).transpose(0, 2, 1, 3)
        k = K.reshape(B, Lk, H, dh).transpose(0, 2, 1, 3)
        v = V.reshape(B, Lk, H, dh).transpose(0, 2, 1, 3)
        score = jnp.einsum("bhqd,bhkd->bhqk", q, k) / pymath.sqrt(self.dim_V)
        if mask is not None:
            # mask: [B, Lk] True at dummy positions
            score = score + jnp.where(mask, -1e9, 0.0)[:, None, None, :]
        attn = jax.nn.softmax(score, axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, Lq, self.dim_V)
        output = Q + out
        if self.layer_norm:
            output = nn.LayerNorm(name="ln0")(output)
        output = output + jax.nn.relu(
            nn.Dense(self.dim_V, name="proj_o")(output))
        if self.layer_norm:
            output = nn.LayerNorm(name="ln1")(output)
        return output


class SAB(nn.Module):
    """Self-attention block (reference ``gmt_pool.py:115``)."""
    input_dim: int
    output_dim: int
    num_heads: int
    conv: Any = None
    layer_norm: bool = False
    max_num_nodes: Optional[int] = None

    @nn.compact
    def __call__(self, x, graph=None, mask=None):
        return MAB(self.input_dim, self.input_dim, self.output_dim,
                   self.num_heads, conv=self.conv,
                   layer_norm=self.layer_norm,
                   max_num_nodes=self.max_num_nodes,
                   name="mab")(x, x, graph, mask)


class PMA(nn.Module):
    """Pooling by multi-head attention with learnable seed queries
    (reference ``gmt_pool.py:155``)."""
    dim: int
    num_heads: int
    num_seeds: int
    conv: Any = None
    layer_norm: bool = False
    max_num_nodes: Optional[int] = None

    @nn.compact
    def __call__(self, x, graph=None, mask=None):
        seeds = self.param("Q_S", nn.initializers.kaiming_uniform(),
                           (1, self.num_seeds, self.dim))
        Q = jnp.broadcast_to(seeds, (x.shape[0], self.num_seeds, self.dim))
        return MAB(self.dim, self.dim, self.dim, self.num_heads,
                   conv=self.conv, layer_norm=self.layer_norm,
                   max_num_nodes=self.max_num_nodes,
                   name="mab")(Q, x, graph, mask)


class GraphMultisetTransformer(nn.Module):
    """GMT pooling: GMPool_G → SelfAtt → GMPool_I by default, producing one
    vector per graph (reference ``gmt_pool.py:198-291``)."""
    input_dim: int
    hidden_dim: int
    output_dim: int
    conv: Any = None
    num_nodes: int = 30
    pooling_ratio: float = 0.25
    pool_sequences: Optional[Sequence[str]] = None
    num_heads: int = 4
    layer_norm: bool = False

    @nn.compact
    def __call__(self, graph, x):
        from .conv import GCNConv
        conv = self.conv or GCNConv
        seqs = list(self.pool_sequences or
                    ["GMPool_G", "SelfAtt", "GMPool_I"])
        for name in seqs:
            if name not in ("GMPool_G", "GMPool_I", "SelfAtt"):
                raise ValueError(
                    "Elements in 'pool_sequences' should be one of "
                    "'GMPool_G', 'GMPool_I', or 'SelfAtt'")
        if seqs[-1] == "SelfAtt":
            raise ValueError(
                "'pool_sequences' must end in a GMPool stage — SelfAtt "
                "keeps one row per remaining seed, so the final "
                "single-vector squeeze would fail at apply time")
        x = nn.Dense(self.hidden_dim, name="lin1")(x)
        # num_nodes is the static per-graph node cap: keeps the dense batch
        # shape jit-stable (graphs larger than the cap are truncated)
        batch_x, mask = to_dense_batch(x, graph,
                                       max_num_nodes=self.num_nodes)
        num_out = pymath.ceil(self.num_nodes * self.pooling_ratio)
        for i, name in enumerate(seqs):
            if i == len(seqs) - 1:
                num_out = 1
            if name == "GMPool_G":
                pool = PMA(self.hidden_dim, self.num_heads, num_out,
                           conv=conv, layer_norm=self.layer_norm,
                           max_num_nodes=self.num_nodes,
                           name=f"pool_{i}")
                g = (graph, x)
                num_out = pymath.ceil(num_out * self.pooling_ratio)
            elif name == "GMPool_I":
                pool = PMA(self.hidden_dim, self.num_heads, num_out,
                           conv=None, layer_norm=self.layer_norm,
                           name=f"pool_{i}")
                g = None
                num_out = pymath.ceil(num_out * self.pooling_ratio)
            else:
                pool = SAB(self.hidden_dim, self.hidden_dim, self.num_heads,
                           conv=None, layer_norm=self.layer_norm,
                           name=f"pool_{i}")
                g = None
            batch_x = pool(batch_x, g, mask)
            # the padding mask stays valid through SelfAtt (rows still map
            # to original nodes); only a pooling stage replaces rows with
            # seed outputs, which are all valid
            if name != "SelfAtt":
                mask = None
        return nn.Dense(self.output_dim, name="lin2")(batch_x.squeeze(1))
