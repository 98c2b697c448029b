"""Standard GNN model assemblies, mirroring the reference's
``examples/citation_benchmark/model.py`` configurations (GCN/GAT/APPNP/SGC/
GCNII stacks) and ``examples/graphsage`` / ``examples/gin``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..nn import (GCNConv, GATConv, GraphSageConv, GINConv, GCNII, APPNP,
                  SGCConv)

__all__ = ["GCN", "GAT", "GraphSage", "GIN", "DeepGCNII", "APPNPModel",
           "SGC", "SSGC", "GATv2", "GPRGNN", "FAGCN", "BernNet",
           "ChebNetII"]


class GCN(nn.Module):
    """Multi-layer GCN (reference ``examples/citation_benchmark/model.py``
    GCN: num_layers GCNConv with relu + dropout)."""
    input_size: int
    num_class: int
    num_layers: int = 2
    hidden_size: int = 16
    dropout: float = 0.5
    remat: bool = False

    @nn.compact
    def __call__(self, graph, feature, training: bool = False):
        # remat=True rematerializes each layer's activations in the
        # backward pass — deep stacks trade recompute FLOPs for the
        # [N, hidden] activation memory (jax.checkpoint per layer)
        conv = nn.remat(GCNConv) if self.remat else GCNConv
        norm = None
        for i in range(self.num_layers):
            if training and self.dropout > 0:
                feature = nn.Dropout(self.dropout, deterministic=False)(
                    feature)
            last = i == self.num_layers - 1
            in_size = self.input_size if i == 0 else self.hidden_size
            out_size = self.num_class if last else self.hidden_size
            feature = conv(in_size, out_size,
                           activation=None if last else "relu",
                           name=f"gcn_{i}")(graph, feature, norm)
        return feature


class GAT(nn.Module):
    """2-layer GAT (8 heads, 8 hidden → 1 head num_class) as in the
    citation benchmark."""
    input_size: int
    num_class: int
    num_heads: int = 8
    hidden_size: int = 8
    feat_drop: float = 0.6
    attn_drop: float = 0.6

    @nn.compact
    def __call__(self, graph, feature, training: bool = False):
        feature = GATConv(self.input_size, self.hidden_size,
                          feat_drop=self.feat_drop, attn_drop=self.attn_drop,
                          num_heads=self.num_heads, activation="elu",
                          name="gat_0")(graph, feature, training)
        feature = GATConv(self.hidden_size * self.num_heads, self.num_class,
                          feat_drop=self.feat_drop, attn_drop=self.attn_drop,
                          num_heads=1, concat=False,
                          name="gat_1")(graph, feature, training)
        return feature


class GraphSage(nn.Module):
    """Stacked GraphSAGE (reference ``examples/graphsage``)."""
    input_size: int
    num_class: int
    num_layers: int = 2
    hidden_size: int = 128
    aggr_func: str = "mean"
    dropout: float = 0.5
    remat: bool = False

    @nn.compact
    def __call__(self, graph, feature, training: bool = False):
        conv = (nn.remat(GraphSageConv, static_argnums=(3,))
                if self.remat else GraphSageConv)
        for i in range(self.num_layers):
            last = i == self.num_layers - 1
            in_size = self.input_size if i == 0 else self.hidden_size
            feature = conv(
                in_size, self.num_class if last else self.hidden_size,
                aggr_func=self.aggr_func, normalize=not last,
                name=f"sage_{i}")(graph, feature,
                                  None if last else "relu")
            if not last and training and self.dropout > 0:
                feature = nn.Dropout(self.dropout, deterministic=False)(
                    feature)
        return feature


class GIN(nn.Module):
    """Stacked GIN for graph classification (reference ``examples/gin``)."""
    input_size: int
    num_class: int
    num_layers: int = 5
    hidden_size: int = 64

    @nn.compact
    def __call__(self, graph, feature, training: bool = False):
        from ..nn import GraphPool
        outs = []
        for i in range(self.num_layers):
            in_size = self.input_size if i == 0 else self.hidden_size
            feature = GINConv(in_size, self.hidden_size, activation="relu",
                              name=f"gin_{i}")(graph, feature)
            outs.append(GraphPool("sum")(graph, feature))
        h = jnp.concatenate(outs, axis=-1)
        return nn.Dense(self.num_class, name="classifier")(h)


class DeepGCNII(nn.Module):
    """GCNII stack with in/out MLPs (citation benchmark GCNII config)."""
    input_size: int
    num_class: int
    hidden_size: int = 64
    k_hop: int = 64
    lambda_l: float = 0.5
    alpha: float = 0.1
    dropout: float = 0.6
    remat: bool = False

    @nn.compact
    def __call__(self, graph, feature, training: bool = False):
        drop = nn.Dropout(self.dropout, deterministic=not training)
        feature = drop(feature)
        feature = jax.nn.relu(nn.Dense(self.hidden_size, name="in")(feature))
        gcnii_cls = (nn.remat(GCNII, static_argnums=(3, 4))
                     if self.remat else GCNII)
        feature = gcnii_cls(self.hidden_size, activation="relu",
                            lambda_l=self.lambda_l, alpha=self.alpha,
                            k_hop=self.k_hop, dropout=self.dropout,
                            name="gcnii")(graph, feature, None, training)
        feature = drop(feature)
        return nn.Dense(self.num_class, name="out")(feature)


class APPNPModel(nn.Module):
    """MLP + APPNP propagation (citation benchmark APPNP config)."""
    input_size: int
    num_class: int
    hidden_size: int = 64
    dropout: float = 0.5
    k_hop: int = 10
    alpha: float = 0.1

    @nn.compact
    def __call__(self, graph, feature, training: bool = False):
        drop = nn.Dropout(self.dropout, deterministic=not training)
        feature = drop(feature)
        feature = jax.nn.relu(nn.Dense(self.hidden_size, name="l1")(feature))
        feature = drop(feature)
        feature = nn.Dense(self.num_class, name="l2")(feature)
        return APPNP(alpha=self.alpha, k_hop=self.k_hop,
                     name="appnp")(graph, feature)


class SGC(nn.Module):
    """Single SGCConv (citation benchmark SGC config)."""
    input_size: int
    num_class: int
    k_hop: int = 2

    @nn.compact
    def __call__(self, graph, feature, training: bool = False):
        return SGCConv(self.input_size, self.num_class, k_hop=self.k_hop,
                       cached=False, name="sgc")(graph, feature)


class BernNet(nn.Module):
    """MLP + Bernstein-polynomial propagation (reference
    ``examples/bernnet/model.py:21``)."""
    input_size: int
    num_class: int
    hidden_size: int = 64
    k_hop: int = 10
    dropout: float = 0.5

    @nn.compact
    def __call__(self, graph, feature, training: bool = False):
        from ..nn import BernProp
        drop = nn.Dropout(self.dropout, deterministic=not training)
        feature = drop(feature)
        feature = jax.nn.relu(nn.Dense(self.hidden_size, name="l1")(feature))
        feature = drop(feature)
        feature = nn.Dense(self.num_class, name="l2")(feature)
        return BernProp(k_hop=self.k_hop, name="prop")(graph, feature)


class ChebNetII(nn.Module):
    """MLP + Chebyshev-interpolated propagation (reference
    ``examples/chebnetii/model.py:21``)."""
    input_size: int
    num_class: int
    hidden_size: int = 64
    k_hop: int = 10
    dropout: float = 0.5

    @nn.compact
    def __call__(self, graph, feature, training: bool = False):
        from ..nn import ChebProp
        drop = nn.Dropout(self.dropout, deterministic=not training)
        feature = drop(feature)
        feature = jax.nn.relu(nn.Dense(self.hidden_size, name="l1")(feature))
        feature = drop(feature)
        feature = nn.Dense(self.num_class, name="l2")(feature)
        return ChebProp(k_hop=self.k_hop, name="prop")(graph, feature)


class SSGC(nn.Module):
    """Single SSGCConv: averaged damped hops plus α·x0 (citation benchmark
    SSGC config; reference ``pgl/nn/conv.py:1104``)."""
    input_size: int
    num_class: int
    k_hop: int = 16
    alpha: float = 0.05

    @nn.compact
    def __call__(self, graph, feature, training: bool = False):
        from ..nn import SSGCConv
        return SSGCConv(self.input_size, self.num_class, k_hop=self.k_hop,
                        alpha=self.alpha, cached=False,
                        name="ssgc")(graph, feature)


class GATv2(nn.Module):
    """2-layer GATv2 (reference ``examples/gatv2`` config: 8 heads x 8
    hidden, then 1 averaged head)."""
    input_size: int
    num_class: int
    num_heads: int = 8
    hidden_size: int = 8
    feat_drop: float = 0.6
    attn_drop: float = 0.6

    @nn.compact
    def __call__(self, graph, feature, training: bool = False):
        from ..nn import GATv2Conv
        feature = GATv2Conv(self.input_size, self.hidden_size,
                            feat_drop=self.feat_drop,
                            attn_drop=self.attn_drop,
                            num_heads=self.num_heads, activation="elu",
                            name="gatv2_0")(graph, feature, training)
        feature = GATv2Conv(self.hidden_size * self.num_heads,
                            self.num_class, feat_drop=self.feat_drop,
                            attn_drop=self.attn_drop, num_heads=1,
                            concat=False,
                            name="gatv2_1")(graph, feature, training)
        return feature


class GPRGNN(nn.Module):
    """GPR-GNN: MLP + learnable per-hop propagation weights (reference
    ``examples/gpr`` / ``pgl/nn/conv.py:500``)."""
    input_size: int
    num_class: int
    hidden_size: int = 64
    k_hop: int = 10
    alpha: float = 0.1
    init_method: str = "PPR"

    @nn.compact
    def __call__(self, graph, feature, training: bool = False):
        from ..nn import GPRConv
        return GPRConv(self.input_size, self.hidden_size, self.num_class,
                       k_hop=self.k_hop, alpha=self.alpha,
                       init_method=self.init_method,
                       name="gpr")(graph, feature, training)


class FAGCN(nn.Module):
    """FAGCN: linear in, ``num_layer`` tanh-gated FAConv hops each adding
    an ``eps``-scaled initial-residual, linear out (reference
    ``examples/fagcn/train.py:26-72``)."""
    input_size: int
    num_class: int
    hidden_size: int = 64
    num_layer: int = 3
    eps: float = 0.2
    dropout: float = 0.6

    @nn.compact
    def __call__(self, graph, feature, training: bool = False):
        from ..nn import FAConv
        drop = nn.Dropout(self.dropout, deterministic=not training)
        h = jax.nn.relu(nn.Dense(self.hidden_size, name="t1")(drop(feature)))
        h = drop(h)
        h0 = h
        for i in range(self.num_layer):
            h = self.eps * h0 + FAConv(self.hidden_size, drop=self.dropout,
                                       name=f"fa_{i}")(graph, h, training)
        return nn.Dense(self.num_class, name="t2")(h)


class LSTMSage(nn.Module):
    """GraphSAGE with UDF LSTM aggregation — the model family behind the
    reference's proudest legacy speed rows (UDF LSTM-aggregation epoch,
    ``legacy/docs/source/md/introduction.md:58-63``: 8.8-13.6x DGL). Each
    layer projects, gathers source features per edge, aggregates each
    destination's message sequence with an LSTM (``nn.LSTMAggregation``,
    CSC-ordered, padded to ``max_degree``), and combines with self.
    """
    input_size: int
    num_class: int
    num_layers: int = 2
    hidden_size: int = 16
    max_degree: int = 32
    dropout: float = 0.5

    @nn.compact
    def __call__(self, graph, feature, training: bool = False):
        from ..nn import LSTMAggregation
        for i in range(self.num_layers):
            last = i == self.num_layers - 1
            out = self.num_class if last else self.hidden_size
            if training and self.dropout > 0:
                feature = nn.Dropout(self.dropout,
                                     deterministic=False)(feature)
            h = nn.Dense(self.hidden_size, name=f"proj_{i}")(feature)
            msgs = jnp.take(h, graph.edges[:, 0], axis=0)
            agg = LSTMAggregation(self.hidden_size, self.max_degree,
                                  name=f"lstm_{i}")(graph, msgs)
            feature = nn.Dense(out, name=f"out_{i}")(
                jnp.concatenate([h, agg], axis=-1))
            if not last:
                feature = jax.nn.relu(feature)
        return feature
