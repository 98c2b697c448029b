"""Graph convolution layer zoo (flax.linen modules).

Capability parity with the reference ``pgl/nn/conv.py`` (16 layers,
``conv.py:25-43``). Each docstring cites the reference implementation the
semantics were matched against; the implementations are TPU-native — every
aggregation lowers to the sorted-segment SpMM/SDDMM primitives in
``pgl_tpu.ops``, and all control flow is static for jit.

Layers take ``(graph, feature)`` in ``__call__``; dropout-bearing layers take
``training=False`` and require a ``'dropout'`` PRNG when training.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Union

import numpy as np

import jax
import jax.numpy as jnp
import flax.linen as nn

from .functional import graph_op as GF

__all__ = [
    "GCNConv", "GATConv", "GATv2Conv", "APPNP", "GPRConv", "GCNII",
    "TransformerConv", "GINConv", "GraphSageConv", "PinSageConv",
    "RGCNConv", "SGCConv", "SSGCConv", "NGCFConv", "LightGCNConv", "FAConv",
    "BernProp", "ChebProp",
]


def _resolve_act(activation) -> Optional[Callable]:
    if activation is None or callable(activation):
        return activation
    return getattr(jax.nn, activation)


def _check_drop_mode(mode):
    if mode not in ("edge", "cell"):
        raise ValueError(
            f"attn_drop_mode must be 'edge' or 'cell', got {mode!r}")


def _attn_drop_seed(module, rate):
    """Fold this step's 'dropout' rng into the int32 seed the in-kernel
    counter-based attention dropout consumes (None when rate is 0)."""
    if rate <= 1e-15:
        return None
    kd = jax.random.key_data(module.make_rng("dropout")).astype(jnp.uint32)
    return (kd[0] ^ kd[1]).astype(jnp.int32)


def _l2_normalize(x, axis=-1, eps=1e-12):
    return x / jnp.sqrt(
        jnp.maximum(jnp.sum(x * x, axis=axis, keepdims=True), eps))


class GraphSageConv(nn.Module):
    """GraphSAGE layer: self linear + reduced-neighbor linear, optional L2
    normalize (reference ``pgl/nn/conv.py:46-115``)."""
    input_size: int
    hidden_size: int
    aggr_func: str = "sum"
    normalize: bool = True

    @nn.compact
    def __call__(self, graph, feature, act=None):
        assert self.aggr_func in ("sum", "mean", "max", "min")
        if not isinstance(feature, (tuple, list)):
            feature = (feature, feature)
        neigh = graph.send_recv(feature[0], self.aggr_func)
        neigh = nn.Dense(self.hidden_size, name="neigh_linear")(neigh)
        self_f = nn.Dense(self.hidden_size, name="self_linear")(feature[1])
        output = self_f + neigh
        act = _resolve_act(act)
        if act is not None:
            output = act(output)
        if self.normalize:
            output = _l2_normalize(output, axis=-1)
        return output


class PinSageConv(nn.Module):
    """PinSage: edge-weighted neighbor aggregation + L2 normalize
    (reference ``pgl/nn/conv.py:118-187``)."""
    input_size: int
    hidden_size: int
    aggr_func: str = "sum"

    @nn.compact
    def __call__(self, graph, nfeat, efeat, act=None):
        neigh = graph.send_ue_recv(nfeat, efeat, "mul", self.aggr_func)
        self_f = nn.Dense(self.hidden_size, name="self_linear")(nfeat)
        neigh = nn.Dense(self.hidden_size, name="neigh_linear")(neigh)
        output = self_f + neigh
        act = _resolve_act(act)
        if act is not None:
            output = act(output)
        return _l2_normalize(output, axis=-1)


class GCNConv(nn.Module):
    """GCN layer with the D^-1/2 A D^-1/2 normalization and the
    linear-before-or-after-propagation size trick
    (reference ``pgl/nn/conv.py:189-254``)."""
    input_size: int
    output_size: int
    activation: Any = None
    norm: bool = True

    @nn.compact
    def __call__(self, graph, feature, norm=None):
        if self.norm and norm is None:
            norm = GF.degree_norm(graph, dtype=feature.dtype)
        linear = nn.Dense(self.output_size, use_bias=False, name="linear")
        if self.input_size > self.output_size:
            feature = linear(feature)
        if norm is not None:
            feature = feature * norm
        output = graph.send_recv(feature, "sum")
        if self.input_size <= self.output_size:
            output = linear(output)
        if norm is not None:
            output = output * norm
        bias = self.param("bias", nn.initializers.zeros, (self.output_size,))
        output = output + bias
        act = _resolve_act(self.activation)
        if act is not None:
            output = act(output)
        return output


class GATConv(nn.Module):
    """GAT: additive attention via SDDMM + edge softmax + weighted SpMM
    (reference ``pgl/nn/conv.py:257-346``).

    ``attn_drop_mode`` (matters only for MULTIgraphs with attn_drop > 0;
    simple graphs are bit-identical either way):
      * ``"edge"`` (default) — reference-exact per-edge dropout
        (``pgl/nn/conv.py:334-339`` drops each duplicate edge
        independently); multigraphs fall back to the per-edge kernels
        (~3x the attention cost of the count-matrix path).
      * ``"cell"`` — per-(dst, src)-cell dropout on the fast
        count-matrix path: duplicates of one (dst, src) pair drop
        TOGETHER. The output is linear in the mask and the softmax
        denominator is undropped (reference semantics), so E[out] is
        identical to per-edge dropout — same expectation, higher
        variance (see tests/test_dedup_attention.py expectation-parity
        test).
    """
    input_size: int
    hidden_size: int
    feat_drop: float = 0.6
    attn_drop: float = 0.6
    num_heads: int = 1
    concat: bool = True
    attn_drop_mode: str = "edge"
    activation: Any = None

    @nn.compact
    def __call__(self, graph, feature, training: bool = False):
        if self.feat_drop > 1e-15:
            feature = nn.Dropout(self.feat_drop, deterministic=not training)(
                feature)
        feature = nn.Dense(self.num_heads * self.hidden_size,
                           name="linear")(feature)
        # shape-generalized: [N, H*Dh] single-device or [S, N_pad, H*Dh]
        # halo-sharded — all per-head math keys off the trailing axes
        feature = feature.reshape(
            feature.shape[:-1] + (self.num_heads, self.hidden_size))
        w_src = self.param("weight_src", nn.initializers.xavier_uniform(),
                           (self.num_heads, self.hidden_size))
        w_dst = self.param("weight_dst", nn.initializers.xavier_uniform(),
                           (self.num_heads, self.hidden_size))
        attn_src = jnp.sum(feature * w_src, axis=-1)
        attn_dst = jnp.sum(feature * w_dst, axis=-1)
        from ..ops.dispatch import use_fused_attention
        H = self.num_heads

        if hasattr(graph, "gat_attention"):
            # HaloGraph: per-shard flash attention over the owned dst rows
            # with one boundary-row all_to_all (dropout runs in-kernel)
            Dh = self.hidden_size
            rate = float(self.attn_drop) if training else 0.0
            seed = _attn_drop_seed(self, rate)
            out = graph.gat_attention(
                attn_dst, attn_src,
                feature.reshape(feature.shape[:-2] + (H * Dh,)),
                0.2, rate, seed)
            output = out.reshape(out.shape[:-1] + (H, Dh))
            if self.concat:
                output = output.reshape(output.shape[:-2] + (H * Dh,))
            else:
                output = output.mean(axis=-2)
            act = _resolve_act(self.activation)
            return act(output) if act is not None else output
        # the additive kernel applies attention-prob dropout in-kernel
        # (deterministic counter-based mask, identical across the fwd and
        # both bwd passes); only the dot-mode fallback still needs the
        # unfused path for attn_drop.
        drop_in_kernel = 3 * H <= 128
        if use_fused_attention(graph, graph.num_edges,
                               training and self.attn_drop > 1e-15
                               and not drop_in_kernel):
            # fused SDDMM+softmax+aggregate Pallas kernel (value width
            # padded to the lane size)
            Dh = self.hidden_size
            dv_pad = max(128, -(-H * Dh // 128) * 128)
            v = feature.reshape(-1, H * Dh)
            if dv_pad > H * Dh:
                v = jnp.concatenate(
                    [v, jnp.zeros((v.shape[0], dv_pad - H * Dh),
                                  v.dtype)], axis=1)
            csc, csr, perm = graph._spmm_layouts[:3]
            rate = float(self.attn_drop) if training else 0.0
            dedup_aux = (graph._dedup_attn_aux()
                         if hasattr(graph, "_dedup_attn_aux") else None)
            _check_drop_mode(self.attn_drop_mode)
            if dedup_aux is not None and rate > 0.0 \
                    and not dedup_aux[0].simple \
                    and self.attn_drop_mode != "cell":
                # multigraph: a count-matrix cell covers several edges,
                # so per-cell dropout is not per-edge dropout — use the
                # per-edge kernels (attn_drop_mode="cell" opts into the
                # expectation-equivalent fast path instead)
                dedup_aux = None
            if dedup_aux is not None:
                # count-matrix pair attention: scores depend only on the
                # (dst, src) pair, so the dedup layout computes the whole
                # softmax over dense [NB, W] pair tiles — ~7x less score
                # work than the per-edge kernel and unique-src gathers
                # (ops/pallas/dedup_attention.py). On simple graphs the
                # in-kernel per-cell dropout IS per-edge dropout.
                from ..ops.pallas.dedup_attention import dedup_gat_attention
                csc_d, red = dedup_aux
                seed = _attn_drop_seed(self, rate)
                out = dedup_gat_attention(attn_dst, attn_src, v, csc_d,
                                          red, H, Dh, 0.2,
                                          attn_drop=rate, drop_seed=seed)
            elif drop_in_kernel:
                # additive-score kernel: exact f32 VPU scores, no matmul
                from ..ops.pallas.attention_kernels import (
                    fused_gat_attention)
                seed = _attn_drop_seed(self, rate)
                out = fused_gat_attention(attn_dst, attn_src, v, csc,
                                          (csr, perm), 0.2, dvh=Dh,
                                          attn_drop=rate, drop_seed=seed)
            else:
                # many-head fallback: additive scores as a dot
                from ..ops.pallas.attention_kernels import (
                    fused_graph_attention, gat_score_features)
                q, k = gat_score_features(attn_dst, attn_src)
                out = fused_graph_attention(
                    q, k, v, csc, (csr, perm), H, 0.2,
                    dsh=q.shape[1] // H, dvh=Dh)
            output = out[:, :H * Dh].reshape(-1, H, Dh)
        else:
            alpha = graph.send_uv(attn_src, attn_dst, "add")
            alpha = jax.nn.leaky_relu(alpha, negative_slope=0.2)
            alpha = GF.edge_softmax(graph, alpha)
            alpha = alpha.reshape(-1, self.num_heads, 1)
            if self.attn_drop > 1e-15:
                alpha = nn.Dropout(self.attn_drop,
                                   deterministic=not training)(alpha)
            output = graph.send_ue_recv(feature, alpha, "mul", "sum")
        if self.concat:
            output = output.reshape(-1, self.num_heads * self.hidden_size)
        else:
            output = output.mean(axis=1)
        act = _resolve_act(self.activation)
        if act is not None:
            output = act(output)
        return output


class GATv2Conv(nn.Module):
    """GATv2: leaky-relu before the attention projection
    (reference ``pgl/nn/conv.py:349-436``)."""
    input_size: int
    hidden_size: int
    feat_drop: float = 0.6
    attn_drop: float = 0.6
    num_heads: int = 1
    concat: bool = True
    activation: Any = None

    @nn.compact
    def __call__(self, graph, feature, training: bool = False):
        if self.feat_drop > 1e-15:
            feature = nn.Dropout(self.feat_drop, deterministic=not training)(
                feature)
        feature = nn.Dense(self.num_heads * self.hidden_size,
                           name="linear")(feature)
        # trailing-axis reshapes so the layer works on [N, F] and the
        # halo-sharded [S, N_pad, F] layouts alike
        feature = feature.reshape(
            feature.shape[:-1] + (self.num_heads, self.hidden_size))
        attn = self.param("attn", nn.initializers.xavier_uniform(),
                          (1, self.num_heads, self.hidden_size))
        alpha = graph.send_uv(feature, feature, "add")
        alpha = jax.nn.leaky_relu(alpha, negative_slope=0.2)
        alpha = jnp.sum(alpha * attn, axis=-1)
        alpha = GF.edge_softmax(graph, alpha)
        alpha = alpha[..., None]
        if self.attn_drop > 1e-15:
            alpha = nn.Dropout(self.attn_drop, deterministic=not training)(
                alpha)
        output = graph.send_ue_recv(feature, alpha, "mul", "sum")
        if self.concat:
            output = output.reshape(
                output.shape[:-2] + (self.num_heads * self.hidden_size,))
        else:
            output = output.mean(axis=-2)
        act = _resolve_act(self.activation)
        if act is not None:
            output = act(output)
        return output


class APPNP(nn.Module):
    """Personalized-PageRank propagation: k hops of normalized send_recv
    blended with the input (reference ``pgl/nn/conv.py:438-498``).

    ``self_loop`` rewriting rebuilds the edge set and is therefore a host-side
    transform in this framework — apply
    ``pgl_tpu.utils.transform.add_self_loops`` before ``tensor()``.
    """
    alpha: float = 0.2
    k_hop: int = 10
    self_loop: bool = False

    @nn.compact
    def __call__(self, graph, feature, norm=None):
        if self.self_loop:
            raise ValueError(
                "APPNP(self_loop=True): rebuild the graph on host with "
                "pgl_tpu.utils.transform.add_self_loops(replace=True) "
                "before tensor() — edge-set rewrites are not jittable")
        if norm is None:
            norm = GF.degree_norm(graph, dtype=feature.dtype)
        h0 = feature
        for _ in range(self.k_hop):
            feature = graph.send_recv(feature * norm, "sum") * norm
            feature = self.alpha * h0 + (1 - self.alpha) * feature
        return feature


def gpr_init_weights(init_method: str, alpha: float, k_hop: int,
                     gamma=None, seed: int = 0) -> np.ndarray:
    """The five GPR weight initialization schemes
    (reference ``pgl/nn/conv.py:555-576``)."""
    if init_method == "SGC":
        temp = np.zeros(k_hop + 1)
        temp[int(alpha)] = 1.0
    elif init_method == "PPR":
        temp = alpha * (1 - alpha) ** np.arange(k_hop + 1)
        temp[-1] = (1 - alpha) ** k_hop
    elif init_method == "NPPR":
        temp = alpha ** np.arange(k_hop + 1)
        temp = temp / np.sum(np.abs(temp))
    elif init_method == "Random":
        bound = np.sqrt(3 / (k_hop + 1))
        temp = np.random.default_rng(seed).uniform(-bound, bound, k_hop + 1)
        temp = temp / np.sum(np.abs(temp))
    elif init_method == "WS":
        temp = np.asarray(gamma)
    else:
        raise ValueError(f"unknown init_method {init_method}")
    return temp.astype(np.float32)


class GPRConv(nn.Module):
    """GPR-GNN: 2-layer MLP then k-hop propagation with learnable per-hop
    weights (reference ``pgl/nn/conv.py:500-643``)."""
    input_size: int
    hidden_size: int
    output_size: int
    drop: float = 0.5
    dprate: float = 0.5
    activation: Any = "relu"
    self_loop: bool = False
    alpha: float = 0.1
    k_hop: int = 10
    init_method: str = "PPR"
    gamma: Any = None

    @nn.compact
    def __call__(self, graph, feature, norm=None, training: bool = False):
        if self.self_loop:
            raise ValueError(
                "GPRConv(self_loop=True): apply add_self_loops on host "
                "before tensor()")
        temp0 = gpr_init_weights(self.init_method, self.alpha, self.k_hop,
                                 self.gamma)
        temp = self.param("temp", lambda key: jnp.asarray(temp0))
        drop1 = nn.Dropout(self.drop, deterministic=not training)
        act = _resolve_act(self.activation)
        feature = drop1(feature)
        feature = act(nn.Dense(self.hidden_size, name="linear_1")(feature))
        feature = drop1(feature)
        feature = nn.Dense(self.output_size, name="linear_2")(feature)
        if self.dprate > 0.0:
            feature = nn.Dropout(self.dprate,
                                 deterministic=not training)(feature)
        if norm is None:
            norm = GF.degree_norm(graph, dtype=feature.dtype)
        hidden = feature * temp[0]
        for k in range(self.k_hop):
            feature = graph.send_recv(feature * norm, "sum") * norm
            hidden = hidden + temp[k + 1] * feature
        return hidden


class GCNII(nn.Module):
    """GCNII: initial-residual + identity-map deep propagation
    (reference ``pgl/nn/conv.py:645-722``)."""
    hidden_size: int
    activation: Any = None
    lambda_l: float = 0.5
    alpha: float = 0.2
    k_hop: int = 10
    dropout: float = 0.6

    @nn.compact
    def __call__(self, graph, feature, norm=None, training: bool = False):
        if norm is None:
            norm = GF.degree_norm(graph, dtype=feature.dtype)
        h0 = feature
        act = _resolve_act(self.activation)
        drop = nn.Dropout(self.dropout, deterministic=not training)
        for i in range(self.k_hop):
            beta_i = float(np.log(1.0 * self.lambda_l / (i + 1) + 1))
            feature = drop(feature)
            feature = graph.send_recv(feature * norm, "sum") * norm
            feature = self.alpha * h0 + (1 - self.alpha) * feature
            transed = nn.Dense(self.hidden_size, name=f"mlp_{i}")(feature)
            feature = beta_i * transed + (1 - beta_i) * feature
            if act is not None:
                feature = act(feature)
        return feature


class TransformerConv(nn.Module):
    """UniMP TransformerConv: q/k/v per-edge attention with reduce_softmax,
    optional edge features, gated skip, layer norm
    (reference ``pgl/nn/conv.py:724-886``)."""
    input_size: int
    hidden_size: int
    num_heads: int = 4
    feat_drop: float = 0.6
    attn_drop: float = 0.6
    concat: bool = True
    skip_feat: bool = True
    gate: bool = False
    layer_norm: bool = True
    # "edge" = reference-exact per-edge dropout (per-edge kernels on
    # multigraphs); "cell" = expectation-equivalent per-(dst, src)-cell
    # dropout on the fast count-matrix path (see GATConv docstring)
    attn_drop_mode: str = "edge"
    activation: Any = "relu"

    @nn.compact
    def __call__(self, graph, feature, edge_feat=None,
                 training: bool = False):
        H, D = self.num_heads, self.hidden_size
        fdrop = nn.Dropout(self.feat_drop, deterministic=not training)
        adrop = nn.Dropout(self.attn_drop, deterministic=not training)
        if self.feat_drop > 1e-5:
            feature = fdrop(feature)
        # kept flat [..., H*D] so the layer works on [N, F] single-device
        # and [S, N_pad, F] halo-sharded inputs alike
        q = nn.Dense(H * D, name="q")(feature) / (D ** 0.5)
        k = nn.Dense(H * D, name="k")(feature)
        v = nn.Dense(H * D, name="v")(feature)
        if edge_feat is not None:
            if self.feat_drop > 1e-5:
                edge_feat = fdrop(edge_feat)
            if not hasattr(graph, "dot_attention"):
                edge_feat = edge_feat.reshape(-1, H, D)

        from ..ops.dispatch import use_fused_attention
        if hasattr(graph, "dot_attention"):
            # HaloGraph: per-shard flash dot-score attention over the
            # owned dst rows with one boundary-row all_to_all
            rate = float(self.attn_drop) if training else 0.0
            seed = _attn_drop_seed(self, rate)
            if edge_feat is None:
                output = graph.dot_attention(q, k, v, H, rate, seed)
            else:
                # per-edge features break the fused-kernel contract (its
                # k|v stream is node-indexed); compose in edge space:
                # ONE halo exchange of the k|v payload, the q gather is
                # shard-local, aggregation via recv_edge_values
                kv_e = graph.send_uv(jnp.concatenate([k, v], axis=-1),
                                     jnp.zeros_like(q[..., :1]), "add")
                q_e = graph.gather_dst_values(q)
                k_e = kv_e[..., :H * D] + edge_feat
                v_e = kv_e[..., H * D:2 * H * D] + edge_feat
                alpha = jnp.sum(
                    q_e.reshape(q_e.shape[:-1] + (H, D))
                    * k_e.reshape(k_e.shape[:-1] + (H, D)), axis=-1)
                alpha = GF.edge_softmax(graph, alpha)
                if self.attn_drop > 1e-15:
                    alpha = adrop(alpha)
                msg = (v_e.reshape(v_e.shape[:-1] + (H, D))
                       * alpha[..., None])
                output = graph.recv_edge_values(
                    msg.reshape(msg.shape[:-2] + (H * D,)))
            if not self.concat:
                output = output.reshape(
                    output.shape[:-1] + (H, D)).mean(axis=-2)
        elif (use_fused_attention(graph, graph.num_edges, False)
                and edge_feat is None and self.concat
                and (H * D) % 128 == 0):
            rate = float(self.attn_drop) if training else 0.0
            dedup_aux = (graph._dedup_attn_aux()
                         if hasattr(graph, "_dedup_attn_aux") else None)
            _check_drop_mode(self.attn_drop_mode)
            if dedup_aux is not None and rate > 0.0 \
                    and not dedup_aux[0].simple \
                    and self.attn_drop_mode != "cell":
                dedup_aux = None        # multigraph: per-edge kernels
            if dedup_aux is not None:
                # count-matrix pair attention (dot scores) — see
                # ops/pallas/dedup_attention.py; in-kernel per-cell
                # dropout is per-edge dropout on simple graphs
                from ..ops.pallas.dedup_attention import (
                    dedup_dot_attention)
                csc_d, red = dedup_aux
                seed = _attn_drop_seed(self, rate)
                output = dedup_dot_attention(q, k, v, csc_d, red, H, D, D,
                                             0.0, attn_drop=rate,
                                             drop_seed=seed)
            else:
                # fused SDDMM+softmax+aggregate Pallas kernel
                # (attention-prob dropout applied in-kernel when training)
                from ..ops.pallas.attention_kernels import (
                    fused_graph_attention)
                csc, csr, perm = graph._spmm_layouts[:3]
                seed = _attn_drop_seed(self, rate)
                output = fused_graph_attention(
                    q, k, v, csc, (csr, perm), H, 0.0,
                    dsh=D, dvh=D, attn_drop=rate, drop_seed=seed)
        else:
            q = q.reshape(-1, H, D)
            k = k.reshape(-1, H, D)
            v = v.reshape(-1, H, D)
            src, dst = graph.edges[:, 0], graph.edges[:, 1]
            k_e = jnp.take(k, src, axis=0)
            v_e = jnp.take(v, src, axis=0)
            q_e = jnp.take(q, dst, axis=0)
            if edge_feat is not None:
                k_e = k_e + edge_feat
                v_e = v_e + edge_feat
            alpha = jnp.sum(q_e * k_e, axis=-1)             # [E, H]
            alpha = GF.edge_softmax(graph, alpha)
            alpha = alpha.reshape(-1, H, 1)
            if self.attn_drop > 1e-15:
                alpha = adrop(alpha)
            msg = v_e * alpha
            msg = msg.reshape(-1, H * D) if self.concat else msg.mean(axis=1)
            from .. import math as gmath
            output = gmath.segment_sum(msg, dst,
                                       num_segments=graph.num_nodes)

        if self.skip_feat:
            skip = nn.Dense(H * D if self.concat else D,
                            name="skip_feat")(feature)
            if self.gate:
                g = jax.nn.sigmoid(nn.Dense(1, name="gate")(
                    jnp.concatenate([skip, output, skip - output], axis=-1)))
                output = g * skip + (1 - g) * output
            else:
                output = skip + output
        if self.layer_norm:
            output = nn.LayerNorm(name="ln")(output)
        act = _resolve_act(self.activation)
        if act is not None:
            output = act(output)
        return output


class GINConv(nn.Module):
    """GIN: (1+eps)·x + Σ neighbors through a 2-layer MLP with LayerNorm
    (reference ``pgl/nn/conv.py:888-958``)."""
    input_size: int
    output_size: int
    activation: Any = None
    init_eps: float = 0.0
    train_eps: bool = False

    @nn.compact
    def __call__(self, graph, feature):
        if self.train_eps:
            eps = self.param(
                "epsilon",
                lambda key: jnp.full((1, 1), self.init_eps, jnp.float32))
        else:
            eps = self.init_eps
        neigh = graph.send_recv(feature, "sum")
        output = neigh + feature * (eps + 1.0)
        output = nn.Dense(self.output_size, name="linear1")(output)
        output = nn.LayerNorm(name="layer_norm")(output)
        act = _resolve_act(self.activation)
        if act is not None:
            output = act(output)
        output = nn.Dense(self.output_size, name="linear2")(output)
        return output


class RGCNConv(nn.Module):
    """R-GCN: per-edge-type mean aggregation with basis-decomposed weights,
    summed over relations (reference ``pgl/nn/conv.py:961-1025``).

    ``graph`` is a :class:`pgl_tpu.HeterGraph` or a dict etype → Graph.
    """
    in_dim: int
    out_dim: int
    etypes: Sequence[str]
    num_bases: int = 0

    @nn.compact
    def __call__(self, graph, feat):
        num_rels = len(self.etypes)
        num_bases = self.num_bases
        if num_bases <= 0 or num_bases >= num_rels:
            num_bases = num_rels
        weight = self.param("weight", nn.initializers.xavier_uniform(),
                            (num_bases, self.in_dim, self.out_dim))
        if num_bases < num_rels:
            w_comp = self.param("w_comp", nn.initializers.xavier_uniform(),
                                (num_rels, num_bases))
            weight = jnp.einsum("rb,bio->rio", w_comp, weight)
        outputs = []
        for idx, etype in enumerate(self.etypes):
            h = feat @ weight[idx]
            h = graph[etype].send_recv(h, "mean")
            outputs.append(h)
        return sum(outputs)


class SGCConv(nn.Module):
    """SGC: k-hop normalized propagation then a single linear
    (reference ``pgl/nn/conv.py:1027-1101``).

    The reference caches the propagated features on the module; here the
    cache lives in the ``'cache'`` variable collection — initialize/apply
    with ``mutable=["cache"]`` to fill it, or precompute with
    :func:`sgc_precompute`.
    """
    input_size: int
    output_size: int
    k_hop: int = 2
    cached: bool = True
    activation: Any = None
    bias: bool = False

    @nn.compact
    def __call__(self, graph, feature):
        if self.cached:
            cache = self.variable("cache", "prop", lambda: None)
            if cache.value is None:
                cache.value = sgc_precompute(graph, feature, self.k_hop)
            feature = cache.value
        else:
            feature = sgc_precompute(graph, feature, self.k_hop)
        output = nn.Dense(self.output_size, use_bias=False,
                          name="linear")(feature)
        if self.bias:
            output = output + self.param("bias", nn.initializers.zeros,
                                         (self.output_size,))
        act = _resolve_act(self.activation)
        if act is not None:
            output = act(output)
        return output


def sgc_precompute(graph, feature, k_hop: int):
    norm = GF.degree_norm(graph, dtype=feature.dtype)
    for _ in range(k_hop):
        feature = graph.send_recv(feature * norm, "sum") * norm
    return feature


class SSGCConv(nn.Module):
    """SSGC: average of (1-α)-damped hop features plus α·x0
    (reference ``pgl/nn/conv.py:1104-1199``)."""
    input_size: int
    output_size: int
    k_hop: int = 16
    alpha: float = 0.05
    cached: bool = True
    activation: Any = None
    bias: bool = False

    @nn.compact
    def __call__(self, graph, feature):
        if self.cached:
            cache = self.variable("cache", "prop", lambda: None)
            if cache.value is None:
                cache.value = ssgc_precompute(graph, feature, self.k_hop,
                                              self.alpha)
            feature = cache.value
        else:
            feature = ssgc_precompute(graph, feature, self.k_hop, self.alpha)
        output = nn.Dense(self.output_size, use_bias=False,
                          name="linear")(feature)
        if self.bias:
            output = output + self.param("bias", nn.initializers.zeros,
                                         (self.output_size,))
        act = _resolve_act(self.activation)
        if act is not None:
            output = act(output)
        return output


def ssgc_precompute(graph, feature, k_hop: int, alpha: float):
    norm = GF.degree_norm(graph, dtype=feature.dtype)
    ori = feature
    acc = feature
    for _ in range(k_hop):
        feature = graph.send_recv(feature * norm, "sum") * norm
        feature = (1 - alpha) * feature
        acc = acc + feature
    return acc / k_hop + alpha * ori


class NGCFConv(nn.Module):
    """NGCF collaborative-filtering conv (reference
    ``pgl/nn/conv.py:1202-1250``)."""
    input_size: int
    output_size: int

    @nn.compact
    def __call__(self, graph, feature):
        norm = GF.degree_norm(graph, dtype=feature.dtype)
        neigh = graph.send_recv(feature, "sum")
        output = (neigh + feature) * norm
        output = (nn.Dense(self.output_size, name="linear")(output)
                  + nn.Dense(self.output_size, name="linear2")(
                      feature * output))
        return jax.nn.leaky_relu(output, negative_slope=0.2)


class LightGCNConv(nn.Module):
    """LightGCN: pure symmetric-normalized propagation, no parameters
    (reference ``pgl/nn/conv.py:1252-1284``)."""

    @nn.compact
    def __call__(self, graph, feature):
        norm = GF.degree_norm(graph, dtype=feature.dtype)
        return graph.send_recv(feature * norm, "sum") * norm


class FAConv(nn.Module):
    """FAGCN: tanh-gated signed attention over degree-normalized edges
    (reference ``pgl/nn/conv.py:1287-1341``)."""
    hidden_size: int
    drop: float = 0.5

    @nn.compact
    def __call__(self, graph, feature, training: bool = False):
        norm = GF.degree_norm(graph, dtype=feature.dtype)
        # The reference gathers both endpoints and applies one Dense to
        # [h_src | h_dst]. Dense is linear, so the per-edge gate splits
        # into node-side halves combined by the SDDMM primitive — no
        # per-edge gather, and the same composition runs on a HaloGraph:
        #   gate(h_s|h_d) = h_s·W[:D] + h_d·W[D:] + b
        gate = nn.Dense(1, name="gate")
        z = jnp.zeros_like(feature)
        b = gate(jnp.concatenate([z, z], axis=-1))           # bias only
        s_src = gate(jnp.concatenate([feature, z], axis=-1)) - b
        s_dst = gate(jnp.concatenate([z, feature], axis=-1))
        alpha = jnp.tanh(graph.send_uv(s_src, s_dst, "add"))
        alpha = alpha * graph.send_uv(norm, norm, "mul")
        alpha = nn.Dropout(self.drop, deterministic=not training)(alpha)
        return graph.send_ue_recv(feature, alpha, "mul", "sum")


class BernProp(nn.Module):
    """Bernstein-polynomial spectral propagation (BernNet; reference
    ``examples/bernnet/propagation.py:25-62``): learnable non-negative
    coefficients over the Bernstein basis of the normalized Laplacian,
    computed with (I+Â)^i / (I−Â)^j propagation chains."""
    k_hop: int = 10

    @nn.compact
    def __call__(self, graph, feature, norm=None):
        from scipy.special import comb
        K = self.k_hop
        temp = jax.nn.relu(self.param(
            "temp", lambda key: jnp.ones((K + 1,), jnp.float32)))
        if norm is None:
            norm = GF.degree_norm(graph, dtype=feature.dtype)

        def a_hat(x):                      # Â x (symmetric-normalized)
            return graph.send_recv(x * norm, "sum") * norm

        tmp = [feature]
        for _ in range(K):
            feature = feature + a_hat(feature)       # (I + Â)^i x
            tmp.append(feature)
        out = (comb(K, 0) / (2 ** K)) * temp[0] * tmp[K]
        for i in range(K):
            feature = tmp[K - i - 1]
            for _ in range(i + 1):                   # (I − Â)^(i+1)
                feature = feature - a_hat(feature)
            out = out + (comb(K, i + 1) / (2 ** K)) * temp[i + 1] * feature
        return out


class ChebProp(nn.Module):
    """Chebyshev-interpolated spectral propagation (ChebNetII; reference
    ``examples/chebnetii/propagation.py:25-64``): learnable values at the
    Chebyshev nodes, expanded into T_k(Â) terms via the three-term
    recurrence."""
    k_hop: int = 10

    @nn.compact
    def __call__(self, graph, feature, norm=None):
        import math as pymath
        K = self.k_hop
        temp = jax.nn.relu(self.param(
            "temp", lambda key: jnp.ones((K + 1,), jnp.float32)))
        # Chebyshev interpolation: coe[i] = 2/(K+1) Σ_j temp_j T_i(x_j)
        xs = [pymath.cos((K - j + 0.5) * pymath.pi / (K + 1))
              for j in range(K + 1)]      # j = K..0 order as the reference

        def cheby_val(i, x):
            return pymath.cos(i * pymath.acos(x))

        coes = []
        for i in range(K + 1):
            c = sum(temp[j] * cheby_val(i, xs[K - j]) for j in range(K + 1))
            coes.append(2.0 * c / (K + 1))
        if norm is None:
            norm = GF.degree_norm(graph, dtype=feature.dtype)

        def a_hat(x):
            return graph.send_recv(x * norm, "sum") * norm

        tx0 = feature
        tx1 = a_hat(feature)
        out = coes[0] / 2 * tx0 + coes[1] * tx1
        for i in range(2, K + 1):
            tx2 = 2 * a_hat(tx1) - tx0
            out = out + coes[i] * tx2
            tx0, tx1 = tx1, tx2
        return out
