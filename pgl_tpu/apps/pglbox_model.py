"""PGLBox model assembly — the TPU-native analog of the reference's
yaml-configured GNN model stack (``apps/PGLBox/src/models/gnn_model.py:39``,
``auto_heter_gnn.py:68``, ``layers.py:25-280``).

The reference builds a static Paddle program per config: sparse id + slot
embeddings, an ``AutoHeterGNN`` (per-edge-type relation layers + feature
interaction + heterogeneous residual) over ragged subgraph holders, and an
in-batch ``shuffle_batch`` negative-sampling loss.

TPU-native design: ragged per-pass subgraphs become the fixed-shape padded
ego blocks of :class:`~pgl_tpu.sampling.HeteroNeighborSampler`, so the whole
model — embedding lookups, L hetero layers, interaction, residual, loss —
jit-compiles into one step. Per-etype relation layers operate on
``[M, k, D]`` neighbor blocks instead of edge lists; the etype split is the
block structure itself (the reference slices ``split_edges`` per etype,
``auto_heter_gnn.py:144-152``).

Config keys mirror the reference yaml surface: ``emb_size``, ``slots``,
``samples``, ``sage_layer_type`` (sage_mean/sage_bow/sage_max/gin/gat/
lightgcn), ``sage_act``, ``sage_alpha`` (residual), ``interact_mode``
(sum/gatne), ``softsign``, ``neg_num``.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp
import flax.linen as nn

__all__ = ["RelationLayer", "FeatureInteraction", "AutoHeterEgoGNN",
           "PGLBoxGNNModel", "inbatch_negative_loss"]

LAYER_TYPES = ("sage_mean", "sage_bow", "sage_max", "gin", "gat",
               "lightgcn")


def _act(name):
    if name in (None, "", "none"):
        return lambda x: x
    return getattr(jax.nn, name)


def _l2(h):
    return h / jnp.maximum(jnp.linalg.norm(h, axis=-1, keepdims=True),
                           1e-12)


class RelationLayer(nn.Module):
    """One per-edge-type conv over a padded ego block
    (reference ``apps/PGLBox/src/models/layers.py``: GraphSAGEMean ``:57``,
    Bow ``:81``, Max ``:101``, GIN ``:25``, GAT ``:123``, LightGCN)."""
    kind: str
    hidden: int
    act: Optional[str] = "relu"

    @nn.compact
    def __call__(self, h_self, h_neigh, mask):
        """h_self [M, D], h_neigh [M, k, D], mask [M, k] → [M, D]."""
        act = _act(self.act)
        m = mask[..., None].astype(h_self.dtype)
        denom = jnp.maximum(m.sum(1), 1.0)
        mean_n = (h_neigh * m).sum(1) / denom
        if self.kind == "sage_mean":
            out = nn.Dense(self.hidden, name="lin")(
                jnp.concatenate([h_self, mean_n], -1))
            return _l2(act(out))
        if self.kind == "sage_bow":
            return _l2(h_self + mean_n)
        if self.kind == "sage_max":
            neg_inf = jnp.finfo(h_self.dtype).min
            max_n = jnp.where(m > 0, h_neigh, neg_inf).max(1)
            max_n = jnp.where(mask.any(-1, keepdims=True), max_n, 0.0)
            out = nn.Dense(self.hidden, name="lin")(
                jnp.concatenate([h_self, max_n], -1))
            return _l2(act(out))
        if self.kind == "gin":
            sum_n = (h_neigh * m).sum(1)
            out = act(nn.Dense(self.hidden, name="lin")(h_self + sum_n))
            return out + h_self
        if self.kind == "gat":
            w = nn.Dense(self.hidden, use_bias=False, name="w")
            hw, nw = w(h_self), w(h_neigh)
            a_l = nn.Dense(1, use_bias=False, name="a_l")
            a_r = nn.Dense(1, use_bias=False, name="a_r")
            score = jax.nn.leaky_relu(
                a_l(hw) + a_r(nw)[..., 0], negative_slope=0.2)
            score = jnp.where(mask, score, -1e9)
            alpha = jax.nn.softmax(score, -1) * mask.any(-1, keepdims=True)
            return act(hw + jnp.einsum("mk,mkd->md", alpha, nw))
        if self.kind == "lightgcn":
            return (h_self + mean_n) * 0.5
        raise ValueError(f"unknown relation layer {self.kind!r}; "
                         f"choose from {LAYER_TYPES}")


class FeatureInteraction(nn.Module):
    """Combine per-etype outputs: plain sum or GATNE-style attention
    (reference ``auto_heter_gnn.py:28-54``)."""
    mode: str
    hidden: int

    @nn.compact
    def __call__(self, feature_list: List[jnp.ndarray]):
        if len(feature_list) == 1:
            return feature_list[0]
        if self.mode == "gatne":
            U = jnp.stack(feature_list, axis=1)          # [M, R, D]
            scores = nn.Dense(1, name="lin2")(
                jnp.tanh(nn.Dense(self.hidden, use_bias=False,
                                  name="lin1")(U)))[..., 0]
            alpha = jax.nn.softmax(scores, -1)           # [M, R]
            return jnp.einsum("mr,mrd->md", alpha, U)
        return sum(feature_list)


class AutoHeterEgoGNN(nn.Module):
    """L hetero layers over HeteroNeighborSampler ego blocks
    (reference ``AutoHeterGNN.forward``, ``auto_heter_gnn.py:112-170``):
    per-etype relation layer → interaction → ``alpha``-residual with the
    *initial* feature (the heter residual, ``:161-165``)."""
    etypes: Sequence[str]
    num_layers: int
    hidden: int
    layer_type: str = "sage_mean"
    act: Optional[str] = "relu"
    alpha_residual: float = 0.9
    interact_mode: str = "sum"

    @nn.compact
    def __call__(self, embed_fn, sampled, final_frontier):
        """``sampled``: HeteroNeighborSampler output (deepest-first list of
        ``(frontier, {etype: (neigh [M,k], mask)})``); ``final_frontier``
        the deepest node array. Returns [B, D] for the seeds."""
        entries = sampled[::-1]            # shallow-first
        L = len(entries)
        if L != self.num_layers:
            raise ValueError(f"sampled has {L} blocks, model expects "
                             f"{self.num_layers}")
        R = len(self.etypes)
        interact = (self.interact_mode if self.layer_type != "gatne"
                    else "gatne")
        # initial features per depth; depth i+1 array = concat(frontier_i,
        # per-etype neighbor blocks) by HeteroNeighborSampler construction
        hs = [embed_fn(f) for f, _ in entries] + [embed_fn(final_frontier)]
        h0s = list(hs)
        for l in range(self.num_layers):
            act = self.act if l < self.num_layers - 1 else None
            layers_r = [RelationLayer(self.layer_type, self.hidden, act,
                                      name=f"rel_{l}_{e}")
                        for e in self.etypes]
            inter = FeatureInteraction(interact, self.hidden,
                                       name=f"interact_{l}")
            nxt = []
            for i in range(L - l):
                frontier, per_etype = entries[i]
                n_i = frontier.shape[0]
                arr = hs[i + 1]
                h_self = arr[:n_i]
                outs, off = [], n_i
                for r, etype in enumerate(self.etypes):
                    neigh, mask = per_etype[etype]
                    k = neigh.shape[1]
                    blk = arr[off:off + n_i * k].reshape(n_i, k, -1)
                    off += n_i * k
                    outs.append(layers_r[r](h_self, blk, mask))
                f = inter(outs)
                # heterogeneous residual with the initial embedding
                f = (h0s[i] * self.alpha_residual
                     + f * (1.0 - self.alpha_residual))
                nxt.append(f)
            hs = nxt
        return hs[0]


class PGLBoxGNNModel(nn.Module):
    """id + slot sparse embeddings → softsign → AutoHeterEgoGNN
    (reference ``gnn_model.py:119-152``).

    ``slot_tables``: dict slot name → [N] int array mapping each node to
    its discrete slot value (the reference's per-slot feature holders);
    per-slot embedding tables are learned and summed into the id
    embedding (``model_util.get_sparse_embedding`` + ``paddle.add_n``).
    """
    num_nodes: int
    emb_size: int
    etypes: Sequence[str]
    num_layers: int
    slot_sizes: Optional[Dict[str, int]] = None
    layer_type: str = "sage_mean"
    act: Optional[str] = "relu"
    alpha_residual: float = 0.9
    interact_mode: str = "sum"
    softsign: bool = False

    @nn.compact
    def __call__(self, slot_tables, sampled, final_frontier):
        id_emb = self.param(
            "id_emb", nn.initializers.normal(0.1),
            (self.num_nodes, self.emb_size))
        slot_embs = {
            name: self.param(f"slot_{name}",
                             nn.initializers.normal(0.1),
                             (size, self.emb_size))
            for name, size in (self.slot_sizes or {}).items()}

        def embed(ids):
            h = id_emb[ids]
            for name, table in slot_embs.items():
                h = h + table[slot_tables[name][ids]]
            if self.softsign:
                h = jax.nn.soft_sign(h)
            return h

        gnn = AutoHeterEgoGNN(
            etypes=self.etypes, num_layers=self.num_layers,
            hidden=self.emb_size, layer_type=self.layer_type, act=self.act,
            alpha_residual=self.alpha_residual,
            interact_mode=self.interact_mode, name="gnn")
        return gnn(embed, sampled, final_frontier)


def inbatch_negative_loss(src_emb, dst_emb, key, neg_num: int = 5):
    """The reference's ``shuffle_batch`` in-batch negative loss
    (``gnn_model.py:155-163`` + nce loss): logits of src against its
    positive dst and ``neg_num`` batch-shuffled dsts, CE with the positive
    at index 0."""
    B = src_emb.shape[0]
    negs = []
    for i in range(neg_num):
        key, sub = jax.random.split(key)
        negs.append(dst_emb[jax.random.permutation(sub, B)])
    cands = jnp.stack([dst_emb] + negs, axis=1)          # [B, 1+neg, D]
    logits = jnp.einsum("bd,bkd->bk", src_emb, cands)
    labels = jnp.zeros((B,), jnp.int32)
    import optax
    return optax.softmax_cross_entropy_with_integer_labels(
        logits, labels).mean()
