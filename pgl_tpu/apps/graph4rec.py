"""Graph4Rec — config-driven recommendation-GNN toolkit.

Capability parity with ``apps/Graph4Rec`` (yaml presets in
``user_configs/``; walk-based models and ego-graph sage models over the
distributed graph engine — ``env_run/src/dist_cpu_train.py``,
``datasets/sampling.py:172-551``, ``models/model.py:35,159``).

One trainer, one config:

```yaml
model_type: walk_based            # or ego_sage
metapath: "u2i-i2u"               # walk_based
walk_len: 12
win_size: 3
neg_num: 5
samples: [5, 5]                   # ego_sage fan-out
embed_dim: 64
lr: 0.005
epochs: 10
batch_pairs: 1024
```

Graph source is either a local :class:`HeterGraph` or a
:class:`~pgl_tpu.distributed.DistGraphClient` (walks go through RPC).
"""

from __future__ import annotations

from typing import Optional, Union

import numpy as np

import jax
import jax.numpy as jnp
import optax

from ..sampling import (metapath_randomwalk, metapath_randomwalk_dist,
                        random_walk, node2vec_walk,
                        sample_neighbors_padded)
from ..native.graph_kernel import skip_gram_gen_pair
from ..utils.config import Config, load_config
from ..utils.logger import log

__all__ = ["Graph4RecTrainer", "PRESETS"]


# The reference ships yaml presets in ``user_configs/`` (deepwalk.yaml,
# metapath2vec.yaml, graphsage.yaml, lightgcn.yaml, ...); these are the
# same recipes as Config dicts — Graph4RecTrainer.from_preset(name) is the
# one-call equivalent of ``dist_cpu_train.py --config user_configs/X.yaml``.
PRESETS = {
    "deepwalk": dict(model_type="walk_based", walk_mode="deepwalk",
                     walk_len=24, win_size=5, neg_num=5, embed_dim=64,
                     lr=5e-3, epochs=10, batch_pairs=1024,
                     walks_per_node=4),
    "node2vec": dict(model_type="walk_based", walk_mode="node2vec",
                     p=2.0, q=0.5, walk_len=24, win_size=5, neg_num=5,
                     embed_dim=64, lr=5e-3, epochs=10, batch_pairs=1024,
                     walks_per_node=4),
    "metapath2vec": dict(model_type="walk_based", walk_mode="metapath",
                         metapath="u2i-i2u", walk_len=12, win_size=3,
                         neg_num=5, embed_dim=64, lr=5e-3, epochs=10,
                         batch_pairs=1024, walks_per_node=2),
    "graphsage": dict(model_type="ego_sage", samples=[5, 5],
                      metapath="u2i-i2u", walk_len=8, win_size=3,
                      neg_num=5, embed_dim=64, lr=5e-3, epochs=10,
                      batch_pairs=1024, walks_per_node=2),
    "lightgcn": dict(model_type="lightgcn", samples=[8],
                     metapath="u2i-i2u", walk_len=8, win_size=3,
                     neg_num=5, embed_dim=64, lr=5e-3, epochs=10,
                     batch_pairs=1024, walks_per_node=2),
    "gat": dict(model_type="gat", samples=[8], metapath="u2i-i2u",
                walk_len=8, win_size=3, neg_num=5, embed_dim=64, lr=5e-3,
                epochs=10, batch_pairs=1024, walks_per_node=2),
    "gin": dict(model_type="gin", samples=[8], metapath="u2i-i2u",
                walk_len=8, win_size=3, neg_num=5, embed_dim=64, lr=5e-3,
                epochs=10, batch_pairs=1024, walks_per_node=2),
    "gatne": dict(model_type="gatne", samples=[5], metapath="u2i-i2u",
                  walk_len=8, win_size=3, neg_num=5, embed_dim=64,
                  edge_dim=8, att_dim=8, lr=5e-3, epochs=10,
                  batch_pairs=1024, walks_per_node=2),
    "graphsage_with_features": dict(
        model_type="ego_sage", samples=[5, 5], metapath="u2i-i2u",
        walk_len=8, win_size=3, neg_num=5, embed_dim=64, lr=5e-3,
        epochs=10, batch_pairs=1024, walks_per_node=2, use_node_feat=True),
    "metapath2vec_with_features": dict(
        model_type="walk_based", walk_mode="metapath", metapath="u2i-i2u",
        walk_len=12, win_size=3, neg_num=5, embed_dim=64, lr=5e-3,
        epochs=10, batch_pairs=1024, walks_per_node=2, use_node_feat=True),
}


class Graph4RecTrainer:
    """Single-process trainer, or one trainer replica of the reference's
    N-trainer async-PS topology when ``ps_addresses`` is given
    (``apps/Graph4Rec/env_run/src/dist_cpu_train.py:51-66``): the id/ctx
    embedding tables live sharded on :class:`~pgl_tpu.distributed.ps`
    servers, the step pulls the batch's unique rows, differentiates with
    respect to the pulled rows only, and pushes sparse grads back
    asynchronously (server-side adagrad)."""

    def __init__(self, config, graph=None, client=None,
                 num_nodes: Optional[int] = None, seed: int = 0,
                 ps_addresses=None):
        self.cfg = config if isinstance(config, Config) \
            else load_config(config)
        if graph is None and client is None:
            raise ValueError("provide a HeterGraph or a DistGraphClient")
        self.graph = graph
        self.client = client
        self.num_nodes = num_nodes or (graph.num_nodes if graph else None)
        if self.num_nodes is None:
            raise ValueError("num_nodes required with a client source")
        dim = int(self.cfg.embed_dim or 64)
        self.ps = None
        if ps_addresses is not None:
            mtype0 = self.cfg.model_type or "walk_based"
            if mtype0 != "walk_based":
                raise ValueError(
                    "distributed PS training supports walk_based models "
                    f"(got model_type={mtype0!r}) — dense encoder weights "
                    "would need replica synchronization")
            if getattr(self.cfg, "use_node_feat", False):
                raise ValueError(
                    "distributed PS training does not support "
                    "use_node_feat yet: the feature projection is a "
                    "dense weight that would need replica "
                    "synchronization — run single-process, or drop "
                    "use_node_feat from the config")
            from ..distributed.ps import PSEmbedding
            lr = float(self.cfg.lr or 5e-3)
            self.ps = {
                "emb": PSEmbedding(ps_addresses, "emb", self.num_nodes,
                                   dim, lr=lr, init_scale=0.1,
                                   seed=seed),
                "ctx": PSEmbedding(ps_addresses, "ctx", self.num_nodes,
                                   dim, lr=lr, init_scale=1e-4,
                                   seed=seed + 1),
            }
            self.params = {}
        else:
            self.params = {
                "emb": jax.random.normal(jax.random.key(seed),
                                         (self.num_nodes, dim)) * 0.1,
                "ctx": jnp.zeros((self.num_nodes, dim)),
            }
        mtype = self.cfg.model_type or "walk_based"
        if mtype in ("ego_sage", "lightgcn", "gat", "gin"):
            if graph is None:
                raise ValueError("ego models need a local graph")
            etype = (self.cfg.sage_etype or
                     (graph.edge_types[0]
                      if getattr(graph, "edge_types", None) else None))
            base = graph[etype] if etype is not None else graph
            if base.num_edges >= 2 ** 31:
                raise ValueError("ego encoders store indptr as int32; "
                                 f"{base.num_edges} edges would wrap")
            idx = base.adj_dst_index
            self._indptr = jnp.asarray(np.asarray(idx.indptr), jnp.int32)
            self._sorted_v = jnp.asarray(np.asarray(idx.sorted_v), jnp.int32)
            k1, k2, k3, k4 = jax.random.split(jax.random.key(seed + 1), 4)
            if mtype in ("ego_sage",):
                self.params["w_self"] = jax.random.normal(k1,
                                                          (dim, dim)) * 0.1
                self.params["w_neigh"] = jax.random.normal(k2,
                                                           (dim, dim)) * 0.1
            elif mtype == "gat":
                # single-head additive attention over the sampled ego
                # (reference Graph4Rec models/layers.py GAT preset)
                self.params["w"] = jax.random.normal(k1, (dim, dim)) * 0.1
                self.params["a_l"] = jax.random.normal(k2, (dim,)) * 0.1
                self.params["a_r"] = jax.random.normal(k3, (dim,)) * 0.1
            elif mtype == "gin":
                self.params["gin_eps"] = jnp.zeros(())
                self.params["w1"] = jax.random.normal(k1, (dim, dim)) * 0.1
                self.params["b1"] = jnp.zeros(dim)
                self.params["w2"] = jax.random.normal(k2, (dim, dim)) * 0.1
                self.params["b2"] = jnp.zeros(dim)
        elif mtype == "gatne":
            # GATNE-T: shared base embedding + per-edge-type edge
            # embeddings aggregated from sampled neighbors, combined with
            # self-attention over edge types
            # (reference user_configs/gatne.yaml surface)
            if graph is None or not getattr(graph, "edge_types", None):
                raise ValueError("gatne needs a local HeterGraph")
            self._etype_csc = []
            for etype in graph.edge_types:
                if graph[etype].num_edges >= 2 ** 31:
                    raise ValueError(
                        f"gatne stores indptr as int32; {etype} has "
                        f"{graph[etype].num_edges} edges")
                idx = graph[etype].adj_dst_index
                self._etype_csc.append(
                    (jnp.asarray(np.asarray(idx.indptr), jnp.int32),
                     jnp.asarray(np.asarray(idx.sorted_v), jnp.int32)))
            R = len(graph.edge_types)
            de = int(self.cfg.edge_dim or 8)
            da = int(self.cfg.att_dim or 8)
            k1, k2, k3, k4 = jax.random.split(jax.random.key(seed + 1), 4)
            self.params["edge_emb"] = jax.random.normal(
                k1, (self.num_nodes, R, de)) * 0.1
            self.params["w_att"] = jax.random.normal(k2, (de, da)) * 0.1
            self.params["v_att"] = jax.random.normal(k3, (da,)) * 0.1
            self.params["w_out"] = jax.random.normal(k4, (de, dim)) * 0.1
        if bool(self.cfg.use_node_feat):
            feats = getattr(graph, "node_feat", None) or {}
            name = self.cfg.feat_name or "h"
            if name not in feats:
                raise ValueError(
                    f"use_node_feat: graph has no node_feat[{name!r}]")
            self._feat = jnp.asarray(np.asarray(feats[name], np.float32))
            self.params["w_feat"] = jax.random.normal(
                jax.random.key(seed + 9),
                (self._feat.shape[1], dim)) * 0.1
        else:
            self._feat = None
        if self.ps is None:
            self.opt = optax.adam(float(self.cfg.lr or 5e-3))
            self.opt_state = self.opt.init(self.params)
            self._jit_step = jax.jit(self._make_step())
        else:
            self._jit_step = jax.jit(self._make_ps_step())
        self._seed = seed

    @classmethod
    def from_preset(cls, name: str, graph=None, client=None,
                    num_nodes: Optional[int] = None, seed: int = 0,
                    ps_addresses=None, **overrides) -> "Graph4RecTrainer":
        """Instantiate one of the reference's ``user_configs`` recipes by
        name (see :data:`PRESETS`); ``overrides`` patch individual keys."""
        if name not in PRESETS:
            raise ValueError(f"unknown preset {name!r}; "
                             f"have {sorted(PRESETS)}")
        cfg = dict(PRESETS[name])
        cfg.update(overrides)
        return cls(Config(cfg), graph=graph, client=client,
                   num_nodes=num_nodes, seed=seed,
                   ps_addresses=ps_addresses)

    # -- model --------------------------------------------------------------

    def _node_input(self, params, ids):
        """Base id embedding, plus projected side features when the
        ``*_with_features`` presets set ``use_node_feat``
        (reference graphsage_with_features.yaml / metapath2vec_with_
        features.yaml)."""
        h = params["emb"][ids]
        if self._feat is not None:
            h = h + self._feat[ids] @ params["w_feat"]
        return h

    def _encode(self, params, ids, key):
        h = self._node_input(params, ids)
        mtype = self.cfg.model_type or "walk_based"
        if mtype == "walk_based":
            return h
        if mtype == "gatne":
            # per-etype edge embeddings aggregated from that etype's
            # sampled neighbors, attention-combined across etypes
            k = int((self.cfg.samples or [5])[0])
            us = []
            for r, (indptr, sorted_v) in enumerate(self._etype_csc):
                key, sub = jax.random.split(key)
                neigh, mask = sample_neighbors_padded(indptr, sorted_v,
                                                      ids, k, sub)
                ne = params["edge_emb"][neigh, r] * mask[..., None]
                us.append(ne.sum(1)
                          / jnp.maximum(mask.sum(-1, keepdims=True), 1.0))
            U = jnp.stack(us, axis=1)                      # [B, R, de]
            att = jnp.einsum("bra,a->br",
                             jnp.tanh(jnp.einsum("brd,da->bra", U,
                                                 params["w_att"])),
                             params["v_att"])
            att = jax.nn.softmax(att, axis=-1)             # [B, R]
            m = jnp.einsum("br,brd->bd", att, U)
            return h + m @ params["w_out"]
        k = int((self.cfg.samples or [5])[0])
        neigh, mask = sample_neighbors_padded(
            self._indptr, self._sorted_v, ids, k, key)
        n_in = self._node_input(params, neigh.reshape(-1)).reshape(
            neigh.shape + (-1,))
        if mtype == "gat":
            hw = h @ params["w"]                            # [B, d]
            nw = n_in @ params["w"]                         # [B, k, d]
            score = jax.nn.leaky_relu(
                (hw @ params["a_l"])[:, None] + nw @ params["a_r"],
                negative_slope=0.2)                         # [B, k]
            score = jnp.where(mask, score, -1e9)
            alpha = jax.nn.softmax(score, axis=-1) \
                * mask.any(-1, keepdims=True)
            return jax.nn.elu(hw + jnp.einsum("bk,bkd->bd", alpha, nw))
        nh = n_in * mask[..., None]
        agg_sum = nh.sum(1)
        agg = agg_sum / jnp.maximum(mask.sum(-1, keepdims=True), 1.0)
        if mtype == "lightgcn":
            # parameter-free mean of self and aggregated neighbors
            # (reference models/layers.py LightGCN propagation)
            return (h + agg) * 0.5
        if mtype == "gin":
            z = (1.0 + params["gin_eps"]) * h + agg_sum
            z = jax.nn.relu(z @ params["w1"] + params["b1"])
            return z @ params["w2"] + params["b2"]
        return jax.nn.relu(h @ params["w_self"] + agg @ params["w_neigh"])

    def _make_step(self):
        neg_num = int(self.cfg.neg_num or 5)
        from .common import inbatch_skipgram_loss

        def step(params, opt_state, src, dst, valid, key):
            def loss_fn(p):
                k1, k2 = jax.random.split(key)
                h = self._encode(p, src, k1)
                return inbatch_skipgram_loss(h, p["ctx"][dst], k2,
                                             neg_num, valid)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = self.opt.update(grads, opt_state)
            return optax.apply_updates(params, updates), opt_state, loss

        return step

    def _make_ps_step(self):
        """Distributed step: differentiate w.r.t. the PULLED unique rows
        (inputs), return their grads for the async push — no optimizer
        state here; adagrad lives on the shard servers."""
        neg_num = int(self.cfg.neg_num or 5)
        from .common import inbatch_skipgram_loss

        def step(emb_rows, ctx_rows, inv_src, inv_dst, valid, key):
            def loss_fn(er, cr):
                h = er[inv_src]
                c = cr[inv_dst]
                return inbatch_skipgram_loss(h, c, key, neg_num, valid)

            loss, (g_er, g_cr) = jax.value_and_grad(
                loss_fn, argnums=(0, 1))(emb_rows, ctx_rows)
            return loss, g_er, g_cr

        return step

    # -- data ---------------------------------------------------------------

    def _walks(self, starts, epoch: int):
        mode = self.cfg.walk_mode or "metapath"
        walk_len = int(self.cfg.walk_len or 12)
        seed = self._seed + epoch
        if self.client is not None:
            if mode != "metapath" or not self.cfg.metapath:
                raise ValueError(
                    "walks over a DistGraphClient are metapath-driven "
                    f"(walk_mode={mode!r}, metapath="
                    f"{self.cfg.metapath!r}); set walk_mode: metapath "
                    "and a metapath in the config")
            return metapath_randomwalk_dist(self.client, starts,
                                            self.cfg.metapath, walk_len,
                                            seed=seed)
        g = self.graph
        if mode == "deepwalk":
            base = g[g.edge_types[0]] if getattr(g, "edge_types", None) \
                else g
            return random_walk(base, starts, walk_len, seed=seed)
        if mode == "node2vec":
            base = g[g.edge_types[0]] if getattr(g, "edge_types", None) \
                else g
            return node2vec_walk(base, starts, walk_len,
                                 p=float(self.cfg.p or 1.0),
                                 q=float(self.cfg.q or 1.0), seed=seed)
        if not getattr(g, "edge_types", None):
            # homogeneous Graph: metapaths don't apply — deepwalk
            return random_walk(g, starts, walk_len, seed=seed)
        return metapath_randomwalk(g, starts, self.cfg.metapath, walk_len,
                                   seed=seed)

    def _start_nodes(self):
        mode = self.cfg.walk_mode or "metapath"
        if mode != "metapath" and self.graph is not None:
            # deepwalk/node2vec start from every node — a typed graph
            # without a metapath previously derived first_node_type
            # 'None' and silently trained zero steps
            if not self.cfg.first_node_type:
                return np.arange(self.num_nodes)
        first = self.cfg.first_node_type
        if first is None:
            if not self.cfg.metapath:
                raise ValueError(
                    "need first_node_type or a metapath to pick walk "
                    "start nodes on a typed graph")
            first = str(self.cfg.metapath).split("-")[0].split("2")[0]
        if self.graph is not None and \
                getattr(self.graph, "node_types", None) is not None:
            return self.graph.nodes_by_type(first)
        if self.client is not None:
            return np.asarray(self.client.random_sample_nodes(
                node_type=first, size=int(self.cfg.walk_nodes or 512)))
        return np.arange(self.num_nodes)

    # -- training -----------------------------------------------------------

    def train(self, epochs: Optional[int] = None) -> float:
        epochs = epochs or int(self.cfg.epochs or 10)
        walks_per_node = int(self.cfg.walks_per_node or 2)
        win = int(self.cfg.win_size or 3)
        bp = int(self.cfg.batch_pairs or 1024)
        key = jax.random.key(self._seed + 17)
        last = 0.0
        for epoch in range(epochs):
            starts = np.tile(self._start_nodes(), walks_per_node)
            walks = self._walks(starts, epoch)
            src, dst = skip_gram_gen_pair(walks, win,
                                          seed=self._seed + epoch)
            total, steps = 0.0, 0
            for lo in range(0, max(len(src), 1), bp):
                bs, bd = src[lo:lo + bp], dst[lo:lo + bp]
                if len(bs) == 0:
                    break
                valid = np.ones(len(bs), np.float32)
                if len(bs) < bp:   # zero-pad the tail (static shapes);
                    pad = bp - len(bs)   # the mask keeps it out of the loss
                    bs = np.pad(bs, (0, pad))
                    bd = np.pad(bd, (0, pad))
                    valid = np.pad(valid, (0, pad))
                key, sub = jax.random.split(key)
                if self.ps is not None:
                    u_src, inv_src = np.unique(bs, return_inverse=True)
                    u_dst, inv_dst = np.unique(bd, return_inverse=True)
                    # pad unique tables to pow2 buckets: one compile
                    nsp = max(1 << int(np.ceil(np.log2(max(len(u_src),
                                                           1)))), 64)
                    ndp = max(1 << int(np.ceil(np.log2(max(len(u_dst),
                                                           1)))), 64)
                    er = np.zeros((nsp, self.ps["emb"].dim), np.float32)
                    er[:len(u_src)] = self.ps["emb"].pull(u_src)
                    cr = np.zeros((ndp, self.ps["ctx"].dim), np.float32)
                    cr[:len(u_dst)] = self.ps["ctx"].pull(u_dst)
                    loss, g_er, g_cr = self._jit_step(
                        jnp.asarray(er), jnp.asarray(cr),
                        jnp.asarray(inv_src.astype(np.int32)),
                        jnp.asarray(inv_dst.astype(np.int32)),
                        jnp.asarray(valid), sub)
                    self.ps["emb"].push(u_src,
                                        np.asarray(g_er)[:len(u_src)])
                    self.ps["ctx"].push(u_dst,
                                        np.asarray(g_cr)[:len(u_dst)])
                else:
                    self.params, self.opt_state, loss = self._jit_step(
                        self.params, self.opt_state, jnp.asarray(bs),
                        jnp.asarray(bd), jnp.asarray(valid), sub)
                total += float(loss)
                steps += 1
            last = total / max(steps, 1)
            log.info("graph4rec epoch %d: loss %.4f (%d steps)", epoch,
                     last, steps)
        return last

    def embeddings(self) -> np.ndarray:
        if self.ps is not None:
            self.ps["emb"].flush()
            return self.ps["emb"].dump()
        return np.asarray(self.params["emb"])
