"""Unsupervised large-graph representation engine — the PGLBox-analog.

Capability parity with ``apps/PGLBox`` (pass-based training where the next
pass's walks/samples are generated while the current pass trains —
``src/dataset.py:199-282`` preload threads + semaphores; id-embedding +
GNN encoder with in-batch shuffled negatives — ``src/models/gnn_model.py:
122-161``; metapath walk generation on the graph engine — ``src/graph.py``).

TPU-native shape: walks/pairs are produced by the C++ host kernels in a
background thread (double-buffered passes), the device trains an embedding
table (+ optional neighbor-aggregation encoder via the padded device
sampler) with a skip-gram/contrastive objective. Scales by sharding the
embedding table over the mesh (``parallel.ShardedEmbedding``).
"""

from __future__ import annotations

import queue as queue_mod
import threading
from typing import Callable, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp
import optax

from ..sampling import random_walk, sample_neighbors_padded
from ..native.graph_kernel import skip_gram_gen_pair

__all__ = ["UnsupervisedGraphTrainer"]


class _PassGenerator:
    """Background producer of (src, dst) positive-pair passes (the preload
    thread + semaphore design of PGLBox's BaseDataset)."""

    def __init__(self, graph, walk_len: int, win_size: int,
                 batch_nodes: int, max_passes_ahead: int = 1):
        self.graph = graph
        self.walk_len = walk_len
        self.win_size = win_size
        self.batch_nodes = batch_nodes
        self._q = queue_mod.Queue(maxsize=max_passes_ahead)
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None

    def _produce(self, epochs: int, seed: int):
        # finally-sentinel: if walk/pair generation raises, the consumer
        # must see the end marker instead of blocking on get() forever
        try:
            for epoch in range(epochs):
                for i, nodes in enumerate(self.graph.node_batch_iter(
                        self.batch_nodes, seed=seed + epoch)):
                    if self._stop.is_set():
                        return
                    s = seed * 9973 + epoch * 131 + i
                    walks = random_walk(self.graph, nodes, self.walk_len,
                                        seed=s)
                    src, dst = skip_gram_gen_pair(walks, self.win_size,
                                                  seed=s)
                    self._q.put((src, dst))
        except BaseException:
            import traceback
            traceback.print_exc()
            raise
        finally:
            self._q.put(None)

    def start(self, epochs: int, seed: int = 0):
        self._thread = threading.Thread(
            target=self._produce, args=(epochs, seed), daemon=True)
        self._thread.start()
        return self

    def __iter__(self):
        while True:
            item = self._q.get()
            if item is None:
                return
            yield item

    def stop(self):
        self._stop.set()


class UnsupervisedGraphTrainer:
    """
    Args:
      graph: host (numpy) Graph.
      embed_dim: embedding width.
      neighbor_samples: if set (e.g. 5), adds a mean-aggregation encoder over
        that many sampled neighbors (PGLBox 'sage' layer analog); None =
        pure id embedding (deepwalk-style).
      neg_num: in-batch negatives per positive.
      pair_batch: pairs per train step (static shape).
    """

    def __init__(self, graph, embed_dim: int = 64,
                 neighbor_samples: Optional[int] = None, neg_num: int = 5,
                 pair_batch: int = 4096, lr: float = 5e-3, seed: int = 0):
        self.graph = graph.numpy() if graph.is_tensor else graph
        self.embed_dim = embed_dim
        self.neg_num = neg_num
        self.pair_batch = pair_batch
        self.neighbor_samples = neighbor_samples
        N = self.graph.num_nodes
        key = jax.random.key(seed)
        self.params = {
            "emb": jax.random.normal(key, (N, embed_dim)) * 0.1,
            "ctx": jnp.zeros((N, embed_dim)),
        }
        if neighbor_samples:
            idx = self.graph.adj_dst_index
            self._indptr = jnp.asarray(np.asarray(idx.indptr),
                                       dtype=jnp.int32)
            self._sorted_v = jnp.asarray(np.asarray(idx.sorted_v),
                                         dtype=jnp.int32)
            self.params["w_self"] = jax.random.normal(
                jax.random.key(seed + 1), (embed_dim, embed_dim)) * 0.1
            self.params["w_neigh"] = jax.random.normal(
                jax.random.key(seed + 2), (embed_dim, embed_dim)) * 0.1
        self.opt = optax.adam(lr)
        self.opt_state = self.opt.init(self.params)
        self._step = jax.jit(self._make_step())

    def _encode(self, params, ids, key):
        h = params["emb"][ids]
        if not self.neighbor_samples:
            return h
        neigh, mask = sample_neighbors_padded(
            self._indptr, self._sorted_v, ids, self.neighbor_samples, key)
        nh = params["emb"][neigh] * mask[..., None]
        denom = jnp.maximum(mask.sum(-1, keepdims=True), 1.0)
        agg = nh.sum(1) / denom
        return jax.nn.relu(h @ params["w_self"] + agg @ params["w_neigh"])

    def _make_step(self):
        from .common import inbatch_skipgram_loss

        def step(params, opt_state, src, dst, valid, key):
            def loss_fn(p):
                k1, k2 = jax.random.split(key)
                h = self._encode(p, src, k1)
                return inbatch_skipgram_loss(h, p["ctx"][dst], k2,
                                             self.neg_num, valid)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = self.opt.update(grads, opt_state)
            return optax.apply_updates(params, updates), opt_state, loss

        return step

    def train(self, epochs: int = 5, walk_len: int = 20, win_size: int = 5,
              batch_nodes: int = 512, seed: int = 0,
              log_every: int = 0) -> float:
        """Run pass-based training; returns final mean loss per pass."""
        gen = _PassGenerator(self.graph, walk_len, win_size,
                             batch_nodes).start(epochs, seed)
        key = jax.random.key(seed + 7)
        last = 0.0
        for pass_id, (src, dst) in enumerate(gen):
            total, steps = 0.0, 0
            bp = self.pair_batch
            for lo in range(0, max(len(src), 1), bp):
                bs, bd = src[lo:lo + bp], dst[lo:lo + bp]
                if len(bs) == 0:
                    break
                valid = np.ones(len(bs), np.float32)
                if len(bs) < bp:   # masked tail — small passes previously
                    pad = bp - len(bs)   # trained zero steps
                    bs = np.pad(bs, (0, pad))
                    bd = np.pad(bd, (0, pad))
                    valid = np.pad(valid, (0, pad))
                key, sub = jax.random.split(key)
                self.params, self.opt_state, loss = self._step(
                    self.params, self.opt_state, jnp.asarray(bs),
                    jnp.asarray(bd), jnp.asarray(valid), sub)
                total += float(loss)
                steps += 1
            last = total / max(steps, 1)
            if log_every and pass_id % log_every == 0:
                from ..utils.logger import log
                log.info("pass %d: loss %.4f (%d steps)", pass_id, last,
                         steps)
        return last

    def embeddings(self) -> np.ndarray:
        return np.asarray(self.params["emb"])
