"""DeepWalk / node2vec skip-gram embedding training (reference:
``examples/deepwalk/``, ``examples/node2vec/``): C++ host kernels generate
walks and skip-gram pairs in Dataloader workers, the device trains a
negative-sampling skip-gram objective over an embedding table.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np

from pgl_tpu.utils.platform import select_platform

select_platform()

import jax
import jax.numpy as jnp
import optax

from pgl_tpu.datasets import community_graph
from pgl_tpu.sampling import random_walk, node2vec_walk
from pgl_tpu.native.graph_kernel import skip_gram_gen_pair
from pgl_tpu.utils.data import StreamDataset, Dataloader


class WalkPairDataset(StreamDataset):
    def __init__(self, graph, walk_len, win_size, batch_pairs, p=1.0, q=1.0,
                 epoch_seed=0):
        self.graph = graph
        self.walk_len = walk_len
        self.win_size = win_size
        self.batch_pairs = batch_pairs
        self.p, self.q = p, q
        self.epoch_seed = epoch_seed

    def __iter__(self):
        batches = list(self.graph.node_batch_iter(256,
                                                  seed=self.epoch_seed))
        for i, nodes in enumerate(self._shard_iter(batches)):
            seed = self.epoch_seed * 131 + i
            if self.p == 1.0 and self.q == 1.0:
                walks = random_walk(self.graph, nodes, self.walk_len,
                                    seed=seed)
            else:
                walks = node2vec_walk(self.graph, nodes, self.walk_len,
                                      self.p, self.q, seed=seed)
            src, dst = skip_gram_gen_pair(walks, self.win_size, seed=seed)
            for lo in range(0, len(src) - self.batch_pairs + 1,
                            self.batch_pairs):
                yield (src[lo:lo + self.batch_pairs],
                       dst[lo:lo + self.batch_pairs])


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--epochs", type=int, default=10)
    parser.add_argument("--embed-dim", type=int, default=64)
    parser.add_argument("--walk-len", type=int, default=20)
    parser.add_argument("--win-size", type=int, default=5)
    parser.add_argument("--neg-num", type=int, default=5)
    parser.add_argument("--batch-pairs", type=int, default=4096)
    parser.add_argument("--p", type=float, default=1.0)
    parser.add_argument("--q", type=float, default=1.0)
    parser.add_argument("--num-workers", type=int, default=2)
    args = parser.parse_args()

    graph, labels = community_graph(num_nodes=2000, num_classes=4,
                                    feat_dim=1, avg_degree=10, seed=0)
    N = graph.num_nodes

    params = {
        "emb": jax.random.normal(jax.random.key(0),
                                 (N, args.embed_dim)) * 0.1,
        "ctx": jnp.zeros((N, args.embed_dim)),
    }
    opt = optax.adam(5e-3)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, src, dst, neg, key):
        def loss_fn(p):
            h = p["emb"][src]
            pos = jnp.sum(h * p["ctx"][dst], -1)
            negs = jnp.einsum("bd,bkd->bk", h, p["ctx"][neg])
            return (-jax.nn.log_sigmoid(pos).mean()
                    - jax.nn.log_sigmoid(-negs).mean())

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    key = jax.random.key(1)
    for epoch in range(args.epochs):
        ds = WalkPairDataset(graph, args.walk_len, args.win_size,
                             args.batch_pairs, args.p, args.q, epoch)
        loader = Dataloader(ds, batch_size=1,
                            num_workers=args.num_workers,
                            collate_fn=lambda b: b[0])
        t0, steps, total = time.time(), 0, 0.0
        for src, dst in loader:
            key, k1, k2 = jax.random.split(key, 3)
            neg = jax.random.randint(k1, (len(src), args.neg_num), 0, N)
            params, opt_state, loss = step(
                params, opt_state, jnp.asarray(src), jnp.asarray(dst),
                neg, k2)
            steps += 1
            total += float(loss)
        print(f"epoch {epoch}: loss {total/max(steps,1):.4f} "
              f"({steps} steps, {time.time()-t0:.1f}s)")

    # quality check: 1-NN label agreement in embedding space
    emb = np.asarray(params["emb"])
    emb = emb / (np.linalg.norm(emb, axis=1, keepdims=True) + 1e-9)
    sample = np.random.default_rng(0).choice(N, 500, replace=False)
    sims = emb[sample] @ emb.T
    np.put_along_axis(sims, sample[:, None], -np.inf, axis=1)
    nn_label = labels[sims.argmax(1)]
    print(f"1-NN label agreement: {(nn_label == labels[sample]).mean():.4f}")


if __name__ == "__main__":
    main()
