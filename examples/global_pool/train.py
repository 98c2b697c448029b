"""Global pooling comparison (reference: ``examples/global_pool``): a GIN
encoder with a selectable graph-level readout — ``sum``/``mean``/``max``
(GraphPool), ``GlobalAttention``, ``Set2Set``, or ``GMT`` (Graph Multiset
Transformer) — trained on a synthetic motif classification task (cycle vs
star vs ladder graphs), mirroring the reference's GIN + pool study on the
TU datasets (``examples/global_pool/global_pool.py:32-76``)."""

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
import flax.linen as nn
import optax

from pgl_tpu import Graph
from pgl_tpu.nn import (GINConv, GraphPool, GlobalAttention, Set2Set,
                        GraphMultisetTransformer)

POOLS = ("sum", "mean", "max", "GlobalAttention", "Set2Set", "GMT")


def make_motif(kind, n, rng):
    """cycle / star / ladder on ~n nodes; constant features force the
    readout to rely on structure."""
    if kind == 0:          # cycle
        src = np.arange(n)
        dst = (src + 1) % n
    elif kind == 1:        # star
        src = np.concatenate([np.zeros(n - 1, int), np.arange(1, n)])
        dst = np.concatenate([np.arange(1, n), np.zeros(n - 1, int)])
    else:                  # ladder (two rails + rungs)
        half = max(n // 2, 2)
        n = 2 * half
        rail = np.arange(half - 1)
        src = np.concatenate([rail, rail + half, np.arange(half)])
        dst = np.concatenate([rail + 1, rail + half + 1,
                              np.arange(half) + half])
    edges = np.stack([np.concatenate([src, dst]),
                      np.concatenate([dst, src])], 1)
    feat = np.ones((n, 8), np.float32)
    return Graph(edges, num_nodes=n, node_feat={"h": feat})


def make_batches(num_graphs, batch_size, seed):
    rng = np.random.default_rng(seed)
    graphs, labels = [], []
    for _ in range(num_graphs):
        kind = int(rng.integers(0, 3))
        n = int(rng.integers(6, 14))
        graphs.append(make_motif(kind, n, rng))
        labels.append(kind)
    batches = []
    for lo in range(0, num_graphs, batch_size):
        gs = graphs[lo:lo + batch_size]
        if len(gs) < batch_size:
            break
        batches.append((Graph.disjoint(gs),
                        np.asarray(labels[lo:lo + batch_size])))
    return batches


class GINWithReadout(nn.Module):
    """GIN encoder -> selected global readout -> MLP classifier
    (reference ``examples/global_pool/global_pool.py``)."""
    input_size: int
    num_class: int
    pool_type: str
    num_layers: int = 3
    hidden_size: int = 32

    @nn.compact
    def __call__(self, graph, feature):
        for i in range(self.num_layers):
            in_size = self.input_size if i == 0 else self.hidden_size
            feature = GINConv(in_size, self.hidden_size, activation="relu",
                              name=f"gin_{i}")(graph, feature)
        H = self.hidden_size
        if self.pool_type in ("sum", "mean", "max"):
            h = GraphPool(self.pool_type)(graph, feature)
        elif self.pool_type == "GlobalAttention":
            h = GlobalAttention(gate=nn.Dense(1, name="gate"))(graph, feature)
        elif self.pool_type == "Set2Set":
            h = Set2Set(H, n_iters=2, name="s2s")(graph, feature)
        elif self.pool_type == "GMT":
            h = GraphMultisetTransformer(
                input_dim=H, hidden_dim=H, output_dim=H, num_heads=4,
                num_nodes=32, name="gmt")(graph, feature)
        else:
            raise ValueError(f"pool_type must be one of {POOLS}")
        h = jax.nn.relu(nn.Dense(H, name="head")(h))
        return nn.Dense(self.num_class, name="classifier")(h)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--pool_type", default="GlobalAttention",
                        choices=POOLS)
    parser.add_argument("--epochs", type=int, default=40)
    parser.add_argument("--batch-size", type=int, default=32)
    parser.add_argument("--num-graphs", type=int, default=512)
    parser.add_argument("--lr", type=float, default=5e-3)
    args = parser.parse_args()

    batches = make_batches(args.num_graphs, args.batch_size, seed=0)
    test_batches = make_batches(128, args.batch_size, seed=1)
    model = GINWithReadout(input_size=8, num_class=3,
                           pool_type=args.pool_type)
    tensors = [(g.tensor(), jnp.asarray(y)) for g, y in batches]
    test_tensors = [(g.tensor(), jnp.asarray(y)) for g, y in test_batches]
    g0, y0 = tensors[0]
    params = model.init(jax.random.key(0), g0, g0.node_feat["h"])
    opt = optax.adam(args.lr)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, g, x, y):
        def loss_fn(p):
            logits = model.apply(p, g, x)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, y).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    t0 = time.time()
    for epoch in range(args.epochs):
        total = 0.0
        for g, y in tensors:
            params, opt_state, loss = step(params, opt_state, g,
                                           g.node_feat["h"], y)
            total += float(loss)
        if epoch % 5 == 0:
            print(f"epoch {epoch}: loss {total/len(tensors):.4f}")

    correct = count = 0
    for g, y in test_tensors:
        pred = model.apply(params, g, g.node_feat["h"]).argmax(-1)
        correct += int((pred == y).sum())
        count += len(y)
    print(f"global_pool[{args.pool_type}]: test acc {correct/count:.4f} "
          f"({(time.time()-t0)/args.epochs:.2f} s/epoch)")


if __name__ == "__main__":
    main()
