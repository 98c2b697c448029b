"""Hierarchical graph classification with SAGPool (reference:
``examples/sag_pool``): GCN → self-attention top-k pooling → GCN → global
readout.

Pooling changes array sizes, so it follows the framework's two-phase
dynamic-shape pattern (docs/MIGRATION.md): a host-side *plan* step picks
the kept nodes and rebuilds the pooled graph with concrete values, then the
differentiable step re-derives the (differentiable) scores and runs the
dense math with the selection as constants — gradients flow through the
scores exactly as in the reference, only the integer selection is
re-planned outside autodiff."""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np

from pgl_tpu.utils.platform import select_platform

select_platform()

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax

from pgl_tpu import Graph, math as gmath
from pgl_tpu.nn import GCNConv
from pgl_tpu.nn.functional import graph_pool
from pgl_tpu.utils.transform import filter_adj


class SAGPoolNet(nn.Module):
    input_size: int
    hidden: int
    num_class: int
    ratio: float = 0.5

    def setup(self):
        self.conv1 = GCNConv(self.input_size, self.hidden)
        self.score_gnn = GCNConv(self.hidden, 1)
        self.conv2 = GCNConv(self.hidden, self.hidden)
        self.head = nn.Dense(self.num_class)

    def scored(self, graph, x):
        h = jax.nn.relu(self.conv1(graph, x))
        score = jnp.tanh(self.score_gnn(graph, h).reshape(-1))
        return h, score

    def plan(self, graph, x):
        """Host-side pooling plan: which nodes survive, and the pooled
        graph they induce. Concrete values only — run OUTSIDE autodiff."""
        h, score = self.scored(graph, x)
        batch = graph.graph_node_id
        _, rank = gmath.segment_topk(h, score, batch,
                                     num_segments=graph.num_graph,
                                     ratio=self.ratio)
        rank = np.asarray(rank)
        new_batch = np.asarray(batch)[rank]
        edges, _ = filter_adj(np.asarray(graph.edges), rank,
                              num_nodes=int(score.shape[0]))
        counts = np.bincount(new_batch, minlength=graph.num_graph)
        gni = np.concatenate([[0], np.cumsum(counts)]).astype(np.int32)
        pooled = Graph(edges, num_nodes=len(rank), _graph_node_index=gni,
                       _num_graph=graph.num_graph).tensor()
        return rank, pooled

    def __call__(self, graph, x, rank, pooled):
        """Differentiable forward with the plan held constant."""
        h, score = self.scored(graph, x)
        hp = h[rank] * score[rank][:, None]
        h2 = jax.nn.relu(self.conv2(pooled, hp))
        readout = jnp.concatenate([graph_pool(pooled, h2, "mean"),
                                   graph_pool(pooled, h2, "max")], -1)
        return self.head(readout)


def make_motif(kind, n, rng):
    if kind == 0:          # cycle
        src = np.arange(n)
        dst = (src + 1) % n
    else:                  # star
        src = np.concatenate([np.zeros(n - 1, int), np.arange(1, n)])
        dst = np.concatenate([np.arange(1, n), np.zeros(n - 1, int)])
    edges = np.stack([np.concatenate([src, dst]),
                      np.concatenate([dst, src])], 1)
    feat = np.ones((n, 8), np.float32)
    return Graph(edges, num_nodes=n, node_feat={"h": feat}), kind


def make_batches(num_graphs, batch_size, seed):
    rng = np.random.default_rng(seed)
    pairs = [make_motif(int(rng.integers(0, 2)), int(rng.integers(6, 14)),
                        rng) for _ in range(num_graphs)]
    out = []
    for lo in range(0, num_graphs - batch_size + 1, batch_size):
        gs, ys = zip(*pairs[lo:lo + batch_size])
        out.append((Graph.disjoint(list(gs)).tensor(), jnp.asarray(ys)))
    return out


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--epochs", type=int, default=15)
    parser.add_argument("--batch-size", type=int, default=32)
    parser.add_argument("--num-graphs", type=int, default=256)
    parser.add_argument("--ratio", type=float, default=0.5)
    args = parser.parse_args()

    batches = make_batches(args.num_graphs, args.batch_size, 0)
    test = make_batches(96, args.batch_size, 1)

    model = SAGPoolNet(input_size=8, hidden=32, num_class=2,
                       ratio=args.ratio)
    g0, _ = batches[0]
    x0 = g0.node_feat["h"]
    # init with a trivial plan (identity pooling) to create the params
    params = model.init(jax.random.key(0), g0, x0,
                        np.arange(g0.num_nodes), g0)

    opt = optax.adam(5e-3)
    opt_state = opt.init(params)

    def step(params, opt_state, g, y):
        # phase 1: concrete pooling plan with the current params
        rank, pooled = model.apply(params, g, g.node_feat["h"],
                                   method=SAGPoolNet.plan)

        # phase 2: differentiable loss with the plan as constants
        def loss_fn(p):
            logits = model.apply(p, g, g.node_feat["h"], rank, pooled)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, y).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    t0 = time.time()
    for epoch in range(args.epochs):
        total = 0.0
        for g, y in batches:
            params, opt_state, loss = step(params, opt_state, g, y)
            total += float(loss)
        if epoch % 5 == 0:
            print(f"epoch {epoch}: loss {total/len(batches):.4f}")

    correct = count = 0
    for g, y in test:
        rank, pooled = model.apply(params, g, g.node_feat["h"],
                                   method=SAGPoolNet.plan)
        pred = model.apply(params, g, g.node_feat["h"], rank,
                           pooled).argmax(-1)
        correct += int((pred == y).sum())
        count += len(y)
    print(f"SAGPool graph classification: test acc {correct/count:.4f} "
          f"({(time.time()-t0)/args.epochs:.2f} s/epoch)")


if __name__ == "__main__":
    main()
