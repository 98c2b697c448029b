"""Graph classification with GIN (reference: ``examples/gin``): batched
disjoint graphs + sum pooling, trained on a synthetic motif task (cycle
graphs vs star graphs of varying size)."""

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

from pgl_tpu import Graph
from pgl_tpu.models import GIN


def make_motif(kind, n, rng):
    """cycle vs star on n nodes; features = degree one-hot-ish."""
    if kind == 0:          # cycle
        src = np.arange(n)
        dst = (src + 1) % n
    else:                  # star
        src = np.concatenate([np.zeros(n - 1, int), np.arange(1, n)])
        dst = np.concatenate([np.arange(1, n), np.zeros(n - 1, int)])
    edges = np.stack([np.concatenate([src, dst]),
                      np.concatenate([dst, src])], 1)
    # constant features force the model to rely on structure
    feat = np.ones((n, 8), np.float32)
    return Graph(edges, num_nodes=n, node_feat={"h": feat})


def make_batches(num_graphs, batch_size, seed):
    rng = np.random.default_rng(seed)
    graphs, labels = [], []
    for _ in range(num_graphs):
        kind = int(rng.integers(0, 2))
        n = int(rng.integers(5, 12))
        graphs.append(make_motif(kind, n, rng))
        labels.append(kind)
    batches = []
    for lo in range(0, num_graphs, batch_size):
        gs = graphs[lo:lo + batch_size]
        if len(gs) < batch_size:
            break
        batch = Graph.disjoint(gs)
        batches.append((batch, np.asarray(labels[lo:lo + batch_size])))
    return batches


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--epochs", type=int, default=20)
    parser.add_argument("--batch-size", type=int, default=32)
    parser.add_argument("--num-graphs", type=int, default=512)
    args = parser.parse_args()

    batches = make_batches(args.num_graphs, args.batch_size, seed=0)
    test_batches = make_batches(128, args.batch_size, seed=1)

    model = GIN(input_size=8, num_class=2, num_layers=3, hidden_size=32)
    g0, y0 = batches[0]
    gt0 = g0.tensor()
    params = model.init(jax.random.key(0), gt0, gt0.node_feat["h"])
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)

    # NOTE: each batch has its own shape -> its own compilation. For a fixed
    # epoch loop, bucket-pad (see examples/graphsage); here batches are
    # reused every epoch so each shape compiles once.
    tensors = [(g.tensor(), jnp.asarray(y)) for g, y in batches]
    test_tensors = [(g.tensor(), jnp.asarray(y)) for g, y in test_batches]

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
    print(f"GIN graph classification: test acc {correct/count:.4f} "
          f"({(time.time()-t0)/args.epochs:.2f} s/epoch)")


if __name__ == "__main__":
    main()
