"""GNNAutoScale training (reference: ``apps/GNNAutoScale/examples/run.py``):
METIS-partitioned batches with per-layer historical embeddings — train a
full-graph GCN one partition at a time, evaluate with exact full-graph
inference."""

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

from pgl_tpu.apps.gnn_autoscale import ScalableGNN, partition_batches
from pgl_tpu.datasets import community_graph
from pgl_tpu.nn import GCNConv


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--num-parts", type=int, default=4)
    parser.add_argument("--method", default="metis",
                        choices=["metis", "random"])
    parser.add_argument("--epochs", type=int, default=40)
    parser.add_argument("--hidden", type=int, default=32)
    parser.add_argument("--lr", type=float, default=0.01)
    args = parser.parse_args()

    g, labels = community_graph(num_nodes=800, num_classes=4, feat_dim=16,
                                avg_degree=8, seed=3)
    batches = partition_batches(g, args.num_parts, method=args.method)
    feat = np.asarray(g.node_feat["h"])
    y = labels

    l1 = GCNConv(16, args.hidden, activation="relu")
    l2 = GCNConv(args.hidden, 4)
    gt0 = batches[0]["subgraph"].tensor()
    x0 = jnp.asarray(feat[batches[0]["nodes"]])
    p1 = l1.init(jax.random.key(0), gt0, x0)
    p2 = l2.init(jax.random.key(1), gt0, l1.apply(p1, gt0, x0))
    params = (p1, p2)

    gas = ScalableGNN(g.num_nodes,
                      layer_fns=[lambda p, sg, x: l1.apply(p, sg, x),
                                 lambda p, sg, x: l2.apply(p, sg, x)],
                      hidden_dims=[args.hidden])
    opt = optax.adam(args.lr)
    opt_state = opt.init(params)

    def batch_loss(params, batch, x, halo, yb):
        out, fresh = gas.forward_batch(params, batch, x, halo)
        loss = optax.softmax_cross_entropy_with_integer_labels(
            out, yb).mean()
        return loss, fresh

    t0 = time.time()
    for epoch in range(args.epochs):
        # double-buffered: batch k+1's history pull and batch k-1's push
        # overlap batch k's step (reference base_model.py:31-100 overlap)
        for b, halo in gas.iter_batches(batches):
            x = jnp.asarray(feat[b["nodes"]])
            yb = jnp.asarray(y[b["nodes"][:b["batch_size"]]])
            (loss, fresh), grads = jax.value_and_grad(
                batch_loss, has_aux=True)(params, b, x, halo, yb)
            gas.push_fresh_async(b, fresh)
            updates, opt_state = opt.update(grads, opt_state)
            params = optax.apply_updates(params, updates)
        gas.pool.synchronize()
    logits = gas.inference_full(params, g, g.node_feat["h"])
    acc = float((logits.argmax(-1) == jnp.asarray(y)).mean())
    print(f"GAS ({args.method}, {args.num_parts} parts): acc {acc:.4f} "
          f"({(time.time()-t0)/args.epochs*1000:.1f} ms/epoch)")


if __name__ == "__main__":
    main()
