"""RGCN on a heterogeneous graph (reference: ``examples/rgcn``): typed-edge
relational convolution with basis decomposition, full-batch node
classification on a synthetic multi-relation community graph."""

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
import flax.linen as nn

from pgl_tpu.heter_graph import HeterGraph
from pgl_tpu.nn import RGCNConv


def synthetic_relational(num_nodes=600, num_classes=4, num_rels=3, seed=0):
    rng = np.random.default_rng(seed)
    labels = rng.integers(0, num_classes, num_nodes)
    edges = {}
    for r in range(num_rels):
        src = np.repeat(np.arange(num_nodes), 4)
        dst = rng.integers(0, num_nodes, num_nodes * 4)
        # each relation correlates with labels differently
        if r == 0:
            keep = labels[src] == labels[dst]
        elif r == 1:
            keep = (labels[src] + 1) % num_classes == labels[dst]
        else:
            keep = rng.random(len(src)) < 0.3
        edges[f"rel_{r}"] = np.stack([src[keep], dst[keep]], axis=1)
    feat = (np.eye(num_classes)[labels] @
            rng.normal(size=(num_classes, 16)) +
            1.5 * rng.normal(size=(num_nodes, 16))).astype(np.float32)
    return HeterGraph(edges, num_nodes=num_nodes,
                      node_feat={"h": feat}), labels


class RGCN(nn.Module):
    etypes: tuple
    num_class: int
    hidden: int = 32
    num_bases: int = 2

    @nn.compact
    def __call__(self, hg, x):
        x = RGCNConv(x.shape[1], self.hidden, self.etypes,
                     self.num_bases, name="l1")(hg, x)
        x = jax.nn.relu(x)
        return RGCNConv(self.hidden, self.num_class, self.etypes,
                        self.num_bases, name="l2")(hg, x)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--epochs", type=int, default=200)
    parser.add_argument("--lr", type=float, default=0.01)
    args = parser.parse_args()

    hg, labels = synthetic_relational()
    hgt = hg.tensor()
    x = hgt[hg.edge_types[0]].node_feat["h"]
    y = jnp.asarray(labels)
    rngp = np.random.default_rng(0).permutation(hg.num_nodes)
    train_idx = jnp.asarray(rngp[:400])
    test_idx = jnp.asarray(rngp[400:])

    model = RGCN(etypes=tuple(sorted(hg.edge_types)), num_class=4)
    params = model.init(jax.random.key(0), hgt, x)
    opt = optax.adam(args.lr)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, hgt, x):
        def loss_fn(p):
            logits = model.apply(p, hgt, x)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits[train_idx], y[train_idx]).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    t0 = time.time()
    for epoch in range(args.epochs):
        params, opt_state, loss = step(params, opt_state, hgt, x)
    logits = model.apply(params, hgt, x)
    acc = float((logits[test_idx].argmax(-1) == y[test_idx]).mean())
    print(f"RGCN: test acc {acc:.4f} "
          f"({(time.time()-t0)/args.epochs*1000:.2f} ms/epoch)")


if __name__ == "__main__":
    main()
