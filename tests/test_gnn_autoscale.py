"""GAS historical-embedding training: partition batches cover the graph,
halo edges resolve through histories, and partition-wise training converges
on the planted-community task."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax
import flax.linen as nn

from pgl_tpu.datasets import community_graph
from pgl_tpu.apps.gnn_autoscale import (History, ScalableGNN,
                                        partition_batches)
from pgl_tpu.nn import GCNConv


def test_partition_batches_cover():
    g, _ = community_graph(num_nodes=200, num_classes=2, avg_degree=6,
                           seed=0)
    batches = partition_batches(g, 4, method="metis", seed=0)
    covered = np.concatenate([b["nodes"][:b["batch_size"]] for b in batches])
    assert sorted(covered.tolist()) == list(range(200))
    total_edges = sum(b["subgraph"].num_edges for b in batches)
    assert total_edges == g.num_edges  # every edge lands in exactly one part
    for b in batches:
        sg = b["subgraph"]
        # all dst are in-batch (local id < batch_size)
        assert np.asarray(sg.edges)[:, 1].max() < b["batch_size"]


def test_history_roundtrip():
    h = History(10, 4)
    h.push([2, 5], np.ones((2, 4)))
    out = np.asarray(h.pull([2, 3, 5]))
    np.testing.assert_allclose(out, [[1] * 4, [0] * 4, [1] * 4])


def test_gas_training_converges():
    g, labels = community_graph(num_nodes=240, num_classes=3, feat_dim=12,
                                avg_degree=8, seed=2)
    batches = partition_batches(g, 3, method="metis", seed=0)
    y = labels

    l1 = GCNConv(12, 16, activation="relu")
    l2 = GCNConv(16, 3)
    gt0 = batches[0]["subgraph"].tensor()
    x0 = jnp.asarray(np.asarray(g.node_feat["h"])[batches[0]["nodes"]])
    p1 = l1.init(jax.random.key(0), gt0, x0)
    p2 = l2.init(jax.random.key(1), gt0, l1.apply(p1, gt0, x0))

    gas = ScalableGNN(
        240,
        layer_fns=[lambda p, sg, x: l1.apply(p, sg, x),
                   lambda p, sg, x: l2.apply(p, sg, x)],
        hidden_dims=[16])

    params = (p1, p2)
    opt = optax.adam(1e-2)
    opt_state = opt.init(params)
    feat = np.asarray(g.node_feat["h"])

    def batch_loss(params, batch, x, halo, yb):
        out, fresh = gas.forward_batch(params, batch, x, halo)
        loss = optax.softmax_cross_entropy_with_integer_labels(
            out, yb).mean()
        return loss, fresh

    for epoch in range(45):
        for b in batches:
            x = jnp.asarray(feat[b["nodes"]])
            halo = gas.pull_halo(b)
            yb = jnp.asarray(y[b["nodes"][:b["batch_size"]]])
            (loss, fresh), grads = jax.value_and_grad(
                batch_loss, has_aux=True)(params, b, x, halo, yb)
            gas.push_fresh(b, fresh)
            updates, opt_state = opt.update(grads, opt_state)
            params = optax.apply_updates(params, updates)

    logits = gas.inference_full(params, g, g.node_feat["h"])
    acc = float((logits.argmax(-1) == jnp.asarray(y)).mean())
    assert acc > 0.85, acc
