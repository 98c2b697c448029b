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


def test_history_async_roundtrip():
    """async_pull/async_push through a StreamPool land identically to the
    blocking path, and the lock keeps concurrent push/pull untorn."""
    from pgl_tpu.utils.stream_pool import StreamPool
    pool = StreamPool(2)
    h = History(64, 8)
    vals = np.random.default_rng(0).normal(size=(16, 8)).astype(np.float32)
    idx = np.arange(16) * 3 % 64
    h.async_push(idx, vals, pool)
    pool.synchronize()
    out = h.async_pull(idx, pool).result()
    np.testing.assert_allclose(np.asarray(out), vals)
    # hammer concurrent pushes/pulls of one row: every read sees a complete
    # row (all-columns-equal invariant), never a torn mix
    row = np.arange(1)
    for k in range(50):
        h.async_push(row, np.full((1, 8), float(k), np.float32), pool)
        got = np.asarray(h.async_pull(row, pool).result())[0]
        assert (got == got[0]).all(), got
    pool.synchronize()
    pool.close()


def test_iter_batches_overlap_and_equivalence():
    """iter_batches: (a) batch k+1's halo pull is issued before batch k is
    consumed (true overlap), (b) yielded halo values equal the blocking
    pull_halo path."""
    import threading
    g, _ = community_graph(num_nodes=200, num_classes=2, avg_degree=6,
                           seed=1)
    batches = partition_batches(g, 4, method="metis", seed=0)
    gas = ScalableGNN(
        200, layer_fns=[lambda p, sg, x: x, lambda p, sg, x: x],
        hidden_dims=[5])
    gas.histories[0].emb[:] = np.random.default_rng(2).normal(
        size=gas.histories[0].emb.shape).astype(np.float32)

    issued = []
    orig = gas.prefetch_halo

    def recording_prefetch(batch):
        issued.append(batch["nodes"][0])
        return orig(batch)

    gas.prefetch_halo = recording_prefetch
    seen = []
    for i, (b, halo) in enumerate(gas.iter_batches(batches)):
        # before consuming batch i, the pull for batch i+1 must be issued
        if i + 1 < len(batches):
            assert len(issued) >= i + 2, (i, len(issued))
        seen.append((b, halo))
    assert len(seen) == len(batches)
    for b, halo in seen:
        ref = gas.pull_halo(b)
        for a, r in zip(halo, ref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(r))
    gas.pool.close()


def test_gas_async_training_converges():
    """Training driven through iter_batches + push_fresh_async converges
    like the blocking path. (Async halos are up to one batch staler than
    sync — the GAS histories-are-stale contract covers this; pushes are
    synchronized at epoch end so epochs never drift further.)"""
    g, labels = community_graph(num_nodes=240, num_classes=3, feat_dim=12,
                                avg_degree=8, seed=2)
    batches = partition_batches(g, 3, method="metis", seed=0)
    feat = np.asarray(g.node_feat["h"])

    l1 = GCNConv(12, 16, activation="relu")
    l2 = GCNConv(16, 3)
    gt0 = batches[0]["subgraph"].tensor()
    x0 = jnp.asarray(feat[batches[0]["nodes"]])
    p1 = l1.init(jax.random.key(0), gt0, x0)
    p2 = l2.init(jax.random.key(1), gt0, l1.apply(p1, gt0, x0))
    params = (p1, p2)

    gas = ScalableGNN(
        240, layer_fns=[lambda p, sg, x: l1.apply(p, sg, x),
                        lambda p, sg, x: l2.apply(p, sg, x)],
        hidden_dims=[16])

    def batch_loss(params, batch, x, halo, yb):
        out, fresh = gas.forward_batch(params, batch, x, halo)
        loss = optax.softmax_cross_entropy_with_integer_labels(
            out, yb).mean()
        return loss, fresh

    opt = optax.adam(1e-2)
    opt_state = opt.init(params)
    for epoch in range(45):
        for b, halo in gas.iter_batches(batches):
            x = jnp.asarray(feat[b["nodes"]])
            yb = jnp.asarray(labels[b["nodes"][:b["batch_size"]]])
            (loss, fresh), grads = jax.value_and_grad(
                batch_loss, has_aux=True)(params, b, x, halo, yb)
            gas.push_fresh_async(b, fresh)
            updates, opt_state = opt.update(grads, opt_state)
            params = optax.apply_updates(params, updates)
        gas.pool.synchronize()
    logits = gas.inference_full(params, g, g.node_feat["h"])
    acc = float((logits.argmax(-1) == jnp.asarray(labels)).mean())
    gas.pool.close()
    assert acc > 0.85, acc
