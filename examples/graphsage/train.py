"""Minibatch GraphSAGE (reference: ``examples/graphsage/cpu_sample_version/
train.py``): multiprocess Dataloader runs ``graphsage_sample`` in workers,
batches are bucket-padded to static shapes, the jitted train step reuses one
compilation across batches.

With ``--data-path`` pointing at the Reddit npz files this is the reference
Reddit pipeline; otherwise a synthetic community graph keeps it runnable.
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

from pgl_tpu import Graph
from pgl_tpu.datasets import RedditDataset, community_graph
from pgl_tpu.models import GraphSage
from pgl_tpu.sampling import graphsage_sample
from pgl_tpu.utils.data import Dataset, Dataloader


class ShardedNodeDataset(Dataset):
    def __init__(self, nodes, labels):
        self.nodes = np.asarray(nodes)
        self.labels = np.asarray(labels)

    def __getitem__(self, idx):
        return self.nodes[idx], self.labels[idx]

    def __len__(self):
        return len(self.nodes)


def run_device_sampled(args, graph, feat, train_nodes, train_y, test_nodes,
                       test_y, num_classes):
    """Fully on-device pipeline: NeighborSampler + BipartiteSAGE fuse
    sampling, feature gathering, layers, loss and grads into ONE jitted
    step — no host sampling, no per-batch H2D (the TPU-native analog of
    the reference's GPU NeighborSampler path)."""
    from pgl_tpu.models import BipartiteSAGE
    from pgl_tpu.sampling import NeighborSampler

    gt = graph.tensor()
    sampler = NeighborSampler(gt, samples=args.samples)
    model = BipartiteSAGE(input_size=np.asarray(feat).shape[1],
                          num_class=num_classes,
                          num_layers=len(args.samples),
                          hidden_size=args.hidden)
    feat_dev = jnp.asarray(np.asarray(feat, np.float32))
    all_y = np.zeros(graph.num_nodes, np.int32)
    all_y[np.asarray(train_nodes)] = np.asarray(train_y)
    all_y[np.asarray(test_nodes)] = np.asarray(test_y)
    y_dev = jnp.asarray(all_y)

    seeds0 = jnp.asarray(np.asarray(train_nodes[:args.batch_size],
                                    np.int32))
    sampled0, _ = sampler.sample(seeds0, jax.random.key(0))
    params = model.init(jax.random.key(1), feat_dev, seeds0, sampled0)
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, seeds, key):
        sampled, _ = sampler.sample(seeds, key)

        def loss_fn(p):
            logits = model.apply(p, feat_dev, seeds, sampled)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, y_dev[seeds]).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    key = jax.random.key(2)
    B = args.batch_size
    train_nodes = np.asarray(train_nodes)
    for epoch in range(args.epochs):
        order = np.random.default_rng(epoch).permutation(len(train_nodes))
        t0, steps, total = time.time(), 0, 0.0
        for lo in range(0, len(order) - B + 1, B):
            seeds = jnp.asarray(train_nodes[order[lo:lo + B]].astype(
                np.int32))
            key, k1 = jax.random.split(key)
            params, opt_state, loss = step(params, opt_state, seeds, k1)
            steps += 1
            total += float(loss)
        print(f"epoch {epoch}: loss {total/max(steps,1):.4f} "
              f"({steps} steps, {time.time()-t0:.1f}s, device-sampled)")

    correct = tested = 0
    test_nodes = np.asarray(test_nodes)
    for lo in range(0, len(test_nodes) - B + 1, B):
        seeds = jnp.asarray(test_nodes[lo:lo + B].astype(np.int32))
        key, k1 = jax.random.split(key)
        sampled, _ = sampler.sample(seeds, k1)
        pred = model.apply(params, feat_dev, seeds, sampled).argmax(-1)
        correct += int((np.asarray(pred) == all_y[test_nodes[lo:lo + B]])
                       .sum())
        tested += B
    print(f"test acc: {correct / max(tested, 1):.4f}")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--data-path", default=None)
    parser.add_argument("--epochs", type=int, default=3)
    parser.add_argument("--batch-size", type=int, default=128)
    parser.add_argument("--samples", type=int, nargs="+", default=[25, 10])
    parser.add_argument("--hidden", type=int, default=128)
    parser.add_argument("--num-workers", type=int, default=2)
    parser.add_argument("--device-sampler", action="store_true",
                        help="sample on device (BipartiteSAGE, one jit per "
                             "step) instead of Dataloader workers")
    args = parser.parse_args()

    if args.data_path:
        ds = RedditDataset(data_path=args.data_path)
        graph, feat = ds.graph, ds.feature
        train_nodes, train_y = ds.train_index, ds.train_label
        test_nodes, test_y = ds.test_index, ds.test_label
        num_classes = ds.num_classes
    else:
        graph, y = community_graph(num_nodes=3000, num_classes=5,
                                   feat_dim=64, avg_degree=10, seed=0)
        feat = graph.node_feat["h"]
        perm = np.random.default_rng(0).permutation(3000)
        train_nodes, test_nodes = perm[:2000], perm[2000:]
        train_y, test_y = y[train_nodes], y[test_nodes]
        num_classes = 5

    if args.device_sampler:
        run_device_sampled(args, graph, feat, train_nodes, train_y,
                           test_nodes, test_y, num_classes)
        return

    n_bucket = 1 << int(np.ceil(np.log2(
        args.batch_size * (1 + np.prod(args.samples)) + 1)))
    e_bucket = n_bucket * 4
    model = GraphSage(input_size=np.asarray(feat).shape[1],
                      num_class=num_classes, hidden_size=args.hidden,
                      dropout=0.0)
    from pgl_tpu.sampling import make_padded_batch_fn
    batch_fn = make_padded_batch_fn(graph, args.samples, n_bucket, e_bucket)
    feat_dev = jnp.asarray(np.asarray(feat, np.float32))

    params = None
    opt = optax.adam(1e-3)
    opt_state = None

    from pgl_tpu.utils.edge_index import EdgeIndex

    def as_graph(edges, deg, su, sv, indptr):
        # se is a constant arange — regenerate in-jit instead of
        # shipping it H2D every batch
        se = jnp.arange(e_bucket, dtype=jnp.int32)
        return Graph(edges, num_nodes=n_bucket,
                     adj_dst_index=EdgeIndex(deg, su, sv, se, indptr))

    @jax.jit
    def train_step(params, opt_state, edges, deg, su, sv, indptr,
                   sidx, smask, y, mask):
        g = as_graph(edges, deg, su, sv, indptr)
        x = jnp.take(feat_dev, sidx, axis=0) * smask

        def loss_fn(p):
            logits = model.apply(p, g, x)
            losses = optax.softmax_cross_entropy_with_integer_labels(
                logits, y)
            return (losses * mask).sum() / jnp.maximum(mask.sum(), 1.0)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    for epoch in range(args.epochs):
        loader = Dataloader(ShardedNodeDataset(train_nodes, train_y),
                            batch_size=args.batch_size, shuffle=True,
                            num_workers=args.num_workers,
                            collate_fn=batch_fn, seed=epoch)
        t0, steps, loss = time.time(), 0, None
        for batch in loader:
            # drop the collate tuple's se (index 4): regenerated in-jit
            batch = [jax.device_put(a)
                     for i, a in enumerate(batch) if i != 4]
            if params is None:
                g0 = as_graph(*batch[:5])
                x0 = jnp.take(feat_dev, batch[5], axis=0) * batch[6]
                params = model.init(jax.random.key(0), g0, x0)
                opt_state = opt.init(params)
            params, opt_state, loss = train_step(params, opt_state, *batch)
            steps += 1
        print(f"epoch {epoch}: loss {float(loss):.4f} "
              f"({steps} steps, {time.time()-t0:.1f}s)")

    # evaluation with the same sampler
    correct = tested = 0
    eval_loader = Dataloader(ShardedNodeDataset(test_nodes, test_y),
                             batch_size=args.batch_size,
                             collate_fn=batch_fn)
    for edges, deg, su, sv, _se, indptr, sidx, smask, y_b, mask \
            in eval_loader:
        g = as_graph(jnp.asarray(edges), jnp.asarray(deg), jnp.asarray(su),
                     jnp.asarray(sv), jnp.asarray(indptr))
        x = jnp.take(feat_dev, jnp.asarray(sidx), axis=0) \
            * jnp.asarray(smask)
        logits = model.apply(params, g, x)
        pred = np.asarray(logits.argmax(-1))
        m = np.asarray(mask) > 0
        correct += int((pred[m] == np.asarray(y_b)[m]).sum())
        tested += int(m.sum())
    print(f"test acc: {correct / max(tested, 1):.4f}")


if __name__ == "__main__":
    main()
