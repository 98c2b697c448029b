"""UniMP training (reference: ``ogb_examples/nodeproppred/unimp``):
masked-label-propagation graph transformer. During training a random subset
of train-node labels is fed to the model (the rest masked) so it learns to
propagate label information; evaluation feeds all train labels."""

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
from pgl_tpu.models import UniMP
from pgl_tpu.utils.transform import add_self_loops, to_undirected


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--epochs", type=int, default=150)
    parser.add_argument("--hidden", type=int, default=64)
    parser.add_argument("--heads", type=int, default=2)
    parser.add_argument("--layers", type=int, default=2)
    parser.add_argument("--label-rate", type=float, default=0.6,
                        help="fraction of train labels fed during training")
    parser.add_argument("--lr", type=float, default=5e-3)
    parser.add_argument("--data-path", default=None,
                        help="extracted ogbn_arxiv dir (raw/ + split/time/)"
                             "; omit to run the planted-partition synthetic")
    args = parser.parse_args()

    if args.data_path:
        # reference config: ogb_examples/nodeproppred/unimp (arxiv
        # full-batch); the OGB time split replaces the random one
        from pgl_tpu.datasets import OgbnArxivDataset
        ds = OgbnArxivDataset(data_path=args.data_path)
        g = add_self_loops(to_undirected(ds.graph))
        feat = ds.feature.astype(np.float32)
        y = ds.y.reshape(-1)
        num_class = ds.num_classes
        train_idx_np, test_idx_np = ds.train_index, ds.test_index
    else:
        g, y = community_graph(num_nodes=1500, num_classes=5, feat_dim=32,
                               avg_degree=6, noise=1.4, p_inter=0.1, seed=1)
        g = add_self_loops(to_undirected(g))
        feat = np.asarray(g.node_feat["h"])
        num_class = 5
        perm = np.random.default_rng(0).permutation(g.num_nodes)
        train_idx_np, test_idx_np = perm[:600], perm[900:]

    gt = g.tensor()
    x = jnp.asarray(feat)
    yj = jnp.asarray(y)
    test_idx = jnp.asarray(test_idx_np)
    train_mask = jnp.zeros(g.num_nodes, bool).at[
        jnp.asarray(train_idx_np)].set(True)

    model = UniMP(input_size=x.shape[1], num_class=num_class,
                  num_layers=args.layers, hidden_size=args.hidden,
                  num_heads=args.heads, dropout=0.1)
    params = model.init(jax.random.key(0), gt, x, yj, train_mask)
    opt = optax.adamw(args.lr, weight_decay=5e-4)
    opt_state = opt.init(params)

    @jax.jit
    def train_step(params, opt_state, gt, x, key):
        k1, k2 = jax.random.split(key)
        # feed a random subset of train labels; predict the rest
        feed = train_mask & (jax.random.uniform(k1, (g.num_nodes,))
                             < args.label_rate)

        def loss_fn(p):
            logits = model.apply(p, gt, x, yj, feed, training=True,
                                 rngs={"dropout": k2})
            losses = optax.softmax_cross_entropy_with_integer_labels(
                logits, yj)
            mask = train_mask & ~feed
            return (losses * mask).sum() / jnp.maximum(mask.sum(), 1)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    @jax.jit
    def evaluate(params, gt, x):
        logits = model.apply(params, gt, x, yj, train_mask)
        return (logits.argmax(-1)[test_idx] == yj[test_idx]).mean()

    key = jax.random.key(7)
    t0 = time.time()
    best = 0.0
    for epoch in range(args.epochs):
        key, sub = jax.random.split(key)
        params, opt_state, loss = train_step(params, opt_state, gt, x, sub)
        if epoch % 20 == 0 or epoch == args.epochs - 1:
            acc = float(evaluate(params, gt, x))
            best = max(best, acc)
    print(f"UniMP: test acc {best:.4f} "
          f"({(time.time()-t0)/args.epochs*1000:.1f} ms/epoch)")


if __name__ == "__main__":
    main()
