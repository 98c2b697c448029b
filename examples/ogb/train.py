"""ogbn-arxiv-style full-batch node classification (reference:
``ogb_examples/nodeproppred/unimp`` arxiv config): UniMP or GCN over an OGB
node-property dataset.

With the ``ogb`` package installed and its data downloaded this runs the
real ogbn-arxiv; in this image (no network) it falls back to an
arxiv-shaped synthetic graph (169k nodes / 1.2M edges / 128 feats / 40
classes) so the pipeline is exercised end-to-end at realistic scale.
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
from pgl_tpu.models import GCN, UniMP
from pgl_tpu.utils.transform import add_self_loops, to_undirected


def load_data(use_synthetic_scale):
    try:
        from pgl_tpu.datasets import OgbnArxivDataset
        ds = OgbnArxivDataset()
        return (ds.graph, ds.feature, ds.y.reshape(-1), ds.train_index,
                ds.val_index, ds.test_index, ds.num_classes)
    except Exception:
        n = 169343 if use_synthetic_scale else 20000
        g, y = community_graph(num_nodes=n, num_classes=40, feat_dim=128,
                               avg_degree=7, noise=1.6, p_inter=0.05,
                               seed=0)
        g = add_self_loops(to_undirected(g))
        perm = np.random.default_rng(0).permutation(n)
        k = n // 2
        return (g, g.node_feat["h"], y, perm[:k], perm[k:k + n // 4],
                perm[k + n // 4:], 40)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", default="GCN", choices=["GCN", "UniMP"])
    parser.add_argument("--epochs", type=int, default=100)
    parser.add_argument("--hidden", type=int, default=128)
    parser.add_argument("--lr", type=float, default=5e-3)
    parser.add_argument("--full-scale", action="store_true",
                        help="synthetic fallback at full arxiv scale")
    args = parser.parse_args()

    graph, feat, y, train_idx, val_idx, test_idx, ncls = load_data(
        args.full_scale)
    gt = graph.tensor()
    x = jnp.asarray(np.asarray(feat, dtype=np.float32))
    yj = jnp.asarray(np.asarray(y))
    train_idx = jnp.asarray(np.asarray(train_idx))
    test_idx = jnp.asarray(np.asarray(test_idx))
    train_mask = jnp.zeros(gt.num_nodes, bool).at[train_idx].set(True)

    if args.model == "GCN":
        model = GCN(input_size=x.shape[1], num_class=ncls, num_layers=3,
                    hidden_size=args.hidden, dropout=0.3)
        apply_kw_g = lambda p, g_, x_, key: model.apply(
            p, g_, x_, training=True, rngs={"dropout": key})
        eval_fn = lambda p: model.apply(p, gt, x)
        params = model.init(jax.random.key(0), gt, x)
    else:
        model = UniMP(input_size=x.shape[1], num_class=ncls, num_layers=2,
                      hidden_size=args.hidden // 2, num_heads=2, dropout=0.1)
        apply_kw_g = lambda p, g_, x_, key: model.apply(
            p, g_, x_, yj, train_mask, training=True,
            rngs={"dropout": key})
        eval_fn = lambda p: model.apply(p, gt, x, yj, train_mask)
        params = model.init(jax.random.key(0), gt, x, yj, train_mask)

    opt = optax.adamw(args.lr, weight_decay=1e-4)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, gt_, x_, key):
        def loss_fn(p):
            logits = apply_kw_g(p, gt_, x_, key)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits[train_idx], yj[train_idx]).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    key = jax.random.key(1)
    t0 = time.time()
    for epoch in range(args.epochs):
        key, sub = jax.random.split(key)
        params, opt_state, loss = step(params, opt_state, gt, x, sub)
    logits = eval_fn(params)
    acc = float((logits.argmax(-1)[test_idx] == yj[test_idx]).mean())
    print(f"{args.model}: test acc {acc:.4f} "
          f"({(time.time()-t0)/args.epochs*1000:.1f} ms/epoch, "
          f"{gt.num_edges} edges)")


if __name__ == "__main__":
    main()
