"""Citation benchmark runner (reference: ``examples/citation_benchmark/
train.py``): full-batch semi-supervised node classification, one model per
``--model`` flag (GCN/GAT/APPNP/SGC/GCNII/...), public split.

With ``--data-path`` pointing at downloaded Cora/Planetoid files it
reproduces the reference setting; without (this image has no network) it
falls back to a synthetic planted-community graph of Cora's shape so the
pipeline stays runnable end-to-end.

Usage:
  python train.py --model GCN [--dataset cora] [--data-path DIR]
                  [--epochs 200] [--runs 1]
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

from pgl_tpu.datasets import CoraDataset, CitationDataset, community_graph
from pgl_tpu.models import (GCN, GAT, APPNPModel, SGC, SSGC, GATv2,
                            GPRGNN, FAGCN, DeepGCNII, BernNet, ChebNetII,
                            LSTMSage)
from pgl_tpu.utils.transform import add_self_loops, to_undirected


MODELS = {
    "GCN": lambda d, c: GCN(input_size=d, num_class=c, hidden_size=16),
    "LSTMSage": lambda d, c: LSTMSage(input_size=d, num_class=c,
                                      hidden_size=16),
    "GAT": lambda d, c: GAT(input_size=d, num_class=c),
    "APPNP": lambda d, c: APPNPModel(input_size=d, num_class=c),
    "SGC": lambda d, c: SGC(input_size=d, num_class=c),
    "GCNII": lambda d, c: DeepGCNII(input_size=d, num_class=c, k_hop=16),
    "BernNet": lambda d, c: BernNet(input_size=d, num_class=c),
    "ChebNetII": lambda d, c: ChebNetII(input_size=d, num_class=c),
    "SSGC": lambda d, c: SSGC(input_size=d, num_class=c),
    "GATv2": lambda d, c: GATv2(input_size=d, num_class=c),
    "GPRGNN": lambda d, c: GPRGNN(input_size=d, num_class=c),
    "FAGCN": lambda d, c: FAGCN(input_size=d, num_class=c),
}


def load_data(args):
    if args.data_path:
        if args.dataset == "cora":
            ds = CoraDataset(data_path=args.data_path)
        else:
            ds = CitationDataset(args.dataset, data_path=args.data_path)
        feat = ds.graph.node_feat["words"]
        return (ds.graph, feat, ds.y, ds.train_index, ds.val_index,
                ds.test_index, ds.num_classes)
    # synthetic fallback with Cora's shape
    g, y = community_graph(num_nodes=2708, num_classes=7, feat_dim=1433,
                           avg_degree=4, noise=1.2, p_inter=0.15, seed=0)
    g = add_self_loops(to_undirected(g))
    rng = np.random.default_rng(0)
    perm = rng.permutation(2708)
    return (g, g.node_feat["h"], y, perm[:140], perm[200:500],
            perm[500:1500], 7)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", default="GCN", choices=sorted(MODELS))
    parser.add_argument("--dataset", default="cora",
                        choices=["cora", "citeseer", "pubmed"])
    parser.add_argument("--data-path", default=None)
    parser.add_argument("--epochs", type=int, default=200)
    parser.add_argument("--lr", type=float, default=0.01)
    parser.add_argument("--weight-decay", type=float, default=5e-4)
    parser.add_argument("--runs", type=int, default=1)
    args = parser.parse_args()

    graph, feat, y, train_idx, val_idx, test_idx, num_classes = \
        load_data(args)
    gt = graph.tensor()
    x = jnp.asarray(np.asarray(feat, dtype=np.float32))
    y = jnp.asarray(np.asarray(y))
    train_idx = jnp.asarray(np.asarray(train_idx))
    val_idx = jnp.asarray(np.asarray(val_idx))
    test_idx = jnp.asarray(np.asarray(test_idx))

    accs = []
    for run in range(args.runs):
        model = MODELS[args.model](x.shape[1], num_classes)
        params = model.init(jax.random.key(run), gt, x)
        opt = optax.adamw(args.lr, weight_decay=args.weight_decay)
        opt_state = opt.init(params)

        # NB: the graph/features are jit *arguments* (pytree), not
        # closed-over constants — closures would inline the arrays into the
        # compiled module (huge payloads, recompiles per graph).
        @jax.jit
        def train_step(params, opt_state, gt, x, key):
            def loss_fn(p):
                logits = model.apply(p, gt, x, training=True,
                                     rngs={"dropout": key})
                return optax.softmax_cross_entropy_with_integer_labels(
                    logits[train_idx], y[train_idx]).mean()

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = opt.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        @jax.jit
        def evaluate(params, gt, x):
            logits = model.apply(params, gt, x)
            pred = logits.argmax(-1)
            return ((pred[val_idx] == y[val_idx]).mean(),
                    (pred[test_idx] == y[test_idx]).mean())

        key = jax.random.key(100 + run)
        best_val, best_test = 0.0, 0.0
        t0 = time.time()
        for epoch in range(args.epochs):
            key, sub = jax.random.split(key)
            params, opt_state, loss = train_step(params, opt_state, gt, x, sub)
            if epoch % 10 == 0 or epoch == args.epochs - 1:
                val_acc, test_acc = evaluate(params, gt, x)
                if float(val_acc) > best_val:
                    best_val, best_test = float(val_acc), float(test_acc)
        dt = (time.time() - t0) / args.epochs
        print(f"run {run}: best val {best_val:.4f} test {best_test:.4f} "
              f"({dt*1000:.2f} ms/epoch)")
        accs.append(best_test)
    print(f"{args.model}: test acc {np.mean(accs):.4f} ± {np.std(accs):.4f}")


if __name__ == "__main__":
    main()
