"""Inference deployment (reference: ``examples/gnn_depoly`` —
``paddle.jit.to_static`` export + ``paddle.inference`` serving): train a
GCN, export the jitted inference function as a portable ``jax.export``
artifact, reload it in a fresh Predictor and serve node classifications."""

import argparse
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np

from pgl_tpu.utils.platform import select_platform

select_platform()

import jax
import jax.numpy as jnp
import optax

from pgl_tpu.datasets import community_graph
from pgl_tpu.models import GCN
from pgl_tpu.utils.export import export_model, Predictor


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", default=None)
    parser.add_argument("--epochs", type=int, default=100)
    args = parser.parse_args()

    g, y = community_graph(num_nodes=500, num_classes=4, feat_dim=32,
                           avg_degree=8, seed=0)
    gt = g.tensor()
    x = gt.node_feat["h"]
    yj = jnp.asarray(y)
    model = GCN(input_size=32, num_class=4, hidden_size=32, dropout=0.0)
    params = model.init(jax.random.key(0), gt, x)
    opt = optax.adam(1e-2)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, gt, x):
        loss, grads = jax.value_and_grad(
            lambda p: optax.softmax_cross_entropy_with_integer_labels(
                model.apply(p, gt, x), yj).mean())(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    for _ in range(args.epochs):
        params, opt_state, loss = step(params, opt_state, gt, x)
    acc_train = float((model.apply(params, gt, x).argmax(-1) == yj).mean())
    print(f"trained: acc {acc_train:.3f}")

    out_path = args.out or os.path.join(tempfile.mkdtemp(), "gcn.jaxexport")
    export_model(lambda feats: model.apply(params, gt, feats), [x], out_path)
    print(f"exported to {out_path} "
          f"({os.path.getsize(out_path)/1e6:.2f} MB)")

    predictor = Predictor(out_path)
    logits = predictor.run(np.asarray(x))
    direct = np.asarray(model.apply(params, gt, x))
    max_err = float(np.abs(np.asarray(logits) - direct).max())
    acc_serve = float((np.asarray(logits).argmax(-1) == y).mean())
    print(f"served: acc {acc_serve:.3f} (max |served-direct| = {max_err:.2e})")


if __name__ == "__main__":
    main()
