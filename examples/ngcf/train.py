"""NGCF collaborative filtering (reference: ``examples/ngcf``): user/item
embeddings propagated through NGCF convs (neighbor sum + elementwise
interaction term, ``pgl/nn/conv.py:1202-1250``), the per-layer outputs
L2-normalized and concatenated, trained with BPR ranking loss — the
reference's Gowalla/Amazon/Yelp recipe (``examples/ngcf/model.py:71-137``)
on synthetic implicit feedback from latent user/item clusters (no network
egress in this image)."""

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
import flax.linen as nn
import optax

from pgl_tpu import Graph
from pgl_tpu.nn import NGCFConv


def make_interactions(num_users, num_items, per_user, num_clusters, seed):
    """Users interact mostly with items of their own latent cluster."""
    rng = np.random.default_rng(seed)
    ucl = rng.integers(0, num_clusters, num_users)
    icl = rng.integers(0, num_clusters, num_items)
    items_of = [np.nonzero(icl == c)[0] for c in range(num_clusters)]
    pairs = []
    for u in range(num_users):
        own = items_of[ucl[u]]
        for _ in range(per_user):
            if rng.random() < 0.9 and len(own):
                i = int(own[rng.integers(len(own))])
            else:
                i = int(rng.integers(num_items))
            pairs.append((u, i))
    return np.unique(np.asarray(pairs), axis=0)


class NGCF(nn.Module):
    """Stacked NGCFConv; returns concat of the L2-normalized per-layer
    embeddings (reference ``examples/ngcf/model.py:96-121``)."""
    dim: int
    num_layers: int = 3

    @nn.compact
    def __call__(self, graph, emb):
        outs = [emb]
        h = emb
        for i in range(self.num_layers):
            h = NGCFConv(self.dim, self.dim, name=f"ngcf_{i}")(graph, h)
            norm = jnp.linalg.norm(h, axis=-1, keepdims=True)
            outs.append(h / jnp.maximum(norm, 1e-12))
        return jnp.concatenate(outs, axis=-1)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--users", type=int, default=400)
    parser.add_argument("--items", type=int, default=600)
    parser.add_argument("--dim", type=int, default=32)
    parser.add_argument("--layers", type=int, default=3)
    parser.add_argument("--epochs", type=int, default=200)
    parser.add_argument("--lr", type=float, default=1e-2)
    args = parser.parse_args()

    pairs = make_interactions(args.users, args.items, per_user=12,
                              num_clusters=4, seed=0)
    U, I = args.users, args.items
    src, dst = pairs[:, 0], pairs[:, 1] + U
    edges = np.stack([np.concatenate([src, dst]),
                      np.concatenate([dst, src])], 1)
    gt = Graph(edges, num_nodes=U + I).tensor()

    rng = np.random.default_rng(1)
    mask = rng.random(len(pairs)) < 0.9
    train_pairs, test_pairs = pairs[mask], pairs[~mask]

    model = NGCF(dim=args.dim, num_layers=args.layers)
    emb0 = jax.random.normal(jax.random.key(0), (U + I, args.dim)) * 0.1
    params0 = model.init(jax.random.key(1), gt, emb0)
    opt = optax.adam(args.lr)
    state = ((emb0, params0), opt.init((emb0, params0)))

    tr_u = jnp.asarray(train_pairs[:, 0])
    tr_i = jnp.asarray(train_pairs[:, 1] + U)

    @jax.jit
    def step(state, g, key):
        (emb, params), opt_state = state
        neg = jax.random.randint(key, (tr_u.shape[0],), U, U + I)

        def loss_fn(ep):
            e, p = ep
            h = model.apply(p, g, e)
            pos = jnp.sum(h[tr_u] * h[tr_i], -1)
            ngs = jnp.sum(h[tr_u] * h[neg], -1)
            bpr = -jax.nn.log_sigmoid(pos - ngs).mean()
            reg = 1e-4 * (e[tr_u] ** 2 + e[tr_i] ** 2
                          + e[neg] ** 2).sum(-1).mean()
            return bpr + reg

        loss, grads = jax.value_and_grad(loss_fn)((emb, params))
        updates, opt_state = opt.update(grads, opt_state)
        return (optax.apply_updates((emb, params), updates), opt_state), loss

    key = jax.random.key(2)
    t0 = time.time()
    for epoch in range(args.epochs):
        key, sub = jax.random.split(key)
        state, loss = step(state, gt, sub)
        if epoch % 20 == 0:
            print(f"epoch {epoch}: bpr loss {float(loss):.4f}")

    (emb, params), _ = state
    h = np.asarray(model.apply(params, gt, emb))
    users = np.unique(test_pairs[:, 0])
    scores = h[users] @ h[U:].T
    for row, u in enumerate(users):
        seen = train_pairs[train_pairs[:, 0] == u][:, 1]
        scores[row, seen] = -np.inf
    top = np.argsort(-scores, 1)[:, :20]
    hits = total = 0
    for row, u in enumerate(users):
        held = set(test_pairs[test_pairs[:, 0] == u][:, 1].tolist())
        hits += len(held & set(top[row].tolist()))
        total += len(held)
    print(f"NGCF: recall@20 {hits/total:.4f} "
          f"({(time.time()-t0)/args.epochs*1000:.1f} ms/epoch)")


if __name__ == "__main__":
    main()
