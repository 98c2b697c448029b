"""Graph-based clustering (reference:
``examples/graph_based_clustering_demo``): node2vec embeddings + k-means.
The reference trains node2vec on Cora and runs sklearn k-means on the
embedding file; here the walks/skip-gram run on the same pipeline and a
small numpy k-means (k-means++ seeding) does the clustering, scored by
normalized mutual information against the planted communities."""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np

from pgl_tpu.utils.platform import select_platform

select_platform()

import jax
import jax.numpy as jnp
import optax

from pgl_tpu.datasets import community_graph
from pgl_tpu.native.graph_kernel import skip_gram_gen_pair
from pgl_tpu.sampling import node2vec_walk
from pgl_tpu.utils.transform import to_undirected


def kmeans(x, k, iters=50, seed=0):
    """numpy k-means with k-means++ seeding."""
    rng = np.random.default_rng(seed)
    centers = [x[rng.integers(len(x))]]
    for _ in range(k - 1):  # k-means++: sample far points
        d2 = np.min([((x - c) ** 2).sum(1) for c in centers], 0)
        centers.append(x[rng.choice(len(x), p=d2 / d2.sum())])
    centers = np.stack(centers)
    for _ in range(iters):
        assign = ((x[:, None] - centers[None]) ** 2).sum(-1).argmin(1)
        for c in range(k):
            pts = x[assign == c]
            if len(pts):
                centers[c] = pts.mean(0)
    return assign


def nmi(a, b):
    """Normalized mutual information between two labelings."""
    eps = 1e-12
    ka, kb = a.max() + 1, b.max() + 1
    joint = np.zeros((ka, kb))
    for i, j in zip(a, b):
        joint[i, j] += 1
    joint /= len(a)
    pa, pb = joint.sum(1), joint.sum(0)
    mi = (joint * np.log(joint / (pa[:, None] * pb[None] + eps) + eps)).sum()
    ha = -(pa * np.log(pa + eps)).sum()
    hb = -(pb * np.log(pb + eps)).sum()
    return mi / max(np.sqrt(ha * hb), eps)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--clusters", type=int, default=4)
    parser.add_argument("--dim", type=int, default=32)
    parser.add_argument("--steps", type=int, default=400)
    args = parser.parse_args()

    g, y = community_graph(num_nodes=600, num_classes=args.clusters,
                           feat_dim=8, avg_degree=10, noise=2.0,
                           p_inter=0.05, seed=0)
    g = to_undirected(g)
    n = g.num_nodes

    walks = node2vec_walk(g, np.arange(n).repeat(4), 20, p=0.25, q=4.0,
                          seed=0)
    src, dst = skip_gram_gen_pair(walks, 5, seed=1)

    emb = jax.random.normal(jax.random.key(0), (n, args.dim)) * 0.1
    opt = optax.adam(0.025)
    opt_state = opt.init(emb)
    B = 4096

    @jax.jit
    def step(emb, opt_state, s, d, key):
        neg = jax.random.randint(key, s.shape, 0, n)

        def loss_fn(e):
            pos = jnp.sum(e[s] * e[d], -1)
            ngs = jnp.sum(e[s] * e[neg], -1)
            return (-jax.nn.log_sigmoid(pos)
                    - jax.nn.log_sigmoid(-ngs)).mean()

        loss, grads = jax.value_and_grad(loss_fn)(emb)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(emb, updates), opt_state, loss

    key = jax.random.key(1)
    rng = np.random.default_rng(2)
    for _ in range(args.steps):
        sel = rng.integers(0, len(src), B)
        key, sub = jax.random.split(key)
        emb, opt_state, loss = step(emb, opt_state, jnp.asarray(src[sel]),
                                    jnp.asarray(dst[sel]), sub)

    e = np.array(emb)
    e /= np.linalg.norm(e, axis=1, keepdims=True).clip(1e-9)
    assign = kmeans(e, args.clusters, seed=3)
    score = nmi(np.asarray(y), assign)
    print(f"graph clustering: NMI {score:.4f} over {args.clusters} clusters")


if __name__ == "__main__":
    main()
