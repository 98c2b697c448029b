"""node2vec embeddings + downstream node classification (reference:
``examples/node2vec``): p/q-biased second-order walks feed skip-gram
training; a linear probe on the frozen embeddings measures quality.
``--plus`` switches to the node2vec+ accumulated-neighborhood variant."""

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
from pgl_tpu.native.graph_kernel import skip_gram_gen_pair
from pgl_tpu.sampling import node2vec_walk, node2vec_walk_plus
from pgl_tpu.utils.transform import to_undirected


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--p", type=float, default=0.25)
    parser.add_argument("--q", type=float, default=4.0)
    parser.add_argument("--plus", action="store_true",
                        help="node2vec+ (accumulated-neighborhood bias)")
    parser.add_argument("--dim", type=int, default=32)
    parser.add_argument("--walk-len", type=int, default=20)
    parser.add_argument("--win", type=int, default=5)
    parser.add_argument("--epochs", type=int, default=3)
    parser.add_argument("--steps-per-epoch", type=int, default=200)
    args = parser.parse_args()

    g, y = community_graph(num_nodes=600, num_classes=4, feat_dim=8,
                           avg_degree=10, noise=2.0, p_inter=0.05, seed=0)
    g = to_undirected(g)
    n = g.num_nodes

    walker = node2vec_walk_plus if args.plus else node2vec_walk
    t0 = time.time()
    srcs, dsts = [], []
    for epoch in range(args.epochs):
        walks = walker(g, np.arange(n), args.walk_len, p=args.p, q=args.q,
                       seed=epoch)
        s, d = skip_gram_gen_pair(walks, args.win, seed=epoch)
        srcs.append(s)
        dsts.append(d)
    src, dst = np.concatenate(srcs), np.concatenate(dsts)
    print(f"{len(src)} pairs from {args.epochs} walk epochs "
          f"({'node2vec+' if args.plus else 'node2vec'}, "
          f"p={args.p} q={args.q})")

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
    total_steps = args.epochs * args.steps_per_epoch
    for i in range(total_steps):
        sel = rng.integers(0, len(src), B)
        key, sub = jax.random.split(key)
        emb, opt_state, loss = step(emb, opt_state, jnp.asarray(src[sel]),
                                    jnp.asarray(dst[sel]), sub)

    # linear probe on frozen embeddings
    e = np.array(emb)
    perm = np.random.default_rng(3).permutation(n)
    tr, te = perm[:n // 2], perm[n // 2:]
    w = jnp.zeros((args.dim, 4))
    popt = optax.adam(0.1)
    pstate = popt.init(w)
    ej, yj = jnp.asarray(e), jnp.asarray(y)

    @jax.jit
    def probe_step(w, pstate):
        def loss_fn(w):
            return optax.softmax_cross_entropy_with_integer_labels(
                ej[tr] @ w, yj[tr]).mean()

        loss, grads = jax.value_and_grad(loss_fn)(w)
        updates, pstate = popt.update(grads, pstate)
        return optax.apply_updates(w, updates), pstate

    for _ in range(200):
        w, pstate = probe_step(w, pstate)
    acc = float(((ej[te] @ w).argmax(-1) == yj[te]).mean())
    print(f"node2vec: probe acc {acc:.4f} "
          f"(skip-gram loss {float(loss):.4f}, {time.time()-t0:.1f}s)")


if __name__ == "__main__":
    main()
