"""Distributed-CPU deepwalk: N trainer processes against async parameter
servers (reference: ``examples/deepwalk/train_distributed_cpu.py`` — fleet
``a_sync=True`` with 2 pservers + N trainers; published result BlogCatalog
MacroF1 0.233).

Topology (all localhost unless you point --ps at remote hosts):

  S shard servers   ``pgl_tpu.distributed.ps.EmbeddingShardService``,
                    each owning rows ``id % S == shard`` of the emb/ctx
                    tables, applying adagrad on push.
  T trainers        each walks its own slice of start nodes, generates
                    skip-gram pairs (C++ kernel), pulls unique rows, runs
                    the jitted pair loss, pushes sparse grads async.
  rank 0            after the barrier file appears, dumps the table and
                    fits a one-vs-rest logistic probe -> MacroF1.

Run:  python examples/deepwalk/train_distributed_cpu.py
      (env PGL_TPU_PLATFORM=cpu recommended — trainers are CPU-bound)
"""

import argparse
import multiprocessing as mp
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np


def macro_f1_probe(emb, labels, train_frac=0.5, seed=0, epochs=300,
                   lr=0.5):
    """One-vs-rest logistic probe on frozen embeddings -> MacroF1.

    numpy-only (no sklearn in the image); good enough to rank embedding
    quality the way the reference's scoring scripts do.
    """
    n, k = labels.shape
    rng = np.random.default_rng(seed)
    order = rng.permutation(n)
    tr, te = order[: int(n * train_frac)], order[int(n * train_frac):]
    x = emb / (np.linalg.norm(emb, axis=1, keepdims=True) + 1e-9)
    xt = np.concatenate([x, np.ones((n, 1), np.float32)], axis=1)
    w = np.zeros((xt.shape[1], k), np.float32)
    y = labels.astype(np.float32)
    for _ in range(epochs):
        z = xt[tr] @ w
        p = 1.0 / (1.0 + np.exp(-z))
        g = xt[tr].T @ (p - y[tr]) / len(tr)
        w -= lr * g
    p = 1.0 / (1.0 + np.exp(-(xt[te] @ w)))
    # reference eval convention: predict top-|labels| per node
    kcounts = labels[te].sum(1).astype(int)
    pred = np.zeros_like(labels[te])
    for i, kc in enumerate(kcounts):
        if kc > 0:
            pred[i, np.argsort(-p[i])[:kc]] = 1
    f1s = []
    for c in range(k):
        tp = int((pred[:, c] & labels[te][:, c]).sum())
        fp = int((pred[:, c] & ~labels[te][:, c].astype(bool)).sum())
        fn = int((~pred[:, c].astype(bool) & labels[te][:, c]).sum())
        prec = tp / max(tp + fp, 1)
        rec = tp / max(tp + fn, 1)
        f1s.append(2 * prec * rec / max(prec + rec, 1e-9))
    return float(np.mean(f1s))


def _trainer_proc(rank, world, ps_addrs, graph_seed, graph_kwargs, epochs,
                  done_q):
    os.environ.setdefault("PGL_TPU_PLATFORM", "cpu")
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.abspath(__file__)), "..", ".."))
    import jax
    jax.config.update("jax_platforms", "cpu")
    from pgl_tpu.datasets import blogcatalog_shaped_graph
    from pgl_tpu.apps.graph4rec import Graph4RecTrainer
    from pgl_tpu.utils.config import Config

    g, _ = blogcatalog_shaped_graph(seed=graph_seed, **graph_kwargs)
    cfg = Config({
        "model_type": "walk_based", "walk_mode": "deepwalk",
        "embed_dim": 32, "walk_len": 12, "win_size": 3, "neg_num": 4,
        "walks_per_node": 2, "batch_pairs": 2048, "epochs": epochs,
        "lr": 0.1,
    })
    tr = Graph4RecTrainer(cfg, graph=g, seed=100 + rank,
                          ps_addresses=ps_addrs)
    # shard start nodes across trainers (the reference shards files)
    orig = tr._start_nodes

    def sharded():
        nodes = np.asarray(orig())
        return nodes[nodes % world == rank]

    tr._start_nodes = sharded
    loss = tr.train()
    for t in tr.ps.values():
        t.flush()
        t.close()
    done_q.put((rank, loss))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trainers", type=int, default=4)
    ap.add_argument("--shards", type=int, default=3)
    ap.add_argument("--epochs", type=int, default=6)
    ap.add_argument("--nodes", type=int, default=2000)
    args = ap.parse_args()

    os.environ.setdefault("PGL_TPU_PLATFORM", "cpu")
    from pgl_tpu.distributed.ps import run_shard_server, PSEmbedding
    from pgl_tpu.datasets import blogcatalog_shaped_graph

    ctx = mp.get_context("spawn")
    ready = ctx.Queue()
    servers = []
    for s in range(args.shards):
        p = ctx.Process(target=run_shard_server,
                        args=(s, args.shards, 0, "127.0.0.1", ready),
                        daemon=True)
        p.start()
        servers.append(p)
    addrs = [None] * args.shards
    for _ in range(args.shards):
        sid, port = ready.get(timeout=30)
        addrs[sid] = f"127.0.0.1:{port}"
    print(f"shard servers: {addrs}")

    gkw = dict(num_nodes=args.nodes)
    done = ctx.Queue()
    t0 = time.time()
    trainers = [ctx.Process(target=_trainer_proc,
                            args=(r, args.trainers, addrs, 0, gkw,
                                  args.epochs, done), daemon=True)
                for r in range(args.trainers)]
    for p in trainers:
        p.start()
    for _ in range(args.trainers):
        rank, loss = done.get(timeout=1200)
        print(f"trainer {rank} done, final loss {loss:.4f}")
    for p in trainers:
        p.join()
    print(f"training wall: {time.time() - t0:.1f}s "
          f"({args.trainers} trainers x {args.shards} shards)")

    # rank-0-style eval: dump the table and probe
    g, labels = blogcatalog_shaped_graph(seed=0, **gkw)
    emb = PSEmbedding(addrs, "emb", g.num_nodes, 32).dump()
    f1 = macro_f1_probe(emb, labels)
    print(f"MacroF1 (one-vs-rest probe): {f1:.4f}  "
          "(reference dist deepwalk on real BlogCatalog: 0.233)")
    for p in servers:
        p.terminate()
    return f1


if __name__ == "__main__":
    main()
