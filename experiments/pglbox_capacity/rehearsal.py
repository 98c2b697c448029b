"""PGLBox capacity rehearsal (VERDICT r2 #8): out-of-core ingest of a
100M+-edge synthetic graph + pass-based training, recording RAM high-water,
ingest time, and pass time.

The point: prove the disk→mmap→pass tiers at a scale where the edge set
(2.6 GB of CSR on disk) could NOT have been a throwaway in-RAM build, and
pin the numbers in docs/COVERAGE.md. Reference tier design:
``apps/PGLBox/src/graph.py:128-160`` (SSD→CPU→GPU).

Usage: python experiments/pglbox_capacity/rehearsal.py
       [--nodes 10000000] [--edges 55000000] [--passes 3] [--workdir DIR]
"""

import argparse
import os
import resource
import sys
import time

ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "..")
sys.path.insert(0, ROOT)
# default backend: the real TPU when attached (device walks + the
# HBM-resident embedding tier make passes ~24x faster); pass --cpu to
# rehearse the pure out-of-core tiers
if "--cpu" in sys.argv:
    os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np


def rss_gb():
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6


def du_gb(path):
    total = 0
    for dirpath, _, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(dirpath, f))
    return total / 1e9


def gen_edge_file(path, n_nodes, n_edges, seed=0, chunk=4_000_000):
    """Powerlaw-src edge text (TSV), written in bounded chunks.

    Vectorized int->str formatting (np.char.add): ~1.2M rows/s vs
    np.savetxt's 0.49M — at 500M rows that is 7 min vs 17.
    """
    rng = np.random.default_rng(seed)
    ranks = np.arange(1, n_nodes + 1, dtype=np.float64)
    p = ranks ** -0.7
    p /= p.sum()
    t0 = time.time()
    with open(path, "wb") as f:
        done = 0
        while done < n_edges:
            k = min(chunk, n_edges - done)
            src = rng.choice(n_nodes, k, p=p)
            dst = rng.integers(0, n_nodes, k)
            lines = np.char.add(np.char.add(src.astype("U10"), "\t"),
                                dst.astype("U10"))
            f.write(("\n".join(lines) + "\n").encode())
            done += k
    return time.time() - t0


def main():
    import jax
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=10_000_000)
    ap.add_argument("--edges", type=int, default=55_000_000)
    ap.add_argument("--passes", type=int, default=3)
    ap.add_argument("--workdir", default="/tmp/pglbox_capacity")
    ap.add_argument("--emb-size", type=int, default=64)
    ap.add_argument("--reuse", action="store_true",
                    help="skip gen+ingest when workdir/graph exists")
    ap.add_argument("--cpu", action="store_true",
                    help="force CPU (pure out-of-core tier rehearsal)")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    print(f"backend: {jax.default_backend()}", flush=True)

    os.makedirs(args.workdir, exist_ok=True)
    edge_file = os.path.join(args.workdir, "edges.txt")
    graph_dir = os.path.join(args.workdir, "graph")
    embed_path = os.path.join(args.workdir, "emb")

    print(f"target: {args.nodes:,} nodes, {args.edges:,} directed edges "
          f"(x2 after symmetry = {2 * args.edges:,} stored)", flush=True)

    from pgl_tpu.apps.pglbox import DistGraph, PGLBoxTrainer

    if args.reuse and os.path.exists(os.path.join(graph_dir, "meta.json")):
        print("reusing existing graph dir", flush=True)
        dg = DistGraph(graph_dir)
    else:
        t = gen_edge_file(edge_file, args.nodes, args.edges)
        sz = os.path.getsize(edge_file) / 1e9
        print(f"edge text: {sz:.2f} GB written in {t:.0f}s "
              f"(rss hw {rss_gb():.2f} GB)", flush=True)
        t0 = time.time()
        dg = DistGraph.from_edge_file(edge_file, graph_dir, symmetry=True,
                                      num_nodes=args.nodes)
        ingest_s = time.time() - t0
        print(f"ingest: {ingest_s:.0f}s -> {dg.num_edges:,} edges, "
              f"{du_gb(graph_dir):.2f} GB on disk, "
              f"rss high-water {rss_gb():.2f} GB", flush=True)

    cfg = dict(emb_size=args.emb_size, walk_len=12, win_size=4, neg_num=4,
               batch_pairs=8192, pass_nodes=2048, epochs=1, lr=0.05)
    trainer = PGLBoxTrainer(dg, embed_path, cfg, seed=0)

    # bounded rehearsal: time --passes passes of the pass-based loop, then
    # extrapolate the full-node-set epoch
    import jax as _jax
    key = _jax.random.key(7)
    it = dg.node_batch_iter(cfg["pass_nodes"], seed=0)
    times, losses = [], []
    for pid in range(args.passes):
        nodes = next(it)
        key, sub = _jax.random.split(key)
        t0 = time.time()
        losses.append(trainer._train_pass(pid, nodes, sub))
        times.append(time.time() - t0)
        print(f"pass {pid}: {times[-1]:.1f}s loss {losses[-1]:.4f} "
              f"(rss hw {rss_gb():.2f} GB)", flush=True)
    per_pass = float(np.mean(times[1:]) if len(times) > 1 else times[0])
    n_passes = -(-args.nodes // cfg["pass_nodes"])
    print(f"steady pass time {per_pass:.1f}s x {n_passes:,} passes "
          f"=> full epoch ~{per_pass * n_passes / 3600:.1f}h single-host; "
          f"rss high-water {rss_gb():.2f} GB "
          f"(graph on disk: {du_gb(graph_dir):.2f} GB)", flush=True)


if __name__ == "__main__":
    main()
