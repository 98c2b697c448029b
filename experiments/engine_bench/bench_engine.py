"""Distributed graph engine scale bench (VERDICT r2 #6).

Spawns N shard-server PROCESSES (one `pgl_tpu.distributed.launch` each, so
server-side work escapes this process's GIL), loads a synthetic powerlaw
graph through the client file loader, then measures:

  * batch sample_successor throughput (samples/s) — 1 client and C
    concurrent client PROCESSES
  * get_node_feat throughput (rows/s and feature MB/s)
  * ingest wall time

Reference envelope being approximated: the C++/brpc engine at
``pgl/distributed/dist_graph.py:76-131`` (shard_num 100-1000).

Usage: python experiments/engine_bench/bench_engine.py
       [--edges 300000] [--nodes 50000] [--servers 1 2 4 8] [--clients 4]
"""

import argparse
import os
import socket
import subprocess
import sys
import tempfile
import time

ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "..")
sys.path.insert(0, ROOT)

import numpy as np


def free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    p = s.getsockname()[1]
    s.close()
    return p


def write_dataset(d, n_nodes, n_edges, feat_dim, seed=0):
    rng = np.random.default_rng(seed)
    # powerlaw-ish srcs: hubs are hot, like real walk workloads
    ranks = np.arange(1, n_nodes + 1, dtype=np.float64)
    p = ranks ** -0.8
    p /= p.sum()
    src = rng.choice(n_nodes, n_edges, p=p)
    dst = rng.integers(0, n_nodes, n_edges)
    ef = os.path.join(d, "edges.txt")
    np.savetxt(ef, np.stack([src, dst], 1), fmt="%d", delimiter="\t")
    nf = os.path.join(d, "nodes.txt")
    with open(nf, "w") as f:
        for i in range(n_nodes):
            f.write(f"u\t{i}\n")
    cfg = os.path.join(d, "config.yaml")
    with open(cfg, "w") as f:
        f.write(f"""etype2files: "u2e2u:{ef}"
ntype2files: "u:{nf}"
symmetry: true
nfeat_info: [["u", "emb", "float32", {feat_dim}]]
""")
    return cfg


CLIENT_PROG = r"""
import os, sys, time
sys.path.insert(0, {root!r})
import numpy as np
from pgl_tpu.distributed.dist_graph import DistGraphClient

cfg, ips, n_nodes, batch, secs, seed = (
    {cfg!r}, {ips!r}, {n_nodes}, {batch}, {secs}, {seed})
c = DistGraphClient(cfg, shard_num=32, ip_config=ips.split(";"),
                    client_id=seed)
rng = np.random.default_rng(seed)
# warmup
c.sample_successor(rng.integers(0, n_nodes, batch), 10, "u2e2u", seed=0)
t0 = time.perf_counter(); n = 0
while time.perf_counter() - t0 < secs:
    nodes = rng.integers(0, n_nodes, batch)
    c.sample_successor(nodes, 10, "u2e2u", seed=n)
    n += batch
dt = time.perf_counter() - t0
print("SAMPLES", n / dt)
"""


def run_scale_point(cfg, n_servers, n_nodes, feat_dim, batch, n_clients,
                    secs=4.0):
    from pgl_tpu.distributed.dist_graph import DistGraphClient
    from pgl_tpu.distributed.launch import wait_server_ready

    ips = [f"127.0.0.1:{free_port()}" for _ in range(n_servers)]
    ipstr = ";".join(ips)
    env = dict(os.environ, PYTHONPATH=ROOT, JAX_PLATFORMS="cpu")
    servers = [subprocess.Popen(
        [sys.executable, "-m", "pgl_tpu.distributed.launch",
         "--config", cfg, "--ip_config", ipstr, "--server_id", str(i),
         "--shard_num", "32"],
        env=env, stdout=subprocess.DEVNULL, stderr=subprocess.STDOUT)
        for i in range(n_servers)]
    try:
        wait_server_ready(ips, timeout=60)
        client = DistGraphClient(cfg, shard_num=32, ip_config=ips,
                                 client_id=0)
        t0 = time.perf_counter()
        client.load_edges()
        client.load_node_types()
        ingest_s = time.perf_counter() - t0

        rng = np.random.default_rng(0)
        feat = rng.normal(size=(n_nodes, feat_dim)).astype(np.float32)
        ids = np.arange(n_nodes)
        for lo in range(0, n_nodes, 8192):
            client.set_node_feat("u", "emb", ids[lo:lo + 8192],
                                 list(feat[lo:lo + 8192]))

        # single-client sampling throughput
        client.sample_successor(rng.integers(0, n_nodes, batch), 10,
                                "u2e2u", seed=0)          # warm/compact
        t0 = time.perf_counter()
        n = 0
        while time.perf_counter() - t0 < secs:
            client.sample_successor(rng.integers(0, n_nodes, batch), 10,
                                    "u2e2u", seed=n)
            n += batch
        samp_1 = n / (time.perf_counter() - t0)

        # feature pull throughput
        t0 = time.perf_counter()
        n = 0
        while time.perf_counter() - t0 < secs / 2:
            client.get_node_feat(rng.integers(0, n_nodes, batch), "u",
                                 "emb")
            n += batch
        feat_rows = n / (time.perf_counter() - t0)
        feat_mbs = feat_rows * feat_dim * 4 / 1e6

        # concurrent client processes
        progs = [CLIENT_PROG.format(root=ROOT, cfg=cfg, ips=ipstr,
                                    n_nodes=n_nodes, batch=batch,
                                    secs=secs, seed=k + 1)
                 for k in range(n_clients)]
        procs = [subprocess.Popen([sys.executable, "-c", pr], env=env,
                                  stdout=subprocess.PIPE, text=True)
                 for pr in progs]
        total = 0.0
        for p in procs:
            out, _ = p.communicate(timeout=120)
            assert p.returncode == 0, out
            total += float(out.strip().split()[-1])
        client.stop_server()
        return dict(ingest_s=ingest_s, samples_per_s_1=samp_1,
                    samples_per_s_c=total, feat_rows_per_s=feat_rows,
                    feat_mb_per_s=feat_mbs)
    finally:
        for p in servers:
            p.kill()
        for p in servers:
            p.wait()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--edges", type=int, default=300000)
    ap.add_argument("--nodes", type=int, default=50000)
    ap.add_argument("--feat-dim", type=int, default=64)
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--servers", type=int, nargs="+", default=[1, 2, 4, 8])
    ap.add_argument("--clients", type=int, default=4)
    args = ap.parse_args()

    with tempfile.TemporaryDirectory() as d:
        cfg = write_dataset(d, args.nodes, args.edges, args.feat_dim)
        print(f"graph: {args.nodes} nodes, {args.edges} edges "
              f"(+reverse), feat {args.feat_dim}f32; batch {args.batch}")
        print("| servers | ingest s | samples/s (1 client) | samples/s "
              f"({args.clients} clients) | feat rows/s | feat MB/s |")
        print("|---|---|---|---|---|---|")
        for ns in args.servers:
            r = run_scale_point(cfg, ns, args.nodes, args.feat_dim,
                                args.batch, args.clients)
            print(f"| {ns} | {r['ingest_s']:.1f} | "
                  f"{r['samples_per_s_1']:,.0f} | "
                  f"{r['samples_per_s_c']:,.0f} | "
                  f"{r['feat_rows_per_s']:,.0f} | "
                  f"{r['feat_mb_per_s']:.1f} |", flush=True)


if __name__ == "__main__":
    main()
