"""Cut-quality benchmark: the native multilevel partitioner vs random
partition on HARD graphs (powerlaw hubs, citation shapes) — the graphs
where HaloGraph's comm-proportional-to-cut claim needs METIS-grade cuts
(reference vendored METIS: pgl/third_party/metis, pgl/partition.py:37).

Run on CPU: PGL_TPU_PLATFORM=cpu python experiments/partition_quality/run.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")

from pgl_tpu.datasets import powerlaw_graph, citation_shaped_graph, \
    community_graph
from pgl_tpu.partition import metis_partition, random_partition


def cut_stats(g, parts, npart):
    e = np.asarray(g.edges)
    cut = (parts[e[:, 0]] != parts[e[:, 1]]).mean()
    sizes = np.bincount(parts, minlength=npart)
    return cut, sizes.max() / max(sizes.mean(), 1.0)


def main():
    npart = 8
    cases = [
        ("powerlaw-131k-d8", powerlaw_graph(131072, avg_degree=8,
                                            feat_dim=0, seed=2)),
        ("powerlaw-131k-d16", powerlaw_graph(131072, avg_degree=16,
                                             feat_dim=0, seed=0)),
        ("cora-shaped", citation_shaped_graph("cora")[0]),
        ("pubmed-shaped", citation_shaped_graph("pubmed")[0]),
        ("community-100k", community_graph(100_000, num_classes=32,
                                           feat_dim=0, avg_degree=12,
                                           p_inter=0.02, seed=1)[0]),
    ]
    rows = []
    for name, g in cases:
        t0 = time.perf_counter()
        pm = metis_partition(g, npart, balance="edges")
        t_m = time.perf_counter() - t0
        pr = random_partition(g, npart)
        cm, bm = cut_stats(g, pm, npart)
        cr, br = cut_stats(g, pr, npart)
        rows.append((name, g.num_nodes, g.num_edges, cm, bm, t_m, cr, br))
        print(f"{name:20s} n={g.num_nodes:7d} e={g.num_edges:8d} "
              f"metis(edge-bal) cut={cm:.3f} node-bal={bm:.2f} "
              f"({t_m:.1f}s) | random cut={cr:.3f} bal={br:.2f}",
              flush=True)

    # halo/scaling impact on the hard case
    from jax.sharding import Mesh
    from pgl_tpu.parallel import HaloGraph
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8")
    mesh = Mesh(np.array(jax.devices("cpu")[:8]), ("node",))
    g = cases[0][1]
    for pname, parts in (
            ("metis-nodes", metis_partition(g, npart)),
            ("metis-edges", metis_partition(g, npart, balance="edges")),
            ("metis-in-edges",
             metis_partition(g, npart, balance="in_edges")),
            ("random", random_partition(g, npart))):
        hg = HaloGraph.from_graph(g, mesh, parts=parts,
                                  attention_layouts=False)
        rep = hg.scaling_report(feat_dim=128)
        print(f"halo[{pname}]: remote_edges={sum(rep['remote_edges'])} "
              f"halo_rows={sum(rep['halo_rows_recv'])} "
              f"skew={rep['edge_skew']:.2f} "
              f"proj_eff={rep['scaling_efficiency']:.3f}", flush=True)

    # realistic (non-adversarial) graph: community structure, bounded hubs
    gc = cases[4][1]
    for pname, parts in (
            ("metis-in-edges",
             metis_partition(gc, npart, balance="in_edges")),
            ("random", random_partition(gc, npart))):
        hg = HaloGraph.from_graph(gc, mesh, parts=parts,
                                  attention_layouts=False)
        rep = hg.scaling_report(feat_dim=128)
        print(f"halo-community[{pname}]: "
              f"remote_edges={sum(rep['remote_edges'])} "
              f"halo_rows={sum(rep['halo_rows_recv'])} "
              f"skew={rep['edge_skew']:.2f} "
              f"proj_eff={rep['scaling_efficiency']:.3f}", flush=True)

    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "README.md"), "w") as f:
        f.write("# Partition quality: native multilevel vs random "
                "(npart=8)\n\n"
                "| graph | nodes | edges | metis cut | metis bal | "
                "build s | random cut | random bal |\n|---|---|---|---|"
                "---|---|---|---|\n")
        for r in rows:
            f.write(f"| {r[0]} | {r[1]} | {r[2]} | {r[3]:.3f} | "
                    f"{r[4]:.2f} | {r[5]:.1f} | {r[6]:.3f} | "
                    f"{r[7]:.2f} |\n")
        f.write("\nCut = fraction of edges crossing shards (halo comm is "
                "proportional to it); bal = max/mean shard size.\n"
                "METIS-grade reference point: on powerlaw graphs with "
                "heavy hubs a 8-way cut in the 0.2-0.4 range is typical "
                "for multilevel partitioners; random is ~7/8 = 0.875 by "
                "construction.\n")
    print("wrote README.md")


if __name__ == "__main__":
    main()
