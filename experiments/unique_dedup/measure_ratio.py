"""Measure the unique-src ratio per dst row block — the go/no-go datum for
the two-phase (gather-unique-then-multihot) SpMM (VERDICT r2 weak #2).

The single-chip SpMM floor is the [E, D] src-row gather (~10 ns/row,
experiments/fused_gather/README.md). If, after a locality reorder, the
edges of each NB-row dst block reference far fewer than E_block unique
src rows, a two-phase SpMM gathers each unique row once per block:

  phase 1  uniq_msgs = feature[unique_srcs_per_block]   (U rows, U << E)
  phase 2  out_block = multihot[NB, U_b] @ uniq_msgs_b  (MXU, in-VMEM)

and the gather bill drops from E to U = sum_b U_b rows.

This script reports U/E per block size for powerlaw graphs, raw vs
metis-reordered (partition.reorder_graph), at bench scale.
"""

import sys
import os
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np


def unique_ratio(edges, num_nodes, nb, ucap=None):
    """U/E where U = sum over dst blocks of unique srcs in the block.
    ``ucap`` sub-blocks the unique table (kernel VMEM cap): a block whose
    unique count exceeds ucap pays ceil(U_b/ucap) full sub-tables."""
    src = edges[:, 0].astype(np.int64)
    dst = edges[:, 1].astype(np.int64)
    order = np.argsort(dst, kind="stable")
    src, dst = src[order], dst[order]
    blk = dst // nb
    # unique (block, src) pairs
    key = blk * num_nodes + src
    uniq = np.unique(key)
    U = len(uniq)
    stats = {"U": int(U), "E": len(edges), "ratio": U / len(edges)}
    if ucap:
        ub = np.bincount((uniq // num_nodes).astype(np.int64))
        padded = (np.ceil(ub / ucap) * ucap).sum()
        stats["padded_ratio_ucap"] = float(padded / len(edges))
    return stats


def packing_sim(edges, num_nodes, nb, W, et):
    """Simulate the two-phase kernel's (block, window) edge layout.

    Per dst block: rank srcs by unique id; sort the block's edges by rank;
    windows are W-sized rank ranges, each owning a contiguous edge span
    (padded to ET tiles). Returns gather rows, padded edge slots, and MXU
    work relative to the single-phase kernel.
    """
    src = edges[:, 0].astype(np.int64)
    dst = edges[:, 1].astype(np.int64)
    order = np.argsort(dst, kind="stable")
    src, dst = src[order], dst[order]
    blk = dst // nb
    E = len(src)

    # rank of each edge's src within its block's unique table
    key = blk * num_nodes + src
    uniq, inv = np.unique(key, return_inverse=True)
    ublk = (uniq // num_nodes).astype(np.int64)
    # offset of each block's unique run (uniq is sorted so blocks are runs)
    blk_first = np.searchsorted(ublk, np.arange(blk.max() + 1))
    rank_local = np.arange(len(uniq)) - blk_first[ublk]
    r = rank_local[inv]                      # per-edge local rank
    win = r // W                             # per-edge window index

    # edges grouped by (block, window): count per group → tiles per group
    gkey = blk * (int(r.max()) // W + 2) + win
    _, counts = np.unique(gkey, return_counts=True)
    tiles = np.ceil(counts / et).astype(np.int64)
    padded_slots = int((tiles * et).sum())

    U = len(uniq)
    # gather rows (uv padded per block to a W multiple so windows are
    # uniform)
    ub = np.bincount(ublk)
    uv_padded = int((np.ceil(ub / W) * W).sum())
    # MXU MACs: per padded slot, inner ET-row onehot over W + outer over NB
    inner = padded_slots * W
    outer = padded_slots * nb
    base = E * nb                            # single-phase kernel
    return {"U": U, "uv_padded": uv_padded, "gather_ratio": uv_padded / E,
            "padded_slots": padded_slots, "slot_overhead": padded_slots / E,
            "mxu_ratio": (inner + outer) / base}


def main():
    from pgl_tpu.datasets import powerlaw_graph
    from pgl_tpu.partition import metis_partition, reorder_graph

    for n, e_mult in ((131072, 16),):
        g = powerlaw_graph(num_nodes=n, avg_degree=e_mult, feat_dim=8,
                           seed=0)
        edges = np.asarray(g.edges)
        E = len(edges)
        print(f"powerlaw n={n} E={E}")
        for tag, gg in (("raw", g),):
            ed = np.asarray(gg.edges)
            for nb in (256, 512, 1024):
                s = unique_ratio(ed, n, nb, ucap=512)
                print(f"  {tag:8s} nb={nb:5d}  U={s['U']:9d} "
                      f"ratio={s['ratio']:.3f} "
                      f"padded(ucap512)={s.get('padded_ratio_ucap', 0):.3f}")
        t0 = time.time()
        gr, _ = reorder_graph(g)
        print(f"  metis reorder: {time.time() - t0:.1f}s")
        ed = np.asarray(gr.edges)
        for nb in (256, 512, 1024):
            s = unique_ratio(ed, n, nb, ucap=512)
            print(f"  {'reorder':8s} nb={nb:5d}  U={s['U']:9d} "
                  f"ratio={s['ratio']:.3f} "
                  f"padded(ucap512)={s.get('padded_ratio_ucap', 0):.3f}")

        # packing sim on the raw graph, fwd (CSC) and bwd (CSR) directions
        for direction, ed2 in (("csc", edges), ("csr", edges[:, ::-1])):
            for nb in (256,):
                for W in (128, 256, 512):
                    for et in (512, 1024):
                        s = packing_sim(ed2, n, nb, W, et)
                        print(f"  pack {direction} nb={nb} W={W:4d} "
                              f"et={et:5d}: gather={s['gather_ratio']:.3f} "
                              f"slots={s['slot_overhead']:.3f} "
                              f"mxu={s['mxu_ratio']:.3f}")


if __name__ == "__main__":
    main()
