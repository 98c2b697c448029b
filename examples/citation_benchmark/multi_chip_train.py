"""Multi-chip full-batch citation training over a HaloGraph (reference:
``examples/citation_benchmark/multi_gpu_train.py`` + ``DistGPUGraph``,
``pgl/graph.py:1410-1553``).

The reference edge-shards across GPUs and NCCL-allreduces the full [N, d]
node tensor every layer. The TPU-native design partitions *nodes* over a
``jax.sharding.Mesh`` (METIS-style cut minimization), exchanges only the
boundary (halo) rows via ``all_to_all``, and overlaps the exchange with
local aggregation — comm volume is proportional to the partition cut, not
to N (docs/HALO.md).

Runs on any device count; with no TPU pod attached use a virtual CPU mesh:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  PGL_TPU_PLATFORM=cpu python multi_chip_train.py --epochs 150
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
import flax.linen as nn
import optax
from jax.sharding import Mesh

from pgl_tpu.datasets import cora_shaped_graph
from pgl_tpu.parallel import HaloGraph
from pgl_tpu.utils.transform import add_self_loops, to_undirected


class HaloGCN(nn.Module):
    """2-layer symmetric-normalized GCN over the [S, N_pad, D] halo
    layout — the same `send_u_recv` contract as the single-chip layers."""
    hidden: int
    num_class: int

    @nn.compact
    def __call__(self, hg, x, training=False):
        deg = jnp.maximum(hg.indegree().astype(x.dtype), 1.0) ** -0.5
        for i, width in enumerate((self.hidden, self.num_class)):
            h = nn.Dense(width, name=f"lin_{i}")(x)
            x = hg.send_u_recv(h * deg[..., None], "sum") * deg[..., None]
            if i == 0:
                x = jax.nn.relu(x)
        return x


class HaloGAT(nn.Module):
    """2-layer GAT — each layer runs the per-shard flash additive-score
    kernel with one boundary-row all_to_all (HaloGraph.gat_attention)."""
    hidden: int
    num_class: int

    @nn.compact
    def __call__(self, hg, x, training=False):
        from pgl_tpu.nn import GATConv
        x = GATConv(input_size=x.shape[-1], hidden_size=self.hidden,
                    num_heads=8, feat_drop=0.0,
                    attn_drop=0.6 if training else 0.0,
                    activation="elu", name="gat_0")(hg, x,
                                                    training=training)
        return GATConv(input_size=self.hidden * 8,
                       hidden_size=self.num_class, num_heads=1,
                       feat_drop=0.0, attn_drop=0.0,
                       name="gat_1")(hg, x)


class HaloUniMP(nn.Module):
    """UniMP (TransformerConv stack + masked label embedding) — dot-score
    attention per shard via HaloGraph.dot_attention."""
    hidden: int
    num_class: int

    @nn.compact
    def __call__(self, hg, x, training=False):
        from pgl_tpu.models import UniMP
        return UniMP(input_size=x.shape[-1], num_class=self.num_class,
                     num_layers=2, hidden_size=self.hidden, num_heads=2,
                     dropout=0.1, use_label_embed=False,
                     name="unimp")(hg, x, training=training)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--epochs", type=int, default=150)
    parser.add_argument("--hidden", type=int, default=16)
    parser.add_argument("--lr", type=float, default=1e-2)
    parser.add_argument("--partition", default="metis",
                        choices=["metis", "range"])
    parser.add_argument("--model", default="gcn",
                        choices=["gcn", "gat", "unimp"])
    args = parser.parse_args()

    g, labels, train_index = cora_shaped_graph(seed=0)
    g = add_self_loops(to_undirected(g))   # same transform as train.py
    N = g.num_nodes
    devices = np.array(jax.devices())
    mesh = Mesh(devices, ("node",))
    hg = HaloGraph.from_graph(g, mesh, partition=args.partition)

    full_bytes = N * 4 * len(devices)        # psum-style [N] per shard
    print(f"devices={len(devices)} halo={hg.halo_size} rows/layer "
          f"(comm {hg.comm_bytes_per_exchange/2**10:.0f} KiB/exchange/"
          f"feature-col vs {full_bytes/2**10:.0f} KiB full-replication)")
    rep = hg.scaling_report(feat_dim=g.node_feat["h"].shape[1])
    print(f"projected scaling efficiency {rep['scaling_efficiency']:.2f} "
          f"(edge skew {rep['edge_skew']:.2f}, "
          f"halo rows/shard {rep['halo_rows_recv']})")

    train_mask = np.zeros(N, np.float32)
    train_mask[np.asarray(train_index)] = 1.0
    test_mask = 1.0 - train_mask
    y = hg.shard_node_values(np.asarray(labels))
    w_train = hg.shard_node_values(train_mask)
    w_test = hg.shard_node_values(test_mask)
    x = hg.node_feat["h"]

    cls = {"gcn": HaloGCN, "gat": HaloGAT, "unimp": HaloUniMP}[args.model]
    model = cls(hidden=args.hidden, num_class=int(labels.max()) + 1)
    params = model.init(jax.random.key(0), hg, x)
    opt = optax.adam(args.lr)
    opt_state = opt.init(params)

    @jax.jit
    def train_step(params, opt_state, hg, x, y, w, key):
        def loss_fn(p):
            logits = model.apply(p, hg, x, training=True,
                                 rngs={"dropout": key})
            ce = optax.softmax_cross_entropy_with_integer_labels(logits, y)
            return (ce * w).sum() / w.sum()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    @jax.jit
    def accuracy(params, hg, x, y, w):
        pred = model.apply(params, hg, x).argmax(-1)
        return ((pred == y) * w).sum() / w.sum()

    t0 = time.time()
    key = jax.random.key(1)
    for epoch in range(args.epochs):
        key, sub = jax.random.split(key)
        params, opt_state, loss = train_step(params, opt_state, hg, x, y,
                                             w_train, sub)
        if epoch % 25 == 0:
            print(f"epoch {epoch}: loss {float(loss):.4f}")
    acc = float(accuracy(params, hg, x, y, w_test))
    print(f"halo-sharded {args.model.upper()} [{args.partition} partition, "
          f"{len(devices)} devices]: test acc {acc:.4f} "
          f"({(time.time()-t0)/args.epochs*1000:.1f} ms/epoch)")


if __name__ == "__main__":
    main()
