"""Device-sampled GraphSAGE: the TPU-native analog of the reference's GPU
``NeighborSampler`` training path (``pgl/sampling/sage.py:130-155`` +
``ogb_examples/nodeproppred/unimp`` products pipeline).

The reference samples on the GPU (``paddle.geometric.sample_neighbors``),
compacts with ``reindex_graph``, and trains on the compacted subgraph. On
TPU, dynamic compaction breaks jit's static shapes, so the design is
different: :class:`~pgl_tpu.sampling.NeighborSampler` emits fixed-shape
padded ego blocks ``(frontier, neighbors [M, k], mask [M, k])`` per layer,
and :class:`BipartiteSAGE` consumes those blocks directly — sampling,
feature gathering, the SAGE layers, loss, and gradients all fuse into ONE
jitted step with no host round trip per batch.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

__all__ = ["BipartiteSAGE"]


class BipartiteSAGE(nn.Module):
    """L-layer mean-aggregating GraphSAGE over padded ego blocks.

    Call with the full ``[N, D]`` feature table (HBM-resident), the seed
    node ids, and the ``sampled`` list returned by
    ``NeighborSampler.sample(seeds, key)[0]`` (deepest layer first; the
    number of blocks must equal ``num_layers``). Returns ``[B, num_class]``
    logits for the seeds.

    Layer semantics follow ``GraphSageConv`` (reference
    ``pgl/nn/conv.py:46-115``): separate self/neighbor linears, ReLU +
    L2-normalization on hidden layers, linear output layer.
    """
    input_size: int
    num_class: int
    num_layers: int = 2
    hidden_size: int = 128

    @nn.compact
    def __call__(self, feature_table, seeds, sampled):
        entries = sampled[::-1]  # shallow-first: entries[0] frontier == seeds
        L = len(entries)
        if L != self.num_layers:
            raise ValueError(f"sampled has {L} blocks, model expects "
                             f"{self.num_layers}")
        # depth-i node features: depth 0 = seeds, depth i = flattened
        # neighbors of depth i-1 (padded, with-replacement)
        hs = [jnp.take(feature_table, seeds, axis=0)]
        for _, neigh, _ in entries:
            hs.append(jnp.take(feature_table, neigh.reshape(-1), axis=0))

        for l in range(L):
            last = l == L - 1
            out_sz = self.num_class if last else self.hidden_size
            lin_self = nn.Dense(out_sz, name=f"self_{l}")
            lin_neigh = nn.Dense(out_sz, name=f"neigh_{l}")
            nxt = []
            for i in range(L - l):
                _, neigh, mask = entries[i]
                h_self = hs[i]
                k = neigh.shape[1]
                h_neigh = hs[i + 1].reshape(h_self.shape[0], k, -1)
                m = mask[..., None].astype(h_self.dtype)
                agg = (h_neigh * m).sum(1) / jnp.maximum(m.sum(1), 1.0)
                h = lin_self(h_self) + lin_neigh(agg)
                if not last:
                    h = jax.nn.relu(h)
                    norm = jnp.linalg.norm(h, axis=-1, keepdims=True)
                    h = h / jnp.maximum(norm, 1e-12)
                nxt.append(h)
            hs = nxt
        return hs[0]
