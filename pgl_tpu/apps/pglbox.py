"""PGLBox-analog: out-of-core pass-based training for graphs and embedding
tables larger than device memory.

Capability parity with ``apps/PGLBox`` (reference): the tiered graph store
``GraphGpuWrapper`` (``src/graph.py:27-140``, SSD→CPU→GPU tiers) becomes
:class:`DistGraph` — CSR npy files on disk, the OS page cache as the
host-RAM tier, and only per-pass walk/pair batches ever reaching the
device; the pass-based GPU parameter server ``PSGPU``
(``src/embedding.py:22-57``, ``begin_pass``/``end_pass``/``dump_to_mem``)
becomes :class:`DistEmbedding` — an mmap-backed table on disk from which
``begin_pass`` stages the pass's working set into HBM and ``end_pass``
writes trained rows back; and the yaml-driven trainer
(``src/cluster_train_and_infer.py:52-149``) becomes :class:`PGLBoxTrainer`.

TPU-native shape: walks and skip-gram pairs are produced by the C++ host
kernels directly over the memory-mapped CSR (no materialisation of the
graph in RAM), the device trains a fixed-capacity ``[capacity, dim]``
working-set table (one XLA compilation for every pass), and in-batch
shuffled negatives replace sampled negatives (the reference's
``shuffle_batch`` trick, ``src/models/gnn_model.py:158-161``).
"""

from __future__ import annotations

import os
from typing import Dict, Iterable, Optional, Sequence, Union

import numpy as np

import jax
import jax.numpy as jnp
import optax

from ..graph import Graph
from ..sampling import random_walk
from ..native.graph_kernel import skip_gram_gen_pair
from ..utils.logger import log
from ..utils.shared_embedding import SharedEmbedding

__all__ = ["DistGraph", "DistEmbedding", "PGLBoxTrainer"]


class DistGraph:
    """Disk-tiered graph store (reference ``GraphGpuWrapper`` analog).

    The CSR lives in npy files opened with ``mmap_mode='r'``: cold pages
    stay on disk (the reference's SSD tier), hot pages live in the OS page
    cache (the CPU tier), and the walk kernels read straight through the
    mapping — a 100B-edge graph never has to fit in RAM.
    """

    def __init__(self, path: str):
        self.path = path
        self.graph = Graph.load(path, mmap_mode="r")
        self._walker = None

    @classmethod
    def from_graph(cls, graph: Graph, work_dir: str) -> "DistGraph":
        """Dump a host graph to ``work_dir`` and reopen it memory-mapped."""
        g = graph.numpy() if graph.is_tensor else graph
        # force-build both CSRs before dumping so the reopened graph walks
        # directly over the on-disk index instead of rebuilding it in RAM
        g.adj_src_index, g.adj_dst_index
        g.dump(work_dir)
        return cls(work_dir)

    @classmethod
    def from_edge_file(cls, files: Union[str, Sequence[str]], work_dir: str,
                       symmetry: bool = True,
                       num_nodes: Optional[int] = None,
                       chunk_bytes: int = 16 * 1024 * 1024) -> "DistGraph":
        """Build from ``src<TAB>dst`` text files (the reference's
        ``load_edge_file`` ingestion, ``src/graph.py:107-127``).

        Out-of-core: the files are streamed twice (degree count, then CSR
        scatter into memmapped npy shards) with O(num_nodes + chunk)
        working memory — the edge set never exists in RAM, matching the
        reference's shard-by-shard ingestion
        (``sharding_tool/graph_sharding.py``). ``symmetry=True`` adds
        reverse edges, the reference's default for undirected graphs.
        """
        from .ingest import build_graph_external
        build_graph_external(files, work_dir, num_nodes=num_nodes,
                             symmetry=symmetry, chunk_bytes=chunk_bytes)
        return cls(work_dir)

    @property
    def num_nodes(self) -> int:
        return self.graph.num_nodes

    @property
    def num_edges(self) -> int:
        return self.graph.num_edges

    def _device_walker(self):
        if self._walker is None:
            from ..sampling import DeviceWalker
            self._walker = DeviceWalker(self.graph)
        return self._walker

    def _use_device_walks(self) -> bool:
        """Device walks when a TPU is attached and the CSR fits the HBM
        budget (the reference generates walks on-GPU inside its engine,
        ``apps/PGLBox/src/graph.py:84-106``; our device path is a jitted
        lax.scan over the HBM-resident CSR, ``sampling/device_walk.py``).
        Override with PGL_TPU_PGLBOX_DEVICE_WALKS=0/1."""
        import os
        flag = os.environ.get("PGL_TPU_PGLBOX_DEVICE_WALKS")
        if flag is not None:
            return flag == "1"
        import jax
        budget = int(os.environ.get("PGL_TPU_PGLBOX_WALK_HBM_MB", 4096))
        return (jax.default_backend() == "tpu"
                and self.num_edges * 4 <= budget * (1 << 20))

    def walk_pass(self, nodes, walk_len: int, seed: int = 0) -> np.ndarray:
        """Generate walks for one pass — on-device (one jitted scan per
        pass, no host hops) when the CSR fits HBM, else over the mmap'd
        CSR with the host C++ kernel."""
        if self._use_device_walks():
            import jax
            w = self._device_walker()
            return np.asarray(w.random_walk(
                np.asarray(nodes, np.int32), walk_len,
                jax.random.key(seed)))
        return random_walk(self.graph, nodes, walk_len, seed=seed)

    def node_batch_iter(self, batch_size: int, seed: int = 0):
        return self.graph.node_batch_iter(batch_size, seed=seed)


class DistEmbedding:
    """Pass-based sparse embedding table (reference ``PSGPU`` analog).

    The full ``[num_embeddings, dim]`` table is an mmap-backed
    :class:`SharedEmbedding` on disk. :meth:`begin_pass` stages the unique
    ids touched by a pass into a fixed-capacity device array (one XLA
    program for every pass regardless of the working-set size);
    :meth:`end_pass` writes the trained rows back to the backing store —
    the ``begin_pass``/``end_pass`` contract of
    ``apps/PGLBox/src/embedding.py:33-57``.

    **HBM-resident tier** (the reference keeps tables GPU-resident —
    ``PSGPU`` — and spills beyond): when the table fits the HBM budget
    (``PGL_TPU_PGLBOX_EMB_HBM_MB``, default 6144) on a TPU backend, the
    whole table is uploaded once and every ``begin_pass``/``end_pass``
    becomes a device gather/scatter — no mmap page faults per pass
    (measured 3.8 s → sub-second passes on the 10M-node rehearsal). The
    mmap file stays the persistent store; it is refreshed on
    :meth:`flush_to_store` / :meth:`dump_to_mem`.
    """

    def __init__(self, num_embeddings: int, embedding_dim: int, path: str,
                 capacity: int, lr: float = 0.1, seed: int = 0):
        self.table = SharedEmbedding(num_embeddings, embedding_dim, path,
                                     lr=lr, init_scale=0.1, seed=seed)
        self.capacity = int(capacity)
        self.num_embeddings = int(num_embeddings)
        self.embedding_dim = embedding_dim
        self._ids: Optional[np.ndarray] = None
        self._dev_table = None
        budget_mb = int(os.environ.get("PGL_TPU_PGLBOX_EMB_HBM_MB", 6144))
        force = os.environ.get("PGL_TPU_PGLBOX_EMB_RESIDENT")
        if force is not None:           # explicit override (tests/tuning)
            self._resident = force == "1"
        else:
            self._resident = (
                jax.default_backend() == "tpu"
                and num_embeddings * embedding_dim * 4
                <= budget_mb * (1 << 20))

    def begin_pass(self, ids: Iterable[int]):
        """Stage the pass working set; returns the device table
        ``[capacity, dim]`` (zero-padded past the working set).

        Ids beyond ``capacity`` are dropped most-rare-first; use
        :meth:`local_ids` afterwards to remap (dropped ids map to -1).
        """
        if self._ids is not None:
            raise RuntimeError("begin_pass called twice without end_pass")
        ids = np.asarray(ids, dtype=np.int64).ravel()
        uniq, counts = np.unique(ids, return_counts=True)
        if len(uniq) > self.capacity:
            keep = np.sort(np.argsort(counts)[::-1][:self.capacity])
            log.warning("pass working set %d > capacity %d: dropping %d "
                        "rarest ids", len(uniq), self.capacity,
                        len(uniq) - self.capacity)
            uniq = uniq[keep]
        self._ids = uniq
        if self._resident:
            if self._dev_table is None:           # one-time upload
                self._dev_table = jnp.asarray(
                    np.asarray(self.table.weight, np.float32))
            # fixed-capacity device gather; pad slots read row 0 (their
            # values are never trained nor written back)
            ids_pad = np.zeros(self.capacity, np.int64)
            ids_pad[:len(uniq)] = uniq
            return jnp.take(self._dev_table, jnp.asarray(ids_pad),
                            axis=0)
        rows = self.table.pull(uniq).astype(np.float32)
        padded = np.zeros((self.capacity, self.embedding_dim), np.float32)
        padded[:len(uniq)] = rows
        return jnp.asarray(padded)

    def local_ids(self, global_ids) -> np.ndarray:
        """Map global node ids to working-set rows (-1 when not staged)."""
        g = np.asarray(global_ids, dtype=np.int64)
        if self._ids is None:
            raise RuntimeError("local_ids outside a begin_pass/end_pass")
        if len(self._ids) == 0:
            return np.full(g.shape, -1, dtype=np.int64)
        pos = np.searchsorted(self._ids, g).clip(0, len(self._ids) - 1)
        hit = self._ids[pos] == g
        return np.where(hit, pos, -1)

    def end_pass(self, device_table) -> None:
        """Write the trained working-set rows back to the backing store
        (device scatter in resident mode; mmap write otherwise)."""
        if self._ids is None:
            raise RuntimeError("end_pass without begin_pass")
        if self._resident:
            # pad slots scatter to row num_embeddings → dropped (jax
            # out-of-bounds scatter semantics), so row 0 is never
            # clobbered by the padding
            ids_pad = np.full(self.capacity, self.num_embeddings,
                              np.int64)
            ids_pad[:len(self._ids)] = self._ids
            self._dev_table = self._dev_table.at[
                jnp.asarray(ids_pad)].set(device_table)
            self._ids = None
            return
        rows = np.asarray(device_table)[:len(self._ids)]
        self.table.weight[self._ids] = rows
        self.table.flush()
        self._ids = None

    def flush_to_store(self) -> None:
        """Persist the resident device table to the mmap backing store."""
        if self._resident and self._dev_table is not None:
            self.table.weight[:] = np.asarray(self._dev_table)
            self.table.flush()

    def dump_to_mem(self) -> np.ndarray:
        """Full table as a host array (reference ``dump_to_mem``)."""
        if self._resident and self._dev_table is not None:
            return np.asarray(self._dev_table)
        return np.asarray(self.table.weight)


class PGLBoxTrainer:
    """Config-driven unsupervised trainer over the two tiers above
    (reference ``cluster_train_and_infer.py`` assembly).

    Config keys (PGLBox yaml names where they exist): ``emb_size``,
    ``walk_len``, ``win_size``, ``neg_num``, ``batch_pairs``,
    ``pass_nodes`` (node batch per pass), ``epochs``, ``lr``,
    ``pass_capacity`` (working-set rows staged to HBM per pass; defaults
    to ``pass_nodes * walk_len`` rounded up to a multiple of 1024).
    """

    def __init__(self, graph: DistGraph, embed_path: str,
                 config: Optional[Dict] = None, seed: int = 0):
        cfg = dict(emb_size=64, walk_len=20, win_size=5, neg_num=5,
                   batch_pairs=4096, pass_nodes=1024, epochs=1, lr=0.05,
                   pass_capacity=None)
        cfg.update(config or {})
        self.cfg = cfg
        self.graph = graph
        cap = cfg["pass_capacity"] or -(-cfg["pass_nodes"] *
                                        cfg["walk_len"] // 1024) * 1024
        self.embedding = DistEmbedding(graph.num_nodes, cfg["emb_size"],
                                       embed_path, capacity=cap,
                                       lr=cfg["lr"], seed=seed)
        self.opt = optax.adam(cfg["lr"])
        self._step = jax.jit(self._make_step())
        self._seed = seed

    def _make_step(self):
        neg_num = self.cfg["neg_num"]

        from .common import inbatch_skipgram_loss

        def step(table, opt_state, src, dst, valid, key):
            def loss_fn(t):
                # negatives drawn only from the VALID prefix — padded tail
                # rows previously leaked row 0 into everyone's negatives
                return inbatch_skipgram_loss(t[src], t[dst], key, neg_num,
                                             valid, neg_reduce="sum")

            loss, grads = jax.value_and_grad(loss_fn)(table)
            updates, opt_state = self.opt.update(grads, opt_state)
            return optax.apply_updates(table, updates), opt_state, loss

        return step

    def _train_pass(self, pass_id: int, nodes: np.ndarray, key) -> float:
        cfg = self.cfg
        s = self._seed * 9973 + pass_id * 131
        walks = self.graph.walk_pass(nodes, cfg["walk_len"], seed=s)
        src, dst = skip_gram_gen_pair(walks, cfg["win_size"], seed=s)
        table = self.embedding.begin_pass(np.concatenate([src, dst]))
        src_l = self.embedding.local_ids(src)
        dst_l = self.embedding.local_ids(dst)
        keep = (src_l >= 0) & (dst_l >= 0)
        src_l, dst_l = src_l[keep], dst_l[keep]
        opt_state = self.opt.init(table)
        B = cfg["batch_pairs"]
        total, steps = 0.0, 0
        for lo in range(0, max(len(src_l), 1), B):
            bs, bd = src_l[lo:lo + B], dst_l[lo:lo + B]
            valid = np.ones(len(bs), np.float32)
            if len(bs) < B:  # static shapes: zero-pad the tail batch
                pad = B - len(bs)
                bs = np.pad(bs, (0, pad))
                bd = np.pad(bd, (0, pad))
                valid = np.pad(valid, (0, pad))
            key, sub = jax.random.split(key)
            table, opt_state, loss = self._step(
                table, opt_state, jnp.asarray(bs), jnp.asarray(bd),
                jnp.asarray(valid), sub)
            total += float(loss)
            steps += 1
        self.embedding.end_pass(table)
        return total / max(steps, 1)

    def train(self, log_every: int = 0) -> float:
        """Pass-based training over the whole node set; returns the last
        pass's mean loss. Every pass stages its working set, trains, and
        writes back — peak device memory is ``capacity * emb_size`` floats
        no matter how large the graph is."""
        cfg = self.cfg
        key = jax.random.key(self._seed + 7)
        last = 0.0
        pass_id = 0
        for epoch in range(cfg["epochs"]):
            for nodes in self.graph.node_batch_iter(
                    cfg["pass_nodes"], seed=self._seed + epoch):
                key, sub = jax.random.split(key)
                last = self._train_pass(pass_id, nodes, sub)
                if log_every and pass_id % log_every == 0:
                    log.info("pass %d: loss %.4f", pass_id, last)
                pass_id += 1
            # persist the HBM-resident tier once per epoch (the mmap
            # tier flushes every pass): the on-disk table is the
            # documented persistence contract
            self.embedding.flush_to_store()
        return last

    def embeddings(self) -> np.ndarray:
        return self.embedding.dump_to_mem()

    def infer(self, out_dir: str, batch_nodes: int = 0) -> int:
        """Inference pass: stream every node's trained embedding to
        sharded ``part-XXXXX.npz`` files (``ids`` + ``emb`` arrays) —
        the analog of the reference's infer mode, which walks the node
        set pass-by-pass and writes ``id \\t emb`` shards
        (``cluster_train_and_infer.py``, infer section). Reads the
        mmap-backed table slice-by-slice; peak RAM is one shard.

        Returns the number of shards written."""
        os.makedirs(out_dir, exist_ok=True)
        B = batch_nodes or max(self.cfg["pass_nodes"] * 16, 1 << 16)
        self.embedding.flush_to_store()      # resident tier → mmap
        table = self.embedding.table.weight  # mmap-backed [N, emb_size]
        n = self.graph.num_nodes
        shards = 0
        for lo in range(0, n, B):
            hi = min(lo + B, n)
            np.savez(os.path.join(out_dir, f"part-{shards:05d}.npz"),
                     ids=np.arange(lo, hi, dtype=np.int64),
                     emb=np.asarray(table[lo:hi]))
            shards += 1
        return shards
