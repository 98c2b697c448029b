"""Host-resident node-feature SpMM — the TPU analog of UVA graphs.

The reference keeps edges/features in host memory and lets the GPU read
them through unified addressing (``Graph.tensor(uva=True)``,
``pgl/graph.py:227-247``; ``core.to_uva_tensor``,
``pgl/utils/helper.py:42``). TPUs have no UVA, so the analog is explicit
chunked staging: the feature table stays a host numpy/memmap array and the
SpMM runs dst-range by dst-range — each chunk stages only the unique
source rows its edges touch (the dedup structure of
``dedup_kernels.build_dedup_layout``) host→HBM, runs the two-phase kernel,
and writes its finished output rows back to the host. Peak HBM is one
chunk's unique rows + outputs, never ``[N, D]``.

The next chunk's host-side gather + H2D overlap the current chunk's kernel
(``StreamPool`` thread, the same double-buffering GNNAutoScale uses).
"""

from __future__ import annotations

import functools
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from .dedup_kernels import (DedupLayout, build_dedup_layout, _dedup_call,
                            NBD_DEFAULT, ETD_DEFAULT, W_DEFAULT)

__all__ = ["StreamedSpMM"]


class StreamedSpMM:
    """out[d] = Σ_{(s,d)∈E} feature[s] with a host-resident feature table.

    Args:
      indptr / sorted_v: dst-sorted (CSC) index of the full graph
        (numpy; ``graph.adj_dst_index``).
      num_segments: node count.
      chunk_rows: dst rows per chunk (rounded to the block size); HBM
        high-water ≈ unique-src rows of one chunk × D × 4 bytes.
    """

    def __init__(self, indptr, sorted_v, num_segments: int,
                 chunk_rows: int = 1 << 18, nb: int = NBD_DEFAULT,
                 et: int = ETD_DEFAULT, w: int = W_DEFAULT,
                 interpret: bool = False):
        indptr = np.asarray(indptr, dtype=np.int64)
        sorted_v = np.asarray(sorted_v, dtype=np.int64)
        self.num_segments = int(num_segments)
        self.nb, self.et, self.w = nb, et, w
        self.interpret = interpret
        chunk_rows = max(nb, (chunk_rows // nb) * nb)

        # per-chunk standalone dedup layouts over the chunk's sub-CSR:
        # chunk-local dst ids, GLOBAL src ids in uv (host gather indices)
        self.chunks = []
        for r0 in range(0, self.num_segments, chunk_rows):
            r1 = min(r0 + chunk_rows, self.num_segments)
            e0, e1 = int(indptr[r0]), int(indptr[r1])
            sub_indptr = indptr[r0:r1 + 1] - e0
            lay = build_dedup_layout(sub_indptr, sorted_v[e0:e1],
                                     r1 - r0, nb=nb, et=et, w=w)
            # host copies: nothing edge-sized lives on the device between
            # calls — each pass re-stages exactly one chunk
            host = {k: np.asarray(getattr(lay, k))
                    for k in ("uv", "padded_ids", "rank_iv",
                              "pair_ts", "pair_te", "pair_blk",
                              "pair_wb")}
            self.chunks.append((r0, r1, host))

        # pad every chunk to shared shapes → ONE compiled program
        self._P = max(len(c[2]["pair_ts"]) for c in self.chunks)
        self._EP = max(c[2]["padded_ids"].size for c in self.chunks)
        self._UV = max(len(c[2]["uv"]) for c in self.chunks)
        self._ROWS = max(((r1 - r0 + nb - 1) // nb) * nb
                         for r0, r1, _ in self.chunks)
        G_pad = self._ROWS // nb
        for r0, r1, h in self.chunks:
            g_real = (r1 - r0 + nb - 1) // nb
            # pad pairs as empty work on the LAST real block (no re-zero:
            # blk must not change vs the preceding pair)
            padn = self._P - len(h["pair_ts"])
            last_blk = h["pair_blk"][-1] if len(h["pair_blk"]) else 0
            last_wb = h["pair_wb"][-1] if len(h["pair_wb"]) else 0
            h["pair_ts"] = np.pad(h["pair_ts"], (0, padn))
            h["pair_te"] = np.pad(h["pair_te"], (0, padn))  # ts=te=0: empty
            h["pair_blk"] = np.pad(h["pair_blk"], (0, padn),
                                   constant_values=last_blk)
            h["pair_wb"] = np.pad(h["pair_wb"], (0, padn),
                                  constant_values=last_wb)
            # pad pairs carry empty dst intervals (s = e = 0)
            h["rank_iv"] = np.pad(h["rank_iv"],
                                  ((0, padn), (0, 0), (0, 0)))
            flat_ids = h["padded_ids"].reshape(-1)
            h["padded_ids"] = np.pad(
                flat_ids, (0, self._EP - flat_ids.size),
                constant_values=g_real * nb).reshape(-1, 128)
            h["uv"] = np.pad(h["uv"], (0, self._UV - len(h["uv"])))

        run = functools.partial(self._run_chunk, rows=self._ROWS, nb=nb,
                                et=et, w=w, interpret=interpret)
        self._jit_run = jax.jit(run)

    @staticmethod
    def _run_chunk(uniq, ids, div, ts, te, blk, wb, *, rows,
                   nb, et, w, interpret):
        lay = DedupLayout(jnp.zeros(1, jnp.int32), jnp.zeros(1, jnp.int32),
                          ids, div, ts, te, blk, wb,
                          jnp.zeros(1, jnp.int32),
                          num_segments=rows, num_edges=0, w=w)
        return _dedup_call(uniq, lay, rows, nb, et, w, interpret)

    def __call__(self, feature_host: np.ndarray,
                 out: Optional[np.ndarray] = None) -> np.ndarray:
        """Run the full SpMM; ``feature_host`` is numpy/memmap [N, D]
        (D a multiple of 128 for the kernel path). Returns host [N, D]."""
        N, D = self.num_segments, feature_host.shape[1]
        if out is None:
            out = np.empty((N, D), feature_host.dtype)

        from ...utils.stream_pool import StreamPool
        pool = StreamPool(1)

        def stage(ci):
            r0, r1, h = self.chunks[ci]
            uniq = np.ascontiguousarray(feature_host[h["uv"]])
            return (jax.device_put(uniq),
                    tuple(jax.device_put(h[k]) for k in
                          ("padded_ids", "rank_iv",
                           "pair_ts", "pair_te", "pair_blk", "pair_wb")))

        nxt = pool.submit(stage, 0)
        for ci, (r0, r1, h) in enumerate(self.chunks):
            uniq, rest = nxt.result()
            if ci + 1 < len(self.chunks):
                nxt = pool.submit(stage, ci + 1)   # overlaps the kernel
            res = self._jit_run(uniq, *rest)
            out[r0:r1] = np.asarray(res)[:r1 - r0]
        pool.close()
        return out
