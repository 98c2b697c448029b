"""Backend dispatch for the fused message-passing reductions.

Chooses between the Pallas TPU kernel (``ops/pallas/segment_kernels.py``)
and the XLA segment-reduce path. Override with env
``PGL_TPU_USE_PALLAS=1|0`` (default: auto — Pallas on TPU backends for
float32/bfloat16 messages with lane-aligned feature dims and enough edges
to amortize the pipeline).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

__all__ = ["use_pallas_spmm", "use_fused_attention"]

_MIN_EDGES = 32768


def use_pallas_spmm(feature, num_edges: int) -> bool:
    """Whether Graph.send_u_recv should take the Pallas spmm path."""
    flag = os.environ.get("PGL_TPU_USE_PALLAS", "auto").lower()
    if flag in ("0", "false", "off"):
        return False
    if feature.ndim != 2:
        return False
    ok = (num_edges >= _MIN_EDGES
          and feature.dtype in (jnp.float32, jnp.bfloat16))
    if flag in ("1", "true", "on"):
        return ok
    return ok and jax.default_backend() == "tpu"


def use_fused_attention(graph, num_edges: int, training_attn_drop: bool
                        ) -> bool:
    """Whether attention layers should take the fused Pallas path.

    ``training_attn_drop``: pass True only when the layer needs dropout on
    the attention probs AND its kernel mode can't apply it in-kernel (the
    additive GAT kernel can — GATConv passes False there; the dot-mode
    kernel can't, so e.g. TransformerConv still falls back when training
    with attn_drop).
    """
    flag = os.environ.get("PGL_TPU_FUSED_ATTN", "auto").lower()
    if flag in ("0", "false", "off"):
        return False
    if training_attn_drop:
        return False
    layouts = getattr(graph, "_spmm_layouts", None)
    # the attention layers unpack (csc, csr, perm); BiGraph carries a
    # 2-tuple (csc, csr) and must take the unfused path
    if layouts is None or len(layouts) < 3:
        return False
    ok = num_edges >= _MIN_EDGES
    if flag in ("1", "true", "on"):
        return ok
    return ok and jax.default_backend() == "tpu"
