"""Shared pieces of the walk-based unsupervised trainers.

Three apps (Graph4Rec, UnsupervisedGraphTrainer, PGLBox) train skip-gram
objectives with in-batch shuffled negatives (the PGLBox ``shuffle_batch``
analog, reference ``apps/PGLBox/src/models/gnn_model.py:158-161``); the
negative-drawing and loss live here so a fix lands once.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["inbatch_skipgram_loss"]


def inbatch_skipgram_loss(h, pos_ctx, key, neg_num: int,
                          valid=None, neg_reduce: str = "mean"):
    """Skip-gram loss with negatives drawn from other batch rows' contexts.

    Args:
      h: ``[B, D]`` source embeddings.
      pos_ctx: ``[B, D]`` positive context embeddings.
      valid: optional ``[B]`` float mask for zero-padded tail batches.
        Negatives are drawn ONLY from the valid prefix — padded rows must
        not leak into other examples' negatives (they'd all push one
        arbitrary row's embedding down).
      neg_reduce: "mean" averages the negative term over B*neg_num
        (Graph4Rec/UnsupervisedGraphTrainer convention); "sum" sums the
        per-example negatives before the masked mean (PGLBox convention).
    """
    B = h.shape[0]
    if valid is not None:
        nv = jnp.maximum(valid.sum().astype(jnp.int32), 1)
    else:
        nv = B
    perm = jax.random.permutation(key, B * neg_num) % nv
    neg_ctx = pos_ctx[perm].reshape(B, neg_num, -1)
    pos = jnp.sum(h * pos_ctx, -1)
    negs = jnp.einsum("bd,bkd->bk", h, neg_ctx)
    if valid is None:
        if neg_reduce == "mean":
            return (-jax.nn.log_sigmoid(pos).mean()
                    - jax.nn.log_sigmoid(-negs).mean())
        per = -jax.nn.log_sigmoid(pos) - jax.nn.log_sigmoid(-negs).sum(-1)
        return per.mean()
    if neg_reduce == "mean":
        denom = jnp.maximum(valid.sum(), 1.0)
        pos_t = (-jax.nn.log_sigmoid(pos) * valid).sum() / denom
        neg_t = (-jax.nn.log_sigmoid(-negs)
                 * valid[:, None]).sum() / (denom * neg_num)
        return pos_t + neg_t
    per = -jax.nn.log_sigmoid(pos) - jax.nn.log_sigmoid(-negs).sum(-1)
    return (per * valid).sum() / jnp.maximum(valid.sum(), 1.0)
