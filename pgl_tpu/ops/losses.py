"""TPU-friendly loss formulations.

``optax.softmax_cross_entropy_with_integer_labels`` picks the label
logit with ``take_along_axis`` — a per-row gather, and TPU gathers are
row-count-bound (~1.7 ms forward for 131k rows at the bench shape
regardless of how narrow the row is). The same selection as a one-hot
compare+select+lane-reduce is pure VPU work: 0.51 ms forward, identical
math (log-sum-exp minus the label logit), identical gradients
(softmax − one-hot).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["softmax_cross_entropy_integer"]


def softmax_cross_entropy_integer(logits, labels):
    """Per-example CE for integer labels, gather-free.

    Same value and gradient as
    ``optax.softmax_cross_entropy_with_integer_labels(logits, labels)``
    for in-range labels; the label-logit selection runs as a one-hot
    masked lane reduction instead of a row gather.
    """
    lse = jax.nn.logsumexp(logits, axis=-1)
    oh = jnp.arange(logits.shape[-1], dtype=labels.dtype)[None, :] \
        == labels[:, None]
    label_logit = jnp.sum(jnp.where(oh, logits, 0.0), axis=-1)
    return lse - label_logit
