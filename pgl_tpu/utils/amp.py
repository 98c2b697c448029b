"""Mixed-precision helpers for bf16 training/inference on TPU.

TPUs run bf16 matmuls at full MXU rate and our Pallas kernels accept bf16
messages (the one-hot reduce accumulates in f32 regardless), so the usual
recipe is: params and activations in bf16, optimizer state and loss in f32.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["to_bf16", "to_f32", "bf16_params_policy"]


def _cast_floats(tree, dtype):
    def cast(x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x
    return jax.tree.map(cast, tree)


def to_bf16(tree):
    """Cast every floating leaf to bfloat16 (ints/bools untouched)."""
    return _cast_floats(tree, jnp.bfloat16)


def to_f32(tree):
    """Cast every floating leaf to float32."""
    return _cast_floats(tree, jnp.float32)


def bf16_params_policy(grad_fn):
    """Wrap a ``value_and_grad``-style function: evaluate with bf16 params,
    return f32 gradients (master weights stay f32 at the optimizer).

    >>> loss, grads = bf16_params_policy(jax.value_and_grad(loss_fn))(params)
    """
    def wrapped(params, *args, **kwargs):
        out, grads = grad_fn(to_bf16(params), *args, **kwargs)
        return out, to_f32(grads)
    return wrapped
