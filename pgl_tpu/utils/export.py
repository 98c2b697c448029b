"""Model export / serving (reference: ``examples/gnn_depoly`` —
``paddle.jit.to_static`` + InputSpec export and ``paddle.inference``
serving, ``export_model.py:58-83`` / ``python_deploy.py:26-44``).

TPU-native path: ``jax.export`` serializes the jitted inference function to
a portable StableHLO artifact that reloads without the model code; the
lightweight ``Predictor`` mirrors the reference's create_predictor/run API.
"""

from __future__ import annotations

import os
from typing import Callable, Sequence

import jax
import jax.numpy as jnp

__all__ = ["export_model", "load_model", "Predictor"]


def _abstract(a):
    """ShapeDtypeStruct preserving any multi-device sharding, so
    halo-sharded inference functions export with their mesh layout."""
    sh = getattr(a, "sharding", None)
    if sh is not None and getattr(sh, "num_devices", 1) > 1:
        return jax.ShapeDtypeStruct(a.shape, a.dtype, sharding=sh)
    a = jnp.asarray(a)
    return jax.ShapeDtypeStruct(a.shape, a.dtype)


def export_model(fn: Callable, example_args: Sequence, path: str):
    """Serialize ``jax.jit(fn)`` traced at ``example_args`` to ``path``.

    ``fn`` must be a closed inference function (params captured), e.g.
    ``lambda x: model.apply(params, graph, x)``. Mesh-sharded example
    args (e.g. a HaloGraph's ``[S, N_pad, D]`` features) export with
    their shardings — the artifact replays on a same-shape mesh,
    collectives included.
    """
    from jax import export as jexport

    exported = jexport.export(jax.jit(fn))(
        *(_abstract(a) for a in example_args))
    blob = exported.serialize()
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        f.write(blob)
    return exported


def load_model(path: str):
    """Deserialize an exported model; returns an object with ``.call``."""
    from jax import export as jexport

    with open(path, "rb") as f:
        return jexport.deserialize(f.read())


class Predictor:
    """Serving wrapper (reference ``python_deploy.py:26-44`` analog)."""

    def __init__(self, path: str):
        self._exported = load_model(path)

    def run(self, *inputs):
        return self._exported.call(*(jnp.asarray(x) for x in inputs))
