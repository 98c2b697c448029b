"""StreamPool — asynchronous host↔device row staging.

Capability parity with the reference ``pgl/utils/stream_pool.py`` (rotating
CUDA streams + pinned buffers for ``async_pull``/``async_push`` of embedding
rows, ``:27-80``, itself a port of PyGAS). The TPU analog: a small thread
pool overlaps ``jax.device_put`` (host→HBM) and host scatter (HBM→host)
with compute; futures stand in for stream events. TPUs have no UVA, so all
staging is explicit — exactly what this pool encapsulates.
"""

from __future__ import annotations

import concurrent.futures as _fut
from typing import Optional

import numpy as np

import jax

__all__ = ["StreamPool"]


class StreamPool:
    """
    Args:
      pool_size: number of in-flight transfers (threads).
      device: target device (default: first local device).
    """

    def __init__(self, pool_size: int = 2, device=None):
        self._pool = _fut.ThreadPoolExecutor(max_workers=pool_size)
        self._device = device or jax.local_devices()[0]
        self._pending = []

    # -- host → device ------------------------------------------------------

    def async_pull(self, host_array: np.ndarray, index) -> _fut.Future:
        """Gather ``host_array[index]`` and ship to device asynchronously.
        Returns a future resolving to a device array."""
        index = np.asarray(index)

        def work():
            rows = np.ascontiguousarray(host_array[index])
            return jax.device_put(rows, self._device)

        fut = self._pool.submit(work)
        self._pending.append(fut)
        return fut

    # -- device → host ------------------------------------------------------

    def async_push(self, host_array: np.ndarray, index,
                   values) -> _fut.Future:
        """Scatter device ``values`` into ``host_array[index]``
        asynchronously."""
        index = np.asarray(index)

        def work():
            host_array[index] = np.asarray(values)
            return True

        fut = self._pool.submit(work)
        self._pending.append(fut)
        return fut

    # -- generic ------------------------------------------------------------

    def submit(self, fn, *args, **kwargs) -> _fut.Future:
        """Queue an arbitrary transfer callable on the pool (tracked by
        :meth:`synchronize` like the built-in pull/push)."""
        fut = self._pool.submit(fn, *args, **kwargs)
        self._pending.append(fut)
        return fut

    def synchronize(self):
        """Wait for every in-flight transfer (reference ``sync_push``)."""
        for fut in self._pending:
            fut.result()
        self._pending.clear()

    def close(self):
        self.synchronize()
        self._pool.shutdown()
