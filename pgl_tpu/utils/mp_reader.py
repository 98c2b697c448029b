"""Multiprocess reader merge (reference: ``pgl/utils/mp_reader.py``).

API-parity shim: the reference hand-rolls numpy-aware (de)serialization over
pipes (``:51-79``) and a queue/pipe merge (``:84-180``); our Dataloader
already moves collated numpy batches through a multiprocessing queue, so
``multiprocess_reader`` simply fans a list of generator factories out to
worker processes and merges their outputs unordered.
"""

from __future__ import annotations

import multiprocessing as mp
import traceback
from typing import Callable, Iterator, List

__all__ = ["multiprocess_reader"]

_SENTINEL = "__PGL_TPU_READER_DONE__"


def _worker(reader, out_q, idx):
    try:
        for item in reader():
            out_q.put(item)
    except Exception:
        out_q.put(RuntimeError(
            f"reader {idx} failed:\n{traceback.format_exc()}"))
    finally:
        out_q.put(_SENTINEL)


def multiprocess_reader(readers: List[Callable[[], Iterator]],
                        queue_size: int = 1000) -> Iterator:
    """Run each no-arg generator factory in its own process; yield merged
    results as they arrive (unordered, like the reference)."""
    ctx = mp.get_context("fork")
    out_q = ctx.Queue(maxsize=queue_size)
    procs = [ctx.Process(target=_worker, args=(r, out_q, i), daemon=True)
             for i, r in enumerate(readers)]
    for p in procs:
        p.start()
    done = 0
    try:
        while done < len(procs):
            item = out_q.get()
            if isinstance(item, str) and item == _SENTINEL:
                done += 1
                continue
            if isinstance(item, Exception):
                raise item
            yield item
    finally:
        for p in procs:
            p.join(timeout=5)
            if p.is_alive():
                p.terminate()
