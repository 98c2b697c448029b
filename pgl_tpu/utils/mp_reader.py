"""Multiprocess reader merge (reference: ``pgl/utils/mp_reader.py``).

API-parity shim: the reference hand-rolls numpy-aware (de)serialization over
pipes (``:51-79``) and a queue/pipe merge (``:84-180``); our Dataloader
already moves collated numpy batches through a multiprocessing queue, so
``multiprocess_reader`` simply fans a list of generator factories out to
worker processes and merges their outputs unordered. The sentinel/merge/
cleanup machinery here is shared with ``utils.data.Dataloader``.
"""

from __future__ import annotations

import multiprocessing as mp
import traceback
from typing import Callable, Iterator, List

__all__ = ["multiprocess_reader"]


class _Sentinel:
    """End-of-stream marker. A dedicated type (not a magic string) so a
    reader legitimately yielding strings can never terminate the merge
    early."""


class _WorkerError(RuntimeError):
    """Wrapper for a worker's own failure — distinguishes it from a
    reader that legitimately yields Exception objects as data items."""


def _mp_context():
    """fork where available (readers are usually closures the spawn
    pickler can't ship); spawn as the fallback on platforms without it."""
    try:
        return mp.get_context("fork")
    except ValueError:
        return mp.get_context("spawn")


def _worker(reader, out_q, idx):
    try:
        for item in reader():
            out_q.put(item)
    except BaseException:
        out_q.put(_WorkerError(
            f"reader {idx} failed:\n{traceback.format_exc()}"))
    finally:
        out_q.put(_Sentinel())


def merge_worker_queue(out_q, procs, poll_s: float = 1.0) -> Iterator:
    """Yield items from ``out_q`` until every process has posted its
    sentinel. Detects abnormal worker death (OOM-kill, segfault — a dead
    process that never reached its finally) instead of blocking forever,
    and cleans up terminate-then-join so no zombies remain."""
    import queue as queue_mod

    done = 0
    try:
        while done < len(procs):
            try:
                item = out_q.get(timeout=poll_s)
            except queue_mod.Empty:
                dead = [p for p in procs
                        if not p.is_alive() and p.exitcode not in (0, None)]
                if dead and out_q.empty():
                    raise RuntimeError(
                        f"{len(dead)} worker(s) died abnormally "
                        f"(exitcodes {[p.exitcode for p in dead]}) "
                        "without finishing — likely OOM-killed or "
                        "crashed in native code")
                continue
            if isinstance(item, _Sentinel):
                done += 1
                continue
            if isinstance(item, _WorkerError):
                raise item
            yield item
    finally:
        # workers may be blocked on a full queue: terminate first, then
        # join (join-first guaranteed a 5 s timeout per blocked worker)
        for p in procs:
            if p.is_alive():
                p.terminate()
        for p in procs:
            p.join(timeout=5)


def multiprocess_reader(readers: List[Callable[[], Iterator]],
                        queue_size: int = 1000) -> Iterator:
    """Run each no-arg generator factory in its own process; yield merged
    results as they arrive (unordered, like the reference)."""
    ctx = _mp_context()
    out_q = ctx.Queue(maxsize=queue_size)
    procs = [ctx.Process(target=_worker, args=(r, out_q, i), daemon=True)
             for i, r in enumerate(readers)]
    for p in procs:
        p.start()
    yield from merge_worker_queue(out_q, procs)
