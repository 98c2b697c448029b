"""Checkpoint / resume (reference: ``paddle.save/load`` state dicts in every
example, PGLBox ``save_model`` + warm start — SURVEY.md §5).

Thin orbax-checkpoint wrapper: save/restore arbitrary pytrees (params,
optimizer state, step counters) with retention, plus a convenience pair for
the common (params, opt_state, step) training tuple.
"""

from __future__ import annotations

import os
from typing import Any, Optional, Tuple

__all__ = ["CheckpointManager", "save_pytree", "load_pytree"]


def _ocp():
    import orbax.checkpoint as ocp
    return ocp


def save_pytree(path: str, tree: Any):
    """One-shot save of a pytree to ``path`` (a directory)."""
    ocp = _ocp()
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(os.path.abspath(path), tree, force=True)


def load_pytree(path: str, target: Optional[Any] = None) -> Any:
    """Restore a pytree; ``target`` (same structure) restores concrete
    shardings/dtypes when given."""
    ocp = _ocp()
    with ocp.PyTreeCheckpointer() as ckptr:
        if target is not None:
            return ckptr.restore(os.path.abspath(path), item=target)
        return ckptr.restore(os.path.abspath(path))


class CheckpointManager:
    """Step-indexed training checkpoints with retention.

    >>> mgr = CheckpointManager(dir, max_to_keep=3)
    >>> mgr.save(step, {"params": params, "opt_state": opt_state})
    >>> state = mgr.restore()            # latest
    >>> state = mgr.restore(step=100)
    """

    def __init__(self, directory: str, max_to_keep: int = 3):
        ocp = _ocp()
        self._mgr = ocp.CheckpointManager(
            os.path.abspath(directory),
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep))

    def save(self, step: int, state: Any):
        ocp = _ocp()
        self._mgr.save(step, args=ocp.args.StandardSave(state))
        self._mgr.wait_until_finished()

    def restore(self, step: Optional[int] = None,
                target: Optional[Any] = None) -> Any:
        ocp = _ocp()
        step = self.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError("no checkpoints found")
        if target is not None:
            return self._mgr.restore(
                step, args=ocp.args.StandardRestore(target))
        return self._mgr.restore(step)

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def all_steps(self):
        return self._mgr.all_steps()

    def close(self):
        self._mgr.close()
