"""Checkpoint / resume for episodic state and model parameters.

Aux-subsystem parity (SURVEY.md §5): the reference's "checkpointing" is a
dummy policy file plus episode-level JSON resume; its map state is
unrecoverable mid-episode. Here the ENTIRE policy state (all maps, recurrence,
acyclic memory, counters) is one pytree, so mid-episode snapshot/restore is a
single orbax save/restore — which also covers model parameters and batched
multi-episode state for preemption-safe fleet runs.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any

import jax


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.StandardCheckpointer()


def save_pytree(path: str, tree: Any) -> str:
    """Save any pytree (PolicyState, model params, batched state) to ``path``."""
    p = Path(path).absolute()
    ckpt = _checkpointer()
    ckpt.save(p, tree, force=True)
    ckpt.wait_until_finished()
    return str(p)


def restore_pytree(path: str, like: Any) -> Any:
    """Restore a pytree saved by ``save_pytree``; ``like`` supplies structure
    and shapes (e.g. a freshly created PolicyState)."""
    import orbax.checkpoint as ocp

    targets = jax.tree_util.tree_map(
        lambda x: ocp.utils.to_shape_dtype_struct(x) if hasattr(x, "dtype") else x,
        like,
    )
    ckpt = _checkpointer()
    return ckpt.restore(Path(path).absolute(), targets)
