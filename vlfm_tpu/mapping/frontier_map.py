"""V1 frontier map: cache one ITM cosine per frontier at first appearance.

Parity target: vlfm/mapping/frontier_map.py (FrontierMap) used by ITMPolicy
V1 (itm_policy.py:219-247): each frontier is scored ONCE, with the cosine of
the image observed when the frontier first appeared; stale frontiers are
evicted when they leave the current frontier list.

Functional fixed-capacity formulation: (N, 2) positions + cosines + valid
mask. Update is pure jnp (match by exact position equality, like the
reference's np.array_equal loop); the caller supplies this step's cosine
(computed only when at least one new frontier appears, matching the lazy
encode at frontier_map.py:47-52 — expose ``needs_encoding`` first).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class FrontierMapState(NamedTuple):
    positions: jnp.ndarray  # (N, 2)
    cosines: jnp.ndarray  # (N,)
    valid: jnp.ndarray  # (N,)


def create(capacity: int = 64) -> FrontierMapState:
    return FrontierMapState(
        positions=jnp.zeros((capacity, 2)),
        cosines=jnp.zeros(capacity),
        valid=jnp.zeros(capacity, bool),
    )


def reset(state: FrontierMapState) -> FrontierMapState:
    return create(state.positions.shape[0])


def _matches(stored, stored_valid, frontiers, f_valid):
    """(N, F) exact-position match matrix."""
    eq = jnp.all(stored[:, None, :] == frontiers[None, :, :], axis=-1)
    return eq & stored_valid[:, None] & f_valid[None, :]


def needs_encoding(state: FrontierMapState, frontiers, f_valid) -> jnp.ndarray:
    """True iff any current frontier is not yet cached (frontier_map.py:47-49)."""
    m = _matches(state.positions, state.valid, frontiers, f_valid)
    return (f_valid & ~m.any(axis=0)).any()


def update(
    state: FrontierMapState,
    frontiers: jnp.ndarray,  # (F, 2)
    f_valid: jnp.ndarray,  # (F,)
    cosine: jnp.ndarray,  # () this step's image/text cosine
) -> FrontierMapState:
    n = state.positions.shape[0]
    m = _matches(state.positions, state.valid, frontiers, f_valid)

    # evict stored frontiers no longer present (frontier_map.py:38-43)
    keep = state.valid & m.any(axis=1)

    # insert new frontiers with this step's cosine (frontier_map.py:46-52)
    is_new = f_valid & ~m.any(axis=0)
    free = ~keep
    # slot for the j-th new frontier = j-th free slot
    new_rank = jnp.cumsum(is_new) - 1  # rank among new frontiers
    free_idx = jnp.cumsum(free) - 1  # rank among free slots
    # build assignment (N, F): free slot i takes new frontier j iff ranks align
    assign = (
        free[:, None]
        & is_new[None, :]
        & (free_idx[:, None] == new_rank[None, :])
    )
    take = assign.any(axis=1)
    src = jnp.argmax(assign, axis=1)
    positions = jnp.where(take[:, None], frontiers[src], state.positions)
    cosines = jnp.where(take, cosine, state.cosines)
    valid = keep | take
    return FrontierMapState(positions, cosines, valid)


def sort_waypoints(state: FrontierMapState):
    """Descending by cached cosine (frontier_map.py:66-77)."""
    v = jnp.where(state.valid, state.cosines, -jnp.inf)
    order = jnp.argsort(-v, stable=True)
    return state.positions[order], v[order], state.valid[order]
