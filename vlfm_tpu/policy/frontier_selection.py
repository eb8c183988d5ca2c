"""Best-frontier selection: value sort + stickiness + acyclic suppression.

Parity target: BaseITMPolicy._get_best_frontier (itm_policy.py:76-152):

1. sort frontiers by value, descending (stable, like np.argsort of negated
   values);
2. if the previously pursued frontier (or one within 0.5 m of it) is still
   present and its value is within 0.01 of the previous value, stick to it;
3. otherwise take the best frontier whose (position, frontier, top-two
   values) state-action is not in the acyclic history;
4. if every candidate is cyclic, fall back to the frontier FARTHEST from the
   robot;
5. record the chosen state-action and the value for the next step.

Everything is fixed-shape and branchless (jnp.where over candidate masks).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from vlfm_tpu.policy import acyclic as AC


class FrontierChoice(NamedTuple):
    frontier: jnp.ndarray  # (2,)
    value: jnp.ndarray  # ()
    any_valid: jnp.ndarray  # () bool
    acyclic: AC.AcyclicState
    last_value: jnp.ndarray
    last_frontier: jnp.ndarray


def select_best_frontier(
    frontiers: jnp.ndarray,  # (F, 2) world meters
    valid: jnp.ndarray,  # (F,) bool
    values: jnp.ndarray,  # (F,) reduced per-frontier values
    robot_xy: jnp.ndarray,  # (2,)
    last_frontier: jnp.ndarray,  # (2,) zeros sentinel = none
    last_value: jnp.ndarray,  # ()
    acyclic_state: AC.AcyclicState,
) -> FrontierChoice:
    f = frontiers.shape[0]
    any_valid = valid.any()

    v = jnp.where(valid, values, -jnp.inf)
    order = jnp.argsort(-v, stable=True)
    sorted_pts = frontiers[order]
    sorted_vals = v[order]
    sorted_valid = valid[order]

    top_two = jnp.where(
        jnp.arange(2) < valid.sum(), sorted_vals[:2], 0.0
    )  # pad like tuple(sorted_values[:2]) with <2 frontiers

    have_last = jnp.any(last_frontier != 0.0)
    # exact match first, else closest within 0.5 m (itm_policy.py:101-115)
    exact = sorted_valid & jnp.all(sorted_pts == last_frontier, axis=1)
    d_last = jnp.where(
        sorted_valid, jnp.linalg.norm(sorted_pts - last_frontier, axis=1), jnp.inf
    )
    close_idx = jnp.argmin(d_last)
    has_close = d_last[close_idx] <= 0.5
    exact_idx = jnp.argmax(exact)
    has_exact = exact.any()
    curr_index = jnp.where(has_exact, exact_idx, close_idx)
    has_curr = have_last & (has_exact | has_close)

    stick = has_curr & (sorted_vals[curr_index] + 0.01 > last_value)

    # best non-cyclic candidate in sorted order (itm_policy.py:128-135)
    cyclic = AC.check_cyclic_batch(acyclic_state, robot_xy, sorted_pts, top_two)
    cand = sorted_valid & ~cyclic
    noncyc_idx = jnp.argmax(cand)
    has_noncyc = cand.any()

    # fallback: farthest frontier from the robot (itm_policy.py:137-143)
    dist_robot = jnp.where(valid, jnp.linalg.norm(frontiers - robot_xy, axis=1), -jnp.inf)
    far_idx = jnp.argmax(dist_robot)

    use_sorted_idx = jnp.where(stick, curr_index, noncyc_idx)
    use_sorted = stick | has_noncyc
    best_frontier = jnp.where(use_sorted, sorted_pts[use_sorted_idx], frontiers[far_idx])
    best_value = jnp.where(use_sorted, sorted_vals[use_sorted_idx], v[far_idx])

    new_acyclic = AC.add(acyclic_state, robot_xy, best_frontier, top_two)
    return FrontierChoice(
        frontier=best_frontier,
        value=best_value,
        any_valid=any_valid,
        acyclic=new_acyclic,
        last_value=best_value,
        last_frontier=best_frontier,
    )


def reduce_values_v3(
    values: jnp.ndarray, valid: jnp.ndarray, exploration_thresh: float
) -> jnp.ndarray:
    """ITMPolicyV3 dual-channel reduction (itm_policy.py:296-316): use the
    target channel unless its best value is below the exploration threshold,
    in which case fall back to the exploration channel."""
    target = values[:, 0]
    explore = values[:, 1]
    max_target = jnp.max(jnp.where(valid, target, -jnp.inf))
    return jnp.where(max_target < exploration_thresh, explore, target)
