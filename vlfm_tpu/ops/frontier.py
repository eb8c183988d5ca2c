"""Frontier detection: boundary between explored space and unexplored
navigable space, grouped into segments, one waypoint per segment.

Owns the algorithm the reference delegates to the external
``frontier_exploration`` package (obstacle_map.py:7-8,155-169):

1. dilate the explored area (5x5) so 1-2 px gaps against walls don't read as
   frontiers (obstacle_map.py:159-163),
2. drop unexplored pockets smaller than the area threshold (the px^2
   threshold from obstacle_map.py:41),
3. frontier cells = unexplored-navigable cells adjacent to the explored area,
4. group frontier cells into 8-connected segments,
5. waypoint = the segment member closest to the segment centroid (the
   reference uses the midpoint along the contour; for the thin, mostly
   convex segments frontiers form these coincide to within a pixel or two).

Step 4 is the TPU trick: frontier cells are sparse (<= P of them), so we
extract their coordinates and run transitive closure on the P x P adjacency
matrix by repeated boolean matrix squaring — O(log diameter) MXU matmuls
instead of data-dependent contour walking.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from vlfm_tpu.ops.flood import remove_small_components_coarse
from vlfm_tpu.ops.morphology import dilate
from vlfm_tpu.ops.sparse import first_nonzero_coords, first_nonzero_indices


class Frontiers(NamedTuple):
    waypoints_px: jnp.ndarray  # (F, 2) float32 (row, col)
    valid: jnp.ndarray  # (F,) bool
    sizes: jnp.ndarray  # (F,) int32 segment pixel counts
    overflow: jnp.ndarray  # () bool — more than P frontier cells existed


def _cluster_sparse(coords: jnp.ndarray, valid: jnp.ndarray, num_closure_steps: int) -> jnp.ndarray:
    """Labels (min member index) of 8-connected clusters among sparse points.

    coords: (P, 2) int32; valid: (P,). Transitive closure of the adjacency
    matrix via repeated squaring on the MXU.
    """
    p = coords.shape[0]
    d = coords[:, None, :] - coords[None, :, :]
    cheb = jnp.max(jnp.abs(d), axis=-1)
    adj = (cheb <= 1) & valid[:, None] & valid[None, :]
    adj = adj | jnp.eye(p, dtype=bool)

    def body(_, a):
        af = a.astype(jnp.float32)
        return jnp.matmul(af, af, precision=jax.lax.Precision.DEFAULT) > 0.5

    closure = jax.lax.fori_loop(0, num_closure_steps, body, adj)
    # label = smallest reachable index = first True column
    return jnp.argmax(closure, axis=1).astype(jnp.int32)


@partial(
    jax.jit,
    static_argnames=("max_cells", "max_frontiers", "coarse_factor"),
)
def detect_frontiers(
    navigable: jnp.ndarray,  # (S, S) bool
    explored: jnp.ndarray,  # (S, S) bool
    area_thresh_px: jnp.ndarray,  # scalar float/int (px^2)
    *,
    max_cells: int = 512,
    max_frontiers: int = 32,
    coarse_factor: int = 4,
) -> Frontiers:
    from vlfm_tpu.ops.bitpack import (
        dilate8_packed,
        first_set_bits_packed,
        pack_cols,
        unpack_cols,
    )

    packed_ok = explored.shape[1] % 32 == 0
    if packed_ok:
        expl_p = pack_cols(explored)
        expl_d_p = dilate8_packed(dilate8_packed(expl_p))  # 5x5
        un_p = pack_cols(navigable) & ~expl_d_p
        unexplored = unpack_cols(un_p, explored.shape[1])
    else:
        explored_d = dilate(explored, 5)
        unexplored = navigable & ~explored_d
    # max_iters bounds the coarse labeling: pockets below any realistic area
    # threshold converge within ~thresh/factor^2 iterations; unconverged
    # (necessarily large) regions split into pieces each bigger than that.
    unexplored = remove_small_components_coarse(
        unexplored,
        jnp.asarray(area_thresh_px, jnp.float32),
        factor=coarse_factor,
        max_iters=48,
    )

    if packed_ok:
        frontier_p = pack_cols(unexplored) & dilate8_packed(expl_d_p)
        rows, cols, valid = first_set_bits_packed(frontier_p, max_cells)
        n_frontier = jax.lax.population_count(frontier_p).sum()
    else:
        explored_d = dilate(explored, 5)
        frontier_mask = unexplored & dilate(explored_d, 3)
        rows, cols, valid = first_nonzero_coords(frontier_mask, max_cells)
        n_frontier = frontier_mask.sum()
    coords = jnp.stack([rows, cols], axis=-1).astype(jnp.int32)
    coords = jnp.where(valid[:, None], coords, -1)
    overflow = n_frontier > max_cells

    # ceil(log2(max_cells)) squarings give full closure for any diameter
    steps = max(1, (max_cells - 1).bit_length())
    labels = _cluster_sparse(coords, valid, steps)

    roots = valid & (labels == jnp.arange(max_cells))
    root_idx, f_valid = first_nonzero_indices(roots, max_frontiers)
    root_idx = jnp.where(f_valid, root_idx, -1)

    member = labels[None, :] == root_idx[:, None].clip(0)  # (F, P)
    member = member & valid[None, :] & f_valid[:, None]
    sizes = member.sum(axis=1).astype(jnp.int32)

    cf = coords.astype(jnp.float32)
    centroid = (member[..., None] * cf[None]).sum(axis=1) / jnp.maximum(sizes, 1)[:, None]
    d2 = ((cf[None] - centroid[:, None]) ** 2).sum(-1)
    d2 = jnp.where(member, d2, jnp.inf)
    pick = jnp.argmin(d2, axis=1)
    waypoints = cf[pick]
    waypoints = jnp.where(f_valid[:, None], waypoints, -1.0)

    return Frontiers(waypoints_px=waypoints, valid=f_valid, sizes=sizes, overflow=overflow)
