"""Functional obstacle/explored map with on-device frontier detection.

Parity target: vlfm/mapping/obstacle_map.py (class ObstacleMap) plus the
external ``frontier_exploration`` calls it makes. Per step:

1. fill depth holes (obstacle_map.py:87-91), scale to meters, back-project
   the sub-max-depth pixels to a camera-frame cloud (:92-94),
2. transform to the episodic frame, band-pass by obstacle height (:95-96),
3. splat xy into the boolean obstacle grid (:98-101),
4. navigable = NOT dilate(obstacles, agent-diameter kernel) (:104-109),
5. reveal the FOV fog-of-war cone against the navigable grid, dilate 3x3, OR
   into the explored area, clear non-navigable cells (:114-127),
6. keep only the explored region containing the agent (:128-146) — here a
   geodesic flood fill from the agent cell instead of cv2 contour tests,
7. detect frontier waypoints (:148-169) — see vlfm_tpu/ops/frontier.py.

All steps are window-local around the camera except the flood (global) and
frontier detection (global); the full update jits into one XLA program and
vmaps over an episode batch.

Deviations from the reference (documented):
- hole filling uses a global hole-fraction guard instead of per-contour area
  (holes are filled unless the whole frame is mostly holes); the reference
  threshold (100000 px^2 of a 307200 px image) has the same practical effect.
- the small-unexplored-pocket filter runs at 4x coarse resolution.
- if the agent's cell is not itself explored, the flood seeds from a small
  disk around it; if the intersection is empty the prune is skipped (the
  reference falls back to the nearest contour).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from vlfm_tpu.mapping.grid import GridSpec2D
from vlfm_tpu.ops.flood import flood_from_seed
from vlfm_tpu.ops.fog_of_war import reveal_fog_of_war_window
from vlfm_tpu.ops.frontier import detect_frontiers
from vlfm_tpu.ops.morphology import dilate
from vlfm_tpu.ops.raster import splat_depth_to_window
from vlfm_tpu.ops.windows import read_window, write_window
from vlfm_tpu.utils.geometry import extract_yaw


class ObstacleMapState(NamedTuple):
    obstacles: jnp.ndarray  # (S, S) bool
    navigable: jnp.ndarray  # (S, S) bool
    explored: jnp.ndarray  # (S, S) bool
    frontiers_xy: jnp.ndarray  # (F, 2) float32 world meters
    frontiers_valid: jnp.ndarray  # (F,) bool
    frontier_overflow: jnp.ndarray  # () bool


def create(spec: GridSpec2D, max_frontiers: int = 32) -> ObstacleMapState:
    s = spec.storage_size
    return ObstacleMapState(
        obstacles=jnp.zeros((s, s), bool),
        navigable=jnp.ones((s, s), bool),
        explored=jnp.zeros((s, s), bool),
        frontiers_xy=jnp.full((max_frontiers, 2), -1.0, jnp.float32),
        frontiers_valid=jnp.zeros(max_frontiers, bool),
        frontier_overflow=jnp.bool_(False),
    )


def reset(state: ObstacleMapState) -> ObstacleMapState:
    return ObstacleMapState(
        jnp.zeros_like(state.obstacles),
        jnp.ones_like(state.navigable),
        jnp.zeros_like(state.explored),
        jnp.full_like(state.frontiers_xy, -1.0),
        jnp.zeros_like(state.frontiers_valid),
        jnp.bool_(False),
    )


def fill_depth_holes(depth: jnp.ndarray, max_hole_fraction: float = 0.33) -> jnp.ndarray:
    """Set zero-depth holes to 1.0 ("far") unless most of the frame is holes.

    Stands in for img_utils.fill_small_holes:361-390 (per-contour area test
    with a ~1/3-image threshold); see module docstring.
    """
    holes = depth == 0
    fill = holes.mean() < max_hole_fraction
    return jnp.where(holes & fill, 1.0, depth)


def _agent_kernel_size(spec: GridSpec2D, agent_radius: float) -> int:
    # Reference: kernel = round(pixels_per_meter * agent_radius * 2) to odd
    # (obstacle_map.py:43-46).
    k = int(spec.pixels_per_meter * agent_radius * 2)
    return k + (k % 2 == 0)


@partial(
    jax.jit,
    static_argnames=(
        "spec",
        "window",
        "splat_window",
        "agent_radius",
        "explore",
        "update_obstacles",
        "max_frontier_cells",
        "max_frontiers",
    ),
)
def update(
    state: ObstacleMapState,
    spec: GridSpec2D,
    depth: jnp.ndarray,  # (H, W) normalized [0, 1]
    tf_camera_to_episodic: jnp.ndarray,
    min_depth: float,
    max_depth: float,
    fx: float,
    fy: float,
    topdown_fov: float,
    min_height: float,
    max_height: float,
    area_thresh_m2: float,
    full_prune: jnp.ndarray | bool = True,
    *,
    agent_radius: float = 0.18,
    window: int = 224,
    splat_window: int = 288,
    explore: bool = True,
    update_obstacles: bool = True,
    max_frontier_cells: int = 512,
    max_frontiers: int = 32,
) -> ObstacleMapState:
    cam_xy = tf_camera_to_episodic[:2, 3]
    yaw = extract_yaw(tf_camera_to_episodic)
    rc = spec.to_storage(spec.xy_to_px(cam_xy))
    kernel = _agent_kernel_size(spec, agent_radius)
    halo = kernel // 2

    obstacles, navigable = state.obstacles, state.navigable

    if update_obstacles:
        filled = fill_depth_holes(depth)
        scaled = filled * (max_depth - min_depth) + min_depth
        # Episodic height of each pixel: z_epi = cam_z - (v - H/2) * z / fy
        # (yaw rotates about z, so the height band never needs the 4x4
        # transform the reference applies to all 300k points).
        hgt = depth.shape[0]
        v = jnp.arange(hgt, dtype=scaled.dtype)[:, None]
        z_epi = tf_camera_to_episodic[2, 3] - (v - hgt // 2) * scaled / fy
        # Unfilled holes (catastrophic dropout frames) would otherwise read as
        # phantom obstacles at min_depth; exclude them. (The reference shares
        # this failure mode — its contour-area threshold also declines to fill
        # mostly-black frames, obstacle_map.py:87-93.)
        in_band = (
            (filled > 0) & (z_epi >= min_height) & (z_epi <= max_height)
        )
        # The splat window must cover the cone's far corners (radius
        # max_depth / cos(hfov/2) — see ops/raster.py); ``window`` only needs
        # to cover max_depth and is used for the cheaper explore stage.
        splat = splat_depth_to_window(
            scaled,
            in_band,
            yaw,
            jnp.float32(fx),
            jnp.float32(max_depth),
            window=splat_window,
            pixels_per_meter=spec.pixels_per_meter,
        )

        obs_w = read_window(obstacles, rc, splat_window) | splat
        obstacles = write_window(obstacles, obs_w, rc)

        # Navigable: recompute with a halo so dilation at the window edge is
        # correct (the rest of the map is untouched by this update).
        obs_h = read_window(obstacles, rc, splat_window + 2 * halo)
        nav_h = ~dilate(obs_h, kernel)
        nav_w = nav_h[halo : halo + splat_window, halo : halo + splat_window] if halo else nav_h
        navigable = write_window(navigable, nav_w, rc)

    if not explore:
        return state._replace(obstacles=obstacles, navigable=navigable)

    nav_w = read_window(navigable, rc, window)
    revealed = reveal_fog_of_war_window(
        nav_w,
        yaw,
        jnp.float32(topdown_fov),
        jnp.float32(max_depth * spec.pixels_per_meter),
    )
    revealed = dilate(revealed, 3)  # obstacle_map.py:125
    exp_w = read_window(state.explored, rc, window) | revealed
    explored = write_window(state.explored, exp_w, rc)
    explored = explored & navigable

    # Keep only the region containing the agent. Incremental flood: seed with
    # (previous kept region ∩ current explored) ∪ agent disk, so convergence
    # needs only as many sweeps as the newly revealed area is thick, instead
    # of re-growing from the agent across the whole map every step. When
    # ``full_prune`` is set (the policy raises it periodically) the seed is
    # the agent disk alone, which exactly reproduces the reference's
    # keep-the-contour-containing-the-agent behaviour (obstacle_map.py:128-146)
    # and evicts any region the incremental seeding kept across a split.
    agent_seed = jnp.zeros_like(explored)
    agent_seed = jax.lax.dynamic_update_slice(
        agent_seed, jnp.ones((9, 9), bool), (rc[0] - 4, rc[1] - 4)
    )
    seed = agent_seed | (state.explored & explored & ~jnp.asarray(full_prune, bool))
    kept = flood_from_seed(explored, seed)
    explored = jnp.where(kept.any(), kept, explored)

    fr = detect_frontiers(
        navigable,
        explored,
        jnp.float32(area_thresh_m2 * spec.pixels_per_meter**2),
        max_cells=max_frontier_cells,
        max_frontiers=max_frontiers,
    )
    fxy = spec.px_to_xy(fr.waypoints_px - spec.pad)
    fxy = jnp.where(fr.valid[:, None], fxy, 0.0)

    return ObstacleMapState(
        obstacles=obstacles,
        navigable=navigable,
        explored=explored,
        frontiers_xy=fxy,
        frontiers_valid=fr.valid,
        frontier_overflow=fr.overflow,
    )
