"""FOV-cone visibility ray-march over the occupancy grid (fog of war).

Replaces the external ``frontier_exploration.utils.fog_of_war
.reveal_fog_of_war`` call (obstacle_map.py:117-124): from the agent's cell,
cast rays across the camera FOV; cells along a ray are revealed until the ray
hits a non-navigable cell.

TPU-native formulation — two gather passes, no scatter, fully static shapes:

1. For each of R rays, sample the navigable mask at K unit steps and compute
   the per-ray first-hit distance as ``argmin`` over the cumulative
   "still free" product.
2. For each pixel of the (window x window) region around the agent, compute
   its (distance, bearing), look up the hit distance of the nearest ray, and
   reveal iff it is closer than both the hit and the max range.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("num_rays",))
def reveal_fog_of_war_window(
    navigable_window: jnp.ndarray,  # (W, W) bool, agent at centre
    heading: jnp.ndarray,  # world yaw, radians
    fov: jnp.ndarray,  # radians
    max_line_len_px: jnp.ndarray,  # max reveal radius in pixels
    *,
    num_rays: int = 240,
) -> jnp.ndarray:
    """(W, W) bool revealed mask. Map convention: drow ~ +x, dcol ~ -y."""
    w = navigable_window.shape[0]
    half = w // 2
    k_steps = half  # rays cannot leave the window

    bearings = heading + jnp.linspace(-fov / 2, fov / 2, num_rays)
    # direction in pixel space
    drow = jnp.cos(bearings)
    dcol = -jnp.sin(bearings)

    steps = jnp.arange(1, k_steps + 1, dtype=jnp.float32)
    rr = jnp.round(half + drow[:, None] * steps[None, :]).astype(jnp.int32)
    cc = jnp.round(half + dcol[:, None] * steps[None, :]).astype(jnp.int32)
    rr = jnp.clip(rr, 0, w - 1)
    cc = jnp.clip(cc, 0, w - 1)
    free = navigable_window[rr, cc]  # (R, K)

    # first blocked step per ray (K+1 if never blocked)
    blocked = ~free
    first_block = jnp.where(
        blocked.any(axis=1), jnp.argmax(blocked, axis=1) + 1, k_steps + 1
    ).astype(jnp.float32)
    hit_dist = jnp.minimum(first_block, max_line_len_px)

    # per-pixel reveal test
    pr = jnp.arange(w, dtype=jnp.float32) - half
    dy = pr[:, None] + jnp.zeros((1, w))
    dx = pr[None, :] + jnp.zeros((w, 1))
    dist = jnp.sqrt(dy * dy + dx * dx)
    bearing = jnp.arctan2(-dx, dy)  # atan2(-dcol, drow) -> world bearing
    rel = (bearing - heading + jnp.pi) % (2 * jnp.pi) - jnp.pi
    inside = jnp.abs(rel) <= fov / 2
    ray_idx = jnp.clip(
        jnp.round((rel + fov / 2) / fov * (num_rays - 1)).astype(jnp.int32),
        0,
        num_rays - 1,
    )
    limit = hit_dist[ray_idx]
    revealed = inside & (dist <= limit) & (dist <= max_line_len_px)
    # the agent's own cell is always revealed
    revealed = revealed.at[half, half].set(True)
    return revealed
