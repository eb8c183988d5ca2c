"""Analytic FOV-cone visibility/confidence kernel.

Replaces the reference pipeline (vlfm/mapping/value_map.py:221-355) which:
  1. rasterizes an ellipse sector with cv2 (``_get_blank_cone_mask:321``),
  2. fills a per-pixel cos^2 falloff with a Python double loop
     (``_get_confidence_mask:337`` — O(grid^2) Python),
  3. squashes the depth image to a row of per-column max depths, builds a
     polygon contour from them and carves it out with cv2.drawContours
     (``_process_local_data:221``),
  4. rotates the mask by -yaw with cv2.warpAffine and pastes it at the camera
     pixel (``_localize_new_data:288``).

Here all four steps collapse into ONE fused elementwise computation over a
fixed (window x window) region centred on the camera pixel: every pixel
computes its (forward, lateral) offset in the camera frame directly in the
episodic orientation — no rasterization, no warp, no resampling. This is the
TPU-native formulation: static shapes, pure VPU math, vmappable over episodes
and cameras.

Conventions (see vlfm_tpu/mapping/grid.py): row ~ +x world, col ~ -y world.
Depth-image column 0 is the LEFT edge of the view and maps to bearing -fov/2.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

MIN_CONFIDENCE = 0.25  # reference: value_map.py:40


def depth_row_max(depth: jnp.ndarray, min_depth: float, max_depth: float) -> jnp.ndarray:
    """Squash a normalized [0,1] depth image to per-column max metric depth.

    Mirrors value_map.py:230-234.
    """
    if depth.ndim == 3:
        depth = depth.squeeze(-1)
    return jnp.max(depth, axis=0) * (max_depth - min_depth) + min_depth


@partial(jax.jit, static_argnames=("window", "pixels_per_meter"))
def visible_confidence_window(
    depth_row_m: jnp.ndarray,
    yaw: jnp.ndarray,
    fov: jnp.ndarray,
    max_depth: jnp.ndarray,
    *,
    window: int = 256,
    pixels_per_meter: int = 20,
) -> jnp.ndarray:
    """(window, window) confidence-weighted visibility mask around the camera.

    The camera sits at the window centre with heading ``yaw`` (episodic frame).
    A pixel is visible iff it is inside the FOV wedge, within ``max_depth``
    radially, and not occluded — i.e. its forward (camera-frame) coordinate is
    at most the interpolated per-bearing depth limit from ``depth_row_m``.
    Visible pixels get the cos^2 angular confidence falloff remapped to
    [MIN_CONFIDENCE, 1] (value_map.py:337-355); everything else is 0.
    """
    w = depth_row_m.shape[0]
    pps = float(pixels_per_meter)
    half = window // 2

    dr = (jnp.arange(window, dtype=jnp.float32) - half)[:, None] / pps  # world dx
    dc = (jnp.arange(window, dtype=jnp.float32) - half)[None, :] / pps
    dx = dr + jnp.zeros((1, window), jnp.float32)
    dy = -dc + jnp.zeros((window, 1), jnp.float32)  # world dy (col axis is -y)

    cos_t, sin_t = jnp.cos(yaw), jnp.sin(yaw)
    fwd = dx * cos_t + dy * sin_t
    left = -dx * sin_t + dy * cos_t
    # Bearing within the view: negative on the LEFT (column 0 of the image).
    phi = jnp.arctan2(-left, fwd)
    radial = jnp.sqrt(fwd * fwd + left * left)

    # Per-bearing forward depth limit, interpolated from the image columns.
    # The column-angle grid is UNIFORM, so interpolation is direct index
    # arithmetic + one lerp — jnp.interp's binary search would cost ~10
    # serialized gather rounds per pixel on TPU.
    u = jnp.clip((phi + fov / 2) / fov * (w - 1), 0.0, w - 1.0)
    i0 = jnp.floor(u).astype(jnp.int32)
    i1 = jnp.minimum(i0 + 1, w - 1)
    frac = u - i0.astype(u.dtype)
    z_limit = depth_row_m[i0] * (1.0 - frac) + depth_row_m[i1] * frac

    half_px = 0.5 / pps  # half-pixel tolerance vs. the rasterized contour
    visible = (
        (jnp.abs(phi) <= fov / 2)
        & (radial <= max_depth)
        & (fwd <= z_limit + half_px)
    )

    # cos^2 falloff on |bearing|, remapped [0, fov/2] -> [0, pi/2] then
    # [0, 1] -> [MIN_CONFIDENCE, 1].
    ang = jnp.abs(phi) * (jnp.pi / 2) / (fov / 2)
    conf = jnp.cos(ang) ** 2
    conf = conf * (1.0 - MIN_CONFIDENCE) + MIN_CONFIDENCE
    return jnp.where(visible, conf, 0.0).astype(jnp.float32)
