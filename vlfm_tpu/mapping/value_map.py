"""Functional value map: semantic value + confidence over the episodic grid.

Parity target: vlfm/mapping/value_map.py (class ValueMap). State is a pytree of
fixed-shape arrays so episodes can be vmapped and the whole per-step update
jitted as one XLA program. The fusion math matches the reference:

- confidence-cone projection of the current view (see vlfm_tpu/ops/cone.py),
- "silence" pixels whose new confidence is below the decision threshold AND
  below the stored confidence (value_map.py:396-399),
- then either max-confidence replacement (:401-408) or confidence-weighted
  averaging (:409-429), plus the 'replace' / 'equal_weighting' ablations
  (:377-391).

The update itself is window-local (the cone only covers max_depth metres), so
per-step cost is O(window^2), not O(grid^2).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from vlfm_tpu.mapping.grid import GridSpec2D
from vlfm_tpu.ops.cone import depth_row_max, visible_confidence_window
from vlfm_tpu.ops.windows import read_window, write_window
from vlfm_tpu.utils.geometry import extract_yaw

DECISION_THRESHOLD = 0.35  # reference: value_map.py:41

FUSION_DEFAULT = 0
FUSION_REPLACE = 1
FUSION_EQUAL_WEIGHTING = 2


class ValueMapState(NamedTuple):
    conf: jnp.ndarray  # (S, S) float32 confidence (reference `_map`)
    values: jnp.ndarray  # (S, S, C) float32 (reference `_value_map`)


def create(spec: GridSpec2D, value_channels: int) -> ValueMapState:
    return ValueMapState(conf=spec.zeros(), values=spec.zeros(channels=value_channels))


def reset(state: ValueMapState) -> ValueMapState:
    return ValueMapState(jnp.zeros_like(state.conf), jnp.zeros_like(state.values))


@partial(
    jax.jit,
    static_argnames=("spec", "window", "use_max_confidence", "fusion_type"),
)
def update(
    state: ValueMapState,
    spec: GridSpec2D,
    values: jnp.ndarray,  # (C,)
    depth: jnp.ndarray,  # (H, W) normalized [0, 1]
    tf_camera_to_episodic: jnp.ndarray,  # (4, 4)
    min_depth: float,
    max_depth: float,
    fov: float,
    *,
    window: int = 256,
    use_max_confidence: bool = True,
    fusion_type: int = FUSION_DEFAULT,
    explored: Optional[jnp.ndarray] = None,  # (S, S) bool; sync_explored_areas
) -> ValueMapState:
    """One observation update. Mirrors ValueMap.update_map (value_map.py:100)."""
    cam_xy = tf_camera_to_episodic[:2, 3]
    yaw = extract_yaw(tf_camera_to_episodic)
    rc = spec.to_storage(spec.xy_to_px(cam_xy))

    row_m = depth_row_max(depth, min_depth, max_depth)
    new_conf = visible_confidence_window(
        row_m,
        yaw,
        jnp.float32(fov),
        jnp.float32(max_depth),
        window=window,
        pixels_per_meter=spec.pixels_per_meter,
    )

    conf_w = read_window(state.conf, rc, window)
    vals_w = read_window(state.values, rc, window)

    if explored is not None:
        # Zero everything outside the explored area (value_map.py:369-375).
        # The stored maps are masked globally; the new data only in-window.
        state = ValueMapState(
            conf=jnp.where(explored, state.conf, 0.0),
            values=jnp.where(explored[..., None], state.values, 0.0),
        )
        expl_w = read_window(explored, rc, window)
        new_conf = jnp.where(expl_w, new_conf, 0.0)
        conf_w = jnp.where(expl_w, conf_w, 0.0)
        vals_w = jnp.where(expl_w[..., None], vals_w, 0.0)

    if fusion_type == FUSION_REPLACE:
        # Ablation: current observation overwrites (value_map.py:377-385).
        seen = new_conf > 0
        conf_w = jnp.where(seen, new_conf, conf_w)
        vals_w = jnp.where(seen[..., None], values[None, None, :], vals_w)
        state = ValueMapState(
            conf=write_window(state.conf, conf_w, rc),
            values=write_window(state.values, vals_w, rc),
        )
        return state

    if fusion_type == FUSION_EQUAL_WEIGHTING:
        # Ablation: force both confidences to 1 where nonzero (:386-391).
        conf_w = jnp.where(conf_w > 0, 1.0, conf_w)
        new_conf = jnp.where(new_conf > 0, 1.0, new_conf)

    # Silence low-confidence new pixels (:396-399).
    silence = (new_conf < DECISION_THRESHOLD) & (new_conf < conf_w)
    new_conf = jnp.where(silence, 0.0, new_conf)

    if use_max_confidence:
        higher = new_conf > conf_w
        vals_w = jnp.where(higher[..., None], values[None, None, :], vals_w)
        conf_w = jnp.where(higher, new_conf, conf_w)
    else:
        denom = conf_w + new_conf
        safe = jnp.where(denom == 0, 1.0, denom)
        w1 = jnp.where(denom == 0, 0.0, conf_w / safe)
        w2 = jnp.where(denom == 0, 0.0, new_conf / safe)
        vals_w = vals_w * w1[..., None] + values[None, None, :] * w2[..., None]
        conf_w = conf_w * w1 + new_conf * w2

    return ValueMapState(
        conf=write_window(state.conf, conf_w, rc),
        values=write_window(state.values, vals_w, rc),
    )


def _masked_median(vals: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """Median of ``vals`` where ``valid``; -1 if none valid (img_utils.py:254-264).

    Radix-bisection selection (ops/median.py) — exact, and much cheaper on TPU
    than the bitonic network XLA emits for per-window ``jnp.sort``."""
    from vlfm_tpu.ops.median import masked_median

    return masked_median(vals.reshape(-1), valid.reshape(-1))


@partial(jax.jit, static_argnames=("spec", "radius_px"))
def waypoint_values(
    state: ValueMapState,
    spec: GridSpec2D,
    waypoints: jnp.ndarray,  # (K, 2) world meters (padded)
    valid: jnp.ndarray,  # (K,) bool
    *,
    radius_px: int,
) -> jnp.ndarray:
    """Per-waypoint per-channel median of nonzero values within a radius.

    Mirrors ValueMap.sort_waypoints' value extraction (value_map.py:146-176 via
    img_utils.pixel_value_within_radius:213-266, reduction='median'). Returns
    (K, C); invalid waypoints get -1.
    """
    win = 2 * radius_px + 1
    dr = jnp.arange(win) - radius_px
    circle = (dr[:, None] ** 2 + dr[None, :] ** 2) <= radius_px**2

    def one(wp, ok):
        rc = spec.to_storage(spec.xy_to_px(wp))
        block = read_window(state.values, rc, win)  # (win, win, C)
        m = circle[..., None] & (block > 0)
        per_c = jax.vmap(_masked_median, in_axes=(-1, -1))(block, m)
        return jnp.where(ok, per_c, -1.0)

    return jax.vmap(one)(waypoints, valid)


def sort_waypoints_single_channel(
    values: jnp.ndarray, waypoints: jnp.ndarray, valid: jnp.ndarray
):
    """Descending stable sort; invalid waypoints sink to the end with -inf."""
    v = jnp.where(valid, values, -jnp.inf)
    order = jnp.argsort(-v, stable=True)
    return waypoints[order], v[order], order
