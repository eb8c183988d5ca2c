"""Shared top-down grid conventions for all episodic maps.

The reference keeps 1000x1000 @ 20 px/m NumPy maps (vlfm/mapping/base_map.py:15-24)
with the world->pixel convention (derived from base_map.py:35-46 as actually
indexed by obstacle_map.py:99-101 and value_map.py:309-317):

    row = round(x * pixels_per_meter) + origin_row
    col = origin_col - round(y * pixels_per_meter)

i.e. world +x is down-rows and world +y is up-cols ("left" is increasing x
... decreasing col). All maps here share that convention so waypoints are
interchangeable.

TPU design: the stored array is padded by ``pad`` pixels on every side so that
window-local updates (dynamic_slice of a fixed WINDOW x WINDOW region around
the camera) never need clamping while the camera is inside the logical map.
All functions are jit/vmap friendly (no data-dependent shapes).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp


@dataclass(frozen=True)
class GridSpec2D:
    """Static description of an episodic top-down grid."""

    size: int = 1024  # logical H == W, pixels
    pixels_per_meter: int = 20
    pad: int = 160  # storage padding per side, >= splat_window//2 (see obstacle_map)

    @property
    def storage_size(self) -> int:
        return self.size + 2 * self.pad

    @property
    def origin(self) -> int:
        """Pixel of world (0, 0) in logical coordinates (row == col)."""
        return self.size // 2

    # --- world <-> logical pixel ------------------------------------------------
    def xy_to_px(self, xy: jnp.ndarray) -> jnp.ndarray:
        """(..., 2) world meters -> (..., 2) int32 (row, col), logical frame."""
        x, y = xy[..., 0], xy[..., 1]
        row = jnp.rint(x * self.pixels_per_meter).astype(jnp.int32) + self.origin
        col = self.origin - jnp.rint(y * self.pixels_per_meter).astype(jnp.int32)
        return jnp.stack([row, col], axis=-1)

    def px_to_xy(self, rc: jnp.ndarray) -> jnp.ndarray:
        """(..., 2) (row, col) logical pixels -> (..., 2) world meters."""
        row = rc[..., 0].astype(jnp.float32)
        col = rc[..., 1].astype(jnp.float32)
        x = (row - self.origin) / self.pixels_per_meter
        y = (self.origin - col) / self.pixels_per_meter
        return jnp.stack([x, y], axis=-1)

    # --- logical <-> storage ----------------------------------------------------
    def to_storage(self, rc: jnp.ndarray) -> jnp.ndarray:
        return rc + self.pad

    def in_bounds(self, rc: jnp.ndarray) -> jnp.ndarray:
        return jnp.all((rc >= 0) & (rc < self.size), axis=-1)

    def crop_logical(self, arr: jnp.ndarray) -> jnp.ndarray:
        """Strip padding: storage array -> logical (size, size[, C]) view."""
        return arr[self.pad : self.pad + self.size, self.pad : self.pad + self.size]

    def zeros(self, dtype=jnp.float32, channels: int | None = None) -> jnp.ndarray:
        s = self.storage_size
        shape = (s, s) if channels is None else (s, s, channels)
        return jnp.zeros(shape, dtype)
