"""Window-local read/modify/write helpers over padded map storage.

All per-step map updates touch only a fixed (window x window) region around
the camera, so instead of streaming the full grid through the VPU every step
(the reference fuses over the whole 1000^2 array each update,
value_map.py:357-429), we dynamic-slice the window out of HBM, update it, and
write it back. Maps are stored padded (GridSpec2D.pad) so slices never clamp.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def read_window(arr: jnp.ndarray, center_storage_rc: jnp.ndarray, window: int) -> jnp.ndarray:
    """Slice a (window, window[, C]) block centred at ``center_storage_rc``."""
    start = (center_storage_rc[0] - window // 2, center_storage_rc[1] - window // 2)
    if arr.ndim == 2:
        return jax.lax.dynamic_slice(arr, start, (window, window))
    return jax.lax.dynamic_slice(arr, (*start, 0), (window, window, arr.shape[-1]))


def write_window(arr: jnp.ndarray, block: jnp.ndarray, center_storage_rc: jnp.ndarray) -> jnp.ndarray:
    window = block.shape[0]
    start = (center_storage_rc[0] - window // 2, center_storage_rc[1] - window // 2)
    if arr.ndim == 2:
        return jax.lax.dynamic_update_slice(arr, block, start)
    return jax.lax.dynamic_update_slice(arr, block, (*start, 0))
