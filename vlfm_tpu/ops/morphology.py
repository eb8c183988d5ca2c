"""Binary morphology as windowed reductions (VPU-native, no cv2).

Replaces cv2.dilate / cv2.erode with square structuring elements
(obstacle_map.py:105-109,125,159-163; object_point_cloud_map.py:152-153).
A dilation by a (k, k) ones kernel is exactly a (k, k) max-filter; erosion is
a min-filter. XLA lowers reduce_window to efficient fused loops on TPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _window_reduce(x: jnp.ndarray, k: int, init, op) -> jnp.ndarray:
    # Square max/min filters are separable: (1, k) then (k, 1) reduce_windows
    # touch 2k elements per output instead of k^2.
    x = jax.lax.reduce_window(
        x, init, op, window_dimensions=(1, k), window_strides=(1, 1), padding="SAME"
    )
    return jax.lax.reduce_window(
        x, init, op, window_dimensions=(k, 1), window_strides=(1, 1), padding="SAME"
    )


def dilate(mask: jnp.ndarray, k: int) -> jnp.ndarray:
    """Binary dilation with a (k, k) ones kernel. ``mask`` is bool."""
    if k <= 1:
        return mask
    return _window_reduce(mask, k, False, jax.lax.bitwise_or)


def erode(mask: jnp.ndarray, k: int) -> jnp.ndarray:
    """Binary erosion with a (k, k) ones kernel (zero-padded like cv2)."""
    if k <= 1:
        return mask
    return _window_reduce(mask, k, True, jax.lax.bitwise_and)


def erode_repeated_3x3(mask: jnp.ndarray, iterations: int) -> jnp.ndarray:
    """cv2.erode(kernel=None, iterations=n) == n erosions with a 3x3 cross.

    cv2's default structuring element is the 3x3 full rectangle; n iterations
    of a 3x3 rect equal one (2n+1, 2n+1) rect erosion.
    """
    if iterations <= 0:
        return mask
    return erode(mask, 2 * iterations + 1)


def max_pool_downsample(mask: jnp.ndarray, factor: int) -> jnp.ndarray:
    """Coarsen a bool mask: any set pixel in a (factor, factor) tile sets it."""
    h, w = mask.shape
    return mask.reshape(h // factor, factor, w // factor, factor).any(axis=(1, 3))


def upsample_nearest(mask: jnp.ndarray, factor: int) -> jnp.ndarray:
    return jnp.repeat(jnp.repeat(mask, factor, axis=0), factor, axis=1)
