"""Image utilities on device.

The reference's torch ``image_resize`` (obs_transformers/utils.py:9-48, mode
'area') becomes an antialiased linear resample — implemented as two dense
interpolation matmuls (ops/resize.py) so the per-step depth downscale rides
the MXU instead of XLA's gather lowering.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from vlfm_tpu.ops.resize import resize_bilinear, resize_bilinear_hw


@partial(jax.jit, static_argnames=("shape",))
def resize_area(img: jnp.ndarray, shape: tuple) -> jnp.ndarray:
    """Resize (H, W[, C]) or (B, H, W, C) to the given spatial shape."""
    if img.ndim == 2:
        return resize_bilinear_hw(img, shape[0], shape[1])
    return resize_bilinear(img, shape[0], shape[1])
