"""Image utilities on device.

The reference's torch ``image_resize`` (obs_transformers/utils.py:9-48, mode
'area') becomes jax.image.resize with antialiased linear filtering — for
downscales this is the same box-filter family XLA fuses well.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("shape",))
def resize_area(img: jnp.ndarray, shape: tuple) -> jnp.ndarray:
    """Resize (H, W[, C]) or (B, H, W, C) to the given spatial shape."""
    if img.ndim == 2:
        return jax.image.resize(img, shape, method="linear", antialias=True)
    if img.ndim == 3:
        return jax.image.resize(img, (*shape, img.shape[-1]), method="linear", antialias=True)
    return jax.image.resize(
        img, (img.shape[0], *shape, img.shape[-1]), method="linear", antialias=True
    )
