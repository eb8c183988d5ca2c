"""Separable image resize as two MXU matmuls.

Why: ``jax.image.resize`` lowers to gather/conv chains that cost ~5 ms per
call at the perception pipeline's shapes (e.g. upscaling a (8, 480, 640, 3)
frame to 1024² for SAM, or 10 SAM masks per image back to depth resolution);
the same separable resample is exactly a left-multiply by a (Hout, Hin)
interpolation matrix and a right-multiply by its (Win, Wout) column
counterpart — dense matmuls the MXU does in ~0.1 ms. The weight matrices are
tiny (≤ 1024×1024 f32), built once per (in, out, kernel) with numpy at trace
time and baked into the jit as constants.

Semantics match jax.image.resize (half-pixel centers; downscales are
anti-aliased by kernel dilation with out-of-range taps dropped and the
kernel renormalized), pinned by tests/test_resize.py for "linear" and
"cubic" (Keys a=-0.5).

Reference behavior: the reference resizes with cv2/F.interpolate at the same
seams (obs_transformers/resize.py:56-72, vlm/sam.py segment_bbox mask
return, lavis BLIP2 bicubic preprocessing).
"""

from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np


def _kernel(name: str):
    if name == "linear":
        return (lambda t: np.maximum(0.0, 1.0 - np.abs(t))), 1.0
    if name == "cubic":  # Keys cubic, a = -0.5 (jax.image.resize "cubic")
        a = -0.5

        def f(t):
            t = np.abs(t)
            return np.where(
                t <= 1.0,
                ((a + 2.0) * t - (a + 3.0)) * t * t + 1.0,
                np.where(t < 2.0, ((t - 5.0) * t + 8.0) * t * a - 4.0 * a, 0.0),
            )

        return f, 2.0
    raise ValueError(f"unknown resize kernel {name!r}")


@lru_cache(maxsize=64)
def _interp_matrix(n_in: int, n_out: int, kernel: str = "linear") -> np.ndarray:
    """(n_out, n_in) resampling weights, half-pixel convention, matching
    jax.image.resize for both magnification and (anti-aliased) minification."""
    f, support = _kernel(kernel)
    scale = n_in / n_out
    dilation = max(scale, 1.0)  # antialias: widen the kernel when shrinking
    w = np.zeros((n_out, n_in), np.float32)
    taps = np.arange(n_in, dtype=np.float64)
    for o in range(n_out):
        src = (o + 0.5) * scale - 0.5
        wt = f((taps - src) / dilation)
        s = wt.sum()
        if s > 0:
            w[o] = (wt / s).astype(np.float32)
    return w


def resize_matmul(
    x: jnp.ndarray, h_out: int, w_out: int, method: str = "linear"
) -> jnp.ndarray:
    """Resize the (..., H, W, C) spatial axes to (h_out, w_out) via two dense
    matmuls. f32 accumulation; output keeps the input dtype."""
    h_in, w_in = x.shape[-3], x.shape[-2]
    dt = x.dtype
    out = x
    if h_in != h_out:
        R = jnp.asarray(_interp_matrix(h_in, h_out, method))
        out = jnp.einsum("oh,...hwc->...owc", R, out.astype(jnp.float32))
    if w_in != w_out:
        C = jnp.asarray(_interp_matrix(w_in, w_out, method))
        out = jnp.einsum("ow,...hwc->...hoc", C, out.astype(jnp.float32))
    return out.astype(dt)


def resize_bilinear(x: jnp.ndarray, h_out: int, w_out: int) -> jnp.ndarray:
    return resize_matmul(x, h_out, w_out, "linear")


def resize_bilinear_hw(x: jnp.ndarray, h_out: int, w_out: int) -> jnp.ndarray:
    """Same for channel-less (..., H, W) arrays (e.g. depth, masks).

    Contracts H and W directly — appending a size-1 channel dim would make
    the lane dimension 1 and waste 127/128 of the VPU/MXU."""
    h_in, w_in = x.shape[-2], x.shape[-1]
    dt = x.dtype
    out = x
    if h_in != h_out:
        R = jnp.asarray(_interp_matrix(h_in, h_out, "linear"))
        out = jnp.einsum("oh,...hw->...ow", R, out.astype(jnp.float32))
    if w_in != w_out:
        C = jnp.asarray(_interp_matrix(w_in, w_out, "linear"))
        out = jnp.einsum("ow,...hw->...ho", C, out.astype(jnp.float32))
    return out.astype(dt)
