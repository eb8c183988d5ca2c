"""resize_bilinear (ops/resize.py) must match jax.image.resize("linear") —
it replaces it on the perception hot path (SAM input upscale, mask
downscale; reference seams: obs_transformers/resize.py:56-72)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vlfm_tpu.ops.resize import resize_bilinear, resize_bilinear_hw


@pytest.mark.parametrize("hin,win,hout,wout", [
    (480, 640, 1024, 1024),   # SAM input upscale
    (256, 256, 480, 640),     # SAM mask back to depth resolution
    (64, 64, 64, 64),         # identity
    (480, 640, 224, 224),     # obs resize (downscale)
])
def test_matches_jax_image_resize(hin, win, hout, wout):
    x = jax.random.uniform(jax.random.PRNGKey(0), (2, hin, win, 3))
    want = jax.image.resize(x, (2, hout, wout, 3), "linear")
    got = resize_bilinear(x, hout, wout)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_mask_resize_hw():
    m = jax.random.uniform(jax.random.PRNGKey(1), (2, 5, 64, 64)) > 0.5
    want = jax.image.resize(m.astype(jnp.float32), (2, 5, 96, 128), "linear") > 0.5
    got = resize_bilinear_hw(m.astype(jnp.float32), 96, 128) > 0.5
    agree = float(jnp.mean(got == want))
    assert agree > 0.995, agree


@pytest.mark.parametrize("hin,win,hout,wout", [
    (480, 640, 224, 224),     # BLIP2 preprocess (bicubic downscale)
    (64, 64, 96, 96),         # bicubic upscale
])
def test_matches_jax_cubic(hin, win, hout, wout):
    from vlfm_tpu.ops.resize import resize_matmul

    x = jax.random.uniform(jax.random.PRNGKey(2), (2, hin, win, 3))
    want = jax.image.resize(x, (2, hout, wout, 3), "cubic")
    got = resize_matmul(x, hout, wout, "cubic")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)
