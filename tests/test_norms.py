"""Parity of the pallas layer_norm (ops/norms.py) and its FastLayerNorm
routing against reference f32 layernorm semantics — the kernel sits on the
serving path of every BLIP2/OWL-ViT norm."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vlfm_tpu.ops.norms import layer_norm


def _ref_ln(x, scale, bias, eps):
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(-1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + eps) * scale + bias).astype(x.dtype)


@pytest.mark.parametrize("shape,row_tile", [
    ((2, 7, 96), 4),       # ragged final row tile (14 rows, tile 4)
    ((3, 128), 128),       # exactly one tile
    ((1, 1, 33), 8),       # tiny feature dim
    ((260,), 256),         # 1 row total, big tile (pure edge padding)
])
def test_layer_norm_matches_reference(shape, row_tile):
    d = shape[-1]
    x = jax.random.normal(jax.random.PRNGKey(0), shape) * 2.0 + 0.5
    scale = 1.0 + 0.1 * jax.random.normal(jax.random.PRNGKey(1), (d,))
    bias = 0.1 * jax.random.normal(jax.random.PRNGKey(2), (d,))
    got = layer_norm(x, scale, bias, eps=1e-6, row_tile=row_tile, interpret=True)
    want = _ref_ln(x, scale, bias, 1e-6)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_layer_norm_bf16_stats_in_f32():
    x = (jax.random.normal(jax.random.PRNGKey(3), (64, 384)) * 3 + 5).astype(jnp.bfloat16)
    scale = jnp.ones((384,))
    bias = jnp.zeros((384,))
    got = layer_norm(x, scale, bias, interpret=True)
    want = _ref_ln(x, scale, bias, 1e-6)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32), atol=2e-2
    )


def test_fast_layer_norm_is_drop_in_for_nn_layer_norm():
    from vlfm_tpu.models.layers import FastLayerNorm

    x = jax.random.normal(jax.random.PRNGKey(4), (2, 5, 48))
    ref = nn.LayerNorm(epsilon=1e-5)
    params = ref.init(jax.random.PRNGKey(5), x)["params"]
    params = jax.tree_util.tree_map(
        lambda a: a + 0.05 * jax.random.normal(jax.random.PRNGKey(6), a.shape), params
    )
    want = ref.apply({"params": params}, x)
    got = FastLayerNorm(1e-5).apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)
