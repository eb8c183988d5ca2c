"""Parity of the fused conv chains (ops/conv_fused.py) against plain XLA
convolutions — the semantics TinyViT's MBConv / PatchMerging / PatchEmbed
stages need (reference behavior: mobile_sam tiny_vit, served by the reference
at vlfm/vlm/sam.py:24-57)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vlfm_tpu.ops.conv_fused import (
    gelu_poly,
    mbconv_chain,
    merge_chain_s2,
    patch_embed_s2d,
)


def test_gelu_poly_accuracy():
    x = jnp.linspace(-12.0, 12.0, 200001)
    err = jnp.max(jnp.abs(gelu_poly(x) - jax.nn.gelu(x, approximate=False)))
    assert float(err) < 1.5e-4


def _gelu(x):
    return jax.nn.gelu(x, approximate=False)


def _dw3x3(x, w2, b2, stride):
    """Depthwise 3x3, SAME (pad 1), w2 (3, 3, Ch)."""
    ch = x.shape[-1]
    return jax.lax.conv_general_dilated(
        x, w2[:, :, None, :],
        window_strides=(stride, stride), padding=[(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=ch,
    ) + b2


def ref_chain(x, w1, b1, w2, b2, w3, b3, *, stride, residual, final_gelu):
    h = _gelu(jnp.einsum("bhwc,cd->bhwd", x, w1) + b1)
    h = _gelu(_dw3x3(h, w2, b2, stride))
    out = jnp.einsum("bhwc,cd->bhwd", h, w3) + b3
    if residual:
        out = out + x
    return _gelu(out) if final_gelu else out


def _chain_weights(rng, cin, ch, cout):
    ks = jax.random.split(rng, 6)
    s = 0.3
    return (
        s * jax.random.normal(ks[0], (cin, ch)),
        s * jax.random.normal(ks[1], (ch,)),
        s * jax.random.normal(ks[2], (3, 3, ch)),
        s * jax.random.normal(ks[3], (ch,)),
        s * jax.random.normal(ks[4], (ch, cout)),
        s * jax.random.normal(ks[5], (cout,)),
    )


@pytest.mark.parametrize("h,w,row_tile", [(16, 16, 4), (12, 8, 8), (6, 16, 4)])
def test_mbconv_chain_residual(h, w, row_tile):
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(jax.random.fold_in(rng, 1), (2, h, w, 8))
    ws = _chain_weights(rng, 8, 16, 8)
    got = mbconv_chain(x, *ws, residual=True, final_gelu=True,
                       row_tile=row_tile, interpret=True)
    want = ref_chain(x, *ws, stride=1, residual=True, final_gelu=True)
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=1e-3)


def test_mbconv_chain_merge_form():
    # PatchMerging into the last stage: stride 1, no residual, no final gelu,
    # cin != cout
    rng = jax.random.PRNGKey(3)
    x = jax.random.normal(jax.random.fold_in(rng, 1), (1, 8, 8, 8))
    ws = _chain_weights(rng, 8, 16, 16)
    got = mbconv_chain(x, *ws, residual=False, final_gelu=False,
                       row_tile=4, interpret=True)
    want = ref_chain(x, *ws, stride=1, residual=False, final_gelu=False)
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=1e-3)


@pytest.mark.parametrize("h,w", [(16, 16), (8, 8), (24, 8)])
def test_merge_chain_s2(h, w):
    rng = jax.random.PRNGKey(7)
    x = jax.random.normal(jax.random.fold_in(rng, 1), (2, h, w, 8))
    ws = _chain_weights(rng, 8, 16, 12)
    got = merge_chain_s2(x, *ws)
    want = ref_chain(x, *ws, stride=2, residual=False, final_gelu=False)
    assert got.shape == (2, h // 2, w // 2, 12)
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=1e-3)


def ref_patch_embed(x, w1, b1, w2, b2):
    mid = _gelu(jax.lax.conv_general_dilated(
        x, w1, window_strides=(2, 2), padding=[(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + b1)
    return jax.lax.conv_general_dilated(
        mid, w2, window_strides=(2, 2), padding=[(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + b2


@pytest.mark.parametrize("h,w", [(16, 16), (32, 16), (16, 32)])
def test_patch_embed_s2d(h, w):
    rng = jax.random.PRNGKey(11)
    ks = jax.random.split(rng, 5)
    x = jax.random.normal(ks[0], (2, h, w, 3))
    c1, c2 = 4, 8
    w1 = 0.3 * jax.random.normal(ks[1], (3, 3, 3, c1))
    b1 = 0.3 * jax.random.normal(ks[2], (c1,))
    w2 = 0.3 * jax.random.normal(ks[3], (3, 3, c1, c2))
    b2 = 0.3 * jax.random.normal(ks[4], (c2,))
    got = patch_embed_s2d(x, w1, b1, w2, b2)
    want = ref_patch_embed(x, w1, b1, w2, b2)
    assert got.shape == (2, h // 4, w // 4, c2)
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=1e-3)
