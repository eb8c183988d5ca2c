"""Pallas deformable gather+combine vs the take_along_axis reference.

The kernel must reproduce sum_p sum_t w[...,p,t] * table[anchor[...,p]]
exactly (all f32), including zero-weight padding rows and out-of-range
anchors already clamped by the caller.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vlfm_tpu.ops.deform_gather import gather_combine


def _case(seed, b, r, nh, dh, q, npts):
    k = jax.random.split(jax.random.PRNGKey(seed), 3)
    table = jax.random.normal(k[0], (b, r, nh, 4 * dh), jnp.float32)
    anchor = jax.random.randint(k[1], (b, q, nh, npts), 0, r)
    w = jax.random.uniform(k[2], (b, q, nh, npts, 4), jnp.float32)
    return table, anchor, w


@pytest.mark.parametrize("seed", [0, 1])
def test_kernel_matches_reference(seed):
    table, anchor, w = _case(seed, b=2, r=97, nh=3, dh=32, q=70, npts=4)
    ref = gather_combine(table, anchor, w, interpret=True)
    got = gather_combine(table, anchor, w, interpret=True, force_pallas=True,
                         tile_q=32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_kernel_pads_queries_with_zero_contribution():
    # q not a multiple of tile_q: padded queries must not corrupt output
    table, anchor, w = _case(3, b=1, r=33, nh=2, dh=16, q=21, npts=2)
    ref = gather_combine(table, anchor, w, interpret=True)
    got = gather_combine(table, anchor, w, interpret=True, force_pallas=True,
                         tile_q=16)
    assert got.shape == ref.shape == (1, 21, 2, 16)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_bf16_table_accumulates_f32():
    table, anchor, w = _case(5, b=1, r=50, nh=2, dh=32, q=30, npts=4)
    tb = table.astype(jnp.bfloat16)
    ref = gather_combine(tb.astype(jnp.float32), anchor, w, interpret=True)
    got = gather_combine(tb, anchor, w, interpret=True, force_pallas=True,
                         tile_q=16)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)


def test_module_tpu_path_equals_einsum_reference():
    """The per-level fold (_deform_combine_levels) must equal the CPU path's
    stack+einsum combine on the same inputs."""
    from vlfm_tpu.models.grounding_dino import (
        _bilinear_sample_rows, _deform_combine_levels)

    nh, dh, npts = 2, 32, 4
    shapes = ((7, 9), (4, 5))
    s = sum(h * w for h, w in shapes)
    b, q = 2, 11
    k = jax.random.split(jax.random.PRNGKey(7), 3)
    value = jax.random.normal(k[0], (b, s, nh * dh), jnp.float32)
    grids = jax.random.uniform(k[1], (b, q, nh, len(shapes), npts, 2),
                               minval=-1.2, maxval=1.2)
    weights = jax.nn.softmax(
        jax.random.normal(k[2], (b, q, nh, len(shapes) * npts)), axis=-1
    ).reshape(b, q, nh, len(shapes), npts)

    # reference: explicit per-level sample, stack, einsum
    start, sampled = 0, []
    for li, (ht, wd) in enumerate(shapes):
        v_l = value[:, start:start + ht * wd].reshape(b, ht, wd, nh * dh)
        sampled.append(_bilinear_sample_rows(v_l, grids[:, :, :, li], nh, dh))
        start += ht * wd
    samp = jnp.stack(sampled, axis=3)
    ref = jnp.einsum("bqhlpd,bqhlp->bqhd", samp, weights)

    got = _deform_combine_levels(value, grids, weights, shapes, nh, dh,
                                 interpret=True, force_pallas=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)
