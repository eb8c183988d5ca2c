"""Geodesic flood fill and dense connected-component labeling.

Device-side replacements for the reference's cv2.findContours +
pointPolygonTest + drawContours idiom for "keep the explored region that
contains the agent" (obstacle_map.py:128-146), and for contour-area based
small-region filtering.

Both are label-propagation schemes over a bounded ``lax.while_loop``: each
iteration is one (3, 3) windowed reduction, so the whole loop compiles to a
tight on-device program with no host round-trips.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from vlfm_tpu.ops.morphology import dilate


@partial(jax.jit, static_argnames=("max_iters", "check_every"))
def flood_from_seed(
    mask: jnp.ndarray, seed: jnp.ndarray, max_iters: int = 1024, check_every: int = 16
) -> jnp.ndarray:
    """Pixels of ``mask`` 8-connected to ``seed`` (both bool, same shape).

    Runs dilate-and-intersect to convergence (bounded by ``max_iters``).
    When the column count is a multiple of 32 the propagation runs bit-packed
    (32 columns per uint32 word — see vlfm_tpu.ops.bitpack); the convergence
    reduction only fires every ``check_every`` sweeps.
    """
    from vlfm_tpu.ops.bitpack import flood_packed, pack_cols, unpack_cols

    if mask.shape[1] % 32 == 0:
        out_p = flood_packed(
            pack_cols(mask), pack_cols(seed), max_iters=max_iters, check_every=check_every
        )
        return unpack_cols(out_p, mask.shape[1])

    seed = seed & mask

    def cond(carry):
        cur, changed, i = carry
        return changed & (i < max_iters)

    def body(carry):
        cur, _, i = carry
        nxt = cur
        for _ in range(check_every):
            nxt = dilate(nxt, 3) & mask
        return nxt, (nxt != cur).any(), i + check_every

    out, _, _ = jax.lax.while_loop(cond, body, (seed, jnp.bool_(True), 0))
    return out


def _min_label_step(labels: jnp.ndarray) -> jnp.ndarray:
    big = jnp.iinfo(jnp.int32).max
    labels = jax.lax.reduce_window(
        labels, big, jax.lax.min, window_dimensions=(1, 3), window_strides=(1, 1), padding="SAME"
    )
    return jax.lax.reduce_window(
        labels, big, jax.lax.min, window_dimensions=(3, 1), window_strides=(1, 1), padding="SAME"
    )


@partial(jax.jit, static_argnames=("max_iters",))
def label_components(mask: jnp.ndarray, max_iters: int) -> jnp.ndarray:
    """8-connected components via min-linear-index propagation.

    Returns int32 labels (the minimum linear index of the component) for set
    pixels and INT32_MAX elsewhere. Exact for components whose geodesic
    radius from their min-index pixel is <= max_iters; the while_loop exits
    early once converged.
    """
    h, w = mask.shape
    idx = (jnp.arange(h * w, dtype=jnp.int32)).reshape(h, w)
    big = jnp.iinfo(jnp.int32).max
    labels = jnp.where(mask, idx, big)

    def cond(carry):
        cur, changed, i = carry
        return changed & (i < max_iters)

    def body(carry):
        cur, _, i = carry
        nxt = cur
        for _ in range(4):
            nxt = jnp.where(mask, jnp.minimum(nxt, _min_label_step(nxt)), big)
        return nxt, (nxt != cur).any(), i + 4

    out, _, _ = jax.lax.while_loop(cond, body, (labels, jnp.bool_(True), 0))
    return out


def component_sizes(labels: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Per-pixel size of the component each pixel belongs to.

    Scatter-adds ones into a flat (H*W,) table indexed by label, then gathers
    back. Labels must be linear indices (from ``label_components``).
    """
    h, w = labels.shape
    flat = labels.reshape(-1)
    safe = jnp.where(mask.reshape(-1), flat, 0)
    counts = jnp.zeros(h * w, jnp.int32).at[safe].add(mask.reshape(-1).astype(jnp.int32))
    return jnp.where(mask, counts[flat.clip(0, h * w - 1)].reshape(h, w), 0)


@partial(jax.jit, static_argnames=("factor", "max_iters", "max_roots"))
def remove_small_components_coarse(
    mask: jnp.ndarray,
    area_thresh_px: jnp.ndarray,
    factor: int = 4,
    max_iters: int = 512,
    max_roots: int = 128,
) -> jnp.ndarray:
    """Drop components of ``mask`` whose area is below ``area_thresh_px``.

    TPU-native approximation of contour-area filtering: labeling runs at a
    ``factor``x coarser resolution (max-pool), so components separated by a
    gap smaller than ``factor`` px may merge, and areas are measured in
    coarse cells * factor^2. Intended for the "ignore small unexplored
    pockets" filter in frontier detection where a few-pixel tolerance is
    irrelevant.

    Component sizes are counted against the first ``max_roots`` component
    roots by direct comparison (a dense (roots x cells) reduction — no
    scatter); components beyond that many roots are conservatively KEPT, as
    are pieces of large regions whose labeling did not converge in
    ``max_iters``.
    """
    from vlfm_tpu.ops.morphology import max_pool_downsample, upsample_nearest
    from vlfm_tpu.ops.sparse import first_nonzero_indices

    coarse = max_pool_downsample(mask, factor)
    labels = label_components(coarse, max_iters)
    flat = labels.reshape(-1)
    n = flat.shape[0]
    roots = (flat == jnp.arange(n)) & coarse.reshape(-1)
    root_idx, rvalid = first_nonzero_indices(roots, max_roots)
    match = flat[None, :] == root_idx[:, None]  # (R, N)
    match = match & rvalid[:, None] & coarse.reshape(-1)[None, :]
    sizes = match.sum(axis=1)
    small = rvalid & (
        sizes.astype(jnp.float32) * (factor * factor) < area_thresh_px
    )
    drop = (match & small[:, None]).any(axis=0).reshape(coarse.shape)
    keep = coarse & ~drop
    return mask & upsample_nearest(keep, factor)
