"""Sparse coordinate extraction without sorts or scatters.

``jnp.nonzero(size=K)`` lowers to a full-array sort on TPU (~120 ms for a
1280^2 grid); extracting the first K set positions only needs a prefix sum
and K binary searches:

    prefix = cumsum(mask)            # bandwidth-bound, fast
    pos_j  = searchsorted(prefix, j+1)   # index of the (j+1)-th set bit

This is the workhorse for pulling frontier cells / component roots off the
dense grids into fixed-size MXU-friendly point lists.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("size",))
def first_nonzero_indices(mask_flat: jnp.ndarray, size: int):
    """Indices of the first ``size`` set entries of a flat bool array.

    Returns (idx, valid): idx is 0 where invalid.
    """
    prefix = jnp.cumsum(mask_flat.astype(jnp.int32))
    total = prefix[-1]
    targets = jnp.arange(1, size + 1, dtype=jnp.int32)
    idx = jnp.searchsorted(prefix, targets, side="left")
    valid = targets <= total
    return jnp.where(valid, idx, 0).astype(jnp.int32), valid


@partial(jax.jit, static_argnames=("size",))
def stratified_valid_sample(mask_flat: jnp.ndarray, size: int, rng: jnp.ndarray):
    """Up to ``size`` indices sampled uniformly (stratified, without
    replacement) among the set entries of a flat bool array.

    Replaces "random-score argsort over the whole array" (a 307200-element
    sort per call, ~20 ms on chip) with a cumsum + ``size`` binary searches:
    pick the t-th set bit for t stratified-random in [1, total].

    Returns (idx, valid): idx is 0 where invalid.
    """
    prefix = jnp.cumsum(mask_flat.astype(jnp.int32))
    total = prefix[-1]
    j = jnp.arange(size, dtype=jnp.float32)
    u = jax.random.uniform(rng, (size,))
    # total >= size: one pick per stratum -> distinct; else take all `total`
    t_strat = jnp.floor((j + u) * total.astype(jnp.float32) / size).astype(jnp.int32) + 1
    t_all = jnp.arange(1, size + 1, dtype=jnp.int32)
    targets = jnp.where(total >= size, t_strat, t_all)
    targets = jnp.clip(targets, 1, jnp.maximum(total, 1))
    idx = jnp.searchsorted(prefix, targets, side="left")
    valid = jnp.arange(size) < total
    return jnp.where(valid, idx, 0).astype(jnp.int32), valid


@partial(jax.jit, static_argnames=("size",))
def first_nonzero_coords(mask: jnp.ndarray, size: int):
    """(rows, cols, valid) of the first ``size`` set pixels (row-major)."""
    h, w = mask.shape
    idx, valid = first_nonzero_indices(mask.reshape(-1), size)
    return idx // w, idx % w, valid
