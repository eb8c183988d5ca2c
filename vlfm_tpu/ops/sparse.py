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
def first_nonzero_coords(mask: jnp.ndarray, size: int):
    """(rows, cols, valid) of the first ``size`` set pixels (row-major)."""
    h, w = mask.shape
    idx, valid = first_nonzero_indices(mask.reshape(-1), size)
    return idx // w, idx % w, valid
