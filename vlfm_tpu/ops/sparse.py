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


_LANES = 512  # chunk width for the dense t-th-set-bit selection


def _nth_set_bit_dense(mask_flat: jnp.ndarray, targets: jnp.ndarray):
    """Index of the ``t``-th set bit for each target t (1-based), as dense
    MXU work instead of cumsum + per-target bisection.

    The cumsum + searchsorted formulation costs a full-length log-depth scan
    plus ~17 serial gather passes per call at the object-map lattice shapes
    ((B, K, 76800) -> ~45 ms of the benched full-stack step). Here the same
    selection runs as: a chunked prefix (cumsum over n/512 chunk sums), a
    one-hot matmul fetching each target's chunk row, and an in-row inclusive
    prefix via a triangular-ones matmul. Every count is an integer well
    below 2^24, exactly representable in f32, so the returned indices are
    BIT-IDENTICAL to searchsorted(prefix, t, side='left') — pinned by
    tests/test_object_map.py::test_dense_nth_set_bit_equals_bisection.

    Returns (idx (T,) int32, total () int32). Out-of-range targets (t >
    total, t < 1) return arbitrary in-array garbage — callers mask by
    validity exactly as with searchsorted.
    """
    n = mask_flat.shape[0]
    c = -(-n // _LANES)
    rows = (
        jnp.zeros((c * _LANES,), jnp.float32)
        .at[:n]
        .set(mask_flat.astype(jnp.float32))
        .reshape(c, _LANES)
    )
    row_sums = rows.sum(axis=1)  # (C,) integers as f32, exact
    chunk_prefix = jnp.cumsum(row_sums)  # inclusive, (C,)
    total = chunk_prefix[-1].astype(jnp.int32)
    tf_ = targets.astype(jnp.float32)  # (T,)
    # first chunk whose inclusive prefix reaches t == count of chunks below t
    chunk_id = (
        (chunk_prefix[None, :] < tf_[:, None]).sum(axis=1).astype(jnp.int32)
    )
    safe_chunk = jnp.minimum(chunk_id, c - 1)
    onehot = jax.nn.one_hot(safe_chunk, c, dtype=jnp.float32)
    # Exclusive prefix at the chunk: MUST be a gather, not a matvec. On TPU,
    # default-precision f32 matmuls truncate inputs to bf16, and chunk_prefix
    # holds counts up to ~1.6M on frontier grids — not bf16-representable —
    # which would silently break the bit-identical contract. The onehot@rows
    # and row@tri matmuls below are safe (operands are exactly 0/1 with f32
    # accumulation).
    base = (chunk_prefix - row_sums)[safe_chunk]  # (T,) gather, exact
    row = onehot @ rows  # (T, LANES) 0/1
    tri = jnp.triu(jnp.ones((_LANES, _LANES), jnp.float32))
    row_prefix = row @ tri  # inclusive in-row prefix, exact f32
    pos = (row_prefix < (tf_ - base)[:, None]).sum(axis=1).astype(jnp.int32)
    return chunk_id * _LANES + pos, total


@partial(jax.jit, static_argnames=("size",))
def first_nonzero_indices(mask_flat: jnp.ndarray, size: int):
    """Indices of the first ``size`` set entries of a flat bool array.

    Returns (idx, valid): idx is 0 where invalid.
    """
    targets = jnp.arange(1, size + 1, dtype=jnp.int32)
    idx, total = _nth_set_bit_dense(mask_flat, targets)
    valid = targets <= total
    return jnp.where(valid, idx, 0).astype(jnp.int32), valid


@partial(jax.jit, static_argnames=("size",))
def stratified_valid_sample(mask_flat: jnp.ndarray, size: int, rng: jnp.ndarray):
    """Up to ``size`` indices sampled uniformly (stratified, without
    replacement) among the set entries of a flat bool array.

    Replaces "random-score argsort over the whole array" (a 307200-element
    sort per call, ~20 ms on chip) with t-th-set-bit selection for t
    stratified-random in [1, total] — computed densely on the MXU
    (see _nth_set_bit_dense; bit-identical to cumsum + binary search).

    Returns (idx, valid): idx is 0 where invalid.
    """
    total0 = jnp.sum(mask_flat.astype(jnp.int32))
    j = jnp.arange(size, dtype=jnp.float32)
    u = jax.random.uniform(rng, (size,))
    # total >= size: one pick per stratum -> distinct; else take all `total`
    t_strat = jnp.floor((j + u) * total0.astype(jnp.float32) / size).astype(jnp.int32) + 1
    t_all = jnp.arange(1, size + 1, dtype=jnp.int32)
    targets = jnp.where(total0 >= size, t_strat, t_all)
    targets = jnp.clip(targets, 1, jnp.maximum(total0, 1))
    idx, total = _nth_set_bit_dense(mask_flat, targets)
    valid = jnp.arange(size) < total
    return jnp.where(valid, idx, 0).astype(jnp.int32), valid


@partial(jax.jit, static_argnames=("size",))
def first_nonzero_coords(mask: jnp.ndarray, size: int):
    """(rows, cols, valid) of the first ``size`` set pixels (row-major)."""
    h, w = mask.shape
    idx, valid = first_nonzero_indices(mask.reshape(-1), size)
    return idx // w, idx % w, valid
