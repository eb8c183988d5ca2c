"""Exact masked median via radix bisection on float bit patterns.

TPU-native replacement for per-window ``jnp.sort`` medians
(img_utils.pixel_value_within_radius reduction='median',
/root/reference/vlfm/utils/img_utils.py:254-264): XLA lowers small-window
sorts to bitonic networks whose cross-lane permutes dominate; this kernel is
pure VPU compare+reduce.

Key fact: non-negative IEEE-754 floats are order-isomorphic to their int32
bit patterns, so the k-th smallest value can be found by a 31-step binary
search on the integer value space, each step one vectorized count of
``bits <= mid``. Both median order statistics (for even counts) are selected
in the same fused loop.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def masked_median(vals: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """Median of ``vals[valid]`` along the LAST axis; -1 where none valid.

    vals: (..., N) float32, all entries must be >= 0 where valid.
    valid: (..., N) bool.
    Returns (...) float32 — exact (lo+hi)/2 median, identical to
    ``jnp.sort``-based selection.
    """
    bits = jax.lax.bitcast_convert_type(vals.astype(jnp.float32), jnp.int32)
    # invalid lanes sort to +inf-equivalent
    big = jnp.int32(0x7F800000)  # +inf bit pattern
    bits = jnp.where(valid, bits, big)
    n = jnp.sum(valid, axis=-1)  # (...,)
    k_lo = jnp.maximum((n - 1) // 2, 0)  # 0-based rank of lower median
    k_hi = jnp.maximum(n // 2, 0)

    def select(k):
        """k-th smallest (0-based) of bits along last axis via bisection."""
        lo = jnp.zeros(n.shape, jnp.int32)
        hi = jnp.full(n.shape, big)

        def body(_, carry):
            lo, hi = carry
            mid = lo + (hi - lo) // 2
            cnt = jnp.sum(bits <= mid[..., None], axis=-1)
            take = cnt >= k + 1
            return jnp.where(take, lo, mid + 1), jnp.where(take, mid, hi)

        lo, hi = jax.lax.fori_loop(0, 31, body, (lo, hi))
        return lo

    sel_lo = select(k_lo)
    sel_hi = select(k_hi)
    med = (
        jax.lax.bitcast_convert_type(sel_lo, jnp.float32)
        + jax.lax.bitcast_convert_type(sel_hi, jnp.float32)
    ) * 0.5
    return jnp.where(n > 0, med, -1.0)
