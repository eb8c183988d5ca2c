"""Bit-packed binary-mask kernels: 32 grid columns per uint32 word.

The flood fill is the most iteration-heavy kernel in the pipeline (geodesic
propagation needs as many sweeps as the region is wide). Packing the mask
bits 32-to-a-word turns each 3x3 dilate-and-mask sweep into a handful of
bitwise VPU ops over 32x less data:

- vertical neighbours: row rolls (wrap-around rows land in the always-empty
  storage padding, see GridSpec2D);
- horizontal neighbours: in-word shifts with cross-word carries.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def pack_cols(mask: jnp.ndarray) -> jnp.ndarray:
    """(S, C) bool -> (S, C//32) uint32; bit b of word w is column w*32+b."""
    s, c = mask.shape
    assert c % 32 == 0, c
    bits = mask.reshape(s, c // 32, 32).astype(jnp.uint32)
    weights = (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32))[None, None, :]
    return jnp.sum(bits * weights, axis=-1, dtype=jnp.uint32)


def unpack_cols(packed: jnp.ndarray, cols: int) -> jnp.ndarray:
    s, w = packed.shape
    bits = (packed[:, :, None] >> jnp.arange(32, dtype=jnp.uint32)[None, None, :]) & 1
    return bits.reshape(s, w * 32)[:, :cols].astype(bool)


def dilate8_packed(cur: jnp.ndarray) -> jnp.ndarray:
    """Public alias of the 8-connected packed dilation sweep. k sweeps give a
    (2k+1)x(2k+1) square dilation."""
    return _dilate8_packed(cur)


@partial(jax.jit, static_argnames=("size",))
def first_set_bits_packed(mask_p: jnp.ndarray, size: int):
    """(rows, cols, valid) of the first ``size`` set bits, row-major order.

    Replaces a full-grid cumsum with a 32x smaller popcount cumsum plus a
    per-hit in-word rank search.
    """
    s, w = mask_p.shape
    counts = jax.lax.population_count(mask_p).astype(jnp.int32).reshape(-1)
    prefix = jnp.cumsum(counts)
    total = prefix[-1]
    targets = jnp.arange(1, size + 1, dtype=jnp.int32)
    widx = jnp.searchsorted(prefix, targets, side="left")
    valid = targets <= total
    widx_c = jnp.where(valid, widx, 0)
    # rank of the wanted bit within its word (1-based)
    before = jnp.where(widx_c > 0, prefix[jnp.maximum(widx_c - 1, 0)], 0)
    rank = targets - before
    words = mask_p.reshape(-1)[widx_c]  # (size,)
    bits = ((words[:, None] >> jnp.arange(32, dtype=jnp.uint32)[None, :]) & 1).astype(jnp.int32)
    cum = jnp.cumsum(bits, axis=1)
    hit = (cum == rank[:, None]) & (bits == 1)
    bitpos = jnp.argmax(hit, axis=1).astype(jnp.int32)
    rows = widx_c // w
    cols = (widx_c % w) * 32 + bitpos
    return jnp.where(valid, rows, 0), jnp.where(valid, cols, 0), valid


def _dilate8_packed(cur: jnp.ndarray) -> jnp.ndarray:
    """One 8-connected dilation sweep on packed words."""
    up = jnp.roll(cur, -1, axis=0)
    down = jnp.roll(cur, 1, axis=0)
    n = cur | up | down
    carry_lo = jnp.roll(n, 1, axis=1) >> 31  # bit 31 of word w-1 -> bit 0
    carry_hi = jnp.roll(n, -1, axis=1) << 31  # bit 0 of word w+1 -> bit 31
    return n | (n << 1) | carry_lo | (n >> 1) | carry_hi


@partial(jax.jit, static_argnames=("max_iters", "check_every"))
def flood_packed(
    mask_p: jnp.ndarray, seed_p: jnp.ndarray, max_iters: int = 2048, check_every: int = 16
) -> jnp.ndarray:
    """Geodesic flood on packed masks (both (S, W) uint32)."""
    seed_p = seed_p & mask_p

    def cond(carry):
        cur, changed, i = carry
        return changed & (i < max_iters)

    def body(carry):
        cur, _, i = carry
        nxt = cur
        for _ in range(check_every):
            nxt = _dilate8_packed(nxt) & mask_p
        return nxt, (nxt != cur).any(), i + check_every

    out, _, _ = jax.lax.while_loop(cond, body, (seed_p, jnp.bool_(True), 0))
    return out
