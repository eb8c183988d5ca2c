"""Fused multi-head attention (pallas): QK^T -> softmax -> AV in VMEM.

Serving-path kernel for the ViT encoders (BLIP-2 EVA ViT-g: L=257 tokens,
16 heads, head dim 88). XLA keeps the (B, H, L, L) logits tensor in HBM —
at B=32 that is 135 MB of f32 written, re-read by the softmax, re-written
as probabilities and re-read by the AV matmul, ~540 MB of HBM traffic per
block x 39 blocks. The sequence is short enough that one (batch*head)'s
whole K/V fits VMEM many times over, so the kernel computes a full query
tile's attention without ever materializing logits off-chip.

No online-softmax pass is needed (L is tiny); keys are padded to the
sublane quantum and masked with -1e30 before the f32 softmax, matching
models/layers.attention numerics (f32 logits and softmax, dot in bf16).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vlfm_tpu.ops.backend import default_interpret


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _attn_kernel_grouped(q_ref, k_ref, v_ref, o_ref, *, scale: float):
    """Whole-head attention for a GROUP of (batch*head) slices per grid
    instance. Blocks carry the LOGICAL (L, D) shapes (no explicit padding:
    Mosaic masks the lane/sublane remainder), and one instance amortizes its
    launch over ``G`` heads' worth of matmuls — the previous per-(head,
    query-tile) grid ran 1536 instances per ViT-g block with ~60 ns of MXU
    work each, pure launch overhead."""
    g = q_ref.shape[0]
    for i in range(g):
        q = q_ref[i]  # (L, D)
        k = k_ref[i]
        v = v_ref[i]
        logits = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        o_ref[i] = jnp.dot(
            p.astype(v.dtype), v, preferred_element_type=jnp.float32
        ).astype(o_ref.dtype)


def flash_attention_grouped(q, k, v, *, interpret: bool | None = None,
                            group: int | None = None):
    """(B, H, L, D) x3 -> (B, H, L, D) fused attention, logical-shape blocks.

    Serving shapes here are short-sequence ViTs (L<=1024, D<=128): each grid
    instance owns ``group`` full heads, keeping the grid tiny (B*H/group)."""
    if interpret is None:
        interpret = default_interpret()
    b, h, l, d = q.shape
    scale = 1.0 / (d ** 0.5)
    bh = b * h
    if group is None:
        group = next((g for g in (16, 8, 4, 2, 1) if bh % g == 0))

    def prep(x):
        return x.reshape(bh, l, d)

    qp, kp, vp = prep(q), prep(k), prep(v)
    spec = pl.BlockSpec((group, l, d), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_attn_kernel_grouped, scale=scale),
        out_shape=jax.ShapeDtypeStruct((bh, l, d), q.dtype),
        grid=(bh // group,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        interpret=interpret,
    )(qp, kp, vp)
    return out.reshape(b, h, l, d)


def _attn_kernel_grouped_v2(q_ref, k_ref, v_ref, o_ref, *, scale: float):
    """Grouped kernel with output-side renormalization: the softmax divide
    runs on the (L, D) output instead of the (L, L) probability matrix —
    at L=257/D=88 that is ~3x fewer VPU divide lanes — and the exp'd
    logits go straight to the MXU in bf16 without a normalization pass."""
    g = q_ref.shape[0]
    for i in range(g):
        q = q_ref[i]  # (L, D)
        k = k_ref[i]
        v = v_ref[i]
        logits = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - m)
        s = jnp.sum(p, axis=-1, keepdims=True)
        o = jnp.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32)
        o_ref[i] = (o / s).astype(o_ref.dtype)


def flash_attention_grouped_v2(q, k, v, *, interpret: bool | None = None,
                               group: int | None = None):
    """(B, H, L, D) x3 -> (B, H, L, D); grouped-head grid, late renorm."""
    if interpret is None:
        interpret = default_interpret()
    b, h, l, d = q.shape
    scale = 1.0 / (d ** 0.5)
    bh = b * h
    if group is None:
        # largest group whose double-buffered blocks + logits scratch fit in
        # ~10 MB of the 16 MB VMEM (g=32 at the ViT-g shape compiles to a
        # 16.36 MB stack and is rejected by Mosaic)
        itemsize = jnp.dtype(q.dtype).itemsize
        lp, dp = _round_up(l, 8), _round_up(d, 128)
        logits_bytes = _round_up(l, 8) * _round_up(l, 128) * 4

        def fits(g):
            return 2 * 4 * g * lp * dp * itemsize + 2 * logits_bytes < 10 * 2**20

        group = next(
            (g for g in (16, 8, 4, 2, 1) if bh % g == 0 and fits(g)), 1
        )

    def prep(x):
        return x.reshape(bh, l, d)

    spec = pl.BlockSpec((group, l, d), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_attn_kernel_grouped_v2, scale=scale),
        out_shape=jax.ShapeDtypeStruct((bh, l, d), q.dtype),
        grid=(bh // group,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        interpret=interpret,
    )(prep(q), prep(k), prep(v))
    return out.reshape(b, h, l, d)


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, length: int, scale: float):
    q = q_ref[0]  # (TQ, Dp)
    k = k_ref[0]  # (Lp, Dp)
    v = v_ref[0]
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    j = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
    logits = jnp.where(j < length, logits, -1e30)
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    o_ref[0] = jnp.dot(
        p.astype(v.dtype), v, preferred_element_type=jnp.float32
    ).astype(o_ref.dtype)


def flash_attention(q, k, v, *, interpret: bool | None = None):
    """(B, H, L, D) x3 -> (B, H, L, D); softmax(QK^T / sqrt(D)) V.

    Drop-in for models/layers.attention without a mask. D and L are padded
    to hardware tiles inside; zero-padded key rows are masked out of the
    softmax so results equal the unpadded reference to float tolerance.
    """
    if interpret is None:
        interpret = default_interpret()
    b, h, l, d = q.shape
    scale = 1.0 / (d ** 0.5)
    sub = 16 if q.dtype == jnp.bfloat16 else 8
    lp = _round_up(l, max(sub, 128))  # TQ must divide Lp; keep one tile size
    dp = _round_up(d, 128)
    tq = min(128, lp)

    def prep(x):
        x = jnp.pad(x, ((0, 0), (0, 0), (0, lp - l), (0, dp - d)))
        return x.reshape(b * h, lp, dp)

    qp, kp, vp = prep(q), prep(k), prep(v)
    grid = (b * h, lp // tq)
    out = pl.pallas_call(
        functools.partial(_attn_kernel, length=l, scale=scale),
        out_shape=jax.ShapeDtypeStruct((b * h, lp, dp), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tq, dp), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lp, dp), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lp, dp), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tq, dp), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(qp, kp, vp)
    return out.reshape(b, h, lp, dp)[:, :, :l, :d]
