"""Fused LayerNorm as a pallas TPU kernel.

Why: on-chip profiles of the transformer stacks (BLIP2 ViT-g, OWL-ViT) show
XLA's layer-norm lowerings dominating non-matmul time — the convert/reduce
fusions XLA builds around each norm re-read the residual stream several
times (~0.38 ms per norm at (8, 257, 1408), ~30 ms of the 65 ms ViT-g
forward). An isolated single-pass norm is ~6x cheaper; this kernel forces
that boundary: read the bf16 row tile once, compute f32 statistics in
registers, write the normalized bf16 tile, nothing else.

Used by models/layers.py (LayerNormF32) on the TPU serving path; parity is
pinned by tests/test_norms.py.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vlfm_tpu.ops.backend import default_interpret


def _ln_kernel(x_ref, s_ref, b_ref, o_ref, *, eps: float):
    x = x_ref[...].astype(jnp.float32)  # (TR, D)
    d = x.shape[1]
    mu = jnp.sum(x, axis=1, keepdims=True) * (1.0 / d)
    c = x - mu
    var = jnp.sum(c * c, axis=1, keepdims=True) * (1.0 / d)
    y = c * jax.lax.rsqrt(var + eps)
    o_ref[...] = (
        y * s_ref[...].astype(jnp.float32) + b_ref[...].astype(jnp.float32)
    ).astype(o_ref.dtype)


@partial(jax.jit, static_argnames=("eps", "row_tile", "interpret"))
def layer_norm(
    x: jnp.ndarray,
    scale: jnp.ndarray,
    bias: jnp.ndarray,
    *,
    eps: float = 1e-6,
    row_tile: int = 256,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """LayerNorm over the last axis with f32 statistics, any leading shape.

    Ragged final row tiles are handled by pallas edge padding (zero rows
    normalize to bias and are sliced away by the reshape back).
    """
    if interpret is None:
        interpret = default_interpret()
    d = x.shape[-1]
    lead = x.shape[:-1]
    rows = 1
    for s in lead:
        rows *= s
    x2 = x.reshape(rows, d)
    grid = (pl.cdiv(rows, row_tile),)
    out = pl.pallas_call(
        partial(_ln_kernel, eps=eps),
        grid=grid,
        in_specs=[
            pl.BlockSpec((row_tile, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((d,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((row_tile, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, d), x.dtype),
        interpret=interpret,
    )(x2, scale, bias)
    return out.reshape(*lead, d)
