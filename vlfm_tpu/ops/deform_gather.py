"""Deformable-attention gather+combine (pallas): VMEM-resident stencil table.

The GroundingDino hot loop (reference: HF ``multi_scale_deformable_attention``
called from vlfm/vlm/grounding_dino.py's model, one F.grid_sample per level)
is, per level: fetch a 2x2 bilinear stencil for every (query, head, point)
and reduce with bilinear + attention weights. The XLA formulation
(models/grounding_dino._bilinear_sample_rows) packs each stencil as one
row of a zero-padded patch table and row-gathers with take_along_axis —
but XLA's general gather lowers far below HBM bandwidth, and it
materializes the (B, Q*P, nh, 4*dh) gathered tensor in HBM between the
gather and the combine einsums.

This kernel exploits the one property XLA cannot: per (batch, head) the
whole patch table fits VMEM (level 0 of the 800-px encoder: 10201 rows x
128 floats = 5.2 MB f32, 2.6 MB bf16). Grid = (B, nh, query-tiles); the
table block stays resident across all query tiles of one (batch, head)
(pallas skips the re-copy when consecutive grid steps map to the same
block). Each sample's stencil row is fetched VMEM->VMEM by dynamic index
(a serial fori_loop — the TPU has no vector gather, but a VMEM dynamic
row load is a few cycles, not an HBM round trip), and the combine runs on
the MXU:

    contribution = (rows * expand(w4)) @ G

where ``expand`` broadcasts the 4 per-tap weights across their dh lanes
via a (4, 4*dh) 0/1 matmul and ``G`` is the (4*dh, dh) tap-summing 0/1
matrix. Attention weights are folded into the tap weights by the caller,
so summing the P sample points is plain accumulation and the kernel's
output is the final (B, Q, nh, dh) per-level contribution — nothing
query-major ever touches HBM except it.
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


def _kernel(idx_ref, w_ref, table_ref, o_ref, scratch, *, npts: int, dh: int):
    # blocks are head-merged: idx (1, TQ, P), w (1, TQ, 4P), table (1, R, 4dh),
    # out (1, TQ, dh) — Mosaic requires the last two block dims to tile
    # (8, 128) or equal the array dims, which the old per-head singleton
    # layout (1, TQ, 1, P) violated (the round-4 on-chip A/B rejection).
    tq = o_ref.shape[1]
    d4 = 4 * dh
    # expand matrix: E[t, t*dh:(t+1)*dh] = 1  (broadcast tap weight over lanes)
    lane = jax.lax.broadcasted_iota(jnp.int32, (4, d4), 1)
    row4 = jax.lax.broadcasted_iota(jnp.int32, (4, d4), 0)
    expand = (lane // dh == row4).astype(jnp.float32)
    # tap-sum matrix: G[i, j] = 1 iff i % dh == j
    gi = jax.lax.broadcasted_iota(jnp.int32, (d4, dh), 0)
    gj = jax.lax.broadcasted_iota(jnp.int32, (d4, dh), 1)
    gsum = (gi % dh == gj).astype(jnp.float32)

    acc = jnp.zeros((tq, dh), jnp.float32)
    for p in range(npts):
        def fetch(i, _):
            r = idx_ref[0, i, p]
            row = table_ref[0, pl.dslice(r, 1), :]  # (1, d4)
            scratch[pl.dslice(i, 1), :] = row.astype(jnp.float32)
            return 0
        jax.lax.fori_loop(0, tq, fetch, 0)
        w4 = w_ref[0, :, 4 * p : 4 * p + 4].astype(jnp.float32)  # (TQ, 4)
        wexp = jax.lax.dot_general(
            w4, expand, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (TQ, 4*dh)
        acc = acc + jax.lax.dot_general(
            scratch[...] * wexp, gsum, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    o_ref[0, :, :] = acc.astype(o_ref.dtype)


def gather_combine(
    table: jnp.ndarray,  # (B, R, nh, 4*dh) zero-padded 2x2-patch rows
    anchor: jnp.ndarray,  # (B, Q, nh, P) int32 row indices into R
    w: jnp.ndarray,  # (B, Q, nh, P, 4) tap weights (attention already folded)
    *,
    tile_q: int = 512,
    interpret: bool | None = None,
    force_pallas: bool = False,
) -> jnp.ndarray:
    """sum_p sum_t w[..., p, t] * table[anchor[..., p], t*dh:(t+1)*dh].

    Returns (B, Q, nh, dh) f32. On CPU the same math runs as one
    take_along_axis + einsum so parity suites bind; ``force_pallas`` runs
    the kernel body under the pallas interpreter instead (kernel tests).
    """
    b, r, nh, d4 = table.shape
    dh = d4 // 4
    q, npts = anchor.shape[1], anchor.shape[3]
    if interpret is None:
        interpret = default_interpret()
    if interpret and not force_pallas:
        idx = anchor.transpose(0, 1, 3, 2).reshape(b, q * npts, nh)
        rows = jnp.take_along_axis(table, idx[..., None], axis=1)
        rows = rows.reshape(b, q, npts, nh, 4, dh)
        return jnp.einsum("bqhpt,bqphtd->bqhd", w, rows.astype(jnp.float32))

    qp = _round_up(q, tile_q)
    if qp != q:
        anchor = jnp.pad(anchor, ((0, 0), (0, qp - q), (0, 0), (0, 0)))
        w = jnp.pad(w, ((0, 0), (0, qp - q), (0, 0), (0, 0), (0, 0)))
    # head-merged layout: (B*nh, ...) so every block's trailing dims are
    # full-size (see _kernel note)
    anchor_hm = anchor.transpose(0, 2, 1, 3).reshape(b * nh, qp, npts)
    wf = w.transpose(0, 2, 1, 3, 4).reshape(b * nh, qp, npts * 4)
    table_hm = table.transpose(0, 2, 1, 3).reshape(b * nh, r, d4)
    grid = (b * nh, qp // tile_q)
    out = pl.pallas_call(
        functools.partial(_kernel, npts=npts, dh=dh),
        out_shape=jax.ShapeDtypeStruct((b * nh, qp, dh), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile_q, npts), lambda i, t: (i, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_q, npts * 4), lambda i, t: (i, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, r, d4), lambda i, t: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_q, dh), lambda i, t: (i, t, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((tile_q, d4), jnp.float32)],
        interpret=interpret,
    )(anchor_hm, wf, table_hm)
    return out.reshape(b, nh, qp, dh).transpose(0, 2, 1, 3)[:, :q]
