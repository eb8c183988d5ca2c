"""Fused conv chains for TinyViT (MobileSAM's encoder) on TPU.

Why: TinyViT (models/tinyvit.py) spends its time in XLA's unfused lowering of
   1x1 expand -> depthwise 3x3 -> 1x1 project
chains at large spatial resolution. The 4x-expanded hidden tensor
(256 x 256 x 256 bf16 = 33 MB per image in stage 0) round-trips HBM twice per
block and forces layout copies; an on-chip profile shows the two stage-0
expand fusions alone at ~21% of encoder time and ~3.5 GB of HBM traffic per
image against a ~0.5 GB ideal.

Two attack paths, chosen per stage:

- Stride-1 chains (stage-0 MBConvs, the stride-1 PatchMerging into the last
  stage): a pallas kernel (`mbconv_chain`) that keeps the expanded hidden
  tensor entirely in VMEM — per row-tile the chip reads the input tile
  (+1-row halos) and writes the output tile, nothing else. Halos come from
  passing the input twice more with row-shifted BlockSpec index maps (pallas
  BlockSpecs cannot overlap).

- Stride-2 stages (patch embed, the two downsampling PatchMergings): Mosaic
  cannot lower stride-2 vector slices, so these are rewritten as unit-stride
  XLA ops over parity planes (`patch_embed_s2d`, `merge_chain_s2`): a 3x3
  stride-2 conv on x is exactly a 2x2 unit-stride conv on the space-to-depth
  transform of x with taps regrouped, which XLA tiles onto the MXU like any
  dense conv; the depthwise stride-2 conv becomes 9 unit-shift VPU taps over
  four expanded half-res planes (the 1x1 expand commutes with parity split).

Matmuls (the 1x1 convs) run on the MXU with bf16 inputs; depthwise 3x3s are
shifted multiply-accumulates on the VPU with f32 accumulators.

Used by models/tinyvit_fast.py (the serving path of the MobileSAM encoder);
parity vs the flax modules is pinned by tests/test_conv_fused.py and
tests/test_tinyvit_fast.py.

Reference behavior: mobile_sam tiny_vit_5m as served by vlfm/vlm/sam.py:24-57.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


from vlfm_tpu.ops.backend import default_interpret as _default_interpret


# Chebyshev LSQ fit of q(u) = (Phi(x) - 0.5)/x in u = x^2 on [0, 16];
# gelu_poly(x) = x * (0.5 + clamp(x)*q(clamp(x)^2)) matches exact (erf) gelu
# to |err| <= 1.3e-4 everywhere — far below bf16 resolution — using only
# FMAs (no exp/erf/divide, which are the VPU cost of exact gelu and which
# Mosaic partly cannot lower at all).
_GELU_Q = (
    0.39894017029044904, -0.066466794897970471, 0.0099298524285301726,
    -0.0011557072765977785, 0.00010368957773723845, -6.8878449204152679e-06,
    3.1332930776300218e-07, -8.5560302003169164e-09, 1.0436412873058145e-10,
)


def gelu_poly(x):
    """Polynomial exact-gelu approximation (|err| <= 1.3e-4, FMA-only).

    TinyViT uses torch's default non-approximate GELU; this stands in for it
    on serving paths where the erf's exp/divide dominates VPU time (and
    inside pallas kernels, where Mosaic has no erf lowering at all).
    """
    y = jnp.clip(x, -4.0, 4.0)
    u = y * y
    q = jnp.full_like(u, _GELU_Q[-1])
    for c in _GELU_Q[-2::-1]:
        q = q * u + c
    return x * (0.5 + y * q)


_gelu = gelu_poly


# ---------------------------------------------------------------------------
# Stride-1 MBConv / PatchMerging chain (pallas):
#   gelu(1x1) -> dw3x3 -> gelu -> 1x1 [+x] [-> gelu]
# ---------------------------------------------------------------------------
def _chain_kernel(
    xp_ref, xc_ref, xn_ref, w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref,
    o_ref, *, residual: bool, final_gelu: bool,
):
    """One (1, TH, W, Cin) row-tile; halo rows come from the neighbouring
    tiles (zeros at the image border)."""
    i = pl.program_id(1)
    n = pl.num_programs(1)
    xc = xc_ref[0]  # (TH, W, Cin)
    th, w, cin = xc.shape
    xin = jnp.concatenate(
        [xp_ref[0, th - 1][None], xc, xn_ref[0, 0][None]], axis=0
    )  # (TH+2, W, Cin)

    ch = w1_ref.shape[1]
    h = jnp.dot(
        xin.reshape((th + 2) * w, cin), w1_ref[:],
        preferred_element_type=jnp.float32,
    )
    h = _gelu(h + b1_ref[:].astype(jnp.float32)).astype(xc.dtype)
    h = h.reshape(th + 2, w, ch)
    # the dw conv's SAME zero padding lives in h-space: zero the halo rows at
    # the image border (a zero x row would otherwise contribute gelu(b1))
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (th + 2, 1, 1), 0)
    h = jnp.where((row_ids == 0) & (i == 0), 0.0, h)
    h = jnp.where((row_ids == th + 1) & (i == n - 1), 0.0, h)
    hp = jnp.pad(h, ((0, 0), (1, 1), (0, 0)))

    acc = jnp.zeros((th, w, ch), jnp.float32)
    for di in range(3):
        for dj in range(3):
            sl = jax.lax.slice(hp, (di, dj, 0), (di + th, dj + w, ch))
            acc = acc + sl.astype(jnp.float32) * w2_ref[di, dj].astype(jnp.float32)
    acc = _gelu(acc + b2_ref[:].astype(jnp.float32)).astype(xc.dtype)

    out = jnp.dot(
        acc.reshape(th * w, ch), w3_ref[:], preferred_element_type=jnp.float32
    ) + b3_ref[:].astype(jnp.float32)
    out = out.reshape(th, w, w3_ref.shape[1])
    if residual:
        out = out + xc.astype(jnp.float32)
    if final_gelu:
        out = _gelu(out)
    o_ref[0] = out.astype(o_ref.dtype)


@partial(
    jax.jit,
    static_argnames=("residual", "final_gelu", "row_tile", "interpret"),
)
def mbconv_chain(
    x: jnp.ndarray,
    w1: jnp.ndarray, b1: jnp.ndarray,
    w2: jnp.ndarray, b2: jnp.ndarray,
    w3: jnp.ndarray, b3: jnp.ndarray,
    *,
    residual: bool = False,
    final_gelu: bool = False,
    row_tile: int = 16,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """gelu(1x1) -> dw3x3 (stride 1) -> gelu -> 1x1 [+x] [-> gelu], fused.

    x (B, H, W, Cin); w1 (Cin, Ch); w2 (3, 3, Ch); w3 (Ch, Cout).
    residual requires Cout == Cin (TinyViT MBConv: residual + final gelu);
    the stride-1 PatchMerging uses residual=False, final_gelu=False.
    """
    if interpret is None:
        interpret = _default_interpret()
    b, hh, ww, cin = x.shape
    cout = w3.shape[1]
    th = min(row_tile, hh)
    while hh % th:
        th //= 2
    grid = (b, hh // th)
    blk = (1, th, ww, cin)
    kernel = partial(_chain_kernel, residual=residual, final_gelu=final_gelu)
    in_specs = [
        pl.BlockSpec(blk, lambda bb, i: (bb, jnp.maximum(i - 1, 0), 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(blk, lambda bb, i: (bb, i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(
            blk,
            lambda bb, i, _n=grid[1]: (bb, jnp.minimum(i + 1, _n - 1), 0, 0),
            memory_space=pltpu.VMEM,
        ),
    ]
    wspecs = [
        pl.BlockSpec(t.shape, lambda bb, i, _nd=t.ndim: (0,) * _nd,
                     memory_space=pltpu.VMEM)
        for t in (w1, b1, w2, b2, w3, b3)
    ]
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs + wspecs,
        out_specs=pl.BlockSpec((1, th, ww, cout), lambda bb, i: (bb, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, hh, ww, cout), x.dtype),
        interpret=interpret,
    )(x, x, x, w1, b1, w2, b2, w3, b3)


# ---------------------------------------------------------------------------
# Stride-2 stages as unit-stride XLA ops (space-to-depth / parity planes)
# ---------------------------------------------------------------------------
def space_to_depth(x: jnp.ndarray, f: int) -> jnp.ndarray:
    """(B, H, W, C) -> (B, H/f, W/f, f*f*C); channel order (row-slot ri,
    col-slot cj, ci)."""
    b, h, w, c = x.shape
    y = x.reshape(b, h // f, f, w // f, f, c).transpose(0, 1, 3, 2, 4, 5)
    return y.reshape(b, h // f, w // f, f * f * c)


def _assemble_pe1(w1: jnp.ndarray) -> jnp.ndarray:
    """(3, 3, 3, c1) stride-2 taps -> (2, 2, 48, 4*c1) on s2d(x, 4); output
    channel order (p, q, co) = the s2d-2 layout of the half-res mid tensor."""
    c1 = w1.shape[3]
    W = jnp.zeros((2, 2, 48, 4 * c1), w1.dtype)
    for p in range(2):
        for q in range(2):
            for di in range(3):
                for dj in range(3):
                    v, u = 2 * p - 1 + di, 2 * q - 1 + dj
                    da, ri = (0, 3) if v < 0 else (1, v)
                    db, cj = (0, 3) if u < 0 else (1, u)
                    s = (ri * 4 + cj) * 3
                    o = (p * 2 + q) * c1
                    W = W.at[da, db, s:s + 3, o:o + c1].add(w1[di, dj])
    return W


def _assemble_s2_taps(w2: jnp.ndarray) -> jnp.ndarray:
    """(3, 3, cin, cout) stride-2 taps -> (2, 2, 4*cin, cout) consuming an
    s2d-2 tensor with channel order (p, q, ci)."""
    cin, cout = w2.shape[2], w2.shape[3]
    W = jnp.zeros((2, 2, 4 * cin, cout), w2.dtype)
    for di in range(3):
        for dj in range(3):
            v, u = di - 1, dj - 1
            da, p = (0, 1) if v < 0 else (1, v)
            db, q = (0, 1) if u < 0 else (1, u)
            s = (p * 2 + q) * cin
            W = W.at[da, db, s:s + cin, :].add(w2[di, dj])
    return W


def _conv_unit(x, w, pad):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), pad, dimension_numbers=("NHWC", "HWIO", "NHWC"))


@jax.jit
def patch_embed_s2d(
    x: jnp.ndarray,
    w1: jnp.ndarray, b1: jnp.ndarray,
    w2: jnp.ndarray, b2: jnp.ndarray,
) -> jnp.ndarray:
    """TinyViT patch embed — gelu(conv3x3 s2, 3->c1) -> conv3x3 s2 (c1->c2) —
    as two unit-stride 2x2 convs over space-to-depth planes.

    x (B, H, W, 3); w1 (3, 3, 3, c1); w2 (3, 3, c1, c2) (flax layouts).
    Returns (B, H/4, W/4, c2).
    """
    y = space_to_depth(x, 4)  # (B, H/4, W/4, 48)
    mid = _conv_unit(y, _assemble_pe1(w1.astype(x.dtype)), [(1, 0), (1, 0)])
    mid = _gelu(mid + jnp.tile(b1, 4).astype(mid.dtype))
    out = _conv_unit(
        mid.astype(x.dtype), _assemble_s2_taps(w2.astype(x.dtype)), [(1, 0), (1, 0)]
    )
    return out + b2.astype(out.dtype)


@jax.jit
def merge_chain_s2(
    x: jnp.ndarray,
    w1: jnp.ndarray, b1: jnp.ndarray,
    w2: jnp.ndarray, b2: jnp.ndarray,
    w3: jnp.ndarray, b3: jnp.ndarray,
) -> jnp.ndarray:
    """PatchMerging with stride 2 — gelu(1x1 cin->ch) -> dw3x3 s2 -> gelu ->
    1x1 — via parity planes: the 1x1 expand commutes with the parity split,
    so the depthwise stride-2 conv becomes 9 unit-shift taps over the four
    expanded half-res planes.

    x (B, H, W, cin); w1 (cin, ch); w2 (3, 3, ch); w3 (ch, cout).
    """
    b_, h, w, cin = x.shape
    ch = w1.shape[1]
    hpl = {}
    for p in range(2):
        for q in range(2):
            hpl[(p, q)] = _gelu(
                jnp.einsum("bhwc,cd->bhwd", x[:, p::2, q::2], w1)
                + b1.astype(x.dtype)
            )
    acc = jnp.zeros((b_, h // 2, w // 2, ch), jnp.float32)
    for di in range(3):
        v = di - 1
        da, p = (1, 1) if v < 0 else (0, v)  # h row 2r-1+di = 2(r-da)+p
        for dj in range(3):
            u = dj - 1
            db, q = (1, 1) if u < 0 else (0, u)
            shifted = jnp.pad(
                hpl[(p, q)], ((0, 0), (da, 0), (db, 0), (0, 0))
            )[:, : h // 2, : w // 2]
            acc = acc + shifted.astype(jnp.float32) * w2[di, dj].astype(jnp.float32)
    y = _gelu(acc + b2.astype(jnp.float32)).astype(x.dtype)
    return jnp.einsum("bhwc,cd->bhwd", y, w3) + b3.astype(x.dtype)
