"""Fused serving path for the TinyViT (MobileSAM) encoder.

Consumes the SAME param tree as models/tinyvit.py's flax module (so
convert_mobile_sam_encoder checkpoints work unchanged) but runs the conv
stages — patch embed, stage-0 MBConvs, the three PatchMergings — through the
pallas kernels in ops/conv_fused.py, keeping the 4x-expanded hidden tensors
in VMEM instead of round-tripping HBM per conv. The attention stages and the
SAM neck are already MXU-friendly and stay on the plain flax/XLA path.

Parity vs the flax module is pinned by tests/test_tinyvit_fast.py; the only
numeric deviations are the polynomial erf (|err| <= 1.5e-7) and f32
accumulation order inside the fused kernels.

Reference behavior: mobile_sam tiny_vit_5m as served by vlfm/vlm/sam.py:24-57.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from vlfm_tpu.models.tinyvit import TinyViTBlock, TinyViTConfig
from vlfm_tpu.ops.conv_fused import (
    gelu_poly,
    mbconv_chain,
    merge_chain_s2,
    patch_embed_s2d,
)


def _chain_weights(p: Dict[str, Any], dt):
    """ConvBN triplet params -> mbconv_chain args (w1, b1, w2, b2, w3, b3)."""
    k1 = p["conv1"]["conv"]["kernel"]  # (1, 1, cin, ch)
    k2 = p["conv2"]["conv"]["kernel"]  # (3, 3, 1, ch) depthwise
    k3 = p["conv3"]["conv"]["kernel"]  # (1, 1, ch, cout)
    return (
        k1[0, 0].astype(dt), p["conv1"]["conv"]["bias"].astype(jnp.float32),
        k2[:, :, 0].astype(dt), p["conv2"]["conv"]["bias"].astype(jnp.float32),
        k3[0, 0].astype(dt), p["conv3"]["conv"]["bias"].astype(jnp.float32),
    )


def encode_fused(
    params: Dict[str, Any],
    images: jnp.ndarray,
    cfg: TinyViTConfig,
    *,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Normalized (B, S, S, 3) images -> (B, S/16, S/16, out_channels).

    `params` is the flax TinyViT tree (tinyvit.py), e.g. sam_params["vision"].
    """
    dt = cfg.compute_dtype or images.dtype
    x = patch_embed_s2d(
        images.astype(dt),
        params["patch_embed1"]["conv"]["kernel"].astype(dt),
        params["patch_embed1"]["conv"]["bias"].astype(jnp.float32),
        params["patch_embed2"]["conv"]["kernel"].astype(dt),
        params["patch_embed2"]["conv"]["bias"].astype(jnp.float32),
    )

    for i in range(cfg.depths[0]):
        x = mbconv_chain(
            x, *_chain_weights(params[f"stage0_block{i}"], dt),
            residual=True, final_gelu=True, interpret=interpret,
        )

    for s in range(1, len(cfg.depths)):
        stride = 2 if s < len(cfg.depths) - 1 else 1
        if stride == 2:
            x = merge_chain_s2(x, *_chain_weights(params[f"merge{s}"], dt))
        else:
            x = mbconv_chain(
                x, *_chain_weights(params[f"merge{s}"], dt),
                residual=False, final_gelu=False, interpret=interpret,
            )
        block = TinyViTBlock(
            cfg.embed_dims[s], cfg.num_heads[s], cfg.window_sizes[s],
            cfg.mlp_ratio, act=gelu_poly,
        )
        for i in range(cfg.depths[s]):
            bp = jax.tree_util.tree_map(
                lambda a: a.astype(dt), params[f"stage{s}_block{i}"]
            )
            x = block.apply({"params": bp}, x)

    # SAM neck: 1x1 conv -> LayerNorm2d -> 3x3 conv -> LayerNorm2d
    from vlfm_tpu.models.sam import LayerNorm2d

    def _ln2d(p, y):
        return LayerNorm2d().apply({"params": p}, y)

    x = jnp.einsum(
        "bhwc,cd->bhwd", x, params["neck_conv1"]["kernel"][0, 0].astype(dt)
    )
    x = _ln2d(params["neck_ln1"], x)
    x = jax.lax.conv_general_dilated(
        x, params["neck_conv2"]["kernel"].astype(x.dtype),
        window_strides=(1, 1), padding=[(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return _ln2d(params["neck_ln2"], x)
