"""Pre-LN ViT vision encoder (CLIP/EVA family), HF Blip2VisionModel layout.

Parity target: the EVA-CLIP ViT-g/14 backbone behind the reference's
BLIP-2 ITM server (vlfm/vlm/blip2itm.py:29-35, lavis
``blip2_image_text_matching`` "pretrain"), in the weight layout of
huggingface ``Blip2VisionModel`` so released checkpoints convert 1:1
(fused qkv, learned class + position embeddings, pre-LN blocks,
post-layernorm output).
"""

from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
import jax.numpy as jnp

from vlfm_tpu.models.layers import MLP, FusedQKVAttention, LayerNormF32


@dataclass(frozen=True)
class ViTConfig:
    image_size: int = 224
    patch_size: int = 14
    width: int = 1408
    depth: int = 39
    heads: int = 16
    mlp_dim: int = 6144
    ln_eps: float = 1e-6

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2


class ViTBlock(nn.Module):
    cfg: ViTConfig

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        x = x + FusedQKVAttention(c.heads, name="attn")(
            LayerNormF32(c.ln_eps, name="ln1")(x)
        )
        x = x + MLP(c.mlp_dim, name="mlp")(LayerNormF32(c.ln_eps, name="ln2")(x))
        return x


class ViTEncoder(nn.Module):
    cfg: ViTConfig

    @nn.compact
    def __call__(self, images):  # (B, H, W, 3) float in model scale
        c = self.cfg
        x = nn.Conv(
            c.width,
            (c.patch_size, c.patch_size),
            strides=c.patch_size,
            padding="VALID",
            name="patch_embed",
        )(images)
        b = x.shape[0]
        x = x.reshape(b, -1, c.width)
        cls = self.param("class_embedding", nn.initializers.normal(0.02), (c.width,))
        x = jnp.concatenate([jnp.tile(cls[None, None], (b, 1, 1)).astype(x.dtype), x], axis=1)
        pos = self.param(
            "position_embedding",
            nn.initializers.normal(0.02),
            (c.num_patches + 1, c.width),
        )
        x = x + pos[None].astype(x.dtype)
        for i in range(c.depth):
            x = ViTBlock(c, name=f"block{i}")(x)
        return LayerNormF32(c.ln_eps, name="post_ln")(x)
