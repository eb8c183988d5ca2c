"""Q-Former: BERT encoder with learned query tokens and periodic
cross-attention to vision features (HF Blip2QFormerModel layout).

Two operating modes (both needed by the ITC head, blip2itm.py:37-54):
- image branch: the 32 learned query tokens self-attend and cross-attend to
  the ViT output every ``cross_attention_freq`` layers; queries use the
  dedicated ``*_query`` feed-forward branch.
- text branch: ordinary post-LN BERT over token embeddings (no
  cross-attention, shared self-attention weights, the text feed-forward
  branch).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from vlfm_tpu.models.layers import BertAttention, LayerNormF32


@dataclass(frozen=True)
class QFormerConfig:
    hidden: int = 768
    layers: int = 12
    heads: int = 12
    intermediate: int = 3072
    cross_attention_freq: int = 2
    num_queries: int = 32
    vocab_size: int = 30522
    max_position: int = 512
    ln_eps: float = 1e-12


class BertSelfOut(nn.Module):
    """dense -> residual add -> LayerNorm (post-LN)."""

    ln_eps: float

    @nn.compact
    def __call__(self, hidden, residual):
        return LayerNormF32(self.ln_eps, name="ln")(hidden + residual)


class QFormerLayer(nn.Module):
    cfg: QFormerConfig
    has_cross: bool

    @nn.compact
    def __call__(self, x, image_embeds: Optional[jnp.ndarray], self_mask, is_query: bool):
        c = self.cfg
        a = BertAttention(c.heads, name="self_attn")(x, mask=self_mask)
        x = LayerNormF32(c.ln_eps, name="self_ln")(a + x)

        if self.has_cross and is_query:
            assert image_embeds is not None
            ca = BertAttention(c.heads, name="cross_attn")(x, kv=image_embeds)
            x = LayerNormF32(c.ln_eps, name="cross_ln")(ca + x)

        branch = "query" if is_query else "text"
        h = nn.Dense(c.intermediate, name=f"ffn_{branch}_fc1")(x)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(c.hidden, name=f"ffn_{branch}_fc2")(h)
        x = LayerNormF32(c.ln_eps, name=f"ffn_{branch}_ln")(h + x)
        return x


class QFormer(nn.Module):
    cfg: QFormerConfig

    @nn.compact
    def __call__(
        self,
        inputs: jnp.ndarray,  # (B, L, hidden) query tokens OR token embeddings
        image_embeds: Optional[jnp.ndarray] = None,
        attention_mask: Optional[jnp.ndarray] = None,  # (B, L) bool
        is_query: bool = True,
    ):
        c = self.cfg
        x = LayerNormF32(c.ln_eps, name="embed_ln")(inputs)
        self_mask = None
        if attention_mask is not None:
            self_mask = attention_mask[:, None, None, :]
        for i in range(c.layers):
            x = QFormerLayer(
                c, has_cross=(i % c.cross_attention_freq == 0), name=f"layer{i}"
            )(x, image_embeds, self_mask, is_query)
        return x


class TextEmbeddings(nn.Module):
    cfg: QFormerConfig

    @nn.compact
    def __call__(self, input_ids):  # (B, L) int32
        c = self.cfg
        w = nn.Embed(c.vocab_size, c.hidden, name="word")(input_ids)
        pos = self.param(
            "position", nn.initializers.normal(0.02), (c.max_position, c.hidden)
        )
        return w + pos[None, : input_ids.shape[1]].astype(w.dtype)
