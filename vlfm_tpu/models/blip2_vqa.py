"""BLIP-2 VQA: the full visual bridge into the T5 language model.

Parity target: the reference's BLIP2 VQA server (vlfm/vlm/blip2.py:35-55 —
lavis ``blip2_t5`` with flan-t5-xl): image -> frozen EVA ViT -> Q-Former
query tokens -> language projection -> prepended to the prompt embeddings of
a frozen flan-T5, which generates the answer ("Question: Is this a <phrase>?
Answer:"). Used by the detection veto (base_objectnav_policy.py:326-335).

TPU redesign: the whole chain — CLIP normalization, EVA ViT, Q-Former,
language projection, T5 greedy decode — is one jitted program over an image
batch; no HTTP, no per-image calls. Reuses the ViT/Q-Former modules (and
their converted weights' layout) from the ITM head and the T5 stack from
``t5_vqa``. Weights convert from HF ``Salesforce/blip2-flan-t5-xl`` via
``convert_hf_blip2_t5``.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial
from typing import Any, Dict, Mapping, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from vlfm_tpu.models.blip2_itm import (
    CLIP_MEAN,
    CLIP_STD,
    _lin,
    convert_qformer_tree,
    convert_vision_tree,
)
from vlfm_tpu.models.qformer import QFormer, QFormerConfig
from vlfm_tpu.models.t5_vqa import T5Config, T5VQA, convert_hf_t5
from vlfm_tpu.models.vit import ViTConfig, ViTEncoder
from vlfm_tpu.ops.resize import resize_matmul


@dataclass(frozen=True)
class BLIP2VQAConfig:
    vit: ViTConfig = field(default_factory=ViTConfig)
    qformer: QFormerConfig = field(default_factory=QFormerConfig)
    t5: T5Config = field(default_factory=T5Config)
    compute_dtype: Any = jnp.bfloat16

    @staticmethod
    def tiny() -> "BLIP2VQAConfig":
        return BLIP2VQAConfig(
            vit=ViTConfig(image_size=56, patch_size=14, width=64, depth=2, heads=4, mlp_dim=128),
            qformer=QFormerConfig(
                hidden=32, layers=2, heads=4, intermediate=64, num_queries=8, vocab_size=100
            ),
            t5=T5Config.tiny(),
            compute_dtype=jnp.float32,
        )

    @staticmethod
    def production() -> "BLIP2VQAConfig":
        """Salesforce/blip2-flan-t5-xl: EVA ViT-g vision tower + BERT-base
        Q-Former (32 queries) + flan-t5-xl language model — the exact
        composition the reference serves for the VQA veto
        (vlfm/vlm/blip2.py:19-24, base_objectnav_policy.py:326-335). The
        ViT/Q-Former defaults of this repo ARE the production sizes (shared
        with BLIP2-ITM)."""
        return BLIP2VQAConfig(t5=T5Config.flan_xl())


class BLIP2VisualPrefixModule(nn.Module):
    """images [0,1] -> (B, Q, t5.d_model) language-projected query tokens."""

    cfg: BLIP2VQAConfig

    @nn.compact
    def __call__(self, images: jnp.ndarray) -> jnp.ndarray:
        c = self.cfg
        mean = jnp.asarray(CLIP_MEAN, images.dtype)
        std = jnp.asarray(CLIP_STD, images.dtype)
        x = ((images - mean) / std).astype(c.compute_dtype)
        embeds = ViTEncoder(c.vit, name="vision")(x)
        b = embeds.shape[0]
        query_tokens = self.param(
            "query_tokens",
            nn.initializers.normal(0.02),
            (c.qformer.num_queries, c.qformer.hidden),
        )
        queries = jnp.tile(query_tokens[None], (b, 1, 1)).astype(c.compute_dtype)
        out = QFormer(c.qformer, name="qformer")(queries, image_embeds=embeds, is_query=True)
        return nn.Dense(c.t5.d_model, name="language_projection")(
            out.astype(jnp.float32)
        )


class BLIP2VQA:
    """The composed veto model: ``ask`` = visual prefix + T5 greedy decode."""

    def __init__(self, cfg: BLIP2VQAConfig, params: Dict[str, Any], t5: T5VQA):
        self.cfg = cfg
        self.params = params
        self.module = BLIP2VisualPrefixModule(cfg)
        self.t5 = t5

    @classmethod
    def init_random(cls, cfg: BLIP2VQAConfig, seed: int = 0) -> "BLIP2VQA":
        s = cfg.vit.image_size
        params = BLIP2VisualPrefixModule(cfg).init(
            jax.random.PRNGKey(seed), jnp.zeros((1, s, s, 3))
        )["params"]
        return cls(cfg, params, T5VQA.init_random(cfg.t5, seed=seed))

    @staticmethod
    @partial(jax.jit, static_argnames=("module",))
    def _prefix(module, params, images):
        return module.apply({"params": params}, images)

    def image_prefix(self, images: jnp.ndarray) -> jnp.ndarray:
        """(B, H, W, 3) float [0, 1] at model resolution -> (B, Q, d_model)."""
        return self._prefix(self.module, self.params, images)

    def preprocess(self, rgb_uint8: jnp.ndarray) -> jnp.ndarray:
        s = self.cfg.vit.image_size
        x = rgb_uint8.astype(jnp.float32) / 255.0
        return resize_matmul(x, s, s, "cubic")

    def ask(
        self,
        rgb_uint8: jnp.ndarray,
        input_ids: jnp.ndarray,
        attention_mask: jnp.ndarray,
        max_new_tokens: int = 8,
    ) -> jnp.ndarray:
        """(B, H, W, 3) uint8 + tokenized question -> generated token ids.
        The blip2_t5 ``generate`` composition (vlfm/vlm/blip2.py:35-55)."""
        prefix = self.image_prefix(self.preprocess(rgb_uint8))
        return self.t5.generate(
            input_ids, attention_mask, max_new_tokens=max_new_tokens, prefix=prefix
        )


def convert_hf_blip2_t5(
    sd: Mapping[str, Any], cfg: BLIP2VQAConfig
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """HF Blip2ForConditionalGeneration (flan-t5 text stack) state_dict ->
    (visual-prefix params, T5 params)."""
    sd = {k: np.asarray(v) for k, v in sd.items()}
    prefix_params: Dict[str, Any] = {
        "vision": convert_vision_tree(sd, cfg.vit),
        "qformer": convert_qformer_tree(sd, cfg.qformer, text_branch=False),
        "query_tokens": jnp.asarray(
            sd["query_tokens"].reshape(cfg.qformer.num_queries, cfg.qformer.hidden)
        ),
        "language_projection": _lin(sd, "language_projection"),
    }
    lm = {
        k[len("language_model."):]: v
        for k, v in sd.items()
        if k.startswith("language_model.")
    }
    t5_params = convert_hf_t5(lm, cfg.t5)
    return prefix_params, t5_params


def load_blip2_vqa(sd: Mapping[str, Any], cfg: BLIP2VQAConfig) -> BLIP2VQA:
    prefix_params, t5_params = convert_hf_blip2_t5(sd, cfg)
    return BLIP2VQA(cfg, prefix_params, T5VQA(cfg.t5, t5_params))
