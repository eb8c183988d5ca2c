"""BLIP-2 image-text matching (ITC head) as batched XLA inference.

Parity target: the reference's BLIP2ITM Flask server
(vlfm/vlm/blip2itm.py:17-54 — lavis ``blip2_image_text_matching`` with
``match_head="itc"``): cosine(image, text) = max over the 32 Q-Former query
embeddings of the normalized query/text projection dot product.

TPU redesign: instead of one HTTP request per (image, prompt) pair with
JPEG-base64 transport and a client-side lockfile mutex
(vlfm/vlm/server_wrapper.py:57-164), scoring is a single jitted program over
an IMAGE BATCH x TEXT BATCH — preprocessing (resize + CLIP normalization)
fused into the graph, bf16 activations, and the (B_img, B_txt) cosine matrix
computed in one shot. Prompt-channel text embeddings are computed once per
episode and cached (they are constant across steps).

Weights convert from the released HF checkpoint (Salesforce/blip2-itm-vit-g)
via ``convert_hf_state_dict``.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial
from typing import Any, Dict, Mapping

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
from vlfm_tpu.ops.resize import resize_matmul

from vlfm_tpu.models.qformer import QFormer, QFormerConfig, TextEmbeddings
from vlfm_tpu.models.vit import ViTConfig, ViTEncoder

CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)


@dataclass(frozen=True)
class BLIP2ITMConfig:
    vit: ViTConfig = field(default_factory=ViTConfig)
    qformer: QFormerConfig = field(default_factory=QFormerConfig)
    embed_dim: int = 256
    compute_dtype: Any = jnp.bfloat16

    @staticmethod
    def tiny() -> "BLIP2ITMConfig":
        """Small config for tests/CI."""
        return BLIP2ITMConfig(
            vit=ViTConfig(image_size=56, patch_size=14, width=64, depth=2, heads=4, mlp_dim=128),
            qformer=QFormerConfig(
                hidden=32, layers=2, heads=4, intermediate=64, num_queries=8, vocab_size=100
            ),
            embed_dim=16,
        )


class BLIP2ITMModule(nn.Module):
    cfg: BLIP2ITMConfig

    def setup(self):
        self.vision = ViTEncoder(self.cfg.vit, name="vision")
        self.qformer = QFormer(self.cfg.qformer, name="qformer")
        self.text_embeddings = TextEmbeddings(self.cfg.qformer, name="text_embeddings")
        self.query_tokens = self.param(
            "query_tokens",
            nn.initializers.normal(0.02),
            (self.cfg.qformer.num_queries, self.cfg.qformer.hidden),
        )
        self.vision_proj = nn.Dense(self.cfg.embed_dim, name="vision_proj")
        self.text_proj = nn.Dense(self.cfg.embed_dim, name="text_proj")

    def image_feats(self, images: jnp.ndarray) -> jnp.ndarray:
        """(B, H, W, 3) in [0, 1] -> (B, Q, E) normalized query features."""
        c = self.cfg
        mean = jnp.asarray(CLIP_MEAN, images.dtype)
        std = jnp.asarray(CLIP_STD, images.dtype)
        x = (images - mean) / std
        x = x.astype(c.compute_dtype)
        embeds = self.vision(x)
        b = embeds.shape[0]
        queries = jnp.tile(self.query_tokens[None], (b, 1, 1)).astype(c.compute_dtype)
        out = self.qformer(queries, image_embeds=embeds, is_query=True)
        feats = self.vision_proj(out.astype(jnp.float32))
        return feats / jnp.linalg.norm(feats, axis=-1, keepdims=True)

    def text_feats(self, input_ids: jnp.ndarray, attention_mask: jnp.ndarray) -> jnp.ndarray:
        """(T, L) int ids -> (T, E) normalized CLS features."""
        emb = self.text_embeddings(input_ids).astype(self.cfg.compute_dtype)
        out = self.qformer(emb, attention_mask=attention_mask, is_query=False)
        cls = out[:, 0].astype(jnp.float32)
        feats = self.text_proj(cls)
        return feats / jnp.linalg.norm(feats, axis=-1, keepdims=True)

    def __call__(self, images, input_ids, attention_mask):
        """(B_img, B_txt) ITC cosine matrix (max over query tokens)."""
        img = self.image_feats(images)  # (B, Q, E)
        txt = self.text_feats(input_ids, attention_mask)  # (T, E)
        sims = jnp.einsum("bqe,te->bqt", img, txt)
        return jnp.max(sims, axis=1)


class BLIP2ITM:
    """Stateful convenience wrapper with jitted scoring entry points."""

    def __init__(self, cfg: BLIP2ITMConfig, params: Dict[str, Any]):
        self.cfg = cfg
        self.params = params
        self.module = BLIP2ITMModule(cfg)

    @classmethod
    def init_random(cls, cfg: BLIP2ITMConfig, seed: int = 0) -> "BLIP2ITM":
        mod = BLIP2ITMModule(cfg)
        s = cfg.vit.image_size
        params = mod.init(
            jax.random.PRNGKey(seed),
            jnp.zeros((1, s, s, 3)),
            jnp.zeros((1, 4), jnp.int32),
            jnp.ones((1, 4), bool),
        )["params"]
        return cls(cfg, params)

    # Params are passed as traced arguments (never captured through a static
    # `self`) — capturing them embeds GBs of weights as XLA constants.
    @staticmethod
    @partial(jax.jit, static_argnames=("module",))
    def _cosine(module, params, images, input_ids, attention_mask):
        return module.apply({"params": params}, images, input_ids, attention_mask)

    @staticmethod
    @partial(jax.jit, static_argnames=("module",))
    def _encode_texts(module, params, input_ids, attention_mask):
        return module.apply(
            {"params": params}, input_ids, attention_mask,
            method=BLIP2ITMModule.text_feats,
        )

    @staticmethod
    @partial(jax.jit, static_argnames=("module",))
    def _cosine_cached(module, params, images, text_feats):
        img = module.apply({"params": params}, images, method=BLIP2ITMModule.image_feats)
        return jnp.max(jnp.einsum("bqe,te->bqt", img, text_feats), axis=1)

    def cosine(self, images, input_ids, attention_mask):
        return self._cosine(self.module, self.params, images, input_ids, attention_mask)

    def encode_texts(self, input_ids, attention_mask):
        return self._encode_texts(self.module, self.params, input_ids, attention_mask)

    def cosine_cached_text(self, images, text_feats):
        return self._cosine_cached(self.module, self.params, images, text_feats)

    def preprocess(self, rgb_uint8: jnp.ndarray) -> jnp.ndarray:
        """(B, H, W, 3) uint8 -> resized float [0, 1] at model resolution."""
        s = self.cfg.vit.image_size
        x = rgb_uint8.astype(jnp.float32) / 255.0
        return resize_matmul(x, s, s, "cubic")


# ---------------------------------------------------------------------------
# HF checkpoint conversion (Salesforce/blip2-itm-vit-g layout)
# ---------------------------------------------------------------------------
def _lin(sd, name):
    return {"kernel": jnp.asarray(np.asarray(sd[f"{name}.weight"]).T),
            "bias": jnp.asarray(np.asarray(sd[f"{name}.bias"]))}


def _ln(sd, name):
    return {"ln": {"scale": jnp.asarray(np.asarray(sd[f"{name}.weight"])),
                   "bias": jnp.asarray(np.asarray(sd[f"{name}.bias"]))}}


def convert_vision_tree(sd: Mapping[str, Any], vit_cfg) -> Dict[str, Any]:
    """``vision_model.*`` (HF Blip2VisionModel layout, shared by the ITM and
    conditional-generation checkpoints) -> our ViTEncoder param tree."""
    vit: Dict[str, Any] = {
        "patch_embed": {
            "kernel": jnp.asarray(
                np.asarray(
                    sd["vision_model.embeddings.patch_embedding.weight"]
                ).transpose(2, 3, 1, 0)
            ),
        },
        "class_embedding": jnp.asarray(
            np.asarray(sd["vision_model.embeddings.class_embedding"]).reshape(-1)
        ),
        "position_embedding": jnp.asarray(
            np.asarray(sd["vision_model.embeddings.position_embedding"]).reshape(
                -1, vit_cfg.width
            )
        ),
        "post_ln": _ln(sd, "vision_model.post_layernorm"),
    }
    if "vision_model.embeddings.patch_embedding.bias" in sd:
        vit["patch_embed"]["bias"] = jnp.asarray(
            sd["vision_model.embeddings.patch_embedding.bias"]
        )
    for i in range(vit_cfg.depth):
        p = f"vision_model.encoder.layers.{i}"
        vit[f"block{i}"] = {
            "ln1": _ln(sd, f"{p}.layer_norm1"),
            "ln2": _ln(sd, f"{p}.layer_norm2"),
            "attn": {"qkv": _lin(sd, f"{p}.self_attn.qkv"),
                     "proj": _lin(sd, f"{p}.self_attn.projection")},
            "mlp": {"fc1": _lin(sd, f"{p}.mlp.fc1"), "fc2": _lin(sd, f"{p}.mlp.fc2")},
        }
    return vit


def convert_qformer_tree(
    sd: Mapping[str, Any], q_cfg, *, text_branch: bool = True
) -> Dict[str, Any]:
    """``qformer.*`` -> our QFormer param tree. The conditional-generation
    checkpoint carries only the query feed-forward branch (no
    ``intermediate``/``output``); the retrieval checkpoint carries both."""
    qf: Dict[str, Any] = {"embed_ln": _ln(sd, "qformer.layernorm")}
    for i in range(q_cfg.layers):
        p = f"qformer.encoder.layer.{i}"
        layer: Dict[str, Any] = {
            "self_attn": {
                "query": _lin(sd, f"{p}.attention.attention.query"),
                "key": _lin(sd, f"{p}.attention.attention.key"),
                "value": _lin(sd, f"{p}.attention.attention.value"),
                "out": _lin(sd, f"{p}.attention.output.dense"),
            },
            "self_ln": _ln(sd, f"{p}.attention.output.LayerNorm"),
            "ffn_query_fc1": _lin(sd, f"{p}.intermediate_query.dense"),
            "ffn_query_fc2": _lin(sd, f"{p}.output_query.dense"),
            "ffn_query_ln": _ln(sd, f"{p}.output_query.LayerNorm"),
        }
        if text_branch:
            layer["ffn_text_fc1"] = _lin(sd, f"{p}.intermediate.dense")
            layer["ffn_text_fc2"] = _lin(sd, f"{p}.output.dense")
            layer["ffn_text_ln"] = _ln(sd, f"{p}.output.LayerNorm")
        if i % q_cfg.cross_attention_freq == 0:
            layer["cross_attn"] = {
                "query": _lin(sd, f"{p}.crossattention.attention.query"),
                "key": _lin(sd, f"{p}.crossattention.attention.key"),
                "value": _lin(sd, f"{p}.crossattention.attention.value"),
                "out": _lin(sd, f"{p}.crossattention.output.dense"),
            }
            layer["cross_ln"] = _ln(sd, f"{p}.crossattention.output.LayerNorm")
        qf[f"layer{i}"] = layer
    return qf


def convert_hf_state_dict(sd: Mapping[str, Any], cfg: BLIP2ITMConfig) -> Dict[str, Any]:
    """Map a HF Blip2ForImageTextRetrieval state_dict into our param tree."""
    sd = {k: np.asarray(v) for k, v in sd.items()}
    vit = convert_vision_tree(sd, cfg.vit)
    qf = convert_qformer_tree(sd, cfg.qformer, text_branch=True)

    params: Dict[str, Any] = {
        "vision": vit,
        "qformer": qf,
        "query_tokens": jnp.asarray(
            sd["query_tokens"].reshape(cfg.qformer.num_queries, cfg.qformer.hidden)
        ),
        "text_embeddings": {
            "word": {"embedding": jnp.asarray(sd["embeddings.word_embeddings.weight"])},
            "position": jnp.asarray(sd["embeddings.position_embeddings.weight"]),
        },
        "vision_proj": _lin(sd, "vision_projection"),
        "text_proj": _lin(sd, "text_projection"),
    }
    return params
