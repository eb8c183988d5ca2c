"""Promptable segmentation (SAM family) as batched XLA inference.

Parity target: the reference's MobileSAM Flask server (vlfm/vlm/sam.py:24-57
— ``segment_bbox(image, xyxy) -> bool mask``), one HTTP request per box.

TPU redesign: the image is encoded ONCE per frame (the expensive part) and
all candidate boxes decode in a single batched call (SAM's decoder natively
batches prompts). Architecture and weight layout follow huggingface
``SamModel`` (facebook/sam-vit-base etc.) so released checkpoints convert
1:1; MobileSAM's TinyViT encoder is a drop-in alternative image encoder
behind the same prompt/mask decoder (planned — the ViT-det encoder here is
the reference implementation and is itself fast on TPU when batched).

Pieces:
- ViT-det image encoder: windowed attention with decomposed relative
  positions (rel_pos_h/w), periodic global layers, conv+LN2d neck.
- Prompt encoder: random-Fourier positional embedding; boxes become two
  corner points with dedicated type embeddings.
- Two-way transformer mask decoder with IoU head and hypernetwork MLPs.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any, Dict, Mapping, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# configs
# ---------------------------------------------------------------------------
@dataclass(frozen=True)
class SamVisionConfig:
    image_size: int = 1024
    patch_size: int = 16
    width: int = 768
    depth: int = 12
    heads: int = 12
    mlp_dim: int = 3072
    window_size: int = 14
    global_attn_indexes: Tuple[int, ...] = (2, 5, 8, 11)
    out_channels: int = 256

    @property
    def grid(self) -> int:
        return self.image_size // self.patch_size


@dataclass(frozen=True)
class SamDecoderConfig:
    hidden: int = 256
    layers: int = 2
    heads: int = 8
    mlp_dim: int = 2048
    num_multimask_outputs: int = 3
    iou_head_depth: int = 3
    iou_head_hidden: int = 256
    downsample_rate: int = 2


@dataclass(frozen=True)
class SamConfig:
    vision: SamVisionConfig = SamVisionConfig()
    decoder: SamDecoderConfig = SamDecoderConfig()
    pe_dim: int = 128  # half of prompt hidden
    # MobileSAM: swap the ViT-det encoder for TinyViT (models/tinyvit.py);
    # vision.image_size/out_channels must agree with the TinyViT config.
    tinyvit: Any = None  # Optional[TinyViTConfig]

    @staticmethod
    def mobile_sam() -> "SamConfig":
        """MobileSAM (vit_t): TinyViT-5M encoder + the standard SAM decoder
        (reference: vlfm/vlm/sam.py:24-57, mobile_sam package)."""
        from vlfm_tpu.models.tinyvit import TinyViTConfig

        tv = TinyViTConfig(compute_dtype=jnp.bfloat16)
        return SamConfig(
            vision=SamVisionConfig(image_size=tv.img_size, patch_size=16,
                                   out_channels=tv.out_channels),
            tinyvit=tv,
        )

    @staticmethod
    def tiny_mobile_sam() -> "SamConfig":
        from vlfm_tpu.models.tinyvit import TinyViTConfig

        tv = TinyViTConfig.tiny()
        return SamConfig(
            vision=SamVisionConfig(image_size=tv.img_size, patch_size=16,
                                   out_channels=tv.out_channels),
            decoder=SamDecoderConfig(
                hidden=16, layers=2, heads=2, mlp_dim=32,
                iou_head_depth=2, iou_head_hidden=16,
            ),
            pe_dim=8,
            tinyvit=tv,
        )

    @staticmethod
    def tiny() -> "SamConfig":
        return SamConfig(
            vision=SamVisionConfig(
                image_size=64, patch_size=8, width=32, depth=2, heads=2,
                mlp_dim=64, window_size=2, global_attn_indexes=(1,), out_channels=16,
            ),
            decoder=SamDecoderConfig(
                hidden=16, layers=2, heads=2, mlp_dim=32,
                iou_head_depth=2, iou_head_hidden=16,
            ),
            pe_dim=8,
        )


# ---------------------------------------------------------------------------
# layers
# ---------------------------------------------------------------------------
class LayerNorm2d(nn.Module):
    """Channel-wise LayerNorm over NHWC feature maps (SAM's LayerNorm2d)."""

    @nn.compact
    def __call__(self, x):
        mu = x.mean(axis=-1, keepdims=True)
        var = ((x - mu) ** 2).mean(axis=-1, keepdims=True)
        x = (x - mu) / jnp.sqrt(var + 1e-6)
        w = self.param("scale", nn.initializers.ones, (x.shape[-1],))
        b = self.param("bias", nn.initializers.zeros, (x.shape[-1],))
        return x * w + b


def _interp_rel_pos(rel_pos: jnp.ndarray, size: int) -> jnp.ndarray:
    need = 2 * size - 1
    if rel_pos.shape[0] == need:
        return rel_pos
    return jax.image.resize(rel_pos, (need, rel_pos.shape[1]), method="linear")


def _decomposed_rel_pos_bias(q, rel_h, rel_w, hw):
    """ViTDet relative position bias: (B*, H, q, q) additive logits.

    q: (B*, heads, h*w, dim) reshaped per-axis contributions.
    """
    h, w = hw
    rel_h = _interp_rel_pos(rel_h, h)
    rel_w = _interp_rel_pos(rel_w, w)
    idx = jnp.arange(h)[:, None] - jnp.arange(h)[None, :] + (h - 1)
    rh = rel_h[idx]  # (h, h, dim)
    idx = jnp.arange(w)[:, None] - jnp.arange(w)[None, :] + (w - 1)
    rw = rel_w[idx]  # (w, w, dim)
    b, nh, _, dim = q.shape
    qr = q.reshape(b, nh, h, w, dim)
    bias_h = jnp.einsum("bnhwd,hkd->bnhwk", qr, rh)  # (b, nh, h, w, h)
    bias_w = jnp.einsum("bnhwd,wkd->bnhwk", qr, rw)  # (b, nh, h, w, w)
    bias = bias_h[..., :, None] + bias_w[..., None, :]  # (b, nh, h, w, h, w)
    return bias.reshape(b, nh, h * w, h * w)


class VitDetAttention(nn.Module):
    heads: int

    @nn.compact
    def __call__(self, x, hw):
        b, l, d = x.shape
        head_dim = d // self.heads
        qkv = nn.Dense(3 * d, name="qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads_of(t):
            return t.reshape(b, l, self.heads, head_dim).transpose(0, 2, 1, 3)

        q, k, v = heads_of(q), heads_of(k), heads_of(v)
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(head_dim)
        rel_h = self.param("rel_pos_h", nn.initializers.zeros, (2 * hw[0] - 1, head_dim))
        rel_w = self.param("rel_pos_w", nn.initializers.zeros, (2 * hw[1] - 1, head_dim))
        logits = logits + _decomposed_rel_pos_bias(q, rel_h, rel_w, hw)
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(x.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, l, d)
        return nn.Dense(d, name="proj")(out)


def window_partition(x, ws):
    b, h, w, c = x.shape
    ph, pw = (ws - h % ws) % ws, (ws - w % ws) % ws
    x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
    hp, wp = h + ph, w + pw
    x = x.reshape(b, hp // ws, ws, wp // ws, ws, c).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, ws, ws, c), (hp, wp)


def window_unpartition(win, ws, pad_hw, hw):
    hp, wp = pad_hw
    b = win.shape[0] // (hp // ws * wp // ws)
    x = win.reshape(b, hp // ws, wp // ws, ws, ws, -1).transpose(0, 1, 3, 2, 4, 5)
    x = x.reshape(b, hp, wp, -1)
    return x[:, : hw[0], : hw[1]]


class VitDetBlock(nn.Module):
    cfg: SamVisionConfig
    is_global: bool

    @nn.compact
    def __call__(self, x):  # (B, H, W, C)
        c = self.cfg
        h, w = x.shape[1:3]
        shortcut = x
        y = nn.LayerNorm(epsilon=1e-6, name="ln1")(x)
        if self.is_global:
            y = y.reshape(y.shape[0], h * w, -1)
            y = VitDetAttention(c.heads, name="attn")(y, (h, w))
            y = y.reshape(shortcut.shape)
        else:
            ws = c.window_size
            win, pad_hw = window_partition(y, ws)
            flat = win.reshape(win.shape[0], ws * ws, -1)
            flat = VitDetAttention(c.heads, name="attn")(flat, (ws, ws))
            y = window_unpartition(flat.reshape(-1, ws, ws, flat.shape[-1]), ws, pad_hw, (h, w))
        x = shortcut + y
        y = nn.LayerNorm(epsilon=1e-6, name="ln2")(x)
        y = nn.Dense(c.mlp_dim, name="mlp_fc1")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(x.shape[-1], name="mlp_fc2")(y)
        return x + y


class SamVisionEncoder(nn.Module):
    cfg: SamVisionConfig

    @nn.compact
    def __call__(self, images):  # (B, S, S, 3) normalized
        c = self.cfg
        x = nn.Conv(c.width, (c.patch_size, c.patch_size), strides=c.patch_size, name="patch_embed")(images)
        pos = self.param("pos_embed", nn.initializers.zeros, (c.grid, c.grid, c.width))
        x = x + pos[None]
        for i in range(c.depth):
            x = VitDetBlock(c, is_global=(i in c.global_attn_indexes), name=f"block{i}")(x)
        x = nn.Conv(c.out_channels, (1, 1), use_bias=False, name="neck_conv1")(x)
        x = LayerNorm2d(name="neck_ln1")(x)
        x = nn.Conv(c.out_channels, (3, 3), padding=1, use_bias=False, name="neck_conv2")(x)
        x = LayerNorm2d(name="neck_ln2")(x)
        return x  # (B, grid, grid, out_channels)


# ---------------------------------------------------------------------------
# prompt encoder + positional embedding
# ---------------------------------------------------------------------------
class SamPositionalEmbedding(nn.Module):
    pe_dim: int

    @nn.compact
    def __call__(self, coords01):  # (..., 2) in [0, 1]
        g = self.param("gaussian", nn.initializers.normal(1.0), (2, self.pe_dim))
        c = 2 * coords01 - 1
        proj = (2 * jnp.pi) * (c @ g)
        return jnp.concatenate([jnp.sin(proj), jnp.cos(proj)], axis=-1)


class SamPromptEncoder(nn.Module):
    """Box prompts only (the reference only ever prompts with boxes)."""

    hidden: int

    @nn.compact
    def __call__(self, pe: SamPositionalEmbedding, boxes01):  # (B, NB, 4) in [0, 1]
        b, nb = boxes01.shape[:2]
        corners = boxes01.reshape(b, nb, 2, 2)
        emb = pe(corners)  # (B, NB, 2, hidden)
        point_embed = self.param(
            "point_embed", nn.initializers.normal(1.0), (4, self.hidden)
        )
        # corner types: top-left = label 2, bottom-right = label 3
        emb = emb.at[:, :, 0, :].add(point_embed[2])
        emb = emb.at[:, :, 1, :].add(point_embed[3])
        return emb  # sparse embeddings (B, NB, 2, hidden)


# ---------------------------------------------------------------------------
# two-way transformer mask decoder
# ---------------------------------------------------------------------------
class DecoderAttention(nn.Module):
    heads: int
    internal_dim: int

    @nn.compact
    def __call__(self, q, k, v):
        d = self.internal_dim
        hq = nn.Dense(d, name="q_proj")(q)
        hk = nn.Dense(d, name="k_proj")(k)
        hv = nn.Dense(d, name="v_proj")(v)

        def split(t):
            return t.reshape(*t.shape[:-1], self.heads, d // self.heads).swapaxes(-3, -2)

        # python-float scale keeps the einsum in the input dtype (jnp.sqrt of
        # an int is a strong f32 scalar and would promote the whole decoder)
        a = jnp.einsum("...hqd,...hkd->...hqk", split(hq), split(hk)) * (
            (d // self.heads) ** -0.5
        )
        p = jax.nn.softmax(a.astype(jnp.float32), axis=-1).astype(q.dtype)
        o = jnp.einsum("...hqk,...hkd->...hqd", p, split(hv))
        o = o.swapaxes(-3, -2).reshape(*q.shape[:-1], d)
        return nn.Dense(q.shape[-1], name="out_proj")(o)


class TwoWayBlock(nn.Module):
    cfg: SamDecoderConfig
    skip_first_layer_pe: bool

    @nn.compact
    def __call__(self, queries, keys, query_pe, key_pe):
        c = self.cfg
        d = c.hidden
        dd = d // c.downsample_rate
        if self.skip_first_layer_pe:
            queries = DecoderAttention(c.heads, d, name="self_attn")(queries, queries, queries)
        else:
            q = queries + query_pe
            queries = queries + DecoderAttention(c.heads, d, name="self_attn")(q, q, queries)
        queries = nn.LayerNorm(epsilon=1e-6, name="ln1")(queries)

        q = queries + query_pe
        k = keys + key_pe
        queries = queries + DecoderAttention(c.heads, dd, name="cross_t2i")(q, k, keys)
        queries = nn.LayerNorm(epsilon=1e-6, name="ln2")(queries)

        y = nn.Dense(c.mlp_dim, name="mlp_lin1")(queries)
        y = nn.relu(y)
        queries = queries + nn.Dense(d, name="mlp_lin2")(y)
        queries = nn.LayerNorm(epsilon=1e-6, name="ln3")(queries)

        q = queries + query_pe
        k = keys + key_pe
        keys = keys + DecoderAttention(c.heads, dd, name="cross_i2t")(k, q, queries)
        keys = nn.LayerNorm(epsilon=1e-6, name="ln4")(keys)
        return queries, keys


class Upscale2x(nn.Module):
    """Drop-in nn.ConvTranspose(out, (2, 2), strides=(2, 2)) — same param
    tree (kernel (2, 2, cin, out), bias) — computed as one matmul plus a
    depth-to-space reshuffle. XLA's conv_transpose lowering costs ~6 ms at
    the decoder's per-box shapes; the einsum form is a plain MXU matmul.

    With ``packed=True`` the 2x2 spatial slots stay as channel dims
    ((..., 2, 2, out), no reshuffle): because stride == kernel size the
    upscale has no spatial overlap, so a whole convT -> norm -> gelu ->
    convT chain is pointwise in packed layout and the (expensive, per-box)
    depth-to-space copy can be deferred until after channel reduction."""

    out: int
    packed: bool = False

    @nn.compact
    def __call__(self, x):  # (..., H, W, Cin)
        cin = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (2, 2, cin, self.out)
        )
        bias = self.param("bias", nn.initializers.zeros, (self.out,))
        y = jnp.einsum(
            "...c,pqcd->...pqd", x, kernel.astype(x.dtype)
        ) + bias.astype(x.dtype)
        # out[2i+p, 2j+q] = sum_c x[i, j, c] * kernel[p, q, c] + bias
        if self.packed:
            return y  # (..., 2, 2, out)
        b, h, w, _, _, o = y.shape
        return y.transpose(0, 1, 3, 2, 4, 5).reshape(b, 2 * h, 2 * w, o)


class SamFeedForward(nn.Module):
    hidden: int
    out: int
    depth: int

    @nn.compact
    def __call__(self, x):
        x = nn.relu(nn.Dense(self.hidden, name="proj_in")(x))
        for i in range(self.depth - 2):
            x = nn.relu(nn.Dense(self.hidden, name=f"layer{i}")(x))
        return nn.Dense(self.out, name="proj_out")(x)


class SamMaskDecoder(nn.Module):
    cfg: SamDecoderConfig

    @nn.compact
    def __call__(self, image_embed, image_pe, sparse_prompt):
        """image_embed (B, G, G, D); sparse_prompt (B, NB, P, D).

        Returns mask logits (B, NB, M, 4G, 4G) and iou scores (B, NB, M).
        """
        c = self.cfg
        d = c.hidden
        b, g1, g2, _ = image_embed.shape
        nb = sparse_prompt.shape[1]
        m = c.num_multimask_outputs + 1

        iou_token = self.param("iou_token", nn.initializers.normal(1.0), (1, d))
        mask_tokens = self.param("mask_tokens", nn.initializers.normal(1.0), (m, d))
        out_tokens = jnp.concatenate([iou_token, mask_tokens], axis=0)  # (M+1, d)
        tokens = jnp.broadcast_to(out_tokens[None, None], (b, nb, m + 1, d))
        tokens = jnp.concatenate([tokens, sparse_prompt], axis=2)  # (B, NB, T, d)

        src = image_embed.reshape(b, 1, g1 * g2, d).repeat(nb, axis=1)
        pos = image_pe.reshape(1, 1, g1 * g2, d)
        pos = jnp.broadcast_to(pos, src.shape)

        q, k = tokens, src
        for i in range(c.layers):
            q, k = TwoWayBlock(c, skip_first_layer_pe=(i == 0), name=f"layer{i}")(
                q, k, tokens, pos
            )
        qf = q + tokens
        attn = DecoderAttention(c.heads, d // c.downsample_rate, name="final_t2i")(
            qf, k + pos, k
        )
        q = nn.LayerNorm(epsilon=1e-6, name="ln_final")(q + attn)

        iou_out = q[:, :, 0]
        mask_out = q[:, :, 1 : m + 1]  # (B, NB, M, d)

        img = k.reshape(b * nb, g1, g2, d)
        # packed upscale chain: the 2x2 slots ride as channels so the big
        # per-box tensors never get spatially reshuffled (see Upscale2x)
        up = Upscale2x(d // 4, packed=True, name="upscale_conv1")(img)
        up = LayerNorm2d(name="upscale_ln")(up)
        up = nn.gelu(up, approximate=False)  # (B*NB, G, G, 2, 2, d/4)
        up = Upscale2x(d // 8, packed=True, name="upscale_conv2")(up)
        up = nn.gelu(up, approximate=False)  # (B*NB, G, G, 2, 2, 2, 2, d/8)

        hyper = jnp.stack(
            [
                SamFeedForward(d, d // 8, 3, name=f"hyper{i}")(mask_out[:, :, i])
                for i in range(m)
            ],
            axis=2,
        )  # (B, NB, M, d/8)
        # reduce channels first, THEN depth-to-space the (now thin) masks:
        # out[4x+2p+r, 4y+2q+s] = packed[x, y, p, q, r, s]
        up = up.reshape(b, nb, g1, g2, 2, 2, 2, 2, d // 8)
        masks = jnp.einsum("bnmc,bnxypqrsc->bnmxpryqs", hyper, up)
        masks = masks.reshape(b, nb, m, 4 * g1, 4 * g2)
        iou = SamFeedForward(c.iou_head_hidden, m, c.iou_head_depth, name="iou_head")(iou_out)
        return masks, iou


# ---------------------------------------------------------------------------
# full model
# ---------------------------------------------------------------------------
SAM_MEAN = (123.675, 116.28, 103.53)
SAM_STD = (58.395, 57.12, 57.375)


class SamModule(nn.Module):
    cfg: SamConfig

    def setup(self):
        if self.cfg.tinyvit is not None:
            from vlfm_tpu.models.tinyvit import TinyViT

            self.vision = TinyViT(self.cfg.tinyvit, name="vision")
        else:
            self.vision = SamVisionEncoder(self.cfg.vision, name="vision")
        self.pe = SamPositionalEmbedding(self.cfg.pe_dim, name="shared_pe")
        self.prompt = SamPromptEncoder(self.cfg.decoder.hidden, name="prompt")
        self.decoder = SamMaskDecoder(self.cfg.decoder, name="decoder")
        # dense prompt used when no mask input is given (prompt_encoder.no_mask_embed)
        self.no_mask_embed = self.param(
            "no_mask_embed", nn.initializers.normal(1.0), (self.cfg.decoder.hidden,)
        )

    def encode_image(self, images_uint8f):  # (B, S, S, 3) raw 0..255 floats
        mean = jnp.asarray(SAM_MEAN, images_uint8f.dtype)
        std = jnp.asarray(SAM_STD, images_uint8f.dtype)
        return self.vision((images_uint8f - mean) / std)

    def image_pe(self):
        g = self.cfg.vision.grid
        coords = (jnp.stack(
            jnp.meshgrid(jnp.arange(g), jnp.arange(g), indexing="ij"), axis=-1
        ).astype(jnp.float32) + 0.5) / g
        # (row, col) -> PE expects (x, y): flip to (col, row)
        return self.pe(coords[..., ::-1])

    def decode_boxes(self, image_embed, boxes01):
        # pin the decoder to the encoder's dtype: box coords and the f32
        # positional embedding would otherwise promote every decoder tensor
        # (incl. the per-box upscale path) to f32
        dt = image_embed.dtype
        sparse = self.prompt(self.pe, boxes01).astype(dt)
        src = image_embed + self.no_mask_embed.astype(dt)
        return self.decoder(src, self.image_pe().astype(dt), sparse)

    def __call__(self, images, boxes01):
        emb = self.encode_image(images)
        return self.decode_boxes(emb, boxes01)


class SAM:
    """Stateful wrapper: encode once per frame, decode many boxes."""

    def __init__(self, cfg: SamConfig, params: Dict[str, Any]):
        self.cfg = cfg
        self.params = params
        self.module = SamModule(cfg)

    @classmethod
    def init_random(cls, cfg: SamConfig, seed: int = 0) -> "SAM":
        mod = SamModule(cfg)
        s = cfg.vision.image_size
        params = mod.init(
            jax.random.PRNGKey(seed),
            jnp.zeros((1, s, s, 3)),
            jnp.zeros((1, 1, 4)),
        )["params"]
        return cls(cfg, params)

    @staticmethod
    def _segment_impl(module, params, images, boxes01, fused=False):
        if fused:
            from vlfm_tpu.models.tinyvit_fast import encode_fused

            mean = jnp.asarray(SAM_MEAN, images.dtype)
            std = jnp.asarray(SAM_STD, images.dtype)
            emb = encode_fused(
                params["vision"], (images - mean) / std, module.cfg.tinyvit
            )
            return module.apply(
                {"params": params}, emb, boxes01, method=SamModule.decode_boxes
            )
        masks, iou = module.apply({"params": params}, images, boxes01)
        return masks, iou

    @staticmethod
    @partial(jax.jit, static_argnames=("module", "fused"))
    def _segment(module, params, images, boxes01, fused=False):
        return SAM._segment_impl(module, params, images, boxes01, fused)

    def segment_boxes(self, images, boxes01, multimask_output: bool = False,
                      fused: bool = None):
        """(B,S,S,3) 0..255 floats + (B,NB,4) boxes in [0,1] -> bool masks
        (B, NB, 4G, 4G) at quarter input resolution, plus iou scores.

        multimask_output=False selects mask token 0 like the reference
        (sam.py:55, SamPredictor.predict(multimask_output=False)).

        fused=None auto-selects the pallas/s2d TinyViT serving path
        (models/tinyvit_fast.py) on TPU; parity is pinned by
        tests/test_tinyvit_fast.py.
        """
        if fused is None:
            fused = self.cfg.tinyvit is not None and jax.default_backend() == "tpu"
        masks, iou = self._segment(self.module, self.params, images, boxes01,
                                   fused=fused)
        if multimask_output:
            best = jnp.argmax(iou[..., 1:], axis=-1) + 1
            sel = jnp.take_along_axis(masks, best[..., None, None, None], axis=2)[:, :, 0]
        else:
            sel = masks[:, :, 0]
        return sel > 0.0, iou

    @staticmethod
    @partial(jax.jit, static_argnames=("module", "capacity", "fused", "multimask"))
    def _segment_gated(module, params, images, boxes01, frame_valid,
                       capacity: int, fused: bool, multimask: bool):
        b, nb = frame_valid.shape
        has = frame_valid.any(axis=1)  # (B,)
        order = jnp.argsort(~has, stable=True)  # detection frames first
        n_has = has.sum(dtype=jnp.int32)
        g4 = 4 * module.cfg.vision.grid
        max_passes = -(-b // capacity)

        def run_pass(sel):
            masks, iou = SAM._segment_impl(
                module, params, images[sel], boxes01[sel], fused
            )
            if multimask:
                best = jnp.argmax(iou[..., 1:], axis=-1) + 1
                masks = jnp.take_along_axis(
                    masks, best[..., None, None, None], axis=2
                )[:, :, 0]
            else:
                masks = masks[:, :, 0]
            return masks > 0.0

        def body(p, acc):
            def work(acc):
                # dynamic_slice clamps the final pass's window to the batch
                # end; any re-gathered frames recompute identical masks.
                sel = jax.lax.dynamic_slice_in_dim(order, p * capacity, capacity)
                return acc.at[sel].set(run_pass(sel))

            return jax.lax.cond(p * capacity < n_has, work, lambda a: a, acc)

        masks = jax.lax.fori_loop(
            0, max_passes, body, jnp.zeros((b, nb, g4, g4), bool)
        )
        return masks

    def segment_boxes_gated(
        self,
        images,
        boxes01,
        frame_valid,
        capacity: int,
        multimask_output: bool = False,
        fused: bool = None,
    ):
        """segment_boxes with density-adaptive compaction: frames holding
        >=1 valid detection are sorted first, then segmented in
        ``ceil(n_detection_frames / capacity)`` passes of a static
        ``capacity``-frame sub-batch inside one jitted ``lax.fori_loop``
        (passes past the detection count are skipped by ``lax.cond``, so
        device cost scales with realized detection density). No detection is
        ever dropped — the true batched analogue of the reference paying SAM
        exactly once per detection (base_objectnav_policy.py:311-321); a
        detection-dense step simply pays more passes, up to the ungated cost
        at 100% density.

        ``frame_valid``: (B, NB) bool. Returns (masks (B, NB, 4G, 4G) bool,
        kept_valid (B, NB) == frame_valid — kept for call-site compatibility).

        Numerics: on CPU the masks equal the ungated path's bit-for-bit
        (pinned in tests/test_sam.py). On TPU, O(0.1-1%) of boundary pixels
        can flip at the 0.0 logit threshold whenever capacity != B, because
        XLA's tiling/fusion — and therefore bf16 rounding — varies with the
        compiled batch size; measured on-chip, plain ``segment_boxes`` at
        B=2 vs a B=8 slice shows the same ~0.1% flips, so this is inherent
        batch-size sensitivity, not a gating artifact (capacity == B is
        bit-identical). Frames without detections that share a pass window
        may get masks written; ``valid`` gates them downstream, as in the
        ungated path.
        """
        if fused is None:
            fused = self.cfg.tinyvit is not None and jax.default_backend() == "tpu"
        masks = self._segment_gated(
            self.module, self.params, images, boxes01, frame_valid,
            capacity=int(capacity), fused=bool(fused),
            multimask=bool(multimask_output),
        )
        return masks, frame_valid


# ---------------------------------------------------------------------------
# HF checkpoint conversion (facebook/sam-vit-* layout)
# ---------------------------------------------------------------------------
def _lin(sd, name):
    return {"kernel": jnp.asarray(np.asarray(sd[f"{name}.weight"]).T),
            "bias": jnp.asarray(np.asarray(sd[f"{name}.bias"]))}


def _lnp(sd, name):
    return {"scale": jnp.asarray(np.asarray(sd[f"{name}.weight"])),
            "bias": jnp.asarray(np.asarray(sd[f"{name}.bias"]))}


def _conv(sd, name, bias=True):
    out = {"kernel": jnp.asarray(np.asarray(sd[f"{name}.weight"]).transpose(2, 3, 1, 0))}
    if bias and f"{name}.bias" in sd:
        out["bias"] = jnp.asarray(np.asarray(sd[f"{name}.bias"]))
    return out


def _convT(sd, name):
    # torch ConvTranspose2d weight (in, out, kh, kw) -> flax (kh, kw, in, out)
    return {"kernel": jnp.asarray(np.asarray(sd[f"{name}.weight"]).transpose(2, 3, 0, 1)),
            "bias": jnp.asarray(np.asarray(sd[f"{name}.bias"]))}


def _dec_attn(sd, name):
    return {
        "q_proj": _lin(sd, f"{name}.q_proj"),
        "k_proj": _lin(sd, f"{name}.k_proj"),
        "v_proj": _lin(sd, f"{name}.v_proj"),
        "out_proj": _lin(sd, f"{name}.out_proj"),
    }


def convert_mobile_sam(sd: Mapping[str, Any], cfg: SamConfig) -> Dict[str, Any]:
    """Convert a mobile_sam.pt state dict (ORIGINAL segment-anything naming,
    not HF) to the flax tree: TinyViT encoder + prompt encoder + decoder.

    Original-naming map (facebookresearch/segment-anything modeling/*):
      mask_decoder.transformer.layers.{i}.{self_attn,norm1,cross_attn_token_to_image,
        norm2,mlp.lin1,mlp.lin2,norm3,cross_attn_image_to_token,norm4}
      mask_decoder.transformer.{final_attn_token_to_image,norm_final_attn}
      mask_decoder.output_upscaling.{0,1,3} (ConvT, LayerNorm2d, ConvT)
      mask_decoder.{output_hypernetworks_mlps,iou_prediction_head}.layers.{0,1,2}
      prompt_encoder.{point_embeddings.{0..3},no_mask_embed,
        pe_layer.positional_encoding_gaussian_matrix}
    """
    from vlfm_tpu.models.tinyvit import convert_mobile_sam_encoder

    sd = {k: np.asarray(v) for k, v in sd.items()}
    assert cfg.tinyvit is not None, "mobile_sam checkpoints carry a TinyViT encoder"
    vis = convert_mobile_sam_encoder(
        {k: v for k, v in sd.items() if k.startswith("image_encoder.")}, cfg.tinyvit
    )

    def ff(name, depth):
        # original: layers.0..depth-1; flax SamFeedForward: proj_in, layer{i}, proj_out
        out = {"proj_in": _lin(sd, f"{name}.layers.0"),
               "proj_out": _lin(sd, f"{name}.layers.{depth - 1}")}
        for j in range(depth - 2):
            out[f"layer{j}"] = _lin(sd, f"{name}.layers.{j + 1}")
        return out

    dec: Dict[str, Any] = {
        "iou_token": jnp.asarray(sd["mask_decoder.iou_token.weight"]),
        "mask_tokens": jnp.asarray(sd["mask_decoder.mask_tokens.weight"]),
        "final_t2i": _dec_attn(sd, "mask_decoder.transformer.final_attn_token_to_image"),
        "ln_final": _lnp(sd, "mask_decoder.transformer.norm_final_attn"),
        "upscale_conv1": _convT(sd, "mask_decoder.output_upscaling.0"),
        "upscale_ln": _lnp(sd, "mask_decoder.output_upscaling.1"),
        "upscale_conv2": _convT(sd, "mask_decoder.output_upscaling.3"),
        "iou_head": ff("mask_decoder.iou_prediction_head", cfg.decoder.iou_head_depth),
    }
    for i in range(cfg.decoder.num_multimask_outputs + 1):
        dec[f"hyper{i}"] = ff(f"mask_decoder.output_hypernetworks_mlps.{i}", 3)
    for i in range(cfg.decoder.layers):
        p = f"mask_decoder.transformer.layers.{i}"
        dec[f"layer{i}"] = {
            "self_attn": _dec_attn(sd, f"{p}.self_attn"),
            "ln1": _lnp(sd, f"{p}.norm1"),
            "cross_t2i": _dec_attn(sd, f"{p}.cross_attn_token_to_image"),
            "ln2": _lnp(sd, f"{p}.norm2"),
            "mlp_lin1": _lin(sd, f"{p}.mlp.lin1"),
            "mlp_lin2": _lin(sd, f"{p}.mlp.lin2"),
            "ln3": _lnp(sd, f"{p}.norm3"),
            "cross_i2t": _dec_attn(sd, f"{p}.cross_attn_image_to_token"),
            "ln4": _lnp(sd, f"{p}.norm4"),
        }

    point_embed = np.concatenate(
        [sd[f"prompt_encoder.point_embeddings.{i}.weight"] for i in range(4)], axis=0
    )
    return {
        "vision": vis,
        "decoder": dec,
        "prompt": {"point_embed": jnp.asarray(point_embed)},
        "no_mask_embed": jnp.asarray(sd["prompt_encoder.no_mask_embed.weight"][0]),
        "shared_pe": {
            "gaussian": jnp.asarray(
                sd["prompt_encoder.pe_layer.positional_encoding_gaussian_matrix"]
            )
        },
    }


def convert_hf_sam(sd: Mapping[str, Any], cfg: SamConfig) -> Dict[str, Any]:
    sd = {k: np.asarray(v) for k, v in sd.items()}
    vis: Dict[str, Any] = {
        "patch_embed": _conv(sd, "vision_encoder.patch_embed.projection"),
        "pos_embed": jnp.asarray(sd["vision_encoder.pos_embed"][0]),
        "neck_conv1": _conv(sd, "vision_encoder.neck.conv1", bias=False),
        "neck_ln1": _lnp(sd, "vision_encoder.neck.layer_norm1"),
        "neck_conv2": _conv(sd, "vision_encoder.neck.conv2", bias=False),
        "neck_ln2": _lnp(sd, "vision_encoder.neck.layer_norm2"),
    }
    for i in range(cfg.vision.depth):
        p = f"vision_encoder.layers.{i}"
        vis[f"block{i}"] = {
            "ln1": _lnp(sd, f"{p}.layer_norm1"),
            "ln2": _lnp(sd, f"{p}.layer_norm2"),
            "attn": {
                "qkv": _lin(sd, f"{p}.attn.qkv"),
                "proj": _lin(sd, f"{p}.attn.proj"),
                "rel_pos_h": jnp.asarray(sd[f"{p}.attn.rel_pos_h"]),
                "rel_pos_w": jnp.asarray(sd[f"{p}.attn.rel_pos_w"]),
            },
            "mlp_fc1": _lin(sd, f"{p}.mlp.lin1"),
            "mlp_fc2": _lin(sd, f"{p}.mlp.lin2"),
        }

    dec: Dict[str, Any] = {
        "iou_token": jnp.asarray(sd["mask_decoder.iou_token.weight"]),
        "mask_tokens": jnp.asarray(sd["mask_decoder.mask_tokens.weight"]),
        "final_t2i": _dec_attn(sd, "mask_decoder.transformer.final_attn_token_to_image"),
        "ln_final": _lnp(sd, "mask_decoder.transformer.layer_norm_final_attn"),
        "upscale_conv1": _convT(sd, "mask_decoder.upscale_conv1"),
        "upscale_ln": _lnp(sd, "mask_decoder.upscale_layer_norm"),
        "upscale_conv2": _convT(sd, "mask_decoder.upscale_conv2"),
        "iou_head": {
            "proj_in": _lin(sd, "mask_decoder.iou_prediction_head.proj_in"),
            "proj_out": _lin(sd, "mask_decoder.iou_prediction_head.proj_out"),
        },
    }
    for j in range(cfg.decoder.iou_head_depth - 2):
        dec["iou_head"][f"layer{j}"] = _lin(sd, f"mask_decoder.iou_prediction_head.layers.{j}")
    for i in range(cfg.decoder.num_multimask_outputs + 1):
        h = {
            "proj_in": _lin(sd, f"mask_decoder.output_hypernetworks_mlps.{i}.proj_in"),
            "proj_out": _lin(sd, f"mask_decoder.output_hypernetworks_mlps.{i}.proj_out"),
        }
        h["layer0"] = _lin(sd, f"mask_decoder.output_hypernetworks_mlps.{i}.layers.0")
        dec[f"hyper{i}"] = h
    for i in range(cfg.decoder.layers):
        p = f"mask_decoder.transformer.layers.{i}"
        dec[f"layer{i}"] = {
            "self_attn": _dec_attn(sd, f"{p}.self_attn"),
            "ln1": _lnp(sd, f"{p}.layer_norm1"),
            "cross_t2i": _dec_attn(sd, f"{p}.cross_attn_token_to_image"),
            "ln2": _lnp(sd, f"{p}.layer_norm2"),
            "mlp_lin1": _lin(sd, f"{p}.mlp.lin1"),
            "mlp_lin2": _lin(sd, f"{p}.mlp.lin2"),
            "ln3": _lnp(sd, f"{p}.layer_norm3"),
            "cross_i2t": _dec_attn(sd, f"{p}.cross_attn_image_to_token"),
            "ln4": _lnp(sd, f"{p}.layer_norm4"),
        }

    point_embed = np.concatenate(
        [sd[f"prompt_encoder.point_embed.{i}.weight"] for i in range(4)], axis=0
    )
    return {
        "vision": vis,
        "decoder": dec,
        "prompt": {"point_embed": jnp.asarray(point_embed)},
        "no_mask_embed": jnp.asarray(sd["prompt_encoder.no_mask_embed.weight"][0]),
        "shared_pe": {
            "gaussian": jnp.asarray(sd["shared_image_embedding.positional_embedding"])
        },
    }
