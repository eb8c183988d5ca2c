"""GroundingDINO: open-vocabulary detection with text-conditioned DETR.

Faithful port of the reference's detector (vlfm/vlm/grounding_dino.py — the
SwinT-OGC model served over HTTP) in the huggingface
``GroundingDinoForObjectDetection`` weight layout, so released checkpoints
(IDEA-Research/grounding-dino-tiny / the SwinT-OGC weights re-exported by HF)
convert 1:1.

Pieces:
- Swin backbone (vlfm_tpu.models.swin) + 1x1/3x3 conv input projections with
  GroupNorm(32) to d_model, sine position embeddings + level embeddings;
- BERT text backbone with the phrase-block self-attention mask generated
  from special tokens ([CLS]/[SEP]/./?), + text projection;
- feature enhancer: per layer {bi-directional vision<->text fusion with
  layer-scale, text self-attention enhancer, multi-scale DEFORMABLE
  self-attention over the flattened feature pyramid};
- language-guided query selection (two-stage): per-pixel contrastive class
  scores + proposal boxes, top-k as decoder queries;
- decoder: per layer {query self-attn, text cross-attn, deformable
  cross-attn}, iterative box refinement, contrastive classification against
  the text tokens.

Deformable attention runs as bilinear gathers (grid_sample semantics:
align_corners=False, zero padding) — dense gathers the TPU executes fine at
these sizes; the batched one-program formulation is still a large win over
the reference's per-request HTTP serving.

Inference-only simplifications (documented): no dropout/droppath; full pixel
masks (the pipeline feeds square resized images, matching HF with
pixel_mask=None).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from functools import partial
from typing import Any, Dict, List, Mapping, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
from vlfm_tpu.ops.resize import resize_bilinear

from vlfm_tpu.models.swin import SwinBackbone, SwinConfig

# BERT tokenizer ids for [CLS], [SEP], '.', '?'
SPECIAL_TOKEN_IDS = (101, 102, 1012, 1029)


@dataclass(frozen=True)
class BertConfig:
    hidden: int = 768
    layers: int = 12
    heads: int = 12
    intermediate: int = 3072
    vocab_size: int = 30522
    max_position: int = 512
    type_vocab: int = 2
    eps: float = 1e-12


@dataclass(frozen=True)
class GroundingDinoJaxConfig:
    d_model: int = 256
    encoder_layers: int = 6
    decoder_layers: int = 6
    encoder_heads: int = 8
    decoder_heads: int = 8
    encoder_ffn: int = 2048
    decoder_ffn: int = 2048
    num_queries: int = 900
    num_feature_levels: int = 4
    encoder_n_points: int = 4
    decoder_n_points: int = 4
    max_text_len: int = 256
    pe_temperature: float = 20.0
    eps: float = 1e-5
    swin: SwinConfig = field(default_factory=SwinConfig)
    text: BertConfig = field(default_factory=BertConfig)
    # which swin stages feed the neck (HF grounding-dino uses stages 2,3,4)
    swin_out_stages: Tuple[int, ...] = (1, 2, 3)

    @staticmethod
    def tiny_test() -> "GroundingDinoJaxConfig":
        return GroundingDinoJaxConfig(
            d_model=32, encoder_layers=2, decoder_layers=2, encoder_heads=2,
            decoder_heads=2, encoder_ffn=64, decoder_ffn=64, num_queries=10,
            num_feature_levels=2, encoder_n_points=2, decoder_n_points=2,
            max_text_len=16,
            swin=SwinConfig(embed_dim=16, depths=(2, 2), heads=(2, 4), window=4),
            text=BertConfig(hidden=32, layers=2, heads=2, intermediate=64,
                            vocab_size=2000, max_position=64),
            swin_out_stages=(0, 1),
        )


# ---------------------------------------------------------------------------
# positional embeddings
# ---------------------------------------------------------------------------
def sine_position_2d(h: int, w: int, d_model: int, temperature: float) -> jnp.ndarray:
    """(h, w, d_model) sine PE, HF GroundingDinoSinePositionEmbedding with a
    full pixel mask (cumsum of ones)."""
    half = d_model // 2
    scale = 2 * math.pi
    y = (jnp.arange(1, h + 1, dtype=jnp.float32) / (h + 1e-6) * scale)[:, None]
    x = (jnp.arange(1, w + 1, dtype=jnp.float32) / (w + 1e-6) * scale)[None, :]
    dim_t = temperature ** (2 * (jnp.arange(half) // 2) / half)
    px = x[..., None] / dim_t
    py = y[..., None] / dim_t
    px = jnp.stack([jnp.sin(px[..., 0::2]), jnp.cos(px[..., 1::2])], -1).reshape(1, w, half)
    py = jnp.stack([jnp.sin(py[..., 0::2]), jnp.cos(py[..., 1::2])], -1).reshape(h, 1, half)
    px = jnp.broadcast_to(px, (h, w, half))
    py = jnp.broadcast_to(py, (h, w, half))
    return jnp.concatenate([py, px], axis=-1)


def get_sine_pos_embed(pos: jnp.ndarray, num_pos_feats: int, exchange_xy: bool = True) -> jnp.ndarray:
    """HF get_sine_pos_embed: (..., n) -> (..., n * num_pos_feats)."""
    scale = 2 * math.pi
    dim_t = 10000 ** (2 * (jnp.arange(num_pos_feats) // 2) / num_pos_feats)

    def sine(x):  # (..., 1)
        sx = x * scale / dim_t
        return jnp.stack([jnp.sin(sx[..., 0::2]), jnp.cos(sx[..., 1::2])], -1).reshape(
            *x.shape[:-1], num_pos_feats
        )

    parts = [sine(pos[..., i : i + 1]) for i in range(pos.shape[-1])]
    if exchange_xy and len(parts) >= 2:
        parts[0], parts[1] = parts[1], parts[0]
    return jnp.concatenate(parts, axis=-1)


# ---------------------------------------------------------------------------
# text masks (generate_masks_with_special_tokens_and_transfer_map)
# ---------------------------------------------------------------------------
def text_phrase_masks(input_ids: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """(B, L) ids -> ((B, L, L) bool self-attn mask, (B, L) position ids).

    Tokens between consecutive special tokens attend within their phrase
    block (inclusive of the closing special token); position ids restart per
    phrase. Host-side (tokenization-adjacent, like the reference's caption
    handling).
    """
    input_ids = np.asarray(input_ids)
    b, l = input_ids.shape
    special = np.isin(input_ids, SPECIAL_TOKEN_IDS)
    mask = np.tile(np.eye(l, dtype=bool)[None], (b, 1, 1))
    pos = np.zeros((b, l), np.int64)
    for row in range(b):
        prev = 0
        for col in np.nonzero(special[row])[0]:
            if col == 0 or col == l - 1:
                mask[row, col, col] = True
                pos[row, col] = 0
            else:
                mask[row, prev + 1 : col + 1, prev + 1 : col + 1] = True
                pos[row, prev + 1 : col + 1] = np.arange(0, col - prev)
            prev = col
    return mask, pos


# ---------------------------------------------------------------------------
# BERT text backbone
# ---------------------------------------------------------------------------
class BertLayerJx(nn.Module):
    cfg: BertConfig

    @nn.compact
    def __call__(self, x, additive_mask):
        c = self.cfg
        hd = c.hidden // c.heads

        def split(t):
            return t.reshape(t.shape[0], -1, c.heads, hd).transpose(0, 2, 1, 3)

        q = split(nn.Dense(c.hidden, name="q")(x))
        k = split(nn.Dense(c.hidden, name="k")(x))
        v = split(nn.Dense(c.hidden, name="v")(x))
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k) / math.sqrt(hd) + additive_mask
        p = jax.nn.softmax(logits, axis=-1)
        o = jnp.einsum("bhqk,bhkd->bhqd", p, v).transpose(0, 2, 1, 3)
        o = o.reshape(x.shape)
        o = nn.Dense(c.hidden, name="attn_out")(o)
        x = nn.LayerNorm(epsilon=c.eps, name="attn_ln")(o + x)
        h = nn.gelu(nn.Dense(c.intermediate, name="ffn_in")(x), approximate=False)
        h = nn.Dense(c.hidden, name="ffn_out")(h)
        return nn.LayerNorm(epsilon=c.eps, name="ffn_ln")(h + x)


class BertBackbone(nn.Module):
    cfg: BertConfig

    @nn.compact
    def __call__(self, input_ids, self_attn_mask3d, position_ids):
        c = self.cfg
        w = nn.Embed(c.vocab_size, c.hidden, name="word")(input_ids)
        p = nn.Embed(c.max_position, c.hidden, name="position")(position_ids)
        t = nn.Embed(c.type_vocab, c.hidden, name="token_type")(
            jnp.zeros_like(input_ids)
        )
        x = nn.LayerNorm(epsilon=c.eps, name="embed_ln")(w + p + t)
        add = jnp.where(self_attn_mask3d[:, None], 0.0, -1e9)
        for i in range(c.layers):
            x = BertLayerJx(c, name=f"layer{i}")(x, add)
        return x


# ---------------------------------------------------------------------------
# deformable attention
# ---------------------------------------------------------------------------
def _bilinear_sample_rows(value_l, grid, nh, dh):
    """grid_sample(bilinear, zeros, align_corners=False) as ONE row gather.

    TPU redesign of the 4-tap gather: four independent (y, x) gathers per
    sample lower to element-strided XLA gathers that run far below HBM
    bandwidth (the measured 4.3 s/batch GroundingDino encoder). Instead,
    build a zero-padded 2x2-patch table P[(H+1)(W+1), 4*dh] per (batch,
    head) — each row is the full bilinear stencil, contiguous in the lane
    dimension (4*dh = 128 floats at production dh=32 = exactly one TPU
    lane row) — and fetch each sample with a single flat row gather, then
    combine the four taps with the bilinear weights on the VPU.

    Out-of-range taps: the pad ring supplies zeros for taps one cell
    outside; anchors are clamped into the padded table and a per-tap
    ``inside`` mask zeroes everything farther out (grid_sample padding_mode
    ="zeros" semantics, identical to the reference's F.grid_sample in
    multi_scale_deformable_attention, HF modeling_grounding_dino.py).

    The table keeps heads MINOR ((B, HW', nh, 4*dh)) so no head-major
    relayout of the value tensor is needed, and the gathered rows come out
    in the (B, Q, nh, ...) layout the output projection consumes directly.

    value_l: (B, H, W, nh*dh); grid: (B, Q, nh, P, 2) in [-1, 1] (x, y).
    Returns (B, Q, nh, P, dh).
    """
    b, h, w, _ = value_l.shape
    q, npts = grid.shape[1], grid.shape[3]
    P = _patch_table(value_l, nh, dh)
    anchor, wts = _stencil_anchors(grid, h, w)

    idx = anchor.transpose(0, 1, 3, 2).reshape(b, q * npts, nh)
    rows = jnp.take_along_axis(P, idx[..., None], axis=1)  # (B, Q*P, nh, 4*dh)
    rows = rows.reshape(b, q, npts, nh, 4, dh)
    return jnp.einsum("bqhpt,bqphtd->bqhpd", wts, rows)


def _patch_table(value_l, nh, dh):
    """(B, H, W, nh*dh) -> (B, (H+1)(W+1), nh, 4*dh) zero-padded 2x2 stencils,
    tap order (dy, dx) = (0,0), (0,1), (1,0), (1,1)."""
    b, h, w, _ = value_l.shape
    pad = jnp.pad(value_l, ((0, 0), (1, 1), (1, 1), (0, 0)))
    pad = pad.reshape(b, h + 2, w + 2, nh, dh)
    P = jnp.stack(
        [
            pad[:, :-1, :-1], pad[:, :-1, 1:],
            pad[:, 1:, :-1], pad[:, 1:, 1:],
        ],
        axis=4,
    )  # (B, H+1, W+1, nh, 4, dh)
    return P.reshape(b, (h + 1) * (w + 1), nh, 4 * dh)


def _stencil_anchors(grid, h, w):
    """grid (B, Q, nh, P, 2) in [-1, 1] -> (anchor (B, Q, nh, P) int32 row
    index into the patch table, tap weights (B, Q, nh, P, 4) with
    grid_sample padding_mode="zeros" masking)."""
    x = (grid[..., 0] + 1) * w / 2 - 0.5
    y = (grid[..., 1] + 1) * h / 2 - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    dx = x - x0
    dy = y - y0
    anchor = (
        (jnp.clip(y0, -1, h - 1) + 1) * (w + 1) + jnp.clip(x0, -1, w - 1) + 1
    ).astype(jnp.int32)  # (B, Q, nh, P)

    def inside(yy, xx):
        return (yy >= 0) & (yy < h) & (xx >= 0) & (xx < w)

    wts = jnp.stack(
        [
            (1 - dx) * (1 - dy) * inside(y0, x0),
            dx * (1 - dy) * inside(y0, x0 + 1),
            (1 - dx) * dy * inside(y0 + 1, x0),
            dx * dy * inside(y0 + 1, x0 + 1),
        ],
        axis=-1,
    )  # (B, Q, nh, P, 4)
    return anchor, wts


class DeformableAttention(nn.Module):
    cfg: GroundingDinoJaxConfig
    heads: int
    n_points: int

    @nn.compact
    def __call__(
        self,
        hidden_states,  # (B, Q, D) queries (pos already added by caller)
        encoder_hidden_states,  # (B, S, D) flattened multi-scale values
        reference_points,  # (B, Q, L, 2) or (B, Q, L, 4) normalized
        spatial_shapes: Tuple[Tuple[int, int], ...],
    ):
        c = self.cfg
        d = c.d_model
        nh, npts, nl = self.heads, self.n_points, len(spatial_shapes)
        b, q = hidden_states.shape[:2]
        dh = d // nh

        value = nn.Dense(d, name="value_proj")(encoder_hidden_states)
        offsets = nn.Dense(nh * nl * npts * 2, name="sampling_offsets")(hidden_states)
        offsets = offsets.reshape(b, q, nh, nl, npts, 2)
        weights = nn.Dense(nh * nl * npts, name="attention_weights")(hidden_states)
        weights = jax.nn.softmax(weights.reshape(b, q, nh, nl * npts), axis=-1)
        weights = weights.reshape(b, q, nh, nl, npts)

        if reference_points.shape[-1] == 2:
            norm = jnp.asarray([[wd, ht] for ht, wd in spatial_shapes], jnp.float32)
            loc = reference_points[:, :, None, :, None, :] + offsets / norm[None, None, None, :, None, :]
        else:
            loc = (
                reference_points[:, :, None, :, None, :2]
                + offsets / npts * reference_points[:, :, None, :, None, 2:] * 0.5
            )
        grids = 2 * loc - 1  # (B, Q, nh, nl, npts, 2)

        import os

        from vlfm_tpu.ops.backend import default_interpret

        # Round-4 on-chip A/B (scripts/bench_deform.py, B=8 @800px, all four
        # levels): XLA row-gather 251.5 ms vs pallas kernel 1428.8 ms — the
        # kernel's serial VMEM row-fetch loop (512 scalar dynamic slices per
        # tile) does not pipeline, so the XLA gather is the default TPU path
        # and the kernel stays opt-in (VLFM_DEFORM_KERNEL=1) for future
        # Mosaic gather support. Gathers alone cap GDINO at ~5.3 imgs/s on
        # this chip; OWL-ViT (~512 imgs/s) remains the TPU default detector.
        if default_interpret() or os.environ.get("VLFM_DEFORM_KERNEL") != "1":
            # CPU/parity path: explicit per-level sample + one combine einsum
            start = 0
            sampled = []
            for li, (ht, wd) in enumerate(spatial_shapes):
                v_l = value[:, start : start + ht * wd].reshape(b, ht, wd, nh * dh)
                g_l = grids[:, :, :, li]  # (B, Q, nh, npts, 2)
                s = _bilinear_sample_rows(v_l, g_l, nh, dh)  # (B, Q, nh, npts, dh)
                sampled.append(s)
                start += ht * wd
            samp = jnp.stack(sampled, axis=3)  # (B, Q, nh, nl, npts, dh)
            out = jnp.einsum("bqhlpd,bqhlp->bqhd", samp, weights).reshape(b, q, d)
            return nn.Dense(d, name="output_proj")(out)

        # TPU serving path: pallas gather+combine with the patch table
        # VMEM-resident per (batch, head); attention weights fold into the
        # tap weights so per-level outputs are plain accumulations and no
        # query-major gathered tensor ever hits HBM (ops/deform_gather.py).
        out = _deform_combine_levels(value, grids, weights, spatial_shapes, nh, dh)
        out = out.astype(value.dtype).reshape(b, q, d)
        return nn.Dense(d, name="output_proj")(out)


def _deform_combine_levels(
    value, grids, weights, spatial_shapes, nh, dh,
    *, interpret=None, force_pallas=False,
):
    """Per-level pallas gather+combine, summed over levels -> (B, Q, nh, dh).

    value: (B, S, nh*dh) flattened multi-scale; grids: (B, Q, nh, nl, P, 2);
    weights: (B, Q, nh, nl, P) softmaxed attention weights.
    """
    from vlfm_tpu.ops.deform_gather import gather_combine

    b, q = grids.shape[:2]
    start = 0
    out = jnp.zeros((b, q, nh, dh), jnp.float32)
    for li, (ht, wd) in enumerate(spatial_shapes):
        v_l = value[:, start : start + ht * wd].reshape(b, ht, wd, nh * dh)
        table = _patch_table(v_l, nh, dh)
        anchor, taps = _stencil_anchors(grids[:, :, :, li], ht, wd)
        w_l = taps * weights[:, :, :, li, :, None]  # (B, Q, nh, P, 4)
        out = out + gather_combine(
            table, anchor, w_l, interpret=interpret, force_pallas=force_pallas
        )
        start += ht * wd
    return out


# ---------------------------------------------------------------------------
# attention / fusion building blocks
# ---------------------------------------------------------------------------
class MHA(nn.Module):
    """HF GroundingDinoMultiheadAttention (separate q/k/v, scaled dot)."""

    d_model: int
    heads: int

    @nn.compact
    def __call__(self, queries, keys, values, additive_mask=None):
        hd = self.d_model // self.heads

        def split(t):
            return t.reshape(t.shape[0], -1, self.heads, hd).transpose(0, 2, 1, 3)

        q = split(nn.Dense(self.d_model, name="query")(queries))
        k = split(nn.Dense(self.d_model, name="key")(keys))
        v = split(nn.Dense(self.d_model, name="value")(values))
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k) / math.sqrt(hd)
        if additive_mask is not None:
            logits = logits + additive_mask
        p = jax.nn.softmax(logits, axis=-1)
        o = jnp.einsum("bhqk,bhkd->bhqd", p, v).transpose(0, 2, 1, 3)
        o = o.reshape(queries.shape[0], -1, self.d_model)
        return nn.Dense(self.d_model, name="out_proj")(o)


class BiMultiHeadAttention(nn.Module):
    cfg: GroundingDinoJaxConfig

    @nn.compact
    def __call__(self, vision, text, text_pad_mask):
        c = self.cfg
        embed = c.encoder_ffn // 2
        heads = c.encoder_heads // 2
        hd = embed // heads
        b, tv = vision.shape[:2]
        tt = text.shape[1]

        def split(t):
            return t.reshape(b, -1, heads, hd).transpose(0, 2, 1, 3)

        vq = split(nn.Dense(embed, name="vision_proj")(vision) * (hd**-0.5))
        tk = split(nn.Dense(embed, name="text_proj")(text))
        vv = split(nn.Dense(embed, name="values_vision_proj")(vision))
        tv_ = split(nn.Dense(embed, name="values_text_proj")(text))

        attn = jnp.einsum("bhvd,bhtd->bhvt", vq, tk)
        attn = attn - attn.max()
        attn = jnp.clip(attn, -50000, 50000)
        attn_t = attn.transpose(0, 1, 3, 2)
        attn_t = attn_t - attn_t.max(axis=-1, keepdims=True)
        attn_t = jnp.clip(attn_t, -50000, 50000)

        text_w = jax.nn.softmax(attn_t, axis=-1)  # text->vision (no vision pad)
        if text_pad_mask is not None:
            attn = jnp.where(text_pad_mask[:, None, None, :], -jnp.inf, attn)
        vision_w = jax.nn.softmax(attn, axis=-1)

        v_out = jnp.einsum("bhvt,bhtd->bhvd", vision_w, tv_)
        t_out = jnp.einsum("bhtv,bhvd->bhtd", text_w, vv)
        v_out = v_out.transpose(0, 2, 1, 3).reshape(b, tv, embed)
        t_out = t_out.transpose(0, 2, 1, 3).reshape(b, tt, embed)
        return (
            nn.Dense(c.d_model, name="out_vision_proj")(v_out),
            nn.Dense(c.d_model, name="out_text_proj")(t_out),
        )


class FusionLayer(nn.Module):
    cfg: GroundingDinoJaxConfig

    @nn.compact
    def __call__(self, vision, text, text_pad_mask):
        c = self.cfg
        v = nn.LayerNorm(epsilon=c.eps, name="ln_vision")(vision)
        t = nn.LayerNorm(epsilon=c.eps, name="ln_text")(text)
        dv, dt = BiMultiHeadAttention(c, name="attn")(v, t, text_pad_mask)
        gv = self.param("vision_param", nn.initializers.constant(1e-4), (c.d_model,))
        gt = self.param("text_param", nn.initializers.constant(1e-4), (c.d_model,))
        return v + gv * dv, t + gt * dt


class TextEnhancerLayer(nn.Module):
    cfg: GroundingDinoJaxConfig

    @nn.compact
    def __call__(self, text, phrase_mask3d, text_pos):
        c = self.cfg
        heads = c.encoder_heads // 2
        add = jnp.where(phrase_mask3d[:, None], 0.0, jnp.finfo(jnp.float32).min)
        qk = text + text_pos
        a = MHA(c.d_model, heads, name="self_attn")(qk, qk, text, add)
        x = nn.LayerNorm(epsilon=c.eps, name="ln_before")(text + a)
        h = nn.relu(nn.Dense(c.encoder_ffn // 2, name="fc1")(x))
        h = nn.Dense(c.d_model, name="fc2")(h)
        return nn.LayerNorm(epsilon=c.eps, name="ln_after")(x + h)


class DeformableLayer(nn.Module):
    cfg: GroundingDinoJaxConfig

    @nn.compact
    def __call__(self, vision, vision_pos, reference_points, spatial_shapes):
        c = self.cfg
        a = DeformableAttention(
            c, c.encoder_heads, c.encoder_n_points, name="self_attn"
        )(vision + vision_pos, vision, reference_points, spatial_shapes)
        x = nn.LayerNorm(epsilon=c.eps, name="ln_attn")(vision + a)
        h = nn.relu(nn.Dense(c.encoder_ffn, name="fc1")(x))
        h = nn.Dense(c.d_model, name="fc2")(h)
        return nn.LayerNorm(epsilon=c.eps, name="ln_ffn")(x + h)


class EncoderLayer(nn.Module):
    cfg: GroundingDinoJaxConfig

    @nn.compact
    def __call__(self, vision, text, vision_pos, text_pos, phrase_mask3d,
                 text_pad_mask, reference_points, spatial_shapes):
        vision, text = FusionLayer(self.cfg, name="fusion")(vision, text, text_pad_mask)
        text = TextEnhancerLayer(self.cfg, name="text_enhancer")(
            text, phrase_mask3d, text_pos
        )
        vision = DeformableLayer(self.cfg, name="deformable")(
            vision, vision_pos, reference_points, spatial_shapes
        )
        return vision, text


class DecoderLayer(nn.Module):
    cfg: GroundingDinoJaxConfig

    @nn.compact
    def __call__(self, x, query_pos, reference_points, vision, text,
                 text_pad_mask, spatial_shapes):
        c = self.cfg
        qk = x + query_pos
        a = MHA(c.d_model, c.decoder_heads, name="self_attn")(qk, qk, x)
        x = nn.LayerNorm(epsilon=c.eps, name="ln_self")(x + a)

        add = jnp.where(text_pad_mask[:, None, None, :], jnp.finfo(jnp.float32).min, 0.0)
        a = MHA(c.d_model, c.decoder_heads, name="text_attn")(
            x + query_pos, text, text, add
        )
        x = nn.LayerNorm(epsilon=c.eps, name="ln_text")(x + a)

        a = DeformableAttention(c, c.decoder_heads, c.decoder_n_points, name="cross_attn")(
            x + query_pos, vision, reference_points, spatial_shapes
        )
        x = nn.LayerNorm(epsilon=c.eps, name="ln_cross")(x + a)

        h = nn.relu(nn.Dense(c.decoder_ffn, name="fc1")(x))
        h = nn.Dense(c.d_model, name="fc2")(h)
        return nn.LayerNorm(epsilon=c.eps, name="ln_ffn")(x + h)


class MLPHead(nn.Module):
    hidden: int
    out: int
    layers: int

    @nn.compact
    def __call__(self, x):
        for i in range(self.layers - 1):
            x = nn.relu(nn.Dense(self.hidden, name=f"layer{i}")(x))
        return nn.Dense(self.out, name=f"layer{self.layers - 1}")(x)


def _inverse_sigmoid(x, eps=1e-5):
    x = jnp.clip(x, eps, 1 - eps)
    return jnp.log(x / (1 - x))


# ---------------------------------------------------------------------------
# full model
# ---------------------------------------------------------------------------
class GroundingDinoModule(nn.Module):
    cfg: GroundingDinoJaxConfig

    @nn.compact
    def __call__(self, images, input_ids, phrase_mask3d, position_ids, text_pad_mask):
        """images (B,S,S,3) ImageNet-normalized; ids (B,L) int32.

        Returns (logits (B, Q, max_text_len), boxes (B, Q, 4) cxcywh in [0,1]).
        """
        c = self.cfg
        b = images.shape[0]

        # --- backbones ------------------------------------------------------
        feats_all = SwinBackbone(c.swin, name="swin")(images)
        feats = [feats_all[i] for i in c.swin_out_stages]
        text = BertBackbone(c.text, name="bert")(input_ids, phrase_mask3d, position_ids)
        text = nn.Dense(c.d_model, name="text_projection")(text)

        # --- neck: project + extra level + flatten ---------------------------
        maps = []
        for li, f in enumerate(feats):
            y = nn.Conv(c.d_model, (1, 1), name=f"input_proj{li}_conv")(f)
            y = nn.GroupNorm(num_groups=min(32, c.d_model), name=f"input_proj{li}_gn")(y)
            maps.append(y)
        for li in range(len(feats), c.num_feature_levels):
            src = feats[-1] if li == len(feats) else maps[-1]
            y = nn.Conv(c.d_model, (3, 3), strides=2, padding=1, name=f"input_proj{li}_conv")(src)
            y = nn.GroupNorm(num_groups=min(32, c.d_model), name=f"input_proj{li}_gn")(y)
            maps.append(y)

        level_embed = self.param(
            "level_embed", nn.initializers.normal(1.0), (c.num_feature_levels, c.d_model)
        )
        spatial_shapes = tuple((m.shape[1], m.shape[2]) for m in maps)
        flat, pos_flat = [], []
        for li, m in enumerate(maps):
            h, w = m.shape[1:3]
            flat.append(m.reshape(b, h * w, c.d_model))
            pe = sine_position_2d(h, w, c.d_model, c.pe_temperature)
            pos_flat.append(pe.reshape(1, h * w, c.d_model) + level_embed[li])
        vision = jnp.concatenate(flat, axis=1)  # (B, S, D)
        vision_pos = jnp.broadcast_to(
            jnp.concatenate(pos_flat, axis=1), vision.shape
        )

        # --- encoder ----------------------------------------------------------
        refs = []
        for (h, w) in spatial_shapes:
            ry = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
            rx = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
            g = jnp.stack(jnp.meshgrid(rx, ry, indexing="xy"), -1).reshape(-1, 2)
            refs.append(g)
        ref_pts = jnp.concatenate(refs, 0)[None, :, None, :]  # (1, S, 1, 2)
        ref_pts = jnp.broadcast_to(
            ref_pts, (b, ref_pts.shape[1], c.num_feature_levels, 2)
        )

        text_pos = get_sine_pos_embed(
            position_ids[..., None].astype(jnp.float32), c.d_model, exchange_xy=False
        )
        for i in range(c.encoder_layers):
            vision, text = EncoderLayer(c, name=f"enc{i}")(
                vision, text, vision_pos, text_pos, phrase_mask3d, text_pad_mask,
                ref_pts, spatial_shapes,
            )

        # --- language-guided query selection (two-stage) ----------------------
        proposals = []
        for li, (h, w) in enumerate(spatial_shapes):
            gy = (jnp.arange(h, dtype=jnp.float32)[:, None] + 0.5) / h
            gx = (jnp.arange(w, dtype=jnp.float32)[None, :] + 0.5) / w
            grid = jnp.stack(
                [jnp.broadcast_to(gx, (h, w)), jnp.broadcast_to(gy, (h, w))], -1
            )
            wh = jnp.full((h, w, 2), 0.05 * (2.0**li))
            proposals.append(jnp.concatenate([grid, wh], -1).reshape(-1, 4))
        proposals = jnp.concatenate(proposals, 0)[None]  # (1, S, 4)
        valid = jnp.all((proposals > 0.01) & (proposals < 0.99), -1, keepdims=True)
        prop_logits = jnp.where(valid, jnp.log(proposals / (1 - proposals)), jnp.inf)

        obj = jnp.where(valid, vision, 0.0)
        obj = nn.Dense(c.d_model, name="enc_output")(obj)
        obj = nn.LayerNorm(epsilon=c.eps, name="enc_output_norm")(obj)

        def contrastive(q, t):
            logits = jnp.einsum("bqd,btd->bqt", q, t)
            logits = jnp.where(text_pad_mask[:, None, :], -jnp.inf, logits)
            pad = c.max_text_len - logits.shape[-1]
            return jnp.pad(logits, ((0, 0), (0, 0), (0, pad)), constant_values=-jnp.inf)

        enc_class = contrastive(obj, text)  # (B, S, maxlen)
        enc_box_logits = MLPHead(c.d_model, 4, 3, name="encoder_output_bbox_embed")(obj)
        enc_box_logits = enc_box_logits + prop_logits

        topk_scores = jnp.max(enc_class, axis=-1)
        _, topk_idx = jax.lax.top_k(topk_scores, c.num_queries)
        ref_boxes = jnp.take_along_axis(
            enc_box_logits, topk_idx[..., None], axis=1
        )
        reference = jax.nn.sigmoid(ref_boxes)  # (B, Q, 4)

        query_embeds = self.param(
            "query_position_embeddings",
            nn.initializers.normal(1.0),
            (c.num_queries, c.d_model),
        )
        x = jnp.broadcast_to(query_embeds[None], (b, c.num_queries, c.d_model))

        # --- decoder -----------------------------------------------------------
        ref_head = MLPHead(c.d_model, c.d_model, 2, name="reference_points_head")
        final_ln = nn.LayerNorm(epsilon=c.eps, name="decoder_ln")
        for i in range(c.decoder_layers):
            ref_input = jnp.broadcast_to(
                reference[:, :, None, :], (b, c.num_queries, c.num_feature_levels, 4)
            )
            query_pos = ref_head(
                get_sine_pos_embed(reference, c.d_model // 2, exchange_xy=True)
            )
            x = DecoderLayer(c, name=f"dec{i}")(
                x, query_pos, ref_input, vision, text, text_pad_mask, spatial_shapes
            )
            delta = MLPHead(c.d_model, 4, 3, name=f"dec_bbox{i}")(x)
            reference = jax.nn.sigmoid(delta + _inverse_sigmoid(reference))

        out = final_ln(x)
        logits = contrastive(out, text)
        return logits, reference


class GroundingDinoDetector:
    """Jitted wrapper matching the reference detector's predict() role."""

    def __init__(self, cfg: GroundingDinoJaxConfig, params: Dict[str, Any]):
        self.cfg = cfg
        self.params = params
        self.module = GroundingDinoModule(cfg)

    @classmethod
    def init_random(cls, cfg: GroundingDinoJaxConfig, seed: int = 0):
        mod = GroundingDinoModule(cfg)
        s = cfg.swin.patch_size * 16
        ids = np.full((1, 6), 5, np.int64)
        ids[:, 0], ids[:, -1] = 101, 102
        m3, pos = text_phrase_masks(ids)
        params = mod.init(
            jax.random.PRNGKey(seed),
            jnp.zeros((1, s, s, 3)),
            jnp.asarray(ids, jnp.int32),
            jnp.asarray(m3),
            jnp.asarray(pos, jnp.int32),
            jnp.zeros((1, 6), bool),
        )["params"]
        return cls(cfg, params)

    @staticmethod
    @partial(jax.jit, static_argnames=("module",))
    def _run(module, params, images, ids, m3, pos, pad):
        return module.apply({"params": params}, images, ids, m3, pos, pad)

    def predict(self, images, input_ids, attention_mask):
        """images ImageNet-normalized NHWC; ids/mask host numpy.

        Returns (logits (B, Q, max_text_len), boxes cxcywh (B, Q, 4)).
        """
        m3, pos = text_phrase_masks(np.asarray(input_ids))
        return self._run(
            self.module,
            self.params,
            images,
            jnp.asarray(input_ids, jnp.int32),
            jnp.asarray(m3),
            jnp.asarray(pos, jnp.int32),
            jnp.asarray(~np.asarray(attention_mask, bool)),
        )


# ---------------------------------------------------------------------------
# HF conversion (GroundingDinoForObjectDetection layout)
# ---------------------------------------------------------------------------
def _lin(sd, name, bias=True):
    out = {"kernel": jnp.asarray(np.asarray(sd[f"{name}.weight"]).T)}
    if bias and f"{name}.bias" in sd:
        out["bias"] = jnp.asarray(np.asarray(sd[f"{name}.bias"]))
    return out


def _ln(sd, name):
    return {"scale": jnp.asarray(np.asarray(sd[f"{name}.weight"])),
            "bias": jnp.asarray(np.asarray(sd[f"{name}.bias"]))}


def _conv(sd, name):
    out = {"kernel": jnp.asarray(np.asarray(sd[f"{name}.weight"]).transpose(2, 3, 1, 0))}
    if f"{name}.bias" in sd:
        out["bias"] = jnp.asarray(np.asarray(sd[f"{name}.bias"]))
    return out


def _mha(sd, name):
    return {
        "query": _lin(sd, f"{name}.query"),
        "key": _lin(sd, f"{name}.key"),
        "value": _lin(sd, f"{name}.value"),
        "out_proj": _lin(sd, f"{name}.out_proj"),
    }


def _deform(sd, name):
    return {
        "value_proj": _lin(sd, f"{name}.value_proj"),
        "sampling_offsets": _lin(sd, f"{name}.sampling_offsets"),
        "attention_weights": _lin(sd, f"{name}.attention_weights"),
        "output_proj": _lin(sd, f"{name}.output_proj"),
    }


def _mlp_head(sd, name, layers):
    return {f"layer{i}": _lin(sd, f"{name}.layers.{i}") for i in range(layers)}


def convert_hf_grounding_dino(sd: Mapping[str, Any], cfg: GroundingDinoJaxConfig) -> Dict[str, Any]:
    from vlfm_tpu.models.swin import convert_hf_swin

    sd = {k: np.asarray(v) for k, v in sd.items()}
    swin_sd = {
        k[len("model.backbone.conv_encoder.model."):]: v
        for k, v in sd.items()
        if k.startswith("model.backbone.conv_encoder.model.")
    }
    p: Dict[str, Any] = {"swin": convert_hf_swin(swin_sd, cfg.swin)}

    # BERT
    bert: Dict[str, Any] = {
        "word": {"embedding": jnp.asarray(sd["model.text_backbone.embeddings.word_embeddings.weight"])},
        "position": {"embedding": jnp.asarray(sd["model.text_backbone.embeddings.position_embeddings.weight"])},
        "token_type": {"embedding": jnp.asarray(sd["model.text_backbone.embeddings.token_type_embeddings.weight"])},
        "embed_ln": _ln(sd, "model.text_backbone.embeddings.LayerNorm"),
    }
    for i in range(cfg.text.layers):
        t = f"model.text_backbone.encoder.layer.{i}"
        bert[f"layer{i}"] = {
            "q": _lin(sd, f"{t}.attention.self.query"),
            "k": _lin(sd, f"{t}.attention.self.key"),
            "v": _lin(sd, f"{t}.attention.self.value"),
            "attn_out": _lin(sd, f"{t}.attention.output.dense"),
            "attn_ln": _ln(sd, f"{t}.attention.output.LayerNorm"),
            "ffn_in": _lin(sd, f"{t}.intermediate.dense"),
            "ffn_out": _lin(sd, f"{t}.output.dense"),
            "ffn_ln": _ln(sd, f"{t}.output.LayerNorm"),
        }
    p["bert"] = bert
    p["text_projection"] = _lin(sd, "model.text_projection")

    for li in range(cfg.num_feature_levels):
        p[f"input_proj{li}_conv"] = _conv(sd, f"model.input_proj_vision.{li}.0")
        p[f"input_proj{li}_gn"] = _ln(sd, f"model.input_proj_vision.{li}.1")
    p["level_embed"] = jnp.asarray(sd["model.level_embed"])

    for i in range(cfg.encoder_layers):
        e = f"model.encoder.layers.{i}"
        p[f"enc{i}"] = {
            "fusion": {
                "ln_vision": _ln(sd, f"{e}.fusion_layer.layer_norm_vision"),
                "ln_text": _ln(sd, f"{e}.fusion_layer.layer_norm_text"),
                "vision_param": jnp.asarray(sd[f"{e}.fusion_layer.vision_param"]),
                "text_param": jnp.asarray(sd[f"{e}.fusion_layer.text_param"]),
                "attn": {
                    "vision_proj": _lin(sd, f"{e}.fusion_layer.attn.vision_proj"),
                    "text_proj": _lin(sd, f"{e}.fusion_layer.attn.text_proj"),
                    "values_vision_proj": _lin(sd, f"{e}.fusion_layer.attn.values_vision_proj"),
                    "values_text_proj": _lin(sd, f"{e}.fusion_layer.attn.values_text_proj"),
                    "out_vision_proj": _lin(sd, f"{e}.fusion_layer.attn.out_vision_proj"),
                    "out_text_proj": _lin(sd, f"{e}.fusion_layer.attn.out_text_proj"),
                },
            },
            "text_enhancer": {
                "self_attn": _mha(sd, f"{e}.text_enhancer_layer.self_attn"),
                "ln_before": _ln(sd, f"{e}.text_enhancer_layer.layer_norm_before"),
                "ln_after": _ln(sd, f"{e}.text_enhancer_layer.layer_norm_after"),
                "fc1": _lin(sd, f"{e}.text_enhancer_layer.fc1"),
                "fc2": _lin(sd, f"{e}.text_enhancer_layer.fc2"),
            },
            "deformable": {
                "self_attn": _deform(sd, f"{e}.deformable_layer.self_attn"),
                "ln_attn": _ln(sd, f"{e}.deformable_layer.self_attn_layer_norm"),
                "fc1": _lin(sd, f"{e}.deformable_layer.fc1"),
                "fc2": _lin(sd, f"{e}.deformable_layer.fc2"),
                "ln_ffn": _ln(sd, f"{e}.deformable_layer.final_layer_norm"),
            },
        }

    p["enc_output"] = _lin(sd, "model.enc_output")
    p["enc_output_norm"] = _ln(sd, "model.enc_output_norm")
    p["encoder_output_bbox_embed"] = _mlp_head(sd, "model.encoder_output_bbox_embed", 3)
    p["query_position_embeddings"] = jnp.asarray(sd["model.query_position_embeddings.weight"])
    p["reference_points_head"] = _mlp_head(sd, "model.decoder.reference_points_head", 2)
    p["decoder_ln"] = _ln(sd, "model.decoder.layer_norm")

    for i in range(cfg.decoder_layers):
        dl = f"model.decoder.layers.{i}"
        p[f"dec{i}"] = {
            "self_attn": _mha(sd, f"{dl}.self_attn"),
            "ln_self": _ln(sd, f"{dl}.self_attn_layer_norm"),
            "text_attn": _mha(sd, f"{dl}.encoder_attn_text"),
            "ln_text": _ln(sd, f"{dl}.encoder_attn_text_layer_norm"),
            "cross_attn": _deform(sd, f"{dl}.encoder_attn"),
            "ln_cross": _ln(sd, f"{dl}.encoder_attn_layer_norm"),
            "fc1": _lin(sd, f"{dl}.fc1"),
            "fc2": _lin(sd, f"{dl}.fc2"),
            "ln_ffn": _ln(sd, f"{dl}.final_layer_norm"),
        }
        p[f"dec_bbox{i}"] = _mlp_head(sd, f"model.decoder.bbox_embed.{i}", 3)
    return p


# ---------------------------------------------------------------------------
# detection-pipeline adapter
# ---------------------------------------------------------------------------
IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def build_caption_ids(class_token_ids: List[np.ndarray], max_len: int):
    """Join per-class token id sequences into one GroundingDINO caption:
    [CLS] c1 . c2 . ... [SEP] (the reference's " . "-joined caption,
    grounding_dino.py:70-73). Returns (ids (1, L), mask (1, L), spans) where
    spans[c] = (start, end) token range of class c."""
    ids = [101]
    spans = []
    for toks in class_token_ids:
        start = len(ids)
        ids.extend(int(t) for t in toks)
        spans.append((start, len(ids)))
        ids.append(1012)  # '.'
    ids.append(102)
    ids = ids[:max_len]
    out = np.zeros((1, max_len), np.int64)
    out[0, : len(ids)] = ids
    mask = np.zeros((1, max_len), bool)
    mask[0, : len(ids)] = True
    return out, mask, spans


class GroundingDinoQueryAdapter:
    """Plugs the faithful GroundingDINO into DetectionPipeline (the same
    preprocess/detect surface as the OWL-ViT detector): class names become
    one joint caption; per-class logits are the max over each class's token
    span, matching the reference's exact-phrase filtering semantics."""

    def __init__(self, detector: "GroundingDinoDetector", image_size: int = 800):
        self.detector = detector
        self.image_size = image_size
        self._spans: List[Tuple[int, int]] = []

    def make_query_encoder(self, tokenize_class):
        """Returns an encode_queries callable for DetectionPipeline.
        ``tokenize_class(name) -> token id array`` (WordPiece, no specials)."""

        def encode(names):
            toks = [np.asarray(tokenize_class(n)) for n in names]
            ids, mask, spans = build_caption_ids(toks, self.detector.cfg.max_text_len)
            self._spans = spans
            return ids, mask

        return encode

    def preprocess(self, rgb_uint8):
        s = self.image_size
        x = rgb_uint8.astype(jnp.float32) / 255.0
        x = resize_bilinear(x, s, s)
        mean = jnp.asarray(IMAGENET_MEAN)
        std = jnp.asarray(IMAGENET_STD)
        return (x - mean) / std

    def detect(self, images, input_ids, attention_mask):
        """-> (boxes cxcywh (B, Q, 4), per-class logits (B, Q, C))."""
        logits, boxes = self.detector.predict(
            images, np.asarray(jax.device_get(input_ids)), np.asarray(jax.device_get(attention_mask))
        )
        per_class = [
            jnp.max(logits[..., s:e], axis=-1) for (s, e) in self._spans
        ]
        return boxes, jnp.stack(per_class, axis=-1)
