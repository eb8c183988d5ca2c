"""Swin Transformer backbone (hierarchical shifted-window attention).

Groundwork for the faithful GroundingDINO port (its image backbone is
Swin-T, vlfm/vlm/grounding_dino.py:18 — SwinT-OGC weights) and reusable for
any hierarchical-ViT model. Weight layout follows huggingface
``SwinBackbone`` so released checkpoints (microsoft/swin-*, and the Swin
weights inside GroundingDINO checkpoints) convert 1:1.

Pieces: 4x4 conv patch embedding + LN, stages of [W-MSA, SW-MSA] blocks with
learned relative-position bias tables and cyclic-shift attention masks, and
end-of-stage 2x2 patch merging. Returns the per-stage feature pyramid with
per-stage output norms.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class SwinConfig:
    patch_size: int = 4
    embed_dim: int = 96
    depths: Tuple[int, ...] = (2, 2, 6, 2)
    heads: Tuple[int, ...] = (3, 6, 12, 24)
    window: int = 7
    mlp_ratio: float = 4.0
    eps: float = 1e-5

    @staticmethod
    def tiny_test() -> "SwinConfig":
        return SwinConfig(embed_dim=16, depths=(2, 2), heads=(2, 4), window=4)


def relative_position_index(w: int) -> np.ndarray:
    """(w^2, w^2) indices into the ((2w-1)^2, heads) bias table."""
    coords = np.stack(np.meshgrid(np.arange(w), np.arange(w), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]  # (2, w^2, w^2)
    rel = rel.transpose(1, 2, 0) + (w - 1)
    return (rel[..., 0] * (2 * w - 1) + rel[..., 1]).astype(np.int32)


def _window_partition(x, w):
    b, h, wd, c = x.shape
    x = x.reshape(b, h // w, w, wd // w, w, c).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, w * w, c)


def _window_reverse(win, w, h, wd):
    b = win.shape[0] // (h // w * wd // w)
    x = win.reshape(b, h // w, wd // w, w, w, -1).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h, wd, -1)


def _shift_mask(h: int, w: int, window: int, shift: int) -> np.ndarray:
    """(nW, w^2, w^2) additive attention mask for shifted windows.

    Pure numpy (static shapes) so it stays a compile-time constant under jit.
    """
    img = np.zeros((h, w), np.int32)
    cnt = 0
    for hs in (slice(0, -window), slice(-window, -shift), slice(-shift, None)):
        for ws in (slice(0, -window), slice(-window, -shift), slice(-shift, None)):
            img[hs, ws] = cnt
            cnt += 1
    win = (
        img.reshape(h // window, window, w // window, window)
        .transpose(0, 2, 1, 3)
        .reshape(-1, window * window)
    )
    return (win[:, None, :] != win[:, :, None]).astype(np.float32) * -100.0


class SwinAttention(nn.Module):
    heads: int
    window: int

    @nn.compact
    def __call__(self, x, mask: Optional[jnp.ndarray]):  # x: (nW*B, w^2, C)
        nwb, l, c = x.shape
        hd = c // self.heads

        def split(t):
            return t.reshape(nwb, l, self.heads, hd).transpose(0, 2, 1, 3)

        q = split(nn.Dense(c, name="query")(x)) * (hd**-0.5)
        k = split(nn.Dense(c, name="key")(x))
        v = split(nn.Dense(c, name="value")(x))
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k)
        table = self.param(
            "rel_bias_table",
            nn.initializers.normal(0.02),
            ((2 * self.window - 1) ** 2, self.heads),
        )
        idx = relative_position_index(self.window)
        logits = logits + table[idx].transpose(2, 0, 1)[None]
        if mask is not None:
            nw = mask.shape[0]
            logits = logits.reshape(-1, nw, self.heads, l, l) + mask[None, :, None]
            logits = logits.reshape(nwb, self.heads, l, l)
        p = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(x.dtype)
        o = jnp.einsum("bhqk,bhkd->bhqd", p, v).transpose(0, 2, 1, 3).reshape(nwb, l, c)
        return nn.Dense(c, name="out")(o)


class SwinBlock(nn.Module):
    cfg: SwinConfig
    heads: int
    shifted: bool

    @nn.compact
    def __call__(self, x):  # (B, H, W, C)
        c = self.cfg
        b, h, w, ch = x.shape
        # HF semantics: when the input is no larger than the window, use one
        # unshifted window covering everything.
        win = min(c.window, h, w)
        shift = win // 2 if (self.shifted and (h > win or w > win)) else 0
        y = nn.LayerNorm(epsilon=c.eps, name="ln1")(x)
        ph, pw = (win - h % win) % win, (win - w % win) % win
        y = jnp.pad(y, ((0, 0), (0, ph), (0, pw), (0, 0)))
        hp, wp = h + ph, w + pw
        if shift:
            y = jnp.roll(y, (-shift, -shift), axis=(1, 2))
            mask = jnp.asarray(_shift_mask(hp, wp, win, shift))
        else:
            mask = None
        wins = _window_partition(y, win)
        wins = SwinAttention(self.heads, win, name="attn")(wins, mask)
        y = _window_reverse(wins, win, hp, wp)
        if shift:
            y = jnp.roll(y, (shift, shift), axis=(1, 2))
        y = y[:, :h, :w]
        x = x + y
        y = nn.LayerNorm(epsilon=c.eps, name="ln2")(x)
        y = nn.Dense(int(ch * c.mlp_ratio), name="mlp_fc1")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(ch, name="mlp_fc2")(y)
        return x + y


class PatchMerging(nn.Module):
    cfg: SwinConfig

    @nn.compact
    def __call__(self, x):  # (B, H, W, C) -> (B, H/2, W/2, 2C)
        b, h, w, ch = x.shape
        ph, pw = h % 2, w % 2
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
        parts = [
            x[:, 0::2, 0::2],
            x[:, 1::2, 0::2],
            x[:, 0::2, 1::2],
            x[:, 1::2, 1::2],
        ]
        y = jnp.concatenate(parts, axis=-1)
        y = nn.LayerNorm(epsilon=self.cfg.eps, name="norm")(y)
        return nn.Dense(2 * ch, use_bias=False, name="reduction")(y)


class SwinBackbone(nn.Module):
    cfg: SwinConfig

    @nn.compact
    def __call__(self, images) -> List[jnp.ndarray]:
        """(B, S, S, 3) -> per-stage NHWC feature maps (normed)."""
        c = self.cfg
        x = nn.Conv(
            c.embed_dim, (c.patch_size, c.patch_size), strides=c.patch_size,
            name="patch_embed",
        )(images)
        x = nn.LayerNorm(epsilon=c.eps, name="embed_norm")(x)
        feats = []
        for si, depth in enumerate(c.depths):
            for bi in range(depth):
                x = SwinBlock(
                    c, c.heads[si], shifted=(bi % 2 == 1), name=f"s{si}_b{bi}"
                )(x)
            feats.append(
                nn.LayerNorm(epsilon=c.eps, name=f"out_norm{si}")(x)
            )
            if si < len(c.depths) - 1:
                x = PatchMerging(c, name=f"merge{si}")(x)
        return feats


# ---------------------------------------------------------------------------
# HF conversion (SwinBackbone layout)
# ---------------------------------------------------------------------------
def _lin(sd, name, bias=True):
    out = {"kernel": jnp.asarray(np.asarray(sd[f"{name}.weight"]).T)}
    if bias and f"{name}.bias" in sd:
        out["bias"] = jnp.asarray(np.asarray(sd[f"{name}.bias"]))
    return out


def _ln(sd, name):
    return {"scale": jnp.asarray(np.asarray(sd[f"{name}.weight"])),
            "bias": jnp.asarray(np.asarray(sd[f"{name}.bias"]))}


def convert_hf_swin(sd, cfg: SwinConfig):
    sd = {k: np.asarray(v) for k, v in sd.items()}
    p = {
        "patch_embed": {
            "kernel": jnp.asarray(
                sd["embeddings.patch_embeddings.projection.weight"].transpose(2, 3, 1, 0)
            ),
            "bias": jnp.asarray(sd["embeddings.patch_embeddings.projection.bias"]),
        },
        "embed_norm": _ln(sd, "embeddings.norm"),
    }
    for si, depth in enumerate(cfg.depths):
        for bi in range(depth):
            b = f"encoder.layers.{si}.blocks.{bi}"
            p[f"s{si}_b{bi}"] = {
                "ln1": _ln(sd, f"{b}.layernorm_before"),
                "ln2": _ln(sd, f"{b}.layernorm_after"),
                "attn": {
                    "query": _lin(sd, f"{b}.attention.self.query"),
                    "key": _lin(sd, f"{b}.attention.self.key"),
                    "value": _lin(sd, f"{b}.attention.self.value"),
                    "out": _lin(sd, f"{b}.attention.output.dense"),
                    "rel_bias_table": jnp.asarray(
                        sd[f"{b}.attention.self.relative_position_bias_table"]
                    ),
                },
                "mlp_fc1": _lin(sd, f"{b}.intermediate.dense"),
                "mlp_fc2": _lin(sd, f"{b}.output.dense"),
            }
        if si < len(cfg.depths) - 1:
            p[f"merge{si}"] = {
                "norm": _ln(sd, f"encoder.layers.{si}.downsample.norm"),
                "reduction": _lin(sd, f"encoder.layers.{si}.downsample.reduction", bias=False),
            }
        if f"hidden_states_norms.stage{si + 1}.weight" in sd:
            p[f"out_norm{si}"] = _ln(sd, f"hidden_states_norms.stage{si + 1}")
    return p
