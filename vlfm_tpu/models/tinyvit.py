"""TinyViT image encoder — MobileSAM's cheap SAM backbone.

Parity target: the reference serves MobileSAM (``vit_t``) for per-box
segmentation (vlfm/vlm/sam.py:24-57,88 — mobile_sam package, TinyViT-5M
encoder + SAM prompt/mask decoder). The decoder is already implemented in
vlfm_tpu/models/sam.py; this module supplies the encoder that made MobileSAM
cheap enough to run per detection.

Architecture (TinyViT, Wu et al. 2022, as configured by MobileSAM's
tiny_vit_5m for 1024-px SAM input):
- PatchEmbed: two stride-2 3x3 conv+BN+GELU stages (1024 -> 256).
- Stage 0: MBConv blocks (1x1 expand 4x -> depthwise 3x3 -> 1x1 project,
  GELU, residual).
- PatchMerging between stages: 1x1 -> depthwise 3x3 (stride 2, or stride 1
  into the last stage so the final grid stays 64 = 1024/16) -> 1x1.
- Stages 1..3: window attention with learned per-offset attention biases,
  a depthwise 3x3 "local conv" between attention and MLP.
- SAM neck: 1x1 conv -> LayerNorm2d -> 3x3 conv -> LayerNorm2d to 256ch.

All BatchNorms are FOLDED into their convs at conversion time (inference
only), so the flax modules are plain biased convs.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Mapping, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class TinyViTConfig:
    img_size: int = 1024
    embed_dims: Tuple[int, ...] = (64, 128, 160, 320)  # tiny_vit_5m
    depths: Tuple[int, ...] = (2, 2, 6, 2)
    num_heads: Tuple[int, ...] = (2, 4, 5, 10)
    window_sizes: Tuple[int, ...] = (7, 7, 14, 7)
    mlp_ratio: float = 4.0
    mbconv_expand: float = 4.0
    out_channels: int = 256  # SAM neck output
    compute_dtype: Any = None  # e.g. jnp.bfloat16; attention softmax stays f32

    @staticmethod
    def tiny() -> "TinyViTConfig":
        return TinyViTConfig(
            img_size=64,
            embed_dims=(8, 12, 16, 20),
            depths=(1, 1, 2, 1),
            num_heads=(2, 2, 2, 2),
            window_sizes=(2, 2, 4, 2),
            out_channels=16,
        )

    @property
    def grid(self) -> int:
        return self.img_size // 16

    def stage_resolution(self, stage: int) -> int:
        r = self.img_size // 4  # after patch embed
        # merges into stages 1 and 2 downsample; the merge into the last
        # stage keeps resolution (mobile_sam tiny_vit_sam.py PatchMerging
        # stride-1 rule for out_dim 320/448/576)
        for s in range(1, stage + 1):
            if s < len(self.depths) - 1:
                r //= 2
        return r


class ConvBN(nn.Module):
    """Conv with folded BatchNorm (bias carries the BN statistics)."""

    out: int
    kernel: int = 1
    stride: int = 1
    groups: int = 1

    @nn.compact
    def __call__(self, x):
        return nn.Conv(
            self.out, (self.kernel, self.kernel), strides=self.stride,
            padding=self.kernel // 2, feature_group_count=self.groups,
            use_bias=True, name="conv",
        )(x)


class MBConv(nn.Module):
    dim: int
    expand: float

    @nn.compact
    def __call__(self, x):
        hidden = int(self.dim * self.expand)
        y = nn.gelu(ConvBN(hidden, 1, name="conv1")(x), approximate=False)
        y = ConvBN(hidden, 3, groups=hidden, name="conv2")(y)
        y = nn.gelu(y, approximate=False)
        y = ConvBN(self.dim, 1, name="conv3")(y)
        return nn.gelu(x + y, approximate=False)


class PatchMerging(nn.Module):
    out_dim: int
    stride: int

    @nn.compact
    def __call__(self, x):  # NHWC
        x = nn.gelu(ConvBN(self.out_dim, 1, name="conv1")(x), approximate=False)
        x = ConvBN(self.out_dim, 3, stride=self.stride, groups=self.out_dim, name="conv2")(x)
        x = nn.gelu(x, approximate=False)
        return ConvBN(self.out_dim, 1, name="conv3")(x)


def _attention_bias_idxs(ws: int) -> np.ndarray:
    """(N, N) index map into the unique-offset bias table (TinyViT)."""
    pts = [(i, j) for i in range(ws) for j in range(ws)]
    offsets: Dict[Tuple[int, int], int] = {}
    idxs = np.zeros((len(pts), len(pts)), np.int32)
    for a, p1 in enumerate(pts):
        for b, p2 in enumerate(pts):
            off = (abs(p1[0] - p2[0]), abs(p1[1] - p2[1]))
            if off not in offsets:
                offsets[off] = len(offsets)
            idxs[a, b] = offsets[off]
    return idxs


class TinyAttention(nn.Module):
    """TinyViT attention: separate q/k width (key_dim) vs v width
    (attn_ratio*key_dim), learned per-offset additive biases, pre-norm."""

    dim: int
    heads: int
    window: int
    attn_ratio: int = 1

    @nn.compact
    def __call__(self, x):  # (B*, N, C) with N == window**2
        key_dim = self.dim // self.heads
        d = self.attn_ratio * key_dim
        n = self.window * self.window
        h = self.heads

        x = nn.LayerNorm(epsilon=1e-5, name="norm")(x)
        qkv = nn.Dense(h * (2 * key_dim + d), name="qkv")(x)
        q, k, v = jnp.split(
            qkv.reshape(*x.shape[:-1], h, 2 * key_dim + d),
            [key_dim, 2 * key_dim], axis=-1,
        )  # (..., N, h, key_dim/d)
        q = q.swapaxes(-3, -2)  # (..., h, N, key_dim)
        k = k.swapaxes(-3, -2)
        v = v.swapaxes(-3, -2)

        idxs = _attention_bias_idxs(self.window)  # compile-time numpy
        biases = self.param(
            "attention_biases", nn.initializers.zeros, (h, int(idxs.max()) + 1)
        )
        attn = jnp.einsum("...hqd,...hkd->...hqk", q, k) * (key_dim**-0.5)
        attn = attn + biases[:, idxs][(None,) * (attn.ndim - 3)]
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(x.dtype)
        out = jnp.einsum("...hqk,...hkd->...hqd", attn, v)
        out = out.swapaxes(-3, -2).reshape(*x.shape[:-1], h * d)
        return nn.Dense(self.dim, name="proj")(out)


class TinyViTBlock(nn.Module):
    dim: int
    heads: int
    window: int
    mlp_ratio: float
    # optional MLP activation override (e.g. ops.conv_fused.gelu_poly on the
    # serving path); None = exact erf gelu, the torch default
    act: Any = None

    @nn.compact
    def __call__(self, x):  # (B, H, W, C)
        b, hh, ww, c = x.shape
        ws = self.window
        shortcut = x
        # pad to window multiples, partition, attend, unpartition
        ph, pw = (ws - hh % ws) % ws, (ws - ww % ws) % ws
        y = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
        hp, wp = hh + ph, ww + pw
        y = y.reshape(b, hp // ws, ws, wp // ws, ws, c).transpose(0, 1, 3, 2, 4, 5)
        y = y.reshape(-1, ws * ws, c)
        y = TinyAttention(c, self.heads, ws, name="attn")(y)
        y = y.reshape(b, hp // ws, wp // ws, ws, ws, c).transpose(0, 1, 3, 2, 4, 5)
        y = y.reshape(b, hp, wp, c)[:, :hh, :ww]
        x = shortcut + y

        x = ConvBN(c, 3, groups=c, name="local_conv")(x)

        y = nn.LayerNorm(epsilon=1e-5, name="mlp_norm")(x)
        y = nn.Dense(int(c * self.mlp_ratio), name="mlp_fc1")(y)
        y = self.act(y) if self.act is not None else nn.gelu(y, approximate=False)
        y = nn.Dense(c, name="mlp_fc2")(y)
        return x + y


class TinyViT(nn.Module):
    """Full MobileSAM image encoder incl. the SAM neck: (B, S, S, 3)
    normalized images -> (B, S/16, S/16, out_channels)."""

    cfg: TinyViTConfig

    @nn.compact
    def __call__(self, images):
        c = self.cfg
        if c.compute_dtype is not None:
            images = images.astype(c.compute_dtype)
        n0 = c.embed_dims[0]
        x = nn.gelu(
            ConvBN(n0 // 2, 3, stride=2, name="patch_embed1")(images), approximate=False
        )
        x = ConvBN(n0, 3, stride=2, name="patch_embed2")(x)

        for i in range(c.depths[0]):
            x = MBConv(n0, c.mbconv_expand, name=f"stage0_block{i}")(x)

        for s in range(1, len(c.depths)):
            stride = 2 if s < len(c.depths) - 1 else 1
            x = PatchMerging(c.embed_dims[s], stride, name=f"merge{s}")(x)
            for i in range(c.depths[s]):
                x = TinyViTBlock(
                    c.embed_dims[s], c.num_heads[s], c.window_sizes[s],
                    c.mlp_ratio, name=f"stage{s}_block{i}",
                )(x)

        # SAM neck (mobile_sam tiny_vit_sam.py neck / sam.py ImageEncoderViT)
        from vlfm_tpu.models.sam import LayerNorm2d

        x = nn.Conv(c.out_channels, (1, 1), use_bias=False, name="neck_conv1")(x)
        x = LayerNorm2d(name="neck_ln1")(x)
        x = nn.Conv(c.out_channels, (3, 3), padding=1, use_bias=False, name="neck_conv2")(x)
        x = LayerNorm2d(name="neck_ln2")(x)
        return x


# ---------------------------------------------------------------------------
# mobile_sam checkpoint conversion (BN folded into convs)
# ---------------------------------------------------------------------------
def _fold_bn(sd, conv_name, bn_name, groups=1):
    """torch Conv2d(no bias) + BatchNorm2d -> flax conv kernel+bias."""
    w = np.asarray(sd[f"{conv_name}.weight"])  # (out, in/groups, kh, kw)
    gamma = np.asarray(sd[f"{bn_name}.weight"])
    beta = np.asarray(sd[f"{bn_name}.bias"])
    mean = np.asarray(sd[f"{bn_name}.running_mean"])
    var = np.asarray(sd[f"{bn_name}.running_var"])
    eps = 1e-5
    scale = gamma / np.sqrt(var + eps)
    w = w * scale[:, None, None, None]
    b = beta - mean * scale
    # torch (out, in/groups, kh, kw) -> flax (kh, kw, in/groups, out)
    return {"conv": {"kernel": jnp.asarray(w.transpose(2, 3, 1, 0)),
                     "bias": jnp.asarray(b)}}


def _lin(sd, name):
    return {"kernel": jnp.asarray(np.asarray(sd[f"{name}.weight"]).T),
            "bias": jnp.asarray(np.asarray(sd[f"{name}.bias"]))}


def _ln(sd, name):
    return {"scale": jnp.asarray(np.asarray(sd[f"{name}.weight"])),
            "bias": jnp.asarray(np.asarray(sd[f"{name}.bias"]))}


def convert_mobile_sam_encoder(sd: Mapping[str, Any], cfg: TinyViTConfig) -> Dict[str, Any]:
    """Map mobile_sam's TinyViT state-dict naming (image_encoder.* keys of
    the published mobile_sam.pt, or a bare tiny_vit state dict) to the flax
    tree. BatchNorms are folded."""
    sd = {k.removeprefix("image_encoder."): v for k, v in sd.items()}
    out: Dict[str, Any] = {
        "patch_embed1": _fold_bn(sd, "patch_embed.seq.0.c", "patch_embed.seq.0.bn"),
        "patch_embed2": _fold_bn(sd, "patch_embed.seq.2.c", "patch_embed.seq.2.bn"),
        "neck_conv1": {"kernel": jnp.asarray(
            np.asarray(sd["neck.0.weight"]).transpose(2, 3, 1, 0))},
        "neck_ln1": _ln(sd, "neck.1"),
        "neck_conv2": {"kernel": jnp.asarray(
            np.asarray(sd["neck.2.weight"]).transpose(2, 3, 1, 0))},
        "neck_ln2": _ln(sd, "neck.3"),
    }
    # stage 0: layers.0 is the ConvLayer of MBConvs
    for i in range(cfg.depths[0]):
        p = f"layers.0.blocks.{i}"
        out[f"stage0_block{i}"] = {
            "conv1": _fold_bn(sd, f"{p}.conv1.c", f"{p}.conv1.bn"),
            "conv2": _fold_bn(sd, f"{p}.conv2.c", f"{p}.conv2.bn"),
            "conv3": _fold_bn(sd, f"{p}.conv3.c", f"{p}.conv3.bn"),
        }
    # merges live on the PRECEDING layer object (layers.{s-1}.downsample)
    for s in range(1, len(cfg.depths)):
        p = f"layers.{s - 1}.downsample"
        out[f"merge{s}"] = {
            "conv1": _fold_bn(sd, f"{p}.conv1.c", f"{p}.conv1.bn"),
            "conv2": _fold_bn(sd, f"{p}.conv2.c", f"{p}.conv2.bn"),
            "conv3": _fold_bn(sd, f"{p}.conv3.c", f"{p}.conv3.bn"),
        }
        for i in range(cfg.depths[s]):
            b = f"layers.{s}.blocks.{i}"
            out[f"stage{s}_block{i}"] = {
                "attn": {
                    "norm": _ln(sd, f"{b}.attn.norm"),
                    "qkv": _lin(sd, f"{b}.attn.qkv"),
                    "proj": _lin(sd, f"{b}.attn.proj"),
                    "attention_biases": jnp.asarray(
                        np.asarray(sd[f"{b}.attn.attention_biases"])),
                },
                "local_conv": _fold_bn(sd, f"{b}.local_conv.c", f"{b}.local_conv.bn"),
                "mlp_norm": _ln(sd, f"{b}.mlp.norm"),
                "mlp_fc1": _lin(sd, f"{b}.mlp.fc1"),
                "mlp_fc2": _lin(sd, f"{b}.mlp.fc2"),
            }
    return out


def expected_mobile_sam_keys(cfg: TinyViTConfig) -> Dict[str, Tuple[int, ...]]:
    """Key -> shape table of the mobile_sam TinyViT state dict this converter
    consumes (the contract the converter is tested against)."""
    keys: Dict[str, Tuple[int, ...]] = {}

    def conv_bn(name, cin, cout, k, groups=1):
        keys[f"{name}.c.weight"] = (cout, cin // groups, k, k)
        for suffix in ("weight", "bias", "running_mean", "running_var"):
            keys[f"{name}.bn.{suffix}"] = (cout,)

    n0 = cfg.embed_dims[0]
    conv_bn("patch_embed.seq.0", 3, n0 // 2, 3)
    conv_bn("patch_embed.seq.2", n0 // 2, n0, 3)
    hidden = int(n0 * cfg.mbconv_expand)
    for i in range(cfg.depths[0]):
        p = f"layers.0.blocks.{i}"
        conv_bn(f"{p}.conv1", n0, hidden, 1)
        conv_bn(f"{p}.conv2", hidden, hidden, 3, groups=hidden)
        conv_bn(f"{p}.conv3", hidden, n0, 1)
    for s in range(1, len(cfg.depths)):
        cin, cout = cfg.embed_dims[s - 1], cfg.embed_dims[s]
        p = f"layers.{s - 1}.downsample"
        conv_bn(f"{p}.conv1", cin, cout, 1)
        conv_bn(f"{p}.conv2", cout, cout, 3, groups=cout)
        conv_bn(f"{p}.conv3", cout, cout, 1)
        heads = cfg.num_heads[s]
        key_dim = cout // heads
        d = key_dim  # attn_ratio == 1
        ws = cfg.window_sizes[s]
        n_offsets = int(_attention_bias_idxs(ws).max()) + 1
        for i in range(cfg.depths[s]):
            b = f"layers.{s}.blocks.{i}"
            keys[f"{b}.attn.norm.weight"] = (cout,)
            keys[f"{b}.attn.norm.bias"] = (cout,)
            keys[f"{b}.attn.qkv.weight"] = (heads * (2 * key_dim + d), cout)
            keys[f"{b}.attn.qkv.bias"] = (heads * (2 * key_dim + d),)
            keys[f"{b}.attn.proj.weight"] = (cout, heads * d)
            keys[f"{b}.attn.proj.bias"] = (cout,)
            keys[f"{b}.attn.attention_biases"] = (heads, n_offsets)
            conv_bn(f"{b}.local_conv", cout, cout, 3, groups=cout)
            keys[f"{b}.mlp.norm.weight"] = (cout,)
            keys[f"{b}.mlp.norm.bias"] = (cout,)
            keys[f"{b}.mlp.fc1.weight"] = (int(cout * cfg.mlp_ratio), cout)
            keys[f"{b}.mlp.fc1.bias"] = (int(cout * cfg.mlp_ratio),)
            keys[f"{b}.mlp.fc2.weight"] = (cout, int(cout * cfg.mlp_ratio))
            keys[f"{b}.mlp.fc2.bias"] = (cout,)
    keys["neck.0.weight"] = (cfg.out_channels, cfg.embed_dims[-1], 1, 1)
    keys["neck.1.weight"] = (cfg.out_channels,)
    keys["neck.1.bias"] = (cfg.out_channels,)
    keys["neck.2.weight"] = (cfg.out_channels, cfg.out_channels, 3, 3)
    keys["neck.3.weight"] = (cfg.out_channels,)
    keys["neck.3.bias"] = (cfg.out_channels,)
    return keys
