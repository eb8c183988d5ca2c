"""ZoeDepth monocular metric depth in JAX — BEiT backbone + DPT neck +
metric-bins (attractor) head.

Parity target: the reference robot stack estimates gripper-camera depth with
torch-hub ZoeDepth ZoeD_NK (vlfm/policy/reality_policies.py:40-42,156-169).
This is a faithful re-implementation of that model family against the
HF `ZoeDepthForDepthEstimation` layout (transformers/models/zoedepth),
verified by tests/test_zoedepth.py on shared random weights:

- BEiT backbone: per-layer relative position bias, layer-scale (lambda_1/2),
  biasless key projection, CLS readout.
- DPT neck: reassemble (readout='project') -> per-stage 3x3 convs ->
  RefineNet-style feature fusion with pre-activation residual units.
- Relative depth head + metric bins head: seed bin regressor, 4 attractor
  layers (softplus/unnormed and normed variants), conditional log-binomial
  softmax over bin centers.
- NK two-domain routing (ZoeDepthMultipleMetricDepthEstimationHeads): the
  torch code picks ONE head for the whole batch from a patch-transformer
  domain vote; here both heads are computed and the result selected with
  jnp.where — identical numerics, jit-compatible control flow.

TPU-first deviations: NHWC layout throughout, static shapes (the rel-pos
table is used at its trained window size, so the torch table-resize path is
the identity), and explicit gather-based bilinear resizes implementing both
align_corners conventions (jax.image.resize only provides half-pixel
sampling).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial
from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from vlfm_tpu.ops.resize import resize_bilinear, resize_bilinear_hw


# ---------------------------------------------------------------------------
# config
# ---------------------------------------------------------------------------
@dataclass(frozen=True)
class BeitConfigJx:
    image_size: int = 384
    patch_size: int = 16
    hidden_size: int = 1024
    layers: int = 24
    heads: int = 16
    intermediate: int = 4096
    layer_scale_init: float = 0.1
    layer_norm_eps: float = 1e-12
    out_indices: Tuple[int, ...] = (6, 12, 18, 24)  # 1-based layer index


@dataclass(frozen=True)
class ZoeDepthJaxConfig:
    beit: BeitConfigJx = field(default_factory=BeitConfigJx)
    reassemble_factors: Tuple[float, ...] = (4, 2, 1, 0.5)
    neck_hidden_sizes: Tuple[int, ...] = (256, 512, 1024, 1024)
    fusion_hidden_size: int = 256
    num_relative_features: int = 32
    bottleneck_features: int = 256
    num_attractors: Tuple[int, ...] = (16, 8, 4, 1)
    bin_embedding_dim: int = 128
    attractor_alpha: float = 1000.0
    attractor_gamma: float = 2.0
    attractor_kind: str = "mean"  # or "sum"
    min_temp: float = 0.0212
    max_temp: float = 50.0
    bin_centers_type: str = "softplus"  # or "normed"
    # (name, n_bins, min_depth, max_depth) per domain; >1 entries -> NK routing
    bin_configurations: Tuple[Tuple[str, int, float, float], ...] = (
        ("nyu", 64, 1e-3, 10.0),
    )
    # patch transformer (only used with >1 bin configurations)
    patch_transformer_layers: int = 4
    patch_transformer_hidden: int = 128
    patch_transformer_intermediate: int = 1024
    patch_transformer_heads: int = 4

    @staticmethod
    def nk() -> "ZoeDepthJaxConfig":
        """ZoeD_NK (Intel/zoedepth-nyu-kitti): two metric heads + router —
        the configuration the reference robot loads (reality_policies.py:41)."""
        return ZoeDepthJaxConfig(
            bin_configurations=(
                ("nyu", 64, 1e-3, 10.0),
                ("kitti", 64, 1e-3, 80.0),
            ),
        )

    @staticmethod
    def tiny_test() -> "ZoeDepthJaxConfig":
        return ZoeDepthJaxConfig(
            beit=BeitConfigJx(
                image_size=64, patch_size=16, hidden_size=32, layers=4,
                heads=2, intermediate=64, out_indices=(1, 2, 3, 4),
            ),
            neck_hidden_sizes=(16, 24, 32, 32),
            fusion_hidden_size=32,
            num_relative_features=8,
            bottleneck_features=32,
            num_attractors=(4, 2, 2, 1),
            bin_embedding_dim=16,
            bin_configurations=(("nyu", 8, 1e-3, 10.0),),
            patch_transformer_hidden=16,
            patch_transformer_intermediate=32,
            patch_transformer_heads=2,
        )


# ---------------------------------------------------------------------------
# bilinear resize with explicit corner conventions
# ---------------------------------------------------------------------------
def _resize_bilinear(x: jnp.ndarray, size: Tuple[int, int], align_corners: bool) -> jnp.ndarray:
    """x: (..., H, W, C) -> (..., h, w, C). torch F.interpolate semantics."""
    h, w = x.shape[-3], x.shape[-2]
    oh, ow = size
    if (oh, ow) == (h, w):
        return x

    def axis_coords(n_in, n_out):
        if align_corners:
            if n_out == 1:
                return jnp.zeros((1,), jnp.float32)
            return jnp.arange(n_out, dtype=jnp.float32) * ((n_in - 1) / (n_out - 1))
        c = (jnp.arange(n_out, dtype=jnp.float32) + 0.5) * (n_in / n_out) - 0.5
        return jnp.clip(c, 0.0, n_in - 1)

    def interp_axis(arr, coords, axis):
        lo = jnp.floor(coords).astype(jnp.int32)
        hi = jnp.minimum(lo + 1, arr.shape[axis] - 1)
        t = (coords - lo).astype(arr.dtype)
        a = jnp.take(arr, lo, axis=axis)
        b = jnp.take(arr, hi, axis=axis)
        shape = [1] * arr.ndim
        shape[axis] = -1
        return a + (b - a) * t.reshape(shape)

    x = interp_axis(x, axis_coords(h, oh), x.ndim - 3)
    x = interp_axis(x, axis_coords(w, ow), x.ndim - 2)
    return x


# ---------------------------------------------------------------------------
# BEiT backbone
# ---------------------------------------------------------------------------
def _beit_rel_pos_index(wh: int, ww: int) -> np.ndarray:
    """(N+1, N+1) int index into the (2wh-1)(2ww-1)+3 bias table
    (modeling_beit.py BeitRelativePositionBias.generate_relative_position_index)."""
    num_rel = (2 * wh - 1) * (2 * ww - 1) + 3
    coords = np.stack(np.meshgrid(np.arange(wh), np.arange(ww), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.transpose(1, 2, 0).copy()
    rel[:, :, 0] += wh - 1
    rel[:, :, 1] += ww - 1
    rel[:, :, 0] *= 2 * ww - 1
    n = wh * ww
    idx = np.zeros((n + 1, n + 1), np.int32)
    idx[1:, 1:] = rel.sum(-1)
    idx[0, :] = num_rel - 3
    idx[:, 0] = num_rel - 2
    idx[0, 0] = num_rel - 1
    return idx


class BeitLayerJx(nn.Module):
    cfg: BeitConfigJx

    @nn.compact
    def __call__(self, x):  # (B, N+1, D)
        c = self.cfg
        d, nh = c.hidden_size, c.heads
        dh = d // nh
        wh = ww = c.image_size // c.patch_size
        num_rel = (2 * wh - 1) * (2 * ww - 1) + 3

        h = nn.LayerNorm(epsilon=c.layer_norm_eps, name="ln_before")(x)
        q = nn.Dense(d, name="q")(h)
        k = nn.Dense(d, use_bias=False, name="k")(h)  # BEiT: biasless key
        v = nn.Dense(d, name="v")(h)
        b, n = h.shape[:2]
        q = q.reshape(b, n, nh, dh).transpose(0, 2, 1, 3)
        k = k.reshape(b, n, nh, dh).transpose(0, 2, 1, 3)
        v = v.reshape(b, n, nh, dh).transpose(0, 2, 1, 3)
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(dh).astype(x.dtype)

        table = self.param(
            "rel_pos_table", nn.initializers.zeros, (num_rel, nh), jnp.float32
        )
        idx = jnp.asarray(_beit_rel_pos_index(wh, ww))
        bias = table[idx]  # (N+1, N+1, nh)
        scores = scores + bias.transpose(2, 0, 1)[None]

        attn = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, d)
        out = nn.Dense(d, name="proj")(out)
        lam1 = self.param("lambda_1", nn.initializers.constant(c.layer_scale_init), (d,))
        x = x + lam1 * out

        h = nn.LayerNorm(epsilon=c.layer_norm_eps, name="ln_after")(x)
        h = nn.Dense(c.intermediate, name="fc1")(h)
        h = jax.nn.gelu(h, approximate=False)
        h = nn.Dense(d, name="fc2")(h)
        lam2 = self.param("lambda_2", nn.initializers.constant(c.layer_scale_init), (d,))
        return x + lam2 * h


class BeitBackboneJx(nn.Module):
    cfg: BeitConfigJx

    @nn.compact
    def __call__(self, pixels):  # (B, H, W, 3) normalized
        c = self.cfg
        x = nn.Conv(
            c.hidden_size, (c.patch_size, c.patch_size),
            strides=(c.patch_size, c.patch_size), padding="VALID", name="patch_embed",
        )(pixels)
        b, ph, pw, _ = x.shape
        x = x.reshape(b, ph * pw, c.hidden_size)
        cls = self.param("cls_token", nn.initializers.zeros, (1, 1, c.hidden_size))
        x = jnp.concatenate([jnp.broadcast_to(cls, (b, 1, c.hidden_size)), x], axis=1)

        feats = []
        for i in range(c.layers):
            x = BeitLayerJx(c, name=f"layer{i}")(x)
            if (i + 1) in c.out_indices:
                feats.append(x)  # raw (B, N+1, D), CLS included
        return feats, (ph, pw)


# ---------------------------------------------------------------------------
# DPT neck
# ---------------------------------------------------------------------------
class ReassembleJx(nn.Module):
    """Readout-project + channel proj + spatial re-scale per stage
    (modeling_zoedepth.py ZoeDepthReassembleStage/Layer)."""

    cfg: ZoeDepthJaxConfig

    @nn.compact
    def __call__(self, feats, ph, pw):
        c = self.cfg
        out = []
        for i, (hs, ch, factor) in enumerate(
            zip(feats, c.neck_hidden_sizes, c.reassemble_factors)
        ):
            cls, tokens = hs[:, 0], hs[:, 1:]
            b, n, d = tokens.shape
            readout = jnp.broadcast_to(cls[:, None, :], tokens.shape)
            h = jnp.concatenate([tokens, readout], axis=-1)
            h = nn.Dense(d, name=f"readout{i}")(h)
            h = jax.nn.gelu(h, approximate=False)
            h = h.reshape(b, ph, pw, d)
            h = nn.Conv(ch, (1, 1), name=f"proj{i}")(h)
            if factor > 1:
                f = int(factor)
                h = nn.ConvTranspose(
                    ch, (f, f), strides=(f, f), padding="VALID",
                    transpose_kernel=True, name=f"resize{i}",
                )(h)
            elif factor < 1:
                s = int(round(1 / factor))
                h = nn.Conv(ch, (3, 3), strides=(s, s), padding=1, name=f"resize{i}")(h)
            out.append(h)
        return out


class PreActResidualJx(nn.Module):
    ch: int

    @nn.compact
    def __call__(self, x):
        h = nn.relu(x)
        h = nn.Conv(self.ch, (3, 3), padding=1, name="conv1")(h)
        h = nn.relu(h)
        h = nn.Conv(self.ch, (3, 3), padding=1, name="conv2")(h)
        return x + h


class FusionLayerJx(nn.Module):
    ch: int

    @nn.compact
    def __call__(self, x, residual=None):
        if residual is not None:
            if residual.shape[1:3] != x.shape[1:3]:
                residual = _resize_bilinear(residual, x.shape[1:3], align_corners=False)
            x = x + PreActResidualJx(self.ch, name="res1")(residual)
        x = PreActResidualJx(self.ch, name="res2")(x)
        x = _resize_bilinear(x, (2 * x.shape[1], 2 * x.shape[2]), align_corners=True)
        return nn.Conv(self.ch, (1, 1), name="proj")(x)


class NeckJx(nn.Module):
    cfg: ZoeDepthJaxConfig

    @nn.compact
    def __call__(self, backbone_feats, ph, pw):
        c = self.cfg
        stages = ReassembleJx(c, name="reassemble")(backbone_feats, ph, pw)
        feats = [
            nn.Conv(c.fusion_hidden_size, (3, 3), padding=1, use_bias=False,
                    name=f"conv{i}")(s)
            for i, s in enumerate(stages)
        ]
        fused = []
        cur = None
        for j, f in enumerate(reversed(feats)):  # deepest first
            layer = FusionLayerJx(c.fusion_hidden_size, name=f"fusion{j}")
            cur = layer(f) if cur is None else layer(cur, f)
            fused.append(cur)
        return fused, feats[-1]


class RelativeHeadJx(nn.Module):
    cfg: ZoeDepthJaxConfig

    @nn.compact
    def __call__(self, fused_last):
        c = self.cfg
        h = nn.Conv(c.fusion_hidden_size // 2, (3, 3), padding=1, name="conv1")(fused_last)
        h = _resize_bilinear(h, (2 * h.shape[1], 2 * h.shape[2]), align_corners=True)
        h = nn.Conv(c.num_relative_features, (3, 3), padding=1, name="conv2")(h)
        h = nn.relu(h)
        features = h
        h = nn.Conv(1, (1, 1), name="conv3")(h)
        h = nn.relu(h)
        return h[..., 0], features


# ---------------------------------------------------------------------------
# metric bins machinery
# ---------------------------------------------------------------------------
def _log_binom(n, k, eps=1e-7):
    # torch computes log(n - k + eps); under jit XLA reassociates that into
    # (n + eps) - k == 0 at k == n (fp32 absorbs the eps), giving log(0) and
    # a 0 * -inf NaN. maximum() expresses the same guard un-reassociatably.
    n = n + eps
    k = k + eps
    return n * jnp.log(n) - k * jnp.log(k) - (n - k) * jnp.log(jnp.maximum(n - k, eps))


def _log_binomial_softmax(probabilities, temperature, n_classes):
    """(B, H, W) probs -> (B, H, W, K) log-binomial softmax over bins."""
    eps = 1e-4
    p = jnp.clip(probabilities, eps, 1.0)[..., None]
    omp = jnp.clip(1.0 - probabilities, eps, 1.0)[..., None]
    k_idx = jnp.arange(n_classes, dtype=jnp.float32)
    k_m1 = jnp.float32(n_classes - 1)
    y = _log_binom(k_m1, k_idx) + k_idx * jnp.log(p) + (k_m1 - k_idx) * jnp.log(omp)
    return jax.nn.softmax(y / temperature, axis=-1)


class ConditionalLogBinomialJx(nn.Module):
    cfg: ZoeDepthJaxConfig
    n_classes: int
    bottleneck_factor: int = 2

    @nn.compact
    def __call__(self, main_feature, condition_feature):
        c = self.cfg
        x = jnp.concatenate([main_feature, condition_feature], axis=-1)
        bottleneck = x.shape[-1] // self.bottleneck_factor
        x = nn.Conv(bottleneck, (1, 1), name="mlp1")(x)
        x = jax.nn.gelu(x, approximate=False)
        x = nn.Conv(4, (1, 1), name="mlp2")(x)
        x = jax.nn.softplus(x)
        p_eps = 1e-4
        prob = x[..., 0:2] + p_eps
        prob = prob[..., 0] / (prob[..., 0] + prob[..., 1])
        temp = x[..., 2:4] + p_eps
        temp = temp[..., 0] / (temp[..., 0] + temp[..., 1])
        temp = (c.max_temp - c.min_temp) * temp + c.min_temp
        return _log_binomial_softmax(prob, temp[..., None], self.n_classes)


class SeedBinRegressorJx(nn.Module):
    cfg: ZoeDepthJaxConfig
    n_bins: int
    mlp_dim: int
    min_depth: float
    max_depth: float

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        h = nn.Conv(self.mlp_dim, (1, 1), name="conv1")(x)
        h = nn.relu(h)
        h = nn.Conv(self.n_bins, (1, 1), name="conv2")(h)
        if c.bin_centers_type == "normed":
            bc = nn.relu(h) + 1e-3
            widths_normed = bc / jnp.sum(bc, axis=-1, keepdims=True)
            widths = (self.max_depth - self.min_depth) * widths_normed
            widths = jnp.pad(
                widths, [(0, 0)] * (widths.ndim - 1) + [(1, 0)],
                constant_values=self.min_depth,
            )
            edges = jnp.cumsum(widths, axis=-1)
            centers = 0.5 * (edges[..., :-1] + edges[..., 1:])
            return widths_normed, centers
        bc = jax.nn.softplus(h)
        return bc, bc


def _inv_attractor(dx, alpha, gamma):
    return dx / (1 + alpha * dx**gamma)


class AttractorLayerJx(nn.Module):
    """Normed (bounded) or unnormed (softplus) attractor
    (modeling_zoedepth.py ZoeDepthAttractorLayer{,Unnormed})."""

    cfg: ZoeDepthJaxConfig
    n_attractors: int
    min_depth: float
    max_depth: float

    @nn.compact
    def __call__(self, x, prev_bin, prev_bin_embedding=None):
        c = self.cfg
        normed = c.bin_centers_type == "normed"
        if prev_bin_embedding is not None:
            if prev_bin_embedding.shape[1:3] != x.shape[1:3]:
                prev_bin_embedding = _resize_bilinear(
                    prev_bin_embedding, x.shape[1:3], align_corners=True
                )
            x = x + prev_bin_embedding
        h = nn.Conv(c.bin_embedding_dim, (1, 1), name="conv1")(x)
        h = nn.relu(h)
        if normed:
            h = nn.Conv(self.n_attractors * 2, (1, 1), name="conv2")(h)
            att = nn.relu(h) + 1e-3
            b, hh, ww, _ = att.shape
            att = att.reshape(b, hh, ww, self.n_attractors, 2)[..., 0]
        else:
            h = nn.Conv(self.n_attractors, (1, 1), name="conv2")(h)
            att = jax.nn.softplus(h)

        bin_centers = _resize_bilinear(prev_bin, x.shape[1:3], align_corners=True)
        # (B, H, W, A, 1) - (B, H, W, 1, K) -> reduce over attractors.
        # NOTE: upstream quirk preserved — torch's forward calls inv_attractor
        # WITHOUT alpha/gamma, so the function defaults (300, 2) apply and
        # config.attractor_alpha/gamma are dead fields
        # (modeling_zoedepth.py:649,734 vs :552).
        delta = _inv_attractor(
            att[..., :, None] - bin_centers[..., None, :], 300.0, 2.0
        )
        delta_c = jnp.sum(delta, axis=-2)
        if c.attractor_kind == "mean":
            delta_c = delta_c / self.n_attractors
        new_centers = bin_centers + delta_c
        if normed:
            scaled = (self.max_depth - self.min_depth) * new_centers + self.min_depth
            scaled = jnp.sort(scaled, axis=-1)
            scaled = jnp.clip(scaled, self.min_depth, self.max_depth)
            return new_centers, scaled
        return new_centers, new_centers


class ProjectorJx(nn.Module):
    out_features: int
    mlp_dim: int = 128

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.mlp_dim, (1, 1), name="conv1")(x)
        h = nn.relu(h)
        return nn.Conv(self.out_features, (1, 1), name="conv2")(h)


class MetricHeadJx(nn.Module):
    """Single-domain metric head (ZoeDepthMetricDepthEstimationHead)."""

    cfg: ZoeDepthJaxConfig
    n_bins: int
    min_depth: float
    max_depth: float

    @nn.compact
    def __call__(self, outconv, bottleneck, feature_blocks, relative_depth):
        c = self.cfg
        x = nn.Conv(c.bottleneck_features, (1, 1), name="conv2")(bottleneck)
        _, seed_centers = SeedBinRegressorJx(
            c, self.n_bins, 256, self.min_depth, self.max_depth,
            name="seed_bin_regressor",
        )(x)
        if c.bin_centers_type == "normed":
            prev_bin = (seed_centers - self.min_depth) / (self.max_depth - self.min_depth)
        else:
            prev_bin = seed_centers
        prev_emb = ProjectorJx(c.bin_embedding_dim, name="seed_projector")(x)

        bin_centers = prev_bin
        for i, feature in enumerate(feature_blocks):
            emb = ProjectorJx(c.bin_embedding_dim, name=f"projector{i}")(feature)
            prev_bin, bin_centers = AttractorLayerJx(
                c, c.num_attractors[i], self.min_depth, self.max_depth,
                name=f"attractor{i}",
            )(emb, prev_bin, prev_emb)
            prev_emb = emb

        last = outconv
        rel = _resize_bilinear(
            relative_depth[..., None], last.shape[1:3], align_corners=True
        )
        last = jnp.concatenate([last, rel], axis=-1)
        emb_up = _resize_bilinear(prev_emb, last.shape[1:3], align_corners=True)
        probs = ConditionalLogBinomialJx(
            c, self.n_bins, name="conditional_log_binomial"
        )(last, emb_up)
        centers_up = _resize_bilinear(bin_centers, probs.shape[1:3], align_corners=True)
        return jnp.sum(probs * centers_up, axis=-1)


class PatchTransformerJx(nn.Module):
    cfg: ZoeDepthJaxConfig

    @nn.compact
    def __call__(self, x):  # (B, H, W, bottleneck)
        c = self.cfg
        d = c.patch_transformer_hidden
        e = nn.Conv(d, (1, 1), name="embed")(x)
        b = e.shape[0]
        e = e.reshape(b, -1, d)
        # extra leading CLS slot, zero-embedded (F.pad on the seq dim)
        e = jnp.concatenate([jnp.zeros((b, 1, d), e.dtype), e], axis=1)
        n = e.shape[1]
        pos = jnp.arange(n, dtype=jnp.float32)[:, None]
        idx = jnp.arange(0, d, 2, dtype=jnp.float32)[None, :]
        div = jnp.exp(idx * (-jnp.log(10000.0) / d))
        pe = jnp.concatenate([jnp.sin(pos * div), jnp.cos(pos * div)], axis=1)
        e = e + pe[None]
        for i in range(4):  # torch forward hardcodes 4 layers
            q = nn.Dense(d, name=f"l{i}_q")(e)
            k = nn.Dense(d, name=f"l{i}_k")(e)
            v = nn.Dense(d, name=f"l{i}_v")(e)
            nh = c.patch_transformer_heads
            dh = d // nh
            q = q.reshape(b, n, nh, dh).transpose(0, 2, 1, 3)
            k = k.reshape(b, n, nh, dh).transpose(0, 2, 1, 3)
            v = v.reshape(b, n, nh, dh).transpose(0, 2, 1, 3)
            a = jax.nn.softmax(
                jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(dh), axis=-1
            )
            o = jnp.einsum("bhqk,bhkd->bhqd", a, v).transpose(0, 2, 1, 3).reshape(b, n, d)
            o = nn.Dense(d, name=f"l{i}_out")(o)
            e = nn.LayerNorm(name=f"l{i}_ln1")(e + o)
            f = nn.Dense(c.patch_transformer_intermediate, name=f"l{i}_fc1")(e)
            f = nn.relu(f)
            f = nn.Dense(d, name=f"l{i}_fc2")(f)
            e = nn.LayerNorm(name=f"l{i}_ln2")(e + f)
        return e


class MultiMetricHeadJx(nn.Module):
    """NK two-domain head with patch-transformer router
    (ZoeDepthMultipleMetricDepthEstimationHeads). Both domain heads are
    evaluated and the winner selected with jnp.where (the torch code branches
    in python on the batch-summed domain vote)."""

    cfg: ZoeDepthJaxConfig

    @nn.compact
    def __call__(self, outconv, bottleneck, feature_blocks, relative_depth):
        c = self.cfg
        x = nn.Conv(c.bottleneck_features, (1, 1), name="conv2")(bottleneck)
        emb = PatchTransformerJx(c, name="patch_transformer")(x)[:, 0, :]
        h = nn.Dense(emb.shape[-1], name="mlp_classifier1")(emb)
        h = nn.relu(h)
        domain_logits = nn.Dense(len(c.bin_configurations), name="mlp_classifier2")(h)
        vote = jax.nn.softmax(jnp.sum(domain_logits, axis=0), axis=-1)
        winner = jnp.argmax(vote)

        # projectors are SHARED across domains (torch: one seed_projector +
        # one projectors ModuleList outside the per-domain dicts)
        seed_emb = ProjectorJx(
            c.bin_embedding_dim, mlp_dim=c.bin_embedding_dim // 2,
            name="seed_projector",
        )(x)
        feat_embs = [
            ProjectorJx(
                c.bin_embedding_dim, mlp_dim=c.bin_embedding_dim // 2,
                name=f"projector{i}",
            )(feature)
            for i, feature in enumerate(feature_blocks)
        ]

        outs = []
        for di, (name, n_bins, min_d, max_d) in enumerate(c.bin_configurations):
            _, seed_centers = SeedBinRegressorJx(
                c, n_bins, c.bin_embedding_dim // 2, min_d, max_d,
                name=f"seed_bin_regressor_{name}",
            )(x)
            if c.bin_centers_type == "normed":
                prev_bin = (seed_centers - min_d) / (max_d - min_d)
            else:
                prev_bin = seed_centers
            prev_emb = seed_emb
            bin_centers = prev_bin
            for i, e in enumerate(feat_embs):
                # upstream quirk preserved: the multi-head constructor passes
                # n_bins=num_attractors[i] and leaves n_attractors at its
                # default of 16 (modeling_zoedepth.py:1027-1033), so every
                # routed attractor layer has 16 attractor points
                prev_bin, bin_centers = AttractorLayerJx(
                    c, 16, min_d, max_d,
                    name=f"attractor{i}_{name}",
                )(e, prev_bin, prev_emb)
                prev_emb = e
            last = outconv
            centers_up = _resize_bilinear(bin_centers, last.shape[1:3], align_corners=True)
            emb_up = _resize_bilinear(prev_emb, last.shape[1:3], align_corners=True)
            probs = ConditionalLogBinomialJx(
                c, n_bins, bottleneck_factor=4,
                name=f"conditional_log_binomial_{name}",
            )(last, emb_up)
            outs.append(jnp.sum(probs * centers_up, axis=-1))
        stacked = jnp.stack(outs)  # (domains, B, H, W)
        return jnp.take(stacked, winner, axis=0), domain_logits


class ZoeDepthModule(nn.Module):
    cfg: ZoeDepthJaxConfig

    @nn.compact
    def __call__(self, pixels):  # (B, H, W, 3) normalized
        c = self.cfg
        feats, (ph, pw) = BeitBackboneJx(c.beit, name="backbone")(pixels)
        fused, bottleneck = NeckJx(c, name="neck")(feats, ph, pw)
        relative_depth, rel_features = RelativeHeadJx(c, name="relative_head")(fused[-1])
        if len(c.bin_configurations) > 1:
            depth, domain_logits = MultiMetricHeadJx(c, name="metric_head")(
                rel_features, bottleneck, fused, relative_depth
            )
            return depth, domain_logits
        name, n_bins, min_d, max_d = c.bin_configurations[0]
        depth = MetricHeadJx(c, n_bins, min_d, max_d, name="metric_head")(
            rel_features, bottleneck, fused, relative_depth
        )
        return depth, None


# ---------------------------------------------------------------------------
# user-facing wrapper (the MonocularDepth drop-in)
# ---------------------------------------------------------------------------
class ZoeDepth:
    """Metric depth estimator with the MonocularDepth.infer_depth contract
    (models/monodepth.py); reality_policies.py:156-169 semantics."""

    # ImageNet normalization, matching ZoeDepthImageProcessor defaults
    MEAN = np.array([0.5, 0.5, 0.5], np.float32)
    STD = np.array([0.5, 0.5, 0.5], np.float32)

    def __init__(self, cfg: ZoeDepthJaxConfig, params: Dict[str, Any]):
        self.cfg = cfg
        self.module = ZoeDepthModule(cfg)
        self.params = params

    @classmethod
    def init_random(cls, cfg: ZoeDepthJaxConfig = None, seed: int = 0):
        cfg = cfg or ZoeDepthJaxConfig.tiny_test()
        mod = ZoeDepthModule(cfg)
        s = cfg.beit.image_size
        params = mod.init(jax.random.PRNGKey(seed), jnp.zeros((1, s, s, 3)))["params"]
        return cls(cfg, params)

    @staticmethod
    @partial(jax.jit, static_argnames=("module",))
    def _run(module, params, pixels):
        return module.apply({"params": params}, pixels)

    def predict(self, pixels):
        """Normalized (B, S, S, 3) -> metric depth (B, S, S)."""
        return self._run(self.module, self.params, pixels)[0]

    def infer_depth(self, rgb_uint8, min_depth: float, max_depth: float):
        """(B, H, W, 3) uint8 -> (B, H, W) depth normalized to [0, 1] over
        (min_depth, max_depth) — the mapping stack's convention."""
        s = self.cfg.beit.image_size
        x = rgb_uint8.astype(jnp.float32) / 255.0
        x = (x - self.MEAN) / self.STD
        x = resize_bilinear(x, s, s)
        metric = self.predict(x)
        metric = resize_bilinear_hw(
            metric, rgb_uint8.shape[1], rgb_uint8.shape[2]
        )
        return jnp.clip((metric - min_depth) / (max_depth - min_depth), 0.0, 1.0)


# ---------------------------------------------------------------------------
# HF conversion (ZoeDepthForDepthEstimation layout)
# ---------------------------------------------------------------------------
def _t(w):
    return jnp.asarray(np.asarray(w).T)


def _conv(sd, name, bias=True):
    # torch OIHW -> flax HWIO
    out = {"kernel": jnp.asarray(np.asarray(sd[f"{name}.weight"]).transpose(2, 3, 1, 0))}
    if bias and f"{name}.bias" in sd:
        out["bias"] = jnp.asarray(np.asarray(sd[f"{name}.bias"]))
    return out


def _convT(sd, name):
    # torch ConvTranspose2d IOHW -> flax HWOI (transpose_kernel=True)
    out = {"kernel": jnp.asarray(np.asarray(sd[f"{name}.weight"]).transpose(2, 3, 1, 0))}
    if f"{name}.bias" in sd:
        out["bias"] = jnp.asarray(np.asarray(sd[f"{name}.bias"]))
    return out


def _lin(sd, name, bias=True):
    out = {"kernel": _t(sd[f"{name}.weight"])}
    if bias and f"{name}.bias" in sd:
        out["bias"] = jnp.asarray(np.asarray(sd[f"{name}.bias"]))
    return out


def _ln(sd, name):
    return {"scale": jnp.asarray(np.asarray(sd[f"{name}.weight"])),
            "bias": jnp.asarray(np.asarray(sd[f"{name}.bias"]))}


def convert_hf_zoedepth(sd: Dict[str, Any], cfg: ZoeDepthJaxConfig) -> Dict[str, Any]:
    """HF ZoeDepthForDepthEstimation state_dict -> ZoeDepthModule params."""
    p: Dict[str, Any] = {}

    # backbone
    bb = "backbone"
    backbone: Dict[str, Any] = {
        "patch_embed": _conv(sd, f"{bb}.embeddings.patch_embeddings.projection"),
        "cls_token": jnp.asarray(np.asarray(sd[f"{bb}.embeddings.cls_token"])),
    }
    for i in range(cfg.beit.layers):
        pre = f"{bb}.encoder.layer.{i}"
        backbone[f"layer{i}"] = {
            "ln_before": _ln(sd, f"{pre}.layernorm_before"),
            "q": _lin(sd, f"{pre}.attention.attention.query"),
            "k": _lin(sd, f"{pre}.attention.attention.key", bias=False),
            "v": _lin(sd, f"{pre}.attention.attention.value"),
            "rel_pos_table": jnp.asarray(np.asarray(
                sd[f"{pre}.attention.attention.relative_position_bias.relative_position_bias_table"]
            )),
            "proj": _lin(sd, f"{pre}.attention.output.dense"),
            "lambda_1": jnp.asarray(np.asarray(sd[f"{pre}.lambda_1"])),
            "lambda_2": jnp.asarray(np.asarray(sd[f"{pre}.lambda_2"])),
            "ln_after": _ln(sd, f"{pre}.layernorm_after"),
            "fc1": _lin(sd, f"{pre}.intermediate.dense"),
            "fc2": _lin(sd, f"{pre}.output.dense"),
        }
    p["backbone"] = backbone

    # neck
    neck: Dict[str, Any] = {"reassemble": {}}
    for i in range(4):
        neck["reassemble"][f"readout{i}"] = _lin(
            sd, f"neck.reassemble_stage.readout_projects.{i}.0"
        )
        neck["reassemble"][f"proj{i}"] = _conv(
            sd, f"neck.reassemble_stage.layers.{i}.projection"
        )
        rname = f"neck.reassemble_stage.layers.{i}.resize"
        if f"{rname}.weight" in sd:
            if cfg.reassemble_factors[i] > 1:
                neck["reassemble"][f"resize{i}"] = _convT(sd, rname)
            else:
                neck["reassemble"][f"resize{i}"] = _conv(sd, rname)
        neck[f"conv{i}"] = _conv(sd, f"neck.convs.{i}", bias=False)
    for j in range(4):
        pre = f"neck.fusion_stage.layers.{j}"
        neck[f"fusion{j}"] = {
            "proj": _conv(sd, f"{pre}.projection"),
            "res1": {
                "conv1": _conv(sd, f"{pre}.residual_layer1.convolution1"),
                "conv2": _conv(sd, f"{pre}.residual_layer1.convolution2"),
            },
            "res2": {
                "conv1": _conv(sd, f"{pre}.residual_layer2.convolution1"),
                "conv2": _conv(sd, f"{pre}.residual_layer2.convolution2"),
            },
        }
    p["neck"] = neck

    p["relative_head"] = {
        "conv1": _conv(sd, "relative_head.conv1"),
        "conv2": _conv(sd, "relative_head.conv2"),
        "conv3": _conv(sd, "relative_head.conv3"),
    }

    def _projector(name):
        return {"conv1": _conv(sd, f"{name}.conv1"), "conv2": _conv(sd, f"{name}.conv2")}

    def _clb(name):
        return {"mlp1": _conv(sd, f"{name}.mlp.0"), "mlp2": _conv(sd, f"{name}.mlp.2")}

    mh: Dict[str, Any] = {"conv2": _conv(sd, "metric_head.conv2")}
    if len(cfg.bin_configurations) > 1:
        pt: Dict[str, Any] = {
            "embed": _conv(sd, "metric_head.patch_transformer.embedding_convPxP")
        }
        for i in range(4):
            pre = f"metric_head.patch_transformer.transformer_encoder.{i}"
            pt[f"l{i}_q"] = _lin(sd, f"{pre}.self_attn.query")
            pt[f"l{i}_k"] = _lin(sd, f"{pre}.self_attn.key")
            pt[f"l{i}_v"] = _lin(sd, f"{pre}.self_attn.value")
            pt[f"l{i}_out"] = _lin(sd, f"{pre}.self_attn.out_proj")
            pt[f"l{i}_ln1"] = _ln(sd, f"{pre}.norm1")
            pt[f"l{i}_fc1"] = _lin(sd, f"{pre}.linear1")
            pt[f"l{i}_fc2"] = _lin(sd, f"{pre}.linear2")
            pt[f"l{i}_ln2"] = _ln(sd, f"{pre}.norm2")
        mh["patch_transformer"] = pt
        mh["mlp_classifier1"] = _lin(sd, "metric_head.mlp_classifier.linear1")
        mh["mlp_classifier2"] = _lin(sd, "metric_head.mlp_classifier.linear2")
        mh["seed_projector"] = _projector("metric_head.seed_projector")
        for i in range(4):
            mh[f"projector{i}"] = _projector(f"metric_head.projectors.{i}")
        for (name, n_bins, mn, mx) in cfg.bin_configurations:
            mh[f"seed_bin_regressor_{name}"] = {
                "conv1": _conv(sd, f"metric_head.seed_bin_regressors.{name}.conv1"),
                "conv2": _conv(sd, f"metric_head.seed_bin_regressors.{name}.conv2"),
            }
            for i in range(4):
                mh[f"attractor{i}_{name}"] = {
                    "conv1": _conv(sd, f"metric_head.attractors.{name}.{i}.conv1"),
                    "conv2": _conv(sd, f"metric_head.attractors.{name}.{i}.conv2"),
                }
            mh[f"conditional_log_binomial_{name}"] = _clb(
                f"metric_head.conditional_log_binomial.{name}"
            )
    else:
        mh["seed_bin_regressor"] = {
            "conv1": _conv(sd, "metric_head.seed_bin_regressor.conv1"),
            "conv2": _conv(sd, "metric_head.seed_bin_regressor.conv2"),
        }
        mh["seed_projector"] = _projector("metric_head.seed_projector")
        for i in range(4):
            mh[f"projector{i}"] = _projector(f"metric_head.projectors.{i}")
            mh[f"attractor{i}"] = {
                "conv1": _conv(sd, f"metric_head.attractors.{i}.conv1"),
                "conv2": _conv(sd, f"metric_head.attractors.{i}.conv2"),
            }
        mh["conditional_log_binomial"] = _clb("metric_head.conditional_log_binomial")
    p["metric_head"] = mh
    return p
