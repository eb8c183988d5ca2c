"""Monocular metric depth estimation (the ZoeDepth role).

Parity target: vlfm/policy/reality_policies.py:40-42,156-169 — on the real
robot the gripper camera has RGB only; an all-ones depth image triggers
``_infer_depth`` which runs monocular depth estimation and normalizes to the
[min_depth, max_depth] mapping range (base_objectnav_policy.py:314-318).

This module defines the ``infer_depth`` interface plus a compact
convolutional encoder-decoder — a lightweight fallback for weightless runs.
The PRODUCTION model is ``vlfm_tpu.models.zoedepth.ZoeDepth`` (faithful
BEiT + DPT + metric-bins ZoeDepth port with an HF checkpoint converter),
which implements the same ``infer_depth`` contract and drops in anywhere
this class is accepted.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class MonoDepthConfig:
    base_channels: int = 32
    levels: int = 4
    max_depth_m: float = 10.0


class ConvBlock(nn.Module):
    ch: int
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.ch, (3, 3), strides=self.stride, padding=1, name="conv")(x)
        x = nn.GroupNorm(num_groups=min(8, self.ch), name="gn")(x)
        return nn.relu(x)


class MonoDepthNet(nn.Module):
    cfg: MonoDepthConfig

    @nn.compact
    def __call__(self, rgb01):  # (B, H, W, 3) in [0, 1]
        c = self.cfg
        skips = []
        x = rgb01
        for lv in range(c.levels):
            ch = c.base_channels * (2**lv)
            x = ConvBlock(ch, stride=2, name=f"down{lv}_a")(x)
            x = ConvBlock(ch, name=f"down{lv}_b")(x)
            skips.append(x)
        for lv in reversed(range(c.levels - 1)):
            ch = c.base_channels * (2**lv)
            x = jax.image.resize(x, (*skips[lv].shape[:3], x.shape[-1]), "linear")
            x = jnp.concatenate([x, skips[lv]], axis=-1)
            x = ConvBlock(ch, name=f"up{lv}")(x)
        x = jax.image.resize(x, (*rgb01.shape[:3], x.shape[-1]), "linear")
        d = nn.Conv(1, (3, 3), padding=1, name="head")(x)
        return jax.nn.sigmoid(d[..., 0]) * c.max_depth_m  # metric depth


class MonocularDepth:
    def __init__(self, cfg: MonoDepthConfig, params: Dict[str, Any]):
        self.cfg = cfg
        self.module = MonoDepthNet(cfg)
        self.params = params

    @classmethod
    def init_random(cls, cfg: MonoDepthConfig = MonoDepthConfig(), seed: int = 0):
        mod = MonoDepthNet(cfg)
        params = mod.init(jax.random.PRNGKey(seed), jnp.zeros((1, 64, 64, 3)))["params"]
        return cls(cfg, params)

    @staticmethod
    @partial(jax.jit, static_argnames=("module",))
    def _run(module, params, rgb01):
        return module.apply({"params": params}, rgb01)

    def infer_depth(self, rgb_uint8, min_depth: float, max_depth: float):
        """(B, H, W, 3) uint8 -> (B, H, W) normalized depth in [0, 1]
        matching the mapping stack's (min_depth, max_depth) convention
        (reality_policies.py:156-169)."""
        metric = self._run(self.module, self.params, rgb_uint8.astype(jnp.float32) / 255.0)
        return jnp.clip((metric - min_depth) / (max_depth - min_depth), 0.0, 1.0)
