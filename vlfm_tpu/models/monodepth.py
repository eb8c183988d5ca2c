"""Monocular metric depth interface (the ZoeDepth role).

Parity target: vlfm/policy/reality_policies.py:40-42,156-169 — on the real
robot the gripper camera has RGB only; an all-ones depth image triggers
``_infer_depth`` which runs monocular depth estimation and normalizes to the
[min_depth, max_depth] mapping range (base_objectnav_policy.py:314-318).

The PRODUCTION model is ``vlfm_tpu.models.zoedepth.ZoeDepth`` (faithful
BEiT + DPT + metric-bins ZoeDepth port with an HF checkpoint converter).
This module defines the ``infer_depth`` contract and a tests-only factory
that returns a tiny-config ZoeDepth — the same architecture at toy size, so
weightless tests exercise the production code path end-to-end (the earlier
placeholder conv U-net is gone).
"""

from __future__ import annotations

from typing import Protocol

import jax.numpy as jnp


class MonocularDepthModel(Protocol):
    """(B, H, W, 3) uint8 -> (B, H, W) depth normalized to [0, 1] over the
    (min_depth, max_depth) mapping convention (reality_policies.py:156-169)."""

    def infer_depth(
        self, rgb_uint8: jnp.ndarray, min_depth: float, max_depth: float
    ) -> jnp.ndarray: ...


class MonocularDepth:
    """Tests-only factory: a tiny-config ZoeDepth satisfying the contract."""

    @classmethod
    def init_random(cls, seed: int = 0) -> MonocularDepthModel:
        from vlfm_tpu.models.zoedepth import ZoeDepth

        return ZoeDepth.init_random(seed=seed)
