"""Batched perception engine — the in-process replacement for the
reference's four HTTP model servers.

Reference behaviour being replaced (vlfm/vlm/server_wrapper.py:24-164 and
scripts/launch_vlm_servers.sh): one Flask process per model, one request per
(image, prompt) pair, JPEG-q90 base64 transport, a client-side lockfile
mutex serializing every caller — effective batch size 1.

Here: all models live in the driver process as jitted functions; each
decision step makes ONE batched call per model family over the whole episode
batch. Per-episode prompt text features are encoded once at episode start
and cached (the reference re-sends the prompt text every step).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Dict, List, Optional

import jax.numpy as jnp
import numpy as np

from vlfm_tpu.models.blip2_itm import BLIP2ITM
from vlfm_tpu.models.tokenizer import WordPieceTokenizer

PROMPT_SEPARATOR = "|"


@dataclass
class PerceptionOutputs:
    cosines: np.ndarray  # (B, C)
    det_masks: np.ndarray  # (B, K, H, W) bool
    det_valid: np.ndarray  # (B, K) bool


class PerceptionEngine:
    """Scores ITM prompts and produces detection masks for an episode batch.

    ``itm`` may be None (synthetic/ground-truth scoring provided by the
    environment, used in tests and the no-weights demo). ``detector_fn`` is
    any callable (B, H, W, 3) uint8 -> (masks, valid); the GroundingDINO +
    MobileSAM and YOLOv7 stacks plug in here.
    """

    def __init__(
        self,
        itm: Optional[BLIP2ITM] = None,
        tokenizer: Optional[WordPieceTokenizer] = None,
        detector_fn: Optional[Callable] = None,
        text_prompt: str = "Seems like there is a target_object ahead.",
    ):
        self.itm = itm
        self.tokenizer = tokenizer
        self.detector_fn = detector_fn
        self.text_prompt = text_prompt
        self._text_feat_cache: Dict[str, jnp.ndarray] = {}

    def prompts_for_target(self, target: str) -> List[str]:
        # itm_policy.py:195-201 — substitute and split on '|'
        return [
            p.replace("target_object", target.replace("|", "/"))
            for p in self.text_prompt.split(PROMPT_SEPARATOR)
        ]

    def text_features(self, target: str) -> jnp.ndarray:
        """(C, E) cached per-episode prompt features."""
        assert self.itm is not None and self.tokenizer is not None
        if target not in self._text_feat_cache:
            ids, mask = self.tokenizer.encode_batch(self.prompts_for_target(target))
            self._text_feat_cache[target] = self.itm.encode_texts(
                jnp.asarray(ids), jnp.asarray(mask)
            )
        return self._text_feat_cache[target]

    def score(self, rgb: jnp.ndarray, target: str) -> jnp.ndarray:
        """(B, H, W, 3) uint8 -> (B, C) ITM cosines, one jitted call."""
        assert self.itm is not None
        feats = self.text_features(target)
        imgs = self.itm.preprocess(rgb)
        return self.itm.cosine_cached_text(imgs, feats)

    def detect(self, rgb: jnp.ndarray):
        assert self.detector_fn is not None
        return self.detector_fn(rgb)
