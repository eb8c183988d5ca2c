"""Detect -> route -> segment: the object-perception pipeline per frame.

Parity target: BaseObjectNavPolicy._get_object_detections +
_update_object_map's per-box SAM calls (base_objectnav_policy.py:221-241,
311-321):

- targets that are COCO classes use the COCO detector path at
  ``coco_threshold`` (0.8); other targets use the open-vocabulary path at
  ``non_coco_threshold`` (0.4); a COCO-class miss retries open-vocab.
  Here both paths are the same OWL-ViT program with different query sets and
  thresholds — the routing semantics are preserved, the second HTTP server
  is not needed.
- every surviving box is segmented; the reference loops one HTTP SAM call
  per box, here all boxes of all images decode in one batched SAM call
  (the image is encoded once).

Outputs fixed-capacity (B, K, H, W) masks + validity for the policy step.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vlfm_tpu.models.coco_classes import is_coco_target
from vlfm_tpu.models.owl_vit import OwlViTDetector, top_detections
from vlfm_tpu.models.sam import SAM


@dataclass
class DetectionPipeline:
    detector: OwlViTDetector
    sam: SAM
    encode_queries: callable  # List[str] -> (ids (T, L) int32, mask (T, L) bool)
    coco_threshold: float = 0.8
    non_coco_threshold: float = 0.4
    max_detections: int = 8

    def __post_init__(self):
        self._query_cache: Dict[str, Tuple[jnp.ndarray, jnp.ndarray]] = {}

    def _queries(self, target: str):
        if target not in self._query_cache:
            names = target.split("|")
            ids, mask = self.encode_queries(names)
            self._query_cache[target] = (jnp.asarray(ids), jnp.asarray(mask))
        return self._query_cache[target]

    def __call__(self, rgb: jnp.ndarray, target: str):
        """(B, H, W, 3) uint8 -> (masks (B, K, H, W) bool, valid (B, K))."""
        b, h, w = rgb.shape[:3]
        ids, qmask = self._queries(target)
        thresh = self.coco_threshold if is_coco_target(target) else self.non_coco_threshold

        imgs = self.detector.preprocess(rgb)
        boxes, logits = self.detector.detect(imgs, ids, qmask)
        xyxy, scores, cls, valid = top_detections(
            boxes, logits, capacity=self.max_detections, threshold=thresh
        )
        if is_coco_target(target) and not bool(valid.any()):
            # COCO miss -> open-vocab retry at the lower threshold
            # (base_objectnav_policy.py:235-239)
            valid = scores >= self.non_coco_threshold

        sam_imgs = jax.image.resize(
            rgb.astype(jnp.float32),
            (b, self.sam.cfg.vision.image_size, self.sam.cfg.vision.image_size, 3),
            method="linear",
        )
        masks_lr, _ = self.sam.segment_boxes(sam_imgs, xyxy)  # (B, K, 4G, 4G)
        masks = jax.image.resize(
            masks_lr.astype(jnp.float32),
            (b, self.max_detections, h, w),
            method="linear",
        ) > 0.5
        masks = masks & valid[:, :, None, None]
        return masks, valid, (xyxy, scores, cls)
