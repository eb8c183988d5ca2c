"""COCO-classes detection path (the YOLOv7 role).

Parity target: vlfm/vlm/yolov7.py + the routing in
base_objectnav_policy.py:221-241 — targets that are COCO classes are
detected with a dedicated COCO detector at the high confidence threshold
(0.8), because a closed-vocabulary detector is more precise on its 80
classes than the open-vocabulary one.

TPU-native stance: a separate conv detector process buys nothing on TPU —
the same batched open-vocab program queried with the FIXED 80-class COCO
prompt set plays the closed-vocabulary role (queries are encoded once and
cached forever), keeping the reference's routing and threshold semantics
bit-for-bit at the policy level. A dedicated one-stage conv detector can be
slotted behind the same interface later if closed-set accuracy on TPU ever
becomes the bottleneck.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional, Tuple

import jax.numpy as jnp

from vlfm_tpu.models.coco_classes import COCO_CLASSES
from vlfm_tpu.models.owl_vit import OwlViTDetector, top_detections


@dataclass
class CocoDetector:
    """Closed-vocabulary detector over the 80 COCO classes."""

    detector: OwlViTDetector
    encode_queries: Callable  # List[str] -> (ids, mask)
    conf_threshold: float = 0.8  # reference coco_threshold
    max_detections: int = 8

    def __post_init__(self):
        self._queries: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None

    def _coco_queries(self):
        if self._queries is None:
            ids, mask = self.encode_queries(COCO_CLASSES)
            self._queries = (jnp.asarray(ids), jnp.asarray(mask))
        return self._queries

    def predict(self, rgb_uint8: jnp.ndarray):
        """(B, H, W, 3) -> (xyxy, scores, class_ids into COCO_CLASSES, valid)."""
        ids, mask = self._coco_queries()
        imgs = self.detector.preprocess(rgb_uint8)
        boxes, logits = self.detector.detect(imgs, ids, mask)
        return top_detections(
            boxes, logits, capacity=self.max_detections, threshold=self.conf_threshold
        )

    @staticmethod
    def class_name(class_id: int) -> str:
        return COCO_CLASSES[int(class_id)]
