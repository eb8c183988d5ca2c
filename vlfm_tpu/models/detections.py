"""Canonical detection container (fixed capacity, mask-based).

Parity target: vlfm/vlm/detections.py (ObjectDetections): normalized xyxy
boxes + logits + phrases with in-place class/confidence filtering and JSON
round-trip. TPU design: boxes/scores live in fixed-capacity arrays with a
validity mask so detection post-processing can stay inside jit; phrases are
class IDS into a host-side vocabulary (strings never enter the device).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, NamedTuple, Sequence

import jax.numpy as jnp
import numpy as np


class Detections(NamedTuple):
    boxes: jnp.ndarray  # (K, 4) normalized cx-free xyxy in [0, 1]
    scores: jnp.ndarray  # (K,)
    class_ids: jnp.ndarray  # (K,) int32 into a host-side class list
    valid: jnp.ndarray  # (K,)


def empty(capacity: int) -> Detections:
    return Detections(
        boxes=jnp.zeros((capacity, 4)),
        scores=jnp.zeros(capacity),
        class_ids=jnp.full(capacity, -1, jnp.int32),
        valid=jnp.zeros(capacity, bool),
    )


def filter_by_class(d: Detections, keep_ids: jnp.ndarray) -> Detections:
    """Keep detections whose class id is in ``keep_ids`` (padded with -1).

    Mirrors ObjectDetections.filter_by_class (detections.py:64-77).
    """
    m = (d.class_ids[:, None] == keep_ids[None, :]).any(axis=1)
    return d._replace(valid=d.valid & m)


def filter_by_conf(d: Detections, threshold: float) -> Detections:
    """Mirrors ObjectDetections.filter_by_conf (detections.py:79-91)."""
    return d._replace(valid=d.valid & (d.scores >= threshold))


def num_detections(d: Detections) -> jnp.ndarray:
    return d.valid.sum()


def denormalize_boxes(d: Detections, width: int, height: int) -> jnp.ndarray:
    scale = jnp.array([width, height, width, height], d.boxes.dtype)
    return d.boxes * scale


# --- host-side conveniences -------------------------------------------------
@dataclass
class DetectionVocab:
    """String class names for a Detections batch (host side)."""

    classes: List[str] = field(default_factory=list)

    def ids_for(self, names: Sequence[str]) -> np.ndarray:
        return np.array(
            [self.classes.index(n) if n in self.classes else -1 for n in names],
            np.int32,
        )

    def phrases(self, d: Detections) -> List[str]:
        ids = np.asarray(d.class_ids)
        v = np.asarray(d.valid)
        return [self.classes[i] if v[k] and 0 <= i < len(self.classes) else "" for k, i in enumerate(ids)]


def to_json(d: Detections, vocab: DetectionVocab) -> dict:
    """JSON round-trip matching the reference's wire format
    (detections.py:93-126): normalized boxes, logits, phrases."""
    v = np.asarray(d.valid)
    return {
        "boxes": np.asarray(d.boxes)[v].tolist(),
        "logits": np.asarray(d.scores)[v].tolist(),
        "phrases": [p for p, ok in zip(vocab.phrases(d), v) if ok],
    }


def from_json(payload: dict, vocab: DetectionVocab, capacity: int) -> Detections:
    n = min(len(payload["boxes"]), capacity)
    boxes = np.zeros((capacity, 4), np.float32)
    scores = np.zeros(capacity, np.float32)
    ids = np.full(capacity, -1, np.int32)
    valid = np.zeros(capacity, bool)
    if n:
        boxes[:n] = np.asarray(payload["boxes"], np.float32)[:n]
        scores[:n] = np.asarray(payload["logits"], np.float32)[:n]
        ids[:n] = vocab.ids_for(payload["phrases"][:n])
        valid[:n] = True
    return Detections(jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(ids), jnp.asarray(valid))
