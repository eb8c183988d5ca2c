"""Independent NumPy/OpenCV oracles for golden-testing the TPU kernels.

These re-derive the *behaviour* of the reference algorithms (cited per
function) in plain NumPy so the JAX kernels can be checked against a second,
independent implementation. They are test-only code.
"""

from __future__ import annotations

import cv2
import numpy as np

MIN_CONF = 0.25
DECISION_THRESHOLD = 0.35


def oracle_confidence_cone(fov: float, max_depth: float, pps: int) -> np.ndarray:
    """Rasterized cos^2 confidence cone, camera at centre pointing down-rows.

    Behaviour of value_map.py:321-355 (ellipse sector * per-pixel falloff).
    """
    size = int(max_depth * pps)
    n = 2 * size + 1
    mask = np.zeros((n, n))
    mask = cv2.ellipse(
        mask,
        (size, size),
        (size, size),
        0,
        -np.rad2deg(fov) / 2 + 90,
        np.rad2deg(fov) / 2 + 90,
        1,
        -1,
    )
    rr, cc = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    along = np.abs(rr - n // 2)
    lateral = np.abs(cc - n // 2)
    ang = np.arctan2(lateral, along)
    ang = ang * (np.pi / 2) / (fov / 2)
    conf = np.cos(ang) ** 2 * (1 - MIN_CONF) + MIN_CONF
    return (conf * mask).astype(np.float32)


def oracle_visible_mask(
    depth: np.ndarray, fov: float, min_depth: float, max_depth: float, pps: int
) -> np.ndarray:
    """Confidence cone with the beyond-depth region carved out.

    Behaviour of value_map.py:221-286 (contour fill with cv2).
    """
    cone = oracle_confidence_cone(fov, max_depth, pps)
    depth_row = np.max(depth, axis=0) * (max_depth - min_depth) + min_depth
    angles = np.linspace(-fov / 2, fov / 2, len(depth_row))
    x = (depth_row * pps + cone.shape[0] / 2).astype(int)
    y = (depth_row * np.tan(angles) * pps + cone.shape[1] / 2).astype(int)
    last = cone.shape[0] - 1
    contour = np.concatenate(
        ([[0, last]], np.stack((y, x), axis=1), [[last, last]]), axis=0
    )
    return cv2.drawContours(cone, [contour], -1, 0, -1)


def oracle_fuse(
    conf: np.ndarray,
    values: np.ndarray,
    new_conf: np.ndarray,
    new_values: np.ndarray,
    use_max_confidence: bool,
):
    """Behaviour of value_map.py:357-429 (default fusion)."""
    conf = conf.copy()
    values = values.copy()
    new_conf = new_conf.copy()
    silence = (new_conf < DECISION_THRESHOLD) & (new_conf < conf)
    new_conf[silence] = 0
    if use_max_confidence:
        hi = new_conf > conf
        values[hi] = new_values
        conf[hi] = new_conf[hi]
    else:
        denom = conf + new_conf
        with np.errstate(invalid="ignore", divide="ignore"):
            w1 = conf / denom
            w2 = new_conf / denom
        values = values * w1[..., None] + new_values[None, None, :] * w2[..., None]
        conf = conf * w1 + new_conf * w2
        values = np.nan_to_num(values)
        conf = np.nan_to_num(conf)
    return conf, values


def oracle_pixel_value_within_radius(image: np.ndarray, rc, radius: int) -> float:
    """Behaviour of img_utils.pixel_value_within_radius:213-266 (median)."""
    r0 = max(0, rc[0] - radius)
    c0 = max(0, rc[1] - radius)
    r1 = min(image.shape[0], rc[0] + radius + 1)
    c1 = min(image.shape[1], rc[1] + radius + 1)
    crop = image[r0:r1, c0:c1]
    mask = np.zeros(crop.shape[:2], np.uint8)
    mask = cv2.circle(mask, (radius, radius), radius, 255, -1)
    vals = crop[mask > 0]
    vals = vals[vals > 0]
    if vals.size == 0:
        return -1.0
    return float(np.median(vals))
