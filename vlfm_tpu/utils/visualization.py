"""Host-side rendering utilities (numpy/cv2 — visualization never runs on
device).

Parity targets: vlfm/utils/visualization.py (text banners, image padding),
vlfm/mapping/traj_visualizer.py (trajectory polylines + agent marker),
ValueMap.visualize / ObstacleMap.visualize (map renderers), and the
HabitatVis frame compositor (vlfm/utils/habitat_visualizer.py:139-192).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import cv2
import numpy as np

from vlfm_tpu.mapping.grid import GridSpec2D


# --- text / layout ----------------------------------------------------------
def text_banner(text: str, width: int, font_scale: float = 0.6) -> np.ndarray:
    """White banner with word-wrapped black text (visualization.py:31-95)."""
    font = cv2.FONT_HERSHEY_SIMPLEX
    words = text.split()
    lines: List[str] = []
    cur = ""
    for w in words:
        trial = (cur + " " + w).strip()
        (tw, _), _ = cv2.getTextSize(trial, font, font_scale, 1)
        if tw > width - 20 and cur:
            lines.append(cur)
            cur = w
        else:
            cur = trial
    if cur:
        lines.append(cur)
    line_h = int(30 * font_scale / 0.6)
    img = np.full((line_h * max(len(lines), 1) + 10, width, 3), 255, np.uint8)
    for i, line in enumerate(lines):
        cv2.putText(img, line, (10, (i + 1) * line_h), font, font_scale, (0, 0, 0), 1, cv2.LINE_AA)
    return img


def add_text_to_image(img: np.ndarray, text: str, top: bool = True) -> np.ndarray:
    banner = text_banner(text, img.shape[1])
    return np.vstack([banner, img] if top else [img, banner])


def pad_images_to_match(images: Sequence[np.ndarray], axis: int = 0) -> List[np.ndarray]:
    """Pad with white so all images share the non-stack dimension."""
    other = 1 - axis
    target = max(im.shape[other] for im in images)
    out = []
    for im in images:
        pad = target - im.shape[other]
        before, after = pad // 2, pad - pad // 2
        widths = [(0, 0), (0, 0), (0, 0)]
        widths[other] = (before, after)
        out.append(np.pad(im, widths, constant_values=255))
    return out


# --- trajectory -------------------------------------------------------------
class TrajectoryVisualizer:
    """Incremental path polyline + agent marker (traj_visualizer.py:9-114)."""

    def __init__(self, spec: GridSpec2D, path_color=(0, 255, 0), path_thickness: int = 3):
        self.spec = spec
        self.path_color = path_color
        self.path_thickness = path_thickness

    def _px(self, xy: np.ndarray) -> Tuple[int, int]:
        r = int(round(xy[0] * self.spec.pixels_per_meter)) + self.spec.origin
        c = self.spec.origin - int(round(xy[1] * self.spec.pixels_per_meter))
        return c, r  # cv2 point order (x=col, y=row)

    def draw_trajectory(self, img: np.ndarray, positions: Sequence[np.ndarray], yaw: float) -> np.ndarray:
        pts = [self._px(np.asarray(p)) for p in positions]
        for a, b in zip(pts[:-1], pts[1:]):
            cv2.line(img, a, b, self.path_color, self.path_thickness)
        if pts:
            self.draw_agent(img, np.asarray(positions[-1]), yaw)
        return img

    def draw_agent(self, img: np.ndarray, xy: np.ndarray, yaw: float, radius: int = 6) -> np.ndarray:
        c = self._px(xy)
        cv2.circle(img, c, radius, (255, 192, 15), -1)
        tip = (
            int(c[0] - radius * 2 * np.sin(yaw)),
            int(c[1] + radius * 2 * np.cos(yaw)),
        )
        cv2.line(img, c, tip, (0, 0, 255), 2)
        return img

    def draw_circle(self, img: np.ndarray, xy: np.ndarray, radius: int = 5, color=(0, 0, 255), thickness: int = 2) -> np.ndarray:
        cv2.circle(img, self._px(np.asarray(xy)), radius, color, thickness)
        return img


def rotate_image(img: np.ndarray, yaw_rad: float, border_value=(255, 255, 255)) -> np.ndarray:
    """Rotate about the image center, padding with ``border_value`` — the
    img_utils.rotate_image role used for start-yaw map reorientation
    (habitat_visualizer.py:122-137)."""
    h, w = img.shape[:2]
    m = cv2.getRotationMatrix2D((w / 2, h / 2), float(np.rad2deg(yaw_rad)), 1.0)
    return cv2.warpAffine(img, m, (w, h), borderValue=border_value)


def paint_target_cloud(
    img: np.ndarray,
    spec: GridSpec2D,
    points_xy: np.ndarray,  # (N, 2) episodic meters
    downsample: int = 1,
    color=(255, 0, 255),
) -> np.ndarray:
    """Paint the detected-object point cloud's footprint onto a rendered map —
    the color_point_cloud_on_map role (habitat_visualizer.py:228-253; the
    reference paints MAP_TARGET_POINT_INDICATOR pixels onto the habitat
    top-down map)."""
    pts = np.asarray(points_xy, np.float64).reshape(-1, 2)
    if len(pts) == 0:
        return img
    rows = np.rint(pts[:, 0] * spec.pixels_per_meter).astype(int) + spec.origin
    cols = spec.origin - np.rint(pts[:, 1] * spec.pixels_per_meter).astype(int)
    rows //= downsample
    cols //= downsample
    keep = (rows >= 0) & (rows < img.shape[0]) & (cols >= 0) & (cols < img.shape[1])
    img[rows[keep], cols[keep]] = color
    return img


# --- map renderers ------------------------------------------------------------
def render_value_map(
    values: np.ndarray,  # (H, W) reduced value channel
    spec: GridSpec2D,
    traj: Optional[TrajectoryVisualizer] = None,
    positions: Sequence[np.ndarray] = (),
    yaw: float = 0.0,
    markers: Sequence[Tuple[np.ndarray, Dict]] = (),
) -> np.ndarray:
    """Inferno colormap with unseen cells white (value_map.py:189-219)."""
    img = values.copy()
    zero = img == 0
    peak = img.max() if img.max() > 0 else 1.0
    img = (img / peak * 255).astype(np.uint8)
    out = cv2.applyColorMap(img, cv2.COLORMAP_INFERNO)
    out[zero] = (255, 255, 255)
    if traj and len(positions):
        traj.draw_trajectory(out, positions, yaw)
    for pos, kw in markers:
        (traj or TrajectoryVisualizer(spec)).draw_circle(out, pos, **kw)
    return out


def render_obstacle_map(
    obstacles: np.ndarray,
    navigable: np.ndarray,
    explored: np.ndarray,
    frontiers_px: np.ndarray = (),
    traj: Optional[TrajectoryVisualizer] = None,
    positions: Sequence[np.ndarray] = (),
    yaw: float = 0.0,
) -> np.ndarray:
    """Explored green, padding gray, obstacles black, frontiers blue circles
    (obstacle_map.py:171-193)."""
    h, w = obstacles.shape
    out = np.full((h, w, 3), 255, np.uint8)
    out[explored] = (200, 255, 200)
    out[~navigable] = (100, 100, 100)
    out[obstacles] = (0, 0, 0)
    for f in np.asarray(frontiers_px).reshape(-1, 2):
        cv2.circle(out, (int(f[1]), int(f[0])), 5, (200, 0, 0), 2)
    if traj and len(positions):
        traj.draw_trajectory(out, positions, yaw)
    return out


def compose_frame(
    rgb: np.ndarray,
    depth: np.ndarray,
    maps: Sequence[np.ndarray],
    texts: Sequence[str] = (),
) -> np.ndarray:
    """Egocentric column | map grid layout (habitat_visualizer.py:139-192)."""
    if depth.ndim == 2:
        depth = cv2.cvtColor((depth * 255).astype(np.uint8), cv2.COLOR_GRAY2BGR)
    left = np.vstack(pad_images_to_match([rgb, depth], axis=0))
    sized = [cv2.resize(m, (left.shape[1], left.shape[1])) for m in maps]
    right = np.vstack(sized) if sized else np.full_like(left, 255)
    lh, rh = left.shape[0], right.shape[0]
    if lh < rh:
        left = np.pad(left, ((0, rh - lh), (0, 0), (0, 0)), constant_values=255)
    elif rh < lh:
        right = np.pad(right, ((0, lh - rh), (0, 0), (0, 0)), constant_values=255)
    frame = np.hstack([left, right])
    for t in texts:
        frame = add_text_to_image(frame, t, top=False)
    return frame
