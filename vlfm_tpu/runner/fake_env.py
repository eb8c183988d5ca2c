"""Synthetic ObjectNav environment (the test double for Habitat / Spot).

Plays the role of the reference's FakeRobot (reality/robots/base_robot.py:83-122)
but as a full episode environment: a 2D floor plan of wall segments plus a
cylindrical target object, ray-cast depth rendering, discrete ObjectNav
actions, and ground-truth-driven synthetic perception (ITM scores + target
segmentation masks) so the whole policy stack runs closed-loop without
Habitat, torch, or model weights.

Episode workload parameters follow the reference envelope (BASELINE.md):
640x480 RGBD, HFOV 79 deg, depth 0.5-5.0 m, forward 0.25 m, turn 30 deg,
max 500 steps.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import List, Optional, Tuple

import numpy as np

STOP, MOVE_FORWARD, TURN_LEFT, TURN_RIGHT = 0, 1, 2, 3


@dataclass
class FloorPlan:
    """Axis-aligned world made of wall segments (x0, y0, x1, y1)."""

    walls: List[Tuple[float, float, float, float]]
    target: Tuple[float, float]
    target_radius: float = 0.3
    start: Tuple[float, float] = (0.0, 0.0)
    start_yaw: float = 0.0


def two_room_plan(seed: int = 0) -> FloorPlan:
    """An 8x16 m two-room apartment with a connecting door; target in the
    far room so the agent must explore through the door."""
    rng = np.random.default_rng(seed)
    door_y = float(rng.uniform(-2.0, 2.0))
    walls = [
        (-4.0, -4.0, -4.0, 4.0),
        (-4.0, 4.0, 12.0, 4.0),
        (12.0, 4.0, 12.0, -4.0),
        (12.0, -4.0, -4.0, -4.0),
        # dividing wall at x=4 with a 1.6 m door centred at door_y
        (4.0, -4.0, 4.0, door_y - 0.8),
        (4.0, door_y + 0.8, 4.0, 4.0),
    ]
    tx = float(rng.uniform(7.0, 11.0))
    ty = float(rng.uniform(-3.0, 3.0))
    return FloorPlan(walls=walls, target=(tx, ty), start=(0.0, 0.0), start_yaw=0.0)


def open_room_plan(seed: int = 0) -> FloorPlan:
    rng = np.random.default_rng(seed)
    walls = [
        (-5.0, -5.0, -5.0, 5.0),
        (-5.0, 5.0, 5.0, 5.0),
        (5.0, 5.0, 5.0, -5.0),
        (5.0, -5.0, -5.0, -5.0),
    ]
    ang = rng.uniform(0, 2 * np.pi)
    r = rng.uniform(2.5, 4.0)
    return FloorPlan(
        walls=walls, target=(float(r * np.cos(ang)), float(r * np.sin(ang)))
    )


@dataclass
class EnvConfig:
    width: int = 640
    height: int = 480
    hfov_deg: float = 79.0
    min_depth: float = 0.5
    max_depth: float = 5.0
    camera_height: float = 0.88
    forward_step: float = 0.25
    turn_deg: float = 30.0
    max_steps: int = 500
    success_radius: float = 1.0  # ObjectNav-style "near the object" success


class FakeObjectNavEnv:
    """gym-like reset/step matching the reality adapters' shape
    (reality/pointnav_env.py:17, reality/objectnav_env.py:42)."""

    def __init__(self, plan: FloorPlan, cfg: Optional[EnvConfig] = None):
        self.plan = plan
        self.cfg = cfg or EnvConfig()
        self._phi = np.linspace(
            -math.radians(self.cfg.hfov_deg) / 2,
            math.radians(self.cfg.hfov_deg) / 2,
            self.cfg.width,
        )
        self.reset()

    # --- simulation ---------------------------------------------------------
    def reset(self):
        self.x, self.y = self.plan.start
        self.yaw = self.plan.start_yaw
        self.steps = 0
        self.done = False
        self.called_stop = False
        self.path_length = 0.0
        self.collisions = 0
        return self._observe()

    def step(self, action: int):
        assert not self.done
        c = self.cfg
        if action == STOP:
            self.called_stop = True
            self.done = True
        elif action == MOVE_FORWARD:
            nx = self.x + c.forward_step * math.cos(self.yaw)
            ny = self.y + c.forward_step * math.sin(self.yaw)
            if self._segment_clear(self.x, self.y, nx, ny, clearance=0.18):
                self.path_length += math.hypot(nx - self.x, ny - self.y)
                self.x, self.y = nx, ny
            else:
                self.collisions += 1
        elif action == TURN_LEFT:
            self.yaw += math.radians(c.turn_deg)
        elif action == TURN_RIGHT:
            self.yaw -= math.radians(c.turn_deg)
        self.steps += 1
        if self.steps >= c.max_steps:
            self.done = True
        return self._observe()

    def _ray(self, ox, oy, bearings):
        """Vectorized first-hit distance against walls + target cylinder."""
        dx, dy = np.cos(bearings), np.sin(bearings)
        t_best = np.full_like(bearings, np.inf)
        hit_target = np.zeros_like(bearings, dtype=bool)
        for (x0, y0, x1, y1) in self.plan.walls:
            ex, ey = x1 - x0, y1 - y0
            den = dx * ey - dy * ex
            with np.errstate(divide="ignore", invalid="ignore"):
                t = ((x0 - ox) * ey - (y0 - oy) * ex) / den
                u = ((x0 - ox) * dy - (y0 - oy) * dx) / den
            ok = (den != 0) & (t > 1e-6) & (u >= 0) & (u <= 1)
            closer = ok & (t < t_best)
            t_best = np.where(closer, t, t_best)
            hit_target = np.where(closer, False, hit_target)
        # target cylinder
        tx, ty = self.plan.target
        r = self.plan.target_radius
        fx, fy = tx - ox, ty - oy
        b = fx * dx + fy * dy
        c2 = fx * fx + fy * fy - r * r
        disc = b * b - c2
        with np.errstate(invalid="ignore"):
            t = b - np.sqrt(np.maximum(disc, 0.0))
        ok = (disc > 0) & (t > 1e-6)
        closer = ok & (t < t_best)
        t_best = np.where(closer, t, t_best)
        hit_target = np.where(closer, True, hit_target)
        return t_best, hit_target

    def _segment_clear(self, x0, y0, x1, y1, clearance=0.0) -> bool:
        d = math.hypot(x1 - x0, y1 - y0)
        if d == 0:
            return True
        bearing = np.array([math.atan2(y1 - y0, x1 - x0)])
        t, _ = self._ray(x0, y0, bearing)
        return bool(t[0] > d + clearance)

    # --- observation --------------------------------------------------------
    def _observe(self):
        c = self.cfg
        bearings = self.yaw - self._phi
        t, hit_target = self._ray(self.x, self.y, bearings)
        z = t * np.cos(self._phi)  # z-depth per column
        z_cl = np.clip(z, c.min_depth, c.max_depth)
        norm = (z_cl - c.min_depth) / (c.max_depth - c.min_depth)
        norm = np.where(np.isinf(t), 1.0, norm)
        depth = np.repeat(norm[None, :].astype(np.float32), c.height, axis=0)

        # target mask: columns whose nearest hit is the cylinder, rows spanning
        # the object's apparent height (0 .. 1 m tall at the hit distance)
        fy = c.width / (2 * math.tan(math.radians(c.hfov_deg) / 2))
        mask = np.zeros((c.height, c.width), bool)
        cols = np.nonzero(hit_target & (t < c.max_depth))[0]
        if len(cols):
            d = np.maximum(z[cols], 1e-3)
            v_top = (c.height // 2 + (c.camera_height - 1.0) * fy / d).astype(int)
            v_bot = (c.height // 2 + c.camera_height * fy / d).astype(int)
            for col, vt, vb in zip(cols, v_top, v_bot):
                mask[max(0, vt) : min(c.height, vb + 1), col] = True

        target_visible = bool(mask.any())
        # synthetic RGB: shaded walls from depth, the target painted red —
        # enough signal for the real perception stack to run end-to-end
        gray = ((1.0 - norm) * 200 + 30).astype(np.uint8)
        rgb = np.repeat(
            np.repeat(gray[None, :, None], c.height, axis=0), 3, axis=2
        )
        rgb[mask] = (220, 40, 40)

        # distance to the object's surface, not its centre (habitat ObjectNav
        # success is viewpoint-based, i.e. effectively surface-based)
        dist = max(
            0.0,
            math.hypot(self.plan.target[0] - self.x, self.plan.target[1] - self.y)
            - self.plan.target_radius,
        )
        # synthetic ITM cosine: high when the target is in view, mild rise as
        # the agent gets closer, floor at 0.2
        cosine = 0.9 if target_visible else max(0.2, 0.45 - 0.025 * dist)

        return {
            "depth": depth,
            "rgb": rgb,
            "target_mask": mask,
            "target_visible": target_visible,
            "cosine": float(cosine),
            "robot_xy": np.array([self.x, self.y], np.float32),
            "heading": float(self.yaw),
            "distance_to_goal": float(dist),
            "done": self.done,
            "steps": self.steps,
        }

    # --- oracle shortest path (for SPL) ------------------------------------
    def shortest_path_length(self, resolution: float = 0.1) -> float:
        """BFS geodesic distance start->target on a rasterized floor plan."""
        import collections

        xs = [w[i] for w in self.plan.walls for i in (0, 2)] + [
            self.plan.start[0],
            self.plan.target[0],
        ]
        ys = [w[i] for w in self.plan.walls for i in (1, 3)] + [
            self.plan.start[1],
            self.plan.target[1],
        ]
        pad = 0.5
        x0, x1 = min(xs) - pad, max(xs) + pad
        y0, y1 = min(ys) - pad, max(ys) + pad
        nx = int((x1 - x0) / resolution) + 1
        ny = int((y1 - y0) / resolution) + 1
        blocked = np.zeros((nx, ny), bool)
        for (ax, ay, bx, by) in self.plan.walls:
            n = int(math.hypot(bx - ax, by - ay) / (resolution / 2)) + 1
            for i in range(n + 1):
                px = ax + (bx - ax) * i / n
                py = ay + (by - ay) * i / n
                ix, iy = int((px - x0) / resolution), int((py - y0) / resolution)
                blocked[max(0, ix - 1) : ix + 2, max(0, iy - 1) : iy + 2] = True

        def cell(p):
            return (int((p[0] - x0) / resolution), int((p[1] - y0) / resolution))

        s, g = cell(self.plan.start), cell(self.plan.target)
        dist = np.full((nx, ny), np.inf)
        dist[s] = 0.0
        q = collections.deque([s])
        diag = resolution * math.sqrt(2)
        while q:
            cx, cy = q.popleft()
            if (cx, cy) == g:
                break
            for ddx in (-1, 0, 1):
                for ddy in (-1, 0, 1):
                    if ddx == 0 and ddy == 0:
                        continue
                    mx, my = cx + ddx, cy + ddy
                    if 0 <= mx < nx and 0 <= my < ny and not blocked[mx, my]:
                        nd = dist[cx, cy] + (diag if ddx and ddy else resolution)
                        if nd < dist[mx, my]:
                            dist[mx, my] = nd
                            q.append((mx, my))
        d = dist[g]
        return float(d) if np.isfinite(d) else float(math.hypot(
            self.plan.target[0] - self.plan.start[0],
            self.plan.target[1] - self.plan.start[1],
        ))
