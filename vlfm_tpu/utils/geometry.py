"""Geometry primitives as pure jax.numpy functions.

Functional parity targets (reference: vlfm/utils/geometry_utils.py):
  rho_theta (:9), get_rotation_matrix (:37), wrap_heading (:59),
  within_fov_cone (:91), extract_yaw (:145), xyz_yaw_to_tf_matrix (:162),
  closest_point_within_threshold (:183), transform_points (:205),
  get_point_cloud (:216), get_fov (:239), pt_from_rho_theta (:257).

Design differences for TPU: everything is shape-static and jittable. Functions
that in the reference return variable-length subsets (``within_fov_cone``)
instead return boolean masks here, so they compose with vmap/jit.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def wrap_heading(theta: jnp.ndarray) -> jnp.ndarray:
    """Wrap angle(s) to [-pi, pi)."""
    return (theta + jnp.pi) % (2 * jnp.pi) - jnp.pi


def rotation_matrix_2d(angle: jnp.ndarray) -> jnp.ndarray:
    c, s = jnp.cos(angle), jnp.sin(angle)
    return jnp.array([[c, -s], [s, c]])


def rho_theta(curr_pos: jnp.ndarray, curr_heading: jnp.ndarray, curr_goal: jnp.ndarray):
    """Polar coordinates of ``curr_goal`` in the agent's local frame.

    rho = distance to goal; theta = CCW radians the agent must turn to face it.
    """
    local = curr_goal - curr_pos
    c, s = jnp.cos(-curr_heading), jnp.sin(-curr_heading)
    lx = c * local[0] - s * local[1]
    ly = s * local[0] + c * local[1]
    rho = jnp.sqrt(lx * lx + ly * ly)
    theta = jnp.arctan2(ly, lx)
    return rho, theta


def pt_from_rho_theta(rho: jnp.ndarray, theta: jnp.ndarray) -> jnp.ndarray:
    return jnp.stack([rho * jnp.cos(theta), rho * jnp.sin(theta)])


def xyz_yaw_to_tf_matrix(xyz: jnp.ndarray, yaw: jnp.ndarray) -> jnp.ndarray:
    """4x4 homogeneous transform: rotation about z by ``yaw``, translation ``xyz``."""
    c, s = jnp.cos(yaw), jnp.sin(yaw)
    zero = jnp.zeros_like(c)
    one = jnp.ones_like(c)
    return jnp.stack(
        [
            jnp.stack([c, -s, zero, xyz[0]]),
            jnp.stack([s, c, zero, xyz[1]]),
            jnp.stack([zero, zero, one, xyz[2]]),
            jnp.stack([zero, zero, zero, one]),
        ]
    )


def extract_yaw(tf: jnp.ndarray) -> jnp.ndarray:
    """Yaw of a 4x4 transform (rotation of x-axis about z)."""
    return jnp.arctan2(tf[1, 0], tf[0, 0])


def transform_points(tf: jnp.ndarray, points: jnp.ndarray) -> jnp.ndarray:
    """Apply a 4x4 homogeneous transform to (N, 3) points -> (N, 3).

    Geometry must stay in full f32 — TPU matmuls default to bf16 accumulate,
    which is far too coarse for metric coordinates — so request HIGHEST.
    """
    rotated = jnp.matmul(points, tf[:3, :3].T, precision=jax.lax.Precision.HIGHEST)
    # Reference divides by the homogeneous coordinate; for rigid transforms the
    # last row is (0,0,0,1) so w == 1 — skip the division (it is the identity).
    return rotated + tf[:3, 3]


def within_fov_cone(
    cone_origin: jnp.ndarray,
    cone_angle: jnp.ndarray,
    cone_fov: float,
    cone_range: float,
    points: jnp.ndarray,
) -> jnp.ndarray:
    """Boolean mask of (N, >=3) ``points`` inside a horizontal FOV cone.

    Unlike the reference (which returns the subset), returns a mask so the call
    is shape-static. Angle test uses the xy-plane bearing from the origin.
    """
    d = points[:, :3] - cone_origin
    dists = jnp.linalg.norm(d, axis=1)
    angles = jnp.arctan2(d[:, 1], d[:, 0])
    diffs = wrap_heading(angles - cone_angle)
    return (dists <= cone_range) & (jnp.abs(diffs) <= cone_fov / 2)


def closest_point_within_threshold(
    points: jnp.ndarray, target: jnp.ndarray, threshold: float, valid: jnp.ndarray | None = None
) -> jnp.ndarray:
    """Index of the point closest to ``target`` if within ``threshold`` else -1.

    ``valid`` optionally masks out padded rows (distance -> +inf).
    """
    d = jnp.linalg.norm(points[:, :2] - target[:2], axis=1)
    if valid is not None:
        d = jnp.where(valid, d, jnp.inf)
    idx = jnp.argmin(d)
    return jnp.where(d[idx] <= threshold, idx, -1)


def get_point_cloud(
    depth_m: jnp.ndarray, mask: jnp.ndarray, fx: float, fy: float
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Back-project a metric depth image into a camera-frame point cloud.

    Camera convention matches the reference: +x forward, +y left, +z up, i.e.
    point = (z_depth, -x_img, -y_img) with x_img = (u - W//2) z / fx and
    y_img = (v - H//2) z / fy.

    Returns ``(points, valid)`` where points has shape (H*W, 3) and ``valid``
    is ``mask`` flattened — every pixel produces a row (shape-static), invalid
    rows should be ignored downstream via the mask.
    """
    h, w = depth_m.shape
    v = jnp.arange(h, dtype=depth_m.dtype)[:, None]
    u = jnp.arange(w, dtype=depth_m.dtype)[None, :]
    z = depth_m
    x = (u - w // 2) * z / fx
    y = (v - h // 2) * z / fy
    pts = jnp.stack([z, -x, -y + jnp.zeros_like(z)], axis=-1).reshape(-1, 3)
    return pts, mask.reshape(-1)


def get_fov(focal_length: float, image_height_or_width: int) -> float:
    """Field of view (radians) from a focal length and image extent. Host-side."""
    return 2 * math.atan((image_height_or_width / 2) / focal_length)


def calculate_vfov(hfov: float, width: int, height: int) -> float:
    """Vertical FOV from horizontal FOV and sensor aspect. Host-side."""
    dfov = 2 * math.atan(math.tan(hfov / 2))
    return 2 * math.atan(math.tan(dfov / 2) * (height / math.sqrt(width**2 + height**2)))


def focal_length_from_fov(fov_rad: float, image_width: int) -> float:
    """fx = W / (2 tan(fov/2)) — matches habitat adapter intrinsics."""
    return image_width / (2 * math.tan(fov_rad / 2))


def convert_to_global_frame(
    agent_pos: jnp.ndarray, agent_yaw, local_pos: jnp.ndarray
) -> jnp.ndarray:
    """Agent-local 3D position -> global frame
    (geometry_utils.convert_to_global_frame:119-143; used by the reality
    PointNavEnv's relative-goal reset, reality/pointnav_env.py:45-52)."""
    tf = xyz_yaw_to_tf_matrix(agent_pos, jnp.asarray(agent_yaw, jnp.float32))
    hom = jnp.concatenate([jnp.asarray(local_pos, jnp.float32), jnp.ones(1)])
    out = tf @ hom
    return out[:3] / out[3]
