import jax.numpy as jnp
import numpy as np
import pytest

from vlfm_tpu.utils import geometry as G


def np_rho_theta(pos, heading, goal):
    c, s = np.cos(-heading), np.sin(-heading)
    local = np.array([[c, -s], [s, c]]) @ (np.asarray(goal) - np.asarray(pos))
    return float(np.linalg.norm(local)), float(np.arctan2(local[1], local[0]))


@pytest.mark.parametrize("seed", range(5))
def test_rho_theta_matches_numpy(seed):
    rng = np.random.default_rng(seed)
    pos = rng.normal(size=2)
    goal = rng.normal(size=2)
    heading = rng.uniform(-np.pi, np.pi)
    rho, theta = G.rho_theta(jnp.array(pos), jnp.float32(heading), jnp.array(goal))
    rho_np, theta_np = np_rho_theta(pos, heading, goal)
    assert np.isclose(float(rho), rho_np, atol=1e-5)
    assert np.isclose(float(theta), theta_np, atol=1e-5)


def test_tf_roundtrip_yaw():
    xyz = jnp.array([1.0, -2.0, 0.5])
    yaw = jnp.float32(0.7)
    tf = G.xyz_yaw_to_tf_matrix(xyz, yaw)
    assert np.isclose(float(G.extract_yaw(tf)), 0.7, atol=1e-6)
    pts = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 2.0]])
    out = G.transform_points(tf, pts)
    expect0 = np.array([np.cos(0.7) + 1.0, np.sin(0.7) - 2.0, 0.5])
    assert np.allclose(np.asarray(out[0]), expect0, atol=1e-5)


def test_point_cloud_backprojection():
    h, w = 4, 6
    fx = fy = 3.0
    depth = jnp.full((h, w), 2.0)
    mask = jnp.ones((h, w), bool)
    pts, valid = G.get_point_cloud(depth, mask, fx, fy)
    assert pts.shape == (h * w, 3)
    assert bool(valid.all())
    pts = np.asarray(pts).reshape(h, w, 3)
    # center pixel points straight ahead
    assert np.allclose(pts[h // 2, w // 2], [2.0, 0.0, 0.0])
    # pixel left of center (u < W//2) has positive y (left)
    assert pts[h // 2, 0, 1] > 0
    # pixel above center (v < H//2) has positive z (up)
    assert pts[0, w // 2, 2] > 0


def test_within_fov_cone_mask():
    origin = jnp.zeros(3)
    pts = jnp.array([[1.0, 0.0, 0.0, 5.0], [0.0, 1.0, 0.0, 6.0], [3.0, 0.0, 0.0, 7.0]])
    mask = G.within_fov_cone(origin, jnp.float32(0.0), np.pi / 2, 2.0, pts)
    assert np.asarray(mask).tolist() == [True, False, False]


def test_closest_point_within_threshold():
    pts = jnp.array([[0.0, 0.0], [1.0, 1.0], [5.0, 5.0]])
    idx = G.closest_point_within_threshold(pts, jnp.array([0.9, 1.2]), 0.5)
    assert int(idx) == 1
    idx = G.closest_point_within_threshold(pts, jnp.array([10.0, 10.0]), 0.5)
    assert int(idx) == -1
    valid = jnp.array([True, False, True])
    idx = G.closest_point_within_threshold(pts, jnp.array([0.9, 1.2]), 5.0, valid)
    assert int(idx) == 0


def test_wrap_heading():
    assert np.isclose(float(G.wrap_heading(jnp.float32(3 * np.pi))), -np.pi, atol=1e-5)
    assert np.isclose(float(G.wrap_heading(jnp.float32(-0.1))), -0.1, atol=1e-6)
