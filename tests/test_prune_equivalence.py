"""Empirical check of the incremental-flood approximation.

The obstacle map prunes the explored region to the agent-connected component
with an incremental seed on most steps and an exact agent-only seed every
8th step (obstacle_map.py here). This test runs a multi-step two-room
trajectory twice — incremental cadence vs. exact prune EVERY step — and
asserts the explored regions and frontier sets agree at every step for this
(representative, door-crossing) workload.
"""

import jax.numpy as jnp
import numpy as np

from vlfm_tpu.config import CameraConfig, VLFMConfig
from vlfm_tpu.mapping import obstacle_map as OM
from vlfm_tpu.mapping.grid import GridSpec2D
from vlfm_tpu.runner.fake_env import EnvConfig, FakeObjectNavEnv, two_room_plan
from vlfm_tpu.utils.geometry import xyz_yaw_to_tf_matrix

CFG = VLFMConfig(camera=CameraConfig(height=64, width=96))
SPEC = GridSpec2D(size=512, pixels_per_meter=20, pad=160)


def drive(full_every_step: bool):
    env = FakeObjectNavEnv(
        two_room_plan(seed=3), EnvConfig(width=96, height=64, max_steps=60)
    )
    o = env.reset()
    state = OM.create(SPEC)
    cam = CFG.camera
    explored, frontiers = [], []
    # scripted trajectory: spin, then drive toward the door region
    script = [2] * 12 + [1, 1, 2, 1, 1, 1, 3, 1, 1, 1, 1, 1, 2, 1, 1, 1]
    for k, a in enumerate(script):
        tf = xyz_yaw_to_tf_matrix(
            jnp.array([env.x, env.y, cam.camera_height]), jnp.float32(env.yaw)
        )
        state = OM.update(
            state, SPEC, jnp.asarray(o["depth"]), tf, cam.min_depth, cam.max_depth,
            cam.fx, cam.fy, cam.hfov, min_height=0.15, max_height=0.88,
            area_thresh_m2=1.5,
            full_prune=True if full_every_step else (k % 8 == 0),
        )
        explored.append(np.asarray(state.explored))
        f = np.asarray(state.frontiers_xy)[np.asarray(state.frontiers_valid)]
        frontiers.append(np.sort(f.round(3), axis=0))
        o = env.step(a)
    return explored, frontiers


def test_incremental_prune_matches_exact():
    e1, f1 = drive(full_every_step=True)
    e2, f2 = drive(full_every_step=False)
    for k, (a, b) in enumerate(zip(e1, e2)):
        assert (a == b).all(), f"explored diverged at step {k}: {np.abs(a ^ b).sum()} px"
    for k, (a, b) in enumerate(zip(f1, f2)):
        assert a.shape == b.shape and np.allclose(a, b), f"frontiers diverged at step {k}"
