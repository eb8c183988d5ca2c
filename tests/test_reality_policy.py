"""Closed-loop reality path: FakeRobot -> ObjectNavEnv -> RealityITMPolicyV2
-> velocity/arm commands.

Parity targets: reality_policies.py:16,52-154 (8-arm-yaw initialize,
multi-camera obstacle fusion, continuous actions + rho_theta passthrough),
objectnav_env.py:102-116,186-190 (arm actions, 5-then-2 camera schedule).
"""

import math

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from vlfm_tpu.config import VLFMConfig  # noqa: E402
from vlfm_tpu.mapping.grid import GridSpec2D  # noqa: E402
from vlfm_tpu.policy.reality import (  # noqa: E402
    INITIAL_ARM_YAWS,
    NUM_INIT_YAWS,
    RealityITMPolicyV2,
)
from vlfm_tpu.reality.envs import ObjectNavEnv, RealityEnvConfig  # noqa: E402
from vlfm_tpu.reality.robots import SPOT_CAMERA_SHAPES, FakeRobot  # noqa: E402

SPEC = GridSpec2D(size=256, pixels_per_meter=20, pad=160)
CFG = VLFMConfig(max_frontiers=16, max_frontier_cells=256,
                 object_map_slots=8, object_map_points_per_slot=128)


class OpenSpaceRobot(FakeRobot):
    """Constant mid-range depth everywhere: an open room, so the explored
    area grows and frontiers exist."""

    def get_camera_data(self, camera_ids):
        out = super().get_camera_data(camera_ids)
        for cid, cam in out.items():
            if "depth" in cid:
                cam.image = np.full_like(cam.image, 3000)  # 3 m in mm
        return out


def make_env(robot=None):
    return ObjectNavEnv(robot or OpenSpaceRobot(),
                        RealityEnvConfig(all_cams_until_step=10))


class TestObservationProtocol:
    def test_camera_schedule_and_fields(self):
        env = make_env()
        obs = env.reset("toilet")
        assert len(obs["obstacle_depths"]) == 5
        for od in obs["obstacle_depths"]:
            assert od["depth"].shape == SPOT_CAMERA_SHAPES["frontleft_depth"]
            assert od["tf"].shape == (4, 4)
        assert obs["nav_depth"].shape[1] == 2 * SPOT_CAMERA_SHAPES["frontleft_depth"][1]
        assert 0 < obs["hand_fov"] < math.pi
        # after the warmup window only the front pair is polled
        # (objectnav_env.py:186-190)
        env.steps = 11
        obs = env.observe()
        assert len(obs["obstacle_depths"]) == 2

    def test_tf_is_episodic_xyz(self):
        """At boot the hand camera must sit at the episodic origin facing +x:
        the converted tf is xyz-convention, so its forward axis (+x) must map
        onto episodic +x, and it must rotate with the robot's yaw."""
        env = make_env()
        obs = env.reset("toilet")
        tf = obs["hand_tf"]
        np.testing.assert_allclose(tf[:2, 3], [0, 0], atol=1e-5)
        fwd = tf[:3, :3] @ np.array([1.0, 0, 0])
        np.testing.assert_allclose(fwd, [1, 0, 0], atol=1e-5)
        # turn the robot 90 degrees left; forward must follow
        env.robot._yaw = math.pi / 2
        tf = env.observe()["hand_tf"]
        fwd = tf[:3, :3] @ np.array([1.0, 0, 0])
        np.testing.assert_allclose(fwd, [0, 1, 0], atol=1e-5)


class TestRealityPolicy:
    def test_initialize_spins_arm_then_navigates(self):
        env = make_env()
        policy = RealityITMPolicyV2(SPEC, CFG, pointnav="greedy")
        obs = env.reset("toilet")
        yaws = []
        for t in range(NUM_INIT_YAWS + 3):
            action = policy.get_action(obs)
            assert set(action) == {"angular", "linear", "arm_yaw", "stop", "rho_theta"}
            if t < NUM_INIT_YAWS:
                yaws.append(action["arm_yaw"])
                assert action["angular"] == 0.0 and action["linear"] == 0.0
            else:
                assert action["arm_yaw"] == -1.0
            obs = env.step(action)
        np.testing.assert_allclose(yaws, INITIAL_ARM_YAWS, atol=1e-6)

    def test_explores_with_motion_after_init(self):
        env = make_env()
        policy = RealityITMPolicyV2(SPEC, CFG, pointnav="greedy")
        obs = env.reset("toilet")
        moved = stopped = False
        for _ in range(NUM_INIT_YAWS + 6):
            action = policy.get_action(obs)
            if action["stop"]:
                stopped = True
                break
            if action["arm_yaw"] == -1.0 and (
                abs(action["angular"]) > 0 or abs(action["linear"]) > 0
            ):
                moved = True
            obs = env.step(action)
        assert moved or stopped, "policy neither moved nor stopped after init"

    def test_detection_produces_navigate_and_stop(self):
        """A detector that always fires drives NAVIGATE mode; approaching the
        goal within pointnav_stop_radius raises stop (reality _stop_action)."""
        h, w = SPOT_CAMERA_SHAPES["hand_color"]

        calls = {"n": 0}

        def detect(rgb):
            # fire only on a few frames right after init, so the mapped object
            # stays put and the robot can close the distance
            calls["n"] += 1
            masks = np.zeros((CFG.max_detections_per_frame, h, w), bool)
            valid = np.zeros(CFG.max_detections_per_frame, bool)
            if NUM_INIT_YAWS < calls["n"] <= NUM_INIT_YAWS + 2:
                masks[0, h // 3 : 2 * h // 3, w // 3 : 2 * w // 3] = True
                valid[0] = True
            return masks, valid

        def infer_depth(rgb, mn, mx):
            return np.full(rgb.shape[:2], 0.4, np.float32)  # ~2 m at 5 m range

        env = make_env()
        policy = RealityITMPolicyV2(
            SPEC, CFG, pointnav="greedy", detect_fn=detect, infer_depth_fn=infer_depth
        )
        obs = env.reset("toilet")
        stopped = False
        for _ in range(NUM_INIT_YAWS + 20):
            action = policy.get_action(obs)
            rho, theta = action["rho_theta"]
            assert np.isfinite(rho) and np.isfinite(theta)
            if action["stop"]:
                stopped = True
                break
            obs = env.step(action)
        assert stopped, "never stopped at the detected object"


def test_env_routes_negative_arm_yaws_to_the_arm():
    """All eight INITIAL_ARM_YAWS (incl. the negative ones) must reach
    set_arm_joints; only the exact -1.0 sentinel is a base action
    (objectnav_env.py:102-113). A threshold test here once silently sent
    -90/-60/-30 deg to the base."""
    import math

    from vlfm_tpu.policy.reality import INITIAL_ARM_YAWS
    from vlfm_tpu.reality.envs import ObjectNavEnv
    from vlfm_tpu.reality.robots import FakeRobot

    robot = FakeRobot()
    env = ObjectNavEnv(robot)
    env.reset("toilet")

    arm_calls = []
    base_calls = []
    robot.set_arm_joints = lambda joints, travel_time=1.0: arm_calls.append(
        float(joints[0])
    )
    robot.command_base_velocity = lambda ang, lin: base_calls.append((ang, lin))

    for yaw in INITIAL_ARM_YAWS:
        env.step({"arm_yaw": float(yaw), "angular": 0.0, "linear": 0.0})
    assert len(arm_calls) == len(INITIAL_ARM_YAWS), (arm_calls, base_calls)
    assert math.isclose(arm_calls[0], float(INITIAL_ARM_YAWS[0]))

    env.step({"arm_yaw": -1.0, "angular": 0.3, "linear": 0.1})
    assert base_calls == [(0.3, 0.1)]
