import numpy as np
import pytest

from vlfm_tpu.adapters.habitat import (
    HM3D_ID_TO_NAME,
    MP3D_ID_TO_NAME,
    HabitatObsAdapter,
    HabitatVLFMAgent,
    filter_depth,
    goal_name,
)
from vlfm_tpu.config import CameraConfig, VLFMConfig
from vlfm_tpu.mapping.grid import GridSpec2D
from vlfm_tpu.reality.envs import ObjectNavEnv, PointNavEnv, RealityEnvConfig
from vlfm_tpu.reality.robots import FakeRobot
from vlfm_tpu.utils.measurements import TraveledStairs


def test_goal_tables():
    assert goal_name(3) == "toilet"
    assert goal_name(1, "mp3d").startswith("table")
    assert len(HM3D_ID_TO_NAME) == 6 and len(MP3D_ID_TO_NAME) == 21


def test_filter_depth_fills_holes():
    d = np.full((8, 8), 0.5, np.float32)
    d[3:5, 2] = 0.0
    out = filter_depth(d)
    assert (out > 0).all()
    assert out[3, 2] == 0.5


def test_habitat_adapter_builds_observation():
    cfg = VLFMConfig(camera=CameraConfig(height=32, width=48))
    a = HabitatObsAdapter(cfg)
    obs = {
        "rgb": np.zeros((32, 48, 3), np.uint8),
        "depth": np.full((32, 48, 1), 0.7, np.float32),
        "gps": np.array([1.0, 2.0]),
        "compass": np.array([0.5]),
        "objectgoal": np.array([0]),
    }
    o = a.observation(obs)
    assert np.allclose(np.asarray(o.robot_xy), [1.0, -2.0])  # gps y-flip
    assert a.target_object(obs) == "chair"
    mp = HabitatObsAdapter(cfg, "mp3d")
    assert mp.non_coco_caption.endswith(" .")
    assert "|" not in mp.non_coco_caption


@pytest.mark.slow  # episode loop, ~24 s — out of the fast-core budget
def test_habitat_agent_full_loop():
    cfg = VLFMConfig(camera=CameraConfig(height=48, width=64))
    spec = GridSpec2D(size=256, pixels_per_meter=20, pad=160)

    def perceive(rgb, target):
        k = cfg.max_detections_per_frame
        return (
            np.array([0.4], np.float32),
            np.zeros((k, 48, 64), bool),
            np.zeros(k, bool),
        )

    agent = HabitatVLFMAgent(cfg, spec, "greedy", perceive)
    obs = {
        "rgb": np.zeros((48, 64, 3), np.uint8),
        "depth": np.ones((48, 64, 1), np.float32),
        "gps": np.zeros(2),
        "compass": np.zeros(1),
        "objectgoal": np.array([3]),
    }
    actions = [agent.act(obs) for _ in range(3)]
    assert actions == [2, 2, 2]  # initialization spin
    agent.reset()
    assert int(agent.state.steps) == 0


class TestRealityEnvs:
    def test_pointnav_env_episodic_frame(self):
        robot = FakeRobot(seed=0)
        robot.command_base_velocity(0.3, 1.0, duration=2.0)  # move away from origin
        env = PointNavEnv(robot)
        obs = env.reset(np.array([2.0, 0.0]))
        # boot pose defines the episodic origin
        assert np.allclose(obs["robot_xy"], [0.0, 0.0], atol=1e-6)
        obs = env.step(1)  # MOVE_FORWARD
        assert obs["robot_xy"][0] > 0.1
        assert obs["depth"].shape[1] == 848  # two body cams hstacked
        assert 0.0 <= obs["depth"].min() and obs["depth"].max() <= 1.0

    def test_objectnav_env_camera_schedule(self):
        env = ObjectNavEnv(FakeRobot(seed=1), RealityEnvConfig(all_cams_until_step=2))
        obs = env.reset("toilet")
        assert len(obs["obstacle_depths"]) == 5  # all body cams at start
        for _ in range(3):
            obs = env.step(2)
        assert len(obs["obstacle_depths"]) == 2  # front pair later
        assert obs["rgb"].shape == (480, 640, 3)
        assert obs["target_object"] == "toilet"


def test_traveled_stairs():
    m = TraveledStairs()
    for z in [0.0, 0.2, 0.5]:
        m.update(z)
    assert not m.traveled_stairs
    m.update(1.0)
    assert m.traveled_stairs
    m.reset()
    assert not m.traveled_stairs
