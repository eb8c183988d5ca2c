"""A mock ``habitat`` package for air-gapped coverage of make_habitat_env.

Mimics the slice of habitat-lab's API that vlfm_tpu.runner.habitat_eval
touches: ``habitat.get_config``, ``habitat.config.read_write``,
``habitat.Env`` (reset/step/episode_over/get_metrics/current_episode with
``info["geodesic_distance"]``), the ObjectNav observation keys, and the
``top_down_map`` metric dict consumed by the failure taxonomy
(episode_stats_logger.py:75-111). Backed by FakeObjectNavEnv so full episodes
run without habitat-sim.

Usage: ``install()`` registers the modules in sys.modules; ``uninstall()``
removes them. Tests must pair the calls (see test_habitat_env.py fixtures).
"""

from __future__ import annotations

import contextlib
import sys
import types
from types import SimpleNamespace

import numpy as np

from vlfm_tpu.runner.fake_env import EnvConfig, FakeObjectNavEnv, open_room_plan

GRID_RESOLUTION = (128, 128)
LOWER_BOUND = (-10.0, -10.0)
UPPER_BOUND = (10.0, 10.0)
SUCCESS_DISTANCE = 1.0  # matches FakeObjectNavEnv's ObjectNav-style radius
MAX_EPISODE_STEPS = 60
ACTION_NAMES = ("stop", "move_forward", "turn_left", "turn_right")


def _grid_xy(xy_episodic: np.ndarray) -> np.ndarray:
    """Episodic (x, y) -> top-down grid indices, via the same chain the
    wrapper inverts: tf(identity) -> habitat axes (-y, z, -x) -> sim (z, x)
    -> sim_xy_to_grid_xy."""
    sim_xy = np.array([-xy_episodic[0], -xy_episodic[1]], np.float64)
    lower = np.asarray(LOWER_BOUND)
    upper = np.asarray(UPPER_BOUND)
    grid_size = np.array(
        [
            abs(upper[1] - lower[1]) / GRID_RESOLUTION[0],
            abs(upper[0] - lower[0]) / GRID_RESOLUTION[1],
        ]
    )
    return ((sim_xy - lower[::-1]) / grid_size).astype(int)


class _Episode:
    def __init__(self, i: int, shortest: float):
        self.episode_id = str(i)
        self.scene_id = "data/scene_datasets/mock/mock_scene.glb"
        self.object_category = "toilet"
        self.info = {"geodesic_distance": shortest}


class MockHabitatEnv:
    """habitat.Env duck type over FakeObjectNavEnv episodes."""

    def __init__(self, config=None, dataset=None):
        self.config = config
        self._i = -1
        self._env: FakeObjectNavEnv | None = None
        self._episode: _Episode | None = None
        self._fog = np.zeros(GRID_RESOLUTION, np.uint8)
        self._bboxes = np.zeros(GRID_RESOLUTION, np.uint8)
        self.step_action_types: list = []  # recorded for assertions

    @property
    def episode_over(self) -> bool:
        return bool(self._env.done)

    @property
    def current_episode(self) -> _Episode:
        assert self._episode is not None, "reset() assigns the episode"
        return self._episode

    def reset(self):
        self._i += 1
        self._env = FakeObjectNavEnv(
            open_room_plan(seed=self._i),
            EnvConfig(width=128, height=96, max_steps=MAX_EPISODE_STEPS),
        )
        self._episode = _Episode(self._i, self._env.shortest_path_length())
        self._fog = np.zeros(GRID_RESOLUTION, np.uint8)
        self._bboxes = np.zeros(GRID_RESOLUTION, np.uint8)
        tr, tc = _grid_xy(np.asarray(self._env.plan.target))
        self._bboxes[max(tr - 4, 0) : tr + 5, max(tc - 4, 0) : tc + 5] = 1
        o = self._env._observe()
        self._mark_fog()
        return self._obs(o)

    def step(self, action):
        self.step_action_types.append(type(action))
        if isinstance(action, str):
            action = ACTION_NAMES.index(action)
        o = self._env.step(int(action))
        self._mark_fog()
        return self._obs(o)

    def _mark_fog(self):
        r, c = _grid_xy(np.array([self._env.x, self._env.y]))
        self._fog[max(r - 3, 0) : r + 4, max(c - 3, 0) : c + 4] = 1

    def _obs(self, o):
        return {
            "rgb": o["rgb"],
            "depth": o["depth"][..., None],
            # habitat gps negates y relative to the episodic frame
            "gps": np.array([o["robot_xy"][0], -o["robot_xy"][1]], np.float32),
            "compass": np.array([o["heading"]], np.float32),
            "heading": np.array([o["heading"]], np.float32),
            "objectgoal": np.array([3], np.int64),  # toilet
        }

    def get_metrics(self):
        e = self._env
        o = e._observe()
        dist = float(o["distance_to_goal"])
        success = float(e.called_stop and dist <= SUCCESS_DISTANCE)
        shortest = self._episode.info["geodesic_distance"]
        denom = max(e.path_length, shortest, 1e-6)
        progress = max(0.0, 1.0 - dist / max(shortest, 1e-6))
        return {
            "success": success,
            "spl": success * shortest / denom,
            # habitat-lab's SoftSPL uuid spelling, to exercise the fallback
            "softspl": progress * shortest / denom,
            "distance_to_goal": dist,
            "traveled_stairs": 0.0,
            "top_down_map": {
                "map": np.zeros(GRID_RESOLUTION, np.uint8),
                "fog_of_war_mask": self._fog,
                "target_bboxes_mask": self._bboxes,
                "upper_bound": UPPER_BOUND,
                "lower_bound": LOWER_BOUND,
                "grid_resolution": GRID_RESOLUTION,
                "tf_episodic_to_global": np.eye(4),
                "is_feasible": True,
            },
        }


def get_config(path, overrides=None):
    sim_sensors = {"rgb_sensor": object(), "depth_sensor": object(), "semantic_sensor": object()}
    return SimpleNamespace(
        config_path=path,
        overrides=list(overrides or []),
        habitat=SimpleNamespace(
            simulator=SimpleNamespace(
                agents=SimpleNamespace(main_agent=SimpleNamespace(sim_sensors=sim_sensors))
            ),
            task=SimpleNamespace(
                measurements=SimpleNamespace(
                    success=SimpleNamespace(success_distance=SUCCESS_DISTANCE)
                )
            ),
            environment=SimpleNamespace(max_episode_steps=MAX_EPISODE_STEPS),
        ),
    )


@contextlib.contextmanager
def read_write(cfg):
    yield cfg


_MODULES = ("habitat", "habitat.config")


def install() -> types.ModuleType:
    habitat = types.ModuleType("habitat")
    habitat.get_config = get_config
    habitat.Env = MockHabitatEnv
    config_mod = types.ModuleType("habitat.config")
    config_mod.read_write = read_write
    habitat.config = config_mod
    sys.modules["habitat"] = habitat
    sys.modules["habitat.config"] = config_mod
    return habitat


def uninstall() -> None:
    for name in _MODULES:
        sys.modules.pop(name, None)
