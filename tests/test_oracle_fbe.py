"""Oracle FBE baselines (habitat_policies.py:240-261 roles): the
SuperOracle shortest-path follower should near-perfectly solve feasible
plans, and the nearest-frontier 'fbe' policy version must run end-to-end."""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from vlfm_tpu.config import CameraConfig, VLFMConfig  # noqa: E402
from vlfm_tpu.mapping.grid import GridSpec2D  # noqa: E402
from vlfm_tpu.policy.oracle_fbe import run_super_oracle_episode  # noqa: E402
from vlfm_tpu.runner.episode_driver import run_episode  # noqa: E402
from vlfm_tpu.runner.fake_env import (  # noqa: E402
    EnvConfig,
    FakeObjectNavEnv,
    open_room_plan,
    two_room_plan,
)

CFG = VLFMConfig(camera=CameraConfig(height=96, width=128),
                 max_frontiers=16, max_frontier_cells=256,
                 object_map_slots=8, object_map_points_per_slot=128)
SPEC = GridSpec2D(size=512, pixels_per_meter=20, pad=160)
ENV = EnvConfig(width=128, height=96, max_steps=200)


def test_super_oracle_solves_feasible_plans():
    wins = 0
    for s in range(4):
        env = FakeObjectNavEnv(two_room_plan(seed=s), ENV)
        r = run_super_oracle_episode(env)
        assert r.called_stop or r.steps >= ENV.max_steps
        wins += int(r.success)
        # perfect knowledge: SPL near 1 on successes
        if r.success:
            assert r.spl > 0.5, r.spl
    assert wins >= 3, f"super oracle won only {wins}/4 two-room episodes"


def test_super_oracle_stops_inside_radius():
    env = FakeObjectNavEnv(open_room_plan(seed=1), ENV)
    r = run_super_oracle_episode(env)
    assert r.success and r.distance_to_goal <= ENV.success_radius


def test_fbe_version_runs_and_explores():
    env = FakeObjectNavEnv(
        open_room_plan(seed=0), EnvConfig(width=128, height=96, max_steps=60)
    )
    result, _ = run_episode(env, "greedy", SPEC, CFG, seed=0, version="fbe")
    assert result.steps > 0
    # nearest-frontier exploration with oracle masks should usually find the
    # open-room target; at minimum the episode must terminate cleanly
    assert result.success or result.failure_cause is not None


def test_fbe_picks_nearest_frontier():
    """The fbe reduction scores frontiers by negative distance."""
    import jax

    from vlfm_tpu.policy import itm

    env = FakeObjectNavEnv(
        open_room_plan(seed=3), EnvConfig(width=128, height=96, max_steps=40)
    )
    from vlfm_tpu.runner.episode_driver import run_episode as run

    goals = []

    def on_step(env_, o, info, state):
        if int(info.mode) == itm.MODE_EXPLORE and int(info.num_frontiers) > 1:
            goals.append(
                (np.asarray(info.goal), np.asarray(o["robot_xy"]),
                 np.asarray(state.obstacle.frontiers_xy),
                 np.asarray(state.obstacle.frontiers_valid))
            )

    run(env, "greedy", SPEC, CFG, seed=3, version="fbe", on_step=on_step)
    checked = 0
    for goal, robot, frontiers, valid in goals:
        d = np.linalg.norm(frontiers[valid] - robot, axis=1)
        # chosen goal is a frontier; with stickiness it may not be the
        # absolute nearest, but it must never be the farthest of 3+
        dist_goal = np.linalg.norm(goal - robot)
        if valid.sum() >= 3 and dist_goal > 0:
            assert dist_goal <= np.max(d) + 1e-5
            checked += 1
    assert checked > 0 or len(goals) == 0
