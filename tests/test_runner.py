import numpy as np

from vlfm_tpu.config import CameraConfig, VLFMConfig
from vlfm_tpu.mapping.grid import GridSpec2D
from vlfm_tpu.runner.episode_driver import run_episode
from vlfm_tpu.runner.fake_env import EnvConfig, FakeObjectNavEnv, open_room_plan
from vlfm_tpu.runner import metrics as M


def small_setup():
    cfg = VLFMConfig(camera=CameraConfig(height=96, width=128))
    spec = GridSpec2D(size=512, pixels_per_meter=20, pad=160)
    env_cfg = EnvConfig(width=128, height=96, max_steps=120)
    return cfg, spec, env_cfg


def test_full_episode_succeeds_with_greedy_controller():
    cfg, spec, env_cfg = small_setup()
    env = FakeObjectNavEnv(open_room_plan(seed=0), env_cfg)
    result, stats = run_episode(env, "greedy", spec, cfg, seed=0)
    assert result.success, result
    assert result.spl > 0.5
    assert result.steps < 120
    assert stats.env_steps == result.steps


def test_env_raycast_consistency():
    env = FakeObjectNavEnv(open_room_plan(seed=1), EnvConfig(width=64, height=48))
    o = env.reset()
    assert o["depth"].shape == (48, 64)
    assert 0.0 <= o["depth"].min() and o["depth"].max() <= 1.0
    # blocked forward motion is a collision, not a teleport
    for _ in range(60):
        o = env.step(1)
        if env.collisions:
            break
    assert -5.2 < env.x < 5.2 and -5.2 < env.y < 5.2


def test_metrics_failure_taxonomy():
    # reference tree (episode_stats_logger.py:53-55): false_positive requires
    # target_detected + the nav-goal-outside-target-bbox test
    r = M.compute_result(
        called_stop=True, distance_to_goal=3.0, success_radius=1.0,
        shortest_path=5.0, path_length=6.0, steps=50, max_steps=500,
        target_detected=True, target_seen=False, false_positive=True,
    )
    assert not r.success and r.failure_cause == "false_positive"
    r = M.compute_result(
        called_stop=True, distance_to_goal=3.0, success_radius=1.0,
        shortest_path=5.0, path_length=6.0, steps=50, max_steps=500,
        target_detected=False, target_seen=False,
    )
    assert r.failure_cause == "never_saw_target_did_not_travel_stairs_feasible"
    r = M.compute_result(
        called_stop=False, distance_to_goal=3.0, success_radius=1.0,
        shortest_path=5.0, path_length=6.0, steps=500, max_steps=500,
        target_detected=False, target_seen=True,
    )
    assert r.failure_cause == "false_negative"
    r = M.compute_result(
        called_stop=True, distance_to_goal=0.5, success_radius=1.0,
        shortest_path=5.0, path_length=5.5, steps=60, max_steps=500,
        target_detected=True, target_seen=True,
    )
    assert r.success and r.spl == 5.0 / 5.5
