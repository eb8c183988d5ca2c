"""Continuous batching: recycled lanes must reproduce fresh-driver results.

Replaces the reference's envs_to_pause machinery (vlfm_trainer.py:232-246);
VERDICT round-1 item #6.
"""

import pytest

jnp = pytest.importorskip("jax.numpy")

from vlfm_tpu.config import CameraConfig, VLFMConfig  # noqa: E402
from vlfm_tpu.mapping.grid import GridSpec2D  # noqa: E402
from vlfm_tpu.runner.episode_driver import (  # noqa: E402
    run_episode,
    run_episodes_recycled,
)
from vlfm_tpu.runner.fake_env import EnvConfig, FakeObjectNavEnv, open_room_plan

CFG = VLFMConfig(camera=CameraConfig(height=96, width=128),
                 max_frontiers=16, max_frontier_cells=256,
                 object_map_slots=8, object_map_points_per_slot=128)
SPEC = GridSpec2D(size=512, pixels_per_meter=20, pad=160)
ENV = EnvConfig(width=128, height=96, max_steps=48)


def factory(seed):
    return FakeObjectNavEnv(open_room_plan(seed=seed), ENV)


def test_recycled_results_match_fresh_runs():
    seeds = [0, 1, 2, 3]
    recycled, stats = run_episodes_recycled(
        factory, seeds, lanes=2, pointnav="greedy", spec=SPEC, cfg=CFG
    )
    assert set(recycled) == set(seeds)
    assert stats.env_steps >= 4

    for s in seeds:
        fresh, _ = run_episode(factory(s), "greedy", SPEC, CFG, seed=s)
        r = recycled[s]
        assert r.success == fresh.success, f"seed {s}: success diverged"
        assert r.steps == fresh.steps, f"seed {s}: step count diverged"
        assert abs(r.spl - fresh.spl) < 1e-6, f"seed {s}: spl diverged"


def test_all_lanes_stay_busy():
    """With more episodes than lanes, the batch never shrinks until the queue
    drains: total device steps ~= sum of per-episode lengths (no idle-lane
    padding steps are counted)."""
    seeds = list(range(6))
    recycled, stats = run_episodes_recycled(
        factory, seeds, lanes=3, pointnav="greedy", spec=SPEC, cfg=CFG
    )
    total = sum(r.steps for r in recycled.values())
    assert stats.env_steps == total
