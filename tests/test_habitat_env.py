"""make_habitat_env / HabitatEnvWrapper, fully covered air-gapped against a
mock ``habitat`` module (VERDICT round-2 item #5).

Parity targets: the env init + obs adaptation + metrics extraction of
VLFMTrainer (vlfm_trainer.py:99-105, 164-325), the config patching of
vlfm/run.py:37-55, and the failure-taxonomy inputs of
episode_stats_logger.py:44-111.
"""

import json
import sys

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

import mock_habitat  # noqa: E402
from vlfm_tpu.adapters.habitat import HabitatVLFMAgent  # noqa: E402
from vlfm_tpu.config import CameraConfig, VLFMConfig  # noqa: E402
from vlfm_tpu.mapping.grid import GridSpec2D  # noqa: E402
from vlfm_tpu.runner.habitat_eval import (  # noqa: E402
    evaluate,
    habitat_false_positive,
    habitat_target_seen,
    make_habitat_env,
)

CFG = VLFMConfig(camera=CameraConfig(height=96, width=128),
                 max_frontiers=16, max_frontier_cells=256,
                 object_map_slots=8, object_map_points_per_slot=128)
SPEC = GridSpec2D(size=512, pixels_per_meter=20, pad=160)


@pytest.fixture()
def habitat_mock():
    mod = mock_habitat.install()
    yield mod
    mock_habitat.uninstall()


def red_pixel_perceive(rgb, target):
    mask = np.all(rgb == np.array([220, 40, 40], np.uint8), axis=-1)
    k = CFG.max_detections_per_frame
    masks = np.zeros((k, *rgb.shape[:2]), bool)
    valid = np.zeros(k, bool)
    if mask.sum() > 40:
        masks[0] = mask
        valid[0] = True
    cos = np.full(CFG.value_channels, 0.9 if valid[0] else 0.3, np.float32)
    return cos, masks, valid


def test_import_is_the_only_failure_without_habitat():
    assert "habitat" not in sys.modules
    with pytest.raises(ModuleNotFoundError, match="habitat"):
        make_habitat_env()


def test_config_extraction_and_sensor_drop(habitat_mock):
    env = make_habitat_env("my/config.yaml", overrides=("a=b",))
    # radius + max steps come from the habitat task config, not defaults
    assert env._radius == mock_habitat.SUCCESS_DISTANCE
    assert env._max_steps == mock_habitat.MAX_EPISODE_STEPS
    # the semantic sensor is dropped exactly like vlfm/run.py:50-54
    sensors = env._env.config.habitat.simulator.agents.main_agent.sim_sensors
    assert "semantic_sensor" not in sensors and "rgb_sensor" in sensors
    assert env._env.config.config_path == "my/config.yaml"
    assert env._env.config.overrides == ["a=b"]


def test_obs_adaptation_and_bookkeeping(habitat_mock):
    env = make_habitat_env().advance()
    ep = env.current_episode  # available BEFORE reset (ledger claims)
    assert ep.episode_id == "0" and ep.object_category == "toilet"
    obs = env.reset()
    assert obs["rgb"].dtype == np.uint8 and obs["rgb"].shape == (96, 128, 3)
    assert obs["depth"].shape == (96, 128, 1) and obs["depth"].dtype == np.float32
    assert obs["gps"].shape == (2,) and obs["compass"].shape == (1,)
    assert obs["objectgoal"].tolist() == [3]
    for a in (1, 2, 1):
        obs = env.step(a)
    m = env.get_metrics()
    assert m["steps"] == 3 and not m["called_stop"]
    assert m["path_length"] > 0.0  # two forward steps moved the agent
    assert m["success_radius"] == mock_habitat.SUCCESS_DISTANCE
    assert m["shortest_path"] > 0.0
    assert m["soft_spl"] >= 0.0  # read from the "softspl" spelling
    env.step(0)
    assert env.get_metrics()["called_stop"]


def test_action_name_passthrough(habitat_mock):
    env = make_habitat_env(pass_action_names=True).advance()
    env.reset()
    env.step(1)
    assert env._env.step_action_types[-1] is str


def test_advance_iterates_episodes(habitat_mock):
    env = make_habitat_env()
    assert env.advance().current_episode.episode_id == "0"
    env.reset()
    assert env.advance().current_episode.episode_id == "1"


def test_full_episode_through_evaluate(habitat_mock, tmp_path):
    env = make_habitat_env()
    agent = HabitatVLFMAgent(CFG, SPEC, "greedy", red_pixel_perceive)
    log_dir = str(tmp_path / "logs")
    results = evaluate(lambda i: env.advance(), agent, 2,
                       log_dir=log_dir, print_fn=lambda s: None)
    assert len(results) == 2
    for r in results:
        assert r.steps > 0 and r.path_length > 0
        assert r.success or r.failure_cause is not None
    logged = sorted((tmp_path / "logs").iterdir())
    assert len(logged) == 2
    data = json.loads(logged[0].read_text())
    assert data["target_object"] == "toilet"


def test_taxonomy_helpers_roundtrip(habitat_mock):
    """target_seen + false_positive agree with the mock's geometry."""
    env = make_habitat_env().advance()
    env.reset()
    target = np.asarray(env._env._env.plan.target)
    tdm = env._env.get_metrics()["top_down_map"]
    # the nav goal ON the target is not a false positive; 3 m away it is
    assert habitat_false_positive(tdm, target) is False
    assert habitat_false_positive(tdm, target + np.array([3.0, 3.0])) is True
    assert habitat_false_positive(tdm, np.array([1e6, 1e6])) is True  # off-map
    # drive the agent around; fog eventually overlaps the dilated bbox or not,
    # but the helper must be consistent with a hand check
    seen = habitat_target_seen(tdm)
    from vlfm_tpu.runner.habitat_eval import _dilate_bool

    want = bool(np.logical_and(tdm["fog_of_war_mask"],
                               _dilate_bool(tdm["target_bboxes_mask"], 5)).any())
    assert seen == want
    # missing-fields degrade to None / False, not crashes
    assert habitat_false_positive({}, target) is None
    assert habitat_target_seen({}) is False


def test_run_py_habitat_backend(habitat_mock, tmp_path, monkeypatch, capsys):
    """`python -m vlfm_tpu.run --backend habitat` end-to-end on the mock
    (VERDICT item #5's done-criterion)."""
    import yaml

    cfg_path = tmp_path / "cfg.yaml"
    cfg_path.write_text(yaml.safe_dump({
        "camera": {"height": 96, "width": 128},
        "max_frontiers": 16,
        "max_frontier_cells": 256,
        "object_map_slots": 8,
        "object_map_points_per_slot": 128,
    }))
    monkeypatch.setattr(sys, "argv", [
        "vlfm_tpu.run", "--backend", "habitat", "--episodes", "1",
        "--config", str(cfg_path), "--cpu",
    ])
    from vlfm_tpu.run import main

    main()
    out = capsys.readouterr().out
    agg = json.loads(out[out.index("{"):])
    assert agg["episodes"] == 1
