"""SemExp/Gibson harness over the fake vec env (SURVEY item #30).

Parity target: vlfm/semexp_env/eval.py (loop semantics, obs merging, V2/V3
selection via EXPLORATION_THRESH, already-evaluated fast-forward, named
videos)."""

import os

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from vlfm_tpu.adapters.semexp import (  # noqa: E402
    FakeSemExpVecEnv,
    SemExpVLFMAgent,
    evaluate_semexp,
    merge_obs_infos,
)
from vlfm_tpu.config import CameraConfig, VLFMConfig  # noqa: E402
from vlfm_tpu.mapping.grid import GridSpec2D  # noqa: E402
from vlfm_tpu.runner.fake_env import EnvConfig, FakeObjectNavEnv, open_room_plan  # noqa: E402

CFG = VLFMConfig(camera=CameraConfig(height=96, width=128),
                 max_frontiers=16, max_frontier_cells=256,
                 object_map_slots=8, object_map_points_per_slot=128)
SPEC = GridSpec2D(size=512, pixels_per_meter=20, pad=160)


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


def make_envs(n):
    return FakeSemExpVecEnv(
        lambda i: FakeObjectNavEnv(open_room_plan(seed=i),
                                   EnvConfig(width=128, height=96, max_steps=60)),
        n,
    )


def test_merge_obs_infos_layout():
    obs = np.zeros((1, 4, 8, 10), np.float32)
    obs[0, 0] = 7  # red channel
    obs[0, 3] = 0.5  # depth
    infos = ({"goal_name": "potted-plant", "gps": [1, 2], "compass": [0.1],
              "heading": [0.1]},)
    d = merge_obs_infos(obs, infos)
    assert d["rgb"].shape == (8, 10, 3) and d["rgb"][0, 0, 0] == 7
    assert d["depth"].shape == (8, 10) and d["depth"][0, 0] == 0.5
    assert d["objectgoal"] == "potted plant"  # '-' -> ' ' (eval.py:141)


def test_exploration_thresh_selects_v3(monkeypatch):
    monkeypatch.setenv("EXPLORATION_THRESH", "0.5")
    agent = SemExpVLFMAgent(CFG, SPEC, "greedy", red_pixel_perceive)
    assert agent.version == "v3"
    assert agent.cfg.exploration_thresh == 0.5
    assert "|" in agent.cfg.text_prompt  # dual-channel prompt
    monkeypatch.delenv("EXPLORATION_THRESH")
    agent = SemExpVLFMAgent(CFG, SPEC, "greedy", red_pixel_perceive)
    assert agent.version == "v2"


def test_eval_loop_logs_and_videos(tmp_path):
    log_dir = str(tmp_path / "logs")
    video_dir = str(tmp_path / "videos")
    agent = SemExpVLFMAgent(CFG, SPEC, "greedy", red_pixel_perceive)
    results = evaluate_semexp(
        make_envs(2), agent, 2, max_episode_length=60,
        log_dir=log_dir, video_dir=video_dir, print_fn=lambda s: None,
    )
    assert len(results) == 2
    assert any(r["success"] for r in results)
    assert len(os.listdir(log_dir)) == 2
    vids = os.listdir(video_dir)
    assert len(vids) == 2
    assert all(v.startswith("epid=") and v.endswith(".mp4") for v in vids)
    # reference filename schema carries success/spl/target (eval.py:188-195)
    assert any("-succ=1-" in v for v in vids)


def test_already_evaluated_fast_forward(tmp_path):
    from vlfm_tpu.runner import log_saver

    log_dir = str(tmp_path / "logs")
    log_saver.log_episode("0", "fake_scene", {"success": 1.0}, log_dir)
    agent = SemExpVLFMAgent(CFG, SPEC, "greedy", red_pixel_perceive)
    results = evaluate_semexp(
        make_envs(2), agent, 2, max_episode_length=60,
        log_dir=log_dir, print_fn=lambda s: None,
    )
    # episode 0 was fast-forwarded with a STOP, not re-logged, and its bogus
    # 1-step metrics must NOT enter results (another shard owns it); only
    # episode 1 is this process's result
    assert len(results) == 1
    assert results[0]["episode_id"] == "1"
    files = os.listdir(log_dir)
    assert len(files) == 2  # the pre-existing record + episode 1
