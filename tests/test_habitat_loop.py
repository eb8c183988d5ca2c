"""Habitat-protocol eval loop over FakeHabitatEnv (VERDICT item #8) and the
video pipeline (item #10): ledger claims, per-episode stats, running-success
prints, mp4 generation with the one-step-delay compensation.

Parity targets: vlfm_trainer.py:164-325; habitat_visualizer.py:92-97.
"""

import os

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from vlfm_tpu.adapters.habitat import HabitatVLFMAgent  # noqa: E402
from vlfm_tpu.config import CameraConfig, VLFMConfig  # noqa: E402
from vlfm_tpu.mapping.grid import GridSpec2D  # noqa: E402
from vlfm_tpu.runner.fake_env import EnvConfig, FakeObjectNavEnv, open_room_plan  # noqa: E402
from vlfm_tpu.runner.habitat_eval import FakeHabitatEnv, evaluate  # noqa: E402
from vlfm_tpu.utils.video import VideoCollector, write_video  # noqa: E402

CFG = VLFMConfig(camera=CameraConfig(height=96, width=128),
                 max_frontiers=16, max_frontier_cells=256,
                 object_map_slots=8, object_map_points_per_slot=128)
SPEC = GridSpec2D(size=512, pixels_per_meter=20, pad=160)


def red_pixel_perceive(rgb, target):
    """'Perfect' perception from the synthetic env's rendering: the target is
    painted (220, 40, 40)."""
    mask = np.all(rgb == np.array([220, 40, 40], np.uint8), axis=-1)
    k = CFG.max_detections_per_frame
    masks = np.zeros((k, *rgb.shape[:2]), bool)
    valid = np.zeros(k, bool)
    if mask.sum() > 40:
        masks[0] = mask
        valid[0] = True
    cos = np.full(CFG.value_channels, 0.9 if valid[0] else 0.3, np.float32)
    return cos, masks, valid


def env_factory(i):
    env = FakeObjectNavEnv(open_room_plan(seed=i),
                           EnvConfig(width=128, height=96, max_steps=60))
    return FakeHabitatEnv(env, episode_id=str(i), object_category="toilet")


def make_agent():
    return HabitatVLFMAgent(CFG, SPEC, "greedy", red_pixel_perceive)


class TestEvalLoop:
    def test_episodes_produce_results_and_logs(self, tmp_path):
        log_dir = str(tmp_path / "logs")
        lines = []
        results = evaluate(env_factory, make_agent(), 3,
                           log_dir=log_dir, print_fn=lines.append)
        assert len(results) == 3
        assert any(r.success for r in results), "red-pixel oracle never succeeded"
        assert len(os.listdir(log_dir)) == 3
        assert all("running_success=" in ln for ln in lines)

    def test_ledger_claim_skips_owned_episodes(self, tmp_path):
        from vlfm_tpu.runner import log_saver

        log_dir = str(tmp_path / "logs")
        assert log_saver.claim_episode("1", "fake_scene", log_dir)  # steal ep 1
        results = evaluate(env_factory, make_agent(), 3,
                           log_dir=log_dir, print_fn=lambda s: None)
        assert len(results) == 2  # episode 1 skipped

    def test_video_generation(self, tmp_path):
        import cv2

        video_dir = str(tmp_path / "videos")
        results = evaluate(env_factory, make_agent(), 1,
                           video_dir=video_dir, print_fn=lambda s: None)
        files = os.listdir(video_dir)
        assert len(files) == 1
        cap = cv2.VideoCapture(os.path.join(video_dir, files[0]))
        n = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
        cap.release()
        # one-step-delay compensation drops exactly one trailing frame
        assert n == results[0].steps - 1


class TestVideoCollector:
    def test_delay_compensation_realigns_maps(self):
        """Map stream lags by one: after flush, frame i must pair obs i with
        maps produced at step i (habitat_visualizer.py:92-97)."""
        coll = VideoCollector(maps_delayed=True)
        # obs t painted with brightness t; maps from step t-1 painted t-1
        for t in range(4):
            rgb = np.full((16, 16, 3), t * 10, np.uint8)
            maps_from_prev_step = [np.full((8, 8, 3), max(t - 1, 0) * 10, np.uint8)]
            coll.collect(rgb, np.zeros((16, 16), np.float32), maps_from_prev_step)
        frames = coll.flush()
        assert len(frames) == 3  # trailing frame dropped
        for t, f in enumerate(frames):
            # left column: obs brightness t*10; right column: realigned maps
            # must show t*10 too (they were collected one step late)
            assert f[0, 0, 0] == t * 10
            right = f[:, -5, :]  # inside the map half
            assert (right == t * 10).any(), f"frame {t} maps not realigned"

    def test_write_video_round_trip(self, tmp_path):
        import cv2

        frames = [np.full((32, 48, 3), i * 20, np.uint8) for i in range(5)]
        path = write_video(frames, str(tmp_path / "v.mp4"))
        cap = cv2.VideoCapture(path)
        assert int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) == 5
        cap.release()


class TestVisualizationParity:
    def test_target_cloud_painted_and_start_yaw_reorients(self):
        """VERDICT round-2 item #9: the detected-object cloud appears on the
        rendered obstacle map (habitat_visualizer.py:228-253 role) and the
        maps reorient by the episode start yaw (:122-137 role)."""
        import numpy as np

        from vlfm_tpu.runner.habitat_eval import render_policy_maps

        agent = make_agent()
        env = env_factory(7)
        obs = env.reset()
        detected = False
        for _ in range(40):
            if env.episode_over:
                break
            a = agent.act(obs)
            detected = detected or bool(agent.last_info.target_detected)
            obs = env.step(a)
            if detected:
                break
        assert detected, "oracle perception never detected the target"
        maps = render_policy_maps(agent)
        magenta = np.all(maps[0] == np.array([255, 0, 255]), axis=-1)
        assert magenta.any(), "target cloud not painted onto the obstacle map"
        # start-yaw reorientation moves content; yaw=0 is the identity
        rot = render_policy_maps(agent, start_yaw=np.pi / 2)
        assert not np.array_equal(rot[0], maps[0])
        same = render_policy_maps(agent, start_yaw=0.0)
        np.testing.assert_array_equal(same[0], maps[0])

    def test_rotate_image_roundtrip(self):
        import numpy as np

        from vlfm_tpu.utils.visualization import rotate_image

        img = np.full((64, 64, 3), 255, np.uint8)
        img[10:20, 30:40] = (0, 0, 0)
        r = rotate_image(img, np.pi)  # 180 degrees
        # the black block lands diagonally opposite (center-symmetric);
        # check the strict interior to stay clear of interpolation edges
        assert (r[46:53, 26:33] < 50).all()
