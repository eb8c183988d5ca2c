from vlfm_tpu.config import CameraConfig, VLFMConfig
from vlfm_tpu.mapping.grid import GridSpec2D
from vlfm_tpu.runner.fake_env import EnvConfig, FakeObjectNavEnv, open_room_plan
from vlfm_tpu.runner.full_stack import FullStackPerception, run_full_stack_episode


def test_full_stack_episode_composes():
    """Every model family (ITM, detector, SAM) + maps + policy in one loop."""
    cfg = VLFMConfig(camera=CameraConfig(height=96, width=128))
    spec = GridSpec2D(size=512, pixels_per_meter=20, pad=160)
    env = FakeObjectNavEnv(
        open_room_plan(seed=0), EnvConfig(width=128, height=96, max_steps=16)
    )
    result, stats = run_full_stack_episode(env, spec, cfg)
    assert stats.env_steps == 16 or result.called_stop
    assert result.steps > 0


def test_perception_outputs_shapes():
    import numpy as np

    cfg = VLFMConfig(camera=CameraConfig(height=96, width=128))
    p = FullStackPerception(cfg)
    rgb = np.zeros((96, 128, 3), np.uint8)
    cos, masks, valid, _ = p(rgb, "toilet")
    assert cos.shape == (cfg.value_channels,)
    assert masks.shape == (cfg.max_detections_per_frame, 96, 128)
    assert valid.shape == (cfg.max_detections_per_frame,)
