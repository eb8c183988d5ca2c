import jax
import jax.numpy as jnp
import numpy as np

from tests.test_policy import CFG, SPEC, no_detections, obs_at, room_depth
from vlfm_tpu.policy import itm
from vlfm_tpu.runner.checkpoint import restore_pytree, save_pytree
from vlfm_tpu.runner.episode_driver import run_episode, run_episodes_batched
from vlfm_tpu.runner.fake_env import EnvConfig, FakeObjectNavEnv, open_room_plan


def test_mid_episode_checkpoint_resume(tmp_path):
    state = itm.create_state(SPEC, CFG)
    masks, mvalid = no_detections()
    rng = jax.random.PRNGKey(0)
    obs = obs_at(0.0, 0.0, 0.0, room_depth())
    for _ in range(3):
        _, _, state = itm.step(
            state, obs, jnp.array([0.4]), masks, mvalid, rng,
            pointnav="greedy", spec=SPEC, cfg=CFG,
        )
    path = save_pytree(str(tmp_path / "ckpt"), state)
    fresh = itm.create_state(SPEC, CFG)
    restored = restore_pytree(path, fresh)
    assert int(restored.steps) == 3
    # continuing from the restored state is identical to continuing live
    a1, i1, s1 = itm.step(
        state, obs, jnp.array([0.4]), masks, mvalid, rng,
        pointnav="greedy", spec=SPEC, cfg=CFG,
    )
    a2, i2, s2 = itm.step(
        restored, obs, jnp.array([0.4]), masks, mvalid, rng,
        pointnav="greedy", spec=SPEC, cfg=CFG,
    )
    assert int(a1) == int(a2)
    assert np.allclose(np.asarray(s1.value.conf), np.asarray(s2.value.conf))


def test_batched_matches_single_episode():
    from vlfm_tpu.config import CameraConfig, VLFMConfig
    from vlfm_tpu.mapping.grid import GridSpec2D

    cfg = VLFMConfig(camera=CameraConfig(height=96, width=128))
    spec = GridSpec2D(size=512, pixels_per_meter=20, pad=160)
    env_cfg = EnvConfig(width=128, height=96, max_steps=80)
    envs = [FakeObjectNavEnv(open_room_plan(seed=s), env_cfg) for s in range(2)]
    results, stats = run_episodes_batched(envs, "greedy", spec, cfg, seed=0)
    singles = []
    for s in range(2):
        env = FakeObjectNavEnv(open_room_plan(seed=s), env_cfg)
        r, _ = run_episode(env, "greedy", spec, cfg, seed=0)
        singles.append(r)
    for rb, rs in zip(results, singles):
        assert rb.success == rs.success
        assert rb.steps == rs.steps
        assert abs(rb.spl - rs.spl) < 1e-6
    assert stats.env_steps == sum(r.steps for r in results)
