"""Host-side episode driver: runs the jitted policy step against environments.

Replaces the reference's VLFMTrainer eval loop (vlfm_trainer.py:164-325).
Differences by design:
- the policy step is ONE device program; the host only shuttles observations
  in and actions out (the reference crosses process boundaries for every
  model call);
- N episodes run as a vmapped batch on one chip (the reference hard-asserts
  a single env, base_objectnav_policy.py:153).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Callable, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from vlfm_tpu.config import VLFMConfig
from vlfm_tpu.mapping.grid import GridSpec2D
from vlfm_tpu.models.pointnav import PointNavPolicy
from vlfm_tpu.policy import itm
from vlfm_tpu.runner import metrics as M
from vlfm_tpu.runner.fake_env import FakeObjectNavEnv
from vlfm_tpu.utils.geometry import xyz_yaw_to_tf_matrix


@dataclass
class DriverStats:
    env_steps: int = 0
    wall_time: float = 0.0

    @property
    def steps_per_sec(self) -> float:
        return self.env_steps / self.wall_time if self.wall_time else 0.0


def _obs_from_env(o, cfg: VLFMConfig) -> itm.Observation:
    cam_pos = jnp.array([o["robot_xy"][0], o["robot_xy"][1], cfg.camera.camera_height])
    return itm.Observation(
        depth=jnp.asarray(o["depth"]),
        tf_camera_to_episodic=xyz_yaw_to_tf_matrix(cam_pos, jnp.float32(o["heading"])),
        robot_xy=jnp.asarray(o["robot_xy"]),
        robot_heading=jnp.float32(o["heading"]),
    )


def _masks_from_env(o, cfg: VLFMConfig):
    k = cfg.max_detections_per_frame
    h, w = o["depth"].shape
    masks = np.zeros((k, h, w), bool)
    valid = np.zeros(k, bool)
    if o["target_visible"]:
        masks[0] = o["target_mask"]
        valid[0] = True
    return jnp.asarray(masks), jnp.asarray(valid)


def run_episode(
    env: FakeObjectNavEnv,
    pointnav: PointNavPolicy,
    spec: GridSpec2D,
    cfg: VLFMConfig,
    *,
    version: str = "v2",
    max_steps: Optional[int] = None,
    seed: int = 0,
    on_step: Optional[Callable] = None,
) -> tuple:
    """Run one episode to completion. Returns (EpisodeResult, DriverStats)."""
    o = env.reset()
    state = itm.create_state(spec, cfg)
    rng = jax.random.PRNGKey(seed)
    stats = DriverStats()
    target_seen = False
    target_detected = False
    limit = max_steps or env.cfg.max_steps

    shortest = env.shortest_path_length()
    t0 = time.time()
    while not o["done"] and env.steps < limit:
        rng, sub = jax.random.split(rng)
        obs = _obs_from_env(o, cfg)
        masks, mvalid = _masks_from_env(o, cfg)
        action, info, state = itm.step(
            state,
            obs,
            jnp.full((cfg.value_channels,), o["cosine"], jnp.float32),
            masks,
            mvalid,
            sub,
            pointnav=pointnav,
            spec=spec,
            cfg=cfg,
            version=version,
        )
        target_seen = target_seen or o["target_visible"]
        target_detected = target_detected or bool(info.target_detected)
        if on_step is not None:
            on_step(env, o, info)
        o = env.step(int(action))
        stats.env_steps += 1
    stats.wall_time = time.time() - t0

    result = M.compute_result(
        called_stop=env.called_stop,
        distance_to_goal=o["distance_to_goal"],
        success_radius=env.cfg.success_radius,
        shortest_path=shortest,
        path_length=env.path_length,
        steps=env.steps,
        max_steps=limit,
        target_detected=target_detected,
        target_seen=target_seen,
        collisions=env.collisions,
    )
    return result, stats
