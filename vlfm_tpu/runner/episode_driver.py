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
from dataclasses import dataclass
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
    final_state: object = None  # set when run_episode(keep_state=True)

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


def _step_key(episode_seed: int, step: int):
    """Per-(episode, step) rng, independent of lane scheduling — recycled
    lanes reproduce fresh-driver results bit-for-bit."""
    return jax.random.fold_in(jax.random.PRNGKey(episode_seed), step)


def run_episodes_recycled(
    env_factory,
    episode_seeds,
    lanes: int,
    pointnav,
    spec: GridSpec2D,
    cfg: VLFMConfig,
    *,
    version: str = "v2",
    max_steps: Optional[int] = None,
):
    """Continuous batching: finished lanes reset IN PLACE and immediately
    take the next episode from the queue, so throughput stays flat under
    episode-length variance.

    Replaces the reference's envs_to_pause batch-shrinking
    (vlfm_trainer.py:232-246); here the batch never shrinks — a finished
    lane's map state is reset on device (one jnp.where per step) and the
    lane keeps working.

    ``env_factory(seed) -> env``. Returns ({seed: EpisodeResult}, DriverStats).
    """
    base = itm.create_state(spec, cfg)
    fresh = jax.tree_util.tree_map(lambda x: jnp.broadcast_to(x, (lanes, *x.shape)), base)
    bstate = jax.tree_util.tree_map(jnp.copy, fresh)
    k = cfg.max_detections_per_frame

    def one(state, obs, cosines, masks, valid, rng):
        return itm.step(
            state, obs, cosines, masks, valid, rng,
            pointnav=pointnav, spec=spec, cfg=cfg, version=version,
        )

    step_fn = jax.jit(jax.vmap(one))

    @jax.jit
    def reset_lanes(bs, done_mask):
        def sel(b, f):
            m = done_mask.reshape((lanes,) + (1,) * (b.ndim - 1))
            return jnp.where(m, f, b)

        return jax.tree_util.tree_map(sel, bs, fresh)

    queue = list(episode_seeds)
    assert lanes <= len(queue), "need at least one episode per lane"
    lane_seed = [queue.pop(0) for _ in range(lanes)]
    lane_env = [env_factory(s) for s in lane_seed]
    lane_active = [True] * lanes
    obs_list = [e.reset() for e in lane_env]
    shortest = [e.shortest_path_length() for e in lane_env]
    lane_step = [0] * lanes
    seen = [False] * lanes
    detected = [False] * lanes
    limit = max_steps or lane_env[0].cfg.max_steps

    # reference-form taxonomy inputs, per lane — the same signals run_episode
    # feeds compute_result, so all drivers produce identical failure causes
    from vlfm_tpu.utils.measurements import TraveledStairs

    stairs = [TraveledStairs() for _ in range(lanes)]
    last_goal = [None] * lanes

    results = {}
    stats = DriverStats()
    t0 = time.time()
    while any(lane_active):
        stacked_obs = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs), *[_obs_from_env(o, cfg) for o in obs_list]
        )
        masks_np = np.zeros((lanes, k, *obs_list[0]["depth"].shape), bool)
        valid_np = np.zeros((lanes, k), bool)
        cos_np = np.zeros((lanes, cfg.value_channels), np.float32)
        for i, o in enumerate(obs_list):
            cos_np[i] = o["cosine"]
            if o["target_visible"]:
                masks_np[i, 0] = o["target_mask"]
                valid_np[i, 0] = True
        rngs = jnp.stack([_step_key(lane_seed[i], lane_step[i]) for i in range(lanes)])
        actions, infos, bstate = step_fn(
            bstate, stacked_obs, jnp.asarray(cos_np), jnp.asarray(masks_np),
            jnp.asarray(valid_np), rngs,
        )
        actions_np = np.asarray(actions)
        detected_np = np.asarray(infos.target_detected)
        goals_np = np.asarray(infos.goal)

        done_mask = np.zeros(lanes, bool)
        for i in range(lanes):
            if not lane_active[i]:
                done_mask[i] = True  # keep idle lanes zeroed
                continue
            o = obs_list[i]
            seen[i] = seen[i] or o["target_visible"]
            detected[i] = detected[i] or bool(detected_np[i])
            stairs[i].update(o.get("agent_z", 0.0))
            last_goal[i] = goals_np[i]
            obs_list[i] = lane_env[i].step(int(actions_np[i]))
            lane_step[i] += 1
            stats.env_steps += 1
            if obs_list[i]["done"] or lane_step[i] >= limit:
                e = lane_env[i]
                target = getattr(e.plan, "target", None) if hasattr(e, "plan") else None
                seen_map = (
                    M.was_target_seen(
                        np.asarray(bstate.obstacle.explored[i]), spec, target
                    )
                    if target is not None else False
                )
                fp = None
                if target is not None and detected[i] and last_goal[i] is not None:
                    fp = M.was_false_positive(
                        last_goal[i], target, e.plan.target_radius
                    )
                results[lane_seed[i]] = M.compute_result(
                    called_stop=e.called_stop,
                    distance_to_goal=obs_list[i]["distance_to_goal"],
                    success_radius=e.cfg.success_radius,
                    shortest_path=shortest[i],
                    path_length=e.path_length,
                    steps=e.steps,
                    max_steps=limit,
                    target_detected=detected[i],
                    target_seen=seen[i] or seen_map,
                    collisions=e.collisions,
                    false_positive=fp,
                    traveled_stairs=stairs[i].traveled_stairs,
                    feasible=getattr(e, "path_feasible", True),
                )
                done_mask[i] = True
                if queue:  # recycle the lane in place
                    lane_seed[i] = queue.pop(0)
                    lane_env[i] = env_factory(lane_seed[i])
                    obs_list[i] = lane_env[i].reset()
                    shortest[i] = lane_env[i].shortest_path_length()
                    lane_step[i] = 0
                    seen[i] = detected[i] = False
                    stairs[i] = TraveledStairs()
                    last_goal[i] = None
                else:
                    lane_active[i] = False
        if done_mask.any():
            bstate = reset_lanes(bstate, jnp.asarray(done_mask))
    stats.wall_time = time.time() - t0
    return results, stats


def run_episodes_batched(
    envs: List[FakeObjectNavEnv],
    pointnav,
    spec: GridSpec2D,
    cfg: VLFMConfig,
    *,
    version: str = "v2",
    max_steps: Optional[int] = None,
    seed: int = 0,
):
    """Run N episodes in lockstep as ONE vmapped device program per step.

    This is the throughput configuration the reference cannot express (its
    policy asserts a single env, base_objectnav_policy.py:153): per-episode
    map state lives batched in HBM; the host only stacks observations and
    scatters actions. Finished episodes idle (their actions are ignored)
    until the whole batch drains.

    Returns (results, DriverStats) where stats counts ACTIVE env steps.
    """
    batch = len(envs)
    limit = max_steps or envs[0].cfg.max_steps
    base = itm.create_state(spec, cfg)
    bstate = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (batch, *x.shape)).copy(), base
    )
    k = cfg.max_detections_per_frame

    def one(state, obs, cosines, masks, valid, rng):
        return itm.step(
            state, obs, cosines, masks, valid, rng,
            pointnav=pointnav, spec=spec, cfg=cfg, version=version,
        )

    step_fn = jax.jit(jax.vmap(one))

    obs_list = [e.reset() for e in envs]
    shortest = [e.shortest_path_length() for e in envs]
    target_seen = [False] * batch
    target_detected = [False] * batch
    rng = jax.random.PRNGKey(seed)
    stats = DriverStats()
    t0 = time.time()

    while not all(o["done"] for o in obs_list):
        stacked_obs = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs), *[_obs_from_env(o, cfg) for o in obs_list]
        )
        masks_np = np.zeros((batch, k, *obs_list[0]["depth"].shape), bool)
        valid_np = np.zeros((batch, k), bool)
        cos_np = np.zeros((batch, cfg.value_channels), np.float32)
        for i, o in enumerate(obs_list):
            cos_np[i] = o["cosine"]
            if o["target_visible"]:
                masks_np[i, 0] = o["target_mask"]
                valid_np[i, 0] = True
        rng, sub = jax.random.split(rng)
        subs = jax.random.split(sub, batch)
        actions, infos, bstate = step_fn(
            bstate, stacked_obs, jnp.asarray(cos_np), jnp.asarray(masks_np),
            jnp.asarray(valid_np), subs,
        )
        actions_np = np.asarray(actions)
        detected_np = np.asarray(infos.target_detected)
        goals_np = np.asarray(infos.goal)
        for i, (env, o) in enumerate(zip(envs, obs_list)):
            if o["done"]:
                continue
            target_seen[i] = target_seen[i] or o["target_visible"]
            target_detected[i] = target_detected[i] or bool(detected_np[i])
            obs_list[i] = env.step(int(actions_np[i]))
            stats.env_steps += 1
    stats.wall_time = time.time() - t0

    results = [
        M.compute_result(
            called_stop=e.called_stop,
            distance_to_goal=o["distance_to_goal"],
            success_radius=e.cfg.success_radius,
            shortest_path=shortest[i],
            path_length=e.path_length,
            steps=e.steps,
            max_steps=limit,
            target_detected=target_detected[i],
            target_seen=target_seen[i],
            collisions=e.collisions,
        )
        for i, (e, o) in enumerate(zip(envs, obs_list))
    ]
    return results, stats


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
    keep_state: bool = False,
) -> tuple:
    """Run one episode to completion. Returns (EpisodeResult, DriverStats)."""
    from vlfm_tpu.utils.measurements import TraveledStairs

    o = env.reset()
    state = itm.create_state(spec, cfg)
    stats = DriverStats()
    target_seen = False
    target_detected = False
    stairs = TraveledStairs()
    last_goal = None
    limit = max_steps or env.cfg.max_steps

    shortest = env.shortest_path_length()
    t0 = time.time()
    while not o["done"] and env.steps < limit:
        # per-(episode, step) key — matches the recycled driver's stream
        sub = _step_key(seed, stats.env_steps)
        stairs.update(o.get("agent_z", 0.0))
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
            on_step(env, o, info, state)
        last_goal = np.asarray(info.goal)
        o = env.step(int(action))
        stats.env_steps += 1
    stats.wall_time = time.time() - t0
    if keep_state:
        stats.final_state = state

    # reference-form taxonomy inputs (episode_stats_logger.py:44-111):
    # map-based 'seen' (explored area covers the target) and the
    # nav-goal-in-target-bbox false-positive test
    target = getattr(env.plan, "target", None) if hasattr(env, "plan") else None
    seen_map = (
        M.was_target_seen(state.obstacle.explored, spec, target)
        if target is not None else False
    )
    fp = None
    if target is not None and target_detected and last_goal is not None:
        fp = M.was_false_positive(last_goal, target, env.plan.target_radius)

    result = M.compute_result(
        called_stop=env.called_stop,
        distance_to_goal=o["distance_to_goal"],
        success_radius=env.cfg.success_radius,
        shortest_path=shortest,
        path_length=env.path_length,
        steps=env.steps,
        max_steps=limit,
        target_detected=target_detected,
        target_seen=target_seen or seen_map,
        collisions=env.collisions,
        false_positive=fp,
        traveled_stairs=stairs.traveled_stairs,
        feasible=getattr(env, "path_feasible", True),
    )
    return result, stats
