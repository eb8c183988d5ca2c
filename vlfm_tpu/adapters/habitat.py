"""Habitat adapter: habitat observations -> policy step inputs.

Parity target: vlfm/policy/habitat_policies.py (HabitatMixin + registered
policies). habitat-lab stays an optional host-side dependency — this module
only needs numpy dicts shaped like habitat's observation space, so the
FakeObjectNavEnv and recorded traces exercise the same code path.

Key behaviours mirrored:
- goal id -> class-name tables for HM3D / MP3D (habitat_policies.py:28-51)
- camera intrinsics from config: fx = W / (2 tan(hfov/2)) (:89-91)
- GPS y-flip (habitat gps makes west negative, :186-187)
- depth hole filtering before mapping (:185)
- action ids STOP/FORWARD/LEFT/RIGHT (:54-58)
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from vlfm_tpu.config import VLFMConfig
from vlfm_tpu.mapping.grid import GridSpec2D
from vlfm_tpu.policy import itm
from vlfm_tpu.utils.geometry import xyz_yaw_to_tf_matrix

HM3D_ID_TO_NAME = ["chair", "bed", "potted plant", "toilet", "tv", "couch"]
MP3D_ID_TO_NAME = [
    "chair",
    "table|dining table|coffee table|side table|desk",
    "framed photograph",
    "cabinet",
    "pillow",
    "couch",
    "bed",
    "nightstand",
    "potted plant",
    "sink",
    "toilet",
    "stool",
    "towel",
    "tv",
    "shower",
    "bathtub",
    "counter",
    "fireplace",
    "gym equipment",
    "seating",
    "clothes",
]


def goal_name(object_id: int, dataset: str = "hm3d") -> str:
    table = HM3D_ID_TO_NAME if dataset == "hm3d" else MP3D_ID_TO_NAME
    return table[int(object_id)]


def filter_depth(depth: np.ndarray) -> np.ndarray:
    """Interpolate zero-depth holes from the nearest valid column pixel —
    the role of the external depth_camera_filtering package
    (habitat_policies.py:8,185)."""
    if not (depth == 0).any():
        return depth
    out = depth.copy()
    holes = out == 0
    # simple two-pass column fill (down then up)
    for sl in (slice(None, None, 1), slice(None, None, -1)):
        col = out[sl]
        m = col != 0
        idx = np.where(m, np.arange(col.shape[0])[:, None], 0)
        np.maximum.accumulate(idx, axis=0, out=idx)
        col[:] = col[idx, np.arange(col.shape[1])[None, :]]
    out[holes & (out == 0)] = 1.0
    return out


@dataclass
class HabitatObsAdapter:
    cfg: VLFMConfig
    dataset: str = "hm3d"

    def observation(self, obs: Dict[str, Any]) -> itm.Observation:
        """Build the policy observation from a habitat-style obs dict with
        keys rgb (H,W,3), depth (H,W[,1]), gps (2,), compass (1,)."""
        depth = np.asarray(obs["depth"], np.float32)
        depth = filter_depth(depth.reshape(depth.shape[:2]))
        x, y = np.asarray(obs["gps"], np.float32)[:2]
        yaw = float(np.asarray(obs["compass"]).reshape(-1)[0])
        cam = np.array([x, -y, self.cfg.camera.camera_height], np.float32)
        return itm.Observation(
            depth=jnp.asarray(depth),
            tf_camera_to_episodic=xyz_yaw_to_tf_matrix(jnp.asarray(cam), jnp.float32(yaw)),
            robot_xy=jnp.asarray(cam[:2]),
            robot_heading=jnp.float32(yaw),
        )

    def target_object(self, obs: Dict[str, Any]) -> str:
        return goal_name(int(np.asarray(obs["objectgoal"]).reshape(-1)[0]), self.dataset)

    @property
    def non_coco_caption(self) -> str:
        # MP3D multi-class caption (habitat_policies.py:136)
        if self.dataset == "mp3d":
            return " . ".join(MP3D_ID_TO_NAME).replace("|", " . ") + " ."
        return ""


class HabitatVLFMAgent:
    """Drop-in agent: habitat obs dict in, habitat action id out.

    This is the analogue of the registered HabitatITMPolicyV2 — construct it
    with a perception callable (see vlfm_tpu.parallel) and step it from any
    habitat-compatible eval loop.
    """

    def __init__(
        self,
        cfg: VLFMConfig,
        spec: GridSpec2D,
        pointnav,
        perceive,  # (rgb uint8 (H,W,3), target) -> (cosines (C,), masks (K,H,W), valid (K,))
        dataset: str = "hm3d",
        version: str = "v2",
    ):
        self.cfg = cfg
        self.spec = spec
        self.pointnav = pointnav
        self.perceive = perceive
        self.version = version
        self.adapter = HabitatObsAdapter(cfg, dataset)
        self.reset()

    def reset(self) -> None:
        self.state = itm.create_state(self.spec, self.cfg)
        self._rng = jax.random.PRNGKey(0)

    def act(self, obs: Dict[str, Any]) -> int:
        target = self.adapter.target_object(obs)
        out = self.perceive(np.asarray(obs["rgb"]), target)
        # perception may return an inferred object depth as a 4th element
        # (the all-ones-depth monocular trigger, base_objectnav_policy.py:314-318)
        cosines, masks, valid = out[:3]
        obj_depth = out[3] if len(out) > 3 and out[3] is not None else None
        self._rng, sub = jax.random.split(self._rng)
        action, info, self.state = itm.step(
            self.state,
            self.adapter.observation(obs),
            jnp.asarray(cosines),
            jnp.asarray(masks),
            jnp.asarray(valid),
            sub,
            object_depth=None if obj_depth is None else jnp.asarray(obj_depth),
            pointnav=self.pointnav,
            spec=self.spec,
            cfg=self.cfg,
            version=self.version,
        )
        self.last_info = info
        return int(action)
