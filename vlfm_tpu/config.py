"""Configuration dataclasses mirroring the reference's key surface.

Parity target: VLFMConfig (base_objectnav_policy.py:374-398) — same field
names and defaults so reference experiment configs translate 1:1 — plus the
camera/grid parameters the habitat adapter derives from the simulator config
(habitat_policies.py:74-119) and TPU-specific extensions.

Config loading is plain dataclasses + YAML/JSON dicts (no hydra dependency);
see ``load_config``.
"""

from __future__ import annotations

import dataclasses
import json
import math
from dataclasses import dataclass, field
from typing import Tuple


@dataclass(frozen=True)
class CameraConfig:
    """Static camera intrinsics (habitat_policies.py:89-91 derivation)."""

    height: int = 480
    width: int = 640
    hfov_deg: float = 79.0
    min_depth: float = 0.5
    max_depth: float = 5.0
    camera_height: float = 0.88

    @property
    def hfov(self) -> float:
        return math.radians(self.hfov_deg)

    @property
    def fx(self) -> float:
        return self.width / (2 * math.tan(self.hfov / 2))

    @property
    def fy(self) -> float:
        return self.fx

    @property
    def object_map_cone_fov(self) -> float:
        # get_fov(fx, width) (base_objectnav_policy.py:349)
        return 2 * math.atan((self.width / 2) / self.fx)


@dataclass(frozen=True)
class VLFMConfig:
    """Field-for-field mirror of the reference policy config."""

    name: str = "ITMPolicyV2"
    text_prompt: str = "Seems like there is a target_object ahead."
    pointnav_policy_path: str = "data/pointnav_weights.pth"
    depth_image_shape: Tuple[int, int] = (224, 224)
    pointnav_stop_radius: float = 0.9
    use_max_confidence: bool = False
    object_map_erosion_size: int = 5
    # largest-cluster DBSCAN filter on detection clouds (the reference's
    # use_dbscan, object_point_cloud_map.py:19 — True in sim, False in its
    # Reality configuration, reality_policies.py:43)
    use_object_map_dbscan: bool = True
    exploration_thresh: float = 0.0
    obstacle_map_area_threshold: float = 1.5  # square meters
    min_obstacle_height: float = 0.61
    max_obstacle_height: float = 0.88
    hole_area_thresh: int = 100000
    use_vqa: bool = False
    vqa_prompt: str = "Is this "
    coco_threshold: float = 0.8
    non_coco_threshold: float = 0.4
    agent_radius: float = 0.18

    # Value-map fusion ablations (reference: MAP_FUSION_TYPE env,
    # value_map.py:74-75): "default" | "replace" | "equal_weighting".
    map_fusion_type: str = "default"

    # --- TPU-framework extensions (not in the reference) ---
    camera: CameraConfig = field(default_factory=CameraConfig)
    map_size: int = 1024
    pixels_per_meter: int = 20
    map_pad: int = 160
    max_frontiers: int = 32
    max_frontier_cells: int = 512
    max_detections_per_frame: int = 8
    # Frames-per-pass SAM sub-batch size (None = every frame in one call):
    # detection frames segment in ceil(dense/capacity) passes, so cost
    # tracks density and no detection drops — the batched analogue of the
    # reference running SAM only on frames with detections
    # (base_objectnav_policy.py:311-321); see
    # DetectionPipeline.sam_frame_capacity.
    sam_frame_capacity: Optional[int] = None
    # Detection-slot sub-batch size for the VQA veto (None = dense all
    # (frame, slot) pairs): valid detections verify in
    # ceil(n_valid/capacity) passes, the batched analogue of the reference's
    # one VQA call per detection (base_objectnav_policy.py:326-335); see
    # VQAVeto.slot_capacity.
    vqa_slot_capacity: Optional[int] = None
    object_map_slots: int = 64
    object_map_points_per_slot: int = 512
    # Full 360-degree spin: the reference's `_num_steps < 11` check is set one
    # step late, yielding 12 TURN_LEFTs total (habitat_policies.py:150-153).
    num_init_turns: int = 12
    sync_explored_areas: bool = False

    @property
    def value_channels(self) -> int:
        return len(self.text_prompt.split("|"))


def load_config(path_or_dict) -> VLFMConfig:
    """Build a VLFMConfig from a dict, JSON, or YAML file."""
    if isinstance(path_or_dict, dict):
        d = dict(path_or_dict)
    else:
        text = open(path_or_dict).read()
        if str(path_or_dict).endswith((".yaml", ".yml")):
            import yaml

            d = yaml.safe_load(text) or {}
        else:
            d = json.loads(text) if text.strip() else {}
    cam = d.pop("camera", None)
    names = {f.name for f in dataclasses.fields(VLFMConfig)}
    unknown = set(d) - names
    if unknown:
        raise ValueError(f"Unknown config keys: {sorted(unknown)}")
    cfg = VLFMConfig(**d)
    if cam is not None:
        cfg = dataclasses.replace(cfg, camera=CameraConfig(**cam))
    import os

    if os.environ.get("MAP_FUSION_TYPE"):
        cfg = dataclasses.replace(cfg, map_fusion_type=os.environ["MAP_FUSION_TYPE"])
    return cfg
