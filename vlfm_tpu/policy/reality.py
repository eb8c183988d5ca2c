"""Reality (Spot) policy composition: multi-camera obstacle fusion, arm-yaw
initialization, continuous (angular, linear) actions.

Parity target: vlfm/policy/reality_policies.py (RealityMixin +
RealityITMPolicyV2):

- initialize = 8 gripper-camera arm yaws -90..+90 deg then 0
  (reality_policies.py:16,100-102); during initialization the base does not
  move (angular = linear = 0, :79-86).
- _cache_observations fuses N body depth cameras into the obstacle map with
  explore=False, then one final hand-camera update with explore=True and
  update_obstacles=False (:104-139). The first 10 steps use all 5 body cams,
  afterwards only the front pair (objectnav_env.py:186-190) — here a fixed
  5-slot stack with validity flags.
- sync_explored_areas=True (:39): the value map is masked by the obstacle
  map's explored area.
- actions are continuous: the PointNav Gaussian head's (angular, linear)
  mean (reality_policies.py:69-89; the reference indexes action[0][0] as
  angular and action[0][1] as linear), with rho_theta passed through in the
  action dict (:87-88). STOP -> (0, 0) + stop flag (_stop_action, :28).
- the object map's depth may be monocular-inferred (all-ones hand depth,
  base_objectnav_policy.py:314-318) — the host wrapper does that and passes
  ``object_depth``; DBSCAN is disabled on the robot
  (reality_policies.py:43).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from vlfm_tpu.config import VLFMConfig
from vlfm_tpu.mapping import object_map as OBJ
from vlfm_tpu.mapping import obstacle_map as OM
from vlfm_tpu.mapping import value_map as VM
from vlfm_tpu.mapping.grid import GridSpec2D
from vlfm_tpu.policy import itm
from vlfm_tpu.policy.frontier_selection import reduce_values_v3, select_best_frontier
from vlfm_tpu.utils.geometry import rho_theta

# reality_policies.py:16
INITIAL_ARM_YAWS = np.deg2rad([-90, -60, -30, 0, 30, 60, 90, 0]).astype(np.float32)
NUM_INIT_YAWS = len(INITIAL_ARM_YAWS)
MAX_BODY_CAMS = 5


class BodyCams(NamedTuple):
    """Fixed 5-slot stack of body depth cameras (padded + validity flags)."""

    depth: jnp.ndarray  # (5, H, W) normalized [0, 1]
    tf: jnp.ndarray  # (5, 4, 4) camera -> episodic
    fx: jnp.ndarray  # (5,)
    fy: jnp.ndarray  # (5,)
    fov: jnp.ndarray  # (5,) topdown fov (radians)
    max_depth: jnp.ndarray  # (5,)
    valid: jnp.ndarray  # (5,) bool


class HandCam(NamedTuple):
    tf: jnp.ndarray  # (4, 4) camera -> episodic
    fov: jnp.ndarray  # ()
    fx: jnp.ndarray  # ()
    fy: jnp.ndarray  # ()
    max_depth: jnp.ndarray  # ()


class RealityAction(NamedTuple):
    angular: jnp.ndarray  # ()
    linear: jnp.ndarray  # ()
    arm_yaw: jnp.ndarray  # () — -1.0 when not initializing
    stop: jnp.ndarray  # () bool
    rho: jnp.ndarray
    theta: jnp.ndarray


def create_state(spec: GridSpec2D, cfg: VLFMConfig) -> itm.PolicyState:
    state = itm.create_state(spec, cfg)
    # continuous PointNav recurrence (prev_action is (B, 2))
    from vlfm_tpu.models.pointnav import initial_state

    return state._replace(pointnav=initial_state(1, discrete=False))


@partial(jax.jit, static_argnames=("pointnav", "spec", "cfg", "version"))
def reality_step(
    state: itm.PolicyState,
    body: BodyCams,
    hand: HandCam,
    cosines: jnp.ndarray,  # (C,) ITM scores of the hand RGB
    value_depth: jnp.ndarray,  # (Hv, Wv) — all-ones on the robot (see module doc)
    object_depth: jnp.ndarray,  # (Ho, Wo) — monocular-inferred when hand depth is ones
    det_masks: jnp.ndarray,  # (K, Ho, Wo) bool
    det_valid: jnp.ndarray,  # (K,) bool
    nav_depth: jnp.ndarray,  # (Hn, Wn) front-pair depth for PointNav
    robot_xy: jnp.ndarray,  # (2,)
    robot_heading: jnp.ndarray,  # ()
    rng: jnp.ndarray,
    *,
    pointnav,
    spec: GridSpec2D,
    cfg: VLFMConfig,
    version: str = "v2",
):
    # --- obstacle map: N body cams, explore=False (reality_policies.py:115-127)
    obstacle = state.obstacle

    def one_cam(om_state, i):
        def do(o):
            return OM.update(
                o, spec, body.depth[i], body.tf[i],
                0.0, body.max_depth[i], body.fx[i], body.fy[i], body.fov[i],
                cfg.min_obstacle_height, cfg.max_obstacle_height,
                cfg.obstacle_map_area_threshold,
                agent_radius=cfg.agent_radius,
                explore=False,
            )

        return jax.lax.cond(body.valid[i], do, lambda o: o, om_state), None

    for i in range(MAX_BODY_CAMS):  # static unroll: per-cam shapes are static
        obstacle, _ = one_cam(obstacle, i)

    # --- final explore-only update from the hand camera
    # (reality_policies.py:129-139: update_obstacles=False, explore=True)
    obstacle = OM.update(
        obstacle, spec,
        jnp.zeros_like(body.depth[0]),  # unused when update_obstacles=False
        hand.tf, 0.0, hand.max_depth, hand.fx, hand.fy, hand.fov,
        cfg.min_obstacle_height, cfg.max_obstacle_height,
        cfg.obstacle_map_area_threshold,
        full_prune=(state.steps % 8) == 0,
        agent_radius=cfg.agent_radius,
        explore=True,
        update_obstacles=False,
        max_frontier_cells=cfg.max_frontier_cells,
        max_frontiers=cfg.max_frontiers,
    )

    # --- value map (sync_explored_areas=True, reality_policies.py:39)
    fusion = {"default": VM.FUSION_DEFAULT, "replace": VM.FUSION_REPLACE,
              "equal_weighting": VM.FUSION_EQUAL_WEIGHTING}[cfg.map_fusion_type]
    value = VM.update(
        state.value, spec, cosines, value_depth, hand.tf,
        0.0, hand.max_depth, hand.fov,
        use_max_confidence=cfg.use_max_confidence,
        fusion_type=fusion,
        explored=obstacle.explored,
    )

    # --- object map from the hand camera (DBSCAN off on the robot)
    objmap = OBJ.update_batch(
        state.objmap, rng, object_depth, det_masks, det_valid, hand.tf,
        0.0, hand.max_depth, hand.fx, hand.fy,
        erosion_size=cfg.object_map_erosion_size,
        use_dbscan=False,
    )
    objmap = OBJ.update_explored(objmap, hand.tf, hand.max_depth, hand.fov)
    target_detected = OBJ.has_object(objmap)
    obj_goal, objmap = OBJ.get_best_object(objmap, robot_xy, use_dbscan=False)

    # --- frontier scoring (V2/V3)
    radius_px = int(0.5 * spec.pixels_per_meter)
    wvals = VM.waypoint_values(
        value, spec, obstacle.frontiers_xy, obstacle.frontiers_valid, radius_px=radius_px
    )
    if version == "v3":
        fvalues = reduce_values_v3(wvals, obstacle.frontiers_valid, cfg.exploration_thresh)
    else:
        fvalues = wvals[:, 0]
    choice = select_best_frontier(
        obstacle.frontiers_xy, obstacle.frontiers_valid, fvalues,
        robot_xy, state.last_frontier, state.last_value, state.acyclic,
    )

    # --- mode machine: 8 arm yaws then explore/navigate
    initializing = state.steps < NUM_INIT_YAWS
    navigate = target_detected & ~initializing
    explore = ~initializing & ~navigate
    goal = jnp.where(navigate, obj_goal, choice.frontier)

    goal_changed = jnp.any(goal != state.last_goal)
    big_change = jnp.linalg.norm(goal - state.last_goal) > 0.1
    not_done = state.pointnav.not_done & ~big_change & (state.steps != 0)
    pn = state.pointnav._replace(not_done=not_done)
    last_goal = jnp.where(goal_changed, goal, state.last_goal)

    rho, theta = rho_theta(robot_xy, robot_heading, goal)
    if pointnav == "greedy":
        # proportional controller stand-in for tests without trained weights
        angular = jnp.clip(theta, -1.0, 1.0)
        linear = jnp.where(jnp.abs(theta) < 0.4, 0.3, 0.0)
        pn_action = jnp.stack([angular, linear])[None]
    else:
        from vlfm_tpu.utils.img import resize_area

        nd = resize_area(nav_depth, tuple(cfg.depth_image_shape))[None, :, :, None]
        pn_action, pn = pointnav.act(
            nd, jnp.stack([rho, theta])[None], pn, deterministic=True
        )

    reached = navigate & (rho < cfg.pointnav_stop_radius)
    no_frontier = explore & ~choice.any_valid
    stop = reached | no_frontier

    arm_yaw = jnp.where(
        initializing,
        jnp.asarray(INITIAL_ARM_YAWS)[jnp.clip(state.steps, 0, NUM_INIT_YAWS - 1)],
        -1.0,
    )
    zero = jnp.float32(0.0)
    angular = jnp.where(initializing | stop, zero, pn_action[0, 0])
    linear = jnp.where(initializing | stop, zero, pn_action[0, 1])

    new_state = itm.PolicyState(
        steps=state.steps + 1,
        last_goal=last_goal,
        called_stop=state.called_stop | reached,
        last_value=jnp.where(explore, choice.last_value, state.last_value),
        last_frontier=jnp.where(explore, choice.last_frontier, state.last_frontier),
        pointnav=pn,
        obstacle=obstacle,
        value=value,
        objmap=objmap,
        acyclic=jax.tree_util.tree_map(
            lambda new, old: jnp.where(explore, new, old), choice.acyclic, state.acyclic
        ),
        frontier_cache=state.frontier_cache,
    )
    action = RealityAction(
        angular=angular, linear=linear, arm_yaw=arm_yaw, stop=stop,
        rho=rho, theta=theta,
    )
    return action, new_state


class RealityITMPolicyV2:
    """Host wrapper: ObjectNavEnv observation dicts -> Spot action dicts.

    Mirrors RealityMixin.act/get_action (reality_policies.py:52-96): returns
    {"angular", "linear", "arm_yaw", "rho_theta", "stop"}. Perception hooks
    (ITM scoring, detection, monocular depth) are host callables so the same
    wrapper serves tiny test models and production checkpoints.
    """

    def __init__(
        self,
        spec: GridSpec2D,
        cfg: VLFMConfig,
        *,
        pointnav="greedy",
        score_fn=None,  # rgb (H, W, 3) -> (C,) cosines
        detect_fn=None,  # rgb -> (masks (K, H, W), valid (K,))
        infer_depth_fn=None,  # rgb, min_d, max_d -> (H, W) normalized depth
        version: str = "v2",
        seed: int = 0,
    ):
        self.spec, self.cfg = spec, cfg
        self.pointnav, self.version = pointnav, version
        self.score_fn = score_fn or (lambda rgb: np.full(cfg.value_channels, 0.5, np.float32))
        self.detect_fn = detect_fn
        self.infer_depth_fn = infer_depth_fn
        self.rng = jax.random.PRNGKey(seed)
        self.reset()

    def reset(self):
        self.state = create_state(self.spec, self.cfg)

    def get_action(self, obs: dict) -> dict:
        cfg = self.cfg
        k = cfg.max_detections_per_frame
        rgb = obs["rgb"]
        h, w = rgb.shape[:2]

        # detections + monocular depth for the object map
        masks = np.zeros((k, h, w), bool)
        valid = np.zeros(k, bool)
        if self.detect_fn is not None:
            masks, valid = self.detect_fn(rgb)
        hand_depth = np.ones((h, w), np.float32)  # RGB-only gripper camera
        object_depth = hand_depth
        if self.infer_depth_fn is not None and valid.any():
            object_depth = np.asarray(
                self.infer_depth_fn(rgb, 0.0, obs["hand_max_depth"])
            )

        # fixed 5-slot body-cam stack
        ods = obs["obstacle_depths"]
        assert len(ods) <= MAX_BODY_CAMS
        hh, ww = ods[0]["depth"].shape
        depth5 = np.zeros((MAX_BODY_CAMS, hh, ww), np.float32)
        tf5 = np.tile(np.eye(4, dtype=np.float32), (MAX_BODY_CAMS, 1, 1))
        fx5 = np.ones(MAX_BODY_CAMS, np.float32)
        fy5 = np.ones(MAX_BODY_CAMS, np.float32)
        fov5 = np.ones(MAX_BODY_CAMS, np.float32)
        md5 = np.ones(MAX_BODY_CAMS, np.float32)
        ok5 = np.zeros(MAX_BODY_CAMS, bool)
        for i, od in enumerate(ods):
            depth5[i] = od["depth"]
            tf5[i] = od["tf"]
            fx5[i], fy5[i] = od["fx"], od["fy"]
            fov5[i], md5[i] = od["topdown_fov"], od["max_depth"]
            ok5[i] = True
        body = BodyCams(
            depth=jnp.asarray(depth5), tf=jnp.asarray(tf5), fx=jnp.asarray(fx5),
            fy=jnp.asarray(fy5), fov=jnp.asarray(fov5), max_depth=jnp.asarray(md5),
            valid=jnp.asarray(ok5),
        )
        hand = HandCam(
            tf=jnp.asarray(obs["hand_tf"], jnp.float32),
            fov=jnp.float32(obs["hand_fov"]),
            fx=jnp.float32(obs["hand_fx"]),
            fy=jnp.float32(obs["hand_fy"]),
            max_depth=jnp.float32(obs["hand_max_depth"]),
        )
        cos = jnp.asarray(self.score_fn(rgb), jnp.float32)[: cfg.value_channels]

        self.rng, sub = jax.random.split(self.rng)
        action, self.state = reality_step(
            self.state, body, hand, cos,
            jnp.asarray(hand_depth), jnp.asarray(object_depth),
            jnp.asarray(masks), jnp.asarray(valid),
            jnp.asarray(obs["nav_depth"], jnp.float32),
            jnp.asarray(obs["robot_xy"], jnp.float32),
            jnp.float32(obs["heading"]),
            sub,
            pointnav=self.pointnav, spec=self.spec, cfg=cfg, version=self.version,
        )
        return {
            "angular": float(action.angular),
            "linear": float(action.linear),
            "arm_yaw": float(action.arm_yaw),
            "stop": bool(action.stop),
            "rho_theta": (float(action.rho), float(action.theta)),
        }
