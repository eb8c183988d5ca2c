"""The VLFM ITM policy as one jittable, vmappable step function.

Parity targets:
- BaseObjectNavPolicy.act / _pointnav / _update_object_map
  (base_objectnav_policy.py:106-352)
- BaseITMPolicy/_ITMPolicyV2/V3 (itm_policy.py:26-316)
- HabitatMixin._initialize 360-degree spin + STOP-on-map-edge
  (habitat_policies.py:121-153)

One step ingests a single observation plus precomputed VLM outputs (ITM
cosines per prompt channel, segmentation masks per detection) and advances
the full episodic state: obstacle/value/object maps, frontier choice,
acyclic memory, PointNav recurrence. The entire step is pure, jits into one
XLA program, and vmaps over an episode batch — the reference's hard
"one env at a time" limit (base_objectnav_policy.py:153) does not exist
here.

Mode machine (base_objectnav_policy.py:130-138):
  INITIALIZE (spin 12 x TURN_LEFT) -> EXPLORE (best frontier) -> NAVIGATE
  (approach detected target; STOP within pointnav_stop_radius).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from vlfm_tpu.config import VLFMConfig
from vlfm_tpu.mapping import frontier_map as FM
from vlfm_tpu.mapping import object_map as OBJ
from vlfm_tpu.mapping import obstacle_map as OM
from vlfm_tpu.mapping import value_map as VM
from vlfm_tpu.mapping.grid import GridSpec2D
from vlfm_tpu.models.pointnav import PointNavPolicy, PointNavState, initial_state
from vlfm_tpu.policy import acyclic as AC
from vlfm_tpu.policy.frontier_selection import reduce_values_v3, select_best_frontier
from vlfm_tpu.utils.geometry import rho_theta
from vlfm_tpu.utils.img import resize_area

STOP, MOVE_FORWARD, TURN_LEFT, TURN_RIGHT = 0, 1, 2, 3  # habitat_policies.py:54-58
MODE_INITIALIZE, MODE_EXPLORE, MODE_NAVIGATE = 0, 1, 2


class Observation(NamedTuple):
    depth: jnp.ndarray  # (H, W) normalized [0, 1]
    tf_camera_to_episodic: jnp.ndarray  # (4, 4)
    robot_xy: jnp.ndarray  # (2,)
    robot_heading: jnp.ndarray  # ()


class PolicyState(NamedTuple):
    steps: jnp.ndarray  # () int32
    last_goal: jnp.ndarray  # (2,) zeros sentinel
    called_stop: jnp.ndarray  # () bool
    last_value: jnp.ndarray  # ()
    last_frontier: jnp.ndarray  # (2,)
    pointnav: PointNavState  # batch dim == 1
    obstacle: OM.ObstacleMapState
    value: VM.ValueMapState
    objmap: OBJ.ObjectMapState
    acyclic: AC.AcyclicState
    frontier_cache: FM.FrontierMapState  # V1 only (itm_policy.py:219-247)


class StepInfo(NamedTuple):
    mode: jnp.ndarray
    action: jnp.ndarray
    rho: jnp.ndarray
    theta: jnp.ndarray
    best_value: jnp.ndarray
    goal: jnp.ndarray
    num_frontiers: jnp.ndarray
    target_detected: jnp.ndarray
    stop_called: jnp.ndarray


def create_state(spec: GridSpec2D, cfg: VLFMConfig) -> PolicyState:
    return PolicyState(
        steps=jnp.int32(0),
        last_goal=jnp.zeros(2),
        called_stop=jnp.bool_(False),
        last_value=jnp.float32(-jnp.inf),
        last_frontier=jnp.zeros(2),
        pointnav=initial_state(1),
        obstacle=OM.create(spec, cfg.max_frontiers),
        value=VM.create(spec, cfg.value_channels),
        objmap=OBJ.create(cfg.object_map_slots, cfg.object_map_points_per_slot),
        acyclic=AC.create(),
        frontier_cache=FM.create(cfg.max_frontiers * 2),
    )


@partial(jax.jit, static_argnames=("pointnav", "spec", "cfg", "version"))
def step(
    state: PolicyState,
    obs: Observation,
    cosines: jnp.ndarray,  # (C,) BLIP2-ITM scores per prompt channel
    det_masks: jnp.ndarray,  # (K, H, W) bool segmentation masks
    det_valid: jnp.ndarray,  # (K,) bool
    rng: jnp.ndarray,
    object_depth: jnp.ndarray | None = None,  # (H, W); monocular-depth fallback
    *,
    pointnav: PointNavPolicy,
    spec: GridSpec2D,
    cfg: VLFMConfig,
    version: str = "v2",
):
    cam = cfg.camera
    # The object map may use an inferred depth (all-ones RGB-only frames,
    # base_objectnav_policy.py:314-318); obstacle/value maps keep the sensor
    # depth, matching the reference's per-consumer depth routing.
    if object_depth is None:
        object_depth = obs.depth

    # --- map edge guard (base_objectnav_policy.py:158-162 -> STOP) ---------
    edge_margin = 8
    rc = spec.xy_to_px(obs.robot_xy)
    in_bounds = jnp.all((rc >= edge_margin) & (rc < spec.size - edge_margin))

    # --- obstacle map + frontiers (habitat_policies.py:191-203) ------------
    obstacle = OM.update(
        state.obstacle,
        spec,
        obs.depth,
        obs.tf_camera_to_episodic,
        cam.min_depth,
        cam.max_depth,
        cam.fx,
        cam.fy,
        cam.hfov,
        min_height=cfg.min_obstacle_height,
        max_height=cfg.max_obstacle_height,
        area_thresh_m2=cfg.obstacle_map_area_threshold,
        full_prune=(state.steps % 8) == 0,
        agent_radius=cfg.agent_radius,
        max_frontier_cells=cfg.max_frontier_cells,
        max_frontiers=cfg.max_frontiers,
    )

    # --- value map (itm_policy.py:191-211) ---------------------------------
    fusion = {"default": VM.FUSION_DEFAULT, "replace": VM.FUSION_REPLACE,
              "equal_weighting": VM.FUSION_EQUAL_WEIGHTING}[cfg.map_fusion_type]
    value = VM.update(
        state.value,
        spec,
        cosines,
        obs.depth,
        obs.tf_camera_to_episodic,
        cam.min_depth,
        cam.max_depth,
        cam.hfov,
        use_max_confidence=cfg.use_max_confidence,
        fusion_type=fusion,
        explored=obstacle.explored if cfg.sync_explored_areas else None,
    )

    # --- object map: one slot per detection mask, all K at once ------------
    objmap = OBJ.update_batch(
        state.objmap,
        rng,
        object_depth,
        det_masks,
        det_valid,
        obs.tf_camera_to_episodic,
        cam.min_depth,
        cam.max_depth,
        cam.fx,
        cam.fy,
        erosion_size=cfg.object_map_erosion_size,
        use_dbscan=cfg.use_object_map_dbscan,
    )
    objmap = OBJ.update_explored(
        objmap,
        obs.tf_camera_to_episodic,
        jnp.float32(cam.max_depth),
        jnp.float32(cam.object_map_cone_fov),
    )

    target_detected = OBJ.has_object(objmap)
    obj_goal, objmap = OBJ.get_best_object(
        objmap, obs.robot_xy, use_dbscan=cfg.use_object_map_dbscan
    )

    # --- frontier scoring (V1: cached first-sight cosine; V2/V3: value-map
    # median within 0.5 m) ---------------------------------------------------
    frontier_cache = state.frontier_cache
    if version == "fbe":
        # OracleFBEPolicy role (habitat_policies.py:240-245): classic
        # frontier-based exploration — the NEAREST frontier wins and ITM
        # value scoring is bypassed (the reference delegates explore-mode
        # actions to the frontier_exploration explorer sensor; the value map
        # still updates here for visualization parity).
        fvalues = jnp.where(
            obstacle.frontiers_valid,
            -jnp.linalg.norm(obstacle.frontiers_xy - obs.robot_xy, axis=1),
            -jnp.inf,
        )
    elif version == "v1":
        frontier_cache = FM.update(
            frontier_cache, obstacle.frontiers_xy, obstacle.frontiers_valid, cosines[0]
        )
        m = FM._matches(
            frontier_cache.positions,
            frontier_cache.valid,
            obstacle.frontiers_xy,
            obstacle.frontiers_valid,
        )
        fvalues = jnp.where(
            m.any(axis=0), frontier_cache.cosines[jnp.argmax(m, axis=0)], -jnp.inf
        )
    else:
        radius_px = int(0.5 * spec.pixels_per_meter)
        wvals = VM.waypoint_values(
            value, spec, obstacle.frontiers_xy, obstacle.frontiers_valid, radius_px=radius_px
        )  # (F, C)
        if version == "v3":
            fvalues = reduce_values_v3(
                wvals, obstacle.frontiers_valid, cfg.exploration_thresh
            )
        else:
            fvalues = wvals[:, 0]

    choice = select_best_frontier(
        obstacle.frontiers_xy,
        obstacle.frontiers_valid,
        fvalues,
        obs.robot_xy,
        state.last_frontier,
        state.last_value,
        state.acyclic,
    )

    # --- mode dispatch -----------------------------------------------------
    initializing = state.steps < cfg.num_init_turns
    navigate = target_detected & ~initializing
    explore = ~initializing & ~navigate
    mode = jnp.where(initializing, MODE_INITIALIZE, jnp.where(navigate, MODE_NAVIGATE, MODE_EXPLORE))

    goal = jnp.where(navigate, obj_goal, choice.frontier)

    # --- pointnav (base_objectnav_policy.py:243-279) -----------------------
    goal_changed = jnp.any(goal != state.last_goal)
    big_change = jnp.linalg.norm(goal - state.last_goal) > 0.1
    # not_done==False makes act() zero the recurrence and the prev action.
    not_done = state.pointnav.not_done & ~big_change & (state.steps != 0)
    pn = state.pointnav._replace(not_done=not_done)
    last_goal = jnp.where(goal_changed, goal, state.last_goal)

    rho, theta = rho_theta(obs.robot_xy, obs.robot_heading, goal)
    if pointnav == "greedy":
        # Deterministic rho-theta controller (for tests/benchmarks without the
        # trained checkpoint): turn toward the goal, else step forward.
        half_turn = jnp.deg2rad(15.0)
        pn_action = jnp.where(
            theta > half_turn,
            TURN_LEFT,
            jnp.where(theta < -half_turn, TURN_RIGHT, MOVE_FORWARD),
        ).astype(jnp.int32)
    else:
        nav_depth = resize_area(obs.depth, tuple(cfg.depth_image_shape))[None, :, :, None]
        pn_action, pn = pointnav.act(
            nav_depth, jnp.stack([rho, theta])[None], pn, deterministic=True
        )
        pn_action = pn_action[0, 0].astype(jnp.int32)

    reached = navigate & (rho < cfg.pointnav_stop_radius)
    no_frontier = explore & ~choice.any_valid  # itm_policy.py:66-68 -> STOP

    action = jnp.where(
        ~in_bounds,
        STOP,
        jnp.where(
            initializing,
            TURN_LEFT,
            jnp.where(reached | no_frontier, STOP, pn_action),
        ),
    )
    called_stop = state.called_stop | reached

    # Only update frontier stickiness when we actually explored this step.
    new_state = PolicyState(
        steps=state.steps + 1,
        last_goal=last_goal,
        called_stop=called_stop,
        last_value=jnp.where(explore, choice.last_value, state.last_value),
        last_frontier=jnp.where(explore, choice.last_frontier, state.last_frontier),
        pointnav=pn,
        obstacle=obstacle,
        value=value,
        objmap=objmap,
        acyclic=jax.tree_util.tree_map(
            lambda new, old: jnp.where(explore, new, old), choice.acyclic, state.acyclic
        ),
        frontier_cache=frontier_cache,
    )
    info = StepInfo(
        mode=mode,
        action=action,
        rho=rho,
        theta=theta,
        best_value=choice.value,
        goal=goal,
        num_frontiers=obstacle.frontiers_valid.sum(),
        target_detected=target_detected,
        stop_called=called_stop,
    )
    return action, info, new_state
