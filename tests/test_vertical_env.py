"""Vertical structure in the synthetic env + the full failure taxonomy.

VERDICT round-1 items #9 (weak #3/#8): per-pixel ray-cast depth exercises the
obstacle height band closed-loop; TraveledStairs feeds the reference-form
failure decision tree (episode_stats_logger.py:44-111).
"""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from vlfm_tpu.config import CameraConfig, VLFMConfig  # noqa: E402
from vlfm_tpu.mapping import obstacle_map as OM  # noqa: E402
from vlfm_tpu.mapping.grid import GridSpec2D  # noqa: E402
from vlfm_tpu.runner import metrics as M  # noqa: E402
from vlfm_tpu.runner.fake_env import (  # noqa: E402
    EnvConfig,
    FakeObjectNavEnv,
    furnished_room_plan,
    open_room_plan,
    stairs_plan,
    two_room_plan,
)
from vlfm_tpu.utils.geometry import xyz_yaw_to_tf_matrix  # noqa: E402
from vlfm_tpu.utils.measurements import TraveledStairs  # noqa: E402

CFG = VLFMConfig(camera=CameraConfig(height=96, width=128),
                 max_frontiers=16, max_frontier_cells=256,
                 object_map_slots=8, object_map_points_per_slot=128)
SPEC = GridSpec2D(size=512, pixels_per_meter=20, pad=160)
ENV = EnvConfig(width=128, height=96, max_steps=60)


def _obstacles_after_view(env):
    """One obstacle-map update from the env's current view."""
    o = env._observe()
    cam = CFG.camera
    fx = 128 / (2 * np.tan(cam.hfov / 2))
    tf = xyz_yaw_to_tf_matrix(
        jnp.array([env.x, env.y, cam.camera_height]), jnp.float32(env.yaw)
    )
    state = OM.update(
        OM.create(SPEC), SPEC, jnp.asarray(o["depth"]), tf,
        cam.min_depth, cam.max_depth, fx, fx, cam.hfov,
        CFG.min_obstacle_height, CFG.max_obstacle_height,
        CFG.obstacle_map_area_threshold, agent_radius=CFG.agent_radius,
        explore=False,
    )
    return np.asarray(SPEC.crop_logical(state.obstacles))


def _px(xy):
    return np.asarray(SPEC.xy_to_px(jnp.asarray(xy, jnp.float32)))


class TestVerticalStructure:
    def test_depth_has_vertical_structure(self):
        env = FakeObjectNavEnv(open_room_plan(0), ENV)
        d = env.reset()["depth"]
        # bottom rows see the floor (close), middle rows the walls (far)
        assert d[-1].mean() < d[48].mean()
        assert np.std(d[:, 64]) > 0.05

    def test_floor_is_not_an_obstacle(self):
        env = FakeObjectNavEnv(open_room_plan(0), ENV)
        obst = _obstacles_after_view(env)
        rc = _px([1.0, 0.0])  # open floor 1 m ahead
        assert not obst[rc[0] - 2 : rc[0] + 3, rc[1] - 2 : rc[1] + 3].any()

    def test_band_splits_table_from_counter(self):
        """The 0.5 m table is BELOW the [0.61, 0.88] band -> no obstacle; the
        0.75 m counter is inside it -> obstacle (obstacle_map.py:95-96)."""
        plan = furnished_room_plan(0)
        env = FakeObjectNavEnv(plan, ENV)
        env.x, env.y, env.yaw = 0.0, 0.0, 0.0  # facing the table at x=1.5
        obst = _obstacles_after_view(env)
        table_rc = _px([1.5, 0.0])
        assert not obst[table_rc[0] - 2 : table_rc[0] + 3,
                        table_rc[1] - 2 : table_rc[1] + 3].any(), (
            "0.5 m table must not enter the obstacle band")

        env.yaw = np.pi / 2  # face the counter at y=2
        obst = _obstacles_after_view(env)
        counter_rc = _px([0.0, 2.0])
        assert obst[counter_rc[0] - 3 : counter_rc[0] + 4,
                    counter_rc[1] - 3 : counter_rc[1] + 4].any(), (
            "0.75 m counter must be an obstacle")

    def test_sees_over_the_counter(self):
        """Depth beyond the counter must register (the wall behind it),
        exercising the see-over-furniture path the 2.5-D env could not."""
        plan = furnished_room_plan(0)
        env = FakeObjectNavEnv(plan, ENV)
        env.yaw = np.pi / 2  # counter at 2 m, wall at 5 m
        d = env._observe()["depth"]
        col = 64
        # above-horizon rows look over the 0.75 m counter to the far wall
        meters = d[:, col] * (ENV.max_depth - ENV.min_depth) + ENV.min_depth
        assert meters.max() > 3.0, "no line of sight past the counter"
        # rows aimed at the counter band see ~2 m
        assert (np.abs(meters - 2.0) < 0.3).any()


class TestStairs:
    def test_ramp_raises_agent_and_measure(self):
        env = FakeObjectNavEnv(stairs_plan(0), ENV)
        env.reset()
        m = TraveledStairs()
        for x in np.linspace(0.0, 3.5, 12):
            env.x = float(x)
            m.update(env._observe()["agent_z"])
        assert m.traveled_stairs  # rise 1.2 m > 0.9 m threshold


class TestFailureTaxonomy:
    def _kw(self, **over):
        kw = dict(target_detected=False, false_positive=False, stop_called=False,
                  target_seen=False, traveled_stairs=False, feasible=True)
        kw.update(over)
        return kw

    def test_all_branches(self):
        f = M.determine_failure_cause
        assert f(**self._kw(target_detected=True, false_positive=True)) == "false_positive"
        assert f(**self._kw(target_detected=True, stop_called=True)) == "bad_stop_true_positive"
        assert f(**self._kw(target_detected=True)) == "timeout_true_positive"
        assert f(**self._kw(target_seen=True)) == "false_negative"
        assert f(**self._kw()) == "never_saw_target_did_not_travel_stairs_feasible"
        assert f(**self._kw(traveled_stairs=True)) == "never_saw_target_traveled_stairs_feasible"
        assert f(**self._kw(feasible=False)) == (
            "never_saw_target_did_not_travel_stairs_likely_infeasible")

    def test_was_false_positive_geometry(self):
        assert not M.was_false_positive([1.0, 0.0], [1.2, 0.0], 0.3)
        assert M.was_false_positive([4.0, 0.0], [1.0, 0.0], 0.3)

    def test_was_target_seen_map(self):
        expl = np.zeros((SPEC.storage_size, SPEC.storage_size), bool)
        target = [1.0, 1.0]
        assert not M.was_target_seen(expl, SPEC, target)
        rc = np.asarray(SPEC.to_storage(SPEC.xy_to_px(jnp.asarray(target, jnp.float32))))
        expl[rc[0] + 8, rc[1] - 8] = True  # inside the 10-px dilation margin
        assert M.was_target_seen(expl, SPEC, target)


@pytest.mark.slow
class TestTaxonomyClosedLoop:
    def test_never_saw_target_on_timeout(self):
        from vlfm_tpu.runner.episode_driver import run_episode

        env = FakeObjectNavEnv(
            two_room_plan(0), EnvConfig(width=128, height=96, max_steps=14)
        )
        result, _ = run_episode(env, "greedy", SPEC, CFG, seed=0)
        assert not result.success
        assert result.failure_cause.startswith("never_saw_target")
        assert result.failure_cause.endswith("_feasible")

    def test_false_negative_when_seen_but_never_detected(self):
        """Oracle masks disabled: the agent explores (the map covers the
        target area) but never detects -> false_negative."""
        from vlfm_tpu.runner.episode_driver import run_episode

        env = FakeObjectNavEnv(
            open_room_plan(1), EnvConfig(width=128, height=96, max_steps=60)
        )
        env_observe = env._observe

        def no_detections():
            o = env_observe()
            o["target_visible"] = False
            o["target_mask"] = np.zeros_like(o["target_mask"])
            return o

        env._observe = no_detections
        result, _ = run_episode(env, "greedy", SPEC, CFG, seed=1)
        assert not result.success
        assert result.failure_cause in (
            "false_negative",
            # if exploration never covered the target area:
            "never_saw_target_did_not_travel_stairs_feasible",
        )


class TestRowBandedRenderExactness:
    """The row-banded _observe (round 5: per-wall/target work restricted to
    the image-row band the geometry can touch) must be BIT-IDENTICAL to the
    straight full-frame broadcast of the documented ray-cast semantics —
    the episode-parity suites and the farm's pinned transport drift bounds
    all sit on these pixels."""

    @staticmethod
    def _naive_observe(env):
        c, plan = env.cfg, env.plan
        bearings = env.yaw - env._phi
        cam_h = np.float32(c.camera_height)
        t_walls = env._ray_walls(env.x, env.y, bearings)
        t_target = env._ray_target(env.x, env.y, bearings)
        cos_phi, slope = env._cos_phi32, env._slope32
        zf = np.where(
            np.isfinite(t_walls), t_walls * cos_phi[None, :], np.inf
        ).astype(np.float32)
        h, w = slope.shape[0], zf.shape[1]
        zbest = np.full((h, w), np.inf, np.float32)
        with np.errstate(invalid="ignore"):
            for i in range(zf.shape[0]):
                zi = zf[i]
                if not np.isfinite(zi).any():
                    continue
                h_at = cam_h - slope[:, None] * zi[None, :]
                ok = (h_at <= env._heights32[i]) & (h_at >= 0.0)
                ok &= zi[None, :] < zbest
                zbest = np.where(ok, zi[None, :], zbest)
        zbest = np.minimum(zbest, env._zfc32[:, None])
        zt = np.where(
            np.isfinite(t_target), t_target * cos_phi, 1e9
        ).astype(np.float32)
        h_at = cam_h - slope[:, None] * zt[None, :]
        t_ok = (zt < 1e8)[None, :] & (h_at >= 0.0) & (h_at <= plan.target_height)
        zt_full = np.where(t_ok, zt[None, :], np.inf)
        mask = t_ok & (zt_full <= zbest) & (zt_full < c.max_depth)
        zbest = np.minimum(zbest, zt_full)
        z_cl = np.clip(zbest, c.min_depth, c.max_depth)
        norm = (z_cl - c.min_depth) / (c.max_depth - c.min_depth)
        depth = np.where(np.isinf(zbest), 1.0, norm).astype(np.float32)
        rgb = np.repeat(
            ((1.0 - depth) * 200 + 30).astype(np.uint8)[..., None], 3, axis=2
        )
        rgb[mask] = (220, 40, 40)
        return depth, mask, rgb

    @pytest.mark.parametrize(
        "plan_name", ["two_room_plan", "furnished_room_plan", "stairs_plan"]
    )
    def test_bit_identical_to_full_broadcast(self, plan_name):
        from vlfm_tpu.runner import fake_env as FE

        env = FE.FakeObjectNavEnv(
            getattr(FE, plan_name)(1),
            FE.EnvConfig(max_steps=5000, width=160, height=120),
        )
        env.reset()
        rng = np.random.default_rng(7)
        for _ in range(30):
            out = env.step(int(rng.integers(1, 4)))
            o = out[0] if isinstance(out, tuple) else out
            nd, nm, nr = self._naive_observe(env)
            assert np.array_equal(o["depth"], nd)
            assert np.array_equal(o["target_mask"], nm)
            assert np.array_equal(o["rgb"], nr)
            if o["done"]:
                break
