import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vlfm_tpu.config import VLFMConfig, CameraConfig
from vlfm_tpu.mapping.grid import GridSpec2D
from vlfm_tpu.models.pointnav import PointNavPolicy
from vlfm_tpu.policy import acyclic as AC
from vlfm_tpu.policy import itm
from vlfm_tpu.policy.frontier_selection import (
    reduce_values_v3,
    select_best_frontier,
)
from vlfm_tpu.utils.geometry import xyz_yaw_to_tf_matrix

jax.config.update("jax_default_device", jax.devices("cpu")[0])


class TestAcyclic:
    def test_membership(self):
        s = AC.create(16)
        pos = jnp.array([1.0, 2.0])
        fr = jnp.array([3.0, 4.0])
        tt = jnp.array([0.5, 0.25])
        assert not bool(AC.check_cyclic(s, pos, fr, tt))
        s = AC.add(s, pos, fr, tt)
        assert bool(AC.check_cyclic(s, pos, fr, tt))
        assert not bool(AC.check_cyclic(s, pos + 0.01, fr, tt))

    def test_batch_check(self):
        s = AC.create(16)
        pos = jnp.array([0.0, 0.0])
        tt = jnp.array([0.9, 0.8])
        s = AC.add(s, pos, jnp.array([1.0, 1.0]), tt)
        frontiers = jnp.array([[1.0, 1.0], [2.0, 2.0]])
        cyc = AC.check_cyclic_batch(s, pos, frontiers, tt)
        assert np.asarray(cyc).tolist() == [True, False]


class TestFrontierSelection:
    def _mk(self, values, last_frontier=(0.0, 0.0), last_value=-np.inf, acyclic=None):
        frontiers = jnp.array([[1.0, 0.0], [0.0, 1.0], [-1.0, 0.0]])
        valid = jnp.ones(3, bool)
        return select_best_frontier(
            frontiers,
            valid,
            jnp.array(values),
            jnp.zeros(2),
            jnp.array(last_frontier),
            jnp.float32(last_value),
            acyclic if acyclic is not None else AC.create(16),
        )

    def test_picks_highest(self):
        ch = self._mk([0.1, 0.9, 0.5])
        assert np.allclose(np.asarray(ch.frontier), [0.0, 1.0])
        assert float(ch.value) == pytest.approx(0.9)

    def test_sticks_to_last(self):
        # last frontier's value (0.5) is within 0.01 of its previous (0.505)
        ch = self._mk([0.9, 0.1, 0.5], last_frontier=(-1.0, 0.0), last_value=0.505)
        assert np.allclose(np.asarray(ch.frontier), [-1.0, 0.0])

    def test_abandons_last_when_much_worse(self):
        ch = self._mk([0.9, 0.1, 0.5], last_frontier=(-1.0, 0.0), last_value=0.8)
        assert np.allclose(np.asarray(ch.frontier), [1.0, 0.0])

    def test_cyclic_suppression(self):
        ac = AC.create(16)
        # top-two of sorted [0.9, 0.5, 0.1] is (0.9, 0.5)
        ac = AC.add(ac, jnp.zeros(2), jnp.array([0.0, 1.0]), jnp.array([0.9, 0.5]))
        ch = self._mk([0.5, 0.9, 0.1], acyclic=ac)
        # best (0,1) is cyclic -> take next best (1,0)
        assert np.allclose(np.asarray(ch.frontier), [1.0, 0.0])

    def test_all_cyclic_falls_back_to_farthest(self):
        ac = AC.create(16)
        tt = jnp.array([0.9, 0.5])
        for f in [[1.0, 0.0], [0.0, 1.0], [-1.0, 0.0]]:
            ac = AC.add(ac, jnp.zeros(2), jnp.array(f), tt)
        ch = self._mk([0.5, 0.9, 0.1], acyclic=ac)
        # all cyclic -> farthest-from-robot fallback (all dist 1; first wins)
        assert np.allclose(np.asarray(ch.frontier), [1.0, 0.0])
        assert float(ch.value) == pytest.approx(0.5)

    def test_v3_reduction(self):
        vals = jnp.array([[0.1, 0.7], [0.2, 0.3]])
        valid = jnp.ones(2, bool)
        out = reduce_values_v3(vals, valid, 0.5)
        assert np.allclose(np.asarray(out), [0.7, 0.3])  # below thresh -> explore ch
        out = reduce_values_v3(vals, valid, 0.15)
        assert np.allclose(np.asarray(out), [0.1, 0.2])


SPEC = GridSpec2D(size=256, pixels_per_meter=20, pad=160)
CFG = VLFMConfig(camera=CameraConfig(height=120, width=160))
MIN_D, MAX_D = CFG.camera.min_depth, CFG.camera.max_depth


def room_depth(h=120, w=160, dist=None):
    """Constant-depth frame. Default: open space at max range (no obstacles —
    a constant mid-range depth would build a sealed cylinder of wall around
    the spinning agent, which correctly yields zero frontiers)."""
    if dist is None:
        return np.ones((h, w), np.float32)
    return np.full((h, w), (dist - MIN_D) / (MAX_D - MIN_D), np.float32)


@pytest.fixture(scope="module")
def pointnav_policy():
    p = PointNavPolicy({}, discrete=True)
    params = p.init_params(jax.random.PRNGKey(0), depth_shape=tuple(CFG.depth_image_shape))
    return PointNavPolicy(params, discrete=True)


def obs_at(x, y, yaw, depth):
    return itm.Observation(
        depth=jnp.array(depth),
        tf_camera_to_episodic=xyz_yaw_to_tf_matrix(
            jnp.array([x, y, CFG.camera.camera_height]), jnp.float32(yaw)
        ),
        robot_xy=jnp.array([x, y]),
        robot_heading=jnp.float32(yaw),
    )


def no_detections(k=2, h=120, w=160):
    return jnp.zeros((k, h, w), bool), jnp.zeros(k, bool)


class TestPolicyStep:
    def test_initialize_then_explore(self, pointnav_policy):
        state = itm.create_state(SPEC, CFG)
        masks, mvalid = no_detections()
        rng = jax.random.PRNGKey(0)
        actions, modes = [], []
        for k in range(13):
            obs = obs_at(0.0, 0.0, (k * np.pi / 6) % (2 * np.pi), room_depth())
            action, info, state = itm.step(
                state, obs, jnp.array([0.4]), masks, mvalid, rng,
                pointnav=pointnav_policy, spec=SPEC, cfg=CFG,
            )
            actions.append(int(action))
            modes.append(int(info.mode))
        assert actions[:12] == [itm.TURN_LEFT] * 12
        assert modes[12] in (itm.MODE_EXPLORE, itm.MODE_NAVIGATE)
        assert modes[12] == itm.MODE_EXPLORE  # no detections yet
        assert int(info.num_frontiers) > 0

    def test_detection_triggers_navigate_and_stop(self, pointnav_policy):
        state = itm.create_state(SPEC, CFG)
        state = state._replace(steps=jnp.int32(20))  # past initialization
        h, w = 120, 160
        # detection blob straight ahead at 3 m
        depth = room_depth()
        yy, xx = np.mgrid[:h, :w]
        blob = (xx - w // 2) ** 2 + (yy - h // 2) ** 2 < 30**2
        depth_b = depth.copy()
        depth_b[blob] = (3.0 - MIN_D) / (MAX_D - MIN_D)
        masks = jnp.array(blob)[None].repeat(2, 0)
        mvalid = jnp.array([True, False])
        obs = obs_at(0.0, 0.0, 0.0, depth_b)
        action, info, state = itm.step(
            state, obs, jnp.array([0.6]), masks, mvalid, jax.random.PRNGKey(1),
            pointnav=pointnav_policy, spec=SPEC, cfg=CFG,
        )
        assert bool(info.target_detected)
        assert int(info.mode) == itm.MODE_NAVIGATE
        assert float(info.rho) == pytest.approx(3.0, abs=0.5)
        # now stand right next to the goal: policy must STOP
        obs2 = obs_at(2.5, 0.0, 0.0, room_depth())
        action, info, state = itm.step(
            state, obs2, jnp.array([0.6]), *no_detections(), jax.random.PRNGKey(2),
            pointnav=pointnav_policy, spec=SPEC, cfg=CFG,
        )
        assert int(action) == itm.STOP
        assert bool(info.stop_called)

    def test_map_edge_stops(self, pointnav_policy):
        state = itm.create_state(SPEC, CFG)
        state = state._replace(steps=jnp.int32(20))
        obs = obs_at(6.3, 0.0, 0.0, room_depth())  # logical map is 12.8 m wide
        action, info, state = itm.step(
            state, obs, jnp.array([0.4]), *no_detections(), jax.random.PRNGKey(3),
            pointnav=pointnav_policy, spec=SPEC, cfg=CFG,
        )
        assert int(action) == itm.STOP

    @pytest.mark.slow
    def test_vmapped_batch(self, pointnav_policy):
        batch = 3
        state = itm.create_state(SPEC, CFG)
        bstate = jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x, (batch, *x.shape)), state
        )
        masks, mvalid = no_detections()
        obs = obs_at(0.0, 0.0, 0.0, room_depth())
        bobs = jax.tree_util.tree_map(lambda x: jnp.broadcast_to(x, (batch, *x.shape)), obs)
        rngs = jax.random.split(jax.random.PRNGKey(0), batch)

        def one(s, o, r):
            return itm.step(
                s, o, jnp.array([0.4]), masks, mvalid, r,
                pointnav=pointnav_policy, spec=SPEC, cfg=CFG,
            )

        actions, infos, bstate2 = jax.vmap(one)(bstate, bobs, rngs)
        assert actions.shape == (batch,)
        assert np.asarray(actions).tolist() == [itm.TURN_LEFT] * batch
        assert bstate2.steps.shape == (batch,)
