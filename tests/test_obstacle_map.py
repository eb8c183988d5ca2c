import cv2
import jax.numpy as jnp
import numpy as np

from vlfm_tpu.mapping import obstacle_map as OM
from vlfm_tpu.mapping.grid import GridSpec2D
from vlfm_tpu.ops import morphology as M
from vlfm_tpu.ops.flood import (
    flood_from_seed,
    label_components,
    component_sizes,
    remove_small_components_coarse,
)
from vlfm_tpu.ops.fog_of_war import reveal_fog_of_war_window
from vlfm_tpu.ops.frontier import detect_frontiers
from vlfm_tpu.utils.geometry import xyz_yaw_to_tf_matrix

SPEC = GridSpec2D(size=256, pixels_per_meter=20, pad=160)
FOV = np.deg2rad(79)
MIN_D, MAX_D = 0.5, 5.0
FX = FY = 640 / (2 * np.tan(FOV / 2))


class TestMorphology:
    def test_dilate_erode_match_cv2(self):
        rng = np.random.default_rng(0)
        mask = rng.random((64, 64)) > 0.8
        for k in (3, 5, 7):
            want_d = cv2.dilate(mask.astype(np.uint8), np.ones((k, k), np.uint8)) > 0
            want_e = cv2.erode(mask.astype(np.uint8), np.ones((k, k), np.uint8)) > 0
            got_d = np.asarray(M.dilate(jnp.array(mask), k))
            got_e = np.asarray(M.erode(jnp.array(mask), k))
            assert (got_d == want_d).all(), f"dilate k={k}"
            # cv2 erode pads with border replicate by default; interior only
            assert (got_e[k:-k, k:-k] == want_e[k:-k, k:-k]).all(), f"erode k={k}"


class TestFlood:
    def test_flood_keeps_seeded_blob(self):
        mask = np.zeros((64, 64), bool)
        mask[5:15, 5:15] = True
        mask[40:50, 40:50] = True
        seed = np.zeros_like(mask)
        seed[7, 7] = True
        out = np.asarray(flood_from_seed(jnp.array(mask), jnp.array(seed)))
        assert out[5:15, 5:15].all()
        assert not out[40:50, 40:50].any()

    def test_labels_match_cv2(self):
        rng = np.random.default_rng(1)
        mask = M.dilate(jnp.array(rng.random((96, 96)) > 0.95), 3)
        mask_np = np.asarray(mask)
        labels = np.asarray(label_components(mask, max_iters=256))
        n_cv, cv_labels = cv2.connectedComponents(
            mask_np.astype(np.uint8), connectivity=8
        )
        # same partition: bijection between our labels and cv2 labels
        ours = labels[mask_np]
        theirs = cv_labels[mask_np]
        assert len(set(zip(ours.tolist(), theirs.tolist()))) == n_cv - 1

    def test_component_sizes(self):
        mask = np.zeros((32, 32), bool)
        mask[2:5, 2:5] = True  # 9 px
        mask[20:22, 20:30] = True  # 20 px
        mj = jnp.array(mask)
        labels = label_components(mj, max_iters=64)
        sizes = np.asarray(component_sizes(labels, mj))
        assert sizes[3, 3] == 9
        assert sizes[21, 25] == 20
        assert sizes[0, 0] == 0

    def test_remove_small_components(self):
        mask = np.zeros((128, 128), bool)
        mask[8:12, 8:12] = True  # 16 px -> removed at thresh 100
        mask[40:80, 40:80] = True  # 1600 px -> kept
        out = np.asarray(
            remove_small_components_coarse(jnp.array(mask), jnp.float32(100.0))
        )
        assert not out[8:12, 8:12].any()
        assert out[40:80, 40:80].all()


class TestFogOfWar:
    def test_open_space_reveals_cone(self):
        nav = jnp.ones((224, 224), bool)
        out = np.asarray(
            reveal_fog_of_war_window(
                nav, jnp.float32(0.0), jnp.float32(FOV), jnp.float32(100.0)
            )
        )
        c = 112
        assert out[c + 50, c]  # straight ahead (+x = down rows)
        assert not out[c - 20, c]  # behind
        assert not out[c + 50, c - 90]  # far outside fov
        assert not out[c + 110, c]  # beyond max range
        # revealed area approximates the cone sector area
        want = FOV / 2 * 100**2
        assert abs(out.sum() - want) / want < 0.05

    def test_wall_blocks(self):
        nav = np.ones((224, 224), bool)
        nav[142, :] = False  # wall 30 px ahead of the agent (row 112)
        out = np.asarray(
            reveal_fog_of_war_window(
                jnp.array(nav), jnp.float32(0.0), jnp.float32(FOV), jnp.float32(100.0)
            )
        )
        c = 112
        assert out[c + 25, c]
        assert not out[c + 45, c]  # behind the wall

    def test_heading_rotates_cone(self):
        nav = jnp.ones((224, 224), bool)
        out = np.asarray(
            reveal_fog_of_war_window(
                nav, jnp.float32(np.pi / 2), jnp.float32(FOV), jnp.float32(80.0)
            )
        )
        c = 112
        # heading +y means decreasing cols
        assert out[c, c - 50]
        assert not out[c + 50, c]


class TestFrontierDetection:
    def test_disk_in_open_space_has_frontier(self):
        s = 256
        nav = np.ones((s, s), bool)
        explored = np.zeros((s, s), bool)
        cv2.circle(explored.view(np.uint8).reshape(s, s), (128, 128), 40, 1, -1)
        fr = detect_frontiers(
            jnp.array(nav), jnp.array(explored), jnp.float32(600.0), max_cells=512
        )
        valid = np.asarray(fr.valid)
        assert valid.any()
        # all waypoints sit near the disk boundary
        wps = np.asarray(fr.waypoints_px)[valid]
        d = np.linalg.norm(wps - 128, axis=1)
        assert ((d > 35) & (d < 55)).all()

    def test_walled_room_no_frontier(self):
        s = 256
        nav = np.zeros((s, s), bool)
        nav[100:156, 100:156] = True  # a sealed room
        explored = np.zeros((s, s), bool)
        explored[100:156, 100:156] = True
        fr = detect_frontiers(
            jnp.array(nav), jnp.array(explored), jnp.float32(600.0), max_cells=512
        )
        assert not np.asarray(fr.valid).any()

    def test_small_pocket_filtered(self):
        s = 256
        nav = np.zeros((s, s), bool)
        nav[100:130, 100:130] = True
        nav[100:104, 130:136] = True  # tiny pocket off the room (24 px)
        explored = np.zeros((s, s), bool)
        explored[100:130, 100:130] = True
        fr = detect_frontiers(
            jnp.array(nav), jnp.array(explored), jnp.float32(600.0), max_cells=512
        )
        assert not np.asarray(fr.valid).any()


def wall_depth_image(dist_m, h=480, w=640):
    """Normalized depth for a flat wall ``dist_m`` ahead (fronto-parallel)."""
    # depth sensor gives z-depth; a fronto-parallel wall has constant z
    z = np.full((h, w), dist_m, np.float32)
    return (z - MIN_D) / (MAX_D - MIN_D)


class TestObstacleMapUpdate:
    def _update(self, state, depth, x=0.0, y=0.0, yaw=0.0, **kw):
        tf = xyz_yaw_to_tf_matrix(jnp.array([x, y, 0.88]), jnp.float32(yaw))
        return OM.update(
            state, SPEC, jnp.array(depth), tf, MIN_D, MAX_D, FX, FY, FOV,
            min_height=0.15, max_height=0.88, area_thresh_m2=1.5, **kw
        )

    def test_wall_becomes_obstacle_and_frontiers_appear(self):
        state = OM.create(SPEC)
        state = self._update(state, wall_depth_image(3.0))
        obst = np.asarray(SPEC.crop_logical(state.obstacles))
        nav = np.asarray(SPEC.crop_logical(state.navigable))
        expl = np.asarray(SPEC.crop_logical(state.explored))
        o = SPEC.origin
        wall_px = o + int(3.0 * 20)
        # obstacle row at the wall distance (within rounding)
        assert obst[wall_px - 1 : wall_px + 2, o - 10 : o + 10].any()
        # nothing nearer than the wall
        assert not obst[o : wall_px - 3, o - 20 : o + 20].any()
        # navigable carved out around the wall by the agent radius
        assert not nav[wall_px, o]
        assert nav[o, o]
        # explored cone between agent and wall
        assert expl[o + 20, o]
        assert not expl[wall_px + 10, o]
        # frontiers exist (cone edges border unexplored open space)
        assert np.asarray(state.frontiers_valid).any()

    def test_explored_prune_keeps_agent_region(self):
        state = OM.create(SPEC)
        state = self._update(state, wall_depth_image(3.0))
        # inject a fake disconnected explored blob far away
        expl = np.asarray(state.explored).copy()
        expl[30:40, 30:40] = True
        state = state._replace(explored=jnp.array(expl))
        state = self._update(state, wall_depth_image(3.0))
        expl2 = np.asarray(state.explored)
        assert not expl2[30:40, 30:40].any()

    def test_no_explore_flag(self):
        state = OM.create(SPEC)
        state = self._update(state, wall_depth_image(3.0), explore=False)
        assert not np.asarray(state.explored).any()

    def test_reset(self):
        state = OM.create(SPEC)
        state = self._update(state, wall_depth_image(2.0))
        state = OM.reset(state)
        assert not np.asarray(state.obstacles).any()
        assert np.asarray(state.navigable).all()
