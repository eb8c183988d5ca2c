import jax.numpy as jnp
import numpy as np
import pytest

from tests import oracles
from vlfm_tpu.mapping import value_map as VM
from vlfm_tpu.mapping.grid import GridSpec2D
from vlfm_tpu.ops.cone import depth_row_max, visible_confidence_window
from vlfm_tpu.utils.geometry import xyz_yaw_to_tf_matrix

SPEC = GridSpec2D(size=512, pixels_per_meter=20, pad=160)
FOV = np.deg2rad(79)
MIN_D, MAX_D = 0.5, 5.0


def synthetic_depth(seed=0, h=48, w=64):
    rng = np.random.default_rng(seed)
    base = rng.uniform(0.3, 1.0, size=(1, w))
    img = np.repeat(base, h, axis=0)
    img += rng.uniform(-0.05, 0.0, size=(h, w))
    return np.clip(img, 0.0, 1.0).astype(np.float32)


def embed_window_in_oracle_frame(window_mask: np.ndarray, oracle: np.ndarray):
    """Crop both to the oracle's extent, aligned at the camera pixel (centre)."""
    ow = oracle.shape[0]
    half_w = window_mask.shape[0] // 2
    half_o = ow // 2
    assert half_w >= half_o
    s = half_w - half_o
    return window_mask[s : s + ow, s : s + ow]


class TestConeKernel:
    def test_matches_oracle_yaw_zero(self):
        depth = synthetic_depth()
        row_m = np.asarray(depth_row_max(jnp.array(depth), MIN_D, MAX_D))
        got = np.asarray(
            visible_confidence_window(
                jnp.array(row_m), jnp.float32(0.0), jnp.float32(FOV), jnp.float32(MAX_D),
                window=256, pixels_per_meter=20,
            )
        )
        want = oracles.oracle_visible_mask(depth, FOV, MIN_D, MAX_D, 20)
        got_c = embed_window_in_oracle_frame(got, want)
        # Compare as masks of visibility; rasterization differs on boundary px.
        diff = (got_c > 0) != (want > 0)
        assert diff.mean() < 0.03, f"visibility mask mismatch {diff.mean():.3f}"
        # Confidence values agree where both are visible (away from boundary).
        both = (got_c > 0) & (want > 0)
        err = np.abs(got_c - want)[both]
        assert np.percentile(err, 95) < 0.02

    @pytest.mark.parametrize("yaw", [0.5, -1.2, np.pi / 2, 3.0])
    def test_rotation_consistency(self, yaw):
        """Rotating the camera should rotate the mask (check via polar stats)."""
        depth = np.ones((48, 64), np.float32) * 0.8
        row_m = depth_row_max(jnp.array(depth), MIN_D, MAX_D)
        m = np.asarray(
            visible_confidence_window(
                row_m, jnp.float32(yaw), jnp.float32(FOV), jnp.float32(MAX_D),
                window=256, pixels_per_meter=20,
            )
        )
        # Centroid of the visible mask should lie along the heading direction.
        rr, cc = np.nonzero(m > 0)
        dr = rr.mean() - 128
        dc = cc.mean() - 128
        ang = np.arctan2(-dc, dr)  # map (drow, dcol) -> world bearing
        assert np.isclose(np.angle(np.exp(1j * (ang - yaw))), 0.0, atol=0.05)
        # Area invariant under rotation.
        m0 = np.asarray(
            visible_confidence_window(
                row_m, jnp.float32(0.0), jnp.float32(FOV), jnp.float32(MAX_D),
                window=256, pixels_per_meter=20,
            )
        )
        assert abs((m > 0).sum() - (m0 > 0).sum()) / (m0 > 0).sum() < 0.02


class TestFusion:
    def _update(self, state, values, depth, x, y, yaw, **kw):
        tf = xyz_yaw_to_tf_matrix(jnp.array([x, y, 0.0]), jnp.float32(yaw))
        return VM.update(
            state, SPEC, jnp.array(values), jnp.array(depth), tf, MIN_D, MAX_D, FOV, **kw
        )

    def test_single_update_writes_cone(self):
        state = VM.create(SPEC, 1)
        depth = synthetic_depth()
        state = self._update(state, [0.7], depth, 0.0, 0.0, 0.0)
        conf = np.asarray(SPEC.crop_logical(state.conf))
        vals = np.asarray(SPEC.crop_logical(state.values))[..., 0]
        assert conf.max() > 0.9
        assert np.allclose(vals[conf > 0], 0.7)
        # The cone lies "down-rows" (world +x) of the camera pixel.
        rr, cc = np.nonzero(conf > 0)
        assert rr.mean() > SPEC.origin

    @pytest.mark.parametrize("use_max", [True, False])
    def test_two_view_fusion_matches_oracle(self, use_max):
        depth1 = synthetic_depth(1)
        depth2 = synthetic_depth(2)
        state = VM.create(SPEC, 1)
        state = self._update(state, [0.4], depth1, 0.0, 0.0, 0.0, use_max_confidence=use_max)
        conf1 = np.asarray(SPEC.crop_logical(state.conf)).copy()
        vals1 = np.asarray(SPEC.crop_logical(state.values)).copy()
        state = self._update(state, [0.9], depth2, 0.0, 0.0, 0.9, use_max_confidence=use_max)
        conf2 = np.asarray(SPEC.crop_logical(state.conf))
        vals2 = np.asarray(SPEC.crop_logical(state.values))

        # Oracle-fuse the second view's projected confidence into view 1 state.
        row_m = depth_row_max(jnp.array(depth2), MIN_D, MAX_D)
        new_conf = np.zeros_like(conf1)
        w = np.asarray(
            visible_confidence_window(
                row_m, jnp.float32(0.9), jnp.float32(FOV), jnp.float32(MAX_D),
                window=256, pixels_per_meter=20,
            )
        )
        o = SPEC.origin
        new_conf[o - 128 : o + 128, o - 128 : o + 128] = w
        want_conf, want_vals = oracles.oracle_fuse(
            conf1, vals1, new_conf, np.array([0.9]), use_max
        )
        assert np.allclose(conf2, want_conf, atol=1e-5)
        assert np.allclose(vals2, want_vals, atol=1e-5)

    def test_replace_fusion(self):
        depth = synthetic_depth()
        state = VM.create(SPEC, 1)
        state = self._update(state, [0.4], depth, 0.0, 0.0, 0.0)
        state = self._update(
            state, [0.9], depth, 0.0, 0.0, 0.0, fusion_type=VM.FUSION_REPLACE
        )
        vals = np.asarray(SPEC.crop_logical(state.values))[..., 0]
        conf = np.asarray(SPEC.crop_logical(state.conf))
        assert set(np.unique(vals[conf > 0])) == {np.float32(0.9)}

    def test_multichannel(self):
        depth = synthetic_depth()
        state = VM.create(SPEC, 2)
        state = self._update(state, [0.3, 0.8], depth, 1.0, -1.0, 0.4)
        vals = np.asarray(SPEC.crop_logical(state.values))
        conf = np.asarray(SPEC.crop_logical(state.conf))
        assert np.all(vals[conf > 0, 0] == np.float32(0.3))
        assert np.all(vals[conf > 0, 1] == np.float32(0.8))


class TestWaypointValues:
    def test_median_matches_oracle(self):
        state = VM.create(SPEC, 1)
        depth = synthetic_depth()
        tf = xyz_yaw_to_tf_matrix(jnp.array([0.0, 0.0, 0.0]), jnp.float32(0.0))
        state = VM.update(
            state, SPEC, jnp.array([0.42]), jnp.array(depth), tf, MIN_D, MAX_D, FOV
        )
        wps = jnp.array([[2.0, 0.0], [-3.0, -3.0]])
        valid = jnp.array([True, True])
        got = np.asarray(
            VM.waypoint_values(state, SPEC, wps, valid, radius_px=10)
        )
        img = np.asarray(SPEC.crop_logical(state.values))[..., 0]
        for i, wp in enumerate(np.asarray(wps)):
            r = int(round(wp[0] * 20)) + SPEC.origin
            c = SPEC.origin - int(round(wp[1] * 20))
            want = oracles.oracle_pixel_value_within_radius(img, (r, c), 10)
            assert got[i, 0] == pytest.approx(want, abs=1e-5)

    def test_sorting(self):
        vals = jnp.array([0.1, 0.9, 0.5])
        wps = jnp.array([[0.0, 0.0], [1.0, 1.0], [2.0, 2.0]])
        valid = jnp.array([True, True, False])
        spts, svals, order = VM.sort_waypoints_single_channel(vals, wps, valid)
        assert np.asarray(order).tolist() == [1, 0, 2]
        assert np.asarray(svals)[:2].tolist() == [np.float32(0.9), np.float32(0.1)]


class TestRadixMedian:
    def test_matches_sort_selection_exactly(self):
        """ops/median.py radix bisection == jnp.sort selection, bit-for-bit."""
        from vlfm_tpu.ops.median import masked_median

        rng = np.random.default_rng(0)
        vals = rng.uniform(0.0, 1.0, (64, 441)).astype(np.float32)
        frac = rng.uniform(0.0, 1.0, (64, 1))
        valid = rng.random((64, 441)) < frac
        valid[0] = False  # an all-invalid row
        valid[1] = False
        valid[1, 7] = True  # a single-element row
        got = np.asarray(masked_median(jnp.asarray(vals), jnp.asarray(valid)))
        for i in range(64):
            v = np.sort(vals[i][valid[i]])
            if v.size == 0:
                want = np.float32(-1.0)
            else:
                want = (v[(v.size - 1) // 2] + v[v.size // 2]) * np.float32(0.5)
            assert got[i] == want, f"row {i}"
