import jax
import jax.numpy as jnp
import numpy as np

from vlfm_tpu.mapping import object_map as OBJ
from vlfm_tpu.ops.clustering import largest_cluster_mask
from vlfm_tpu.utils.geometry import xyz_yaw_to_tf_matrix

MIN_D, MAX_D = 0.5, 5.0
FOV = np.deg2rad(79)
FX = FY = 640 / (2 * np.tan(FOV / 2))


def make_depth_with_blob(dist_m, h=480, w=640, cx=320, cy=240, r=60):
    depth = np.full((h, w), 0.95, np.float32)  # background near max range
    yy, xx = np.mgrid[:h, :w]
    blob = (xx - cx) ** 2 + (yy - cy) ** 2 < r * r
    depth[blob] = (dist_m - MIN_D) / (MAX_D - MIN_D)
    mask = blob
    return depth, mask


class TestClustering:
    def test_largest_cluster(self):
        rng = np.random.default_rng(0)
        a = rng.normal(scale=0.05, size=(60, 3))
        b = rng.normal(scale=0.05, size=(30, 3)) + 5.0
        noise = rng.uniform(-10, 10, size=(10, 3))
        pts = np.vstack([a, b, noise]).astype(np.float32)
        valid = np.ones(100, bool)
        keep = np.asarray(
            largest_cluster_mask(jnp.array(pts), jnp.array(valid), jnp.float32(0.3), jnp.int32(5))
        )
        assert keep[:60].all()
        assert not keep[60:].any()

    def test_only_noise(self):
        pts = np.arange(30, dtype=np.float32).reshape(10, 3) * 10
        keep = np.asarray(
            largest_cluster_mask(jnp.array(pts), jnp.ones(10, bool), jnp.float32(0.2), jnp.int32(3))
        )
        assert not keep.any()


class TestObjectMap:
    def _update(self, state, depth, mask, x=0.0, y=0.0, yaw=0.0, seed=0):
        tf = xyz_yaw_to_tf_matrix(jnp.array([x, y, 0.88]), jnp.float32(yaw))
        return OBJ.update(
            state, jax.random.PRNGKey(seed), jnp.array(depth), jnp.array(mask),
            tf, MIN_D, MAX_D, FX, FY,
        )

    def test_detection_inserted_and_located(self):
        state = OBJ.create(slots=8, points_per_slot=256)
        depth, mask = make_depth_with_blob(3.0)
        state = self._update(state, depth, mask)
        assert bool(OBJ.has_object(state))
        target, state = OBJ.get_best_object(state, jnp.zeros(2))
        t = np.asarray(target)
        # blob is straight ahead at ~3 m -> target near (3, 0)
        assert abs(t[0] - 3.0) < 0.5 and abs(t[1]) < 0.5

    def test_too_close_rejected(self):
        state = OBJ.create(slots=8, points_per_slot=256)
        depth, mask = make_depth_with_blob(0.7)
        state = self._update(state, depth, mask)
        assert not bool(OBJ.has_object(state))

    def test_hysteresis(self):
        state = OBJ.create(slots=8, points_per_slot=256)
        depth, mask = make_depth_with_blob(3.0)
        state = self._update(state, depth, mask)
        t1, state = OBJ.get_best_object(state, jnp.zeros(2))
        # new detection shifted by ~5 cm: target must not move
        depth2, mask2 = make_depth_with_blob(3.05)
        state = self._update(state, depth2, mask2, seed=1)
        t2, state = OBJ.get_best_object(state, jnp.zeros(2))
        assert np.allclose(np.asarray(t1), np.asarray(t2))

    def test_offset_detection_is_suspect_and_evicted(self):
        state = OBJ.create(slots=8, points_per_slot=256)
        # blob hugging the left edge of the image -> suspect
        depth, mask = make_depth_with_blob(3.0, cx=30, cy=240, r=30)
        state = self._update(state, depth, mask)
        assert bool(OBJ.has_object(state))
        assert not bool(state.point_in_range[0].any())
        # approach: the suspect points fall inside the half-range cone and the
        # slot is evicted
        tf = xyz_yaw_to_tf_matrix(jnp.array([1.0, 1.0, 0.88]), jnp.float32(0.5))
        state = OBJ.update_explored(state, tf, jnp.float32(MAX_D), jnp.float32(FOV))
        assert not bool(OBJ.has_object(state))

    def test_mixed_detection_keeps_in_range_points(self):
        """Per-point range semantics (object_point_cloud_map.py:48-61 +
        102-132): a detection straddling the 95% range margin keeps its
        in-range points through update_explored — only the suspect-point
        group is removed when it re-enters the half-range cone."""
        state = OBJ.create(slots=8, points_per_slot=256)
        # centered blob whose depth ramps across the 0.95*MAX_D margin:
        # left half ~4.2 m (in range), right half ~4.9 m (suspect)
        h, w = 480, 640
        depth = np.full((h, w), 0.95, np.float32)
        yy, xx = np.mgrid[:h, :w]
        blob = (xx - 320) ** 2 + (yy - 240) ** 2 < 80 * 80
        near = blob & (xx < 320)
        far = blob & (xx >= 320)
        depth[near] = (4.2 - MIN_D) / (MAX_D - MIN_D)
        depth[far] = (4.9 - MIN_D) / (MAX_D - MIN_D)
        state = OBJ.update(
            state, jax.random.PRNGKey(0), jnp.array(depth), jnp.array(blob),
            xyz_yaw_to_tf_matrix(jnp.array([0.0, 0.0, 0.88]), jnp.float32(0.0)),
            MIN_D, MAX_D, FX, FY, use_dbscan=False,
        )
        in_r = np.asarray(state.point_in_range[0] & state.point_valid[0])
        sus = np.asarray(~state.point_in_range[0] & state.point_valid[0])
        assert in_r.any() and sus.any(), "blob must straddle the margin"
        # approach to ~3 m in front: the suspect points (~4.9 m out) fall
        # well inside the half-range (2.5 m) cone -> suspect group dropped,
        # in-range points survive even though they are in the cone too
        tf = xyz_yaw_to_tf_matrix(jnp.array([3.0, 0.0, 0.88]), jnp.float32(0.0))
        state = OBJ.update_explored(state, tf, jnp.float32(MAX_D), jnp.float32(FOV))
        assert bool(OBJ.has_object(state))
        left = np.asarray(state.point_valid[0])
        np.testing.assert_array_equal(left, in_r)

    def test_in_range_preferred(self):
        state = OBJ.create(slots=8, points_per_slot=256)
        depth_sus, mask_sus = make_depth_with_blob(3.0, cx=25, cy=240, r=25)
        state = self._update(state, depth_sus, mask_sus)
        depth_ok, mask_ok = make_depth_with_blob(2.0)
        state = self._update(state, depth_ok, mask_ok, seed=2)
        target, state = OBJ.get_best_object(state, jnp.zeros(2))
        t = np.asarray(target)
        assert abs(t[0] - 2.0) < 0.5 and abs(t[1]) < 0.5

    def test_reset(self):
        state = OBJ.create(slots=8, points_per_slot=256)
        depth, mask = make_depth_with_blob(3.0)
        state = self._update(state, depth, mask)
        state = OBJ.reset(state)
        assert not bool(OBJ.has_object(state))


def test_update_batch_equals_sequential():
    """update_batch must fill the same slots with the same points as K
    sequential update() calls using the same per-detection keys."""
    import jax

    state = OBJ.create(slots=8, points_per_slot=64)
    h, w = 32, 40
    rng = jax.random.PRNGKey(5)
    depth = jax.random.uniform(jax.random.PRNGKey(6), (h, w), minval=0.3, maxval=0.9)
    masks = np.zeros((3, h, w), bool)
    masks[0, 8:20, 8:20] = True     # valid detection
    masks[1] = False                # empty -> no-op
    masks[2, 10:26, 18:34] = True   # valid detection
    masks = jnp.asarray(masks)
    valid = jnp.asarray([True, True, True])
    tf = jnp.eye(4)

    batched = OBJ.update_batch(
        state, rng, depth, masks, valid, tf, 0.0, 5.0, 20.0, 20.0,
        erosion_size=1,
    )

    seq = state
    for i, key in enumerate(jax.random.split(rng, 3)):
        seq = OBJ.update(
            seq, key, depth, masks[i], tf, 0.0, 5.0, 20.0, 20.0,
            erosion_size=1,
        )

    assert int(batched.cursor) == int(seq.cursor)
    np.testing.assert_array_equal(np.asarray(batched.slot_used), np.asarray(seq.slot_used))
    np.testing.assert_array_equal(
        np.asarray(batched.point_valid), np.asarray(seq.point_valid))
    np.testing.assert_allclose(
        np.asarray(batched.points), np.asarray(seq.points), atol=1e-5)
    np.testing.assert_array_equal(
        np.asarray(batched.point_in_range), np.asarray(seq.point_in_range))


def test_subsample_never_loses_small_masks():
    """A 1-pixel mask at odd coordinates must still be sampleable: the
    coarse sampling lattice is an any-pool, not a decimation."""
    import jax

    h, w = 16, 20
    for (r, c) in [(3, 5), (0, 0), (15, 19), (7, 18)]:
        eroded = jnp.zeros((h, w), bool).at[r, c].set(True)
        idx, keep = OBJ._subsample(jax.random.PRNGKey(0), eroded, 8)
        assert bool(keep[0]), (r, c)
        assert int(idx[0]) == r * w + c, (int(idx[0]), r * w + c)


def test_subsample_indices_within_mask():
    import jax

    rng = np.random.default_rng(3)
    eroded = jnp.asarray(rng.random((32, 40)) < 0.1)
    idx, keep = OBJ._subsample(jax.random.PRNGKey(1), eroded, 64)
    flat = np.asarray(eroded).reshape(-1)
    for i, k in zip(np.asarray(idx), np.asarray(keep)):
        if k:
            assert flat[i]


def test_dense_nth_set_bit_equals_bisection():
    """The MXU reformulation of t-th-set-bit selection must be BIT-identical
    to searchsorted over the cumsum — including chunk-boundary targets,
    empty masks, and t == total — at sizes spanning multiple 512-lane
    chunks (the object-map lattice is 76800 wide)."""
    import jax

    from vlfm_tpu.ops.sparse import _LANES, _nth_set_bit_dense

    rng = np.random.default_rng(7)
    # The 1638400 case exercises counts ~1e6, far beyond bf16's integer
    # range: it pins that the exclusive-chunk-prefix fetch stays a gather
    # (exact) and never regresses to a default-precision matvec, which on
    # TPU truncates inputs to bf16 and shifts indices by hundreds.
    for n, density in [(76800, 0.03), (76800, 0.6), (3072, 0.2), (100, 0.5),
                       (2 * _LANES, 1.0), (512, 0.0), (1638400, 0.9)]:
        mask = jnp.asarray(rng.random(n) < density)
        prefix = np.cumsum(np.asarray(mask).astype(np.int64))
        total = int(prefix[-1])
        if total == 0:
            continue
        t_np = np.unique(
            np.concatenate([
                rng.integers(1, total + 1, 64),
                [1, total],
                prefix[prefix > 0][:4],  # exact chunk-prefix boundary hits
            ])
        ).astype(np.int32)
        idx, tot = _nth_set_bit_dense(mask, jnp.asarray(t_np))
        assert int(tot) == total
        want = np.searchsorted(prefix, t_np, side="left")
        np.testing.assert_array_equal(np.asarray(idx), want)
