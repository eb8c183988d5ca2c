import jax
import jax.numpy as jnp
import numpy as np

from vlfm_tpu.models.owl_vit import OwlViTDetConfig, OwlViTDetector
from vlfm_tpu.models.sam import SAM, SamConfig
from vlfm_tpu.parallel.detection_pipeline import DetectionPipeline
from tests.test_sam import matching_cfg as sam_tiny_cfg

jax.config.update("jax_default_device", jax.devices("cpu")[0])


def fake_encode(names):
    rng = np.random.default_rng(hash(tuple(names)) % 2**31)
    ids = rng.integers(1, 99, (len(names), 8)).astype(np.int32)
    return ids, np.ones_like(ids, bool)


def test_pipeline_end_to_end_shapes():
    det = OwlViTDetector.init_random(OwlViTDetConfig.tiny(), seed=0)
    sam = SAM.init_random(sam_tiny_cfg(), seed=0)
    pipe = DetectionPipeline(det, sam, fake_encode, max_detections=4)
    rgb = jnp.asarray(np.random.default_rng(0).integers(0, 255, (2, 48, 64, 3), np.uint8))
    masks, valid, (xyxy, scores, cls) = pipe(rgb, "toilet")
    assert masks.shape == (2, 4, 48, 64)
    assert valid.shape == (2, 4)
    assert xyxy.shape == (2, 4, 4)
    # masks only where valid
    assert not np.asarray(masks)[~np.asarray(valid)].any()
    # query cache reused
    pipe(rgb, "toilet")
    assert len(pipe._query_cache) == 1
    pipe(rgb, "fireplace")
    assert len(pipe._query_cache) == 2


def test_pipeline_sam_gating_preserves_outputs():
    """With sam_frame_capacity covering every detection frame, pipeline
    outputs are unchanged (VERDICT round-2 item #4 parity criterion)."""
    det = OwlViTDetector.init_random(OwlViTDetConfig.tiny(), seed=0)
    sam = SAM.init_random(sam_tiny_cfg(), seed=0)
    rgb = jnp.asarray(
        np.random.default_rng(1).integers(0, 255, (4, 48, 64, 3), np.uint8)
    )
    plain = DetectionPipeline(det, sam, fake_encode, max_detections=4,
                              non_coco_threshold=0.0)
    gated = DetectionPipeline(det, sam, fake_encode, max_detections=4,
                              non_coco_threshold=0.0, sam_frame_capacity=4)
    m0, v0, _ = plain(rgb, "toilet")
    m1, v1, _ = gated(rgb, "toilet")
    # capacity == batch keeps every detection frame: identical outputs
    np.testing.assert_array_equal(np.asarray(v0), np.asarray(v1))
    np.testing.assert_array_equal(np.asarray(m0), np.asarray(m1))
    assert np.asarray(v0).any(), "threshold 0 should yield detections"
    # a 1-frame capacity now multi-passes (density-adaptive, round-5): every
    # detection frame is segmented across ceil(dense/1) passes and outputs
    # are IDENTICAL to the ungated pipeline — nothing drops
    tight = DetectionPipeline(det, sam, fake_encode, max_detections=4,
                              non_coco_threshold=0.0, sam_frame_capacity=1)
    m2, v2, _ = tight(rgb, "toilet")
    np.testing.assert_array_equal(np.asarray(v2), np.asarray(v0))
    np.testing.assert_array_equal(np.asarray(m2), np.asarray(m0))
