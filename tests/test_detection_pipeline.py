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
