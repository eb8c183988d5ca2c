import jax
import jax.numpy as jnp
import numpy as np

from tests.test_sam import matching_cfg as sam_cfg
from vlfm_tpu.models.grounding_dino import (
    GroundingDinoDetector,
    GroundingDinoJaxConfig,
    GroundingDinoQueryAdapter,
    build_caption_ids,
)
from vlfm_tpu.models.sam import SAM
from vlfm_tpu.parallel.detection_pipeline import DetectionPipeline

jax.config.update("jax_default_device", jax.devices("cpu")[0])


def test_caption_builder_spans():
    ids, mask, spans = build_caption_ids([np.array([5, 6]), np.array([7])], 16)
    assert ids[0, :8].tolist() == [101, 5, 6, 1012, 7, 1012, 102, 0]
    assert spans == [(1, 3), (4, 5)]
    assert mask[0, :7].all() and not mask[0, 7]


def test_gdino_drives_detection_pipeline():
    det = GroundingDinoDetector.init_random(GroundingDinoJaxConfig.tiny_test(), seed=0)
    adapter = GroundingDinoQueryAdapter(det, image_size=64)
    rng = np.random.default_rng(3)
    encode = adapter.make_query_encoder(lambda name: rng.integers(2, 99, 3))
    pipe = DetectionPipeline(
        adapter, SAM.init_random(sam_cfg(), seed=0), encode,
        non_coco_threshold=0.0, max_detections=4,
    )
    rgb = jnp.asarray(np.random.default_rng(0).integers(0, 255, (1, 96, 128, 3), np.uint8))
    masks, valid, (xyxy, scores, cls) = pipe(rgb, "fireplace|seating")
    assert masks.shape == (1, 4, 96, 128)
    assert np.asarray(cls).max() <= 1  # class ids index the two phrases
    b = np.asarray(xyxy)
    assert ((b >= 0) & (b <= 1)).all()
