"""Weight bundle round-trip: save tiny models, reload, serve identically.

The bundle (manifest + orbax trees + vocab) is the production serving
artifact (scripts/convert_checkpoints.py); load_bundle must reconstruct the
exact configs and parameters, and full_stack_from_bundle must produce a
perception stack whose outputs match the source models'.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vlfm_tpu.models.blip2_itm import BLIP2ITM, BLIP2ITMConfig
from vlfm_tpu.models.owl_vit import OwlViTDetConfig, OwlViTDetector
from vlfm_tpu.models.sam import SAM, SamConfig
from vlfm_tpu.runner.weights import full_stack_from_bundle, load_bundle, save_bundle


@pytest.fixture(scope="module")
def bundle(tmp_path_factory):
    d = tmp_path_factory.mktemp("bundle")
    itm = BLIP2ITM.init_random(BLIP2ITMConfig.tiny(), seed=0)
    det = OwlViTDetector.init_random(OwlViTDetConfig.tiny(), seed=1)
    sam = SAM.init_random(SamConfig.tiny_mobile_sam(), seed=2)
    vocab = d / "vocab.txt"
    vocab.write_text("\n".join(
        ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "a", "b", "toilet", "chair"]
    ))
    path = save_bundle(str(d / "b"), itm=itm, detector=det, sam=sam,
                       vocab_file=str(vocab))
    return path, itm, det, sam


def test_roundtrip_configs_and_params(bundle):
    path, itm, det, sam = bundle
    b = load_bundle(path)
    assert b.itm.cfg == itm.cfg
    assert b.detector.cfg == det.cfg
    assert b.sam.cfg == sam.cfg
    for src, got in ((itm, b.itm), (det, b.detector), (sam, b.sam)):
        leaves_a = jax.tree_util.tree_leaves(src.params)
        leaves_b = jax.tree_util.tree_leaves(got.params)
        assert len(leaves_a) == len(leaves_b)
        for a, c in zip(leaves_a, leaves_b):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(c))
    assert b.tokenizer is not None
    assert b.tokenizer.encode("toilet")  # real vocab in use


def test_roundtrip_serves_identically(bundle):
    path, itm, _, _ = bundle
    b = load_bundle(path)
    s = itm.cfg.vit.image_size
    rgb = jax.random.uniform(jax.random.PRNGKey(3), (2, s, s, 3))
    ids = jnp.ones((1, 6), jnp.int32)
    mask = jnp.ones((1, 6), bool)
    np.testing.assert_array_equal(
        np.asarray(b.itm.cosine(rgb, ids, mask)),
        np.asarray(itm.cosine(rgb, ids, mask)),
    )


def test_bf16_cast_on_load(bundle):
    path, *_ = bundle
    b = load_bundle(path, dtype=jnp.bfloat16)
    assert b.itm.params["vision_proj"]["kernel"].dtype == jnp.bfloat16


def test_full_stack_from_bundle_runs(bundle):
    from vlfm_tpu.config import VLFMConfig

    path, *_ = bundle
    fsp = full_stack_from_bundle(VLFMConfig(), path)
    rgb = np.random.default_rng(0).integers(0, 255, (2, 48, 64, 3), np.uint8)
    cos, masks, valid = fsp.batch(rgb, "toilet")
    assert cos.shape[0] == 2 and masks.shape[0] == 2 and valid.shape[0] == 2
    assert np.isfinite(np.asarray(cos)).all()


def test_gdino_zoedepth_vqa_roundtrip(tmp_path):
    import numpy as _np

    from vlfm_tpu.models.blip2_vqa import BLIP2VQA, BLIP2VQAConfig
    from vlfm_tpu.models.grounding_dino import (
        GroundingDinoDetector, GroundingDinoJaxConfig)
    from vlfm_tpu.models.zoedepth import ZoeDepth

    gd = GroundingDinoDetector.init_random(
        GroundingDinoJaxConfig.tiny_test(), seed=0)
    zd = ZoeDepth.init_random(seed=1)
    vq = BLIP2VQA.init_random(BLIP2VQAConfig.tiny(), seed=2)
    path = save_bundle(str(tmp_path / "b2"), gdino=gd, zoedepth=zd, vqa=vq)
    b = load_bundle(path)
    assert b.gdino.cfg == gd.cfg
    assert b.zoedepth.cfg == zd.cfg
    assert b.vqa.cfg == vq.cfg
    for src, got in ((gd, b.gdino), (zd, b.zoedepth), (vq, b.vqa),
                     (vq.t5, b.vqa.t5)):
        la = jax.tree_util.tree_leaves(src.params)
        lb = jax.tree_util.tree_leaves(got.params)
        assert len(la) == len(lb)
        for a, c in zip(la, lb):
            _np.testing.assert_array_equal(_np.asarray(a), _np.asarray(c))
    # zoedepth serves through the monodepth contract
    rgb = _np.random.default_rng(0).integers(0, 255, (1, 24, 32, 3), _np.uint8)
    d = b.zoedepth.infer_depth(jnp.asarray(rgb), 0.0, 5.0)
    assert d.shape == (1, 24, 32) and bool(jnp.isfinite(d).all())
