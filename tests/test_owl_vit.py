import jax
import jax.numpy as jnp
import numpy as np
import torch

from vlfm_tpu.models.owl_vit import (
    OwlViTDetConfig,
    OwlViTDetector,
    convert_hf_owlvit,
    top_detections,
)

jax.config.update("jax_default_device", jax.devices("cpu")[0])


def tiny_hf():
    from transformers import OwlViTConfig, OwlViTForObjectDetection

    cfg = OwlViTConfig(
        text_config=dict(
            hidden_size=16, intermediate_size=32, num_hidden_layers=2,
            num_attention_heads=2, vocab_size=100, max_position_embeddings=16,
        ),
        vision_config=dict(
            hidden_size=32, intermediate_size=64, num_hidden_layers=2,
            num_attention_heads=2, image_size=64, patch_size=8,
        ),
        projection_dim=16,
    )
    cfg.text_config.projection_dim = 16
    cfg.vision_config.projection_dim = 16
    torch.manual_seed(0)
    return OwlViTForObjectDetection(cfg).eval()


def test_owlvit_matches_hf():
    hf = tiny_hf()
    cfg = OwlViTDetConfig.tiny()
    params = convert_hf_owlvit(hf.state_dict(), cfg)
    ours = OwlViTDetector(cfg, params)

    rng = np.random.default_rng(0)
    imgs = rng.uniform(0, 1, size=(2, 64, 64, 3)).astype(np.float32)
    ids = np.zeros((3, 16), np.int64)
    lens = [5, 8, 3]
    for t, L in enumerate(lens):
        ids[t, :L] = rng.integers(1, 99, L)
        ids[t, L - 1] = 99  # EOT = max id at the end
    am = (ids > 0).astype(np.int64)

    from vlfm_tpu.models.owl_vit import CLIP_MEAN, CLIP_STD

    px = (imgs - np.array(CLIP_MEAN)) / np.array(CLIP_STD)
    # HF expects per-image query batches: (B * T, L)
    ids_t = np.tile(ids, (2, 1))
    am_t = np.tile(am, (2, 1))
    with torch.no_grad():
        out = hf(
            pixel_values=torch.tensor(px.transpose(0, 3, 1, 2), dtype=torch.float32),
            input_ids=torch.tensor(ids_t),
            attention_mask=torch.tensor(am_t),
        )
    want_logits = out.logits.numpy()  # (B, P, T)
    want_boxes = out.pred_boxes.numpy()

    boxes, logits = ours.detect(
        jnp.asarray(imgs), jnp.asarray(ids, jnp.int32), jnp.asarray(am, bool)
    )
    assert np.asarray(logits).shape == want_logits.shape
    assert np.allclose(np.asarray(logits), want_logits, atol=3e-4), np.abs(
        np.asarray(logits) - want_logits
    ).max()
    assert np.allclose(np.asarray(boxes), want_boxes, atol=3e-4), np.abs(
        np.asarray(boxes) - want_boxes
    ).max()


def test_top_detections():
    cfg = OwlViTDetConfig.tiny()
    ours = OwlViTDetector.init_random(cfg, seed=0)
    imgs = jnp.asarray(np.random.default_rng(1).uniform(0, 1, (1, 64, 64, 3)).astype(np.float32))
    ids = jnp.asarray(np.random.default_rng(2).integers(1, 99, (2, 16)), jnp.int32)
    am = jnp.ones((2, 16), bool)
    boxes, logits = ours.detect(imgs, ids, am)
    xyxy, scores, cls, valid = top_detections(boxes, logits, capacity=5, threshold=0.0)
    assert xyxy.shape == (1, 5, 4)
    s = np.asarray(scores[0])
    assert (s[:-1] >= s[1:]).all()  # descending
    b = np.asarray(xyxy)
    assert (b[..., 2] >= b[..., 0]).all() and (b[..., 3] >= b[..., 1]).all()
    assert ((b >= 0) & (b <= 1)).all()
