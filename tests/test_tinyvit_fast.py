"""encode_fused (models/tinyvit_fast.py) must match the flax TinyViT module
on the same params — the fused path is a serving-time rewrite, not a new
model (reference: mobile_sam tiny_vit, vlfm/vlm/sam.py:24-57)."""

import jax
import jax.numpy as jnp
import numpy as np

from vlfm_tpu.models.tinyvit import TinyViT, TinyViTConfig
from vlfm_tpu.models.tinyvit_fast import encode_fused


def test_encode_fused_matches_flax_tiny():
    cfg = TinyViTConfig.tiny()
    enc = TinyViT(cfg)
    rng = jax.random.PRNGKey(0)
    x = jax.random.uniform(rng, (2, cfg.img_size, cfg.img_size, 3), minval=-1, maxval=1)
    params = enc.init(jax.random.PRNGKey(1), x)["params"]
    want = enc.apply({"params": params}, x)
    got = encode_fused(params, x, cfg, interpret=True)
    assert got.shape == want.shape == (2, cfg.grid, cfg.grid, cfg.out_channels)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=3e-3, rtol=3e-3)


def test_encode_fused_through_sam_decoder():
    """The fused embedding must drive SamModule.decode_boxes to the same masks
    as the monolithic __call__ (the integration seam SAM.segment_boxes uses)."""
    from vlfm_tpu.models.sam import SAM, SamConfig, SamModule

    cfg = SamConfig.tiny_mobile_sam()
    sam = SAM.init_random(cfg, seed=0)
    s = cfg.vision.image_size
    imgs = jax.random.uniform(
        jax.random.PRNGKey(2), (1, s, s, 3), minval=0.0, maxval=255.0
    )
    boxes = jnp.asarray([[[0.1, 0.1, 0.7, 0.8], [0.3, 0.2, 0.9, 0.9]]])
    want_masks, want_iou = sam.module.apply({"params": sam.params}, imgs, boxes)

    from vlfm_tpu.models.sam import SAM_MEAN, SAM_STD

    normed = (imgs - jnp.asarray(SAM_MEAN)) / jnp.asarray(SAM_STD)
    emb = encode_fused(sam.params["vision"], normed, cfg.tinyvit, interpret=True)
    got_masks, got_iou = sam.module.apply(
        {"params": sam.params}, emb, boxes, method=SamModule.decode_boxes
    )
    np.testing.assert_allclose(np.asarray(got_iou), np.asarray(want_iou), atol=1e-3)
    np.testing.assert_allclose(np.asarray(got_masks), np.asarray(want_masks), atol=1e-2)
