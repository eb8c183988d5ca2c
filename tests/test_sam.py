import jax
import jax.numpy as jnp
import numpy as np
import torch

from vlfm_tpu.models.sam import SAM, SamConfig, convert_hf_sam

jax.config.update("jax_default_device", jax.devices("cpu")[0])


def tiny_hf_sam():
    from transformers import (
        SamConfig as HFSamConfig,
        SamMaskDecoderConfig,
        SamModel,
        SamPromptEncoderConfig,
        SamVisionConfig,
    )

    vc = SamVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=2, image_size=64, patch_size=8,
        global_attn_indexes=[1], window_size=2, output_channels=16,
        num_pos_feats=8,  # PE feature count must match decoder hidden // 2
    )
    pc = SamPromptEncoderConfig(
        hidden_size=16, image_size=64, patch_size=8, mask_input_channels=4
    )
    mc = SamMaskDecoderConfig(
        hidden_size=16, num_hidden_layers=2, num_attention_heads=2, mlp_dim=32,
        iou_head_depth=2, iou_head_hidden_dim=16,
    )
    cfg = HFSamConfig(
        vision_config=vc.to_dict(),
        prompt_encoder_config=pc.to_dict(),
        mask_decoder_config=mc.to_dict(),
    )
    torch.manual_seed(0)
    return SamModel(cfg).eval()


def matching_cfg():
    from vlfm_tpu.models.sam import SamDecoderConfig, SamVisionConfig

    return SamConfig(
        vision=SamVisionConfig(
            image_size=64, patch_size=8, width=32, depth=2, heads=2,
            mlp_dim=128, window_size=2, global_attn_indexes=(1,), out_channels=16,
        ),
        decoder=SamDecoderConfig(
            hidden=16, layers=2, heads=2, mlp_dim=32,
            iou_head_depth=2, iou_head_hidden=16,
        ),
        pe_dim=8,
    )


def test_sam_matches_hf():
    hf = tiny_hf_sam()
    cfg = matching_cfg()
    params = convert_hf_sam(hf.state_dict(), cfg)
    ours = SAM(cfg, params)

    rng = np.random.default_rng(0)
    raw = rng.uniform(0, 255, size=(2, 64, 64, 3)).astype(np.float32)
    boxes_px = np.array(
        [[[8.0, 8.0, 40.0, 40.0], [4.0, 20.0, 30.0, 60.0]]] * 2, np.float32
    )  # (2, 2, 4) in input pixels

    from vlfm_tpu.models.sam import SAM_MEAN, SAM_STD

    px = (raw - np.array(SAM_MEAN)) / np.array(SAM_STD)
    with torch.no_grad():
        out = hf(
            pixel_values=torch.tensor(px.transpose(0, 3, 1, 2), dtype=torch.float32),
            input_boxes=torch.tensor(boxes_px),
            multimask_output=True,
        )
    want_masks = out.pred_masks.numpy()  # (B, NB, M, 4G, 4G)
    want_iou = out.iou_scores.numpy()

    boxes01 = (boxes_px + 0.5) / 64.0
    masks, iou = SAM._segment(
        ours.module, ours.params, jnp.asarray(raw), jnp.asarray(boxes01)
    )
    got_masks = np.asarray(masks)
    got_iou = np.asarray(iou)

    # HF multimask_output=True returns tokens 1..M; ours returns all M+1
    assert got_iou[:, :, 1:].shape == want_iou.shape
    assert np.allclose(got_iou[:, :, 1:], want_iou, atol=3e-4), np.abs(
        got_iou[:, :, 1:] - want_iou
    ).max()
    assert got_masks[:, :, 1:].shape == want_masks.shape
    err = np.abs(got_masks[:, :, 1:] - want_masks).max()
    assert err < 3e-3, err


def test_segment_boxes_shapes():
    cfg = matching_cfg()
    ours = SAM.init_random(cfg, seed=0)
    imgs = jnp.asarray(np.random.default_rng(1).uniform(0, 255, (1, 64, 64, 3)).astype(np.float32))
    boxes01 = jnp.asarray([[[0.1, 0.1, 0.6, 0.6]]])
    masks, iou = ours.segment_boxes(imgs, boxes01)
    assert masks.shape == (1, 1, 32, 32)
    assert masks.dtype == bool


def test_segment_boxes_gated_matches_ungated_at_any_density():
    """Density-adaptive SAM frame-gating (VERDICT round-4 task #2): frames
    with detections are compacted and segmented in ceil(dense/capacity)
    passes of a static capacity-frame sub-batch. NO detection is dropped at
    any density — outputs match the ungated path on every detection frame,
    even when detection frames outnumber the capacity."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vlfm_tpu.models.sam import SAM, SamConfig

    sam = SAM.init_random(SamConfig.tiny(), seed=0)
    s = sam.cfg.vision.image_size
    rng = np.random.default_rng(0)
    b, nb = 6, 2
    imgs = jnp.asarray(rng.random((b, s, s, 3), np.float32) * 255.0)
    boxes = jnp.asarray(rng.random((b, nb, 4), np.float32) * 0.5 + 0.25)
    valid = jnp.asarray(
        np.array([[1, 0], [0, 0], [1, 1], [0, 0], [0, 1], [0, 0]], bool)
    )  # frames 0, 2, 4 have detections

    full, _ = sam.segment_boxes(imgs, boxes, fused=False)
    gated, kept = sam.segment_boxes_gated(imgs, boxes, valid, capacity=3, fused=False)
    # all three detection frames fit one pass: identical masks there
    for i in (0, 2, 4):
        np.testing.assert_array_equal(np.asarray(gated[i]), np.asarray(full[i]))
    np.testing.assert_array_equal(np.asarray(kept), np.asarray(valid))
    # no-detection frames come back all-false
    assert not np.asarray(gated[1]).any() and not np.asarray(gated[3]).any()

    # capacity 2 < 3 detection frames: a second pass picks up the overflow
    # frame; NOTHING drops (the pre-round-5 path cleared frame 4 here)
    gated2, kept2 = sam.segment_boxes_gated(imgs, boxes, valid, capacity=2, fused=False)
    np.testing.assert_array_equal(np.asarray(kept2), np.asarray(valid))
    for i in (0, 2, 4):
        np.testing.assert_array_equal(np.asarray(gated2[i]), np.asarray(full[i]))

    # 100% density with capacity 2 => 3 passes, still exact everywhere
    dense = jnp.ones((b, nb), bool)
    gated3, kept3 = sam.segment_boxes_gated(imgs, boxes, dense, capacity=2, fused=False)
    np.testing.assert_array_equal(np.asarray(kept3), np.asarray(dense))
    np.testing.assert_array_equal(np.asarray(gated3), np.asarray(full))
