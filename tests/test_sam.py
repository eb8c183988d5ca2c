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
