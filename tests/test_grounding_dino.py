import jax
import jax.numpy as jnp
import numpy as np
import torch

from vlfm_tpu.models.grounding_dino import (
    GroundingDinoDetector,
    GroundingDinoJaxConfig,
    convert_hf_grounding_dino,
    text_phrase_masks,
)

jax.config.update("jax_default_device", jax.devices("cpu")[0])


def tiny_hf():
    from transformers import GroundingDinoConfig, GroundingDinoForObjectDetection

    cfg = GroundingDinoConfig(
        backbone_config=dict(
            model_type="swin", image_size=64, patch_size=4, embed_dim=16,
            depths=[2, 2], num_heads=[2, 4], window_size=4,
            out_features=["stage1", "stage2"],
            hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0, drop_path_rate=0.0,
        ),
        text_config=dict(
            model_type="bert", hidden_size=32, num_hidden_layers=2,
            num_attention_heads=2, intermediate_size=64, vocab_size=2000,
            max_position_embeddings=64, hidden_dropout_prob=0.0,
            attention_probs_dropout_prob=0.0,
        ),
        d_model=32, encoder_layers=2, decoder_layers=2,
        encoder_attention_heads=2, decoder_attention_heads=2,
        encoder_ffn_dim=64, decoder_ffn_dim=64, num_queries=10,
        num_feature_levels=2, max_text_len=16,
        encoder_n_points=2, decoder_n_points=2,
        dropout=0.0, activation_dropout=0.0, fusion_dropout=0.0,
        fusion_droppath=0.0, text_enhancer_dropout=0.0,
        disable_custom_kernels=True,
    )
    torch.manual_seed(0)
    return GroundingDinoForObjectDetection(cfg).eval()


def make_inputs(seed=0, b=2, l=12):
    rng = np.random.default_rng(seed)
    imgs = rng.normal(size=(b, 64, 64, 3)).astype(np.float32)
    ids = np.full((b, l), 0, np.int64)
    for r in range(b):
        ids[r, 0] = 101
        body = rng.integers(2, 99, l - 2)
        body[3] = 1012  # '.' separating two phrases
        body[(body == 101) | (body == 102) | (body == 1012) | (body == 1029)] = 7
        body[3] = 1012
        ids[r, 1:-1] = body
        ids[r, -1] = 102
    am = np.ones((b, l), np.int64)
    return imgs, ids, am


def test_text_phrase_masks():
    ids = np.array([[101, 5, 6, 1012, 8, 102]])
    m, pos = text_phrase_masks(ids)
    assert m.shape == (1, 6, 6)
    assert m[0, 1, 2] and m[0, 1, 3]  # phrase 1 block incl. closing '.'
    assert not m[0, 1, 4]  # next phrase blocked
    assert pos[0].tolist() == [0, 0, 1, 2, 0, 0]


def test_grounding_dino_matches_hf():
    hf = tiny_hf()
    cfg = GroundingDinoJaxConfig.tiny_test()
    params = convert_hf_grounding_dino(hf.state_dict(), cfg)
    ours = GroundingDinoDetector(cfg, params)

    imgs, ids, am = make_inputs()
    with torch.no_grad():
        out = hf(
            pixel_values=torch.tensor(imgs.transpose(0, 3, 1, 2)),
            input_ids=torch.tensor(ids),
            attention_mask=torch.tensor(am),
        )
    want_logits = out.logits.numpy()  # (B, Q, max_text_len)
    want_boxes = out.pred_boxes.numpy()

    logits, boxes = ours.predict(jnp.asarray(imgs), ids, am)
    logits = np.asarray(logits)
    boxes = np.asarray(boxes)
    assert logits.shape == want_logits.shape
    assert boxes.shape == want_boxes.shape

    finite = np.isfinite(want_logits)
    assert (np.isfinite(logits) == finite).all()
    lerr = np.abs(logits[finite] - want_logits[finite]).max()
    berr = np.abs(boxes - want_boxes).max()
    assert lerr < 5e-3, lerr
    assert berr < 5e-3, berr
