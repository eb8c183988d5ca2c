import jax
import jax.numpy as jnp
import numpy as np
import torch

from vlfm_tpu.models.blip2_itm import (
    BLIP2ITM,
    BLIP2ITMConfig,
    convert_hf_state_dict,
)
from vlfm_tpu.models.qformer import QFormerConfig
from vlfm_tpu.models.vit import ViTConfig

jax.config.update("jax_default_device", jax.devices("cpu")[0])


def tiny_hf_model():
    from transformers import (
        Blip2Config,
        Blip2ForImageTextRetrieval,
        Blip2QFormerConfig,
        Blip2VisionConfig,
    )

    vc = Blip2VisionConfig(
        hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, image_size=56, patch_size=14,
    )
    qc = Blip2QFormerConfig(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=64, vocab_size=100, cross_attention_frequency=2,
        encoder_hidden_size=64, use_qformer_text_input=True,
    )
    cfg = Blip2Config.from_vision_qformer_text_configs(vc, qc, None)
    cfg.num_query_tokens = 8
    cfg.image_text_hidden_size = 16
    torch.manual_seed(0)
    return Blip2ForImageTextRetrieval(cfg).eval()


def matching_cfg():
    return BLIP2ITMConfig(
        vit=ViTConfig(image_size=56, patch_size=14, width=64, depth=2, heads=4, mlp_dim=128),
        qformer=QFormerConfig(
            hidden=32, layers=2, heads=4, intermediate=64,
            cross_attention_freq=2, num_queries=8, vocab_size=100,
        ),
        embed_dim=16,
        compute_dtype=jnp.float32,  # full precision for parity checking
    )


def test_itc_cosine_matches_hf():
    hf = tiny_hf_model()
    cfg = matching_cfg()
    params = convert_hf_state_dict(hf.state_dict(), cfg)
    ours = BLIP2ITM(cfg, params)

    rng = np.random.default_rng(0)
    imgs = rng.uniform(0, 1, size=(2, 56, 56, 3)).astype(np.float32)
    ids = rng.integers(0, 100, size=(3, 6)).astype(np.int64)
    am = np.ones((3, 6), np.int64)

    # HF consumes pre-normalized pixel_values; feed both sides identically
    # by inverting our in-graph CLIP normalization.
    from vlfm_tpu.models.blip2_itm import CLIP_MEAN, CLIP_STD

    px = (imgs - np.array(CLIP_MEAN)) / np.array(CLIP_STD)
    with torch.no_grad():
        out = hf(
            pixel_values=torch.tensor(px.transpose(0, 3, 1, 2), dtype=torch.float32),
            input_ids=torch.tensor(ids),
            attention_mask=torch.tensor(am),
            use_image_text_matching_head=False,
        )
    want = out.logits_per_image.numpy()  # (2, 3)

    got = np.asarray(
        ours.cosine(jnp.asarray(imgs), jnp.asarray(ids, jnp.int32), jnp.asarray(am, bool))
    )
    assert got.shape == want.shape
    assert np.allclose(got, want, atol=2e-4), np.abs(got - want).max()


def test_cached_text_path_matches_full():
    cfg = matching_cfg()
    ours = BLIP2ITM.init_random(cfg, seed=1)
    rng = np.random.default_rng(1)
    imgs = jnp.asarray(rng.uniform(0, 1, size=(2, 56, 56, 3)).astype(np.float32))
    ids = jnp.asarray(rng.integers(0, 100, size=(2, 5)), jnp.int32)
    am = jnp.ones((2, 5), bool)
    full = np.asarray(ours.cosine(imgs, ids, am))
    tf = ours.encode_texts(ids, am)
    cached = np.asarray(ours.cosine_cached_text(imgs, tf))
    assert np.allclose(full, cached, atol=1e-5)


def test_preprocess_resize():
    cfg = matching_cfg()
    ours = BLIP2ITM.init_random(cfg, seed=2)
    rgb = jnp.asarray(np.random.default_rng(0).integers(0, 255, (2, 480, 640, 3), np.uint8))
    out = ours.preprocess(rgb)
    assert out.shape == (2, 56, 56, 3)
    assert float(out.min()) >= -0.2 and float(out.max()) <= 1.2
