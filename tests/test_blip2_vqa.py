"""BLIP-2 VQA visual bridge parity vs HF Blip2ForConditionalGeneration
(VERDICT round-2 item #6): EVA ViT + Q-Former + language projection -> T5
prefix -> greedy generation, at tiny config.

Parity target: the lavis blip2_t5 composition the reference serves
(vlfm/vlm/blip2.py:35-55)."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from vlfm_tpu.models.blip2_vqa import BLIP2VQA, BLIP2VQAConfig, load_blip2_vqa

jax.config.update("jax_default_device", jax.devices("cpu")[0])

CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


def tiny_hf_blip2_t5():
    from transformers import (
        Blip2Config,
        Blip2ForConditionalGeneration,
        Blip2QFormerConfig,
        Blip2VisionConfig,
    )
    from transformers import T5Config as HFT5Config

    vc = Blip2VisionConfig(
        hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, image_size=56, patch_size=14,
    )
    qc = Blip2QFormerConfig(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=64, cross_attention_frequency=2, vocab_size=100,
        encoder_hidden_size=64,
    )
    tc = HFT5Config(
        vocab_size=100, d_model=32, d_kv=8, d_ff=64, num_heads=4,
        num_layers=2, num_decoder_layers=2, feed_forward_proj="gated-gelu",
        tie_word_embeddings=False, relative_attention_num_buckets=32,
        relative_attention_max_distance=128, decoder_start_token_id=0,
        pad_token_id=0, eos_token_id=1,
    )
    cfg = Blip2Config.from_vision_qformer_text_configs(vc, qc, tc)
    cfg.num_query_tokens = 8
    torch.manual_seed(0)
    return Blip2ForConditionalGeneration(cfg).eval()


def build_pair():
    hf = tiny_hf_blip2_t5()
    cfg = BLIP2VQAConfig.tiny()
    ours = load_blip2_vqa(hf.state_dict(), cfg)
    return hf, ours


def test_visual_prefix_matches_hf():
    hf, ours = build_pair()
    rng = np.random.default_rng(0)
    img01 = rng.random((2, 56, 56, 3)).astype(np.float32)
    pixel_values = torch.tensor(
        ((img01 - CLIP_MEAN) / CLIP_STD).transpose(0, 3, 1, 2)
    )
    with torch.no_grad():
        vis = hf.vision_model(pixel_values).last_hidden_state
        q = hf.query_tokens.expand(2, -1, -1)
        qo = hf.qformer(
            query_embeds=q,
            encoder_hidden_states=vis,
            encoder_attention_mask=torch.ones(vis.shape[:2], dtype=torch.long),
        ).last_hidden_state
        want = hf.language_projection(qo).numpy()
    got = np.asarray(ours.image_prefix(jnp.asarray(img01)))
    assert got.shape == want.shape == (2, 8, 32)
    assert np.allclose(got, want, atol=2e-4), np.abs(got - want).max()


def test_generate_matches_hf():
    hf, ours = build_pair()
    rng = np.random.default_rng(1)
    img01 = rng.random((2, 56, 56, 3)).astype(np.float32)
    rgb = (img01 * 255).astype(np.uint8)
    ids = rng.integers(2, 99, (2, 6)).astype(np.int64)
    am = np.ones((2, 6), np.int64)
    pixel_values = torch.tensor(
        ((rgb.astype(np.float32) / 255.0 - CLIP_MEAN) / CLIP_STD).transpose(0, 3, 1, 2)
    )
    with torch.no_grad():
        # compose the blip2_t5 generate path from HF's own components
        # (recent transformers' top-level generate requires image placeholder
        # tokens in input_ids; the underlying math is identical)
        vis = hf.vision_model(pixel_values).last_hidden_state
        qo = hf.qformer(
            query_embeds=hf.query_tokens.expand(2, -1, -1),
            encoder_hidden_states=vis,
            encoder_attention_mask=torch.ones(vis.shape[:2], dtype=torch.long),
        ).last_hidden_state
        lang_in = hf.language_projection(qo)
        inputs_embeds = torch.cat(
            [lang_in, hf.get_input_embeddings()(torch.tensor(ids))], dim=1
        )
        att = torch.cat(
            [torch.ones(lang_in.shape[:2], dtype=torch.long), torch.tensor(am)],
            dim=1,
        )
        hf_out = hf.language_model.generate(
            inputs_embeds=inputs_embeds,
            attention_mask=att,
            max_new_tokens=4,
            do_sample=False,
            num_beams=1,
        ).numpy()
    # ours preprocesses uint8 -> [0,1] internally; model res already matches
    got = np.asarray(
        ours.ask(jnp.asarray(rgb), jnp.asarray(ids, jnp.int32),
                 jnp.asarray(am, bool), max_new_tokens=4)
    )
    # HF emits the decoder start token first; ours returns only new tokens.
    want = hf_out[:, 1:] if hf_out.shape[1] == 5 else hf_out
    # compare up to the first EOS on each row (ours keeps greedy-decoding
    # past EOS; HF stops)
    for b in range(2):
        w = want[b]
        n = len(w)
        if (w == 1).any():
            n = int(np.argmax(w == 1)) + 1
        assert got[b, :n].tolist() == w[:n].tolist(), (got[b], w)


def test_random_init_roundtrip():
    cfg = BLIP2VQAConfig.tiny()
    m = BLIP2VQA.init_random(cfg, seed=0)
    rgb = np.zeros((1, 56, 56, 3), np.uint8)
    out = m.ask(
        jnp.asarray(rgb), jnp.zeros((1, 4), jnp.int32), jnp.ones((1, 4), bool),
        max_new_tokens=3,
    )
    assert out.shape == (1, 3)
