import jax
import jax.numpy as jnp
import numpy as np
import torch

from vlfm_tpu.models.t5_vqa import T5Config, T5VQA, convert_hf_t5

jax.config.update("jax_default_device", jax.devices("cpu")[0])


def tiny_hf_t5():
    from transformers import T5Config as HFT5Config, T5ForConditionalGeneration

    cfg = HFT5Config(
        vocab_size=100, d_model=32, d_kv=8, d_ff=64, num_heads=4,
        num_layers=2, num_decoder_layers=2,
        feed_forward_proj="gated-gelu", tie_word_embeddings=False,
        relative_attention_num_buckets=32, relative_attention_max_distance=128,
        decoder_start_token_id=0, pad_token_id=0, eos_token_id=1,
    )
    torch.manual_seed(0)
    return T5ForConditionalGeneration(cfg).eval()


def test_t5_logits_match_hf():
    hf = tiny_hf_t5()
    cfg = T5Config.tiny()
    params = convert_hf_t5(hf.state_dict(), cfg)
    ours = T5VQA(cfg, params)

    rng = np.random.default_rng(0)
    ids = rng.integers(2, 99, (2, 7)).astype(np.int64)
    am = np.ones((2, 7), np.int64)
    dec = np.concatenate([np.zeros((2, 1), np.int64), rng.integers(2, 99, (2, 3))], axis=1)

    with torch.no_grad():
        want = hf(
            input_ids=torch.tensor(ids),
            attention_mask=torch.tensor(am),
            decoder_input_ids=torch.tensor(dec),
        ).logits.numpy()

    got = np.asarray(
        ours.module.apply(
            {"params": ours.params},
            jnp.asarray(ids, jnp.int32),
            jnp.asarray(am, bool),
            jnp.asarray(dec, jnp.int32),
        )
    )
    assert got.shape == want.shape
    assert np.allclose(got, want, atol=2e-3), np.abs(got - want).max()


def test_greedy_matches_hf_generate():
    hf = tiny_hf_t5()
    cfg = T5Config.tiny()
    params = convert_hf_t5(hf.state_dict(), cfg)
    ours = T5VQA(cfg, params)
    rng = np.random.default_rng(1)
    ids = rng.integers(2, 99, (1, 6)).astype(np.int64)
    am = np.ones((1, 6), np.int64)
    with torch.no_grad():
        want = hf.generate(
            input_ids=torch.tensor(ids), attention_mask=torch.tensor(am),
            max_new_tokens=5, do_sample=False, num_beams=1,
        ).numpy()[0, 1:]  # strip the decoder start token
    got = np.asarray(ours.generate(jnp.asarray(ids, jnp.int32), jnp.asarray(am, bool), 5))[0]
    # compare up to the first EOS in the HF output
    n = min(len(want), len(got))
    stop = n
    for i in range(n):
        if want[i] == 1:
            stop = i + 1
            break
    assert got[:stop].tolist() == want[:stop].tolist()


def test_yes_veto_helper():
    cfg = T5Config.tiny()
    ours = T5VQA.init_random(cfg, seed=0)
    gen = jnp.asarray([[7, 2, 1], [3, 2, 1]], jnp.int32)
    mask = ours.answer_starts_with_yes(gen, yes_token_id=7)
    assert np.asarray(mask).tolist() == [True, False]
