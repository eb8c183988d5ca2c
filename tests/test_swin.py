import jax
import jax.numpy as jnp
import numpy as np
import torch

from vlfm_tpu.models.swin import SwinBackbone, SwinConfig, convert_hf_swin

jax.config.update("jax_default_device", jax.devices("cpu")[0])


def test_swin_matches_hf_backbone():
    from transformers import SwinBackbone as HFSwinBackbone, SwinConfig as HFSwinConfig

    hf_cfg = HFSwinConfig(
        image_size=64, patch_size=4, embed_dim=16, depths=[2, 2], num_heads=[2, 4],
        window_size=4, out_features=["stage1", "stage2"],
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0, drop_path_rate=0.0,
    )
    torch.manual_seed(0)
    hf = HFSwinBackbone(hf_cfg).eval()

    cfg = SwinConfig.tiny_test()
    params = convert_hf_swin(hf.state_dict(), cfg)
    model = SwinBackbone(cfg)

    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        want = [
            f.numpy() for f in hf(torch.tensor(x.transpose(0, 3, 1, 2))).feature_maps
        ]  # list of (B, C, H, W)

    got = model.apply({"params": params}, jnp.asarray(x))
    assert len(got) == len(want)
    for g, w in zip(got, want):
        g = np.asarray(g).transpose(0, 3, 1, 2)
        assert g.shape == w.shape
        assert np.allclose(g, w, atol=2e-4), np.abs(g - w).max()


def test_swin_nonsquare_and_padding():
    cfg = SwinConfig.tiny_test()
    model = SwinBackbone(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 72, 56, 3)))["params"]
    feats = model.apply({"params": params}, jnp.zeros((1, 72, 56, 3)))
    assert feats[0].shape == (1, 18, 14, 16)
    assert feats[1].shape == (1, 9, 7, 32)
