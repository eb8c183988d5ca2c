"""ZoeDepth parity vs HF transformers ZoeDepthForDepthEstimation.

The reference robot stack estimates gripper-cam depth with torch-hub ZoeDepth
(reality_policies.py:40-42,156-169); this pins the JAX port to the HF
implementation of the same model family on a tiny random-weight config —
single-domain (ZoeD_N-like) and two-domain routed (ZoeD_NK-like).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

# the XLA-CPU oneDNN matmul path computes at reduced precision (~1e-3 rel);
# parity tests need exact fp32 accumulation
jax.config.update("jax_default_matmul_precision", "highest")

from vlfm_tpu.models.zoedepth import (  # noqa: E402
    BeitConfigJx,
    ZoeDepth,
    ZoeDepthJaxConfig,
    ZoeDepthModule,
    convert_hf_zoedepth,
)

IMG = 64


def _hf_model(two_domains: bool):
    from transformers import BeitConfig, ZoeDepthConfig, ZoeDepthForDepthEstimation

    bb = BeitConfig(
        image_size=IMG, patch_size=16, num_hidden_layers=4, hidden_size=32,
        intermediate_size=64, num_attention_heads=2,
        use_relative_position_bias=True, reshape_hidden_states=False,
        out_features=["stage1", "stage2", "stage3", "stage4"],
        layer_scale_init_value=0.1, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0, drop_path_rate=0.0,
    )
    bins = [{"name": "nyu", "n_bins": 8, "min_depth": 1e-3, "max_depth": 10.0}]
    if two_domains:
        bins.append({"name": "kitti", "n_bins": 8, "min_depth": 1e-3, "max_depth": 80.0})
    cfg = ZoeDepthConfig(
        backbone_config=bb,
        neck_hidden_sizes=[16, 24, 32, 32], fusion_hidden_size=32,
        num_relative_features=8, bottleneck_features=32,
        num_attractors=[4, 2, 2, 1], bin_embedding_dim=16,
        bin_configurations=bins,
        num_patch_transformer_layers=4, patch_transformer_hidden_size=128,
        patch_transformer_intermediate_size=32, patch_transformer_num_attention_heads=2,
    )
    torch.manual_seed(0)
    model = ZoeDepthForDepthEstimation(cfg).eval()
    # randomize params the HF init leaves at constants (rel-pos tables, cls
    # token, lambdas) so the parity test exercises those paths
    sd = model.state_dict()
    g = torch.Generator().manual_seed(1)
    for k, v in sd.items():
        if v.dtype.is_floating_point and float(v.std()) < 1e-8:
            sd[k] = torch.randn(v.shape, generator=g) * 0.05
    model.load_state_dict(sd)
    return model


def _jax_cfg(two_domains: bool) -> ZoeDepthJaxConfig:
    bins = (("nyu", 8, 1e-3, 10.0),)
    if two_domains:
        bins = bins + (("kitti", 8, 1e-3, 80.0),)
    return ZoeDepthJaxConfig(
        beit=BeitConfigJx(image_size=IMG, patch_size=16, hidden_size=32, layers=4,
                          heads=2, intermediate=64, out_indices=(1, 2, 3, 4)),
        neck_hidden_sizes=(16, 24, 32, 32), fusion_hidden_size=32,
        num_relative_features=8, bottleneck_features=32,
        num_attractors=(4, 2, 2, 1), bin_embedding_dim=16,
        bin_configurations=bins,
        patch_transformer_hidden=128, patch_transformer_intermediate=32,
        patch_transformer_heads=2,
    )


@pytest.mark.parametrize("two_domains", [False, True])
def test_zoedepth_matches_hf(two_domains):
    model = _hf_model(two_domains)
    cfg = _jax_cfg(two_domains)
    params = convert_hf_zoedepth(model.state_dict(), cfg)

    rng = np.random.default_rng(0)
    pixels = rng.normal(size=(2, 3, IMG, IMG)).astype(np.float32)
    with torch.no_grad():
        out = model(torch.from_numpy(pixels))
    want = out.predicted_depth.numpy()

    mod = ZoeDepthModule(cfg)
    got, domain_logits = mod.apply(
        {"params": params}, jnp.asarray(pixels.transpose(0, 2, 3, 1))
    )
    got = np.asarray(got)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-4)
    if two_domains:
        np.testing.assert_allclose(
            np.asarray(domain_logits), out.domain_logits.numpy(), rtol=2e-3, atol=2e-4
        )


def test_infer_depth_contract():
    """The MonocularDepth drop-in contract: uint8 RGB -> [0, 1] depth at the
    input resolution."""
    z = ZoeDepth.init_random()
    rgb = np.random.default_rng(0).integers(0, 255, (1, 48, 56, 3), np.uint8)
    d = np.asarray(z.infer_depth(jnp.asarray(rgb), 0.5, 5.0))
    assert d.shape == (1, 48, 56)
    assert (d >= 0).all() and (d <= 1).all()
