"""TinyViT (MobileSAM encoder): shapes, BN folding vs torch, converter
contract, and end-to-end MobileSAM segmentation.

Parity target: mobile_sam's tiny_vit_sam.py (the `vit_t` encoder the
reference serves, vlfm/vlm/sam.py:24-57,88). No mobile_sam/timm package
exists in this environment, so the numeric checks cover the primitives the
architecture is built from (conv+BN folding vs torch eval mode) and the
converter's key/shape contract; the end-to-end HF-style parity run happens
where a real checkpoint is available.
"""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
import jax  # noqa: E402

from vlfm_tpu.models.sam import SAM, SamConfig, convert_mobile_sam  # noqa: E402
from vlfm_tpu.models.tinyvit import (  # noqa: E402
    TinyViT,
    TinyViTConfig,
    _attention_bias_idxs,
    _fold_bn,
    convert_mobile_sam_encoder,
    expected_mobile_sam_keys,
)


class TestShapes:
    def test_tiny_output_grid(self):
        cfg = TinyViTConfig.tiny()
        mod = TinyViT(cfg)
        x = jnp.zeros((2, cfg.img_size, cfg.img_size, 3))
        params = mod.init(jax.random.PRNGKey(0), x)["params"]
        out = mod.apply({"params": params}, x)
        assert out.shape == (2, cfg.grid, cfg.grid, cfg.out_channels)

    def test_full_size_resolutions(self):
        """1024-px MobileSAM: 256 -> 128 -> 64 -> 64 (last merge stride 1)."""
        cfg = TinyViTConfig()
        assert cfg.grid == 64
        assert [cfg.stage_resolution(s) for s in range(4)] == [256, 128, 64, 64]


class TestBNFolding:
    def test_matches_torch_eval(self):
        torch = pytest.importorskip("torch")
        torch.manual_seed(0)
        conv = torch.nn.Conv2d(6, 10, 3, padding=1, bias=False)
        bn = torch.nn.BatchNorm2d(10)
        bn.running_mean.normal_(); bn.running_var.uniform_(0.5, 2.0)
        bn.weight.data.normal_(); bn.bias.data.normal_()
        bn.eval()
        x = torch.randn(2, 6, 8, 8)
        with torch.no_grad():
            ref = bn(conv(x)).numpy()

        sd = {"c.weight": conv.weight.detach().numpy(),
              "bn.weight": bn.weight.detach().numpy(),
              "bn.bias": bn.bias.detach().numpy(),
              "bn.running_mean": bn.running_mean.numpy(),
              "bn.running_var": bn.running_var.numpy()}
        folded = _fold_bn(sd, "c", "bn")
        out = jax.lax.conv_general_dilated(
            jnp.asarray(x.numpy()), folded["conv"]["kernel"].transpose(3, 2, 0, 1),
            (1, 1), "SAME", dimension_numbers=("NCHW", "OIHW", "NCHW"),
        ) + folded["conv"]["bias"][None, :, None, None]
        np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4)


class TestAttentionBiases:
    def test_idx_table_properties(self):
        """Symmetric, zero-offset on the diagonal, count == unique |offsets|."""
        idxs = _attention_bias_idxs(4)
        assert idxs.shape == (16, 16)
        assert (idxs == idxs.T).all()
        assert (np.diag(idxs) == 0).all()
        # |{(|dx|, |dy|)}| for ws=4 is 4*4 = 16 unique offsets
        assert idxs.max() + 1 == 16


class TestConverterContract:
    def test_synthetic_checkpoint_round_trip(self):
        """A state dict with mobile_sam's exact key/shape contract converts to
        a tree structurally identical to random init, and runs without NaN."""
        cfg = TinyViTConfig.tiny()
        rng = np.random.default_rng(0)
        sd = {}
        for k, shape in expected_mobile_sam_keys(cfg).items():
            v = rng.normal(0, 0.05, shape).astype(np.float32)
            if k.endswith("running_var"):
                v = np.abs(v) + 0.5
            sd[k] = v
        params = convert_mobile_sam_encoder(sd, cfg)

        mod = TinyViT(cfg)
        x = jnp.asarray(rng.uniform(-1, 1, (1, cfg.img_size, cfg.img_size, 3)),
                        jnp.float32)
        ref_tree = mod.init(jax.random.PRNGKey(0), x)["params"]

        def paths(tree, prefix=()):
            if hasattr(tree, "items"):
                out = {}
                for k, v in tree.items():
                    out.update(paths(v, prefix + (k,)))
                return out
            return {prefix: tuple(tree.shape)}

        assert paths(params) == paths(ref_tree), "converted tree != module tree"
        out = mod.apply({"params": params}, x)
        assert np.isfinite(np.asarray(out)).all()


class TestMobileSAM:
    def test_end_to_end_segmentation(self):
        sam = SAM.init_random(SamConfig.tiny_mobile_sam(), seed=0)
        imgs = jnp.asarray(
            np.random.default_rng(1).uniform(0, 255, (2, 64, 64, 3)), jnp.float32
        )
        boxes = jnp.asarray([[[0.2, 0.2, 0.7, 0.8]], [[0.1, 0.1, 0.5, 0.5]]])
        masks, iou = sam.segment_boxes(imgs, boxes)
        assert masks.shape == (2, 1, 16, 16)
        assert iou.shape == (2, 1, 4)

    def test_full_checkpoint_conversion(self):
        """Synthetic full mobile_sam.pt (encoder + prompt + decoder, original
        segment-anything naming) converts and segments."""
        from vlfm_tpu.models.tinyvit import expected_mobile_sam_keys

        cfg = SamConfig.tiny_mobile_sam()
        rng = np.random.default_rng(2)
        sd = {}
        for k, shape in expected_mobile_sam_keys(cfg.tinyvit).items():
            v = rng.normal(0, 0.05, shape).astype(np.float32)
            if k.endswith("running_var"):
                v = np.abs(v) + 0.5
            sd[f"image_encoder.{k}"] = v

        d = cfg.decoder.hidden
        dd = d // cfg.decoder.downsample_rate

        def lin(name, out_d, in_d):
            sd[f"{name}.weight"] = rng.normal(0, 0.05, (out_d, in_d)).astype(np.float32)
            sd[f"{name}.bias"] = np.zeros(out_d, np.float32)

        def attn(name, internal):
            for p in ("q_proj", "k_proj", "v_proj"):
                lin(f"{name}.{p}", internal, d)
            lin(f"{name}.out_proj", d, internal)

        def norm(name, n=d):
            sd[f"{name}.weight"] = np.ones(n, np.float32)
            sd[f"{name}.bias"] = np.zeros(n, np.float32)

        m = cfg.decoder.num_multimask_outputs + 1
        sd["mask_decoder.iou_token.weight"] = rng.normal(0, 1, (1, d)).astype(np.float32)
        sd["mask_decoder.mask_tokens.weight"] = rng.normal(0, 1, (m, d)).astype(np.float32)
        for i in range(cfg.decoder.layers):
            p = f"mask_decoder.transformer.layers.{i}"
            attn(f"{p}.self_attn", d)
            attn(f"{p}.cross_attn_token_to_image", dd)
            attn(f"{p}.cross_attn_image_to_token", dd)
            for j in range(1, 5):
                norm(f"{p}.norm{j}")
            lin(f"{p}.mlp.lin1", cfg.decoder.mlp_dim, d)
            lin(f"{p}.mlp.lin2", d, cfg.decoder.mlp_dim)
        attn("mask_decoder.transformer.final_attn_token_to_image", dd)
        norm("mask_decoder.transformer.norm_final_attn")
        sd["mask_decoder.output_upscaling.0.weight"] = rng.normal(
            0, 0.05, (d, d // 4, 2, 2)).astype(np.float32)
        sd["mask_decoder.output_upscaling.0.bias"] = np.zeros(d // 4, np.float32)
        norm("mask_decoder.output_upscaling.1", d // 4)
        sd["mask_decoder.output_upscaling.3.weight"] = rng.normal(
            0, 0.05, (d // 4, d // 8, 2, 2)).astype(np.float32)
        sd["mask_decoder.output_upscaling.3.bias"] = np.zeros(d // 8, np.float32)
        for i in range(m):
            p = f"mask_decoder.output_hypernetworks_mlps.{i}"
            lin(f"{p}.layers.0", d, d)
            lin(f"{p}.layers.1", d, d)
            lin(f"{p}.layers.2", d // 8, d)
        p = "mask_decoder.iou_prediction_head"
        lin(f"{p}.layers.0", cfg.decoder.iou_head_hidden, d)
        lin(f"{p}.layers.1", m, cfg.decoder.iou_head_hidden)
        for i in range(4):
            sd[f"prompt_encoder.point_embeddings.{i}.weight"] = rng.normal(
                0, 1, (1, d)).astype(np.float32)
        sd["prompt_encoder.no_mask_embed.weight"] = rng.normal(0, 1, (1, d)).astype(np.float32)
        sd["prompt_encoder.pe_layer.positional_encoding_gaussian_matrix"] = rng.normal(
            0, 1, (2, cfg.pe_dim)).astype(np.float32)

        params = convert_mobile_sam(sd, cfg)
        sam = SAM(cfg, params)
        imgs = jnp.asarray(rng.uniform(0, 255, (1, 64, 64, 3)), jnp.float32)
        masks, iou = sam.segment_boxes(imgs, jnp.asarray([[[0.2, 0.2, 0.8, 0.8]]]))
        assert masks.shape == (1, 1, 16, 16)
        assert np.isfinite(np.asarray(iou)).all()
