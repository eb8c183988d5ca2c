"""Per-stage bisect of the fused TinyViT encoder (round 5): time cumulative
prefixes of encode_fused so each stage's marginal cost on chip is visible.
Run after diag_sam.py's enc/dec split said the encoder is ~2/3 of MobileSAM's
per-pass cost.
"""

import sys

sys.path.insert(0, ".")

from bench import _enable_compile_cache, fast_params, pipelined_ms

_enable_compile_cache()

import jax
import jax.numpy as jnp

from vlfm_tpu.models.sam import SAM, LayerNorm2d, SamConfig
from vlfm_tpu.models.tinyvit import TinyViTBlock
from vlfm_tpu.ops.conv_fused import (
    gelu_poly,
    mbconv_chain,
    merge_chain_s2,
    patch_embed_s2d,
)
from vlfm_tpu.models.tinyvit_fast import _chain_weights

B = 8
SAM_MEAN = jnp.asarray([123.675, 116.28, 103.53])
SAM_STD = jnp.asarray([58.395, 57.12, 57.375])


def main():
    scfg = SamConfig.mobile_sam()
    cfg = scfg.tinyvit
    sam = SAM(scfg, None)
    s = cfg.img_size
    sam.params = fast_params(
        sam.module.init, jnp.zeros((1, s, s, 3)), jnp.zeros((1, 1, 4))
    )
    params = sam.params["vision"]
    imgs = jax.random.uniform(jax.random.PRNGKey(0), (B, s, s, 3)) * 255.0
    dt = cfg.compute_dtype

    def upto(stop):
        """Build a jitted fn running encode_fused stages [0, stop)."""

        def fn(p, images):
            x = (images - SAM_MEAN) / SAM_STD
            x = patch_embed_s2d(
                x.astype(dt),
                p["patch_embed1"]["conv"]["kernel"].astype(dt),
                p["patch_embed1"]["conv"]["bias"].astype(jnp.float32),
                p["patch_embed2"]["conv"]["kernel"].astype(dt),
                p["patch_embed2"]["conv"]["bias"].astype(jnp.float32),
            )
            k = 1
            if k >= stop:
                return x
            for i in range(cfg.depths[0]):
                x = mbconv_chain(
                    x, *_chain_weights(p[f"stage0_block{i}"], dt),
                    residual=True, final_gelu=True,
                )
            k += 1
            if k >= stop:
                return x
            for st in range(1, len(cfg.depths)):
                stride = 2 if st < len(cfg.depths) - 1 else 1
                if stride == 2:
                    x = merge_chain_s2(x, *_chain_weights(p[f"merge{st}"], dt))
                else:
                    x = mbconv_chain(
                        x, *_chain_weights(p[f"merge{st}"], dt),
                        residual=False, final_gelu=False,
                    )
                k += 1
                if k >= stop:
                    return x
                block = TinyViTBlock(
                    cfg.embed_dims[st], cfg.num_heads[st], cfg.window_sizes[st],
                    cfg.mlp_ratio, act=gelu_poly,
                )
                for i in range(cfg.depths[st]):
                    bp = jax.tree_util.tree_map(
                        lambda a: a.astype(dt), p[f"stage{st}_block{i}"]
                    )
                    x = block.apply({"params": bp}, x)
                k += 1
                if k >= stop:
                    return x
            # neck
            x = jnp.einsum(
                "bhwc,cd->bhwd", x, p["neck_conv1"]["kernel"][0, 0].astype(dt)
            )
            x = LayerNorm2d().apply({"params": p["neck_ln1"]}, x)
            x = jax.lax.conv_general_dilated(
                x, p["neck_conv2"]["kernel"].astype(x.dtype),
                window_strides=(1, 1), padding=[(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            return LayerNorm2d().apply({"params": p["neck_ln2"]}, x)

        return jax.jit(fn)

    names = [
        "patch_embed",          # 1
        "stage0 2xMBConv@256",  # 2
        "merge1->128",          # 3
        "stage1 2xattn@128 ws7",  # 4
        "merge2->64",           # 5
        "stage2 6xattn@64 ws14",  # 6
        "merge3(s1)",           # 7
        "stage3 2xattn@64 ws7",  # 8
        "neck",                 # 9
    ]
    prev = 0.0
    for stop in range(1, 10):
        f = upto(stop)
        ms = pipelined_ms(lambda: f(params, imgs))
        print(
            f"[{stop}] upto {names[stop - 1]:<24} {ms:7.2f} ms  "
            f"(marginal {ms - prev:+7.2f})",
            flush=True,
        )
        prev = ms


if __name__ == "__main__":
    main()
