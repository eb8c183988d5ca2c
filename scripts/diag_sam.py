"""Bisect MobileSAM's 210 ms/32-frame batch (round 5): encoder (TinyViT @
1024, fused serving path) vs box decoder (prompt encoder + two-way
transformer + upscaler + hypernet) at K=8 box slots/frame — the adaptive
gated path pays this per capacity-pass, so it sets the device-resident
headline's detection-density slope.
"""

import sys

sys.path.insert(0, ".")

from bench import _enable_compile_cache, fast_params, pipelined_ms

_enable_compile_cache()

import jax
import jax.numpy as jnp

from vlfm_tpu.models.sam import SAM, SamConfig, SamModule

B, K = 8, 8  # one capacity pass of the gated path (batch 32, cap 8)


def main():
    scfg = SamConfig.mobile_sam()
    sam = SAM(scfg, None)
    s = scfg.vision.image_size
    sam.params = fast_params(
        sam.module.init, jnp.zeros((1, s, s, 3)), jnp.zeros((1, 1, 4))
    )
    imgs = jax.random.uniform(jax.random.PRNGKey(0), (B, s, s, 3)) * 255.0
    boxes = jnp.tile(jnp.asarray([[[0.2, 0.2, 0.8, 0.8]]]), (B, K, 1))

    from vlfm_tpu.models.tinyvit_fast import encode_fused

    SAM_MEAN = jnp.asarray([123.675, 116.28, 103.53])
    SAM_STD = jnp.asarray([58.395, 57.12, 57.375])

    @jax.jit
    def enc_only(p, x):
        return encode_fused(p["vision"], (x - SAM_MEAN) / SAM_STD, scfg.tinyvit)

    emb = enc_only(sam.params, imgs)
    print("emb", emb.shape, emb.dtype, flush=True)

    @jax.jit
    def dec_only(p, emb, boxes01):
        return sam.module.apply(
            {"params": p}, emb, boxes01, method=SamModule.decode_boxes
        )[0]

    @jax.jit
    def full(p, x, boxes01):
        emb = encode_fused(p["vision"], (x - SAM_MEAN) / SAM_STD, scfg.tinyvit)
        return sam.module.apply(
            {"params": p}, emb, boxes01, method=SamModule.decode_boxes
        )[0]

    print(f"[enc ] {pipelined_ms(lambda: enc_only(sam.params, imgs)):7.1f} ms "
          f"/ {B} frames", flush=True)
    print(f"[dec ] {pipelined_ms(lambda: dec_only(sam.params, emb, boxes)):7.1f} ms "
          f"/ {B}x{K} boxes", flush=True)
    print(f"[full] {pipelined_ms(lambda: full(sam.params, imgs, boxes)):7.1f} ms",
          flush=True)

    # decoder at 1 box/frame: how much of dec is per-box vs fixed
    b1 = boxes[:, :1]
    print(f"[dec1] {pipelined_ms(lambda: dec_only(sam.params, emb, b1)):7.1f} ms "
          f"/ {B}x1 boxes", flush=True)


if __name__ == "__main__":
    main()
