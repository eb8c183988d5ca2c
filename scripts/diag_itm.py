"""Bisect the BLIP2-ITM 195 ms/batch: which stage holds the time?

Flash attention + poly gelu moved the number ~1 ms, so the cost is NOT the
softmax/gelu VPU work. Candidates: the eager preprocess chain (resize
matmuls outside jit), the ViT-g trunk itself (MXU-bound at its natural
efficiency), the Q-Former, or measurement framing. Times each stage as a
pipelined loop with one forced readback.
"""

import sys
import time

sys.path.insert(0, ".")

from bench import _enable_compile_cache, _sync, fast_params, pipelined_ms

_enable_compile_cache()

import jax
import jax.numpy as jnp

from vlfm_tpu.models.blip2_itm import BLIP2ITM, BLIP2ITMConfig, BLIP2ITMModule




def main():
    batch = 32
    cfg = BLIP2ITMConfig()
    m = BLIP2ITM(cfg, None)
    s = cfg.vit.image_size
    m.params = fast_params(
        m.module.init, jnp.zeros((1, s, s, 3)),
        jnp.zeros((1, 4), jnp.int32), jnp.ones((1, 4), bool),
    )
    text = m.encode_texts(jnp.ones((1, 16), jnp.int32), jnp.ones((1, 16), bool))
    rgb = jax.random.randint(
        jax.random.PRNGKey(0), (batch, 480, 640, 3), 0, 255, jnp.uint8
    )
    imgs = m.preprocess(rgb)
    imgs = jax.device_put(imgs)
    _sync(imgs)
    print("imgs", imgs.shape, imgs.dtype, flush=True)

    # stage 1: eager preprocess only
    print("[1] preprocess (eager):", pipelined_ms(lambda: m.preprocess(rgb)), "ms",
          flush=True)

    # stage 2: full jitted cosine on preprocessed input
    print("[2] cosine_cached_text(jit):",
          pipelined_ms(lambda: m.cosine_cached_text(imgs, text)), "ms", flush=True)

    # stage 3: ViT trunk only (full param tree: setup() binds every param)
    @jax.jit
    def vit_only(p, x):
        mod = BLIP2ITMModule(cfg)
        return mod.apply({"params": p}, x,
                         method=lambda self, xx: self.vision(xx.astype(cfg.compute_dtype)))

    print("[3] ViT-g trunk only:",
          pipelined_ms(lambda: vit_only(m.params, imgs)), "ms", flush=True)

    # stage 4: combined entry as the bench measures it (preprocess + forward)
    print("[4] preprocess+forward:",
          pipelined_ms(lambda: m.cosine_cached_text(m.preprocess(rgb), text)),
          "ms", flush=True)

    # stage 5: MXU-rate proxy — the ViT-g matmul budget as bare chained
    # matmuls at the real shapes ((B*T, D) x (D, 4D) x ... 39 blocks'
    # worth). Gives the chip's achievable rate for THESE shapes; the gap
    # between this and [3] is layout/fusion overhead, not FLOPs.
    bt, d, mlp = batch * 257, 1408, 6144
    w_qkv = jnp.full((d, 3 * d), 0.01, jnp.bfloat16)
    w_proj = jnp.full((d, d), 0.01, jnp.bfloat16)
    w_fc1 = jnp.full((d, mlp), 0.01, jnp.bfloat16)
    w_fc2 = jnp.full((mlp, d), 0.01, jnp.bfloat16)
    x0 = jnp.full((bt, d), 0.01, jnp.bfloat16)

    @jax.jit
    def matmul_proxy(x):
        def blk(x, _):
            a = x @ w_qkv
            x = (a[:, :d] @ w_proj + x) * 0.5
            h = x @ w_fc1
            x = (h @ w_fc2 + x) * 0.5
            return x, ()
        y, _ = jax.lax.scan(blk, x, None, length=39)
        return y

    ms = pipelined_ms(lambda: matmul_proxy(x0))
    tflops = 2 * bt * (d * 3 * d + d * d + 2 * d * mlp) * 39 / (ms * 1e-3) / 1e12
    print(f"[5] bare matmul proxy (39 blocks): {ms} ms -> {tflops:.0f} TFLOP/s",
          flush=True)

    # stage 6: Q-Former + projections only (image_feats minus the trunk):
    # time image_feats on a precomputed trunk output
    embeds = jnp.full((batch, 257, d), 0.01, jnp.bfloat16)

    @jax.jit
    def qf_only(p, emb):
        mod = BLIP2ITMModule(cfg)
        def run(self, e):
            b = e.shape[0]
            queries = jnp.tile(self.query_tokens[None], (b, 1, 1)).astype(
                cfg.compute_dtype)
            out = self.qformer(queries, image_embeds=e, is_query=True)
            feats = self.vision_proj(out.astype(jnp.float32))
            return feats / jnp.linalg.norm(feats, axis=-1, keepdims=True)
        return mod.apply({"params": p}, emb, method=run)

    print("[6] qformer+proj only:",
          pipelined_ms(lambda: qf_only(m.params, embeds)), "ms", flush=True)

    # stage 7: preprocess fused INTO the jit program (uint8 in, cosine out)
    @jax.jit
    def fused_entry(p, rgb_u8, txt):
        mod = BLIP2ITMModule(cfg)
        imgs = m.preprocess(rgb_u8)
        img = mod.apply({"params": p}, imgs, method=BLIP2ITMModule.image_feats)
        return jnp.max(jnp.einsum("bqe,te->bqt", img, txt), axis=1)

    print("[7] fused uint8->cosine:",
          pipelined_ms(lambda: fused_entry(m.params, rgb, text)), "ms",
          flush=True)


if __name__ == "__main__":
    main()
