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

from bench import _enable_compile_cache, _sync, fast_params

_enable_compile_cache()

import jax
import jax.numpy as jnp

from vlfm_tpu.models.blip2_itm import BLIP2ITM, BLIP2ITMConfig, BLIP2ITMModule


def pipelined_ms(f, iters=10, warm=1):
    for _ in range(warm):
        out = f()
    _sync(out)
    t0 = time.time()
    for _ in range(iters):
        out = f()
    _sync(out)
    return round(1e3 * (time.time() - t0) / iters, 1)


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

    # stage 3: ViT trunk only
    @jax.jit
    def vit_only(p, x):
        import flax.linen as nn

        mod = BLIP2ITMModule(cfg)
        return mod.apply({"params": {"vision": p["vision"]}}, x,
                         method=lambda self, xx: self.vision(xx.astype(cfg.compute_dtype)))

    print("[3] ViT-g trunk only:",
          pipelined_ms(lambda: vit_only(m.params, imgs)), "ms", flush=True)

    # stage 4: combined entry as the bench measures it (preprocess + forward)
    print("[4] preprocess+forward:",
          pipelined_ms(lambda: m.cosine_cached_text(m.preprocess(rgb), text)),
          "ms", flush=True)


if __name__ == "__main__":
    main()
