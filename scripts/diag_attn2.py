"""Round-4 attention core shootout at the ViT-g serving shape.

diag_vit_block measured (39-block trunk, B=32, L=257, D=1408, H=16):
  full (per-query-tile flash)  180.9 ms   <- production default, SLOWEST
  grouped                      143.2 ms
  xla einsum                   138.6 ms
  no_core                       82.3 ms   (matmul+LN+gelu floor)

So the attention core costs 56-99 ms/trunk depending on variant while its
FLOPs are worth ~4 ms. This script times the isolated core per variant and
the grouped_v2 kernel (output-side renorm) across group sizes, then the
full trunk with the two best variants.
"""

import sys

sys.path.insert(0, ".")

from bench import _enable_compile_cache, pipelined_ms

_enable_compile_cache()

import jax
import jax.numpy as jnp
import numpy as np

from vlfm_tpu.models.layers import attention
from vlfm_tpu.ops.attention import (
    flash_attention,
    flash_attention_grouped,
    flash_attention_grouped_v2,
)

B, H, L, D = 32, 16, 257, 88


def main():
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(k1, (B, H, L, D), jnp.bfloat16)
    k = jax.random.normal(k2, (B, H, L, D), jnp.bfloat16)
    v = jax.random.normal(k3, (B, H, L, D), jnp.bfloat16)

    ref = np.asarray(attention(q, k, v), np.float32)

    variants = [
        ("xla", jax.jit(attention)),
        ("flash_full", jax.jit(lambda a, b, c: flash_attention(a, b, c, interpret=False))),
        ("grouped_g8", jax.jit(lambda a, b, c: flash_attention_grouped(a, b, c, interpret=False, group=8))),
    ]
    for g in (4, 8, 16, 32, 64):
        if (B * H) % g == 0:
            variants.append(
                (f"v2_g{g}",
                 jax.jit(lambda a, b, c, g=g: flash_attention_grouped_v2(
                     a, b, c, interpret=False, group=g))))

    for name, fn in variants:
        out = np.asarray(fn(q, k, v), np.float32)
        err = np.max(np.abs(out - ref))
        ms = pipelined_ms(lambda: fn(q, k, v))
        print(f"{name:12s}: {ms:7.2f} ms   max|err|={err:.2e}", flush=True)


if __name__ == "__main__":
    main()
