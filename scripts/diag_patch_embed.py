"""A/B the TinyViT patch embed (two stride-2 3x3 convs, 3->32->64 at 1024px).

Variants:
  a) shipped: space-to-depth(4) + two unit-stride 2x2 convs (conv_fused)
  b) plain XLA stride-2 convs (the flax module path)
  c) im2col matmul: s2d(2) -> 3x3 conv as 9-tap unit-shift matmul accumulation
  d) fully-fused single matmul: 6x6 receptive field per 4x4 output block is
     NOT possible (gelu between convs) — instead conv1 as one big matmul over
     s2d(4) patches with gathered 5x5 halo, then conv2 as 2x2 conv.
"""

import sys

sys.path.insert(0, ".")

from bench import _enable_compile_cache, pipelined_ms

_enable_compile_cache()

import jax
import jax.numpy as jnp

from vlfm_tpu.ops.conv_fused import _gelu, patch_embed_s2d, space_to_depth, \
    _assemble_pe1, _assemble_s2_taps, _conv_unit

B = 8
key = jax.random.PRNGKey(0)
x = jax.random.uniform(key, (B, 1024, 1024, 3), jnp.bfloat16)
w1 = jax.random.normal(key, (3, 3, 3, 32), jnp.bfloat16) * 0.1
b1 = jax.random.normal(key, (32,), jnp.float32) * 0.1
w2 = jax.random.normal(key, (3, 3, 32, 64), jnp.bfloat16) * 0.1
b2 = jax.random.normal(key, (64,), jnp.float32) * 0.1


@jax.jit
def variant_a(x):
    return patch_embed_s2d(x, w1, b1, w2, b2)


@jax.jit
def variant_b(x):
    y = jax.lax.conv_general_dilated(
        x, w1, (2, 2), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = _gelu(y + b1.astype(y.dtype))
    y = jax.lax.conv_general_dilated(
        y.astype(x.dtype), w2, (2, 2), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + b2.astype(y.dtype)


@jax.jit
def variant_c(x):
    # conv1 on s2d(2) planes: 9 taps -> 2x2 conv over (B,512,512,12)
    y = space_to_depth(x, 2)  # (B,512,512,12)
    Wc1 = _assemble_s2_taps(w1)  # (2,2,12,32)
    m = _conv_unit(y, Wc1, [(1, 0), (1, 0)])  # (B,512,512,32)
    m = _gelu(m + b1.astype(m.dtype))
    y2 = space_to_depth(m.astype(x.dtype), 2)  # (B,256,256,128)
    Wc2 = _assemble_s2_taps(w2)  # (2,2,128,64)
    out = _conv_unit(y2, Wc2, [(1, 0), (1, 0)])
    return out + b2.astype(out.dtype)


for name, fn in [("a s2d4+2x2convs (shipped)", variant_a),
                 ("b plain strided XLA     ", variant_b),
                 ("c s2d2 cascade          ", variant_c)]:
    out = fn(x)
    ms = pipelined_ms(lambda fn=fn: fn(x))
    print(f"[{name}] {ms:7.2f} ms  out={out.shape} {out.dtype}", flush=True)

# numeric agreement
import numpy as np
oa = np.asarray(variant_a(x), np.float32)
ob = np.asarray(variant_b(x), np.float32)
oc = np.asarray(variant_c(x), np.float32)
print("max|a-b|", np.abs(oa - ob).max(), " max|c-b|", np.abs(oc - ob).max())
