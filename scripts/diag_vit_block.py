"""Where do the ViT-g trunk's 112 non-matmul ms go? A/B block variants.

diag_itm measured: trunk 190 ms at B=32 vs a 78 ms bare-matmul floor
(208 TFLOP/s) — attention layout/pad traffic, the 1536-instance flash
grid, layernorm, and residual adds are the candidates. Times a 39-block
scan at the exact (32, 257, 1408) serving shape per variant:

  full      current ViTBlock (pallas LN + per-query-tile flash + poly gelu)
  grouped   ViTBlock with the grouped-head flash kernel (logical shapes,
            B*H/G-instance grid, no explicit pad)
  xla_attn  einsum attention (XLA-materialized logits)
  no_core   attention core replaced by v (keeps qkv/proj matmuls,
            split/merge transposes, LN, MLP) — isolates the softmax core
  xla_ln    grouped flash + jnp layernorm instead of the pallas kernel
"""

import sys

sys.path.insert(0, ".")

from bench import _enable_compile_cache, pipelined_ms

_enable_compile_cache()

import jax
import jax.numpy as jnp

from vlfm_tpu.models.layers import attention, merge_heads, split_heads
from vlfm_tpu.ops.attention import (
    flash_attention,
    flash_attention_grouped,
    flash_attention_grouped_v2,
)
from vlfm_tpu.ops.conv_fused import gelu_poly
from vlfm_tpu.ops.norms import layer_norm

B, L, D, H, MLP = 32, 257, 1408, 16, 6144
DEPTH = 39


def make_block(attn_kind: str, ln_kind: str):
    def ln(x, s, b):
        if ln_kind == "pallas":
            return layer_norm(x, s, b, eps=1e-6)
        xf = x.astype(jnp.float32)
        mu = xf.mean(-1, keepdims=True)
        var = ((xf - mu) ** 2).mean(-1, keepdims=True)
        return ((xf - mu) * jax.lax.rsqrt(var + 1e-6) * s + b).astype(x.dtype)

    def attn_core(q, k, v):
        if attn_kind == "full":
            return flash_attention(q, k, v, interpret=False)
        if attn_kind == "grouped":
            return flash_attention_grouped(q, k, v, interpret=False)
        if attn_kind == "v2_g8":
            return flash_attention_grouped_v2(q, k, v, interpret=False, group=8)
        if attn_kind == "xla":
            return attention(q, k, v)
        if attn_kind == "bf16sm":
            # keep the (B,H,L,L) logits tensor bf16 end-to-end: the einsum
            # output is already bf16-rounded, so the f32 materialization
            # only doubles the softmax stage's HBM traffic
            d = q.shape[-1]
            logits = jnp.einsum("bhqd,bhkd->bhqk", q, k) * jnp.bfloat16(d**-0.5)
            m = jnp.max(logits, axis=-1, keepdims=True)
            p = jnp.exp((logits - m).astype(jnp.float32))
            probs = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(q.dtype)
            return jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        return v  # no_core

    def block(x, w):
        y = ln(x, w["s1"], w["b1"])
        qkv = y @ w["qkv"]
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q, k, v = (split_heads(t, H) for t in (q, k, v))
        o = merge_heads(attn_core(q, k, v)) @ w["proj"]
        x = x + o
        y = ln(x, w["s2"], w["b2"])
        x = x + gelu_poly(y @ w["fc1"]) @ w["fc2"]
        return x

    return block


def main():
    w = {
        "qkv": jnp.full((D, 3 * D), 0.01, jnp.bfloat16),
        "proj": jnp.full((D, D), 0.01, jnp.bfloat16),
        "fc1": jnp.full((D, MLP), 0.01, jnp.bfloat16),
        "fc2": jnp.full((MLP, D), 0.01, jnp.bfloat16),
        "s1": jnp.ones((D,)), "b1": jnp.zeros((D,)),
        "s2": jnp.ones((D,)), "b2": jnp.zeros((D,)),
    }
    x0 = jax.random.normal(jax.random.PRNGKey(0), (B, L, D), jnp.bfloat16)

    for attn_kind, ln_kind in [
        ("v2_g8", "pallas"),
        ("xla", "pallas"),
        ("bf16sm", "pallas"),
        ("no_core", "pallas"),
    ]:
        block = make_block(attn_kind, ln_kind)

        @jax.jit
        def trunk(x):
            def body(h, _):
                return block(h, w), ()
            y, _ = jax.lax.scan(body, x, None, length=DEPTH)
            return y

        ms = pipelined_ms(lambda: trunk(x0))
        print(f"attn={attn_kind:8s} ln={ln_kind:6s}: {ms:7.1f} ms "
              f"({ms / DEPTH:5.2f} ms/block)", flush=True)


if __name__ == "__main__":
    main()
