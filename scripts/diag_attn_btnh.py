"""Can the head transposes go? 39-block trunk with attention in BTNH layout
(jax.nn.dot_product_attention, no split/merge transposes) vs the current
BHTD einsum path. B=32, L=257, D=1408, H=16."""

import sys

sys.path.insert(0, ".")

from bench import _enable_compile_cache, pipelined_ms

_enable_compile_cache()

import jax
import jax.numpy as jnp

from vlfm_tpu.models.layers import attention, merge_heads, split_heads
from vlfm_tpu.ops.conv_fused import gelu_poly
from vlfm_tpu.ops.norms import layer_norm

B, L, D, H, MLP = 32, 257, 1408, 16, 6144
DH = D // H
DEPTH = 39


def make_block(kind):
    def ln(x, s, b):
        return layer_norm(x, s, b, eps=1e-6)

    def block(x, w):
        y = ln(x, w["s1"], w["b1"])
        qkv = y @ w["qkv"]
        if kind == "btnh":
            q, k, v = jnp.split(qkv, 3, axis=-1)
            q = q.reshape(B, L, H, DH)
            k = k.reshape(B, L, H, DH)
            v = v.reshape(B, L, H, DH)
            o = jax.nn.dot_product_attention(q, k, v).reshape(B, L, D)
        else:
            q, k, v = jnp.split(qkv, 3, axis=-1)
            q, k, v = (split_heads(t, H) for t in (q, k, v))
            o = merge_heads(attention(q, k, v))
        x = x + o @ w["proj"]
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

    for kind in ("btnh", "bhtd"):
        block = make_block(kind)

        @jax.jit
        def trunk(x):
            def body(h, _):
                return block(h, w), ()
            y, _ = jax.lax.scan(body, x, None, length=DEPTH)
            return y

        ms = pipelined_ms(lambda: trunk(x0))
        print(f"{kind}: {ms:7.1f} ms ({ms / DEPTH:5.2f} ms/block)", flush=True)


if __name__ == "__main__":
    main()
