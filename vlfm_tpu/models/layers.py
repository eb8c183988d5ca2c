"""Shared transformer building blocks (flax), bf16-first.

Compute policy: parameters may be stored f32; activations run in bf16 with
f32 layer-norm statistics and f32 attention softmax — the standard TPU
inference recipe. All blocks are shape-static and shard-friendly (the head
axis is the natural tensor-parallel axis).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


class FastLayerNorm(nn.Module):
    """Drop-in nn.LayerNorm (same param tree: scale/bias at this scope) with
    f32 statistics; on TPU it routes through the single-pass pallas kernel
    (ops/norms.py) — XLA's contextual norm fusions re-read the residual
    stream and dominate non-matmul time in the ViT stacks."""

    epsilon: float = 1e-6

    @nn.compact
    def __call__(self, x):
        d = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (d,))
        bias = self.param("bias", nn.initializers.zeros, (d,))
        from vlfm_tpu.ops.backend import default_interpret

        if not default_interpret():
            from vlfm_tpu.ops.norms import layer_norm

            return layer_norm(x, scale, bias, eps=self.epsilon)
        xf = x.astype(jnp.float32)
        mu = xf.mean(-1, keepdims=True)
        var = ((xf - mu) ** 2).mean(-1, keepdims=True)
        y = (xf - mu) * jax.lax.rsqrt(var + self.epsilon)
        return (y * scale + bias).astype(x.dtype)


class LayerNormF32(nn.Module):
    """LayerNorm computed in f32, cast back to the input dtype."""

    epsilon: float = 1e-6

    @nn.compact
    def __call__(self, x):
        return FastLayerNorm(self.epsilon, name="ln")(x)


def attention(q, k, v, mask: Optional[jnp.ndarray] = None, allow_bf16_logits: bool = False):
    """(B, H, Lq, D) x (B, H, Lk, D) -> (B, H, Lq, D).

    TPU serving keeps the (B, H, Lq, Lk) logits tensor bf16 end-to-end
    (exp/normalize still f32): the bf16 einsum output is already
    bf16-rounded, so the f32 materialization only doubled the softmax
    stage's HBM traffic — the dominant non-matmul cost of the ViT-g trunk
    (measured 138.4 -> 126.9 ms for the 39-block trunk at B=32 L=257,
    scripts/diag_vit_block.py; drift bound pinned in tests/test_attention).
    The fast path is OPT-IN via allow_bf16_logits: it was measured (and its
    drift bound pinned) on the ViT trunk, so only FusedQKVAttention enables
    it — BertAttention callers with mask=None (e.g. Q-Former cross-attention)
    keep the f32-logits softmax. CPU/interpret runs keep f32 logits so
    HF-parity tests bind tightly; VLFM_ATTN_F32SM=1 forces f32 on TPU for
    A/Bs.
    """
    import os

    d = q.shape[-1]
    from vlfm_tpu.ops.backend import default_interpret

    if (
        allow_bf16_logits
        and mask is None
        and q.dtype == jnp.bfloat16
        and not default_interpret()
        and not os.environ.get("VLFM_ATTN_F32SM")
    ):
        return attention_bf16_softmax(q, k, v)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32) / jnp.sqrt(d)
    if mask is not None:
        logits = jnp.where(mask, logits, -1e30)
    probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v)


def attention_bf16_softmax(q, k, v):
    """Unmasked attention with the logits tensor kept bf16 (exp/sum f32),
    a CLAMP instead of the max-subtraction pass, and the softmax divide
    moved to the (L, D) output (round-5 measured: each saves a full pass
    over the (B, H, L, L) logits tensor — trunk 128.1 -> 121.6 ms at the
    ViT-g serving shape, scripts/diag_attn3.py).

    Safety envelope of the clamp: exp(80) = 5.5e34, so a 257-key row sum
    stays < 1.5e37 << f32 max, and the unnormalized PV output (< ~1e38)
    divides back to O(1) in f32 before the bf16 cast. LN'd ViT-g logits
    measure |x| < ~30; a head would need TWO DISTINCT logits above +80 for
    the clamp to distort its (already one-hot) softmax. VLFM_ATTN_MAXSUB=1
    restores the exact max-subtracted path for A/Bs; drift vs that path is
    pinned in tests/test_attention.py at the serving shapes."""
    import os

    d = q.shape[-1]
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k) * jnp.bfloat16(d**-0.5)
    if os.environ.get("VLFM_ATTN_MAXSUB"):
        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp((logits - m).astype(jnp.float32))
        probs = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(q.dtype)
        return jnp.einsum("bhqk,bhkd->bhqd", probs, v)
    p = jnp.exp(jnp.clip(logits.astype(jnp.float32), -80.0, 80.0))
    s = jnp.sum(p, axis=-1, keepdims=True)
    o = jnp.einsum("bhqk,bhkd->bhqd", p.astype(q.dtype), v)
    return (o.astype(jnp.float32) / s).astype(q.dtype)


def split_heads(x, num_heads):
    b, l, d = x.shape
    return x.reshape(b, l, num_heads, d // num_heads).transpose(0, 2, 1, 3)


def merge_heads(x):
    b, h, l, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, l, h * d)


class FusedQKVAttention(nn.Module):
    """CLIP/EVA-style attention with one fused qkv projection.

    TPU routing (measured on chip at the ViT-g serving shape B=32 L=257
    H=16 D=88, scripts/diag_vit_block.py round 4): the original
    per-query-tile pallas flash kernel ran the 39-block trunk at 180.9 ms
    vs 138.9 ms for plain XLA einsum attention and 139.5 ms for the
    grouped-head pallas kernel — at these short sequence lengths XLA's own
    fusion already overlaps the logits traffic with the surrounding
    matmuls, and the explicit 128-lane padding of D=88 plus the 1536-
    instance grid made the kernel a net loss. Default is therefore the
    einsum path; set VLFM_VIT_ATTN=flash|grouped_v2 to A/B the kernels."""

    num_heads: int

    @nn.compact
    def __call__(self, x):
        d = x.shape[-1]
        qkv = nn.Dense(3 * d, name="qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q, k, v = (split_heads(t, self.num_heads) for t in (q, k, v))
        from vlfm_tpu.ops.backend import default_interpret

        kind = __import__("os").environ.get("VLFM_VIT_ATTN", "xla")
        if default_interpret() or kind == "xla":
            out = attention(q, k, v, allow_bf16_logits=True)
        elif kind == "grouped_v2":
            from vlfm_tpu.ops.attention import flash_attention_grouped_v2

            out = flash_attention_grouped_v2(q, k, v)
        else:
            from vlfm_tpu.ops.attention import flash_attention

            out = flash_attention(q, k, v)
        return nn.Dense(d, name="proj")(merge_heads(out))


class BertAttention(nn.Module):
    """BERT-style attention with separate q/k/v, optional cross-attention."""

    num_heads: int

    @nn.compact
    def __call__(self, x, kv=None, mask=None):
        d = x.shape[-1]
        kv = x if kv is None else kv
        q = nn.Dense(d, name="query")(x)
        k = nn.Dense(d, name="key")(kv)
        v = nn.Dense(d, name="value")(kv)
        out = attention(
            split_heads(q, self.num_heads),
            split_heads(k, self.num_heads),
            split_heads(v, self.num_heads),
            mask=mask,
        )
        return nn.Dense(d, name="out")(merge_heads(out))


class MLP(nn.Module):
    hidden: int
    approximate_gelu: bool = False

    @nn.compact
    def __call__(self, x):
        d = x.shape[-1]
        y = nn.Dense(self.hidden, name="fc1")(x)
        from vlfm_tpu.ops.backend import default_interpret

        if self.approximate_gelu or default_interpret():
            y = nn.gelu(y, approximate=self.approximate_gelu)
        else:
            # TPU serving: exact-erf gelu burns VPU time on exp/divide (and
            # erf itself); the degree-8 odd-poly fit (|err| <= 1.3e-4,
            # FMA-only) is the same substitution the TinyViT serving path
            # uses (ops/conv_fused.gelu_poly). CPU/interpret runs keep the
            # exact erf so HF-parity tests bind tightly.
            from vlfm_tpu.ops.conv_fused import gelu_poly

            y = gelu_poly(y)
        return nn.Dense(d, name="fc2")(y)
