"""Fused attention kernel (ops/attention.flash_attention) parity vs the
einsum reference (models/layers.attention), interpret mode on CPU —
including the production ViT-g shape (L=257, D=88) whose padding/masking
the kernel must handle."""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
import jax  # noqa: E402

from vlfm_tpu.models.layers import attention  # noqa: E402
from vlfm_tpu.ops.attention import flash_attention  # noqa: E402


@pytest.mark.parametrize(
    "b,h,l,d",
    [(2, 2, 64, 32), (1, 16, 257, 88), (2, 4, 130, 16)],
)
def test_matches_reference_f32(b, h, l, d):
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q, k, v = (jax.random.normal(kk, (b, h, l, d), jnp.float32) for kk in ks)
    want = attention(q, k, v)
    got = flash_attention(q, k, v, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_matches_reference_bf16():
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    q, k, v = (
        jax.random.normal(kk, (2, 4, 257, 88)).astype(jnp.bfloat16) for kk in ks
    )
    want = np.asarray(attention(q, k, v), np.float32)
    got = np.asarray(flash_attention(q, k, v, interpret=True), np.float32)
    # bf16 paths differ only in logit rounding (the kernel keeps f32 logits,
    # the reference einsum rounds through bf16 before its f32 softmax)
    np.testing.assert_allclose(got, want, atol=2e-2)


def test_padded_keys_do_not_leak():
    # all-equal values: any softmax weighting gives the same output, UNLESS
    # zero-padded keys leak probability mass onto zero-padded values
    q = jnp.ones((1, 1, 257, 88))
    k = jnp.ones((1, 1, 257, 88))
    v = jnp.ones((1, 1, 257, 88))
    out = flash_attention(q, k, v, interpret=True)
    np.testing.assert_allclose(np.asarray(out), 1.0, atol=1e-6)


def test_bf16_softmax_drift_bound():
    """TPU serving keeps the logits tensor bf16 (layers.attention routes
    unmasked bf16 attention to attention_bf16_softmax on TPU), clamps at
    +-80 instead of subtracting the row max, and normalizes on the (L, D)
    output (round-5: each saves a full pass over the logits tensor). Pin
    the drift against the f32-logits max-subtracted softmax at the ViT-g
    serving shape, and pin the clamped path against the max-subtracted
    bf16 path (VLFM_ATTN_MAXSUB) exactly where both are defined."""
    from vlfm_tpu.models.layers import attention_bf16_softmax

    ks = jax.random.split(jax.random.PRNGKey(4), 3)
    q, k, v = (
        jax.random.normal(kk, (2, 16, 257, 88)).astype(jnp.bfloat16) for kk in ks
    )
    want = np.asarray(attention(q, k, v), np.float32)  # CPU: f32-logits path
    got = np.asarray(attention_bf16_softmax(q, k, v), np.float32)
    assert np.abs(got - want).max() < 2e-2
    assert np.abs(got - want).mean() < 2e-3

    # the clamp only distorts when a row holds logits beyond +-80; random
    # normal logits never get near it, so clamped vs max-subtracted must
    # agree to normalization rounding
    import os

    os.environ["VLFM_ATTN_MAXSUB"] = "1"
    try:
        maxsub = np.asarray(attention_bf16_softmax(q, k, v), np.float32)
    finally:
        del os.environ["VLFM_ATTN_MAXSUB"]
    assert np.abs(got - maxsub).max() < 2e-2
    assert np.abs(got - maxsub).mean() < 2e-3


def test_bf16_softmax_extreme_logits_stay_finite():
    """The +-80 clamp's safety envelope: rows where EVERY logit saturates
    the clamp (the pathological worst case for the unnormalized f32 sum and
    the bf16 PV accumulation) must still produce finite, correctly
    normalized output — uniform attention over the saturated keys."""
    from vlfm_tpu.models.layers import attention_bf16_softmax

    d = 88
    scale = float(np.sqrt(d))
    # q.k/sqrt(d) == +100 for every pair -> clamp to +80 across the row
    q = jnp.full((1, 2, 257, d), np.sqrt(100.0 * scale / d), jnp.bfloat16)
    k = q
    v = jax.random.normal(jax.random.PRNGKey(0), (1, 2, 257, d)).astype(
        jnp.bfloat16
    )
    out = np.asarray(attention_bf16_softmax(q, k, v), np.float32)
    assert np.isfinite(out).all()
    want = np.asarray(jnp.mean(v.astype(jnp.float32), axis=2, keepdims=True))
    np.testing.assert_allclose(
        out, np.broadcast_to(want, out.shape), atol=5e-2
    )


def test_bf16_logits_path_gated_to_vit_trunk(monkeypatch):
    """The bf16-logits fast path is opt-in (allow_bf16_logits): its drift
    bound was measured on the ViT trunk only, so BertAttention callers with
    mask=None (Q-Former cross-attention) must keep the f32-logits softmax
    even on TPU. Simulate the TPU routing by monkeypatching
    default_interpret to False and pin both sides of the gate."""
    import vlfm_tpu.models.layers as layers_mod
    import vlfm_tpu.ops.backend as backend_mod

    monkeypatch.setattr(backend_mod, "default_interpret", lambda: False)
    monkeypatch.delenv("VLFM_ATTN_F32SM", raising=False)

    ks = jax.random.split(jax.random.PRNGKey(5), 3)
    q, k, v = (
        jax.random.normal(kk, (1, 8, 64, 32)).astype(jnp.bfloat16) for kk in ks
    )
    d = q.shape[-1]
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32) / jnp.sqrt(d)
    f32_path = jnp.einsum(
        "bhqk,bhkd->bhqd", jax.nn.softmax(logits, -1).astype(q.dtype), v
    )
    # default (BertAttention-style) call: f32 logits even with mask=None
    np.testing.assert_array_equal(
        np.asarray(attention(q, k, v), np.float32), np.asarray(f32_path, np.float32)
    )
    # ViT-trunk call: routed to the measured bf16-logits kernel
    np.testing.assert_array_equal(
        np.asarray(attention(q, k, v, allow_bf16_logits=True), np.float32),
        np.asarray(layers_mod.attention_bf16_softmax(q, k, v), np.float32),
    )


@pytest.mark.parametrize(
    "b,h,l,d,group",
    [(2, 2, 64, 32, 2), (1, 16, 257, 88, 8), (2, 4, 130, 16, None)],
)
def test_grouped_v2_matches_reference_f32(b, h, l, d, group):
    from vlfm_tpu.ops.attention import flash_attention_grouped_v2

    ks = jax.random.split(jax.random.PRNGKey(2), 3)
    q, k, v = (jax.random.normal(kk, (b, h, l, d), jnp.float32) for kk in ks)
    want = attention(q, k, v)
    got = flash_attention_grouped_v2(q, k, v, interpret=True, group=group)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_grouped_v2_auto_group_respects_vmem():
    """The auto group picker must reject groups whose double-buffered blocks
    exceed VMEM (g=32 at the ViT-g shape compiles to a 16.36 MB stack)."""
    from vlfm_tpu.ops.attention import flash_attention_grouped_v2

    ks = jax.random.split(jax.random.PRNGKey(3), 3)
    # OWL-ViT-like shape: L=577, D=64 — g=16 would blow the budget
    q, k, v = (jax.random.normal(kk, (1, 16, 577, 64), jnp.float32) for kk in ks)
    want = attention(q, k, v)
    got = flash_attention_grouped_v2(q, k, v, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)
