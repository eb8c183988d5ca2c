"""Text-generation VQA head (flan-T5) for detection verification.

Parity target: vlfm/vlm/blip2.py — the reference serves lavis ``blip2_t5``
(flan-t5-xl) over HTTP and asks "Question: Is this a <phrase>? Answer:" to
veto false-positive detections (base_objectnav_policy.py:326-335, use_vqa).

This module implements the T5 v1.1/flan encoder-decoder in flax (RMSNorm,
relative-position-bucket attention bias, gated-GELU FFN, untied LM head)
with greedy decoding, plus the converter from HF T5 checkpoints. The BLIP-2
visual prefix (Q-Former outputs projected into the T5 embedding space) plugs
in as ``encoder_prefix`` — the same Q-Former already implemented for the ITM
head supplies it.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any, Dict, Mapping, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class T5Config:
    vocab_size: int = 32128
    d_model: int = 512
    d_kv: int = 64
    d_ff: int = 1024
    heads: int = 6
    enc_layers: int = 8
    dec_layers: int = 8
    rel_buckets: int = 32
    rel_max_distance: int = 128
    eps: float = 1e-6

    @staticmethod
    def tiny() -> "T5Config":
        return T5Config(
            vocab_size=100, d_model=32, d_kv=8, d_ff=64, heads=4,
            enc_layers=2, dec_layers=2,
        )

    @staticmethod
    def flan_xl() -> "T5Config":
        """google/flan-t5-xl — the language stack of the reference's VQA
        model Salesforce/blip2-flan-t5-xl (vlfm/vlm/blip2.py:19-24)."""
        return T5Config(
            vocab_size=32128, d_model=2048, d_kv=64, d_ff=5120, heads=32,
            enc_layers=24, dec_layers=24,
        )


class RMSNorm(nn.Module):
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (x.shape[-1],))
        var = jnp.mean(x.astype(jnp.float32) ** 2, axis=-1, keepdims=True)
        return (x * jax.lax.rsqrt(var + self.eps)).astype(x.dtype) * scale


def relative_position_bucket(rel, bidirectional: bool, num_buckets: int, max_distance: int):
    ret = 0
    if bidirectional:
        num_buckets //= 2
        ret += (rel > 0).astype(jnp.int32) * num_buckets
        rel = jnp.abs(rel)
    else:
        rel = -jnp.minimum(rel, 0)
    max_exact = num_buckets // 2
    is_small = rel < max_exact
    large = max_exact + (
        jnp.log(rel.astype(jnp.float32) / max_exact + 1e-9)
        / jnp.log(max_distance / max_exact)
        * (num_buckets - max_exact)
    ).astype(jnp.int32)
    large = jnp.minimum(large, num_buckets - 1)
    return ret + jnp.where(is_small, rel, large)


class T5Attention(nn.Module):
    cfg: T5Config
    has_rel_bias: bool = False
    bidirectional: bool = True

    @nn.compact
    def __call__(self, x, kv=None, mask=None, causal=False, position_bias=None):
        """Returns (out, position_bias). Layer 0 of each stack owns the
        relative-position bias table; later layers REUSE the same bias
        (T5 shares it across the whole stack)."""
        c = self.cfg
        inner = c.heads * c.d_kv
        kv_in = x if kv is None else kv
        lq, lk = x.shape[1], kv_in.shape[1]

        def split(t):
            return t.reshape(t.shape[0], -1, c.heads, c.d_kv).transpose(0, 2, 1, 3)

        q = split(nn.Dense(inner, use_bias=False, name="q")(x))
        k = split(nn.Dense(inner, use_bias=False, name="k")(kv_in))
        v = split(nn.Dense(inner, use_bias=False, name="v")(kv_in))
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k)  # T5: no sqrt(d) scaling
        if self.has_rel_bias and position_bias is None:
            rel = jnp.arange(lk)[None, :] - jnp.arange(lq)[:, None]
            buckets = relative_position_bucket(
                rel, self.bidirectional, c.rel_buckets, c.rel_max_distance
            )
            table = self.param(
                "rel_bias", nn.initializers.normal(1.0), (c.rel_buckets, c.heads)
            )
            position_bias = table[buckets].transpose(2, 0, 1)[None]
        if position_bias is not None:
            logits = logits + position_bias
        if causal:
            cm = jnp.tril(jnp.ones((lq, lk), bool), k=lk - lq)
            logits = jnp.where(cm[None, None], logits, -1e30)
        if mask is not None:
            logits = jnp.where(mask[:, None, None, :], logits, -1e30)
        p = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(x.dtype)
        o = jnp.einsum("bhqk,bhkd->bhqd", p, v).transpose(0, 2, 1, 3)
        o = o.reshape(x.shape[0], lq, inner)
        return nn.Dense(c.d_model, use_bias=False, name="o")(o), position_bias


class T5FFN(nn.Module):
    cfg: T5Config

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        g = nn.gelu(nn.Dense(c.d_ff, use_bias=False, name="wi_0")(x), approximate=True)
        u = nn.Dense(c.d_ff, use_bias=False, name="wi_1")(x)
        return nn.Dense(c.d_model, use_bias=False, name="wo")(g * u)


class T5Block(nn.Module):
    cfg: T5Config
    is_decoder: bool
    has_rel_bias: bool

    @nn.compact
    def __call__(self, x, enc=None, self_mask=None, enc_mask=None, position_bias=None):
        c = self.cfg
        y = RMSNorm(c.eps, name="ln_self")(x)
        a, position_bias = T5Attention(
            c, self.has_rel_bias, bidirectional=not self.is_decoder, name="self_attn"
        )(y, mask=self_mask, causal=self.is_decoder, position_bias=position_bias)
        x = x + a
        if self.is_decoder:
            y = RMSNorm(c.eps, name="ln_cross")(x)
            a, _ = T5Attention(c, False, name="cross_attn")(y, kv=enc, mask=enc_mask)
            x = x + a
        y = RMSNorm(c.eps, name="ln_ffn")(x)
        return x + T5FFN(c, name="ffn")(y), position_bias


class T5Module(nn.Module):
    cfg: T5Config

    def setup(self):
        c = self.cfg
        self.embed = nn.Embed(c.vocab_size, c.d_model, name="embed")
        self.enc_blocks = [
            T5Block(c, False, has_rel_bias=(i == 0), name=f"enc{i}")
            for i in range(c.enc_layers)
        ]
        self.enc_final = RMSNorm(c.eps, name="enc_final")
        self.dec_blocks = [
            T5Block(c, True, has_rel_bias=(i == 0), name=f"dec{i}")
            for i in range(c.dec_layers)
        ]
        self.dec_final = RMSNorm(c.eps, name="dec_final")
        self.lm_head = nn.Dense(c.vocab_size, use_bias=False, name="lm_head")

    def encode(self, input_ids, attention_mask, prefix: Optional[jnp.ndarray] = None):
        x = self.embed(input_ids)
        if prefix is not None:
            # BLIP-2 style visual prefix: projected Q-Former outputs prepended
            x = jnp.concatenate([prefix, x], axis=1)
            attention_mask = jnp.concatenate(
                [jnp.ones(prefix.shape[:2], bool), attention_mask], axis=1
            )
        bias = None
        for blk in self.enc_blocks:
            x, bias = blk(x, self_mask=attention_mask, position_bias=bias)
        return self.enc_final(x), attention_mask

    def decode_logits(self, dec_ids, enc_out, enc_mask):
        x = self.embed(dec_ids)
        bias = None
        for blk in self.dec_blocks:
            x, bias = blk(x, enc=enc_out, enc_mask=enc_mask, position_bias=bias)
        return self.lm_head(self.dec_final(x))

    def __call__(self, input_ids, attention_mask, decoder_ids):
        enc, m = self.encode(input_ids, attention_mask)
        return self.decode_logits(decoder_ids, enc, m)


class T5VQA:
    """Greedy-decoding wrapper. Decoder starts from pad (id 0); eos id 1."""

    PAD_ID = 0
    EOS_ID = 1

    def __init__(self, cfg: T5Config, params: Dict[str, Any]):
        self.cfg = cfg
        self.params = params
        self.module = T5Module(cfg)

    @classmethod
    def init_random(cls, cfg: T5Config, seed: int = 0) -> "T5VQA":
        mod = T5Module(cfg)
        params = mod.init(
            jax.random.PRNGKey(seed),
            jnp.zeros((1, 4), jnp.int32),
            jnp.ones((1, 4), bool),
            jnp.zeros((1, 2), jnp.int32),
        )["params"]
        return cls(cfg, params)

    @staticmethod
    @partial(jax.jit, static_argnames=("module", "max_new"))
    def _greedy(module, params, input_ids, attention_mask, max_new, prefix=None):
        enc, m = module.apply(
            {"params": params}, input_ids, attention_mask, prefix,
            method=T5Module.encode,
        )
        b = input_ids.shape[0]
        tokens = jnp.zeros((b, max_new + 1), jnp.int32)  # starts with PAD

        def body(i, tokens):
            logits = module.apply(
                {"params": params}, tokens[:, : max_new + 1], enc, m,
                method=T5Module.decode_logits,
            )
            step_logits = jnp.take_along_axis(
                logits, i[None, None, None].repeat(b, 0), axis=1
            )[:, 0]
            nxt = jnp.argmax(step_logits, axis=-1).astype(jnp.int32)
            return tokens.at[:, i + 1].set(nxt)

        tokens = jax.lax.fori_loop(0, max_new, body, tokens)
        return tokens[:, 1:]

    def generate(self, input_ids, attention_mask, max_new_tokens: int = 8,
                 prefix: Optional[jnp.ndarray] = None):
        """``prefix`` is the BLIP-2 style visual prefix (B, P, d_model) —
        projected Q-Former outputs prepended to the text embeddings
        (the lavis blip2_t5 composition the reference serves, vlm/blip2.py)."""
        return self._greedy(
            self.module, self.params, input_ids, attention_mask, max_new_tokens,
            prefix,
        )

    def answer_starts_with_yes(self, generated, yes_token_id: int) -> jnp.ndarray:
        """The reference's veto test: answer.lower().startswith('yes')
        (base_objectnav_policy.py:334)."""
        return generated[:, 0] == yes_token_id


# ---------------------------------------------------------------------------
# HF conversion (google/flan-t5-* layout)
# ---------------------------------------------------------------------------
def _w(sd, name):
    return {"kernel": jnp.asarray(np.asarray(sd[f"{name}.weight"]).T)}


def convert_hf_t5(sd: Mapping[str, Any], cfg: T5Config) -> Dict[str, Any]:
    sd = {k: np.asarray(v) for k, v in sd.items()}
    p: Dict[str, Any] = {
        "embed": {"embedding": jnp.asarray(sd["shared.weight"])},
        "enc_final": {"scale": jnp.asarray(sd["encoder.final_layer_norm.weight"])},
        "dec_final": {"scale": jnp.asarray(sd["decoder.final_layer_norm.weight"])},
        "lm_head": _w(sd, "lm_head"),
    }

    def attn(prefix, has_bias):
        out = {
            "q": _w(sd, f"{prefix}.q"),
            "k": _w(sd, f"{prefix}.k"),
            "v": _w(sd, f"{prefix}.v"),
            "o": _w(sd, f"{prefix}.o"),
        }
        if has_bias:
            out["rel_bias"] = jnp.asarray(sd[f"{prefix}.relative_attention_bias.weight"])
        return out

    for i in range(cfg.enc_layers):
        b = f"encoder.block.{i}"
        p[f"enc{i}"] = {
            "self_attn": attn(f"{b}.layer.0.SelfAttention", i == 0),
            "ln_self": {"scale": jnp.asarray(sd[f"{b}.layer.0.layer_norm.weight"])},
            "ffn": {
                "wi_0": _w(sd, f"{b}.layer.1.DenseReluDense.wi_0"),
                "wi_1": _w(sd, f"{b}.layer.1.DenseReluDense.wi_1"),
                "wo": _w(sd, f"{b}.layer.1.DenseReluDense.wo"),
            },
            "ln_ffn": {"scale": jnp.asarray(sd[f"{b}.layer.1.layer_norm.weight"])},
        }
    for i in range(cfg.dec_layers):
        b = f"decoder.block.{i}"
        p[f"dec{i}"] = {
            "self_attn": attn(f"{b}.layer.0.SelfAttention", i == 0),
            "ln_self": {"scale": jnp.asarray(sd[f"{b}.layer.0.layer_norm.weight"])},
            "cross_attn": attn(f"{b}.layer.1.EncDecAttention", False),
            "ln_cross": {"scale": jnp.asarray(sd[f"{b}.layer.1.layer_norm.weight"])},
            "ffn": {
                "wi_0": _w(sd, f"{b}.layer.2.DenseReluDense.wi_0"),
                "wi_1": _w(sd, f"{b}.layer.2.DenseReluDense.wi_1"),
                "wo": _w(sd, f"{b}.layer.2.DenseReluDense.wo"),
            },
            "ln_ffn": {"scale": jnp.asarray(sd[f"{b}.layer.2.layer_norm.weight"])},
        }
    return p
