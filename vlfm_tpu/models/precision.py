"""Serving-precision cast for converted checkpoints.

The HF converters (``convert_hf_state_dict`` and friends) emit f32 param
trees — the checkpoint's native dtype, which the CPU parity suites need so
they bind tightly against ``transformers``. But flax's ``nn.Dense`` promotes
``bfloat16 activation x float32 kernel`` to an f32 matmul: serve a converted
tree as-is and EVERY matmul in the stack silently runs at half MXU rate and
double weight bandwidth, while the ``compute_dtype=bfloat16`` config reads as
if bf16 were in effect. (The in-repo benches never see this because
``bench.fast_params`` fills bf16 directly; the landmine is real-checkpoint
serving.)

``cast_for_serving`` is the one-call fix: cast floating-point leaves to the
compute dtype, EXCEPT parameters that live under a normalization scope.
Norm scales/biases stay f32 — they multiply f32 statistics inside the norm
kernels (ops/norms.py computes f32 stats and casts the result back to the
activation dtype, so keeping them f32 costs nothing) and bf16-rounding them
is pure precision loss. Integer/bool leaves (embedding ids, masks, buffers)
pass through untouched.

Reference behavior being replaced: the reference serves each model at
whatever dtype torch loaded (f32, or .half() where the wrapper says so,
e.g. vlfm/vlm/blip2.py:25); there is no shared precision policy to mirror —
this module IS the TPU policy.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

# Scope-name fragments (matched case-insensitively against every component of
# the param path) whose leaves keep their checkpoint dtype. These cover the
# repo's norm layers: FastLayerNorm/LayerNormF32 ("ln", "ln1", "post_ln",
# "self_ln", ...), BatchNorm-folded TinyViT scales ("bn"), T5 RMSNorm
# ("rms", "layer_norm"), and GroundingDino's fusion layernorms ("layer_norm").
_NORM_FRAGMENTS = ("ln", "norm", "bn", "rms")


def _is_norm_scope(path: tuple) -> bool:
    for part in path:
        name = getattr(part, "key", None)
        if name is None:
            continue
        low = str(name).lower()
        if any(
            low == f or low.startswith(f"{f}_") or low.endswith(f"_{f}")
            or low.startswith(f) and low[len(f):].isdigit()
            for f in _NORM_FRAGMENTS
        ):
            return True
    return False


def cast_for_serving(params: Any, dtype: Any = jnp.bfloat16) -> Any:
    """Cast a converted param tree to the serving compute dtype.

    Float leaves -> ``dtype``; leaves under a norm scope and non-float leaves
    keep their dtype. Returns a new tree (input is not mutated).
    """

    def cast(path, leaf):
        if not hasattr(leaf, "dtype") or not jnp.issubdtype(leaf.dtype, jnp.floating):
            return leaf
        # A leaf literally named "scale" is a norm gain in this repo's layers
        # (Dense uses kernel/bias) — catches RMSNorm scopes like "enc_final"
        # whose scope name does not read as a norm.
        last = getattr(path[-1], "key", None) if path else None
        if last == "scale" or _is_norm_scope(path):
            return leaf
        return leaf.astype(dtype)

    return jax.tree_util.tree_map_with_path(cast, params)
