"""Torch-checkpoint -> JAX parameter conversion for the PointNav policy.

The reference ships frozen PointNav weights as a torch state_dict
(``data/pointnav_weights.pth``; layout of
vlfm/policy/utils/non_habitat_policy/nh_pointnav_policy.py — see
pointnav_policy.py:180-193 for how habitat checkpoints are remapped into that
same layout). This module maps those tensors into the flax parameter tree of
``vlfm_tpu.models.pointnav`` with the required layout transposes:

- conv weights: torch (O, I, kh, kw) -> flax (kh, kw, I, O)
- linear weights: torch (O, I) -> flax kernel (I, O)
- GroupNorm weight/bias -> scale/bias
- LSTM weight_ih/hh per layer (kept in torch (4H, in) layout; the JAX LSTM
  step consumes them torch-style, gate order i,f,g,o)

Input is any mapping name -> numpy array (call ``load_torch_file`` for a
.pth; torch is only imported there so the rest of the framework stays
torch-free).
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import jax.numpy as jnp
import numpy as np


def load_torch_file(path: str) -> Dict[str, np.ndarray]:
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(ckpt, dict) and "state_dict" in ckpt:
        ckpt = ckpt["state_dict"]
    return {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v) for k, v in ckpt.items()}


def _conv(w: np.ndarray) -> jnp.ndarray:
    return jnp.asarray(np.transpose(w, (2, 3, 1, 0)))


def _linear(sd: Mapping[str, np.ndarray], name: str) -> Dict[str, jnp.ndarray]:
    return {
        "kernel": jnp.asarray(sd[f"{name}.weight"].T),
        "bias": jnp.asarray(sd[f"{name}.bias"]),
    }


def _gn(sd: Mapping[str, np.ndarray], name: str) -> Dict[str, jnp.ndarray]:
    return {
        "scale": jnp.asarray(sd[f"{name}.weight"]),
        "bias": jnp.asarray(sd[f"{name}.bias"]),
    }


def convert_torch_state_dict(
    sd: Mapping[str, np.ndarray], discrete: bool = False
) -> Dict[str, Any]:
    """Build the {trunk, heads, lstm} parameter tree from a torch state_dict."""
    enc = "net.visual_encoder"
    backbone: Dict[str, Any] = {
        "stem_conv": {"kernel": _conv(sd[f"{enc}.backbone.conv1.0.weight"])},
        "stem_gn": _gn(sd, f"{enc}.backbone.conv1.1"),
    }
    for li in range(1, 5):
        for bi in range(2):
            t = f"{enc}.backbone.layer{li}.{bi}"
            blk: Dict[str, Any] = {
                "conv1": {"kernel": _conv(sd[f"{t}.convs.0.weight"])},
                "gn1": _gn(sd, f"{t}.convs.1"),
                "conv2": {"kernel": _conv(sd[f"{t}.convs.3.weight"])},
                "gn2": _gn(sd, f"{t}.convs.4"),
            }
            if f"{t}.downsample.0.weight" in sd:
                blk["down_conv"] = {"kernel": _conv(sd[f"{t}.downsample.0.weight"])}
                blk["down_gn"] = _gn(sd, f"{t}.downsample.1")
            backbone[f"layer{li}_block{bi}"] = blk

    visual = {
        "backbone": backbone,
        "comp_conv": {"kernel": _conv(sd[f"{enc}.compression.0.weight"])},
        "comp_gn": _gn(sd, f"{enc}.compression.1"),
    }

    trunk: Dict[str, Any] = {
        "visual": visual,
        "visual_fc": _linear(sd, "net.visual_fc.1"),
        "tgt_embed": _linear(sd, "net.tgt_embeding"),
    }
    if discrete:
        trunk["prev_action_embed"] = {
            "embedding": jnp.asarray(sd["net.prev_action_embedding_discrete.weight"])
        }
    else:
        trunk["prev_action_fc"] = _linear(sd, "net.prev_action_embedding_cont")

    lstm = {}
    for layer in range(2):
        lstm[f"layer{layer}"] = {
            "w_ih": jnp.asarray(sd[f"net.state_encoder.rnn.weight_ih_l{layer}"]),
            "w_hh": jnp.asarray(sd[f"net.state_encoder.rnn.weight_hh_l{layer}"]),
            "b_ih": jnp.asarray(sd[f"net.state_encoder.rnn.bias_ih_l{layer}"]),
            "b_hh": jnp.asarray(sd[f"net.state_encoder.rnn.bias_hh_l{layer}"]),
        }

    if discrete:
        heads = {"action_logits": _linear(sd, "action_distribution.linear")}
    else:
        heads = {"mu_maybe_std": _linear(sd, "action_distribution.mu_maybe_std")}

    return {"trunk": trunk, "heads": heads, "lstm": lstm}
