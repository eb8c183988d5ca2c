"""PointNav depth-goal controller: ResNet18 (GroupNorm) + 2-layer LSTM.

Functional parity targets (reference):
- vlfm/policy/utils/non_habitat_policy/nh_pointnav_policy.py:14-162
  (ResNetEncoder, PointNavResNetNet, GaussianNet, PointNavResNetPolicy)
- vlfm/policy/utils/non_habitat_policy/resnet.py:69-153 (GN ResNet-18,
  base_planes 32, ngroups 16)
- vlfm/policy/utils/non_habitat_policy/rnn_state_encoder.py:55-66
  (mask-resetting LSTM single-step forward)
- vlfm/policy/utils/pointnav_policy.py:51-128 (recurrent-state wrapper)

TPU design: the whole step (visual encoder + embeddings + LSTM + heads) is
one jitted program, batched over episodes (the reference is hard-wired to
batch size 1, base_objectnav_policy.py:153). Weights load from the
reference's torch checkpoint via ``convert_torch_state_dict``.

The reference policy ships two heads: habitat's 4-way categorical for sim
and a tanh-Gaussian for Spot; both are provided here.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, NamedTuple, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

NUM_ACTIONS = 4  # STOP, MOVE_FORWARD, TURN_LEFT, TURN_RIGHT
HIDDEN_SIZE = 512
NUM_LSTM_LAYERS = 2


class GNBasicBlock(nn.Module):
    planes: int
    ngroups: int
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        residual = x
        y = nn.Conv(self.planes, (3, 3), strides=self.stride, padding=1, use_bias=False, name="conv1")(x)
        y = nn.GroupNorm(num_groups=self.ngroups, epsilon=1e-5, name="gn1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.planes, (3, 3), padding=1, use_bias=False, name="conv2")(y)
        y = nn.GroupNorm(num_groups=self.ngroups, epsilon=1e-5, name="gn2")(y)
        if residual.shape[-1] != self.planes or self.stride != 1:
            residual = nn.Conv(
                self.planes, (1, 1), strides=self.stride, use_bias=False, name="down_conv"
            )(x)
            residual = nn.GroupNorm(num_groups=self.ngroups, epsilon=1e-5, name="down_gn")(residual)
        return nn.relu(y + residual)


class ResNet18GN(nn.Module):
    base_planes: int = 32
    ngroups: int = 16
    layer_blocks: Sequence[int] = (2, 2, 2, 2)

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.base_planes, (7, 7), strides=2, padding=3, use_bias=False, name="stem_conv")(x)
        x = nn.GroupNorm(num_groups=self.ngroups, epsilon=1e-5, name="stem_gn")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        planes = self.base_planes
        for li, blocks in enumerate(self.layer_blocks):
            stride = 1 if li == 0 else 2
            for bi in range(blocks):
                x = GNBasicBlock(
                    planes,
                    self.ngroups,
                    stride=stride if bi == 0 else 1,
                    name=f"layer{li + 1}_block{bi}",
                )(x)
            planes *= 2
        return x


class PointNavVisualEncoder(nn.Module):
    """avg-pool 2x -> ResNet18 -> 3x3 compression to 128ch (2048 flat)."""

    @nn.compact
    def __call__(self, depth):  # (B, H, W, 1)
        x = nn.avg_pool(depth, (2, 2), strides=(2, 2))
        x = ResNet18GN(name="backbone")(x)
        x = nn.Conv(128, (3, 3), padding=1, use_bias=False, name="comp_conv")(x)
        x = nn.GroupNorm(num_groups=1, epsilon=1e-5, name="comp_gn")(x)
        x = nn.relu(x)
        return x.reshape(x.shape[0], -1)


def lstm_step(params: Dict[str, Any], x, h, c):
    """Multi-layer LSTM single step. x: (B, I); h, c: (L, B, H)."""
    new_h, new_c = [], []
    inp = x
    for layer in range(NUM_LSTM_LAYERS):
        p = params[f"layer{layer}"]
        gates = inp @ p["w_ih"].T + p["b_ih"] + h[layer] @ p["w_hh"].T + p["b_hh"]
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
        g = jnp.tanh(g)
        ct = f * c[layer] + i * g
        ht = o * jnp.tanh(ct)
        new_h.append(ht)
        new_c.append(ct)
        inp = ht
    return inp, jnp.stack(new_h), jnp.stack(new_c)


def init_lstm_params(rng, input_size: int, hidden: int = HIDDEN_SIZE):
    params = {}
    for layer in range(NUM_LSTM_LAYERS):
        k1, k2, rng = jax.random.split(rng, 3)
        in_sz = input_size if layer == 0 else hidden
        params[f"layer{layer}"] = {
            "w_ih": jax.nn.initializers.orthogonal()(k1, (4 * hidden, in_sz)),
            "w_hh": jax.nn.initializers.orthogonal()(k2, (4 * hidden, hidden)),
            "b_ih": jnp.zeros(4 * hidden),
            "b_hh": jnp.zeros(4 * hidden),
        }
    return params


class PointNavTrunk(nn.Module):
    """Everything before the LSTM: visual feats ++ goal ++ prev-action."""

    discrete: bool = True

    @nn.compact
    def __call__(self, depth, pointgoal, prev_action, mask):
        vis = PointNavVisualEncoder(name="visual")(depth)
        vis = nn.Dense(HIDDEN_SIZE, name="visual_fc")(vis)
        vis = nn.relu(vis)

        goal = jnp.stack(
            [pointgoal[:, 0], jnp.cos(-pointgoal[:, 1]), jnp.sin(-pointgoal[:, 1])],
            axis=-1,
        )
        goal = nn.Dense(32, name="tgt_embed")(goal)

        if self.discrete:
            prev = jnp.where(mask[:, 0], prev_action[:, 0].astype(jnp.int32) + 1, 0)
            pa = nn.Embed(NUM_ACTIONS + 1, 32, name="prev_action_embed")(prev)
        else:
            pa = nn.Dense(32, name="prev_action_fc")(mask * prev_action)
        return jnp.concatenate([vis, goal, pa], axis=-1)  # (B, 576)


class ActionHeads(nn.Module):
    discrete: bool = True

    @nn.compact
    def __call__(self, features):
        if self.discrete:
            return nn.Dense(NUM_ACTIONS, name="action_logits")(features)
        mu_std = nn.Dense(4, name="mu_maybe_std")(features)
        mu, log_std = jnp.split(mu_std, 2, axis=-1)
        return jnp.tanh(mu), jnp.exp(jnp.clip(log_std, -5, 2))


class PointNavState(NamedTuple):
    h: jnp.ndarray  # (L, B, 512)
    c: jnp.ndarray  # (L, B, 512)
    prev_action: jnp.ndarray  # (B, A) float or (B, 1) int-valued float
    not_done: jnp.ndarray  # (B, 1) bool — False resets the recurrence


def initial_state(batch: int, discrete: bool = True) -> PointNavState:
    a = 1 if discrete else 2
    return PointNavState(
        h=jnp.zeros((NUM_LSTM_LAYERS, batch, HIDDEN_SIZE)),
        c=jnp.zeros((NUM_LSTM_LAYERS, batch, HIDDEN_SIZE)),
        prev_action=jnp.zeros((batch, a)),
        not_done=jnp.zeros((batch, 1), bool),
    )


class PointNavPolicy:
    """Jitted recurrent controller. Batched over episodes."""

    def __init__(self, params: Dict[str, Any], discrete: bool = True):
        self.params = params
        self.discrete = discrete
        self._trunk = PointNavTrunk(discrete=discrete)
        self._heads = ActionHeads(discrete=discrete)

    def init_params(self, rng, depth_shape=(224, 224)) -> Dict[str, Any]:
        b = 1
        k1, k2, k3 = jax.random.split(rng, 3)
        depth = jnp.zeros((b, *depth_shape, 1))
        goal = jnp.zeros((b, 2))
        a = 1 if self.discrete else 2
        prev = jnp.zeros((b, a))
        mask = jnp.zeros((b, 1), bool)
        trunk = self._trunk.init(k1, depth, goal, prev, mask)["params"]
        heads = self._heads.init(k2, jnp.zeros((b, HIDDEN_SIZE)))["params"]
        lstm = init_lstm_params(k3, 576)
        return {"trunk": trunk, "heads": heads, "lstm": lstm}

    def act(
        self,
        depth: jnp.ndarray,  # (B, H, W, 1) normalized
        pointgoal: jnp.ndarray,  # (B, 2) rho, theta
        state: PointNavState,
        *,
        deterministic: bool = True,
        rng: jnp.ndarray | None = None,
    ):
        # Params are passed as traced args so they never become XLA constants.
        return _pointnav_act(
            self._trunk, self._heads, self.discrete, deterministic,
            self.params, depth, pointgoal, state, rng,
        )


@partial(jax.jit, static_argnames=("trunk", "heads", "discrete", "deterministic"))
def _pointnav_act(trunk, heads, discrete, deterministic, params, depth, pointgoal, state, rng):
    mask = state.not_done
    feats = trunk.apply(
        {"params": params["trunk"]}, depth, pointgoal, state.prev_action, mask
    )
    m = mask[None, :, :].astype(feats.dtype)  # (1, B, 1) broadcast over layers
    h = state.h * m
    c = state.c * m
    out, h, c = lstm_step(params["lstm"], feats, h, c)
    if discrete:
        logits = heads.apply({"params": params["heads"]}, out)
        if deterministic:
            action = jnp.argmax(logits, axis=-1, keepdims=True)
        else:
            action = jax.random.categorical(rng, logits)[:, None]
        prev = action.astype(jnp.float32)
    else:
        mu, std = heads.apply({"params": params["heads"]}, out)
        action = mu if deterministic else mu + std * jax.random.normal(rng, mu.shape)
        prev = action
    new_state = PointNavState(
        h=h, c=c, prev_action=prev, not_done=jnp.ones_like(state.not_done)
    )
    return action, new_state


def reset_episodes(state: PointNavState, done: jnp.ndarray) -> PointNavState:
    """Zero the recurrence for episodes flagged done ((B,) bool)."""
    keep = ~done
    return PointNavState(
        h=state.h * keep[None, :, None],
        c=state.c * keep[None, :, None],
        prev_action=state.prev_action * keep[:, None],
        not_done=state.not_done & keep[:, None],
    )
