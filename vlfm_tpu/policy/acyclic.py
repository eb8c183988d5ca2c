"""Device-resident acyclic enforcer.

Parity target: vlfm/policy/utils/acyclic_enforcer.py — a hash-set of
(position, chosen frontier, top-two values) used to break oscillation loops.
The reference hashes the string repr of float arrays; here states are
quantized to millimetres and kept in a fixed-capacity ring buffer, with
membership checked by vectorized comparison — exact, jittable, vmappable.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

CAPACITY = 512
_QUANT = 1000.0  # millimetre quantization


class AcyclicState(NamedTuple):
    keys: jnp.ndarray  # (CAP, 6) int32 quantized (pos, frontier, top2)
    count: jnp.ndarray  # () int32


def create(capacity: int = CAPACITY) -> AcyclicState:
    return AcyclicState(keys=jnp.zeros((capacity, 6), jnp.int32), count=jnp.int32(0))


def _key(position, frontier, top_two) -> jnp.ndarray:
    v = jnp.concatenate([position[:2], frontier[:2], top_two[:2]])
    return jnp.round(v * _QUANT).astype(jnp.int32)


def check_cyclic(state: AcyclicState, position, frontier, top_two) -> jnp.ndarray:
    k = _key(position, frontier, top_two)
    cap = state.keys.shape[0]
    valid = jnp.arange(cap) < state.count
    return ((state.keys == k).all(axis=1) & valid).any()


def check_cyclic_batch(state: AcyclicState, position, frontiers, top_two) -> jnp.ndarray:
    """Cyclic flag for each of (F, 2) candidate frontiers at one position."""
    cap = state.keys.shape[0]
    pos_q = jnp.round(position[:2] * _QUANT).astype(jnp.int32)
    top_q = jnp.round(top_two[:2] * _QUANT).astype(jnp.int32)
    fr_q = jnp.round(frontiers[:, :2] * _QUANT).astype(jnp.int32)
    keys = jnp.concatenate(
        [
            jnp.broadcast_to(pos_q, (frontiers.shape[0], 2)),
            fr_q,
            jnp.broadcast_to(top_q, (frontiers.shape[0], 2)),
        ],
        axis=1,
    )  # (F, 6)
    valid = jnp.arange(cap) < state.count
    eq = (state.keys[None, :, :] == keys[:, None, :]).all(axis=2)  # (F, CAP)
    return (eq & valid[None, :]).any(axis=1)


def add(state: AcyclicState, position, frontier, top_two) -> AcyclicState:
    k = _key(position, frontier, top_two)
    cap = state.keys.shape[0]
    slot = state.count % cap
    return AcyclicState(keys=state.keys.at[slot].set(k), count=state.count + 1)
