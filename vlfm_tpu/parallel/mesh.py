"""Device mesh and sharding helpers.

The reference's "distributed backend" is four single-threaded Flask servers
serialized by filesystem lockfiles plus multi-process episode sharding over a
shared directory (SURVEY.md §2.7). The TPU-native replacement is a single
SPMD program over a ``jax.sharding.Mesh``:

- axis "data": parallel episodes (per-episode map state + observations are
  sharded along their leading batch dimension, all map kernels are
  embarrassingly parallel across episodes),
- axis "model": tensor parallelism for the VLM stack (attention heads / MLP
  columns sharded; XLA inserts the all-reduces over ICI).

Multi-host episode farming over DCN composes on top: each host runs this
program on its slice and claims episodes through the episode ledger
(vlfm_tpu.runner.log_saver).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def best_devices(n: Optional[int] = None):
    """Prefer the default backend; fall back to (virtual) CPU devices when it
    cannot supply the requested count (e.g. one tunneled TPU chip but
    --xla_force_host_platform_device_count=N CPUs for a dry run)."""
    devs = jax.devices()
    if n and len(devs) < n:
        try:
            devs = jax.devices("cpu")
        except RuntimeError:
            pass
    assert not n or len(devs) >= n, f"need {n} devices, have {len(devs)}"
    return devs[:n] if n else devs


def make_mesh(
    n_devices: Optional[int] = None,
    model_parallel: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    devs = list(devices) if devices is not None else best_devices(n_devices)
    n = len(devs)
    assert n % model_parallel == 0, (n, model_parallel)
    grid = np.asarray(devs).reshape(n // model_parallel, model_parallel)
    return Mesh(grid, ("data", "model"))


def episode_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis episode sharding (dp)."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_episode_batch(tree, mesh: Mesh):
    """Place every leaf of an episode-batched pytree with its leading axis
    split over the data axis."""
    s = episode_sharding(mesh)
    return jax.device_put(tree, s)


def shard_params_tp(params, mesh: Mesh):
    """Tensor-parallel placement for transformer params: 2-D kernels split on
    their output (last) axis, embeddings/vectors replicated. XLA inserts the
    matching collectives."""

    def place(x):
        if x.ndim >= 2 and x.shape[-1] % mesh.shape["model"] == 0:
            spec = [None] * (x.ndim - 1) + ["model"]
            return jax.device_put(x, NamedSharding(mesh, P(*spec)))
        return jax.device_put(x, replicated(mesh))

    return jax.tree_util.tree_map(place, params)
