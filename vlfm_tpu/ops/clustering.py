"""DBSCAN-style largest-cluster extraction on the MXU.

Replaces the Open3D DBSCAN call (object_point_cloud_map.py:192-219,
eps=0.2, min_points=100 on clouds subsampled to 5000 points): pairwise
distances of a fixed-size point set are one matmul, core points are a degree
threshold, and cluster labels come from transitive closure of the core-core
adjacency by repeated boolean matrix squaring — O(log N) MXU matmuls, no
data-dependent loops.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=())
def largest_cluster_mask(
    points: jnp.ndarray,  # (N, 3)
    valid: jnp.ndarray,  # (N,)
    eps: jnp.ndarray,
    min_points: jnp.ndarray,
) -> jnp.ndarray:
    """Bool mask of the largest DBSCAN cluster (empty if only noise).

    Border points (non-core within eps of a core) join the cluster of their
    nearest core neighbour, matching DBSCAN semantics.
    """
    n = points.shape[0]
    sq = jnp.sum(points * points, axis=1)
    d2 = sq[:, None] + sq[None, :] - 2.0 * jnp.matmul(
        points, points.T, precision=jax.lax.Precision.HIGHEST
    )
    within = (d2 <= eps * eps) & valid[:, None] & valid[None, :]

    degree = within.sum(axis=1)  # includes self
    core = valid & (degree >= min_points)

    core_adj = within & core[:, None] & core[None, :]
    core_adj = core_adj | (jnp.eye(n, dtype=bool) & core[:, None])

    steps = max(1, (n - 1).bit_length())

    def body(_, a):
        af = a.astype(jnp.float32)
        return jnp.matmul(af, af, precision=jax.lax.Precision.DEFAULT) > 0.5

    closure = jax.lax.fori_loop(0, steps, body, core_adj)
    core_label = jnp.where(core, jnp.argmax(closure, axis=1), n)

    # border points: label of any neighbouring core (min label)
    nb = jnp.where(within & core[None, :], core_label[None, :], n)
    border_label = jnp.min(nb, axis=1)
    label = jnp.where(core, core_label, jnp.where(valid, border_label, n))

    counts = jnp.zeros(n + 1, jnp.int32).at[label].add(1)
    counts = counts.at[n].set(0)  # noise bucket
    best = jnp.argmax(counts)
    return (label == best) & (counts[best] > 0)
