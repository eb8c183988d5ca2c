"""Does the axon tunnel overlap two in-flight fused programs?

Enqueue two group dispatches back-to-back (farm ping-pong pattern), timing
each enqueue and each result fetch. If the second enqueue blocks until the
first program completes, ping-pong overlap buys nothing on this tunnel and
the farm should pipeline differently.
"""

import sys
import time

sys.path.insert(0, ".")

from bench import _enable_compile_cache, _policy_setup, _sync, production_models

_enable_compile_cache()

import jax
import jax.numpy as jnp
import numpy as np

from vlfm_tpu.config import VLFMConfig
from vlfm_tpu.mapping.grid import GridSpec2D
from vlfm_tpu.policy import itm as policy_itm
from vlfm_tpu.runner.full_stack import FullStackPerception


def main():
    lanes = 16
    half = lanes // 2
    h, w = 480, 640
    cfg = VLFMConfig(sam_frame_capacity=max(2, lanes // 4))
    spec = GridSpec2D(size=1024, pixels_per_meter=20, pad=160)
    itm_model, detector, sam, _ = production_models()
    perception = FullStackPerception(cfg, itm=itm_model, detector=detector, sam=sam)
    pointnav, bstate = _policy_setup(cfg, spec, half)
    fused = perception.make_fused_step(pointnav, spec, cfg, "toilet")
    fresh = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (half, *x.shape)),
        policy_itm.create_state(spec, cfg),
    )

    rng = np.random.default_rng(0)

    def batch(i):
        return (
            rng.uniform(0.2, 1.0, (half, h, w)).astype(np.float32),
            rng.integers(0, 255, (half, h, w, 3), np.uint8),
            np.full((half,), 0.1 * i, np.float32),
            np.full((half, 2), 0.05 * i, np.float32),
            np.arange(half, dtype=np.int32),
            np.full((half,), i, np.int32),
            np.zeros((half,), bool),
        )

    def enqueue(gs, i):
        d, r, hd, xy, sd, st, rs = batch(i)
        return fused(gs, fresh, jnp.asarray(rs), jax.device_put(d),
                     jnp.asarray(hd), jnp.asarray(xy), jax.device_put(r),
                     jnp.asarray(sd), jnp.asarray(st))

    g0 = g1 = bstate
    out = enqueue(g0, 0)
    _sync(out[0])
    g0 = out[3]

    for trial in range(4):
        t0 = time.time()
        a0, d0, go0, g0 = enqueue(g0, 2 * trial + 1)
        t1 = time.time()
        a1, d1, go1, g1 = enqueue(g1, 2 * trial + 2)
        t2 = time.time()
        jax.device_get((a0, d0, go0))
        t3 = time.time()
        jax.device_get((a1, d1, go1))
        t4 = time.time()
        print(
            f"enq0={1e3*(t1-t0):.0f}ms enq1={1e3*(t2-t1):.0f}ms "
            f"get0={1e3*(t3-t2):.0f}ms get1={1e3*(t4-t3):.0f}ms "
            f"cycle={1e3*(t4-t0):.0f}ms for 2 dispatches",
            flush=True,
        )


if __name__ == "__main__":
    main()
