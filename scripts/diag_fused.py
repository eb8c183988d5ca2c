"""Phase-split the FUSED farm dispatch: where do 1.7 s/dispatch go?

Parts timed per iteration (farm-style, sync each iter):
  host-stack | device_put(big) | asarray(small) | fused enqueue | device_get
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
    depth_src = rng.uniform(0.2, 1.0, (lanes, h, w)).astype(np.float32)
    rgb_src = rng.integers(0, 255, (lanes, h, w, 3), np.uint8)

    def batches(i):
        depth_b = np.empty((half, h, w), np.float32)
        rgb_b = np.empty((half, h, w, 3), np.uint8)
        for j in range(half):
            depth_b[j] = depth_src[(i + j) % lanes]
            rgb_b[j] = rgb_src[(i + j) % lanes]
        heading_b = np.full((half,), 0.1 * i, np.float32)
        xy_b = np.full((half, 2), 0.05 * i, np.float32)
        seeds_b = np.arange(half, dtype=np.int32)
        steps_b = np.full((half,), i, np.int32)
        reset_b = np.zeros((half,), bool)
        return depth_b, rgb_b, heading_b, xy_b, seeds_b, steps_b, reset_b

    print("warming (compile)...", flush=True)
    t0 = time.time()
    d, r, hd, xy, sd, st, rs = batches(0)
    out = fused(bstate, fresh, jnp.asarray(rs), jax.device_put(d),
                jnp.asarray(hd), jnp.asarray(xy), jax.device_put(r),
                jnp.asarray(sd), jnp.asarray(st))
    _sync(out[0])
    print(f"compile {time.time()-t0:.1f}s", flush=True)

    gstate = bstate
    names = ["stack", "dput", "small", "enqueue", "getres"]
    acc = np.zeros(5)
    iters = 8
    for i in range(1, iters + 1):
        t = [time.time()]
        d, r, hd, xy, sd, st, rs = batches(i)
        t.append(time.time())
        d_d, r_d = jax.device_put(d), jax.device_put(r)
        t.append(time.time())
        rs_d, hd_d, xy_d = jnp.asarray(rs), jnp.asarray(hd), jnp.asarray(xy)
        sd_d, st_d = jnp.asarray(sd), jnp.asarray(st)
        t.append(time.time())
        actions, det, goals, gstate = fused(gstate, fresh, rs_d, d_d, hd_d, xy_d,
                                            r_d, sd_d, st_d)
        t.append(time.time())
        jax.device_get((actions, det, goals))
        t.append(time.time())
        acc += np.diff(t)
        print(" ".join(f"{n}={1e3*dt:.0f}ms" for n, dt in zip(names, np.diff(t))),
              flush=True)
    print("MEAN: " + " ".join(f"{n}={1e3*v/iters:.0f}ms" for n, v in zip(names, acc)))


if __name__ == "__main__":
    main()
