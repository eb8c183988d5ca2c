"""Diagnose the streamed-farm dispatch cost (~4.9 s/dispatch measured in
round 3's first streamed bench vs ~0.2 s expected from component times).

Phases measured on the real chip, each as a PIPELINED loop with one forced
readback (single-shot wall times overstate 3-5x over the tunnel):

  1. param-handle marshalling: a trivial jitted reduce over the BLIP2-ITM
     param pytree (~700 arrays) vs the same over ONE packed array — isolates
     per-call argument-marshalling cost from compute.
  2. per-stage times of FullStackPerception.batch at the farm's group batch
     (half = lanes//2 = 8): ITM score, detection (coco+open-vocab), SAM
     gated, full batch().
  3. host->device rgb transfer (np.uint8 (8,480,640,3) ~7.4 MB).
  4. the policy step_fn at the same batch.
  5. a full dispatch emulation: transfer + batch() + step + 3x device_get,
     timed per iteration (NOT pipelined — matches the farm's sync pattern).

Run:  python scripts/diag_streamed.py
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import numpy as np

from bench import (_enable_compile_cache, _policy_setup, _sync,
                   pipelined_ms, production_models)

_enable_compile_cache()

import jax
import jax.numpy as jnp




def main():
    from vlfm_tpu.config import VLFMConfig
    from vlfm_tpu.mapping.grid import GridSpec2D
    from vlfm_tpu.policy import itm as policy_itm
    from vlfm_tpu.runner.episode_driver import _obs_from_env, _step_key
    from vlfm_tpu.runner.full_stack import FullStackPerception

    lanes = 16
    half = lanes // 2
    h, w = 480, 640

    cfg = VLFMConfig(sam_frame_capacity=max(2, lanes // 4))
    spec = GridSpec2D(size=1024, pixels_per_meter=20, pad=160)

    print("== building production models ==", flush=True)
    t0 = time.time()
    itm_model, detector, sam, init_s = production_models()
    perception = FullStackPerception(cfg, itm=itm_model, detector=detector, sam=sam)
    pointnav, bstate = _policy_setup(cfg, spec, half)
    print(f"model init {init_s}s, total {time.time()-t0:.1f}s", flush=True)

    # ---- 1. param marshalling microbench --------------------------------
    leaves = jax.tree_util.tree_leaves(itm_model.params)
    print(f"itm params: {len(leaves)} leaves", flush=True)

    @jax.jit
    def touch(p):
        return jax.tree_util.tree_reduce(
            lambda a, x: a + x.reshape(-1)[0].astype(jnp.float32), p, jnp.float32(0)
        )

    t0 = time.time()
    _sync(touch(itm_model.params))
    print(f"touch compile {time.time()-t0:.1f}s", flush=True)
    ms = pipelined_ms(lambda: touch(itm_model.params), iters=20)
    print(f"[1a] jit call over {len(leaves)}-leaf pytree: {ms:.1f} ms/call", flush=True)

    packed = jnp.zeros((512, 512), jnp.bfloat16)

    @jax.jit
    def touch1(p):
        return p.reshape(-1)[0].astype(jnp.float32)

    _sync(touch1(packed))
    ms = pipelined_ms(lambda: touch1(packed), iters=20)
    print(f"[1b] jit call over ONE array:            {ms:.1f} ms/call", flush=True)

    # ---- 2. perception stages -------------------------------------------
    rng = np.random.default_rng(0)
    rgb_np = rng.integers(0, 255, (half, h, w, 3), np.uint8)
    rgb_dev = jnp.asarray(rgb_np)
    _sync(rgb_dev)
    target = "toilet"

    print("== warming perception (compile; may take minutes on miss) ==", flush=True)
    t0 = time.time()
    out = perception.batch(rgb_dev, target)
    _sync(out[2])
    print(f"perception.batch compile+run {time.time()-t0:.1f}s", flush=True)

    ms = pipelined_ms(lambda: perception.engine.score(rgb_dev, target), iters=10)
    print(f"[2a] engine.score (ITM):        {ms:.1f} ms", flush=True)
    ms = pipelined_ms(lambda: perception.pipeline(rgb_dev, target)[1], iters=10)
    print(f"[2b] pipeline (det+SAM):        {ms:.1f} ms", flush=True)
    ms = pipelined_ms(lambda: perception.batch(rgb_dev, target)[2], iters=10)
    print(f"[2c] batch() on device rgb:     {ms:.1f} ms", flush=True)

    # ---- 3. host->device transfer ---------------------------------------
    def xfer():
        return jnp.asarray(rgb_np)

    ms = pipelined_ms(xfer, iters=5)
    mb = rgb_np.nbytes / 1e6
    print(f"[3] h->d {mb:.1f} MB: {ms:.1f} ms ({1e3*mb/ms:.0f} MB/s)", flush=True)

    # ---- 4. policy step --------------------------------------------------
    def one(state, obs, cosines, masks, valid, rng):
        return policy_itm.step(
            state, obs, cosines, masks, valid, rng,
            pointnav=pointnav, spec=spec, cfg=cfg, version="v2",
        )

    step_fn = jax.jit(jax.vmap(one))

    k = cfg.max_detections_per_frame
    o = {
        "depth": np.full((h, w), 0.5, np.float32),
        "heading": 0.0,
        "robot_xy": np.zeros(2, np.float32),
    }
    obs_rows = [_obs_from_env(o, cfg) for _ in range(half)]
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *obs_rows)
    rngs = jnp.stack([_step_key(0, i) for i in range(half)])
    cos_b, masks_b, valid_b = perception.batch(rgb_dev, target)

    t0 = time.time()
    out = step_fn(bstate, stacked, cos_b, masks_b, valid_b, rngs)
    _sync(out[0])
    print(f"policy step compile {time.time()-t0:.1f}s", flush=True)

    def pol():
        a, i, s = step_fn(bstate, stacked, cos_b, masks_b, valid_b, rngs)
        return a

    ms = pipelined_ms(pol, iters=10)
    print(f"[4] policy step_fn:             {ms:.1f} ms", flush=True)

    # ---- 5. full dispatch emulation (farm pattern, NOT pipelined) -------
    def dispatch_once():
        rgb_d = jnp.asarray(rgb_np)
        cos, masks, valid = perception.batch(rgb_d, target)
        a, info, s = step_fn(bstate, stacked, cos, masks, valid, rngs)
        np.asarray(jax.device_get(a))
        np.asarray(jax.device_get(info.target_detected))
        np.asarray(jax.device_get(info.goal))

    dispatch_once()
    times = []
    for _ in range(6):
        t0 = time.time()
        dispatch_once()
        times.append(time.time() - t0)
    print(
        f"[5] full dispatch (sync each): {1e3*np.mean(times):.0f} ms "
        f"(min {1e3*min(times):.0f}, max {1e3*max(times):.0f})",
        flush=True,
    )

    # variant: single combined device_get
    def dispatch_combined():
        rgb_d = jnp.asarray(rgb_np)
        cos, masks, valid = perception.batch(rgb_d, target)
        a, info, s = step_fn(bstate, stacked, cos, masks, valid, rngs)
        jax.device_get((a, info.target_detected, info.goal))

    dispatch_combined()
    times = []
    for _ in range(6):
        t0 = time.time()
        dispatch_combined()
        times.append(time.time() - t0)
    print(
        f"[5b] dispatch, ONE device_get: {1e3*np.mean(times):.0f} ms "
        f"(min {1e3*min(times):.0f}, max {1e3*max(times):.0f})",
        flush=True,
    )


if __name__ == "__main__":
    main()
