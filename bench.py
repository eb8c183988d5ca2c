"""Benchmark: VLFM perception-and-mapping pipeline steps/sec per chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

What is measured
----------------
- OURS: the full per-step decision pipeline (obstacle map update incl.
  fog-of-war + flood + frontier detection, value-map cone fusion, object-map
  scan, frontier selection, PointNav ResNet18+LSTM forward) as ONE jitted
  program, vmapped over an episode batch, lax.scan'd over time on the default
  device (the real TPU chip under the driver).
- BASELINE: a NumPy/OpenCV re-implementation of the reference's steady-state
  per-step mapping work (vlfm/mapping/*: hole-fill contours, depth
  back-projection, splat, dilate, explored-contour bookkeeping, value-map
  rotate+paste+fuse on the 1000^2 grid, median-within-radius scoring), timed
  on this host. This is CONSERVATIVE in the reference's favour: it excludes
  the reference's per-step HTTP round-trips to the BLIP-2/detector/SAM
  servers and its torch PointNav forward, which dominate its real latency
  (vlfm/vlm/server_wrapper.py:88-164).
"""

from __future__ import annotations

import json
import time

import numpy as np


# --------------------------------------------------------------------------
# Reference-style CPU baseline (numpy/cv2, algorithmically faithful timing)
# --------------------------------------------------------------------------
def bench_reference_cpu(steps: int = 10) -> float:
    import cv2

    size, pps = 1000, 20
    h, w = 480, 640
    fov, min_d, max_d = np.deg2rad(79.0), 0.5, 5.0
    fx = w / (2 * np.tan(fov / 2))

    obstacle = np.zeros((size, size), bool)
    explored = np.zeros((size, size), bool)
    conf_map = np.zeros((size, size), np.float32)
    value_map = np.zeros((size, size, 1), np.float32)
    kernel = np.ones((7, 7), np.uint8)

    # steady-state: the confidence cone is cached by the reference
    cone_r = int(max_d * pps)
    n = 2 * cone_r + 1
    cone = np.zeros((n, n), np.float32)
    cv2.ellipse(cone, (cone_r, cone_r), (cone_r, cone_r), 0, 90 - 39.5, 90 + 39.5, 1, -1)

    rng = np.random.default_rng(0)
    depth = rng.uniform(0.3, 1.0, size=(h, w)).astype(np.float32)

    t0 = time.time()
    for step in range(steps):
        # --- obstacle map update (obstacle_map.py:86-153 equivalents) ------
        holes = (depth == 0).astype(np.uint8)
        contours, _ = cv2.findContours(holes, cv2.RETR_TREE, cv2.CHAIN_APPROX_SIMPLE)
        filled = depth.copy()
        scaled = filled * (max_d - min_d) + min_d
        mask = scaled < max_d
        v, u = np.where(mask)
        z = scaled[v, u]
        x = (u - w // 2) * z / fx
        y = (v - h // 2) * z / fx
        pts = np.stack([z, -x, -y], -1)
        band = (pts[:, 2] > 0.15) & (pts[:, 2] < 0.88)
        pts = pts[band]
        rows = np.clip((pts[:, 0] * pps).astype(int) + size // 2, 0, size - 1)
        cols = np.clip(size // 2 - (pts[:, 1] * pps).astype(int), 0, size - 1)
        obstacle[rows, cols] = True
        navigable = ~(cv2.dilate(obstacle.astype(np.uint8), kernel) > 0)
        # fog-of-war stand-in: reveal the cached cone at the agent (the real
        # reference ray-marches per step, which is strictly more work)
        exp_new = np.zeros((size, size), np.uint8)
        cv2.ellipse(exp_new, (size // 2, size // 2), (cone_r, cone_r), 0, -39.5, 39.5, 1, -1)
        exp_new = cv2.dilate(exp_new, np.ones((3, 3), np.uint8))
        explored |= exp_new > 0
        explored &= navigable
        contours, _ = cv2.findContours(
            explored.astype(np.uint8), cv2.RETR_EXTERNAL, cv2.CHAIN_APPROX_SIMPLE
        )
        # --- value map update (value_map.py:221-429 equivalents) -----------
        depth_row = depth.max(axis=0) * (max_d - min_d) + min_d
        angles = np.linspace(-fov / 2, fov / 2, w)
        xs = (depth_row * pps + n / 2).astype(int)
        ys = (depth_row * np.tan(angles) * pps + n / 2).astype(int)
        contour = np.concatenate(([[0, n - 1]], np.stack((ys, xs), 1), [[n - 1, n - 1]]))
        visible = cv2.drawContours(cone.copy(), [contour], -1, 0, -1)
        rot = cv2.getRotationMatrix2D((n // 2, n // 2), step * 30.0, 1.0)
        visible = cv2.warpAffine(visible, rot, (n, n))
        new_map = np.zeros((size, size), np.float32)
        c0 = size // 2 - n // 2
        new_map[c0 : c0 + n, c0 : c0 + n] = visible
        silence = (new_map < 0.35) & (new_map < conf_map)
        new_map[silence] = 0
        denom = conf_map + new_map
        with np.errstate(invalid="ignore", divide="ignore"):
            w1, w2 = conf_map / denom, new_map / denom
        value_map = np.nan_to_num(value_map * w1[..., None] + 0.5 * w2[..., None])
        conf_map = np.nan_to_num(conf_map * w1 + new_map * w2)
        # --- frontier waypoint scoring (median within radius x8) -----------
        for _ in range(8):
            crop = value_map[480:501, 480:501, 0]
            vals = crop[crop > 0]
            if vals.size:
                np.median(vals)
    return steps / (time.time() - t0)


# --------------------------------------------------------------------------
# Ours: jitted + vmapped + scanned pipeline on the default device
# --------------------------------------------------------------------------
def bench_tpu_pipeline(batch: int = 16, horizon: int = 12) -> float:
    import jax
    import jax.numpy as jnp

    from vlfm_tpu.config import CameraConfig, VLFMConfig
    from vlfm_tpu.mapping.grid import GridSpec2D
    from vlfm_tpu.models.pointnav import PointNavPolicy
    from vlfm_tpu.policy import itm
    from vlfm_tpu.utils.geometry import xyz_yaw_to_tf_matrix

    cfg = VLFMConfig()  # full 640x480 reference workload
    spec = GridSpec2D(size=1024, pixels_per_meter=20, pad=160)
    pn = PointNavPolicy({}, discrete=True)
    params = pn.init_params(jax.random.PRNGKey(0), depth_shape=tuple(cfg.depth_image_shape))
    pointnav = PointNavPolicy(params, discrete=True)
    cam = cfg.camera

    state = itm.create_state(spec, cfg)
    bstate = jax.tree_util.tree_map(lambda x: jnp.broadcast_to(x, (batch, *x.shape)), state)

    k = cfg.max_detections_per_frame
    det_masks = jnp.zeros((k, cam.height, cam.width), bool)
    det_valid = jnp.zeros(k, bool)
    base_depth = jax.random.uniform(
        jax.random.PRNGKey(1), (cam.height, cam.width), minval=0.3, maxval=1.0
    )

    def one_episode_step(s, t, rng):
        ang = t.astype(jnp.float32) * (jnp.pi / 6)
        xy = jnp.stack([0.05 * t.astype(jnp.float32), jnp.float32(0.0)])
        obs = itm.Observation(
            depth=base_depth,
            tf_camera_to_episodic=xyz_yaw_to_tf_matrix(
                jnp.concatenate([xy, jnp.array([cam.camera_height])]), ang
            ),
            robot_xy=xy,
            robot_heading=ang,
        )
        return itm.step(
            s, obs, jnp.array([0.5]), det_masks, det_valid, rng,
            pointnav=pointnav, spec=spec, cfg=cfg,
        )

    @jax.jit
    def rollout(bs, rng):
        def body(carry, t):
            s, key = carry
            key, sub = jax.random.split(key)
            subs = jax.random.split(sub, batch)
            ts = jnp.full((batch,), t)
            actions, _, s2 = jax.vmap(one_episode_step)(s, ts, subs)
            return (s2, key), actions

        (bs2, _), acts = jax.lax.scan(body, (bs, rng), jnp.arange(horizon))
        return bs2, acts

    # NOTE: on the tunneled axon backend block_until_ready does NOT block;
    # force completion with a readback of a dependent scalar.
    def sync(x):
        return int(jax.device_get(jnp.sum(x)))

    # compile
    bs2, acts = rollout(bstate, jax.random.PRNGKey(2))
    sync(acts)
    # measure
    t0 = time.time()
    bs2, acts = rollout(bstate, jax.random.PRNGKey(3))
    sync(acts)
    dt = time.time() - t0
    return batch * horizon / dt


def main() -> None:
    ours = bench_tpu_pipeline()
    baseline = bench_reference_cpu()
    print(
        json.dumps(
            {
                "metric": "vlfm full decision-step pipeline throughput (batched episodes, one chip) vs reference-style CPU mapping loop (excl. its model-server latency)",
                "value": round(ours, 3),
                "unit": "env-steps/sec/chip",
                "vs_baseline": round(ours / baseline, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
