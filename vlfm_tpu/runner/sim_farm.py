"""Async episode farm: sim worker PROCESSES feed the device over shared memory.

This assembles the native obsring (native/obsring.cpp) into the episode
driver, replacing the reference's concurrency stack — habitat VectorEnv
pickle pipes plus per-request JPEG-base64 HTTP with filesystem lockfiles
(vlfm/vlm/server_wrapper.py:57-164, vlfm/utils/vlfm_trainer.py:99-105) — with
a host pipeline shaped for a TPU driver process:

- W worker processes each own a set of episode lanes; they run the (numpy)
  environment, memcpy fixed-layout observation records into a POSIX shm ring,
  and poll a second ring for the actions addressed to their lanes.
- The single driver process drains whole observation batches with zero
  syscalls on the hot path, runs the jitted vmapped policy step, and pushes
  tiny action records back.
- Lanes are split into TWO groups with independent device state, dispatched
  ping-pong: while group A's step executes on the chip, group B's workers are
  stepping their simulators — host sim time and device time overlap instead
  of serializing (the round-1 driver alternated them strictly).

Scheduling independence: per-(episode-seed, step) rng keys and per-lane state
resets make every episode's success/SPL/steps/detections identical to the
synchronous drivers' (tests/test_sim_farm.py pins farm == recycled ==
single-episode on those fields). The failure-cause taxonomy matches
run_episode exactly: agent_z crosses the ring (TraveledStairs accumulates
driver-side), the result record carries the target pose/radius/feasibility so
the driver computes the map-based was_target_seen from its own device-resident
explored map and runs the nav-goal false-positive test against the last goal
it observed at sync time (episode_stats_logger.py:44-111 analogues, identical
inputs to run_episode / run_episodes_recycled).

Workers never import jax; by default the records carry f32 depth so device
inputs are bit-identical to the in-process path. ``depth_u16=True`` ships
normalized depth as u16 (1.5e-5 quantization, dequantized inside the fused
device program) and ``depth_half=True`` ships it 2x2-box-averaged at half
resolution (bilinearly upsampled back inside the device program) — opt-in
transport compressions for bandwidth-limited host links; the
equality-pinned parity suites run with exact f32/full-res. Compression runs
through cv2.INTER_AREA when available (bit-identical to the numpy 2x2
formula, measured 128x faster — on a 1-core bench host the worker's pack
CPU is part of the serving budget).
"""

from __future__ import annotations

import multiprocessing as mp
import struct
import time
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence

import numpy as np

from vlfm_tpu.runner import fake_env as FE
from vlfm_tpu.runner.obsring import ObservationRing

try:  # optional fast path for the 2x2 box averages (exactness pinned in
    import cv2 as _cv2  # tests/test_sim_farm.py::test_cv2_area_matches_numpy)
except Exception:  # pragma: no cover - cv2 is present in the image
    _cv2 = None


def _avg2x2_u8(img: np.ndarray) -> np.ndarray:
    """2x2 box average of (H, W, 3) uint8, round-half-up — bit-identical via
    either backend."""
    h2, w2 = img.shape[0] // 2, img.shape[1] // 2
    if _cv2 is not None:
        return _cv2.resize(img, (w2, h2), interpolation=_cv2.INTER_AREA)
    return (
        (img.astype(np.uint16).reshape(h2, 2, w2, 2, 3).sum(axis=(1, 3)) + 2) >> 2
    ).astype(np.uint8)


def _avg2x2_f32(d: np.ndarray) -> np.ndarray:
    """Exact 2x2 mean of (H, W) float32."""
    h2, w2 = d.shape[0] // 2, d.shape[1] // 2
    if _cv2 is not None:
        return _cv2.resize(d, (w2, h2), interpolation=_cv2.INTER_AREA)
    return d.reshape(h2, 2, w2, 2).mean(axis=(1, 3), dtype=np.float32)

# record kinds (worker -> driver ring)
KIND_OBS = 0
KIND_RESULT = 1

# lane kind seed step flags heading x y dist cosine agent_z
_OBS_HEAD = struct.Struct("<IIIIIffffff")
_ACT_REC = struct.Struct("<IIIi")  # lane seed step action
# lane kind seed called_stop collisions steps seen dist shortest path_len
# target_x target_y target_radius feasible
_RES_REC = struct.Struct("<IIIIIIIffffffI")

FLAG_DONE = 1
FLAG_TARGET_VISIBLE = 2


def obs_slot_bytes(
    height: int, width: int, rgb: bool = False, depth_u16: bool = False,
    rgb_half: bool = False, depth_half: bool = False,
) -> int:
    dpx = (height // 2) * (width // 2) if depth_half else height * width
    base = _OBS_HEAD.size + (2 if depth_u16 else 4) * dpx
    base += (height * width + 7) // 8
    px = (height // 2) * (width // 2) if rgb_half else height * width
    return base + (3 * px if rgb else 0)


def pack_obs(
    lane: int, seed: int, step: int, o: dict, rgb: bool = False,
    depth_u16: bool = False, rgb_half: bool = False, depth_half: bool = False,
) -> bytes:
    flags = (FLAG_DONE if o["done"] else 0) | (
        FLAG_TARGET_VISIBLE if o["target_visible"] else 0
    )
    head = _OBS_HEAD.pack(
        lane, KIND_OBS, seed, step, flags,
        float(o["heading"]), float(o["robot_xy"][0]), float(o["robot_xy"][1]),
        float(o["distance_to_goal"]), float(o["cosine"]),
        float(o.get("agent_z", 0.0)),
    )
    d = np.asarray(o["depth"], np.float32)
    if depth_half:
        # 2x2 box average at half resolution: depth was 70% of per-step
        # bytes as full-res u16 (VERDICT r4 #1a). The fused device program
        # bilinearly upsamples back to (H, W); the decision drift is pinned
        # by tests/test_sim_farm.py::test_depth_half_drift_bound
        d = _avg2x2_f32(d)
    if depth_u16:
        # normalized [0, 1] depth as u16: 1.5e-5 quantization, 2 bytes/px —
        # halves the dominant share of per-step host->device traffic on
        # bandwidth-limited links; dequantized IN the fused device program
        depth = (np.clip(d, 0.0, 1.0) * 65535.0 + 0.5).astype(np.uint16).tobytes()
    else:
        depth = np.ascontiguousarray(d, np.float32).tobytes()
    mask = np.packbits(np.asarray(o["target_mask"], bool)).tobytes()
    if rgb:
        img = np.asarray(o["rgb"], np.uint8)
        if rgb_half:
            # 2x2 box average, round-to-nearest: the reference's own
            # transport is lossy (JPEG-q90 per request,
            # vlfm/vlm/server_wrapper.py:57-68); every consumer model
            # resamples from 480x640 anyway (224/768/1024 px), so a half-res
            # source costs a bounded cosine/detection drift
            # (tests/test_sim_farm.py::test_rgb_half_drift_bound) for 4x
            # less rgb on bandwidth-limited host links
            img = _avg2x2_u8(img)
        return head + depth + mask + np.ascontiguousarray(img).tobytes()
    return head + depth + mask


def unpack_obs(
    payload: bytes, height: int, width: int, rgb: bool = False, mask: bool = True,
    depth_u16: bool = False, rgb_half: bool = False, depth_half: bool = False,
) -> dict:
    """``mask=False`` skips the target-mask unpackbits — the perception
    (model-based) farm path never reads it, and on a 1-core host the per-
    record unpack competes with the sim workers for the CPU."""
    (lane, kind, seed, step, flags, heading, x, y, dist, cosine,
     agent_z) = _OBS_HEAD.unpack_from(payload, 0)
    assert kind == KIND_OBS
    off = _OBS_HEAD.size
    dh, dw = (height // 2, width // 2) if depth_half else (height, width)
    if depth_u16:
        # returned RAW (u16, possibly half-res): the fused path ships it to
        # the device as-is (dequantize + upsample happen in the program)
        depth = np.frombuffer(payload, np.uint16, dh * dw, off).reshape(dh, dw)
        off += 2 * dh * dw
    else:
        depth = np.frombuffer(payload, np.float32, dh * dw, off).reshape(dh, dw)
        off += 4 * dh * dw
    nbits = (height * width + 7) // 8
    target_mask = None
    if mask:
        bits = np.unpackbits(np.frombuffer(payload, np.uint8, nbits, off))
        target_mask = bits[: height * width].reshape(height, width).astype(bool)
    rgb_img = None
    if rgb:
        off2 = off + nbits
        rh, rw = (height // 2, width // 2) if rgb_half else (height, width)
        rgb_img = np.frombuffer(payload, np.uint8, 3 * rh * rw, off2).reshape(
            rh, rw, 3
        )
    return {
        "rgb": rgb_img,
        "lane": lane,
        "seed": seed,
        "step": step,
        "done": bool(flags & FLAG_DONE),
        "target_visible": bool(flags & FLAG_TARGET_VISIBLE),
        "heading": heading,
        "robot_xy": np.array([x, y], np.float32),
        "distance_to_goal": dist,
        "cosine": cosine,
        "agent_z": agent_z,
        "depth": depth,
        "target_mask": target_mask,
    }


def pack_result(lane: int, seed: int, env, seen: bool, dist: float, shortest: float) -> bytes:
    tx, ty = getattr(env.plan, "target", (0.0, 0.0))
    return _RES_REC.pack(
        lane, KIND_RESULT, seed, int(env.called_stop), int(env.collisions),
        int(env.steps), int(seen), float(dist), float(shortest), float(env.path_length),
        float(tx), float(ty), float(getattr(env.plan, "target_radius", 0.0)),
        int(getattr(env, "path_feasible", True)),
    )


def record_kind(payload: bytes) -> int:
    return struct.unpack_from("<I", payload, 4)[0]


def worker_main(
    obs_name: str,
    act_name: str,
    lane_ids: Sequence[int],
    seed_queue: Sequence[int],
    plan_name: str,
    env_cfg: "FE.EnvConfig",
    max_steps: int,
    want_rgb: bool = False,
    depth_u16: bool = False,
    rgb_half: bool = False,
    depth_half: bool = False,
) -> None:
    """Sim worker process: owns ``lane_ids``, drains its private seed queue.

    Pure numpy — the worker never touches jax or the device. The plan factory
    is resolved by name from fake_env so the function pickles under the
    ``spawn`` start method.
    """
    import os
    import sys

    debug = bool(os.environ.get("VLFM_FARM_DEBUG"))

    def dbg(*a):
        if debug:
            print(f"[worker lanes={list(lane_ids)}]", *a, file=sys.stderr, flush=True)

    plan_fn = getattr(FE, plan_name)
    obs_ring = ObservationRing.open(obs_name)
    act_ring = ObservationRing.open(act_name)
    dbg("rings open", obs_ring.slot_bytes, obs_ring.n_slots)

    queue = list(seed_queue)
    envs: Dict[int, FE.FakeObjectNavEnv] = {}
    seeds: Dict[int, int] = {}
    steps: Dict[int, int] = {}
    seen: Dict[int, bool] = {}
    shortest: Dict[int, float] = {}
    active = set()

    def start_episode(lane: int) -> None:
        s = queue.pop(0)
        envs[lane] = FE.FakeObjectNavEnv(plan_fn(seed=s), env_cfg)
        seeds[lane], steps[lane], seen[lane] = s, 0, False
        shortest[lane] = envs[lane].shortest_path_length()
        o = envs[lane].reset()
        seen[lane] = bool(o["target_visible"])
        t = obs_ring.push(pack_obs(lane, s, 0, o, rgb=want_rgb, depth_u16=depth_u16,
                                   rgb_half=rgb_half, depth_half=depth_half))
        dbg("pushed initial obs", "lane", lane, "seed", s, "ticket", t)
        active.add(lane)

    for lane in lane_ids:
        if queue:
            start_episode(lane)

    while active:
        got = act_ring.poll_batch(max_records=64)
        if not got:
            time.sleep(0.002)  # 1-core host: don't steal the driver's CPU
            continue
        for _, payload in got:
            lane, seed, step, action = _ACT_REC.unpack(payload)
            if lane not in active or seed != seeds[lane] or step != steps[lane]:
                continue  # not ours / stale (pre-recycle) record
            env = envs[lane]
            o = env.step(int(action))
            steps[lane] += 1
            if o["done"] or steps[lane] >= max_steps:
                obs_ring.push(
                    pack_result(
                        lane, seed, env, seen[lane], o["distance_to_goal"], shortest[lane]
                    )
                )
                active.discard(lane)
                if queue:
                    start_episode(lane)
            else:
                seen[lane] = seen[lane] or bool(o["target_visible"])
                obs_ring.push(
                    pack_obs(lane, seed, steps[lane], o, rgb=want_rgb,
                             depth_u16=depth_u16, rgb_half=rgb_half,
                             depth_half=depth_half))


@dataclass
class FarmStats:
    env_steps: int = 0
    wall_time: float = 0.0
    dispatches: int = 0
    overlapped: int = 0  # dispatches issued while another group was in flight
    # phase accounting (seconds of driver wall time), for serving diagnosis:
    t_drain: float = 0.0  # ring polling + record unpack
    t_dispatch: float = 0.0  # obs stacking + perception + policy enqueue
    t_sync: float = 0.0  # blocking on device results + action pushback
    t_idle: float = 0.0  # waiting for worker observations
    # in-band transport measurement (VERDICT r4 weak #1): bytes actually
    # device_put over the host->device link and the wall time those puts
    # blocked the driver — bytes_put/t_put is the measured effective link
    # bandwidth of THIS run, recorded in every BENCH so the streamed series
    # is falsifiable against same-session link conditions.
    bytes_put: int = 0
    t_put: float = 0.0

    @property
    def steps_per_sec(self) -> float:
        return self.env_steps / self.wall_time if self.wall_time else 0.0


@dataclass
class _Lane:
    seed: int = -1
    step: int = -1
    pending: Optional[dict] = None
    detected: bool = False
    needs_reset: bool = False
    active: bool = True
    last: Optional[dict] = None  # last obs fed to the device (for idle filler)
    hist: dict = field(default_factory=dict)
    stairs: object = None  # TraveledStairs, reset per episode
    last_goal: Optional[np.ndarray] = None
    # taxonomy state stashed at recycle time, keyed by the finished seed —
    # the result record may be finalized after the lane already started the
    # next episode
    closed: dict = field(default_factory=dict)


def run_episodes_farm(
    episode_seeds: Sequence[int],
    lanes: int,
    pointnav,
    spec,
    cfg,
    *,
    plan_name: str = "two_room_plan",
    env_cfg: Optional["FE.EnvConfig"] = None,
    workers: int = 2,
    version: str = "v2",
    max_steps: Optional[int] = None,
    ring_prefix: str = "vlfm_farm",
    perception=None,
    target: str = "toilet",
    depth_u16: bool = False,
    rgb_half: bool = False,
    depth_half: bool = False,
    sharding=None,
    packed: bool = True,
):
    """Drive ``lanes`` episode lanes fed by ``workers`` sim processes.

    With ``perception`` (a FullStackPerception), RGB frames cross the shm
    ring and each group dispatch runs the REAL model stack batched
    (perception.batch: BLIP2-ITM scoring + detection + SAM) instead of the
    env's oracle cosine/target-mask — live envs + real models + streamed
    observations as ONE system (the reference's per-step traffic,
    itm_policy.py:191-211 + base_objectnav_policy.py:311-321 driven by
    vlfm_trainer.py:164-325). The monocular-depth all-ones trigger is not
    exercised here (synthetic depth is never all-ones).

    With ``sharding`` (a ``jax.sharding.Sharding`` over the episode-batch
    axis, e.g. ``parallel.mesh.episode_sharding(mesh)``), every device-side
    batch — the per-group policy states and each dispatch's observation
    arrays — is placed with that sharding, so the SAME fused dispatch
    programs run SPMD dp-sharded over the mesh (SURVEY §7 step 9: episode
    lanes scale over devices; XLA inserts the collectives). Results must be
    bit-identical to the unsharded farm — asserted by
    ``__graft_entry__.dryrun_multichip``'s farm tier. ``lanes/2`` must be
    divisible by the mesh's data axis.

    With ``packed`` (default), each dispatch crosses the host->device
    boundary as ONE uint8 buffer (and its results come back as ONE f32
    array) — on latency-bound links (dev tunnel ~26 ms RTT) the unpacked
    transport's ~7 puts + 2 readback round trips per dispatch were the
    throughput floor (runner/packing.py). Bit-identical to unpacked
    (on-device bitcast; pinned by tests/test_sim_farm.py). Auto-disabled
    under ``sharding`` (a flat byte buffer cannot carry the episode-axis
    sharding).

    Returns ({seed: EpisodeResult}, FarmStats). Requires the native obsring
    (ObservationRing.available()); callers fall back to run_episodes_recycled.
    """
    import jax
    import jax.numpy as jnp

    from vlfm_tpu.policy import itm
    from vlfm_tpu.runner import metrics as M
    from vlfm_tpu.utils.measurements import TraveledStairs

    assert lanes % 2 == 0, "lanes must be even (two ping-pong groups)"
    assert lanes <= len(episode_seeds), "need at least one episode per lane"
    env_cfg = env_cfg or FE.EnvConfig()
    limit = max_steps or env_cfg.max_steps
    h, w = env_cfg.height, env_cfg.width
    k = cfg.max_detections_per_frame
    half = lanes // 2
    groups = [list(range(0, half)), list(range(half, lanes))]

    want_rgb = perception is not None
    assert not (rgb_half or depth_half) or (h % 2 == 0 and w % 2 == 0), (
        "half-res transport needs even dims"
    )
    if sharding is not None:
        packed = False  # flat byte buffer cannot carry the episode sharding
    dh, dw = (h // 2, w // 2) if depth_half else (h, w)
    rh, rw = (h // 2, w // 2) if rgb_half else (h, w)
    dlayout = None
    if packed:
        from vlfm_tpu.runner.packing import build_layout, pack_views

        dt_depth = "uint16" if depth_u16 else "float32"
        if want_rgb:
            specs = [("depth", dt_depth, (half, dh, dw)),
                     ("rgb", "uint8", (half, rh, rw, 3))]
        else:
            specs = [("depth", dt_depth, (half, dh, dw)),
                     ("cos", "float32", (half, cfg.value_channels)),
                     ("bits", "uint8", (half, (h * w + 7) // 8)),
                     ("valid0", "uint8", (half,))]
        specs += [("heading", "float32", (half,)),
                  ("xy", "float32", (half, 2)),
                  ("seeds", "int32", (half,)),
                  ("steps", "int32", (half,)),
                  ("reset", "uint8", (half,))]
        dlayout = build_layout(specs)
        # one buffer per group: a group's buffer is only rewritten after its
        # previous dispatch has been synced, so an in-flight transfer never
        # races the refill
        gbufs = [np.zeros(dlayout.total, np.uint8) for _ in range(2)]
        gviews = [pack_views(b, dlayout) for b in gbufs]
    obs_ring = ObservationRing.create(
        f"{ring_prefix}_obs",
        slot_bytes=obs_slot_bytes(h, w, rgb=want_rgb, depth_u16=depth_u16,
                                  rgb_half=rgb_half, depth_half=depth_half),
        n_slots=4 * lanes + 16,
    )
    act_ring = ObservationRing.create(
        f"{ring_prefix}_act", slot_bytes=_ACT_REC.size, n_slots=64 * lanes + 64
    )

    # split seeds across workers; each worker gets a contiguous lane span so
    # whole workers stay group-aligned. The first ``lanes`` seeds are assigned
    # lane-by-lane (guaranteeing every worker can fill all its lanes), the
    # remainder round-robin.
    ctx = mp.get_context("spawn")
    lane_spans = np.array_split(np.arange(lanes), workers)
    lane_owner = np.concatenate(
        [np.full(len(span), wi) for wi, span in enumerate(lane_spans)]
    )
    seed_splits: List[List[int]] = [[] for _ in range(workers)]
    seeds_list = list(episode_seeds)
    for lane in range(lanes):
        seed_splits[int(lane_owner[lane])].append(seeds_list[lane])
    # leftover episodes go only to workers that own lanes (a lane-less worker
    # is never spawned, so seeds routed there would stall the farm)
    active = [wi for wi in range(workers) if len(lane_spans[wi]) > 0]
    for i, s in enumerate(seeds_list[lanes:]):
        seed_splits[active[i % len(active)]].append(s)
    # Workers are numpy-only and must NEVER initialize an accelerator
    # backend: single-client device tunnels (axon) hang or fail on a second
    # claim. Spawned children inherit os.environ at start(), so pin the
    # platform to cpu for the spawn window (the driver's own jax backend is
    # already initialized by this point).
    import os

    prev_platforms = os.environ.get("JAX_PLATFORMS")
    os.environ["JAX_PLATFORMS"] = "cpu"
    procs = []
    try:
        for wi in range(workers):
            if len(lane_spans[wi]) == 0:
                continue
            p = ctx.Process(
                target=worker_main,
                args=(
                    f"{ring_prefix}_obs", f"{ring_prefix}_act",
                    [int(x) for x in lane_spans[wi]], seed_splits[wi],
                    plan_name, env_cfg, limit, want_rgb, depth_u16, rgb_half,
                    depth_half,
                ),
                daemon=True,
            )
            p.start()
            procs.append(p)
    finally:
        if prev_platforms is None:
            os.environ.pop("JAX_PLATFORMS", None)
        else:
            os.environ["JAX_PLATFORMS"] = prev_platforms

    base = itm.create_state(spec, cfg)
    fresh = jax.tree_util.tree_map(lambda x: jnp.broadcast_to(x, (half, *x.shape)), base)
    if sharding is not None:
        _put = lambda x: jax.device_put(x, sharding)  # noqa: E731
        fresh = jax.tree_util.tree_map(_put, fresh)
        gstate = [jax.tree_util.tree_map(_put, fresh) for _ in range(2)]
    else:
        _put = jax.device_put
        gstate = [jax.tree_util.tree_map(jnp.copy, fresh) for _ in range(2)]

    # The fused dispatch: perception + resets + policy as ONE jitted call per
    # group (the unfused path made ~140 tiny eager device calls per dispatch
    # — ~2.4 s of tunnel overhead against a ~0.4 s device path; see
    # FullStackPerception.make_fused_step). VQA-veto configurations fuse
    # too — the T5/bridge params thread through the same program.
    fused = None
    if perception is not None:
        fused = perception.make_fused_step(
            pointnav, spec, cfg, target, version=version, layout=dlayout
        )

    def one(state, obs, cosines, masks, valid, rng):
        return itm.step(
            state, obs, cosines, masks, valid, rng,
            pointnav=pointnav, spec=spec, cfg=cfg, version=version,
        )

    # The oracle (perception=None) dispatch is fused into ONE jitted program
    # exactly like the model-stack dispatch: the old path made per-lane eager
    # device calls (_obs_from_env transfers, per-lane fold_in keys, a
    # separate reset_lanes launch) at ~2.6 ms tunnel overhead each and
    # shipped the (half, K, H, W) bool mask buffer dense — 19.6 MB/dispatch
    # at 480x640. Here the slot-0 target mask crosses as PACKED BITS
    # (np.packbits layout) and is unpacked on device; rng keys come from the
    # same fold_in(PRNGKey(seed), step) bits as episode_driver._step_key, so
    # decisions stay bit-identical to the single-episode driver
    # (tests/test_sim_farm.py farm==single parity).
    from vlfm_tpu.utils.geometry import xyz_yaw_to_tf_matrix

    @jax.jit
    def oracle_fused(gs, fresh_, *args):
        if dlayout is not None:
            from vlfm_tpu.runner.packing import unpack_device

            f = unpack_device(dlayout, args[0])
            reset_mask = f["reset"].astype(bool)
            depth, heading, xy = f["depth"], f["heading"], f["xy"]
            cos, mask_bits = f["cos"], f["bits"]
            valid0 = f["valid0"].astype(bool)
            seeds, steps = f["seeds"], f["steps"]
        else:
            (reset_mask, depth, heading, xy, cos,
             mask_bits, valid0, seeds, steps) = args
        if depth.dtype == jnp.uint16:
            depth = depth.astype(jnp.float32) * (1.0 / 65535.0)
        if depth.shape[-2:] != (h, w):
            # depth_half transport: bilinear 2x upsample back to the camera
            # grid, on device (MXU matmul resize)
            from vlfm_tpu.ops.resize import resize_bilinear_hw

            depth = resize_bilinear_hw(depth, h, w)

        def sel(b, f):
            m = reset_mask.reshape((-1,) + (1,) * (b.ndim - 1))
            return jnp.where(m, f, b)

        gs = jax.tree_util.tree_map(sel, gs, fresh_)
        shifts = jnp.arange(7, -1, -1, dtype=jnp.uint8)  # packbits bitorder='big'
        m0 = ((mask_bits[:, :, None] >> shifts[None, None, :]) & 1).astype(bool)
        m0 = m0.reshape(half, -1)[:, : h * w].reshape(half, h, w)
        masks = jnp.zeros((half, k, h, w), bool).at[:, 0].set(m0)
        valid = jnp.zeros((half, k), bool).at[:, 0].set(valid0)
        cam_pos = jnp.concatenate(
            [xy, jnp.full((half, 1), cfg.camera.camera_height, xy.dtype)], axis=1
        )
        tf = jax.vmap(xyz_yaw_to_tf_matrix)(cam_pos, heading)
        obs = itm.Observation(
            depth=depth, tf_camera_to_episodic=tf,
            robot_xy=xy, robot_heading=heading,
        )
        keys = jax.vmap(
            lambda s, t: jax.random.fold_in(jax.random.PRNGKey(s), t)
        )(seeds, steps)
        actions, infos, gs2 = jax.vmap(one)(gs, obs, cos, masks, valid, keys)
        if dlayout is not None:
            out = jnp.concatenate(
                [
                    actions.astype(jnp.float32)[:, None],
                    infos.target_detected.astype(jnp.float32)[:, None],
                    infos.goal.astype(jnp.float32),
                ],
                axis=1,
            )
            return out, gs2
        return actions, infos.target_detected, infos.goal, gs2

    lane_info = [_Lane(stairs=TraveledStairs()) for _ in range(lanes)]
    results: Dict[int, M.EpisodeResult] = {}
    expected = len(episode_seeds)
    inflight: List[Optional[tuple]] = [None, None]
    inflight_order: List[int] = []  # dispatch order, oldest first
    pending_results: List[dict] = []
    stats = FarmStats()
    t0 = time.time()

    def drain() -> None:
        for _, payload in obs_ring.poll_batch(max_records=2 * lanes):
            if record_kind(payload) == KIND_RESULT:
                (lane, _, seed, called_stop, collisions, steps, seen, dist,
                 shortest, path_len, tx, ty, t_radius,
                 feasible) = _RES_REC.unpack(payload)
                pending_results.append(dict(
                    lane=lane, seed=seed, called_stop=bool(called_stop),
                    collisions=collisions, steps=steps, seen=bool(seen),
                    dist=dist, shortest=shortest, path_len=path_len,
                    target=np.array([tx, ty], np.float32),
                    target_radius=t_radius, feasible=bool(feasible),
                ))
            else:
                o = unpack_obs(payload, h, w, rgb=want_rgb,
                               mask=perception is None, depth_u16=depth_u16,
                               rgb_half=rgb_half, depth_half=depth_half)
                # both dispatch programs (fused model stack / oracle_fused)
                # dequantize u16 depth on device — no host-side conversion
                li = lane_info[o["lane"]]
                if o["seed"] != li.seed:  # recycled: new episode on this lane
                    # stash the finished episode's taxonomy accumulators — its
                    # result record may still be waiting in pending_results
                    li.closed[li.seed] = (li.stairs, li.last_goal)
                    li.seed, li.needs_reset, li.detected = o["seed"], True, False
                    li.stairs, li.last_goal = TraveledStairs(), None
                li.step = o["step"]
                li.pending = o
                li.active = True  # a late recycled obs revives the lane

    def finalize_ready() -> None:
        # a result is final once the step that produced its last action has
        # been synced (detected flag complete); results always arrive after
        # that sync. The device state still holds the finished episode's
        # maps: a lane reset only happens at the NEXT dispatch, and finalize
        # runs before dispatch in every loop iteration. A result whose group
        # has an UN-synced inflight dispatch is deferred one iteration: the
        # seen-map readback below depends on that dispatch's output state
        # and would block the host mid-ping-pong.
        deferred = []
        while pending_results:
            r = pending_results.pop(0)
            lane = r["lane"]
            li = lane_info[lane]
            g = 0 if lane < half else 1
            j = lane - g * half
            if inflight[g] is not None:
                deferred.append(r)
                continue
            stairs, last_goal = li.closed.pop(r["seed"], (li.stairs, li.last_goal))
            detected = li.hist.get(r["seed"], False)
            # reference-form taxonomy inputs, identical to run_episode's
            # (episode_stats_logger.py:44-111 analogues). Slice the dilated
            # target window ON DEVICE: ~441 bytes over the tunnel instead of
            # the full 1.8 MB explored grid.
            r0, r1, c0, c1 = M.target_bbox_px(spec, r["target"])
            seen_map = bool(
                np.asarray(gstate[g].obstacle.explored[j, r0:r1, c0:c1]).any()
            )
            fp = None
            if detected and last_goal is not None:
                fp = M.was_false_positive(last_goal, r["target"], r["target_radius"])
            results[r["seed"]] = M.compute_result(
                called_stop=r["called_stop"],
                distance_to_goal=r["dist"],
                success_radius=env_cfg.success_radius,
                shortest_path=r["shortest"],
                path_length=r["path_len"],
                steps=r["steps"],
                max_steps=limit,
                target_detected=detected,
                target_seen=r["seen"] or seen_map,
                collisions=r["collisions"],
                false_positive=fp,
                traveled_stairs=stairs.traveled_stairs,
                feasible=r["feasible"],
            )
        pending_results.extend(deferred)

    def can_dispatch(g: int) -> bool:
        if inflight[g] is not None:
            return False
        lanes_g = [lane_info[i] for i in groups[g]]
        if not any(li.active for li in lanes_g):
            return False
        return all(li.pending is not None for li in lanes_g if li.active)

    def dispatch(g: int) -> None:
        idx = groups[g]
        meta = []
        if dlayout is not None:
            # packed transport: fill the group's preallocated buffer views
            # in place, ship ONE u8 buffer, get ONE packed result array —
            # one put + one readback round trip on latency-bound links
            v = gviews[g]
            depth_b, heading_b, xy_b = v["depth"], v["heading"], v["xy"]
            seeds_b, steps_b, reset_b = v["seeds"], v["steps"], v["reset"]
            seeds_b[:] = 0
            steps_b[:] = 0
            if fused is not None:
                rgb_b = v["rgb"]
            else:
                cos_b, bits_b, valid0_b = v["cos"], v["bits"], v["valid0"]
                cos_b[:] = 0.0
                bits_b[:] = 0
                valid0_b[:] = 0
        else:
            depth_b = np.empty((half, dh, dw),
                               np.uint16 if depth_u16 else np.float32)
            heading_b = np.empty((half,), np.float32)
            xy_b = np.empty((half, 2), np.float32)
            seeds_b = np.zeros((half,), np.int32)
            steps_b = np.zeros((half,), np.int32)
            reset_b = np.zeros((half,), bool)
            if fused is not None:
                rgb_b = np.empty((half, rh, rw, 3), np.uint8)
            else:
                cos_b = np.zeros((half, cfg.value_channels), np.float32)
                bits_b = np.zeros((half, (h * w + 7) // 8), np.uint8)
                valid0_b = np.zeros((half,), bool)
        for j, lane in enumerate(idx):
            li = lane_info[lane]
            o = li.pending if li.pending is not None else li.last
            if li.pending is not None:
                li.stairs.update(o.get("agent_z", 0.0))
                seeds_b[j], steps_b[j] = li.seed, li.step
            depth_b[j] = o["depth"]
            heading_b[j], xy_b[j] = o["heading"], o["robot_xy"]
            if fused is not None:
                rgb_b[j] = o["rgb"]
            else:
                cos_b[j] = o["cosine"]
                if o["target_visible"]:
                    bits_b[j] = np.packbits(o["target_mask"])
                    valid0_b[j] = True
            reset_b[j] = li.needs_reset
            meta.append((lane, li.seed, li.step, li.pending is not None))
            li.last = o
            li.needs_reset = False
            li.pending = None
        if dlayout is not None:
            t_p = time.time()
            buf_d = _put(gbufs[g])
            stats.t_put += time.time() - t_p
            stats.bytes_put += gbufs[g].nbytes
            if fused is not None:
                out, gstate[g] = fused(gstate[g], fresh, buf_d)
            else:
                out, gstate[g] = oracle_fused(gstate[g], fresh, buf_d)
            inflight[g] = (out, meta)
        elif fused is not None:
            t_p = time.time()
            depth_d, rgb_d = _put(depth_b), _put(rgb_b)
            stats.t_put += time.time() - t_p
            stats.bytes_put += depth_b.nbytes + rgb_b.nbytes
            actions, detected, goals, gstate[g] = fused(
                gstate[g], fresh, jnp.asarray(reset_b), depth_d,
                jnp.asarray(heading_b), jnp.asarray(xy_b), rgb_d,
                jnp.asarray(seeds_b), jnp.asarray(steps_b),
            )
            inflight[g] = (actions, detected, goals, meta)
        else:
            t_p = time.time()
            depth_d, bits_d = _put(depth_b), _put(bits_b)
            stats.t_put += time.time() - t_p
            stats.bytes_put += depth_b.nbytes + bits_b.nbytes
            actions, detected, goals, gstate[g] = oracle_fused(
                gstate[g], fresh, jnp.asarray(reset_b),
                depth_d, jnp.asarray(heading_b),
                jnp.asarray(xy_b), jnp.asarray(cos_b),
                bits_d, jnp.asarray(valid0_b),
                jnp.asarray(seeds_b), jnp.asarray(steps_b),
            )
            inflight[g] = (actions, detected, goals, meta)
        stats.dispatches += 1
        if inflight[1 - g] is not None:
            stats.overlapped += 1

    def sync(g: int) -> None:
        if dlayout is not None:
            out, meta = inflight[g]
            inflight[g] = None
            out_np = np.asarray(jax.device_get(out))
            actions_np = out_np[:, 0].astype(np.int32)
            detected_np = out_np[:, 1] > 0.5
            goals_np = out_np[:, 2:4]
        else:
            actions, detected, goals, meta = inflight[g]
            inflight[g] = None
            actions_np, detected_np, goals_np = (
                np.asarray(x) for x in jax.device_get((actions, detected, goals))
            )
        for j, (lane, seed, step, live) in enumerate(meta):
            if not live:
                continue
            li = lane_info[lane]
            li.detected = li.detected or bool(detected_np[j])
            li.hist[seed] = li.detected
            if seed == li.seed:  # not a stale pre-recycle sync
                li.last_goal = goals_np[j]
            act_ring.push(_ACT_REC.pack(lane, seed, step, int(actions_np[j])))
            stats.env_steps += 1

    import sys as _sys
    _debug = bool(os.environ.get("VLFM_FARM_DEBUG"))
    _last_dbg = time.time()
    try:
        idle_since = time.time()
        while len(results) < expected:
            if _debug and time.time() - _last_dbg > 5:
                _last_dbg = time.time()
                print(
                    f"[farm] results={len(results)}/{expected} "
                    f"pending={[li.pending is not None for li in lane_info]} "
                    f"active={[li.active for li in lane_info]} "
                    f"seeds={[li.seed for li in lane_info]} "
                    f"inflight={[x is not None for x in inflight]} "
                    f"dispatches={stats.dispatches} "
                    f"cursor={obs_ring._cursor.value} "
                    f"workers={[p.is_alive() for p in procs]}",
                    file=_sys.stderr, flush=True,
                )
            t_a = time.time()
            drain()
            finalize_ready()
            stats.t_drain += time.time() - t_a
            progressed = False
            for g in (0, 1):
                if can_dispatch(g):
                    t_a = time.time()
                    dispatch(g)
                    stats.t_dispatch += time.time() - t_a
                    inflight_order.append(g)
                    progressed = True
            # Sync policy: blocking on a group's readback before the OTHER
            # group has dispatched serializes the ping-pong (the round-3
            # streamed bench measured overlapped=0). Sync the oldest inflight
            # only once both groups are on the device; with a single group
            # inflight, wait for the other group's observations UNLESS it can
            # never dispatch again (all lanes finished) or its workers are
            # slow (grace window) — its obs arrive while this group computes.
            if inflight_order:
                g = inflight_order[0]
                other = 1 - g
                other_alive = any(li.active for li in (lane_info[i] for i in groups[other]))
                if (
                    len(inflight_order) == 2
                    or not other_alive
                    or time.time() - idle_since > 0.25
                ):
                    inflight_order.pop(0)
                    t_a = time.time()
                    sync(g)
                    stats.t_sync += time.time() - t_a
                    progressed = True
            if progressed:
                idle_since = time.time()
            else:
                stats.t_idle += 0.002
                # lanes whose worker drained its queue go inactive: their
                # episode result arrived and no fresh obs follows
                for li in lane_info:
                    if li.active and li.pending is None and li.seed in results:
                        li.active = False
                # 2 ms back-off: on a 1-core host the driver's poll spin
                # steals the CPU from the sim worker processes
                time.sleep(0.002)
                if time.time() - idle_since > 120.0:
                    raise RuntimeError(
                        f"sim farm stalled: {len(results)}/{expected} episodes"
                    )
        stats.wall_time = time.time() - t0
    finally:
        for p in procs:
            p.join(timeout=10.0)
            if p.is_alive():
                p.terminate()
        obs_ring.close()
        act_ring.close()
    return results, stats
