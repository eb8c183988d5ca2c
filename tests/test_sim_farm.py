"""Async sim farm: shm-ring-fed worker processes must reproduce the
synchronous drivers' results exactly (scheduling independence), and the
driver must actually overlap device dispatches.

Replaces the reference's VectorEnv + HTTP/lockfile concurrency
(vlfm/utils/vlfm_trainer.py:99-105, vlfm/vlm/server_wrapper.py:88-119).
"""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from vlfm_tpu.config import CameraConfig, VLFMConfig  # noqa: E402
from vlfm_tpu.mapping.grid import GridSpec2D  # noqa: E402
from vlfm_tpu.runner.episode_driver import run_episodes_recycled  # noqa: E402
from vlfm_tpu.runner.fake_env import EnvConfig, FakeObjectNavEnv, open_room_plan  # noqa: E402
from vlfm_tpu.runner.obsring import ObservationRing  # noqa: E402
from vlfm_tpu.runner import sim_farm  # noqa: E402

CFG = VLFMConfig(camera=CameraConfig(height=96, width=128),
                 max_frontiers=16, max_frontier_cells=256,
                 object_map_slots=8, object_map_points_per_slot=128)
SPEC = GridSpec2D(size=512, pixels_per_meter=20, pad=160)
ENV = EnvConfig(width=128, height=96, max_steps=48)

needs_native = pytest.mark.skipif(
    not ObservationRing.available(), reason="native obsring unavailable"
)


def test_obs_record_roundtrip():
    env = FakeObjectNavEnv(open_room_plan(seed=3), ENV)
    o = env.reset()
    rec = sim_farm.pack_obs(lane=5, seed=3, step=0, o=o)
    assert len(rec) <= sim_farm.obs_slot_bytes(ENV.height, ENV.width)
    back = sim_farm.unpack_obs(rec, ENV.height, ENV.width)
    assert back["lane"] == 5 and back["seed"] == 3 and back["step"] == 0
    np.testing.assert_array_equal(back["depth"], np.asarray(o["depth"], np.float32))
    np.testing.assert_array_equal(back["target_mask"], np.asarray(o["target_mask"], bool))
    assert back["target_visible"] == o["target_visible"]
    assert abs(back["cosine"] - o["cosine"]) < 1e-7
    assert abs(back["agent_z"] - o["agent_z"]) < 1e-7
    np.testing.assert_allclose(back["robot_xy"], o["robot_xy"], rtol=0, atol=0)


@needs_native
def test_farm_matches_recycled_driver():
    seeds = [0, 1, 2, 3, 4, 5]
    farm, stats = sim_farm.run_episodes_farm(
        seeds, lanes=2, pointnav="greedy", spec=SPEC, cfg=CFG,
        plan_name="open_room_plan", env_cfg=ENV, workers=2,
        ring_prefix="vlfm_test_farm",
    )
    assert set(farm) == set(seeds)
    assert stats.env_steps == sum(r.steps for r in farm.values())

    recycled, _ = run_episodes_recycled(
        lambda s: FakeObjectNavEnv(open_room_plan(seed=s), ENV),
        seeds, lanes=2, pointnav="greedy", spec=SPEC, cfg=CFG,
    )
    for s in seeds:
        a, b = farm[s], recycled[s]
        assert a.success == b.success, f"seed {s}: success diverged"
        assert a.steps == b.steps, f"seed {s}: step count diverged"
        assert abs(a.spl - b.spl) < 1e-6, f"seed {s}: spl diverged"
        assert a.target_detected == b.target_detected, f"seed {s}"
        assert a.target_seen == b.target_seen, f"seed {s}"
        assert a.failure_cause == b.failure_cause, f"seed {s}: taxonomy diverged"


@needs_native
def test_farm_taxonomy_matches_run_episode_on_stairs():
    """The full reference taxonomy under the farm: TraveledStairs (agent_z
    over the ring), map-based was_target_seen (driver-side explored map),
    nav-goal false-positive test — byte-identical failure_cause to
    run_episode on the hidden-stairs plan (VERDICT round-2 item #8)."""
    from vlfm_tpu.runner.episode_driver import run_episode
    from vlfm_tpu.runner.fake_env import hidden_stairs_plan

    seeds = [0, 1, 2, 3]
    farm, _ = sim_farm.run_episodes_farm(
        seeds, lanes=2, pointnav="greedy", spec=SPEC, cfg=CFG,
        plan_name="hidden_stairs_plan", env_cfg=ENV, workers=2,
        ring_prefix="vlfm_test_farm_stairs",
    )
    for s in seeds:
        single, _ = run_episode(
            FakeObjectNavEnv(hidden_stairs_plan(seed=s), ENV),
            "greedy", SPEC, CFG, seed=s,
        )
        assert farm[s].failure_cause == single.failure_cause, (
            f"seed {s}: {farm[s].failure_cause} != {single.failure_cause}"
        )
        assert farm[s].success == single.success
    # the stairs branch must actually fire — agent_z crossed the ring and
    # the driver-side TraveledStairs accumulated it
    causes = {farm[s].failure_cause for s in seeds}
    assert any(c and "traveled_stairs" in c for c in causes), causes


@needs_native
def test_farm_overlaps_groups():
    """With two groups and two workers the driver should issue at least one
    dispatch while the other group is still in flight."""
    seeds = list(range(4))
    _, stats = sim_farm.run_episodes_farm(
        seeds, lanes=4, pointnav="greedy", spec=SPEC, cfg=CFG,
        plan_name="open_room_plan", env_cfg=ENV, workers=2,
        ring_prefix="vlfm_test_farm2",
    )
    assert stats.dispatches > 0
    assert stats.overlapped > 0


@needs_native
def test_farm_more_workers_than_lanes():
    """Leftover episode seeds must land only on workers that own lanes —
    routing them to never-spawned lane-less workers stalled the farm."""
    seeds = [0, 1, 2, 3, 4, 5]
    farm, _ = sim_farm.run_episodes_farm(
        seeds, lanes=2, pointnav="greedy", spec=SPEC, cfg=CFG,
        plan_name="open_room_plan", env_cfg=ENV, workers=4,
        ring_prefix="vlfm_test_farm_wl",
    )
    assert set(farm) == set(seeds)


def test_obs_record_roundtrip_depth_u16():
    env = FakeObjectNavEnv(open_room_plan(seed=3), ENV)
    o = env.reset()
    rec = sim_farm.pack_obs(lane=1, seed=3, step=0, o=o, depth_u16=True)
    assert len(rec) <= sim_farm.obs_slot_bytes(ENV.height, ENV.width, depth_u16=True)
    assert (
        sim_farm.obs_slot_bytes(ENV.height, ENV.width, depth_u16=True)
        < sim_farm.obs_slot_bytes(ENV.height, ENV.width)
    )
    back = sim_farm.unpack_obs(rec, ENV.height, ENV.width, depth_u16=True)
    assert back["depth"].dtype == np.uint16
    deq = back["depth"].astype(np.float32) / 65535.0
    err = np.abs(deq - np.asarray(o["depth"], np.float32)).max()
    assert err <= 0.5 / 65535.0 + 1e-7, err


@needs_native
def test_farm_depth_u16_runs_episodes():
    """Quantized transport completes episodes with the oracle policy path
    (the exact-f32 configuration stays the parity-pinned default)."""
    farm, stats = sim_farm.run_episodes_farm(
        list(range(4)), lanes=4, pointnav="greedy", spec=SPEC, cfg=CFG,
        plan_name="open_room_plan", env_cfg=ENV, workers=2,
        ring_prefix="u16farm", depth_u16=True,
    )
    assert len(farm) == 4
    assert stats.env_steps > 0
    assert all(r.steps > 0 for r in farm.values())


def test_obs_record_roundtrip_rgb_half():
    """2x2-averaged rgb transport: exact box-average payload, 4x fewer rgb
    bytes. The reference's own transport is lossy JPEG-q90 per request
    (vlfm/vlm/server_wrapper.py:57-68); parity suites keep full-res."""
    env = FakeObjectNavEnv(open_room_plan(seed=3), ENV)
    o = env.reset()
    rec = sim_farm.pack_obs(lane=1, seed=3, step=0, o=o, rgb=True, rgb_half=True)
    nb = sim_farm.obs_slot_bytes(ENV.height, ENV.width, rgb=True, rgb_half=True)
    assert len(rec) <= nb
    full = sim_farm.obs_slot_bytes(ENV.height, ENV.width, rgb=True)
    assert full - nb == 3 * ENV.height * ENV.width - 3 * (ENV.height // 2) * (ENV.width // 2)
    back = sim_farm.unpack_obs(rec, ENV.height, ENV.width, rgb=True, rgb_half=True)
    assert back["rgb"].shape == (ENV.height // 2, ENV.width // 2, 3)
    img = np.asarray(o["rgb"], np.uint16)
    h2, w2 = ENV.height // 2, ENV.width // 2
    expect = ((img.reshape(h2, 2, w2, 2, 3).sum(axis=(1, 3)) + 2) >> 2).astype(np.uint8)
    np.testing.assert_array_equal(back["rgb"], expect)
    # depth is untouched (full res, exact f32)
    np.testing.assert_array_equal(back["depth"], np.asarray(o["depth"], np.float32))


def test_rgb_half_drift_bound():
    """Model-input drift bound: every consumer resamples rgb to its own
    resolution (ITM 224, OWL 768, SAM 1024), so the half-res source only
    perturbs the anti-aliased resample. Pin the perturbation on real fake-env
    frames at the model seam."""
    from vlfm_tpu.ops.resize import resize_matmul

    worst = 0.0
    for seed in range(3):
        env = FakeObjectNavEnv(open_room_plan(seed=seed), ENV)
        o = env.reset()
        img = np.asarray(o["rgb"], np.uint16)
        h2, w2 = ENV.height // 2, ENV.width // 2
        half = ((img.reshape(h2, 2, w2, 2, 3).sum(axis=(1, 3)) + 2) >> 2).astype(np.uint8)
        a = np.asarray(resize_matmul(jnp.asarray(o["rgb"], jnp.float32) / 255.0, 224, 224, "cubic"))
        b = np.asarray(resize_matmul(jnp.asarray(half, jnp.float32) / 255.0, 224, 224, "cubic"))
        worst = max(worst, float(np.abs(a - b).mean()))
    assert worst < 0.02, worst  # mean drift under ~2% of dynamic range


def test_cv2_area_matches_numpy():
    """The cv2.INTER_AREA fast path used by pack_obs must be bit-identical to
    the numpy 2x2 box-average formulas (u8 rgb round-half-up; f32 depth exact
    mean) — the transport format may not depend on which backend packed it."""
    cv2 = pytest.importorskip("cv2")
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (ENV.height, ENV.width, 3), np.uint8)
    h2, w2 = ENV.height // 2, ENV.width // 2
    want = ((img.astype(np.uint16).reshape(h2, 2, w2, 2, 3).sum(axis=(1, 3)) + 2)
            >> 2).astype(np.uint8)
    got = cv2.resize(img, (w2, h2), interpolation=cv2.INTER_AREA)
    np.testing.assert_array_equal(got, want)
    d = rng.random((ENV.height, ENV.width), np.float32)
    want_d = d.reshape(h2, 2, w2, 2).mean(axis=(1, 3), dtype=np.float32)
    got_d = cv2.resize(d, (w2, h2), interpolation=cv2.INTER_AREA)
    np.testing.assert_array_equal(got_d, want_d)
    # and the pack_obs helpers route through the same math
    np.testing.assert_array_equal(sim_farm._avg2x2_u8(img), want)
    np.testing.assert_array_equal(sim_farm._avg2x2_f32(d), want_d)


def test_obs_record_roundtrip_depth_half():
    """Half-res depth transport (VERDICT r4 #1a): depth crosses the ring as a
    2x2 box average (optionally u16-quantized); the device program upsamples
    it back. Full-res u16 depth was 70% of per-step bytes."""
    env = FakeObjectNavEnv(open_room_plan(seed=3), ENV)
    o = env.reset()
    rec = sim_farm.pack_obs(lane=1, seed=3, step=0, o=o, depth_u16=True,
                            depth_half=True)
    nb = sim_farm.obs_slot_bytes(ENV.height, ENV.width, depth_u16=True,
                                 depth_half=True)
    assert len(rec) <= nb
    full = sim_farm.obs_slot_bytes(ENV.height, ENV.width, depth_u16=True)
    assert full - nb == 2 * (ENV.height * ENV.width
                             - (ENV.height // 2) * (ENV.width // 2))
    back = sim_farm.unpack_obs(rec, ENV.height, ENV.width, depth_u16=True,
                               depth_half=True)
    assert back["depth"].shape == (ENV.height // 2, ENV.width // 2)
    assert back["depth"].dtype == np.uint16
    d = np.asarray(o["depth"], np.float32)
    h2, w2 = ENV.height // 2, ENV.width // 2
    want = d.reshape(h2, 2, w2, 2).mean(axis=(1, 3), dtype=np.float32)
    deq = back["depth"].astype(np.float32) / 65535.0
    assert np.abs(deq - want).max() <= 0.5 / 65535.0 + 1e-6


def test_depth_half_drift_bound():
    """Decision-seam drift bound for depth_half: build the obstacle map from
    full-res depth vs the transported (2x2-avg, u16, bilinear-2x-upsampled)
    depth on real fake-env frames and bound the differing obstacle/navigable
    cells. The map consumes depth through cone splats at ~5 cm cells, so the
    half-res source perturbs only cells near depth edges."""
    import jax

    from vlfm_tpu.mapping import obstacle_map as OM
    from vlfm_tpu.ops.resize import resize_bilinear_hw
    from vlfm_tpu.utils.geometry import xyz_yaw_to_tf_matrix

    cam = CFG.camera
    worst_frac = 0.0
    for seed in range(2):
        env = FakeObjectNavEnv(open_room_plan(seed=seed), ENV)
        o = env.reset()
        d = jnp.asarray(np.asarray(o["depth"], np.float32))
        h2, w2 = ENV.height // 2, ENV.width // 2
        half = np.asarray(o["depth"], np.float32).reshape(h2, 2, w2, 2).mean(
            axis=(1, 3), dtype=np.float32
        )
        q = (np.clip(half, 0, 1) * 65535.0 + 0.5).astype(np.uint16)
        d_rec = resize_bilinear_hw(
            jnp.asarray(q.astype(np.float32) / 65535.0), ENV.height, ENV.width
        )
        tf = xyz_yaw_to_tf_matrix(
            jnp.asarray([o["robot_xy"][0], o["robot_xy"][1], cam.camera_height]),
            jnp.asarray(o["heading"]),
        )
        maps = []
        for dd in (d, d_rec):
            st = OM.create(SPEC, max_frontiers=16)
            st = OM.update(
                st, SPEC, dd, tf, cam.min_depth, cam.max_depth,
                cam.fx, cam.fy, cam.hfov,
                min_height=CFG.min_obstacle_height,
                max_height=CFG.max_obstacle_height,
                area_thresh_m2=CFG.obstacle_map_area_threshold,
                max_frontier_cells=256, max_frontiers=16,
            )
            maps.append(st)
        a, b = maps
        for name in ("obstacles", "navigable", "explored"):
            ga, gb = np.asarray(getattr(a, name)), np.asarray(getattr(b, name))
            denom = max(ga.sum() + gb.sum(), 1)
            frac = float((ga != gb).sum() / denom)
            worst_frac = max(worst_frac, frac)
    assert worst_frac < 0.08, worst_frac  # <8% of touched cells flip


@needs_native
def test_farm_depth_half_runs_episodes():
    """Half-res depth transport completes oracle episodes end to end (the
    exact-f32 full-res configuration stays the parity-pinned default)."""
    farm, stats = sim_farm.run_episodes_farm(
        list(range(4)), lanes=4, pointnav="greedy", spec=SPEC, cfg=CFG,
        plan_name="open_room_plan", env_cfg=ENV, workers=2,
        ring_prefix="dhalffarm", depth_u16=True, depth_half=True,
    )
    assert len(farm) == 4
    assert stats.env_steps > 0
    assert stats.bytes_put > 0 and stats.t_put > 0.0
    assert all(r.steps > 0 for r in farm.values())


@needs_native
def test_packed_transport_bit_identical():
    """The single-buffer dispatch transport (runner/packing.py: one u8 put,
    one f32 readback, on-device bitcast unpack) must reproduce the unpacked
    transport's episode results EXACTLY — same success/steps/spl/taxonomy —
    under the production flags (u16 half-res depth)."""
    seeds = [0, 1, 2, 3, 4, 5]
    kw = dict(
        lanes=2, pointnav="greedy", spec=SPEC, cfg=CFG,
        plan_name="open_room_plan", env_cfg=ENV, workers=2,
        depth_u16=True, depth_half=True,
    )
    packed, _ = sim_farm.run_episodes_farm(
        seeds, ring_prefix="vlfm_test_pk1", packed=True, **kw
    )
    unpacked, _ = sim_farm.run_episodes_farm(
        seeds, ring_prefix="vlfm_test_pk0", packed=False, **kw
    )
    assert set(packed) == set(seeds) == set(unpacked)
    for s in seeds:
        a, b = packed[s], unpacked[s]
        assert a.success == b.success, f"seed {s}: success diverged"
        assert a.steps == b.steps, f"seed {s}: step count diverged"
        assert abs(a.spl - b.spl) < 1e-9, f"seed {s}: spl diverged"
        assert a.target_detected == b.target_detected, f"seed {s}"
        assert a.failure_cause == b.failure_cause, f"seed {s}: taxonomy"


def test_packing_roundtrip_all_dtypes():
    """Host pack_views -> device unpack_device is bit-exact per field."""
    import jax

    from vlfm_tpu.runner.packing import build_layout, pack_views, unpack_device

    layout = build_layout([
        ("depth", "uint16", (3, 4, 5)),
        ("rgb", "uint8", (3, 2, 2, 3)),
        ("heading", "float32", (3,)),
        ("xy", "float32", (3, 2)),
        ("seeds", "int32", (3,)),
        ("reset", "uint8", (3,)),
    ])
    buf = np.zeros(layout.total, np.uint8)
    v = pack_views(buf, layout)
    rng = np.random.default_rng(0)
    v["depth"][:] = rng.integers(0, 65535, v["depth"].shape, dtype=np.uint16)
    v["rgb"][:] = rng.integers(0, 255, v["rgb"].shape, dtype=np.uint8)
    v["heading"][:] = rng.normal(size=v["heading"].shape).astype(np.float32)
    v["xy"][:] = rng.normal(size=v["xy"].shape).astype(np.float32)
    v["seeds"][:] = rng.integers(-2**31, 2**31 - 1, v["seeds"].shape,
                                 dtype=np.int32)
    v["reset"][:] = rng.integers(0, 2, v["reset"].shape, dtype=np.uint8)

    out = jax.jit(lambda b: unpack_device(layout, b))(jnp.asarray(buf))
    for name, host in v.items():
        got = np.asarray(out[name])
        assert got.dtype == host.dtype and got.shape == host.shape, name
        assert np.array_equal(got, host), f"{name} not bit-exact"
