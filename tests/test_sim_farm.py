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
