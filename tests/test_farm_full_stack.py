"""Full-stack farm: live envs + REAL model architectures + streamed
observations as ONE system (VERDICT round-2 item #1). RGB frames cross the
shm ring, the driver runs the batched perception stack (BLIP2-ITM + OWL-ViT
+ SAM) per group dispatch, and every episode's results must be identical to
the single-episode full-stack driver's — scheduling and transport must not
change decisions.

Reference traffic being reproduced: itm_policy.py:191-211 +
base_objectnav_policy.py:311-321 driven by vlfm_trainer.py:164-325.
"""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from vlfm_tpu.config import CameraConfig, VLFMConfig  # noqa: E402
from vlfm_tpu.mapping.grid import GridSpec2D  # noqa: E402
from vlfm_tpu.runner import sim_farm  # noqa: E402
from vlfm_tpu.runner.fake_env import EnvConfig, FakeObjectNavEnv, open_room_plan  # noqa: E402
from vlfm_tpu.runner.full_stack import FullStackPerception, run_full_stack_episode  # noqa: E402
from vlfm_tpu.runner.obsring import ObservationRing  # noqa: E402

CFG = VLFMConfig(camera=CameraConfig(height=48, width=64),
                 max_frontiers=16, max_frontier_cells=256,
                 object_map_slots=8, object_map_points_per_slot=128,
                 max_detections_per_frame=4)
SPEC = GridSpec2D(size=512, pixels_per_meter=20, pad=160)
ENV = EnvConfig(width=64, height=48, max_steps=24)

needs_native = pytest.mark.skipif(
    not ObservationRing.available(), reason="native obsring unavailable"
)


def test_obs_record_roundtrip_with_rgb():
    env = FakeObjectNavEnv(open_room_plan(seed=3), ENV)
    o = env.reset()
    rec = sim_farm.pack_obs(lane=1, seed=3, step=0, o=o, rgb=True)
    assert len(rec) <= sim_farm.obs_slot_bytes(ENV.height, ENV.width, rgb=True)
    back = sim_farm.unpack_obs(rec, ENV.height, ENV.width, rgb=True)
    np.testing.assert_array_equal(back["rgb"], o["rgb"])
    np.testing.assert_array_equal(back["depth"], np.asarray(o["depth"], np.float32))
    # the rgb-less record format is unchanged
    rec0 = sim_farm.pack_obs(lane=1, seed=3, step=0, o=o)
    assert len(rec0) == len(rec) - 3 * ENV.height * ENV.width


@needs_native
def test_farm_full_stack_matches_single_episode():
    seeds = [0, 1, 2]
    perception = FullStackPerception(CFG)  # tiny random-weight real stack
    farm, stats = sim_farm.run_episodes_farm(
        seeds, lanes=2, pointnav="greedy", spec=SPEC, cfg=CFG,
        plan_name="open_room_plan", env_cfg=ENV, workers=2,
        ring_prefix="vlfm_test_farm_fs", perception=perception,
    )
    assert set(farm) == set(seeds)
    assert stats.env_steps == sum(r.steps for r in farm.values())

    for s in seeds:
        env = FakeObjectNavEnv(open_room_plan(seed=s), ENV)
        single, _ = run_full_stack_episode(
            env, SPEC, CFG, pointnav="greedy", perception=perception, seed=s
        )
        a, b = farm[s], single
        assert a.success == b.success, f"seed {s}: success diverged"
        assert a.steps == b.steps, f"seed {s}: step count diverged"
        assert abs(a.spl - b.spl) < 1e-6, f"seed {s}: spl diverged"
        assert a.target_detected == b.target_detected, f"seed {s}"
        assert a.target_seen == b.target_seen, f"seed {s}"
        assert a.failure_cause == b.failure_cause, f"seed {s}: taxonomy diverged"


@needs_native
def test_farm_full_stack_compressed_transport():
    """Compressed transport (2x2-averaged rgb AND depth on the worker, u16
    depth) runs the full-stack farm end to end — the bench's streamed
    serving configuration. Decisions may drift within the pinned bounds
    (tests/test_sim_farm.py::test_rgb_half_drift_bound /
    test_depth_half_drift_bound) — the exact-transport configuration above
    stays the equality-pinned default."""
    seeds = [0, 1]
    perception = FullStackPerception(CFG)
    farm, stats = sim_farm.run_episodes_farm(
        seeds, lanes=2, pointnav="greedy", spec=SPEC, cfg=CFG,
        plan_name="open_room_plan", env_cfg=ENV, workers=2,
        ring_prefix="vlfm_test_farm_rgbh", perception=perception,
        depth_u16=True, rgb_half=True, depth_half=True,
    )
    assert set(farm) == set(seeds)
    assert stats.env_steps == sum(r.steps for r in farm.values())
    assert all(r.steps > 0 for r in farm.values())
    assert stats.bytes_put > 0 and stats.t_put > 0.0


@needs_native
def test_farm_beyond_capacity_sam_burst_changes_no_action():
    """Density-adaptive gated SAM at episode level (VERDICT r4 task #2):
    FullStackPerception's default det_threshold of 0.0 makes every lane
    detect every step — a sustained beyond-capacity detection burst at
    sam_frame_capacity=1 over 2 lanes (ceil(2/1)=2 SAM passes per dispatch).
    The multi-pass gated path must change NO decision vs the ungated
    pipeline: identical steps, success, SPL, and taxonomy per episode."""
    import dataclasses

    seeds = [0, 1, 2]
    cfg_gated = dataclasses.replace(CFG, sam_frame_capacity=1)
    # same seeds -> identical random weights in both perceptions
    p_gated = FullStackPerception(cfg_gated)
    p_plain = FullStackPerception(CFG)
    farm_g, _ = sim_farm.run_episodes_farm(
        seeds, lanes=2, pointnav="greedy", spec=SPEC, cfg=cfg_gated,
        plan_name="open_room_plan", env_cfg=ENV, workers=2,
        ring_prefix="vlfm_test_farm_sgate", perception=p_gated,
    )
    farm_p, _ = sim_farm.run_episodes_farm(
        seeds, lanes=2, pointnav="greedy", spec=SPEC, cfg=CFG,
        plan_name="open_room_plan", env_cfg=ENV, workers=2,
        ring_prefix="vlfm_test_farm_splain", perception=p_plain,
    )
    assert set(farm_g) == set(farm_p) == set(seeds)
    for s in seeds:
        a, b = farm_g[s], farm_p[s]
        assert a.steps == b.steps, f"seed {s}: gated SAM changed the trajectory"
        assert a.success == b.success, f"seed {s}: success diverged"
        assert abs(a.spl - b.spl) < 1e-6, f"seed {s}: spl diverged"
        assert a.target_detected == b.target_detected, f"seed {s}"
        assert a.failure_cause == b.failure_cause, f"seed {s}: taxonomy diverged"


@needs_native
def test_farm_full_stack_vqa_fused_matches_single():
    """VQA-veto configuration at fused-dispatch speed (round-3 VERDICT item
    #5): the farm's ONE-program dispatch threads the T5 + BLIP2-bridge params
    (FullStackPerception.make_fused_step) and must reproduce the unfused
    single-episode driver's decisions exactly — the veto
    (base_objectnav_policy.py:326-335) included."""
    import dataclasses

    cfg = dataclasses.replace(CFG, use_vqa=True)
    seeds = [0, 2]
    perception = FullStackPerception(cfg)  # tiny random-weight stack + VQA
    farm, stats = sim_farm.run_episodes_farm(
        seeds, lanes=2, pointnav="greedy", spec=SPEC, cfg=cfg,
        plan_name="open_room_plan", env_cfg=ENV, workers=2,
        ring_prefix="vlfm_test_farm_vqa", perception=perception,
    )
    assert set(farm) == set(seeds)

    for s in seeds:
        env = FakeObjectNavEnv(open_room_plan(seed=s), ENV)
        single, _ = run_full_stack_episode(
            env, SPEC, cfg, pointnav="greedy", perception=perception, seed=s
        )
        a, b = farm[s], single
        assert a.success == b.success, f"seed {s}: success diverged"
        assert a.steps == b.steps, f"seed {s}: step count diverged"
        assert a.target_detected == b.target_detected, f"seed {s}"
        assert a.failure_cause == b.failure_cause, f"seed {s}: taxonomy diverged"
