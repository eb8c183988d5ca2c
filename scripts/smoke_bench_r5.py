"""Smoke the round-5 bench additions ON CHIP before the driver runs them
blind: (1) bench_vqa_veto at production size (flan-t5-xl + EVA ViT-g bridge
— watch for HBM pressure / compile failures), (2) the trained-pointnav farm
leg (BC fit on chip + farm with the network driving), (3) the headline
detection-density probe. Prints each leg's fields.
"""

import json
import sys
import time

sys.path.insert(0, ".")

from bench import _enable_compile_cache

_enable_compile_cache()

import jax
import jax.numpy as jnp


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"

    if which in ("all", "vqa"):
        from bench import bench_vqa_veto

        rgb = jax.random.randint(
            jax.random.PRNGKey(2), (32, 480, 640, 3), 0, 255, jnp.uint8
        )
        t0 = time.time()
        out = bench_vqa_veto(rgb, k=8)
        print("[vqa]", json.dumps(out), f"({time.time()-t0:.0f}s)", flush=True)

    if which in ("all", "density"):
        from bench import make_system

        sysd = make_system(32)
        perception_fn = sysd["perception"]
        density_fn = jax.jit(
            lambda ip, dp, sp, x: perception_fn(ip, dp, sp, x)[2].any(-1)
        )
        dens = jax.device_get(density_fn(*sysd["params3"], sysd["rgb"]))
        print("[density]", float(dens.mean()), flush=True)

    if which in ("all", "trained"):
        from vlfm_tpu.config import VLFMConfig
        from vlfm_tpu.mapping.grid import GridSpec2D
        from vlfm_tpu.runner import fake_env as FE
        from vlfm_tpu.runner import sim_farm
        from vlfm_tpu.runner.imitation import fit_pointnav_to_greedy

        cfg = VLFMConfig(sam_frame_capacity=4)
        spec = GridSpec2D(size=1024, pixels_per_meter=20, pad=160)
        t0 = time.time()
        trained, bc = fit_pointnav_to_greedy(
            depth_shape=tuple(cfg.depth_image_shape), episodes=16,
            train_steps=150, batch=8,
            env_cfg=FE.EnvConfig(max_steps=60), max_steps=40,
            transport="u16_half", seed=0,
        )
        print(f"[trained] bc={bc} train_s={time.time()-t0:.0f}", flush=True)
        lanes, workers = 16, 2
        tr_cfg = FE.EnvConfig(max_steps=120)
        sim_farm.run_episodes_farm(
            list(range(lanes)), lanes=lanes, pointnav=trained, spec=spec,
            cfg=cfg, plan_name="open_room_plan", env_cfg=tr_cfg, max_steps=2,
            workers=workers, ring_prefix="vlfm_smoke_trnw", depth_u16=True,
            depth_half=True,
        )
        res, stats = sim_farm.run_episodes_farm(
            [400 + s for s in range(lanes)], lanes=lanes, pointnav=trained,
            spec=spec, cfg=cfg, plan_name="open_room_plan", env_cfg=tr_cfg,
            workers=workers, ring_prefix="vlfm_smoke_trn", depth_u16=True,
            depth_half=True,
        )
        sr = sum(r.success for r in res.values()) / max(len(res), 1)
        print(f"[trained] farm success={sr:.3f} steps/s={stats.steps_per_sec:.1f}",
              flush=True)


if __name__ == "__main__":
    main()
