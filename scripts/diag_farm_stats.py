"""Run the measured streamed farm once with the bench's exact parameters and
print the FULL FarmStats accounting (incl. t_idle, which the bench does not
report) — to attribute the gap between wall time and the
(t_put+t_drain+t_dispatch+t_sync) sum. Round-5: streamed sits at 0.5 of its
transport ceiling; this says whether the residual is worker-CPU (env
rendering on the shared 1-core host), device wait, or loop overhead.
"""

import sys
import time

sys.path.insert(0, ".")

from bench import _enable_compile_cache, _policy_setup, production_models

_enable_compile_cache()


def main():
    from vlfm_tpu.config import VLFMConfig
    from vlfm_tpu.mapping.grid import GridSpec2D
    from vlfm_tpu.runner import fake_env as FE
    from vlfm_tpu.runner import sim_farm
    from vlfm_tpu.runner.full_stack import FullStackPerception

    lanes, workers, max_steps = 16, 2, 40
    cfg = VLFMConfig(sam_frame_capacity=max(2, lanes // 4))
    spec = GridSpec2D(size=1024, pixels_per_meter=20, pad=160)
    itm_model, detector, sam, _ = production_models()
    perception = FullStackPerception(cfg, itm=itm_model, detector=detector, sam=sam)
    pointnav, _ = _policy_setup(cfg, spec, lanes // 2)
    env_cfg = FE.EnvConfig(max_steps=max_steps)

    t0 = time.time()
    sim_farm.run_episodes_farm(
        list(range(lanes)), lanes=lanes, pointnav=pointnav, spec=spec, cfg=cfg,
        plan_name="two_room_plan", env_cfg=env_cfg, workers=workers,
        max_steps=2, ring_prefix="vlfm_diag_warm", perception=perception,
        depth_u16=True, rgb_half=True, depth_half=True,
    )
    print(f"warmup {time.time()-t0:.1f}s", flush=True)

    results, stats = sim_farm.run_episodes_farm(
        [100 + s for s in range(lanes)], lanes=lanes, pointnav=pointnav,
        spec=spec, cfg=cfg, plan_name="two_room_plan", env_cfg=env_cfg,
        workers=workers, ring_prefix="vlfm_diag_farm", perception=perception,
        depth_u16=True, rgb_half=True, depth_half=True,
    )
    print(f"steps/s {stats.steps_per_sec:.1f}  wall {stats.wall_time:.2f}s "
          f"steps {stats.env_steps} dispatches {stats.dispatches}")
    acct = stats.t_put + stats.t_drain + stats.t_dispatch + stats.t_sync
    print(f"t_put {stats.t_put:.2f}  t_drain {stats.t_drain:.2f}  "
          f"t_dispatch {stats.t_dispatch:.2f}  t_sync {stats.t_sync:.2f}  "
          f"t_idle {stats.t_idle:.2f}  accounted {acct:.2f}  "
          f"unaccounted {stats.wall_time - acct - stats.t_idle:.2f}")
    print(f"overlapped {stats.overlapped}/{stats.dispatches}  "
          f"bytes_put {stats.bytes_put/1e6:.1f} MB "
          f"({stats.bytes_put/1e6/stats.wall_time:.1f} MB/s)")


if __name__ == "__main__":
    main()
