"""Run the instrumented streamed farm and print the phase breakdown.

The dispatch-equivalent device path measures 412 ms (scripts/diag_streamed.py)
but the farm measured 4.9 s/dispatch — this isolates where the farm loop
spends the difference (drain / dispatch / sync / idle).
"""

import sys
import time

sys.path.insert(0, ".")

from bench import _enable_compile_cache, _policy_setup, _sync, production_models

_enable_compile_cache()

import numpy as np

from vlfm_tpu.config import VLFMConfig
from vlfm_tpu.mapping.grid import GridSpec2D
from vlfm_tpu.runner import fake_env as FE
from vlfm_tpu.runner import sim_farm
from vlfm_tpu.runner.full_stack import FullStackPerception


def main():
    lanes, workers, max_steps = 16, 2, 30
    cfg = VLFMConfig(sam_frame_capacity=max(2, lanes // 4))
    spec = GridSpec2D(size=1024, pixels_per_meter=20, pad=160)
    itm_model, detector, sam, _ = production_models()
    perception = FullStackPerception(cfg, itm=itm_model, detector=detector, sam=sam)
    pointnav, _ = _policy_setup(cfg, spec, lanes // 2)
    env_cfg = FE.EnvConfig(max_steps=max_steps)

    # warm compile: a tiny farm run compiles the fused dispatch program
    t0 = time.time()
    sim_farm.run_episodes_farm(
        list(range(lanes)), lanes=lanes, pointnav=pointnav, spec=spec, cfg=cfg,
        plan_name="two_room_plan", env_cfg=env_cfg, workers=workers,
        max_steps=2, ring_prefix="vlfm_diag_warm", perception=perception,
    )
    print(f"warmup farm {time.time()-t0:.1f}s", flush=True)

    t0 = time.time()
    results, stats = sim_farm.run_episodes_farm(
        list(range(lanes)), lanes=lanes, pointnav=pointnav, spec=spec, cfg=cfg,
        plan_name="two_room_plan", env_cfg=env_cfg, workers=workers,
        max_steps=max_steps, ring_prefix="vlfm_diag_farm", perception=perception,
    )
    print(f"farm wall {time.time()-t0:.1f}s", flush=True)
    print(
        f"steps={stats.env_steps} dispatches={stats.dispatches} "
        f"steps/s={stats.steps_per_sec:.2f} overlapped={stats.overlapped}"
    )
    print(
        f"phases: drain={stats.t_drain:.1f}s dispatch={stats.t_dispatch:.1f}s "
        f"sync={stats.t_sync:.1f}s idle={stats.t_idle:.1f}s "
        f"(sum {stats.t_drain+stats.t_dispatch+stats.t_sync+stats.t_idle:.1f} "
        f"vs wall {stats.wall_time:.1f})"
    )
    per = stats.dispatches or 1
    print(
        f"per-dispatch: drain={1e3*stats.t_drain/per:.0f}ms "
        f"dispatch={1e3*stats.t_dispatch/per:.0f}ms sync={1e3*stats.t_sync/per:.0f}ms"
    )


if __name__ == "__main__":
    main()
