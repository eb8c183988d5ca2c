"""Closed-loop demo: `python -m vlfm_tpu.runner.demo [--episodes N] [--cpu]`.

Runs full ObjectNav episodes of the synthetic two-room environment through
the complete TPU-native stack (obstacle/value/object maps, frontier
selection, PointNav controller) and prints per-episode results + aggregates.
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--episodes", type=int, default=3)
    parser.add_argument("--max-steps", type=int, default=200)
    parser.add_argument("--cpu", action="store_true", help="force CPU devices")
    parser.add_argument("--plan", choices=["open", "two_room"], default="open")
    parser.add_argument("--image-height", type=int, default=240)
    parser.add_argument("--image-width", type=int, default=320)
    parser.add_argument(
        "--controller",
        choices=["neural", "greedy"],
        default="greedy",
        help="'neural' uses the PointNav net (random weights unless a "
        "checkpoint is converted); 'greedy' is the deterministic rho-theta "
        "controller",
    )
    parser.add_argument(
        "--save-dir",
        default=None,
        help="write per-episode obstacle/value map renders and a composed "
        "frame to this directory",
    )
    parser.add_argument(
        "--save-video",
        default=None,
        help="write a per-episode mp4 (egocentric view + live maps) to this "
        "directory",
    )
    args = parser.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_default_device", jax.devices("cpu")[0])

    from vlfm_tpu.config import CameraConfig, VLFMConfig
    from vlfm_tpu.mapping.grid import GridSpec2D
    from vlfm_tpu.models.pointnav import PointNavPolicy
    from vlfm_tpu.runner import metrics as M
    from vlfm_tpu.runner.episode_driver import run_episode
    from vlfm_tpu.runner.fake_env import (
        EnvConfig,
        FakeObjectNavEnv,
        open_room_plan,
        two_room_plan,
    )

    cfg = VLFMConfig(
        camera=CameraConfig(height=args.image_height, width=args.image_width)
    )
    spec = GridSpec2D(size=1024, pixels_per_meter=20, pad=160)
    if args.controller == "neural":
        pn = PointNavPolicy({}, discrete=True)
        params = pn.init_params(
            jax.random.PRNGKey(0), depth_shape=tuple(cfg.depth_image_shape)
        )
        pointnav = PointNavPolicy(params, discrete=True)
    else:
        pointnav = "greedy"

    env_cfg = EnvConfig(
        width=args.image_width, height=args.image_height, max_steps=args.max_steps
    )
    make_plan = open_room_plan if args.plan == "open" else two_room_plan

    results = []
    for ep in range(args.episodes):
        env = FakeObjectNavEnv(make_plan(seed=ep), env_cfg)
        import numpy as np

        from vlfm_tpu.utils import visualization as VIS
        from vlfm_tpu.utils.video import VideoCollector, write_video

        trail = []
        last = {}
        collector = VideoCollector() if args.save_video else None

        def render_maps(st, ds=4):
            from vlfm_tpu.mapping import object_map as OBJ

            obst = np.asarray(spec.crop_logical(st.obstacle.obstacles))[::ds, ::ds]
            nav = np.asarray(spec.crop_logical(st.obstacle.navigable))[::ds, ::ds]
            expl = np.asarray(spec.crop_logical(st.obstacle.explored))[::ds, ::ds]
            vals = np.asarray(spec.crop_logical(st.value.values))[::ds, ::ds]
            om = VIS.render_obstacle_map(obst, nav, expl)
            if bool(np.asarray(OBJ.has_object(st.objmap))):
                # detected-object cloud painted onto the map
                # (habitat_visualizer.py:228-253 role)
                pts, mask = OBJ.get_target_cloud(st.objmap)
                VIS.paint_target_cloud(
                    om, spec, np.asarray(pts)[np.asarray(mask), :2], downsample=ds
                )
            return [om, VIS.render_value_map(vals.max(axis=-1), spec)]

        def on_step(env_, o, info, st, _trail=trail, _last=last):
            _trail.append(np.array([env_.x, env_.y]))
            _last["obs"] = o
            _last["yaw"] = env_.yaw
            if collector is not None:
                collector.collect(o["rgb"], o["depth"], render_maps(st))

        result, stats = run_episode(
            env, pointnav, spec, cfg, seed=ep,
            on_step=on_step if (args.save_dir or args.save_video) else None,
            keep_state=bool(args.save_dir),
        )
        if collector is not None:
            import os

            os.makedirs(args.save_video, exist_ok=True)
            path = write_video(
                collector.flush(result.failure_cause),
                f"{args.save_video}/ep{ep}.mp4",
            )
            print(f"wrote {path}")
        if args.save_dir:
            import os

            import cv2

            from vlfm_tpu.utils import visualization as VIS

            os.makedirs(args.save_dir, exist_ok=True)
            st = stats.final_state
            traj = VIS.TrajectoryVisualizer(spec)
            om = VIS.render_obstacle_map(
                np.asarray(spec.crop_logical(st.obstacle.obstacles)),
                np.asarray(spec.crop_logical(st.obstacle.navigable)),
                np.asarray(spec.crop_logical(st.obstacle.explored)),
                np.asarray(spec.xy_to_px(st.obstacle.frontiers_xy))[
                    np.asarray(st.obstacle.frontiers_valid)
                ],
                traj=traj, positions=trail, yaw=last.get("yaw", 0.0),
            )
            vm = VIS.render_value_map(
                np.asarray(spec.crop_logical(st.value.values))[..., 0],
                spec, traj=traj, positions=trail, yaw=last.get("yaw", 0.0),
            )
            cv2.imwrite(f"{args.save_dir}/ep{ep}_obstacle_map.png", om)
            cv2.imwrite(f"{args.save_dir}/ep{ep}_value_map.png", vm)
            o = last["obs"]
            frame = VIS.compose_frame(
                o["rgb"][..., ::-1].copy(), o["depth"],
                [om, vm],
                texts=[f"episode {ep} | success={result.success} spl={result.spl:.2f}"],
            )
            cv2.imwrite(f"{args.save_dir}/ep{ep}_frame.png", frame)
        results.append(result)
        print(
            f"episode {ep}: success={result.success} spl={result.spl:.3f} "
            f"steps={result.steps} dist={result.distance_to_goal:.2f} "
            f"cause={result.failure_cause} "
            f"({stats.steps_per_sec:.2f} steps/s)"
        )
    print(json.dumps(M.aggregate(results), indent=2))


if __name__ == "__main__":
    main()
