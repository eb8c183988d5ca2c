"""Main entry point: `python -m vlfm_tpu.run [--config cfg.yaml] ...`.

Parity target: vlfm/run.py (the hydra entry). Configuration is plain
dataclasses + YAML (vlfm_tpu.config.load_config); the eval harness is the
episode driver. Backends:

- ``--backend synthetic`` (default): the built-in FakeObjectNavEnv — runs
  everywhere, used for CI and benchmarking.
- ``--backend habitat``: requires habitat-lab installed; builds a habitat env
  and drives it through HabitatVLFMAgent.
- ``--backend reality``: requires the Spot SDK; drives ObjectNavEnv.
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--config", default=None, help="YAML/JSON VLFMConfig file")
    p.add_argument("--backend", choices=["synthetic", "habitat", "reality"], default="synthetic")
    p.add_argument("--episodes", type=int, default=10)
    p.add_argument("--max-steps", type=int, default=500)
    p.add_argument(
        "--version", choices=["v1", "v2", "v3", "fbe"], default="v2",
        help="policy variant; 'fbe' is the OracleFBE nearest-frontier baseline",
    )
    p.add_argument("--controller", choices=["neural", "greedy"], default="greedy")
    p.add_argument(
        "--farm", type=int, default=0, metavar="LANES",
        help="synthetic backend: run LANES episode lanes fed by sim worker "
        "processes over the native shm ring (runner/sim_farm.py)",
    )
    p.add_argument("--farm-workers", type=int, default=2)
    p.add_argument("--pointnav-weights", default=None, help="torch .pth to convert")
    p.add_argument(
        "--weights-dir", default=None,
        help="serving bundle from scripts/convert_checkpoints.py (real "
        "BLIP2-ITM/OWL-ViT/MobileSAM weights + vocab); default is tiny "
        "random models",
    )
    p.add_argument(
        "--habitat-config", default=None,
        help="habitat backend: habitat-lab config path (defaults to the "
        "benchmark ObjectNav HM3D config)",
    )
    p.add_argument("--video-dir", default=None)
    p.add_argument("--log-dir", default=None)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_default_device", jax.devices("cpu")[0])

    from vlfm_tpu.config import VLFMConfig, load_config
    from vlfm_tpu.mapping.grid import GridSpec2D
    from vlfm_tpu.runner import log_saver, metrics

    cfg = load_config(args.config) if args.config else VLFMConfig()
    spec = GridSpec2D(cfg.map_size, cfg.pixels_per_meter, cfg.map_pad)

    if args.controller == "neural":
        from vlfm_tpu.models.pointnav import PointNavPolicy
        from vlfm_tpu.models.torch_import import convert_torch_state_dict, load_torch_file

        if args.pointnav_weights:
            params = convert_torch_state_dict(
                load_torch_file(args.pointnav_weights), discrete=True
            )
        else:
            pn = PointNavPolicy({}, discrete=True)
            params = pn.init_params(jax.random.PRNGKey(0), depth_shape=tuple(cfg.depth_image_shape))
        pointnav = PointNavPolicy(params, discrete=True)
    else:
        pointnav = "greedy"

    if args.backend == "habitat":
        # The eval loop itself is habitat-free (runner/habitat_eval.py,
        # fully covered by tests over FakeHabitatEnv); only the env
        # construction needs habitat-lab and fails at `import habitat`.
        from vlfm_tpu.adapters.habitat import HabitatVLFMAgent
        from vlfm_tpu.runner.habitat_eval import evaluate, make_habitat_env

        if args.weights_dir:
            from vlfm_tpu.runner.weights import full_stack_from_bundle

            perception = full_stack_from_bundle(cfg, args.weights_dir)
        else:
            from vlfm_tpu.runner.full_stack import FullStackPerception

            perception = FullStackPerception(cfg)
        agent = HabitatVLFMAgent(
            cfg, spec, pointnav, perception, version=args.version
        )
        # One habitat.Env for the whole run; advance() moves it to the next
        # episode so the loop can claim by episode id before reset.
        holder: list = [None]

        def factory(i):
            if holder[0] is None:
                holder[0] = make_habitat_env(args.habitat_config)
            return holder[0].advance()

        results = evaluate(
            factory,
            agent,
            args.episodes,
            log_dir=args.log_dir,
            video_dir=args.video_dir,
        )
        print(json.dumps(metrics.aggregate(results), indent=2))
        return
    if args.backend == "reality":
        raise SystemExit(
            "reality backend requires the Boston Dynamics SDK; construct "
            "vlfm_tpu.reality.envs.ObjectNavEnv with a BDSWRobot (see "
            "vlfm_tpu/reality/) — FakeRobot works for dry runs"
        )

    from vlfm_tpu.runner.episode_driver import run_episode
    from vlfm_tpu.runner.fake_env import EnvConfig, FakeObjectNavEnv, two_room_plan

    env_cfg = EnvConfig(
        width=cfg.camera.width, height=cfg.camera.height, max_steps=args.max_steps
    )
    if args.farm:
        from vlfm_tpu.runner.sim_farm import run_episodes_farm

        perception = None
        if args.weights_dir:
            # real model stack over streamed synthetic RGBD — the full
            # serving configuration from the CLI
            from vlfm_tpu.runner.weights import full_stack_from_bundle

            perception = full_stack_from_bundle(cfg, args.weights_dir)
        results_map, stats = run_episodes_farm(
            list(range(args.episodes)), lanes=args.farm, pointnav=pointnav,
            spec=spec, cfg=cfg, plan_name="two_room_plan", env_cfg=env_cfg,
            workers=args.farm_workers, version=args.version,
            max_steps=args.max_steps, perception=perception,
        )
        results = [results_map[s] for s in sorted(results_map)]
        print(
            f"farm: {stats.env_steps} env steps in {stats.wall_time:.1f}s "
            f"({stats.steps_per_sec:.2f} steps/s, "
            f"{stats.overlapped}/{stats.dispatches} overlapped dispatches)"
        )
        print(json.dumps(metrics.aggregate(results), indent=2))
        return
    results = []
    for ep in range(args.episodes):
        if args.log_dir and not log_saver.claim_episode(ep, "two_room", args.log_dir):
            continue
        env = FakeObjectNavEnv(two_room_plan(seed=ep), env_cfg)
        result, stats = run_episode(
            env, pointnav, spec, cfg, seed=ep, version=args.version
        )
        results.append(result)
        if args.log_dir:
            log_saver.log_episode(
                ep, "two_room", {**result.to_dict(), "target_object": "cylinder"}, args.log_dir
            )
        print(
            f"episode {ep}: success={result.success} spl={result.spl:.3f} "
            f"steps={result.steps} ({stats.steps_per_sec:.2f} steps/s)"
        )
    print(json.dumps(metrics.aggregate(results), indent=2))


if __name__ == "__main__":
    main()
