"""Op-level on-chip profile of one perception model.

Usage:  python scripts/op_profile.py {system|blip2|owl|sam|tinyvit|tinyvit_fast} [--batch N]

Captures a jax.profiler trace of the steady-state batched forward and prints
the top self-time ops (via tensorboard_plugin_profile's trace conversion) —
the tool for finding which stage of a model eats the time on the chip.
"""

from __future__ import annotations

import glob
import gzip
import json
import sys
import tempfile


def top_ops_from_trace(logdir: str, k: int = 30):
    """Parse the raw xplane.pb capture; aggregate device-plane op durations
    by (fused-op) name. tensorboard_plugin_profile's converter is broken in
    this image, so read the XSpace proto directly."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xspaces = glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True)
    if not xspaces:
        raise RuntimeError(f"no xplane.pb under {logdir}")
    by_name = {}
    for path in xspaces:
        space = xplane_pb2.XSpace()
        with open(path, "rb") as f:
            space.ParseFromString(f.read())
        for plane in space.planes:
            # device planes only: '/device:TPU:0' or 'TPU:0 (pid ..)' style;
            # skip host threads and stats-only planes
            nm = plane.name
            if "TPU" not in nm and "device" not in nm.lower():
                continue
            if "step" in nm.lower():
                continue
            emeta = plane.event_metadata
            for line in plane.lines:
                # 'XLA Ops' is the synchronous per-op lane; 'Async XLA Ops'
                # spans overlap compute (DMA prefetch) and double-count.
                if line.name != "XLA Ops":
                    continue
                for ev in line.events:
                    md = emeta.get(ev.metadata_id)
                    name = md.name if md is not None else "?"
                    slot = by_name.setdefault(name, [0.0, 0])
                    slot[0] += ev.duration_ps / 1e6  # ps -> us
                    slot[1] += 1
    rows = sorted(by_name.items(), key=lambda kv: -kv[1][0])[:k]
    total = sum(v[0] for v in by_name.values())
    out = []
    for name, (dur, cnt) in rows:
        out.append({"op": name[:110], "ms": round(dur / 1e3, 3), "count": cnt,
                    "pct": round(100 * dur / max(total, 1e-9), 1)})
    return out


def main() -> None:
    which = sys.argv[1] if len(sys.argv) > 1 else "sam"
    batch = 8
    for i, a in enumerate(sys.argv):
        if a == "--batch":
            batch = int(sys.argv[i + 1])

    sys.path.insert(0, ".")
    import bench

    bench._enable_compile_cache()
    import jax

    sys.path.insert(0, "scripts")
    import profile_models as PM

    # build the target callable (compiled + warmed) without timing prints
    import jax.numpy as jnp

    if which == "system":
        sysd = bench.make_system(batch)
        step = sysd["system_step"]
        params3, bstate, rgb = sysd["params3"], sysd["bstate"], sysd["rgb"]

        def fn():
            bs2, acts = step(*params3, bstate, rgb, jnp.int32(1),
                             jax.random.PRNGKey(7))
            return acts
    elif which in ("tinyvit", "tinyvit_fast"):
        from vlfm_tpu.models.tinyvit import TinyViT, TinyViTConfig

        tv = TinyViTConfig(compute_dtype=jnp.bfloat16)
        enc = TinyViT(tv)
        ep = PM.fast_params(enc.init, jnp.zeros((1, tv.img_size, tv.img_size, 3)))
        imgs = jax.random.uniform(
            jax.random.PRNGKey(0), (batch, tv.img_size, tv.img_size, 3))
        if which == "tinyvit_fast":
            from vlfm_tpu.models.tinyvit_fast import encode_fused

            g = jax.jit(lambda p, i: encode_fused(p, i, tv, interpret=False))
        else:
            g = jax.jit(lambda p, i: enc.apply({"params": p}, i))
        fn = lambda: g(ep, imgs)
    elif which == "sam":
        from vlfm_tpu.models.sam import SAM, SamConfig

        cfg = SamConfig.mobile_sam()
        m = SAM(cfg, None)
        s = cfg.vision.image_size
        m.params = PM.fast_params(m.module.init, jnp.zeros((1, s, s, 3)), jnp.zeros((1, 1, 4)))
        imgs = jax.random.uniform(jax.random.PRNGKey(0), (batch, s, s, 3))
        boxes = jnp.tile(jnp.asarray([[[0.2, 0.2, 0.8, 0.8]]]), (batch, 10, 1))
        fn = lambda: m.segment_boxes(imgs, boxes)[0]
    elif which == "blip2":
        from vlfm_tpu.models.blip2_itm import BLIP2ITM, BLIP2ITMConfig

        cfg = BLIP2ITMConfig()
        m = BLIP2ITM(cfg, None)
        s = cfg.vit.image_size
        m.params = PM.fast_params(
            m.module.init, jnp.zeros((1, s, s, 3)),
            jnp.zeros((1, 4), jnp.int32), jnp.ones((1, 4), bool))
        text = m.encode_texts(jnp.ones((1, 16), jnp.int32), jnp.ones((1, 16), bool))
        rgb = jax.random.randint(jax.random.PRNGKey(0), (batch, 480, 640, 3), 0, 255, jnp.uint8)
        fn = lambda: m.cosine_cached_text(m.preprocess(rgb), text)
    elif which == "gdino":
        import numpy as np

        from vlfm_tpu.models.grounding_dino import (
            GroundingDinoDetector,
            GroundingDinoJaxConfig,
            text_phrase_masks,
        )

        cfg = GroundingDinoJaxConfig()
        m = GroundingDinoDetector(cfg, None)
        ids = np.full((1, 12), 5, np.int64)
        ids[:, 0], ids[:, -1] = 101, 102
        m3, pos = text_phrase_masks(ids)
        m.params = PM.fast_params(
            m.module.init,
            jnp.zeros((1, 800, 800, 3)),
            jnp.asarray(ids, jnp.int32), jnp.asarray(m3),
            jnp.asarray(pos, jnp.int32), jnp.zeros((1, 12), bool))
        imgs = jax.random.uniform(jax.random.PRNGKey(0), (batch, 800, 800, 3))
        ids_b = np.tile(ids, (batch, 1))
        am = np.ones((batch, 12), bool)
        fn = lambda: m.predict(imgs, ids_b, am)[0]
    elif which == "owl":
        from vlfm_tpu.models.owl_vit import OwlViTDetConfig, OwlViTDetector

        cfg = OwlViTDetConfig(compute_dtype=jnp.bfloat16)
        m = OwlViTDetector(cfg, None)
        s = cfg.vision.image_size
        m.params = PM.fast_params(
            m.module.init, jnp.zeros((1, s, s, 3)),
            jnp.zeros((1, 4), jnp.int32), jnp.ones((1, 4), bool))
        qids = jnp.ones((1, 8), jnp.int32)
        qmask = jnp.ones((1, 8), bool)
        rgb = jax.random.randint(jax.random.PRNGKey(0), (batch, 480, 640, 3), 0, 255, jnp.uint8)
        fn = lambda: m.detect(m.preprocess(rgb), qids, qmask)[1]
    else:
        raise SystemExit(f"unknown target {which}")

    PM._sync(fn())  # compile + warm
    with tempfile.TemporaryDirectory() as logdir:
        with jax.profiler.trace(logdir):
            PM._sync(fn())
        rows = top_ops_from_trace(logdir)
    print(json.dumps({"target": which, "batch": batch}))
    for r in rows:
        print(json.dumps(r))


if __name__ == "__main__":
    main()
