import json

import jax.numpy as jnp
import numpy as np
import pytest

from vlfm_tpu.mapping import frontier_map as FM
from vlfm_tpu.mapping.grid import GridSpec2D
from vlfm_tpu.models import detections as DET
from vlfm_tpu.models.coco_classes import COCO_CLASSES, is_coco_target
from vlfm_tpu.policy.action_replay import ActionReplayPolicy, ActionRecorder, repeat_elements
from vlfm_tpu.runner import analyze_logs, log_saver
from vlfm_tpu.utils import visualization as VIS


class TestDetections:
    def _dets(self):
        d = DET.empty(4)
        return d._replace(
            boxes=jnp.array([[0.1, 0.1, 0.5, 0.5]] * 4),
            scores=jnp.array([0.9, 0.3, 0.6, 0.0]),
            class_ids=jnp.array([0, 1, 0, -1], jnp.int32),
            valid=jnp.array([True, True, True, False]),
        )

    def test_filters(self):
        d = self._dets()
        d = DET.filter_by_class(d, jnp.array([0]))
        assert int(DET.num_detections(d)) == 2
        d = DET.filter_by_conf(d, 0.7)
        assert int(DET.num_detections(d)) == 1

    def test_json_roundtrip(self):
        vocab = DET.DetectionVocab(["chair", "toilet"])
        d = self._dets()
        payload = DET.to_json(d, vocab)
        assert payload["phrases"] == ["chair", "toilet", "chair"]
        back = DET.from_json(payload, vocab, capacity=4)
        assert int(DET.num_detections(back)) == 3
        assert np.asarray(back.class_ids)[:3].tolist() == [0, 1, 0]

    def test_coco_routing(self):
        assert is_coco_target("toilet")
        assert is_coco_target("table|dining table|toilet")
        assert not is_coco_target("fireplace")
        assert len(COCO_CLASSES) == 80


class TestFrontierMapV1:
    def test_cache_evict_insert(self):
        s = FM.create(8)
        f1 = jnp.array([[1.0, 0.0], [2.0, 0.0], [0.0, 0.0]])
        v1 = jnp.array([True, True, False])
        assert bool(FM.needs_encoding(s, f1, v1))
        s = FM.update(s, f1, v1, jnp.float32(0.7))
        assert int(s.valid.sum()) == 2
        assert not bool(FM.needs_encoding(s, f1, v1))
        # one frontier persists, one replaced -> new cosine only on the new one
        f2 = jnp.array([[1.0, 0.0], [3.0, 0.0], [0.0, 0.0]])
        v2 = jnp.array([True, True, False])
        assert bool(FM.needs_encoding(s, f2, v2))
        s = FM.update(s, f2, v2, jnp.float32(0.2))
        pts, vals, valid = FM.sort_waypoints(s)
        kept = np.asarray(pts)[np.asarray(valid)]
        assert sorted(kept[:, 0].tolist()) == [1.0, 3.0]
        best = np.asarray(pts)[0]
        assert best.tolist() == [1.0, 0.0]  # old cosine 0.7 beats new 0.2


class TestLogSaver:
    def test_claim_log_resume(self, tmp_path):
        d = str(tmp_path)
        assert log_saver.claim_episode(3, "sceneA", d)
        assert not log_saver.claim_episode(3, "sceneA", d)  # claimed
        log_saver.log_episode(3, "sceneA", {"success": True, "spl": 0.5}, d)
        assert log_saver.is_evaluated(3, "sceneA", d)
        assert not log_saver.is_evaluated(4, "sceneA", d)

    def test_analyze(self, tmp_path):
        d = str(tmp_path)
        log_saver.log_episode(1, "s", {"success": True, "spl": 1.0, "soft_spl": 1.0, "target_object": "toilet"}, d)
        log_saver.log_episode(2, "s", {"success": False, "spl": 0.0, "soft_spl": 0.2, "failure_cause": "false_negative", "target_object": "bed"}, d)
        agg = analyze_logs.summarize(analyze_logs.load_logs(d))
        assert agg["episodes"] == 2
        assert agg["success_rate"] == 0.5
        assert agg["failure_causes"] == {"false_negative": 1}
        assert agg["per_category_failure_rate"]["bed"] == 1.0


class TestActionReplay:
    def test_roundtrip_and_requantize(self, tmp_path):
        rec = ActionRecorder(str(tmp_path))
        for a in [2, 2, 1, 1, 0]:
            rec.record(a)
        path = rec.flush("ep0")
        pol = ActionReplayPolicy(path, turn_factor=2, step_factor=1)
        assert pol.actions == [2, 2, 2, 2, 1, 1, 0]
        played = [pol.act() for _ in range(9)]
        assert played == [2, 2, 2, 2, 1, 1, 0, 0, 0]
        assert repeat_elements([2, 0], 3) == [2, 2, 2, 0]


class TestVisualization:
    def test_renderers(self):
        spec = GridSpec2D(size=128, pad=0)
        vals = np.zeros((128, 128), np.float32)
        vals[60:70, 60:70] = 0.8
        img = VIS.render_value_map(vals, spec)
        assert img.shape == (128, 128, 3)
        assert (img[0, 0] == 255).all()  # unseen stays white
        assert not (img[65, 65] == 255).all()

        obst = np.zeros((128, 128), bool); obst[10:20, 10:20] = True
        nav = ~obst
        expl = np.zeros((128, 128), bool); expl[40:80, 40:80] = True
        m = VIS.render_obstacle_map(obst, nav, expl, np.array([[64.0, 64.0]]))
        assert (m[15, 15] == 0).all()
        assert m[50, 50].tolist() == [200, 255, 200]

        frame = VIS.compose_frame(
            np.zeros((48, 64, 3), np.uint8),
            np.ones((48, 64), np.float32) * 0.5,
            [img, m],
            texts=["target: toilet"],
        )
        assert frame.ndim == 3 and frame.shape[1] >= 64 + 64

    def test_banner_wraps(self):
        img = VIS.text_banner("a long sentence that must wrap " * 5, 200)
        assert img.shape[1] == 200 and img.shape[0] > 40


class TestValueMapIO:
    def test_record_replay_exact(self, tmp_path):
        import jax

        from vlfm_tpu.mapping import value_map as VM
        from vlfm_tpu.mapping.value_map_io import ValueMapRecorder, replay
        from vlfm_tpu.utils.geometry import xyz_yaw_to_tf_matrix

        spec = GridSpec2D(size=256, pixels_per_meter=20, pad=160)
        rec = ValueMapRecorder(str(tmp_path), kwargs={"value_channels": 1})
        state = VM.create(spec, 1)
        rng = np.random.default_rng(0)
        for k in range(3):
            depth = rng.uniform(0.2, 1.0, (48, 64)).astype(np.float32)
            tf = xyz_yaw_to_tf_matrix(jnp.array([0.0, 0.0, 0.88]), jnp.float32(k * 0.5))
            vals = jnp.array([0.3 + 0.1 * k])
            rec.record(vals, depth, tf, 0.5, 5.0, 1.38)
            state = VM.update(state, spec, vals, jnp.asarray(depth), tf, 0.5, 5.0, 1.38)
        replayed = replay(str(tmp_path), spec=spec)
        assert np.allclose(np.asarray(replayed.conf), np.asarray(state.conf), atol=2e-4)
        assert np.allclose(np.asarray(replayed.values), np.asarray(state.values), atol=2e-4)


def test_overlay_frame_and_scalar_extraction():
    import numpy as np

    from vlfm_tpu.runner.metrics import extract_scalars_from_info
    from vlfm_tpu.utils.visualization import flatten_dict, overlay_frame

    info = {"success": 1.0, "spl": 0.52, "nested": {"distance_to_goal": 0.3},
            "scene": "apt0", "skip_list": [1, 2], "arr": np.zeros(3)}
    flat = flatten_dict(info)
    assert flat["nested.distance_to_goal"] == 0.3 and "scene" in flat

    scalars = extract_scalars_from_info(info)
    assert scalars == {"success": 1.0, "spl": 0.52,
                       "nested.distance_to_goal": 0.3}

    frame = np.full((120, 240, 3), 255, np.uint8)
    out = overlay_frame(frame, info, additional=["target: toilet"])
    assert out.shape == frame.shape
    assert (out != 255).any()  # something was drawn
    assert (frame == 255).all()  # input not mutated
