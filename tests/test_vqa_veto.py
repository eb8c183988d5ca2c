"""VQA veto, COCO-detector routing, and monocular-depth trigger wiring.

Parity targets:
- VQA veto: base_objectnav_policy.py:326-335 (question formatting, contour
  annotation, answer-starts-with-yes test).
- COCO routing + miss retry: base_objectnav_policy.py:221-241.
- all-ones-depth -> infer depth: base_objectnav_policy.py:314-318.
"""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
import jax  # noqa: E402

from vlfm_tpu.config import VLFMConfig  # noqa: E402
from vlfm_tpu.models.monodepth import MonocularDepth  # noqa: E402
from vlfm_tpu.models.t5_vqa import T5Config, T5VQA  # noqa: E402
from vlfm_tpu.parallel.detection_pipeline import VQAVeto  # noqa: E402
from vlfm_tpu.runner.full_stack import FullStackPerception, _toy_image_prefix  # noqa: E402


def _tokenizer_encode(text):
    ids = np.array([(3 + (ord(c) % 90)) for c in text[:8]] + [1], np.int32)[:8]
    pad = np.zeros(8, np.int32)
    pad[: len(ids)] = ids
    mask = pad != 0
    return jnp.asarray(pad), jnp.asarray(mask)


def _veto(yes_token_id):
    vqa = T5VQA.init_random(T5Config.tiny(), seed=0)
    return VQAVeto(
        vqa=vqa,
        encode_text=_tokenizer_encode,
        yes_token_id=yes_token_id,
        image_prefix=_toy_image_prefix(vqa.cfg.d_model),
    ), vqa


class TestQuestionFormatting:
    def test_matches_reference_construction(self):
        # base_objectnav_policy.py:329-332: "a " inserted unless the phrase
        # ends with "ing"; prompt default "Is this " (config use_vqa fields)
        veto, _ = _veto(0)
        assert veto.question_for("toilet") == "Question: Is this a toilet? Answer:"
        assert veto.question_for("sitting") == "Question: Is this sitting? Answer:"

    def test_custom_prompt(self):
        veto, _ = _veto(0)
        veto.vqa_prompt = "Would you say this is "
        assert veto.question_for("bed") == "Question: Would you say this is a bed? Answer:"


class TestVetoMechanics:
    def test_yes_keeps_no_drops(self):
        rng = np.random.default_rng(0)
        rgb = rng.integers(0, 255, (1, 32, 40, 3), np.uint8)
        masks = np.zeros((1, 2, 32, 40), bool)
        masks[0, 0, 8:20, 10:25] = True
        valid = np.array([[True, False]])

        veto, vqa = _veto(yes_token_id=0)
        # discover what the random-weight model actually answers, then pin
        # yes_token_id to it (and to something else) to test both branches
        ring_rgb = jnp.asarray(rgb)
        ids, m = _tokenizer_encode(veto.question_for("toilet"))
        out = veto(ring_rgb, jnp.asarray(masks), jnp.asarray(valid), "toilet")
        first_tok_kept = bool(np.asarray(out)[0, 0])

        # now force the opposite decision
        gen = vqa.generate(
            ids[None], m[None],
            prefix=veto.image_prefix(jnp.zeros((1, 32, 40, 3), jnp.uint8)),
        )
        answered = int(np.asarray(gen)[0, 0])
        veto_yes = VQAVeto(vqa=vqa, encode_text=_tokenizer_encode,
                           yes_token_id=answered,
                           image_prefix=veto.image_prefix)
        veto_no = VQAVeto(vqa=vqa, encode_text=_tokenizer_encode,
                          yes_token_id=answered + 1,
                          image_prefix=veto.image_prefix)
        # note: the annotated image differs from the zero image above, so only
        # assert the mechanics on a blank mask (annotation = original image)
        blank_masks = jnp.zeros((1, 2, 32, 40), bool)
        blank_valid = jnp.asarray([[True, True]])
        kept = veto_yes(jnp.zeros((1, 32, 40, 3), jnp.uint8), blank_masks, blank_valid, "toilet")
        dropped = veto_no(jnp.zeros((1, 32, 40, 3), jnp.uint8), blank_masks, blank_valid, "toilet")
        assert bool(np.asarray(kept).all())
        assert not bool(np.asarray(dropped).any())
        assert isinstance(first_tok_kept, bool)  # ran end-to-end on real masks

    def test_invalid_stays_invalid(self):
        veto, _ = _veto(yes_token_id=0)
        rgb = jnp.zeros((1, 16, 16, 3), jnp.uint8)
        masks = jnp.zeros((1, 2, 16, 16), bool)
        valid = jnp.zeros((1, 2), bool)
        out = veto(rgb, masks, valid, "toilet")
        assert not bool(np.asarray(out).any())


class TestFullStackWiring:
    def test_use_vqa_runs_and_only_narrows(self):
        cfg = VLFMConfig(use_vqa=True)
        p_vqa = FullStackPerception(cfg)
        p_plain = FullStackPerception(VLFMConfig(use_vqa=False))
        rng = np.random.default_rng(1)
        rgb = rng.integers(0, 255, (48, 64, 3), np.uint8)
        _, _, valid_vqa, _ = p_vqa(rgb, "toilet", None)
        _, _, valid_plain, _ = p_plain(rgb, "toilet", None)
        assert not np.any(valid_vqa & ~valid_plain), "veto must only narrow"

    def test_coco_target_routes_through_coco_detector(self):
        cfg = VLFMConfig()
        p = FullStackPerception(cfg)
        calls = {"coco": 0}
        orig = p.pipeline.coco_detector.predict

        def spy(rgb):
            calls["coco"] += 1
            return orig(rgb)

        p.pipeline.coco_detector.predict = spy
        rgb = np.zeros((48, 64, 3), np.uint8)
        p(rgb, "toilet", None)     # toilet IS a COCO class
        assert calls["coco"] == 1
        p(rgb, "gazebo", None)     # not a COCO class
        assert calls["coco"] == 1

    def test_monodepth_triggers_on_all_ones(self):
        cfg = VLFMConfig()
        p = FullStackPerception(cfg, monodepth=MonocularDepth.init_random(),
                                det_threshold=-1e9)  # force detections valid
        rng = np.random.default_rng(2)
        rgb = rng.integers(0, 255, (48, 64, 3), np.uint8)
        ones = np.ones((48, 64), np.float32)
        _, _, valid, obj_depth = p(rgb, "toilet", ones)
        assert valid.any(), "need a valid detection for the trigger"
        assert obj_depth.shape == ones.shape
        assert not np.all(obj_depth == 1.0), "depth was not inferred"

        normal = rng.uniform(0, 1, (48, 64)).astype(np.float32)
        _, _, _, obj_depth2 = p(rgb, "toilet", normal)
        assert obj_depth2 is normal, "sensor depth must pass through untouched"


class TestGatedVeto:
    def test_slot_capacity_matches_dense_on_valid(self):
        """Detection-compacted veto (VERDICT r4 #7): with slot_capacity below
        the valid-detection count, the multi-pass gated path must agree with
        the dense path on every VALID slot at any capacity — the analogue of
        the reference's one-VQA-call-per-detection loop. Invalid slots are
        False either way (valid & yes)."""
        rng = np.random.default_rng(1)
        b, k = 3, 2
        rgb = jnp.asarray(rng.integers(0, 255, (b, 32, 40, 3), np.uint8))
        masks = np.zeros((b, k, 32, 40), bool)
        masks[:, :, 8:20, 10:25] = True
        valid = jnp.asarray(
            np.array([[1, 0], [1, 1], [0, 1]], bool)
        )  # 4 valid slots of 6

        veto, vqa = _veto(yes_token_id=0)
        dense = veto(rgb, jnp.asarray(masks), valid, "toilet")
        for cap in (1, 2, 3, 6, 8):
            gated = VQAVeto(
                vqa=vqa, encode_text=_tokenizer_encode, yes_token_id=0,
                image_prefix=veto.image_prefix, slot_capacity=cap,
            )(rgb, jnp.asarray(masks), valid, "toilet")
            np.testing.assert_array_equal(
                np.asarray(gated), np.asarray(dense), err_msg=f"cap={cap}"
            )
