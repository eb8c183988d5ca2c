"""Convert released checkpoints into a vlfm_tpu serving bundle.

Run ONCE on a machine that has the model files (this repo's runtime is
air-gapped); the output directory is the only serving artifact. Mirrors the
reference's weight acquisition (per-server downloads + torch hub pulls) as
one offline step.

    python scripts/convert_checkpoints.py --out bundle/ \
        --blip2-itm  /data/blip2-itm-vit-g/pytorch_model.bin \
        --owl-vit    /data/owlvit-base-patch32/pytorch_model.bin \
        --mobile-sam /data/mobile_sam.pt \
        --vocab      /data/bert-base-uncased/vocab.txt \
        [--f32]      # keep checkpoint f32 instead of bf16 serving cast

Inputs may be torch .bin/.pt (loaded via models/torch_import, no CUDA) or
.safetensors. Parity of every converter against the HF modules is pinned in
tests/test_blip2.py, test_owl_vit.py, test_sam.py, test_tinyvit.py.
"""

import argparse
import sys

sys.path.insert(0, ".")


def _load_sd(path: str):
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        return load_file(path)
    from vlfm_tpu.models.torch_import import load_torch_file

    return load_torch_file(path)


def main() -> None:
    import jax.numpy as jnp

    from vlfm_tpu.models.precision import cast_for_serving
    from vlfm_tpu.runner.weights import save_bundle

    p = argparse.ArgumentParser()
    p.add_argument("--out", required=True)
    p.add_argument("--blip2-itm", help="Salesforce/blip2-itm-vit-g state dict")
    p.add_argument("--owl-vit", help="google/owlvit-base-patch32 state dict")
    p.add_argument("--mobile-sam", help="mobile_sam.pt (TinyViT encoder)")
    p.add_argument("--grounding-dino", help="IDEA grounding-dino-tiny/base state dict")
    p.add_argument("--zoedepth", help="Intel/zoedepth-nyu(-kitti) state dict")
    p.add_argument("--blip2-t5", help="Salesforce/blip2-flan-t5-xl state dict (VQA veto)")
    p.add_argument("--vocab", help="BERT WordPiece vocab.txt")
    p.add_argument("--f32", action="store_true",
                   help="skip the bf16 serving cast (CPU parity work)")
    args = p.parse_args()

    dtype = None if args.f32 else jnp.bfloat16
    itm = detector = sam = None

    if args.blip2_itm:
        from vlfm_tpu.models.blip2_itm import (
            BLIP2ITM, BLIP2ITMConfig, convert_hf_state_dict)

        cfg = BLIP2ITMConfig()
        params = convert_hf_state_dict(_load_sd(args.blip2_itm), cfg)
        itm = BLIP2ITM(cfg, cast_for_serving(params, dtype) if dtype else params)
        print("converted BLIP2-ITM")
    if args.owl_vit:
        from vlfm_tpu.models.owl_vit import (
            OwlViTDetConfig, OwlViTDetector, convert_hf_owlvit)

        cfg = OwlViTDetConfig(
            compute_dtype=jnp.bfloat16 if dtype else jnp.float32
        )
        params = convert_hf_owlvit(_load_sd(args.owl_vit), cfg)
        detector = OwlViTDetector(
            cfg, cast_for_serving(params, dtype) if dtype else params
        )
        print("converted OWL-ViT")
    if args.mobile_sam:
        from vlfm_tpu.models.sam import SAM, SamConfig, convert_mobile_sam

        cfg = SamConfig.mobile_sam()
        params = convert_mobile_sam(_load_sd(args.mobile_sam), cfg)
        sam = SAM(cfg, cast_for_serving(params, dtype) if dtype else params)
        print("converted MobileSAM")

    gdino = zoe = vqa = None
    if args.grounding_dino:
        from vlfm_tpu.models.grounding_dino import (
            GroundingDinoDetector, GroundingDinoJaxConfig, convert_hf_grounding_dino)

        cfg = GroundingDinoJaxConfig()
        params = convert_hf_grounding_dino(_load_sd(args.grounding_dino), cfg)
        gdino = GroundingDinoDetector(
            cfg, cast_for_serving(params, dtype) if dtype else params
        )
        print("converted GroundingDINO")
    if args.zoedepth:
        from vlfm_tpu.models.zoedepth import (
            ZoeDepth, ZoeDepthJaxConfig, convert_hf_zoedepth)

        cfg = ZoeDepthJaxConfig()
        params = convert_hf_zoedepth(_load_sd(args.zoedepth), cfg)
        # depth regression is precision-sensitive; keep checkpoint f32
        zoe = ZoeDepth(cfg, params)
        print("converted ZoeDepth")
    if args.blip2_t5:
        from vlfm_tpu.models.blip2_vqa import BLIP2VQAConfig, load_blip2_vqa

        vqa = load_blip2_vqa(_load_sd(args.blip2_t5), BLIP2VQAConfig())
        if dtype:
            from vlfm_tpu.models.t5_vqa import T5VQA

            vqa.params = cast_for_serving(vqa.params, dtype)
            vqa.t5 = T5VQA(vqa.t5.cfg, cast_for_serving(vqa.t5.params, dtype))
        print("converted BLIP2-T5 VQA")

    out = save_bundle(
        args.out, itm=itm, detector=detector, sam=sam, gdino=gdino,
        zoedepth=zoe, vqa=vqa, vocab_file=args.vocab,
    )
    print("bundle saved:", out)


if __name__ == "__main__":
    main()
