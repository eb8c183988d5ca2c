"""Production weight bundles: convert once on a data host, serve anywhere.

The reference's weight story is per-server download scripts plus torch hub
pulls at process start (e.g. vlfm/vlm/grounding_dino.py loads from a local
.pth; reality_policies.py:40-42 torch-hubs ZoeDepth). Here the serving
artifact is ONE directory:

    bundle/
      manifest.json      # model configs (dataclass trees) + bundle dtype
      itm/               # orbax tree, our BLIP2ITM param layout
      detector/          # orbax tree, OwlViTDetector layout
      sam/               # orbax tree, SAM (TinyViT/MobileSAM) layout
      vocab.txt          # BERT WordPiece vocab (optional)

produced by ``scripts/convert_checkpoints.py`` (HF state dicts -> our
converters -> ``cast_for_serving`` -> orbax), and consumed by
``load_bundle`` / ``run.py --weights-dir`` with no torch and no network.

Configs round-trip through the manifest as dataclass field dicts, so a
bundle rebuilt on any machine constructs the exact module tree it was
saved from (tiny test configs included — the round-trip test serves a
bundle end-to-end through FullStackPerception).
"""

from __future__ import annotations

import dataclasses
import json
import os
from pathlib import Path
from types import SimpleNamespace
from typing import Any, Dict, Optional

_DTYPES = {"bfloat16": "bfloat16", "float32": "float32", "float16": "float16"}


def _cfg_to_dict(cfg: Any) -> Any:
    if isinstance(cfg, (bool, int, float, str)) or cfg is None:
        return cfg
    if dataclasses.is_dataclass(cfg):
        out = {"__class__": type(cfg).__name__}
        for f in dataclasses.fields(cfg):
            out[f.name] = _cfg_to_dict(getattr(cfg, f.name))
        return out
    if isinstance(cfg, (tuple, list)):
        return [_cfg_to_dict(v) for v in cfg]
    # dtype-valued fields (compute_dtype etc.)
    import numpy as np

    name = np.dtype(cfg).name  # raises for anything unserializable: loud > lossy
    assert name in _DTYPES, f"unsupported dtype field {name}"
    return {"__dtype__": name}


def _cfg_from_dict(d: Any, registry: Dict[str, type]) -> Any:
    import jax.numpy as jnp

    if isinstance(d, dict) and "__dtype__" in d:
        return {"bfloat16": jnp.bfloat16, "float32": jnp.float32,
                "float16": jnp.float16}[d["__dtype__"]]
    if isinstance(d, dict) and "__class__" in d:
        cls = registry[d["__class__"]]
        kwargs = {
            k: _cfg_from_dict(v, registry)
            for k, v in d.items()
            if k != "__class__"
        }
        # tuples-of-tuples fields (e.g. Swin depths) arrive as lists
        for f in dataclasses.fields(cls):
            if f.name in kwargs and isinstance(kwargs[f.name], list):
                kwargs[f.name] = tuple(
                    tuple(v) if isinstance(v, list) else v for v in kwargs[f.name]
                )
        return cls(**kwargs)
    if isinstance(d, list):
        return [_cfg_from_dict(v, registry) for v in d]
    return d


def _config_registry() -> Dict[str, type]:
    """Every dataclass config type reachable from the bundled model families."""
    import importlib

    mods = [
        "vlfm_tpu.models.blip2_itm", "vlfm_tpu.models.owl_vit",
        "vlfm_tpu.models.sam", "vlfm_tpu.models.tinyvit",
        "vlfm_tpu.models.vit", "vlfm_tpu.models.qformer",
        "vlfm_tpu.models.grounding_dino", "vlfm_tpu.models.swin",
        "vlfm_tpu.models.zoedepth", "vlfm_tpu.models.blip2_vqa",
        "vlfm_tpu.models.t5_vqa",
    ]
    reg: Dict[str, type] = {}
    for m in mods:
        mod = importlib.import_module(m)
        for name in dir(mod):
            obj = getattr(mod, name)
            if dataclasses.is_dataclass(obj) and isinstance(obj, type):
                reg[name] = obj
    return reg


def save_bundle(
    path: str,
    *,
    itm=None,
    detector=None,
    sam=None,
    gdino=None,
    zoedepth=None,
    vqa=None,  # models/blip2_vqa.BLIP2VQA (bridge + t5 saved together)
    vocab_file: Optional[str] = None,
) -> str:
    """Save model wrappers as a serving bundle (all entries optional)."""
    from vlfm_tpu.runner.checkpoint import save_pytree

    p = Path(path).absolute()
    p.mkdir(parents=True, exist_ok=True)
    manifest: Dict[str, Any] = {"models": {}}
    entries = [("itm", itm), ("detector", detector), ("sam", sam),
               ("gdino", gdino), ("zoedepth", zoedepth)]
    for name, model in entries:
        if model is None:
            continue
        save_pytree(str(p / name), model.params)
        manifest["models"][name] = _cfg_to_dict(model.cfg)
    if vqa is not None:
        save_pytree(str(p / "vqa_bridge"), vqa.params)
        save_pytree(str(p / "vqa_t5"), vqa.t5.params)
        manifest["models"]["vqa"] = _cfg_to_dict(vqa.cfg)
    if vocab_file:
        import shutil

        shutil.copy(vocab_file, p / "vocab.txt")
        manifest["vocab"] = "vocab.txt"
    (p / "manifest.json").write_text(json.dumps(manifest, indent=2))
    return str(p)


def load_bundle(path: str, dtype=None) -> SimpleNamespace:
    """Load a bundle into constructed model wrappers.

    ``dtype`` (e.g. jnp.bfloat16) applies ``cast_for_serving`` on top of the
    stored dtypes — use it when serving an f32-converted bundle on TPU.
    Returns namespace(itm, detector, sam, tokenizer) with absent entries None.
    """
    import orbax.checkpoint as ocp

    from vlfm_tpu.models.precision import cast_for_serving

    p = Path(path).absolute()
    manifest = json.loads((p / "manifest.json").read_text())
    reg = _config_registry()
    ck = ocp.StandardCheckpointer()
    out: Dict[str, Any] = {"itm": None, "detector": None, "sam": None,
                           "gdino": None, "zoedepth": None, "vqa": None,
                           "tokenizer": None}
    for name, cfg_d in manifest["models"].items():
        cfg = _cfg_from_dict(cfg_d, reg)
        if name == "vqa":
            from vlfm_tpu.models.blip2_vqa import BLIP2VQA
            from vlfm_tpu.models.t5_vqa import T5VQA

            bridge = ck.restore(p / "vqa_bridge")
            t5p = ck.restore(p / "vqa_t5")
            if dtype is not None:
                bridge = cast_for_serving(bridge, dtype)
                t5p = cast_for_serving(t5p, dtype)
            out[name] = BLIP2VQA(cfg, bridge, T5VQA(cfg.t5, t5p))
            continue
        params = ck.restore(p / name)
        if dtype is not None:
            params = cast_for_serving(params, dtype)
        if name == "itm":
            from vlfm_tpu.models.blip2_itm import BLIP2ITM

            out[name] = BLIP2ITM(cfg, params)
        elif name == "detector":
            from vlfm_tpu.models.owl_vit import OwlViTDetector

            out[name] = OwlViTDetector(cfg, params)
        elif name == "sam":
            from vlfm_tpu.models.sam import SAM

            out[name] = SAM(cfg, params)
        elif name == "gdino":
            from vlfm_tpu.models.grounding_dino import GroundingDinoDetector

            out[name] = GroundingDinoDetector(cfg, params)
        elif name == "zoedepth":
            from vlfm_tpu.models.zoedepth import ZoeDepth

            out[name] = ZoeDepth(cfg, params)
    if manifest.get("vocab") and (p / manifest["vocab"]).exists():
        from vlfm_tpu.models.tokenizer import WordPieceTokenizer

        out["tokenizer"] = WordPieceTokenizer.from_vocab_file(
            str(p / manifest["vocab"])
        )
    return SimpleNamespace(**out)


def full_stack_from_bundle(cfg, bundle_dir: str, dtype=None):
    """FullStackPerception over a weight bundle (run.py --weights-dir)."""
    from vlfm_tpu.runner.full_stack import FullStackPerception

    b = load_bundle(bundle_dir, dtype=dtype)
    fsp = FullStackPerception(
        cfg, itm=b.itm, detector=b.detector, sam=b.sam,
        blip2_vqa=b.vqa, monodepth=b.zoedepth,
    )
    if b.tokenizer is not None:
        # sequences must fit the detector text tower's position table (16
        # for real OWL-ViT, matching its HF processor truncation)
        if b.detector is not None:
            b.tokenizer.max_len = min(
                b.tokenizer.max_len, b.detector.cfg.text.max_position
            )
        fsp.tokenizer = b.tokenizer
        fsp.engine.tokenizer = b.tokenizer
    return fsp
