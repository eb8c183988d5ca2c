import jax
import jax.numpy as jnp
import numpy as np

from vlfm_tpu.models.blip2_itm import BLIP2ITM, BLIP2ITMConfig
from vlfm_tpu.models.tokenizer import WordPieceTokenizer, toy_vocab
from vlfm_tpu.parallel.engine import PerceptionEngine
from vlfm_tpu.parallel.mesh import (
    episode_sharding,
    make_mesh,
    shard_episode_batch,
    shard_params_tp,
)


def test_tokenizer_roundtrip():
    vocab = toy_vocab(["toilet", "chair", "ahead"])
    tok = WordPieceTokenizer(vocab, max_len=16)
    ids, mask = tok.encode_batch(["a chair ahead", "toilet"])
    assert ids.shape == (2, 16)
    assert ids[0, 0] == vocab["[CLS]"]
    assert vocab["chair"] in ids[0].tolist()
    assert vocab["toilet"] in ids[1].tolist()
    # unknown-char word -> char pieces
    ids2, _ = tok.encode_batch(["zq"])
    assert vocab["z"] in ids2[0].tolist() and vocab["##q"] in ids2[0].tolist()


def test_engine_scores_with_cached_text():
    cfg = BLIP2ITMConfig.tiny()
    itm = BLIP2ITM.init_random(cfg, seed=0)
    vocab = toy_vocab(["target"])
    # tiny model has vocab 100; toy vocab fits
    tok = WordPieceTokenizer(vocab, max_len=8)
    eng = PerceptionEngine(itm=itm, tokenizer=tok, text_prompt="a target_object|b")
    prompts = eng.prompts_for_target("toilet")
    assert prompts == ["a toilet", "b"]
    rgb = jnp.asarray(
        np.random.default_rng(0).integers(0, 255, (3, 64, 64, 3), np.uint8)
    )
    out = np.asarray(eng.score(rgb, "toilet"))
    assert out.shape == (3, 2)
    assert np.all(np.abs(out) <= 1.0 + 1e-5)
    # cache hit: same object keys the cache
    assert "toilet" in eng._text_feat_cache


def test_mesh_sharding_8_devices():
    mesh = make_mesh(8, model_parallel=2)
    assert dict(mesh.shape) == {"data": 4, "model": 2}
    batch = jnp.ones((8, 16))
    sharded = shard_episode_batch(batch, mesh)
    assert sharded.sharding == episode_sharding(mesh)

    cfg = BLIP2ITMConfig.tiny()
    model = BLIP2ITM.init_random(cfg, seed=1)
    params = shard_params_tp(model.params, mesh)
    imgs = jax.device_put(jnp.ones((8, 56, 56, 3)) * 0.5, episode_sharding(mesh))
    ids = jnp.zeros((2, 6), jnp.int32)
    am = jnp.ones((2, 6), bool)

    out = jax.jit(
        lambda p, im: model.module.apply({"params": p}, im, ids, am)
    )(params, imgs)
    assert out.shape == (8, 2)
    # numerics must match the unsharded model
    want = np.asarray(model.cosine(jnp.ones((8, 56, 56, 3)) * 0.5, ids, am))
    assert np.allclose(np.asarray(out), want, atol=2e-2)  # bf16 tolerance


def test_graft_entry_contract():
    import __graft_entry__ as g

    fn, args = g.entry()
    action, info, state = fn(*args)
    assert int(action) in (0, 1, 2, 3)


def test_dryrun_multichip_equivalence():
    """The driver's dryrun contract: 8-device mesh == single device, checked
    on actions, explored maps, value maps, and tp-sharded ITM scores."""
    import sys

    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as g

    g.dryrun_multichip(8)
