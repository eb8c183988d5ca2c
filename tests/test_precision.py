"""cast_for_serving: converted f32 checkpoints must serve as bf16 matmuls.

flax Dense promotes bf16 activations x f32 kernels to an f32 matmul — a
converted-checkpoint tree served as-is silently halves MXU rate. The cast
must flip matmul weights to the compute dtype while leaving norm parameters
(f32 statistics path) untouched.
"""

import jax
import jax.numpy as jnp
import numpy as np

from vlfm_tpu.models.blip2_itm import BLIP2ITM, BLIP2ITMConfig
from vlfm_tpu.models.precision import cast_for_serving


def _leaves_with_paths(tree):
    return jax.tree_util.tree_flatten_with_path(tree)[0]


def test_dense_kernels_cast_norms_kept():
    m = BLIP2ITM.init_random(BLIP2ITMConfig.tiny(), seed=0)
    cast = cast_for_serving(m.params, jnp.bfloat16)
    n_bf16 = n_f32 = 0
    for path, leaf in _leaves_with_paths(cast):
        names = [str(getattr(p, "key", "")) for p in path]
        is_norm = any(
            n == "ln" or n.startswith("ln") or n.endswith("_ln") or "norm" in n
            for n in names
        ) or names[-1] == "scale"
        if is_norm:
            assert leaf.dtype == jnp.float32, names
            n_f32 += 1
        else:
            assert leaf.dtype == jnp.bfloat16, names
            n_bf16 += 1
    assert n_bf16 > 20 and n_f32 > 4  # both classes actually present


def test_t5_final_rmsnorm_scales_kept():
    from vlfm_tpu.models.t5_vqa import T5Config, T5Module

    cfg = T5Config.tiny()
    mod = T5Module(cfg)
    params = mod.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 4), jnp.int32), jnp.ones((1, 4), bool),
        jnp.zeros((1, 3), jnp.int32),
    )["params"]
    cast = cast_for_serving(params)
    assert cast["enc_final"]["scale"].dtype == jnp.float32
    assert cast["dec_final"]["scale"].dtype == jnp.float32
    assert cast["lm_head"]["kernel"].dtype == jnp.bfloat16


def test_int_leaves_untouched():
    tree = {"ids": jnp.arange(4, dtype=jnp.int32), "w": jnp.ones((2, 2))}
    cast = cast_for_serving(tree)
    assert cast["ids"].dtype == jnp.int32
    assert cast["w"].dtype == jnp.bfloat16


def test_outputs_match_f32_within_bf16_tolerance():
    cfg = BLIP2ITMConfig.tiny()
    m = BLIP2ITM.init_random(cfg, seed=0)
    s = cfg.vit.image_size
    rgb = jax.random.uniform(jax.random.PRNGKey(1), (2, s, s, 3))
    ids = jnp.ones((1, 6), jnp.int32)
    mask = jnp.ones((1, 6), bool)
    ref = m.cosine(rgb, ids, mask)
    m2 = BLIP2ITM(cfg, cast_for_serving(m.params))
    out = m2.cosine(rgb, ids, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=0.05)
