import jax
import jax.numpy as jnp
import numpy as np

from tests.test_policy import CFG, SPEC, no_detections, obs_at, room_depth
from vlfm_tpu.policy import itm


def test_v1_explores_with_cached_cosines():
    state = itm.create_state(SPEC, CFG)
    state = state._replace(steps=jnp.int32(20))
    masks, mvalid = no_detections()
    # two steps with different cosines; V1 frontier values come from the
    # cosine at first sight
    obs = obs_at(0.0, 0.0, 0.0, room_depth())
    rng = jax.random.PRNGKey(0)
    a1, info1, state = itm.step(
        state, obs, jnp.array([0.8]), masks, mvalid, rng,
        pointnav="greedy", spec=SPEC, cfg=CFG, version="v1",
    )
    assert int(info1.mode) == itm.MODE_EXPLORE
    assert int(state.frontier_cache.valid.sum()) > 0
    v1 = float(info1.best_value)
    assert abs(v1 - 0.8) < 1e-5
    # second step, lower cosine: existing frontiers keep their cached value
    a2, info2, state = itm.step(
        state, obs, jnp.array([0.1]), masks, mvalid, rng,
        pointnav="greedy", spec=SPEC, cfg=CFG, version="v1",
    )
    assert float(info2.best_value) > 0.5
