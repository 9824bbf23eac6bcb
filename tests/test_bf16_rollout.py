"""bf16 rollout mode: the frozen-trunk fast path must stay bfloat16 end to
end on device (no silent fp32 promotion) and track the fp32 rollout."""
import pytest

import numpy as np

import jax
import jax.numpy as jnp

from ws_mgmap_tpu.models.policy import BasePolicy, MGMapConfig
from ws_mgmap_tpu.ops.mapping import init_global_map
from ws_mgmap_tpu.train.rollout import RolloutEngine

RNG = np.random.RandomState(3)


def _tiny_policy():
    from ws_mgmap_tpu.ops.mapping import MapperParams

    cfg = MGMapConfig(
        vocab_size=50, instr_hidden=16, rgb_output_size=32,
        depth_output_size=16, map_output_size=32, ego_map_size=20,
        map_depth=16, hidden_size=64,
        mapper=MapperParams(ego_size=20, global_size=48, map_depth=16),
    )
    policy = BasePolicy(cfg)
    obs = _obs(1)
    variables = policy.init(
        jax.random.PRNGKey(0), obs, jnp.zeros((2, 1, cfg.hidden_size)),
        jnp.ones((1, 1)), init_global_map(1, cfg.mapper),
        method=BasePolicy.act)
    return policy, jax.tree.map(np.asarray, variables)


def _obs(b):
    return {
        "instruction": jnp.asarray(
            np.pad(RNG.randint(1, 50, (b, 8)), ((0, 0), (0, 192)))),
        "rgb": jnp.asarray(
            RNG.randint(0, 255, (b, 64, 64, 3)).astype(np.float32)),
        "depth": jnp.asarray(RNG.rand(b, 256, 256, 1).astype(np.float32)),
        "gps": jnp.zeros((b, 2)),
        "compass": jnp.zeros((b, 1)),
    }


def _raw_obs(b, o):
    return [{k: np.asarray(v[i]) for k, v in o.items()} for i in range(b)]


@pytest.mark.slow
def test_bf16_engine_matches_fp32_and_stays_narrow():
    policy, variables = _tiny_policy()
    b = 2
    o = _obs(b)
    raw = _raw_obs(b, o)

    e32 = RolloutEngine(policy, variables, b, compute_dtype=None)
    e16 = RolloutEngine(policy, variables, b, compute_dtype=jnp.bfloat16)

    assert e16.global_map.dtype == jnp.bfloat16
    assert e16.hidden.dtype == jnp.bfloat16

    masks = np.zeros((b, 1), np.float32)
    for step in range(3):
        b32 = e32.batch_obs(raw)
        b16 = e16.batch_obs(raw)
        assert b16["rgb"].dtype == jnp.bfloat16
        if step < 2:
            e32.update_map(b32, masks)
            e16.update_map(b16, masks)
        else:
            out32 = e32.act(b32, masks)
            out16 = e16.act(b16, masks)
        masks = np.ones((b, 1), np.float32)

    # the persistent map must still be bf16 after act (donated carry)
    assert e16.global_map.dtype == jnp.bfloat16
    assert e16.hidden.dtype == jnp.bfloat16
    # host-facing outputs are fp32
    assert out16.action.dtype == jnp.float32
    assert out16.ego_map.dtype == jnp.float32

    # bf16 tracks fp32: same map support, close waypoint/progress
    a32, a16 = np.asarray(out32.action), np.asarray(out16.action)
    np.testing.assert_allclose(np.tanh(a16), np.tanh(a32), atol=0.12)
    np.testing.assert_allclose(np.asarray(e16.prog), np.asarray(e32.prog),
                               atol=0.12)
    g32 = np.asarray(e32.global_map)
    g16 = np.asarray(e16.global_map, np.float32)
    occ32, occ16 = g32 != 0, g16 != 0
    agree = (occ32 == occ16).mean()
    assert agree > 0.98, agree
