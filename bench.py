#!/usr/bin/env python3
"""Benchmark: map-update + policy-step throughput on the local accelerator.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Primary metric: map-update frames/sec/chip — the hot path of both rollout
collection and evaluation (UNet 224^2 forward + pinhole projection +
scatter-max splat + global-map registration, reference `policy.py:30-32` +
`rgb_mapping.py:79-90`), at the reference's stage-1 env batch (6 envs,
`README.md:80` NUM_PROCESSES 6).

Baseline: the reference publishes no throughput numbers (BASELINE.md). We
estimate its PyTorch-GPU map-update rate at ~160 frames/s on a V100-class
GPU at batch 6 (UNet resnet18 fwd ~25 ms + 4 grid_sample warps over
[6,64,240,240] + torch_scatter ~10 ms per batched step). vs_baseline is
measured_fps / 160.
"""
import json
import time

import numpy as np

REFERENCE_MAP_UPDATE_FPS = 160.0  # estimated PyTorch-GPU baseline (see above)
BATCH = 6
STEPS = 30


def main():
    import jax
    import jax.numpy as jnp

    from ws_mgmap_tpu.models.policy import BasePolicy, MGMapConfig
    from ws_mgmap_tpu.ops.mapping import init_global_map

    cfg = MGMapConfig()
    policy = BasePolicy(cfg)
    rng = np.random.RandomState(0)
    obs = {
        "instruction": jnp.asarray(
            np.pad(rng.randint(1, 2504, (BATCH, 16)), ((0, 0), (0, 184)))),
        "rgb": jnp.asarray(
            rng.randint(0, 255, (BATCH, 224, 224, 3)).astype(np.float32)),
        "depth": jnp.asarray(rng.rand(BATCH, 256, 256, 1).astype(np.float32)),
        "gps": jnp.zeros((BATCH, 2)),
        "compass": jnp.zeros((BATCH, 1)),
    }
    hidden = jnp.zeros((2, BATCH, cfg.hidden_size))
    masks = jnp.ones((BATCH, 1))
    gmap = init_global_map(BATCH, cfg.mapper)

    variables = policy.init(jax.random.PRNGKey(0), obs, hidden, masks, gmap,
                            method=BasePolicy.act)

    import functools

    @functools.partial(jax.jit, donate_argnums=(2,))
    def update_map(variables, obs, gmap, masks):
        return policy.apply(variables, obs, masks, gmap,
                            method=BasePolicy.update_map)

    @functools.partial(jax.jit, donate_argnums=(3,))
    def act(variables, obs, hidden, gmap, masks):
        out = policy.apply(variables, obs, hidden, masks, gmap, True,
                           method=BasePolicy.act)
        return out.action, out.hidden, out.prog, out.global_map

    def host_sync(x):
        # a host transfer is the only completion signal that cannot be
        # acknowledged early by an async runtime/relay
        return float(np.asarray(jnp.sum(x[..., :1])))

    # -- map-update throughput ------------------------------------------------
    ego, gmap = update_map(variables, obs, gmap, masks)  # compile
    host_sync(ego)
    t0 = time.perf_counter()
    for _ in range(STEPS):
        # steps are data-dependent through the donated global map
        ego, gmap = update_map(variables, obs, gmap, masks)
    host_sync(ego)
    map_fps = BATCH * STEPS / (time.perf_counter() - t0)

    # -- full policy step throughput ------------------------------------------
    action, hidden, prog, gmap = act(variables, obs, hidden, gmap, masks)
    host_sync(action)
    t0 = time.perf_counter()
    for _ in range(STEPS):
        action, hidden, prog, gmap = act(variables, obs, hidden, gmap, masks)
    host_sync(action)
    act_fps = BATCH * STEPS / (time.perf_counter() - t0)

    print(json.dumps({
        "metric": "map_update_frames_per_sec_per_chip",
        "value": round(map_fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(map_fps / REFERENCE_MAP_UPDATE_FPS, 3),
        "extras": {
            "policy_act_steps_per_sec_per_chip": round(act_fps, 2),
            "batch": BATCH,
            "device": str(jax.devices()[0]),
        },
    }))


if __name__ == "__main__":
    main()
