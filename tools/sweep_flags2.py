#!/usr/bin/env python3
"""One-process XLA compiler-option sweep for the update_map hot program.

The round-3 'schedule lottery' is gone: the compile service now returns a
deterministic schedule per (HLO, compiler options) in ~11 s. That turns
schedule curation into a flag SEARCH: compile the headline program once per
option combo (persistent cache bypassed, in-process caches cleared) and
measure each deterministically.

Usage:
  python tools/sweep_flags2.py [--batch 6] [--combos name1,name2] [--draws 2]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

COMBOS = {
    "none": "",
    "vmem64m": "xla_tpu_scoped_vmem_limit_kib=65536",
    "vmem128m": "xla_tpu_scoped_vmem_limit_kib=131072",
    "vmem32m": "xla_tpu_scoped_vmem_limit_kib=32768",
    "vmem24m": "xla_tpu_scoped_vmem_limit_kib=24576",
    "lhs_off": "xla_tpu_enable_latency_hiding_scheduler=false",
    "licm2": "xla_tpu_licm_size_inflation_ratio=2",
    "rwb_off": "xla_tpu_rwb_fusion=false",
    "nested_loop_fusion":
        "xla_tpu_enable_multi_level_nested_loop_fusion=true",
    "vmem64m_lhs_off": ("xla_tpu_scoped_vmem_limit_kib=65536,"
                        "xla_tpu_enable_latency_hiding_scheduler=false"),
    "vmem64m_licm2": ("xla_tpu_scoped_vmem_limit_kib=65536,"
                      "xla_tpu_licm_size_inflation_ratio=2"),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=6)
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--draws", type=int, default=2,
                    help="timing draws per combo (min-selected)")
    ap.add_argument("--combos", default=",".join(COMBOS))
    ap.add_argument("--extra", default="",
                    help="extra combos as name=optstring;name=optstring")
    args = ap.parse_args()

    combos = {k: COMBOS[k] for k in args.combos.split(",") if k}
    for pair in filter(None, args.extra.split(";")):
        name, opts = pair.split("=", 1)
        combos[name] = opts

    import numpy as np

    import jax
    import jax.numpy as jnp
    from jax import lax

    jax.config.update("jax_enable_compilation_cache", False)

    import dataclasses as dc

    from ws_mgmap_tpu.models.policy import BasePolicy, MGMapConfig
    from ws_mgmap_tpu.ops.mapping import init_global_map

    B = args.batch
    cfg = MGMapConfig()
    cfg_fast = dc.replace(cfg,
                          mapper=cfg.mapper._replace(rotate_in_splat=True))
    policy = BasePolicy(cfg_fast)
    rng = np.random.RandomState(0)
    obs = {
        "instruction": jnp.asarray(
            np.pad(rng.randint(1, 2504, (B, 16)), ((0, 0), (0, 184)))),
        "rgb": jnp.asarray(
            rng.randint(0, 255, (B, 224, 224, 3)).astype(np.float32)),
        "depth": jnp.asarray(rng.rand(B, 256, 256, 1).astype(np.float32)),
        "gps": jnp.zeros((B, 2)),
        "compass": jnp.zeros((B, 1)),
    }
    gmap = init_global_map(B, cfg.mapper)
    hidden = jnp.zeros((2, B, cfg.hidden_size))
    variables = jax.jit(lambda key: policy.init(
        key, obs, hidden, jnp.ones((B, 1)), gmap,
        method=BasePolicy.act))(jax.random.PRNGKey(0))

    def cast_tree(tree, dtype):
        return jax.tree.map(
            lambda x: x.astype(dtype)
            if jnp.issubdtype(x.dtype, jnp.floating) else x, tree)

    v16 = cast_tree(variables, jnp.bfloat16)
    o16 = dict(cast_tree(obs, jnp.bfloat16), gps=obs["gps"],
               compass=obs["compass"])
    gm16 = gmap.astype(jnp.bfloat16)
    mk16 = jnp.ones((B, 1), jnp.bfloat16)

    def update_map_n(variables, obs, gmap, masks, steps):
        def body(i, gm):
            o = dict(obs, compass=obs["compass"] + 0.05 * i,
                     rgb=obs["rgb"] + 0.01 * i,
                     depth=obs["depth"] + 1e-4 * i)
            _, gm = policy.apply(variables, o, masks, gm,
                                 method=BasePolicy.update_map)
            return gm
        return lax.fori_loop(0, steps, body, gmap)

    k1, k2 = jnp.int32(2), jnp.int32(2 + args.steps)

    def sync(x):
        return float(np.asarray(jnp.sum(x[..., :1, :1])))

    results = {}
    for name, opts in combos.items():
        copts = (dict(kv.split("=", 1) for kv in opts.split(","))
                 if opts else None)
        jax.clear_caches()
        t0 = time.time()
        try:
            ex = jax.jit(update_map_n).lower(
                v16, o16, gm16, mk16, k2).compile(compiler_options=copts)
        except Exception as e:
            print(f"[sweep] {name:20s} COMPILE ERROR: "
                  f"{str(e)[:160]}", flush=True)
            results[name] = None
            continue
        dt_c = time.time() - t0
        sync(ex(v16, o16, gm16, mk16, k1))
        sync(ex(v16, o16, gm16, mk16, k2))
        shorts, longs = [], []
        for _ in range(args.draws):
            t0 = time.perf_counter()
            sync(ex(v16, o16, gm16, mk16, k1))
            shorts.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            sync(ex(v16, o16, gm16, mk16, k2))
            longs.append(time.perf_counter() - t0)
        dt = (min(longs) - min(shorts)) / args.steps
        fps = B / dt
        results[name] = round(fps, 1)
        print(f"[sweep] {name:20s} {dt*1e3:7.3f} ms/step = {fps:7.1f} f/s "
              f"(compile {dt_c:.0f}s)", flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
