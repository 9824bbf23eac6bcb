#!/usr/bin/env python3
"""Per-stage breakdown of the map-update hot path (bf16 rollout mode).

Stages timed separately (loop-in-jit, see tools/microbench.py):
  unet        UNet forward @224^2 (fused Pallas decoder-tail convs)
  mapchain    rgb_mapping_step minus the UNet (projection+splat+register)
  splat       ground splat alone (Pallas interleaved-accumulator kernel)
  rotate      ego-map rotation alone (patch-gather grid_sample)
  step        full update_map (policy.apply) — should ~= unet + mapchain
"""
import argparse
import dataclasses
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=6)
    ap.add_argument("--steps", type=int, default=24)
    ap.add_argument("--stages", default="unet,mapchain,splat,rotate,step")
    ap.add_argument("--dtype", default="bf16", choices=["bf16", "fp32"])
    ap.add_argument("--rotate-in-splat", action="store_true",
                    help="enable the coordinate-rotation splat fast path")
    args = ap.parse_args()

    import jax

    # persistent compile cache (separate from bench.py's curated .jax_cache
    # so schedule curation stays scoped to the driver benchmark programs)
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("BD_CACHE", "/tmp/bd_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

    import jax.numpy as jnp
    from jax import lax

    from ws_mgmap_tpu.models.policy import BasePolicy, MGMapConfig
    from ws_mgmap_tpu.models.unet import UNet
    from ws_mgmap_tpu.ops import projection, resample
    from ws_mgmap_tpu.ops.mapping import init_global_map, rgb_mapping_step

    B = args.batch
    K1, K2 = 2, 2 + args.steps
    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    rng = np.random.RandomState(0)
    stages = set(args.stages.split(","))
    print(f"device: {jax.devices()[0]}, batch {B}, {args.dtype}")

    def bench(name, step_fn, carry0):
        @jax.jit
        def loop(carry, steps):
            return lax.fori_loop(0, steps, step_fn, carry)

        def run(k):
            k = jnp.int32(k)
            t0 = time.perf_counter()
            out = loop(carry0, k)
            leaf = jax.tree.leaves(out)[0]
            float(np.asarray(jnp.sum(leaf.reshape(-1)[:8]).astype(jnp.float32)))
            return time.perf_counter() - t0

        run(K1); run(K2)
        t1 = min(run(K1) for _ in range(3))
        t2 = min(run(K2) for _ in range(3))
        ms = (t2 - t1) / (K2 - K1) * 1e3
        print(f"{name:34s} {ms:8.3f} ms/step  ({B / ms * 1e3:7.1f} frames/s)",
              flush=True)
        return ms

    cfg = MGMapConfig()
    if args.rotate_in_splat:
        cfg = dataclasses.replace(
            cfg, mapper=cfg.mapper._replace(rotate_in_splat=True))
    rgb = jnp.asarray(rng.randint(0, 255, (B, 224, 224, 3))).astype(dtype)
    depth = jnp.asarray(rng.rand(B, 256, 256, 1).astype(np.float32)).astype(dtype)
    gps = jnp.zeros((B, 2))
    compass = jnp.asarray(rng.uniform(-3, 3, (B, 1)).astype(np.float32))
    feats = jnp.asarray(rng.randn(B, 224, 224, 64).astype(np.float32)).astype(dtype)
    ego = jnp.asarray(rng.rand(B, 100, 100, 64).astype(np.float32)).astype(dtype)
    masks = jnp.ones((B, 1), dtype)
    gmap = init_global_map(B, cfg.mapper, dtype=dtype)

    if "unet" in stages:
        unet = UNet()
        uv = unet.init(jax.random.PRNGKey(0), rgb.astype(jnp.float32)[:1])
        uv = jax.tree.map(lambda a: a.astype(dtype)
                          if jnp.issubdtype(a.dtype, jnp.floating) else a, uv)

        def unet_step(i, c):
            bn, pf, _ = unet.apply(uv, rgb + i.astype(dtype) * 0.01)
            return c + jnp.sum(pf[..., :1].astype(jnp.float32))

        bench("unet fwd 224^2", unet_step, jnp.float32(0))

    if "mapchain" in stages:
        def chain_step(i, carry):
            gm = carry
            _, gm = rgb_mapping_step(
                gm, feats + i.astype(dtype) * 0.001, depth, gps,
                compass + 0.05 * i, masks, cfg.mapper)
            return gm

        bench("mapchain (proj+splat+register)", chain_step, gmap)

    if "splat" in stages:
        d10 = depth.astype(jnp.float32) * 10
        x_gp, y_gp, valid = projection.spatial_locs(d10, 100, 0.12)

        def splat_step(i, c):
            out = projection.splat_to_ground(
                feats + i.astype(dtype) * 0.001, x_gp, y_gp, valid, 100,
                backend="pallas")
            return c + jnp.sum(out[..., :1].astype(jnp.float32))

        bench("splat (pallas)", splat_step, jnp.float32(0))

        def splat_xla(i, c):
            out = projection.splat_to_ground(
                feats + i.astype(dtype) * 0.001, x_gp, y_gp, valid, 100,
                backend="xla")
            return c + jnp.sum(out[..., :1].astype(jnp.float32))

        bench("splat (xla)", splat_xla, jnp.float32(0))

    if "rotate" in stages:
        ang = compass.reshape(-1)

        def mk_rot(impl):
            def rot_step(i, c):
                theta = resample.rotation_theta(ang + 0.05 * i,
                                                clockwise_xy=True)
                out = resample.grid_sample(
                    ego + i.astype(dtype) * 0.001,
                    resample.affine_grid(theta, 100, 100), impl=impl)
                return c + jnp.sum(out[..., :1].astype(jnp.float32))
            return rot_step

        bench("rotate 100^2x64 (patch)", mk_rot("patch"), jnp.float32(0))
        bench("rotate 100^2x64 (taps)", mk_rot("taps"), jnp.float32(0))

    if stages & {"instr", "depth", "mapenc", "act"}:
        from ws_mgmap_tpu.models.instruction_encoder import InstructionEncoder
        from ws_mgmap_tpu.models.depth_encoder import VlnResnetDepthEncoder
        from ws_mgmap_tpu.models import map_modules

        if "instr" in stages:
            enc = InstructionEncoder()
            tokens = jnp.asarray(
                np.pad(rng.randint(1, 2504, (B, 16)), ((0, 0), (0, 184))))
            iv = enc.init(jax.random.PRNGKey(0), tokens)
            iv = jax.tree.map(lambda a: a.astype(dtype)
                              if jnp.issubdtype(a.dtype, jnp.floating) else a,
                              iv)

            def instr_step(i, c):
                text, _ = enc.apply(iv, tokens + (i % 2))
                return c + jnp.sum(text[..., :1].astype(jnp.float32))

            bench("instruction biLSTM 200 tok", instr_step, jnp.float32(0))

        if "depth" in stages:
            de = VlnResnetDepthEncoder()
            dv = de.init(jax.random.PRNGKey(0),
                         depth.astype(jnp.float32)[:1])
            dv = jax.tree.map(lambda a: a.astype(dtype)
                              if jnp.issubdtype(a.dtype, jnp.floating) else a,
                              dv)

            def depth_step(i, c):
                x, _ = de.apply(dv, depth=depth + i.astype(dtype) * 1e-4)
                return c + jnp.sum(x[..., :1].astype(jnp.float32))

            bench("depth resnet50 encoder", depth_step, jnp.float32(0))

        if "mapenc" in stages:
            class _MapStack(__import__("flax").linen.Module):
                @__import__("flax").linen.compact
                def __call__(self, ego):
                    enc = map_modules.MapEncoder(name="enc")(ego, False)
                    dec = map_modules.MapDecoder(name="dec")(enc, False)
                    sem = map_modules.MapClassifier(name="cls")(dec, False)
                    return enc, sem

            ms = _MapStack()
            ego100 = jnp.asarray(
                rng.rand(B, 100, 100, 64).astype(np.float32))
            mv = ms.init(jax.random.PRNGKey(0), ego100)
            mv = jax.tree.map(lambda a: a.astype(dtype)
                              if jnp.issubdtype(a.dtype, jnp.floating) else a,
                              mv)
            ego100 = ego100.astype(dtype)

            def map_step(i, c):
                enc, sem = ms.apply(mv, ego100 + i.astype(dtype) * 0.001)
                return (c + jnp.sum(enc[..., :1].astype(jnp.float32))
                        + jnp.sum(sem[..., :1].astype(jnp.float32)))

            bench("map enc+dec+classifier", map_step, jnp.float32(0))

    if stages & {"step", "act"}:
        policy = BasePolicy(cfg)
        obs = {
            "instruction": jnp.asarray(
                np.pad(rng.randint(1, 2504, (B, 16)), ((0, 0), (0, 184)))),
            "rgb": rgb, "depth": depth, "gps": gps, "compass": compass,
        }
        # init traces in fp32 (fresh params are fp32); cast afterwards
        obs32 = {k: v.astype(jnp.float32)
                 if jnp.issubdtype(v.dtype, jnp.floating) else v
                 for k, v in obs.items()}
        variables = jax.jit(lambda key: policy.init(
            key, obs32, jnp.zeros((2, B, cfg.hidden_size)),
            jnp.ones((B, 1)), gmap.astype(jnp.float32),
            method=BasePolicy.act))(jax.random.PRNGKey(0))
        variables = jax.tree.map(
            lambda a: a.astype(dtype)
            if jnp.issubdtype(a.dtype, jnp.floating) else a, variables)

        if "step" in stages:
            def step_fn(i, gm):
                o = dict(obs, rgb=rgb + i.astype(dtype) * 0.01,
                         depth=depth + i.astype(dtype) * 1e-4,
                         compass=compass + 0.05 * i)
                _, gm = policy.apply(variables, o, masks, gm,
                                     method=BasePolicy.update_map)
                return gm

            bench("full update_map step", step_fn, gmap)

        if "act" in stages:
            hidden0 = jnp.zeros((2, B, cfg.hidden_size), dtype)

            def act_fn(i, carry):
                hd, gm = carry
                o = dict(obs, rgb=rgb + i.astype(dtype) * 0.01,
                         depth=depth + i.astype(dtype) * 1e-4,
                         compass=compass + 0.05 * i)
                out = policy.apply(variables, o, hd, masks, gm, True,
                                   method=BasePolicy.act)
                return out.hidden, out.global_map

            bench("full act step (text each step)", act_fn, (hidden0, gmap))

            text, text_pad = jax.jit(lambda v, t: policy.apply(
                v, t, method=BasePolicy.encode_text))(
                    variables, obs["instruction"])

            def act_cached(i, carry):
                hd, gm = carry
                o = dict(obs, rgb=rgb + i.astype(dtype) * 0.01,
                         depth=depth + i.astype(dtype) * 1e-4,
                         compass=compass + 0.05 * i,
                         text_features=text, text_pad=text_pad)
                out = policy.apply(variables, o, hd, masks, gm, True,
                                   method=BasePolicy.act)
                return out.hidden, out.global_map

            bench("full act step (text cached)", act_cached,
                  (hidden0, gmap))


if __name__ == "__main__":
    main()
