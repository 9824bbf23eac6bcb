#!/usr/bin/env python3
"""Device-true micro-benchmarks for the hot ops.

Each candidate runs K iterations inside ONE jit (lax.fori_loop with a data
dependence through the carry), so per-launch RPC/runtime overhead cancels in
t(K2) - t(K1). Used to pick implementations (e.g. scatter-max splat vs
sort-based splat) with real device numbers.

Usage: python tools/microbench.py [--batch 6] [--steps 20]
"""
import argparse
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=6)
    p.add_argument("--steps", type=int, default=20)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    from ws_mgmap_tpu.models.unet import UNet
    from ws_mgmap_tpu.ops import projection, resample
    from ws_mgmap_tpu.ops.mapping import MapperParams, register_and_retrieve

    B = args.batch
    K1, K2 = 2, 2 + args.steps
    rng = np.random.RandomState(0)

    def bench(name, step_fn, carry0, per_iter_frames=B):
        @functools.partial(jax.jit, static_argnames=("steps",))
        def loop(carry, steps):
            return lax.fori_loop(0, steps, step_fn, carry)

        def run(k):
            t0 = time.perf_counter()
            out = loop(carry0, k)
            leaf = jax.tree.leaves(out)[0]
            float(np.asarray(jnp.sum(leaf.reshape(-1)[:8])))
            return time.perf_counter() - t0

        run(K1); run(K2)  # compile
        t1 = min(run(K1) for _ in range(2))
        t2 = min(run(K2) for _ in range(2))
        per_step_ms = (t2 - t1) / (K2 - K1) * 1e3
        print(f"{name:34s} {per_step_ms:9.3f} ms/step "
              f"({per_iter_frames / max(t2 - t1, 1e-9) * (K2 - K1):9.1f} items/s)")
        return per_step_ms

    print(f"device: {jax.devices()[0]}, batch {B}")

    # ---- splat candidates ---------------------------------------------------
    feats = jnp.asarray(rng.randn(B, 224, 224, 64).astype(np.float32))
    depth = jnp.asarray(rng.rand(B, 256, 256, 1).astype(np.float32) * 10)
    x_gp, y_gp, valid = projection.spatial_locs(depth, 100, 0.12)

    def splat_segment(i, carry):
        f = feats + 0.001 * i
        out = projection.splat_to_ground(f, x_gp, y_gp, valid, 100)
        return carry + jnp.sum(out[..., :1])

    bench("splat segment_max", splat_segment, jnp.float32(0))

    feats16 = feats.astype(jnp.bfloat16)

    def splat_segment_bf16(i, carry):
        f = feats16 + 0.001 * i
        out = projection.splat_to_ground(f, x_gp, y_gp, valid, 100)
        return carry + jnp.sum(out[..., :1].astype(jnp.float32))

    bench("splat segment_max bf16", splat_segment_bf16, jnp.float32(0))

    def splat_sorted(i, carry):
        f = feats + 0.001 * i
        e = 100
        hd, wd = x_gp.shape[1:]
        iy = projection._subsample_indices(hd, 224)
        ix = projection._subsample_indices(wd, 224)
        xg = x_gp[:, iy[:, None], ix[None, :]]
        yg = y_gp[:, iy[:, None], ix[None, :]]
        va = valid[:, iy[:, None], ix[None, :]]
        inb = (xg >= 0) & (xg < e) & (yg >= 0) & (yg < e)
        inv = ~(va & inb)
        lin = jnp.where(inv, 0, yg * e + xg).reshape(B, -1)
        dat = jnp.where(inv.reshape(B, -1)[..., None], -1e16, f.reshape(B, -1, 64))

        def one(ids, d):
            order = jnp.argsort(ids)
            ids_s = ids[order]
            d_s = d[order]
            seg = jax.ops.segment_max(d_s, ids_s, num_segments=e * e,
                                      indices_are_sorted=True)
            return jnp.where(seg <= -1e16, 0.0, seg)

        out = jax.vmap(one)(lin, dat)
        return carry + jnp.sum(out[..., :1])

    bench("splat sort+sorted-segment_max", splat_sorted, jnp.float32(0))

    # ---- warps -------------------------------------------------------------
    gmap = jnp.asarray(rng.rand(B, 240, 240, 64).astype(np.float32))
    tx = jnp.asarray(rng.uniform(-0.5, 0.5, B).astype(np.float32))

    def warp_translate(i, gm):
        return resample.translate_norm(gm, tx + 0.001 * i, tx)

    bench("translate grid_sample (240^2x64)", warp_translate, gmap)

    def warp_translate_fast(i, gm):
        return resample.translate_norm_fast(gm, tx + 0.001 * i, tx)

    bench("translate stencil-fast (240^2x64)", warp_translate_fast, gmap)

    ang = jnp.asarray(rng.uniform(-3, 3, B).astype(np.float32))
    ego = jnp.asarray(rng.rand(B, 100, 100, 64).astype(np.float32))

    def warp_rotate(i, e):
        return resample.rotate_about_center(e, ang + 0.001 * i)

    bench("rotate grid_sample (100^2x64)", warp_rotate, ego)

    # ---- full registration chain -------------------------------------------
    p_map = MapperParams()
    gps = jnp.zeros((B, 2))
    compass = jnp.zeros((B, 1))
    masks = jnp.ones((B, 1))
    proj = ego

    def reg(i, gm):
        _, gm = register_and_retrieve(gm, proj + 0.001 * i, gps, compass,
                                      masks, p_map)
        return gm

    bench("register_and_retrieve windowed", reg, gmap)

    gmap16 = gmap.astype(jnp.bfloat16)
    proj16 = ego.astype(jnp.bfloat16)

    def reg16(i, gm):
        _, gm = register_and_retrieve(gm, proj16 + 0.001 * i, gps, compass,
                                      masks, p_map)
        return gm

    bench("register_and_retrieve bf16", reg16, gmap16)

    def rot16(i, e):
        return resample.rotate_about_center(e, ang + 0.001 * i)

    bench("rotate bf16 (100^2x64)", rot16, proj16)

    from ws_mgmap_tpu.ops.mapping import register_and_retrieve_reference

    def reg_ref(i, gm):
        _, gm = register_and_retrieve_reference(gm, proj + 0.001 * i, gps,
                                                compass, masks, p_map)
        return gm

    bench("register_and_retrieve warp-chain", reg_ref, gmap)

    # ---- UNet forward --------------------------------------------------------
    unet = UNet()
    rgb = jnp.asarray(rng.randint(0, 255, (B, 224, 224, 3)).astype(np.float32))
    uv = jax.jit(lambda k: unet.init(k, rgb, False))(jax.random.PRNGKey(0))

    def unet_step(i, carry):
        _, proj_feat, _ = unet.apply(uv, rgb + 0.01 * i, False)
        return carry + jnp.sum(proj_feat[..., :1])

    bench("UNet forward 224^2 (fp32)", unet_step, jnp.float32(0))

    # bf16 variant
    uv16 = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, uv)

    def unet_bf16(i, carry):
        _, proj_feat, _ = unet.apply(uv16, (rgb + 0.01 * i).astype(jnp.bfloat16),
                                     False)
        return carry + jnp.sum(proj_feat.astype(jnp.float32)[..., :1])

    bench("UNet forward 224^2 (bf16)", unet_bf16, jnp.float32(0))


if __name__ == "__main__":
    main()
