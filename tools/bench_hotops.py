#!/usr/bin/env python3
"""Focused re-measurement after splat-drop / upsample-precision changes."""
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from ws_mgmap_tpu.models.unet import UNet
    from ws_mgmap_tpu.ops import projection, resample

    B = 6
    K1, K2 = 2, 26
    rng = np.random.RandomState(0)
    print(f"device: {jax.devices()[0]}, batch {B}")

    def bench(name, step_fn, carry0):
        @functools.partial(jax.jit, static_argnames=("steps",))
        def loop(carry, steps):
            return lax.fori_loop(0, steps, step_fn, carry)

        def run(k):
            t0 = time.perf_counter()
            out = loop(carry0, k)
            leaf = jax.tree.leaves(out)[0]
            float(np.asarray(jnp.sum(leaf.reshape(-1)[:8]).astype(jnp.float32)))
            return time.perf_counter() - t0

        run(K1); run(K2)
        t1 = min(run(K1) for _ in range(3))
        t2 = min(run(K2) for _ in range(3))
        ms = (t2 - t1) / (K2 - K1) * 1e3
        print(f"{name:42s} {ms:8.3f} ms/step")
        return ms

    # realistic depth: habitat [0,1] -> x10 meters
    depth = jnp.asarray(rng.rand(B, 256, 256, 1).astype(np.float32) * 10)
    x_gp, y_gp, valid = projection.spatial_locs(depth, 100, 0.12)
    print("valid frac:", float(valid.mean()))
    feats = jnp.asarray(rng.randn(B, 224, 224, 64).astype(np.float32))
    feats16 = feats.astype(jnp.bfloat16)

    def splat32(i, c):
        out = projection.splat_to_ground(feats + 0.001 * i, x_gp, y_gp,
                                         valid, 100)
        return c + jnp.sum(out[..., :1])

    def splat16(i, c):
        out = projection.splat_to_ground(feats16 + 0.001 * i, x_gp, y_gp,
                                         valid, 100)
        return c + jnp.sum(out[..., :1].astype(jnp.float32))

    bench("splat drop-oob fp32", splat32, jnp.float32(0))
    bench("splat drop-oob bf16", splat16, jnp.float32(0))

    ang = jnp.asarray(rng.uniform(-3, 3, B).astype(np.float32))
    ego16 = jnp.asarray(rng.rand(B, 100, 100, 64).astype(np.float32)
                        ).astype(jnp.bfloat16)

    def rot16_native(i, c):
        e = resample.rotate_about_center(ego16 + 0.001 * i, ang)
        return c + jnp.sum(e[..., :1].astype(jnp.float32))

    def rot16_via32(i, c):
        x = (ego16 + 0.001 * i).astype(jnp.float32)
        e = resample.rotate_about_center(x, ang).astype(jnp.bfloat16)
        return c + jnp.sum(e[..., :1].astype(jnp.float32))

    bench("rotate bf16 native gather", rot16_native, jnp.float32(0))
    bench("rotate bf16 via fp32 gather", rot16_via32, jnp.float32(0))

    unet = UNet()
    rgb = jnp.asarray(rng.randint(0, 255, (B, 224, 224, 3)).astype(np.float32))
    uv = jax.jit(lambda k: unet.init(k, rgb, False))(jax.random.PRNGKey(0))
    uv16 = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, uv)
    rgb16 = rgb.astype(jnp.bfloat16)

    def unet32(i, c):
        _, pf, _ = unet.apply(uv, rgb + 0.01 * i, False)
        return c + jnp.sum(pf[..., :1])

    def unet16(i, c):
        _, pf, _ = unet.apply(uv16, rgb16 + 0.01 * i, False)
        return c + jnp.sum(pf.astype(jnp.float32)[..., :1])

    bench("UNet fp32 (HIGHEST upsample)", unet32, jnp.float32(0))
    bench("UNet bf16 (DEFAULT upsample)", unet16, jnp.float32(0))


if __name__ == "__main__":
    main()
