#!/usr/bin/env python3
"""B=24 splat variants: packed v6 vs sub-batched v4 (groups of <=8).

The unpacked v4 kernel at n_acc=4 is ~2x faster per frame than the packed
kernel at B=6 but Mosaic lane-pads its 64-lane accumulators to 128 when
compiled at B=24 (25.4 MB -> OOM). Hypothesis: calling the SAME b<=8
kernel over sub-batch groups via lax.map keeps the no-padding compilation
while covering B=24 (grid is (b, chunks) per call; block shapes identical
to the B=6 winner).
"""
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

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("BD_CACHE", "/tmp/bd_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

    from ws_mgmap_tpu.ops import projection
    from ws_mgmap_tpu.ops.pallas.splat import (splat_pallas,
                                               splat_pallas_packed)

    B = int(os.environ.get("SPLAT_B", "24"))
    K1, K2 = 2, 26
    rng = np.random.RandomState(0)
    print(f"device: {jax.devices()[0]}, batch {B}")

    depth = jnp.asarray(rng.rand(B, 256, 256, 1).astype(np.float32) * 10)
    x_gp, y_gp, valid = projection.spatial_locs(depth, 100, 0.12)
    feats = jnp.asarray(rng.randn(B, 224, 224, 64).astype(np.float32))

    iy = projection._subsample_indices(256, 224)
    ix = projection._subsample_indices(256, 224)
    xg = x_gp[:, iy[:, None], ix[None, :]]
    yg = y_gp[:, iy[:, None], ix[None, :]]
    va = valid[:, iy[:, None], ix[None, :]]
    inb = (xg >= 0) & (xg < 100) & (yg >= 0) & (yg < 100)
    inv = ~(va & inb)
    ids = jnp.where(inv, -1, yg * 100 + xg).reshape(B, -1).astype(jnp.int32)

    def bench(name, step_fn):
        @functools.partial(jax.jit, static_argnames=("steps",))
        def loop(carry, steps):
            return lax.fori_loop(0, steps, step_fn, carry)

        def run(k):
            t0 = time.perf_counter()
            out = loop(jnp.float32(0), k)
            float(np.asarray(out))
            return time.perf_counter() - t0

        try:
            run(K1); run(K2)
        except Exception as e:
            print(f"{name:44s} FAILED {str(e)[:140]}")
            return
        t1 = min(run(K1) for _ in range(3))
        t2 = min(run(K2) for _ in range(3))
        print(f"{name:44s} {(t2 - t1) / (K2 - K1) * 1e3:8.3f} ms/step")

    f16 = feats.astype(jnp.bfloat16).reshape(B, -1, 64)
    P = f16.shape[1]

    def packed_step(i, c):
        out = splat_pallas_packed(
            f16 + jnp.asarray(0.001 * i, jnp.bfloat16), ids,
            ego_size=100, chunk=1024, n_acc=4)
        return c + jnp.sum(out[..., :1].astype(jnp.float32))

    bench("packed v6 n_acc=4 (current B=24 default)", packed_step)

    def v4_direct(i, c):
        out = splat_pallas(f16 + jnp.asarray(0.001 * i, jnp.bfloat16), ids,
                           ego_size=100, chunk=1024, n_acc=4)
        return c + jnp.sum(out[..., :1].astype(jnp.float32))

    bench("v4 n_acc=4 direct (expect VMEM fail)", v4_direct)

    for g in (6, 8, 12):
        if B % g:
            continue

        def v4_sub(i, c, g=g):
            fg = (f16 + jnp.asarray(0.001 * i, jnp.bfloat16)).reshape(
                B // g, g, P, 64)
            ig = ids.reshape(B // g, g, P)
            out = lax.map(
                lambda xs: splat_pallas(xs[0], xs[1], ego_size=100,
                                        chunk=1024, n_acc=4), (fg, ig))
            return c + jnp.sum(out[..., :1].astype(jnp.float32))

        bench(f"v4 n_acc=4 lax.map groups of {g}", v4_sub)

    # correctness: sub-batched v4 vs XLA segment_max reference
    want = projection.splat_to_ground(feats, x_gp, y_gp, valid, 100)
    fg = feats.reshape(4, 6, P, 64) if B == 24 else feats.reshape(1, B, P, 64)
    ig = ids.reshape(fg.shape[0], fg.shape[1], P)
    got = lax.map(
        lambda xs: splat_pallas(xs[0].reshape(xs[0].shape[0], -1, 64),
                                xs[1], ego_size=100, chunk=1024, n_acc=4),
        (fg.reshape(fg.shape[0], fg.shape[1], P, 64), ig))
    got = got.reshape(B, 100, 100, 64)
    err = float(jnp.max(jnp.abs(want - got)))
    print(f"sub-batched v4 vs XLA max abs err: {err}")


if __name__ == "__main__":
    main()
