#!/usr/bin/env python3
"""Splat backends head-to-head at the production shape (B=6, 50k px, 64ch)."""
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

    from ws_mgmap_tpu.ops import projection
    from ws_mgmap_tpu.ops.pallas.splat import splat_pallas

    B = 6
    K1, K2 = 2, 26
    rng = np.random.RandomState(0)
    print(f"device: {jax.devices()[0]}, batch {B}")

    depth = jnp.asarray(rng.rand(B, 256, 256, 1).astype(np.float32) * 10)
    x_gp, y_gp, valid = projection.spatial_locs(depth, 100, 0.12)
    print("valid frac:", float(valid.mean()))
    feats = jnp.asarray(rng.randn(B, 224, 224, 64).astype(np.float32))

    iy = projection._subsample_indices(256, 224)
    ix = projection._subsample_indices(256, 224)
    xg = x_gp[:, iy[:, None], ix[None, :]]
    yg = y_gp[:, iy[:, None], ix[None, :]]
    va = valid[:, iy[:, None], ix[None, :]]
    inb = (xg >= 0) & (xg < 100) & (yg >= 0) & (yg < 100)
    inv = ~(va & inb)
    skip_ids = jnp.where(inv, -1, yg * 100 + xg).reshape(B, -1)

    def bench(name, step_fn, carry0):
        @functools.partial(jax.jit, static_argnames=("steps",))
        def loop(carry, steps):
            return lax.fori_loop(0, steps, step_fn, carry)

        def run(k):
            t0 = time.perf_counter()
            out = loop(carry0, k)
            float(np.asarray(jnp.sum(jax.tree.leaves(out)[0].reshape(-1)[:8]
                                     ).astype(jnp.float32)))
            return time.perf_counter() - t0

        run(K1); run(K2)
        t1 = min(run(K1) for _ in range(3))
        t2 = min(run(K2) for _ in range(3))
        print(f"{name:40s} {(t2 - t1) / (K2 - K1) * 1e3:8.3f} ms/step")

    def xla_step(i, c):
        out = projection.splat_to_ground(feats + 0.001 * i, x_gp, y_gp,
                                         valid, 100)
        return c + jnp.sum(out[..., :1])

    bench("xla segment_max drop-oob fp32", xla_step, jnp.float32(0))

    for dt, tag in ((jnp.float32, "fp32"), (jnp.bfloat16, "bf16")):
        f = feats.astype(dt).reshape(B, -1, 64)
        for g in (1, 2, 4):
            def step(i, c, f=f, g=g):
                out = splat_pallas(f + jnp.asarray(0.001 * i, dt), skip_ids,
                                   ego_size=100, chunk=1024, n_acc=g)
                return c + jnp.sum(out[..., :1].astype(jnp.float32))

            try:
                bench(f"pallas {tag} n_acc={g}", step, jnp.float32(0))
            except Exception as e:
                print(f"pallas {tag} n_acc={g}: FAILED {str(e)[:120]}")

    # correctness on device, fp32
    want = projection.splat_to_ground(feats, x_gp, y_gp, valid, 100)
    got = splat_pallas(feats.reshape(B, -1, 64), skip_ids, ego_size=100,
                       chunk=1024, n_acc=2)
    err = float(jnp.max(jnp.abs(want - got)))
    print("pallas-vs-xla max abs err:", err)


if __name__ == "__main__":
    main()
