#!/usr/bin/env python3
"""Microbench: bilinear x2 upsample lowering variants at the UNet decoder
shapes (round-5 VERDICT #9 — the upsample einsums are outside the fused
conv path).

Variants:
  einsum  current production: two dense [2h,h] interpolation matmuls
          (ops/pooling.upsample_bilinear_x2_nhwc) — h x 2h dense contraction
          for a 2-nonzero-per-row matrix.
  blend   gather-blend: out[o] = w0[o]*x[i0[o]] + w1[o]*x[i0[o]+1] on both
          axes via jnp.take with STATIC index vectors — 3 streamed passes,
          no wasted MXU FLOPs.

Timing: K-step loop-in-jit differential (see tools/microbench.py).
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=6)
    ap.add_argument("--dtype", default="bf16", choices=["bf16", "fp32"])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("BD_CACHE", "/tmp/bd_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from ws_mgmap_tpu.ops.pooling import (upsample_bilinear_x2_nhwc,
                                          upsample_bilinear_x2_nhwc_blend)

    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    b = args.batch
    # (h, w, c) of every upsample input in the UNet decoder @224^2
    shapes = [(7, 7, 512), (14, 14, 512), (28, 28, 256), (56, 56, 256),
              (112, 112, 128)]
    K1, K2 = 8, 136

    def timeit(fn, x):
        def loop(x, k):
            y0 = fn(x)

            def body(i, a):
                # carry-dependent input: forces true sequential execution
                # (an i-only perturbation lets XLA run iterations as dead
                # code / in parallel — measured ~0 ms per iteration)
                return fn(x + 1e-6 * a[:1, :1, :1, :1].sum().astype(x.dtype))

            return lax.fori_loop(0, k, body, y0)

        jl = jax.jit(loop, static_argnums=1)

        def sync(out):
            # host transfer: the only completion signal the async TPU
            # relay cannot acknowledge early (see bench.py host_sync)
            return float(np.asarray(jnp.sum(out[..., :1, :1])))

        sync(jl(x, K1))
        sync(jl(x, K2))
        t1 = min(_t(lambda: sync(jl(x, K1))) for _ in range(3))
        t2 = min(_t(lambda: sync(jl(x, K2))) for _ in range(3))
        return (t2 - t1) / (K2 - K1)

    def _t(f):
        t0 = time.perf_counter()
        f()
        return time.perf_counter() - t0

    rng = np.random.RandomState(0)
    total = {"einsum": 0.0, "blend": 0.0}
    for (h, w, c) in shapes:
        x = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32)).astype(dtype)
        te = timeit(upsample_bilinear_x2_nhwc, x)
        tb = timeit(upsample_bilinear_x2_nhwc_blend, x)
        total["einsum"] += te
        total["blend"] += tb
        print(f"[{h:3d}x{w:3d}x{c:3d}] einsum {te*1e3:7.3f} ms  "
              f"blend {tb*1e3:7.3f} ms  ({te/tb:4.2f}x)")
    print(f"[decoder total] einsum {total['einsum']*1e3:.3f} ms  "
          f"blend {total['blend']*1e3:.3f} ms "
          f"({total['einsum']/total['blend']:4.2f}x)")


if __name__ == "__main__":
    main()
