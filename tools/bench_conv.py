#!/usr/bin/env python3
"""Microbench: lowering candidates for the UNet high-res decoder convs.

The profile (PERF.md) shows the 3x3 stride-1 SAME convs at 112^2/224^2 with
<=128 output channels run at ~15 TFLOP/s effective on v5e — the MXU is
under-filled (N=64 lanes) and the conv windowing at high spatial res is
overhead-bound. Candidate: space-to-depth(2) lowering — pad by 1, fold 2x2
pixel blocks into channels, run ONE 2x2 conv with an expanded (zero-padded)
kernel [2,2,4Cin,4Cout], unfold. Exactly the same math (each output tap set
is the original 3x3 support; 16/9 redundant zeros), but M=BHW/4, K=4Cin,
N=4Cout are MXU-shaped.

Loop-in-jit timing per tools/microbench.py (the axon relay acks
block_until_ready early; see PERF.md).
"""
import argparse
import functools
import time

import numpy as np


def s2d_kernel(w: np.ndarray) -> np.ndarray:
    """Expand a [3,3,Ci,Co] SAME-conv kernel to the s2d [2,2,4Ci,4Co] kernel."""
    kh, kw, ci, co = w.shape
    assert kh == 3 and kw == 3
    out = np.zeros((2, 2, 4 * ci, 4 * co), w.dtype)
    for i in range(2):
        for a in range(2):
            for p in range(2):
                u = 2 * i + a - p
                if not 0 <= u <= 2:
                    continue
                for j in range(2):
                    for b in range(2):
                        for q in range(2):
                            v = 2 * j + b - q
                            if not 0 <= v <= 2:
                                continue
                            out[i, j, (2 * a + b) * ci:(2 * a + b + 1) * ci,
                                (2 * p + q) * co:(2 * p + q + 1) * co] = w[u, v]
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=6)
    ap.add_argument("--steps", type=int, default=24)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from jax import lax

    B = args.batch
    K1, K2 = 2, 2 + args.steps
    rng = np.random.RandomState(0)
    print(f"device: {jax.devices()[0]}, batch {B}")

    def bench(name, step_fn, carry0, gflop):
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
        ms = (t2 - t1) / (K2 - K1) * 1e3
        print(f"{name:44s} {ms:8.3f} ms  ({gflop / ms * 1e3 / 1e3:7.1f} TFLOP/s eff)")
        return ms

    def conv_same(x, w):
        return lax.conv_general_dilated(
            x, w, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def conv_s2d(x, w2):
        b, h, wd, c = x.shape
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        x2 = xp.reshape(b, (h + 2) // 2, 2, (wd + 2) // 2, 2, c)
        x2 = x2.transpose(0, 1, 3, 2, 4, 5).reshape(
            b, (h + 2) // 2, (wd + 2) // 2, 4 * c)
        y2 = lax.conv_general_dilated(
            x2, w2, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        co4 = y2.shape[-1]
        y = y2.reshape(b, h // 2, wd // 2, 2, 2, co4 // 4)
        return y.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, wd, co4 // 4)

    for (H, CI, CO) in [(224, 192, 64), (112, 320, 128), (56, 320, 256),
                        (224, 64, 64)]:
        x32 = jnp.asarray(rng.randn(B, H, H, CI).astype(np.float32) * 0.1)
        w = (rng.randn(3, 3, CI, CO) * 0.05).astype(np.float32)
        w32 = jnp.asarray(w)
        w2_32 = jnp.asarray(s2d_kernel(w))
        x16, w16, w2_16 = (x32.astype(jnp.bfloat16), w32.astype(jnp.bfloat16),
                           w2_32.astype(jnp.bfloat16))
        gflop = 2 * B * H * H * 9 * CI * CO / 1e9

        # correctness of the lowering (on-device, fp32)
        ref = conv_same(x32, w32)
        got = conv_s2d(x32, w2_32)
        err = float(jnp.max(jnp.abs(ref - got)) / jnp.max(jnp.abs(ref)))
        print(f"-- {H}^2 {CI}->{CO}  ({gflop:.1f} GFLOP)  s2d rel-err {err:.2e}")

        def mk(fn, x, w):
            def step(i, c):
                y = fn(x * (1 + 1e-6 * i), w)
                return c + jnp.sum(y[..., :1].astype(jnp.float32))
            return step

        bench("  conv3x3 SAME fp32", mk(conv_same, x32, w32), jnp.float32(0), gflop)
        bench("  conv3x3 SAME bf16", mk(conv_same, x16, w16), jnp.float32(0), gflop)
        bench("  s2d2 conv fp32", mk(conv_s2d, x32, w2_32), jnp.float32(0), gflop)
        bench("  s2d2 conv bf16", mk(conv_s2d, x16, w2_16), jnp.float32(0), gflop)


if __name__ == "__main__":
    main()
