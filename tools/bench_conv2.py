#!/usr/bin/env python3
"""Microbench round 2: matmul-decomposed lowerings for the UNet decoder convs.

PERF.md's ceiling analysis shows the decoder-tail 3x3 SAME convs run at
~30 TFLOP/s effective on v5e while their lane-fill roofline (N=64 fills half
the 128 MXU result lanes) allows ~100 TFLOP/s bf16. Candidates measured here:

  xla-conv        lax.conv_general_dilated (what the model uses today)
  tap-matmul      y = sum_{dy,dx} shift(x)[.] @ W[dy,dx] — 9 accumulating
                  dot_generals on [B*H*W, Cin] slices of the padded input
  im2col-matmul   one dot_general [B*H*W, 9*Cin] @ [9*Cin, Cout] on an
                  explicitly gathered patch matrix (HBM-heavy; lower bound
                  for what a Pallas kernel that builds patches in VMEM gets)

All bf16 inputs with fp32 accumulation (preferred_element_type), matching the
rollout mode. Loop-in-jit timing (see tools/microbench.py docstring).
"""
import argparse
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
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--shapes", default="", help="comma list of H to keep")
    ap.add_argument("--impls", default="xla,tap,im2col,pallas")
    ap.add_argument("--skip-check", action="store_true",
                    help="skip the fp32 correctness cross-check (saves "
                         "compiles; tests/test_pallas_conv.py covers math)")
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
        @jax.jit
        def loop(carry, steps):  # steps traced -> ONE compile for K1 and K2
            return lax.fori_loop(0, steps, step_fn, carry)

        def run(k):
            k = jnp.int32(k)
            t0 = time.perf_counter()
            out = loop(carry0, k)
            float(np.asarray(jnp.sum(jax.tree.leaves(out)[0].reshape(-1)[:8]
                                     ).astype(jnp.float32)))
            return time.perf_counter() - t0

        run(K1); run(K2)
        t1 = min(run(K1) for _ in range(3))
        t2 = min(run(K2) for _ in range(3))
        ms = (t2 - t1) / (K2 - K1) * 1e3
        print(f"{name:44s} {ms:8.3f} ms  ({gflop / ms:7.1f} TFLOP/s eff)",
              flush=True)
        return ms

    def conv_xla(x, w):
        return lax.conv_general_dilated(
            x, w, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32).astype(x.dtype)

    def conv_tap(x, w):
        b, h, wd, ci = x.shape
        co = w.shape[-1]
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        acc = jnp.zeros((b * h * wd, co), jnp.float32)
        for dy in range(3):
            for dx in range(3):
                sl = lax.slice(xp, (0, dy, dx, 0), (b, dy + h, dx + wd, ci))
                acc = acc + lax.dot_general(
                    sl.reshape(b * h * wd, ci), w[dy, dx],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
        return acc.astype(x.dtype).reshape(b, h, wd, co)

    def conv_im2col(x, w):
        b, h, wd, ci = x.shape
        co = w.shape[-1]
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        cols = [lax.slice(xp, (0, dy, dx, 0), (b, dy + h, dx + wd, ci))
                for dy in range(3) for dx in range(3)]
        patches = jnp.concatenate(cols, axis=-1).reshape(b * h * wd, 9 * ci)
        y = lax.dot_general(patches, w.reshape(9 * ci, co),
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
        return y.astype(x.dtype).reshape(b, h, wd, co)

    shapes = [(224, 192, 64), (224, 64, 64), (112, 320, 128), (56, 320, 256)]
    if args.shapes:
        sel = set(int(s) for s in args.shapes.split(","))
        shapes = [s for s in shapes if s[0] in sel]
    for (H, CI, CO) in shapes:
        x32 = jnp.asarray(rng.randn(B, H, H, CI).astype(np.float32) * 0.1)
        w32 = jnp.asarray((rng.randn(3, 3, CI, CO) * 0.05).astype(np.float32))
        x16, w16 = x32.astype(jnp.bfloat16), w32.astype(jnp.bfloat16)
        gflop = 2 * B * H * H * 9 * CI * CO / 1e9

        from ws_mgmap_tpu.ops.pallas.conv import conv3x3_bn_relu

        def mk_pallas(impl_):
            def conv_pallas(x, w):
                co_ = w.shape[-1]
                return conv3x3_bn_relu(
                    x, w, jnp.ones((co_,), jnp.float32),
                    jnp.zeros((co_,), jnp.float32), relu=False, impl=impl_)
            return conv_pallas

        impls = {"xla": conv_xla, "tap": conv_tap, "im2col": conv_im2col,
                 "pallas": mk_pallas("dots"),
                 "pallas-im2col": mk_pallas("im2col")}
        impls = {k: impls[k] for k in args.impls.split(",")}

        if not args.skip_check:
            ref = conv_xla(x32, w32)
            for nm, fn in impls.items():
                if nm == "xla":
                    continue
                got = fn(x32, w32)
                err = float(jnp.max(jnp.abs(ref - got)) / jnp.max(jnp.abs(ref)))
                print(f"   {nm} rel-err {err:.2e}", flush=True)
                assert err < 1e-3, (nm, err)
        print(f"-- {H}^2 {CI}->{CO}  ({gflop:.1f} GFLOP)", flush=True)

        def mk(fn, x, w):
            def step(i, c):
                y = fn(x * (1 + 1e-6 * i), w)
                return c + jnp.sum(y[..., :1].astype(jnp.float32))
            return step

        for nm, fn in impls.items():
            bench(f"{nm} bf16 {H}^2 {CI}->{CO}",
                  mk(fn, x16, w16), jnp.zeros((), jnp.float32), gflop)


if __name__ == "__main__":
    main()
