"""Pallas TPU kernel: fused 3x3 stride-1 SAME conv + folded BN + ReLU.

Why: the UNet decoder tail (reference `unet_encoder.py:30-111`; our
`models/unet.py`) spends its time in 3x3 SAME convs at 224^2/112^2 with
Cout in {64, 128} — XLA's conv lowering runs them at ~30 TFLOP/s effective
on v5e while the MXU lane-fill roofline (N=Cout fills Cout/128 of the
result lanes) allows ~100 TFLOP/s at N=64. This kernel reformulates the
conv as 9 accumulating [rows*W, Cin] @ [Cin, Cout] matmuls over a
VMEM-resident sliding row window, and fuses the frozen-BatchNorm affine
(folded to a per-channel scale/bias by the caller) and the ReLU into the
matmul epilogue — removing the separate BN/ReLU elementwise passes over
the 224^2 activation entirely (reference applies BN+ReLU after every conv,
`unet_encoder.py:6-11`).

Halo handling: grid = (batch, row_tiles + 1), one row-tile lag. Step i
holds tile i-1 in VMEM scratch plus the last row of tile i-2; together
with the first row of the streamed-in tile i this forms the (bh+2)-row
halo window needed to produce output tile i-1 — no padded copy of the
input is ever materialized in HBM.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def fold_bn(kernel: Array, conv_bias: Array | None, gamma: Array,
            beta: Array, mean: Array, var: Array,
            eps: float = 1e-5) -> tuple[Array, Array]:
    """Fold frozen-BN(conv(x)) into (scale, bias): bn(conv(x) + b0) ==
    conv(x) * scale + bias with scale/bias per output channel (fp32)."""
    gamma = gamma.astype(jnp.float32)
    scale = gamma * jax.lax.rsqrt(var.astype(jnp.float32) + eps)
    b0 = 0.0 if conv_bias is None else conv_bias.astype(jnp.float32)
    bias = beta.astype(jnp.float32) + (b0 - mean.astype(jnp.float32)) * scale
    del kernel
    return scale, bias


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _vmem_bytes(bh: int, wd: int, ci: int, co: int, itemsize: int,
                impl: str = "im2col", res: bool = False) -> int:
    """Estimate scoped-VMEM for one step incl. Mosaic lane padding to 128."""
    cp = _round_up(ci, 128)
    np_ = _round_up(co, 128)
    win = (bh + 2) * (wd + 2) * cp * itemsize
    lastrow = wd * cp * itemsize
    x_pipe = 2 * bh * wd * cp * itemsize
    out_pipe = 2 * bh * wd * np_ * itemsize
    acc = bh * wd * np_ * 4
    wmat = 9 * cp * np_ * itemsize
    patches = bh * wd * _round_up(9 * ci, 128) * itemsize \
        if impl == "im2col" else 0
    res_pipe = 2 * bh * wd * np_ * itemsize if res else 0
    return win + lastrow + x_pipe + out_pipe + acc + wmat + patches + res_pipe


_VMEM_BUDGET = 12 * 1024 * 1024  # leave headroom under the 16 MB scoped cap

# Measured-fastest row-tile heights on v5e (tools/bench_conv2.py +
# /tmp/sweep_bh-style sweeps; PERF.md). Keyed by (H, Cin). Re-measured on
# the 2026-08 compile service: bh=16 wins BOTH 224^2 decoder shapes
# (192->64: 0.94 vs 1.25 ms at the old bh=8; 64->64: 0.55 vs 0.80 ms at
# the old bh=32) even though the static VMEM estimate is pessimistic for
# them (compiles and runs fine; bh>=28 at Cin=192 no longer compiles).
_BH_TABLE = {
    (224, 64): 16,
    (224, 192): 16,
}


@functools.lru_cache(maxsize=1)
def _tuned_table_applies() -> bool:
    """The _BH_TABLE rows were measured on v5e; on any other TPU generation
    (different VMEM size / MXU shape) fall back to the guarded generic
    search instead of silently mistuning (VERDICT r2 weak #8)."""
    try:
        kind = jax.devices()[0].device_kind.lower()
    except Exception:
        return False
    return "v5 lite" in kind or "v5e" in kind or "v5lite" in kind


def _pick_bh(h: int, wd: int = 0, ci: int = 0, co: int = 0,
             itemsize: int = 2, impl: str = "im2col",
             res: bool = False) -> int:
    from ws_mgmap_tpu.ops.pallas import tuning

    tuned = None if tuning.safe_mode() else _BH_TABLE.get((h, ci))
    # the table rows were measured in bf16 (the production rollout dtype);
    # fp32 inputs double the window/patch footprint and bh=16 @ Cin=192
    # exceeds scoped VMEM — fall through to the guarded generic search
    if (tuned and h % tuned == 0 and impl == "im2col" and itemsize == 2
            and _tuned_table_applies()):
        return tuned
    for bh in (16, 14, 8, 7, 4, 2, 1):
        if h % bh == 0 and (not wd or _vmem_bytes(bh, wd, ci, co, itemsize,
                                                  impl, res) <= _VMEM_BUDGET):
            return bh
    return 1


@functools.partial(jax.jit, static_argnames=("relu", "bh", "impl"))
def conv3x3_bn_relu(x: Array, w: Array, scale: Array, bias: Array,
                    relu: bool = True, bh: int | None = None,
                    impl: str = "im2col",
                    residual: Array | None = None,
                    x2: Array | None = None) -> Array:
    """y = [relu](conv3x3_same_s1(concat([x, x2]), w) * scale + bias
    [+ residual]), NHWC.

    Args:
      x: [B, H, W, Cin1] (bf16 or fp32).
      w: [3, 3, Cin1(+Cin2), Cout] (HWIO, conv bias folded into `bias`).
      scale, bias: [Cout] fp32 per-channel epilogue (use :func:`fold_bn`).
      residual: optional [B, H, W, Cout] skip added before the ReLU
        (resnet BasicBlock epilogue, `models/resnet.py`).
      x2: optional [B, H, W, Cin2] second input, concatenated channel-wise
        — streamed as its own operand so the UNet decoder's
        upsample+skip concat (`unet_encoder.py:77-110`) is never
        materialized in HBM.
    """
    b, h, wd, ci1 = x.shape
    ci2 = 0 if x2 is None else x2.shape[-1]
    ci = ci1 + ci2
    co = w.shape[-1]
    assert residual is None or x2 is None  # never combined in the model
    if bh is None:
        bh = _pick_bh(h, wd, ci, co, jnp.dtype(x.dtype).itemsize, impl,
                      residual is not None)
    assert h % bh == 0, (h, bh)
    n_tiles = h // bh
    dtype = x.dtype

    # [3, 3, Ci, Co] -> [9*Ci, Co], tap t = dy*3+dx at rows [t*Ci, (t+1)*Ci)
    wmat = w.reshape(9 * ci, co).astype(dtype)
    scale2 = scale.reshape(1, co).astype(jnp.float32)
    bias2 = bias.reshape(1, co).astype(jnp.float32)

    grid = (b, n_tiles + 1)

    in_specs = [
        pl.BlockSpec((1, bh, wd, ci1),
                     lambda bi, i: (bi, jnp.minimum(i, n_tiles - 1), 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((9 * ci, co), lambda bi, i: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, co), lambda bi, i: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, co), lambda bi, i: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    operands = [x, wmat, scale2, bias2]
    if residual is not None:
        # residual tile for *output* block i-1 (lags the x stream by one)
        in_specs.append(pl.BlockSpec(
            (1, bh, wd, co),
            lambda bi, i: (bi, jnp.maximum(i - 1, 0), 0, 0),
            memory_space=pltpu.VMEM))
        operands.append(residual.astype(dtype))
    if x2 is not None:
        in_specs.append(pl.BlockSpec(
            (1, bh, wd, ci2),
            lambda bi, i: (bi, jnp.minimum(i, n_tiles - 1), 0, 0),
            memory_space=pltpu.VMEM))
        operands.append(x2.astype(dtype))
    out_spec = pl.BlockSpec(
        (1, bh, wd, co),
        lambda bi, i: (bi, jnp.maximum(i - 1, 0), 0, 0),
        memory_space=pltpu.VMEM)

    def kernel(x_ref, w_ref, s_ref, b_ref, *rest):
        res_ref = x2_ref = None
        if residual is not None:
            res_ref, o_ref, *scratch = rest
        elif x2 is not None:
            x2_ref, o_ref, *scratch = rest
        else:
            o_ref, *scratch = rest
        if x2 is not None:
            win, lastrow, win2, lastrow2 = scratch
        else:
            win, lastrow = scratch
        i = pl.program_id(1)
        cur = x_ref[0]  # [bh, W, Ci1]

        def stage_window(wref, top_src, cur_src):
            # window rows [bh+2, W+2, C] for output tile i-1:
            #   row 0       = last row of tile i-2 (zeros when i == 1)
            #   rows 1..bh  = tile i-1 (already in window from last step)
            #   row bh+1    = first row of tile i (zeros when i == n_tiles)
            top = jnp.where(i == 1, jnp.zeros_like(top_src[0:1]),
                            top_src[0:1])
            bot = jnp.where(i == n_tiles,
                            jnp.zeros_like(cur_src[0:1]), cur_src[0:1])
            wref[0:1, 1:wd + 1] = top
            wref[bh + 1:bh + 2, 1:wd + 1] = bot

        @pl.when(i > 0)
        def _compute():
            stage_window(win, lastrow, cur)
            if x2_ref is not None:
                stage_window(win2, lastrow2, x2_ref[0])

            def tap_slices(dy, dx):
                parts = [win[dy:dy + bh, dx:dx + wd].reshape(bh * wd, ci1)]
                if x2_ref is not None:
                    parts.append(
                        win2[dy:dy + bh, dx:dx + wd].reshape(bh * wd, ci2))
                return parts

            if impl == "im2col":
                # one K=9*Ci matmul: near-full MXU K-fill, accumulation
                # stays inside the MXU instead of 9 fp32 VPU adds
                patches = jnp.concatenate(
                    [p for dy in range(3) for dx in range(3)
                     for p in tap_slices(dy, dx)], axis=1)
                acc = jax.lax.dot_general(
                    patches, w_ref[:],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            else:
                acc = jnp.zeros((bh * wd, co), jnp.float32)
                for dy in range(3):
                    for dx in range(3):
                        tap = jnp.concatenate(tap_slices(dy, dx), axis=1)
                        acc = acc + jax.lax.dot_general(
                            tap,
                            w_ref[(dy * 3 + dx) * ci:(dy * 3 + dx + 1) * ci, :],
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
            y = acc * s_ref[:] + b_ref[:]
            if res_ref is not None:
                y = y + res_ref[0].astype(jnp.float32).reshape(bh * wd, co)
            if relu:
                y = jnp.maximum(y, 0.0)
            o_ref[0] = y.astype(dtype).reshape(bh, wd, co)

        # stage tile i for the next step
        @pl.when(i < n_tiles)
        def _stage():
            lastrow[0:1] = win[bh:bh + 1, 1:wd + 1]
            win[1:bh + 1, 1:wd + 1] = cur
            if x2_ref is not None:
                lastrow2[0:1] = win2[bh:bh + 1, 1:wd + 1]
                win2[1:bh + 1, 1:wd + 1] = x2_ref[0]

        @pl.when(i == 0)
        def _zero_halo():
            win[:, 0:1] = jnp.zeros_like(win[:, 0:1])
            win[:, wd + 1:wd + 2] = jnp.zeros_like(win[:, wd + 1:wd + 2])
            if x2_ref is not None:
                win2[:, 0:1] = jnp.zeros_like(win2[:, 0:1])
                win2[:, wd + 1:wd + 2] = jnp.zeros_like(
                    win2[:, wd + 1:wd + 2])

    scratch_shapes = [
        pltpu.VMEM((bh + 2, wd + 2, ci1), dtype),
        pltpu.VMEM((1, wd, ci1), dtype),
    ]
    if x2 is not None:
        scratch_shapes += [
            pltpu.VMEM((bh + 2, wd + 2, ci2), dtype),
            pltpu.VMEM((1, wd, ci2), dtype),
        ]
    flops = 2 * b * h * wd * 9 * ci * co
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((b, h, wd, co), dtype),
        scratch_shapes=scratch_shapes,
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=x.size * x.dtype.itemsize + out_bytes(b, h, wd, co,
                                                                 dtype),
            transcendentals=0),
        interpret=jax.default_backend() == "cpu",
    )(*operands)
    return out


def out_bytes(b: int, h: int, w: int, c: int, dtype) -> int:
    return b * h * w * c * jnp.dtype(dtype).itemsize


def fused_conv_eligible(x_shape, kernel: int, stride: int,
                        groups: int = 1) -> bool:
    """Fast-path gate used by ConvBNReLU: TPU backend, 3x3 s1, groups=1,
    and a spatial extent worth a kernel launch."""
    if kernel != 3 or stride != 1 or groups != 1:
        return False
    _, h, w, ci = x_shape
    # ci < 8 (the RGB stem): VMEM pads lanes 3->128, inflating the streamed
    # bytes 43x — XLA's conv wins there (0.31 vs 0.64 ms @224^2, measured).
    # _pick_bh always returns a divisor of h, so gate on the tile actually
    # being efficient: a bh=1 kernel runs h+1 sequential grid steps and
    # loses to XLA's conv on awkward heights (ADVICE r2).
    return ci >= 8 and h >= 8 and w >= 8 and _pick_bh(h) >= 4


_MODE = "auto"  # "auto": bf16-on-accelerator only | "on" | "off"


def set_fused_conv_mode(mode: str) -> None:
    """"auto" (default) fuses only the bf16 rollout path on accelerators —
    the fp32 parity path keeps XLA's conv bit-exactly; "on"/"off" force."""
    global _MODE
    assert mode in ("auto", "on", "off"), mode
    _MODE = mode


def fused_conv_active(x_shape, dtype, kernel: int, stride: int,
                      groups: int = 1) -> bool:
    if _MODE == "off" or not fused_conv_eligible(x_shape, kernel, stride,
                                                 groups):
        return False
    if _MODE == "on":
        return True
    return jax.default_backend() != "cpu" and dtype == jnp.bfloat16
