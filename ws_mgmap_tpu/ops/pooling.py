"""Adaptive pooling ops matching the torch semantics used by the reference."""
from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def adaptive_max_pool_lastdim(x: Array, out_size: int) -> Array:
    """`F.adaptive_max_pool1d` over the last dim (reference `rgb_mapping.py:83`).

    Torch bins: [floor(i*C/D), ceil((i+1)*C/D)). Identity when C == D (the
    default config pools the 64-ch UNet feature to map_depth=64).
    """
    c = x.shape[-1]
    if c == out_size:
        return x
    outs = []
    for i in range(out_size):
        start = (i * c) // out_size
        end = -(-((i + 1) * c) // out_size)  # ceil
        outs.append(jnp.max(x[..., start:end], axis=-1))
    return jnp.stack(outs, axis=-1)


def adaptive_avg_pool_lastdim(x: Array, out_size: int) -> Array:
    """`nn.AdaptiveAvgPool1d` over the last dim (reference `mg_map_policy.py:39,102`)."""
    c = x.shape[-1]
    if out_size == 1:
        return jnp.mean(x, axis=-1, keepdims=True)
    outs = []
    for i in range(out_size):
        start = (i * c) // out_size
        end = -(-((i + 1) * c) // out_size)
        outs.append(jnp.mean(x[..., start:end], axis=-1))
    return jnp.stack(outs, axis=-1)


def avg_pool2d_nhwc(x: Array, kernel: int, stride: int) -> Array:
    """`F.avg_pool2d` (reference `mg_map_policy.py:197`), NHWC layout."""
    # init must be a CONCRETE scalar (a traced constant falls off the
    # reduce_window_sum grad special case -> no autodiff rule)
    init = _np.zeros((), _np.dtype(x.dtype))[()]
    return jax.lax.reduce_window(
        x,
        init,
        jax.lax.add,
        (1, kernel, kernel, 1),
        (1, stride, stride, 1),
        "VALID",
    ) / _np.asarray(kernel * kernel, _np.dtype(x.dtype))[()]


def interpolate_nearest_nhwc(x: Array, out_hw: tuple[int, int]) -> Array:
    """`F.interpolate(mode='nearest')` (reference `policy.py:64`), NHWC.

    Torch nearest picks src index floor(dst * scale) with scale = in/out.
    """
    h, w = x.shape[1:3]
    oh, ow = out_hw
    iy = jnp.floor(jnp.arange(oh) * (h / oh)).astype(jnp.int32)
    ix = jnp.floor(jnp.arange(ow) * (w / ow)).astype(jnp.int32)
    return x[:, iy[:, None], ix[None, :], :]


def interpolate_area_nhwc(x: Array, out_hw: tuple[int, int]) -> Array:
    """`F.interpolate(mode='area')` == adaptive average pooling (reference
    `policy.py:77`), NHWC."""
    h, w = x.shape[1:3]
    oh, ow = out_hw
    if h % oh == 0 and w % ow == 0:
        return avg_pool2d_nhwc(x, h // oh, h // oh) if (h // oh) == (w // ow) else \
            jax.lax.reduce_window(
                x, 0.0, jax.lax.add,
                (1, h // oh, w // ow, 1), (1, h // oh, w // ow, 1), "VALID",
            ) / float((h // oh) * (w // ow))
    # General adaptive bins (torch adaptive_avg_pool2d semantics).
    rows = []
    for i in range(oh):
        y0, y1 = (i * h) // oh, -(-((i + 1) * h) // oh)
        cols = []
        for j in range(ow):
            x0, x1 = (j * w) // ow, -(-((j + 1) * w) // ow)
            cols.append(jnp.mean(x[:, y0:y1, x0:x1, :], axis=(1, 2)))
        rows.append(jnp.stack(cols, axis=1))
    return jnp.stack(rows, axis=1)


import functools as _functools

import numpy as _np


@_functools.lru_cache(maxsize=None)
def _upsample_x2_matrix(h: int) -> _np.ndarray:
    """[2h, h] interpolation matrix for align_corners=True bilinear x2."""
    oh = 2 * h
    ys = _np.arange(oh, dtype=_np.float32) * _np.float32((h - 1) / (oh - 1))
    y0 = _np.floor(ys).astype(_np.int64)
    y1 = _np.minimum(y0 + 1, h - 1)
    wy = ys - y0
    u = _np.zeros((oh, h), _np.float32)
    u[_np.arange(oh), y0] += 1.0 - wy
    u[_np.arange(oh), y1] += wy
    return u


def _upsample_x2_taps(h: int):
    """Static (i0, i1, w) tap vectors for align_corners=True bilinear x2:
    out[o] = (1-w[o]) * x[i0[o]] + w[o] * x[i1[o]]."""
    oh = 2 * h
    ys = _np.arange(oh, dtype=_np.float32) * _np.float32((h - 1) / (oh - 1))
    y0 = _np.floor(ys).astype(_np.int32)
    y1 = _np.minimum(y0 + 1, h - 1)
    return y0, y1, (ys - y0).astype(_np.float32)


def upsample_bilinear_x2_nhwc_blend(x: Array) -> Array:
    """Gather-blend lowering of the same align_corners=True bilinear x2:
    two static-index takes + a 2-tap weighted sum per axis. Streams ~3
    passes of the tensor instead of the dense [2h,h] interpolation matmul
    (which spends h/2 x the FLOPs on zero taps) — see tools/bench_upsample.py
    for the measured comparison at the UNet decoder shapes."""
    n, h, w, c = x.shape
    i0h, i1h, wh = _upsample_x2_taps(h)
    i0w, i1w, ww = _upsample_x2_taps(w)
    wh_ = jnp.asarray(wh).astype(x.dtype)[None, :, None, None]
    y = (jnp.take(x, jnp.asarray(i0h), axis=1) * (1 - wh_)
         + jnp.take(x, jnp.asarray(i1h), axis=1) * wh_)
    ww_ = jnp.asarray(ww).astype(x.dtype)[None, None, :, None]
    return (jnp.take(y, jnp.asarray(i0w), axis=2) * (1 - ww_)
            + jnp.take(y, jnp.asarray(i1w), axis=2) * ww_)


def upsample_bilinear_x2_nhwc(x: Array) -> Array:
    """`nn.Upsample(scale_factor=2, mode='bilinear', align_corners=True)`
    used throughout the reference UNet / MapDecoder (`unet_encoder.py:49`,
    `map_encoder.py:84`), NHWC.

    Formulated as two static interpolation-matrix contractions (separable
    bilinear) so it runs on the MXU instead of as an element gather.
    """
    n, h, w, c = x.shape
    uh = jnp.asarray(_upsample_x2_matrix(h)).astype(x.dtype)
    uw = jnp.asarray(_upsample_x2_matrix(w)).astype(x.dtype)
    # fp32 parity mode needs HIGHEST (single-pass fp32 matmul on TPU would
    # truncate to bf16); bf16 rollout mode must NOT ask for it — XLA
    # emulates the precision request and slows the pass ~5x
    prec = (jax.lax.Precision.HIGHEST if x.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)
    out = jnp.einsum("oh,bhwc->bowc", uh, x, precision=prec)
    return jnp.einsum("ow,bhwc->bhoc", uw, out, precision=prec)
