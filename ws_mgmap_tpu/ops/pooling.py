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
    return jax.lax.reduce_window(
        x,
        0.0,
        jax.lax.add,
        (1, kernel, kernel, 1),
        (1, stride, stride, 1),
        "VALID",
    ) / float(kernel * kernel)


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


def upsample_bilinear_x2_nhwc(x: Array) -> Array:
    """`nn.Upsample(scale_factor=2, mode='bilinear', align_corners=True)`
    used throughout the reference UNet / MapDecoder (`unet_encoder.py:49`,
    `map_encoder.py:84`), NHWC."""
    n, h, w, c = x.shape
    oh, ow = 2 * h, 2 * w
    # align_corners=True: src = dst * (in-1)/(out-1)
    ys = jnp.arange(oh, dtype=jnp.float32) * ((h - 1) / (oh - 1))
    xs = jnp.arange(ow, dtype=jnp.float32) * ((w - 1) / (ow - 1))
    y0 = jnp.floor(ys).astype(jnp.int32)
    x0 = jnp.floor(xs).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    wy = (ys - y0)[None, :, None, None]
    wx = (xs - x0)[None, None, :, None]
    top = x[:, y0][:, :, x0] * (1 - wx) + x[:, y0][:, :, x1] * wx
    bot = x[:, y1][:, :, x0] * (1 - wx) + x[:, y1][:, :, x1] * wx
    return top * (1 - wy) + bot * wy
