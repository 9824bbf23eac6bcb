"""Bilinear / nearest affine resampling with PyTorch `grid_sample` semantics.

The reference registers each egocentric observation into a persistent global
map with four `F.affine_grid` + `F.grid_sample` warps per simulator step
(reference `vlnce_baselines/common/rgb_mapping.py:53,65,136-137,248-249`) and
uses nearest-mode warps in the GT semantic-map sensor
(`habitat_extensions/sensors.py:392,403-405`).  Here the same math is
implemented as pure-JAX gather kernels over **channels-last** images (TPU
native layout), shape-static and vmap/jit friendly.

Semantics replicated exactly (fp32):
  * ``align_corners=False`` (torch>=1.3 default used by the reference),
  * zero padding outside the source image,
  * bilinear corner weighting / nearest = round-half-to-even,
  * torch ``affine_grid`` normalized coordinate convention
    (x = width axis, y = height axis, both in [-1, 1]).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

Array = jax.Array


def affine_grid(theta: Array, height: int, width: int, align_corners: bool = False) -> Array:
    """Torch-compatible ``F.affine_grid`` for 2-D images.

    Args:
      theta: [N, 2, 3] affine matrices acting on normalized (x, y, 1).
      height, width: output grid size.
    Returns:
      grid: [N, height, width, 2] with (..., 0)=x and (..., 1)=y in [-1, 1].
    """
    if align_corners:
        xs = jnp.linspace(-1.0, 1.0, width, dtype=jnp.float32)
        ys = jnp.linspace(-1.0, 1.0, height, dtype=jnp.float32)
    else:
        # pixel-center convention: x_j = (2j + 1)/W - 1
        xs = (2.0 * jnp.arange(width, dtype=jnp.float32) + 1.0) / width - 1.0
        ys = (2.0 * jnp.arange(height, dtype=jnp.float32) + 1.0) / height - 1.0
    gx, gy = jnp.meshgrid(xs, ys)  # [H, W]
    base = jnp.stack([gx, gy, jnp.ones_like(gx)], axis=-1)  # [H, W, 3]
    # grid[n,h,w,k] = sum_j theta[n,k,j] * base[h,w,j]
    return jnp.einsum("nkj,hwj->nhwk", theta, base)


def _unnormalize(coord: Array, size: int, align_corners: bool) -> Array:
    if align_corners:
        return (coord + 1.0) * 0.5 * (size - 1)
    return ((coord + 1.0) * size - 1.0) * 0.5


def grid_sample(
    img: Array,
    grid: Array,
    mode: str = "bilinear",
    align_corners: bool = False,
    impl: str = "taps",
) -> Array:
    """Torch-compatible ``F.grid_sample`` (zeros padding) on NHWC images.

    Args:
      img:  [N, H, W, C] source.
      grid: [N, Ho, Wo, 2] sampling locations, (...,0)=x, (...,1)=y in [-1,1].
      mode: "bilinear" or "nearest".
      impl: bilinear tap fetch — "taps" (default): four independent row
        gathers; "patch": ONE lax.gather of 2x2xC patches from a
        zero-padded copy. Identical taps and weights -> bitwise-equal
        outputs (tested in test_resample.py). Measured on v5e the row
        gathers win (0.88 vs 1.39 ms at [6,100,100,64] fp32): XLA lowers
        the 2x2xC slice gather with padded (8,128) tiles per slice.
    Returns:
      [N, Ho, Wo, C] resampled image.
    """
    n, h, w, c = img.shape
    ix = _unnormalize(grid[..., 0], w, align_corners)
    iy = _unnormalize(grid[..., 1], h, align_corners)

    def gather(iy_i: Array, ix_i: Array) -> Array:
        """Zero-padded gather at integer pixel coords [N, Ho, Wo] -> [N,Ho,Wo,C]."""
        valid = (ix_i >= 0) & (ix_i < w) & (iy_i >= 0) & (iy_i < h)
        xs = jnp.clip(ix_i, 0, w - 1)
        ys = jnp.clip(iy_i, 0, h - 1)
        flat_idx = (ys * w + xs).reshape(n, -1)  # [N, Ho*Wo]
        flat_img = img.reshape(n, h * w, c)
        out = jnp.take_along_axis(flat_img, flat_idx[..., None], axis=1)
        out = out.reshape(*ix_i.shape, c)
        return jnp.where(valid[..., None], out, 0.0)

    if mode == "nearest":
        # torch uses std::nearbyint == round-half-to-even, same as jnp.round
        xi = jnp.round(ix).astype(jnp.int32)
        yi = jnp.round(iy).astype(jnp.int32)
        return gather(yi, xi)

    if mode != "bilinear":
        raise ValueError(f"unsupported mode: {mode}")

    x0 = jnp.floor(ix)
    y0 = jnp.floor(iy)
    # coordinate math stays fp32; blend in the image dtype so reduced-
    # precision (bf16 rollout mode) maps are not silently promoted
    wx = (ix - x0)[..., None].astype(img.dtype)
    wy = (iy - y0)[..., None].astype(img.dtype)
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    if impl == "patch":
        # one-cell zero pad supplies the border taps; anything sampling
        # beyond the pad is fully outside the image -> masked to zero,
        # exactly torch's zeros padding
        padded = jnp.pad(img, ((0, 0), (1, 1), (1, 1), (0, 0)))
        ho, wo = ix.shape[1:3]
        starts = jnp.stack(
            [(y0i + 1).reshape(n, -1), (x0i + 1).reshape(n, -1)], axis=-1)
        dnums = jax.lax.GatherDimensionNumbers(
            offset_dims=(1, 2, 3), collapsed_slice_dims=(),
            start_index_map=(0, 1))

        def one(im, st):
            return jax.lax.gather(
                im, st, dnums, slice_sizes=(2, 2, c),
                mode=jax.lax.GatherScatterMode.CLIP)

        patch = jax.vmap(one)(padded, starts)  # [N, Ho*Wo, 2, 2, C]
        patch = patch.reshape(n, ho, wo, 2, 2, c)
        inside = ((ix > -1.0) & (ix < w) & (iy > -1.0) & (iy < h))
        patch = jnp.where(inside[..., None, None, None], patch, 0.0)
        v00 = patch[..., 0, 0, :]
        v01 = patch[..., 0, 1, :]
        v10 = patch[..., 1, 0, :]
        v11 = patch[..., 1, 1, :]
    else:
        v00 = gather(y0i, x0i)
        v01 = gather(y0i, x0i + 1)
        v10 = gather(y0i + 1, x0i)
        v11 = gather(y0i + 1, x0i + 1)

    top = v00 * (1.0 - wx) + v01 * wx
    bot = v10 * (1.0 - wx) + v11 * wx
    return top * (1.0 - wy) + bot * wy


def affine_warp(
    img: Array,
    theta: Array,
    out_hw: tuple[int, int] | None = None,
    mode: str = "bilinear",
    align_corners: bool = False,
) -> Array:
    """``grid_sample(img, affine_grid(theta))`` fused convenience wrapper."""
    h, w = out_hw if out_hw is not None else img.shape[1:3]
    return grid_sample(img, affine_grid(theta, h, w, align_corners), mode, align_corners)


def rotation_theta(angle: Array, clockwise_xy: bool = False) -> Array:
    """Affine matrices for a rotation about the image center.

    Matches the reference's two rotation conventions:
      * ``get_grid`` theta1 = [[cos, -sin, 0], [sin, cos, 0]]
        (reference `rgb_mapping.py:124-128`) -> ``clockwise_xy=False``.
      * ``RotateTensor`` A = [[cos, sin, 0], [-sin, cos, 0]]
        (reference `rgb_mapping.py:242-246`) -> ``clockwise_xy=True``.

    Args:
      angle: [N] rotation angles (radians).
    Returns:
      [N, 2, 3] theta for :func:`affine_warp`.
    """
    angle = jnp.asarray(angle, jnp.float32).reshape(-1)
    cos_t = jnp.cos(angle)
    sin_t = jnp.sin(angle)
    zeros = jnp.zeros_like(cos_t)
    if clockwise_xy:
        row0 = jnp.stack([cos_t, sin_t, zeros], axis=-1)
        row1 = jnp.stack([-sin_t, cos_t, zeros], axis=-1)
    else:
        row0 = jnp.stack([cos_t, -sin_t, zeros], axis=-1)
        row1 = jnp.stack([sin_t, cos_t, zeros], axis=-1)
    return jnp.stack([row0, row1], axis=1)


def translation_theta(tx: Array, ty: Array) -> Array:
    """Theta for a pure translation in normalized coords.

    Matches reference ``get_grid`` theta2 = [[1, 0, x], [0, 1, y]]
    (`rgb_mapping.py:130-134`).
    """
    tx = jnp.asarray(tx, jnp.float32).reshape(-1)
    ty = jnp.asarray(ty, jnp.float32).reshape(-1)
    ones = jnp.ones_like(tx)
    zeros = jnp.zeros_like(tx)
    row0 = jnp.stack([ones, zeros, tx], axis=-1)
    row1 = jnp.stack([zeros, ones, ty], axis=-1)
    return jnp.stack([row0, row1], axis=1)


@functools.partial(jax.jit, static_argnames=("mode", "align_corners"))
def rotate_about_center(img: Array, angle: Array, mode: str = "bilinear",
                        align_corners: bool = False) -> Array:
    """Reference ``RotateTensor.forward`` (`rgb_mapping.py:235-250`), NHWC."""
    return affine_warp(img, rotation_theta(angle, clockwise_xy=True),
                       mode=mode, align_corners=align_corners)


@functools.partial(jax.jit, static_argnames=("mode", "align_corners"))
def translate_norm(img: Array, tx: Array, ty: Array, mode: str = "bilinear",
                   align_corners: bool = False) -> Array:
    """Translate by (tx, ty) in normalized output coords (NHWC).

    General gather-based reference implementation; the hot path uses
    :func:`translate_norm_fast` (identical math, stencil formulation).
    """
    return affine_warp(img, translation_theta(tx, ty), mode=mode,
                       align_corners=align_corners)


@jax.jit
def translate_norm_fast(img: Array, tx: Array, ty: Array) -> Array:
    """Bilinear translation as a 4-tap stencil (TPU fast path).

    A pure translation under ``align_corners=False`` samples at
    ``ix = x + tx*W/2`` — an integer shift plus one constant fractional
    weight per sample. Instead of a 2-D element gather (measured 19 ms for
    [6,240,240,64] on v5e), do a per-sample row/col roll (contiguous-row
    dynamic slices) + constant-weight lerp + out-of-range masking.
    Matches :func:`translate_norm` to fp32 rounding of the coordinate math.
    """
    b, h, w, c = img.shape
    dx = jnp.asarray(tx, jnp.float32).reshape(-1) * (w / 2.0)
    dy = jnp.asarray(ty, jnp.float32).reshape(-1) * (h / 2.0)
    ix0 = jnp.floor(dx)
    iy0 = jnp.floor(dy)
    fx = (dx - ix0)[:, None, None, None].astype(img.dtype)
    fy = (dy - iy0)[:, None, None, None].astype(img.dtype)
    ix0 = ix0.astype(jnp.int32)
    iy0 = iy0.astype(jnp.int32)

    def one(im, sy, sx):
        # r[y, x] = im[y + sy, x + sx] (wrapped; wrapped taps masked below)
        return jnp.roll(im, shift=(-sy, -sx), axis=(0, 1))

    base = jax.vmap(one)(img, iy0, ix0)
    # single-step rolls: modular neighbors; every *valid* tap (per the masks
    # below) is un-wrapped and therefore exact.
    v00 = base
    v01 = jnp.roll(base, -1, axis=2)
    v10 = jnp.roll(base, -1, axis=1)
    v11 = jnp.roll(v10, -1, axis=2)

    ys = jnp.arange(h)[None, :, None, None]
    xs = jnp.arange(w)[None, None, :, None]
    sy = iy0[:, None, None, None]
    sx = ix0[:, None, None, None]
    vy0 = (ys + sy >= 0) & (ys + sy < h)
    vy1 = (ys + sy + 1 >= 0) & (ys + sy + 1 < h)
    vx0 = (xs + sx >= 0) & (xs + sx < w)
    vx1 = (xs + sx + 1 >= 0) & (xs + sx + 1 < w)

    top = jnp.where(vy0 & vx0, v00, 0.0) * (1.0 - fx) \
        + jnp.where(vy0 & vx1, v01, 0.0) * fx
    bot = jnp.where(vy1 & vx0, v10, 0.0) * (1.0 - fx) \
        + jnp.where(vy1 & vx1, v11, 0.0) * fx
    return top * (1.0 - fy) + bot * fy
