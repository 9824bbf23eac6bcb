"""Pinhole back-projection and ground-plane scatter-max splat.

TPU-native re-implementation of the reference's per-step egocentric
projection (reference `vlnce_baselines/common/rgb_mapping.py`):

  * :func:`spatial_locs` — `ComputeSpatialLocs.forward` (`rgb_mapping.py:142-176`):
    pinhole back-projects the depth image (already scaled to meters by the
    caller, the reference multiplies by 10 at `rgb_mapping.py:37`) into 3-D,
    keeps points with height -1.5 < Y < 0.1, and bins X/Z into an
    ``ego_size`` x ``ego_size`` grid at ``local_scale`` m/cell.
  * :func:`splat_to_ground` — `ProjectToGroundPlane.forward`
    (`rgb_mapping.py:179-232`): scatter-max of per-pixel features into the
    ego grid. The reference uses the CUDA `torch_scatter.scatter_max`; here
    it is `jax.ops.segment_max` (XLA scatter on TPU), vmapped over batch.
  * :func:`project_egocentric` — `Projection.forward` (`rgb_mapping.py:253-268`):
    splat followed by a rotation to the agent's heading.

All images are channels-last (NHWC). All shapes static.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from ws_mgmap_tpu.ops.resample import rotate_about_center

Array = jax.Array

# Sentinel used by the reference to make max-pooling ignore invalid writes
# (`rgb_mapping.py:188`).
EPS_INVALID = -1e16


def spatial_locs(
    depth: Array,
    ego_size: int,
    local_scale: float,
    fov_deg: float = 90.0,
    out_hw: Tuple[int, int] | None = None,
    heading: Array | None = None,
) -> Tuple[Array, Array, Array]:
    """Back-project a depth map to ego-grid cell coordinates.

    Args:
      depth: [B, H, W, 1] depth in meters (caller applies the x10 scaling,
        see reference `rgb_mapping.py:37`).
      ego_size: egocentric map size in cells (100).
      local_scale: meters per cell (0.12).
      out_hw: optional (Hf, Wf) feature resolution. When set, the depth is
        index-subsampled to it FIRST (`rgb_mapping.py:189-193` semantics)
        and the pinhole math runs at feature resolution — bitwise identical
        to computing at depth resolution and subsampling after (the same
        elementwise ops on the same values), but gathers one [B,Hf,Wf]
        array instead of three and skips the math on dropped pixels.
      heading: optional [B] angles. When given, the ground coordinates are
        rotated about the map center BEFORE cell binning — the rotate-in-
        splat fast path (see :func:`project_egocentric`). The convention
        matches ``rotate_about_center(grid, heading)`` applied after an
        unrotated splat: that warp reads out(r) = in(A r) with
        A = [[cos, sin], [-sin, cos]] in (x, y), so a pixel that lands at
        p unrotated must land at r = A^-1 p = [[cos, -sin], [sin, cos]] p.
    Returns:
      (x_gp, y_gp, valid): each [B, out H, out W]; integer cell coords and
      validity.
    """
    b, h, w, _ = depth.shape
    z = depth[..., 0]  # [B, H, W]
    # Camera intrinsics as in the reference (`rgb_mapping.py:148-151`):
    # note cx is derived from image height and fy from width, which is
    # identical for the square 256x256 depth sensor.
    cx, cy = h / 2.0, w / 2.0
    fx = (h / 2.0) / jnp.tan(jnp.deg2rad(fov_deg / 2.0))
    fy = (w / 2.0) / jnp.tan(jnp.deg2rad(fov_deg / 2.0))

    xs = jnp.arange(w, dtype=jnp.float32)                         # [W]
    ys = jnp.arange(h, 0, -1, dtype=jnp.float32)                  # [H]
    if out_hw is not None and out_hw != (h, w):
        oh, ow = out_hw
        iy = _subsample_indices(h, oh)
        ix = _subsample_indices(w, ow)
        z = z[:, iy[:, None], ix[None, :]]
        xs = xs[ix]
        ys = ys[iy]
    xx = ((xs - cx) / fx)[None, None, :]                          # [1,1,W']
    yy = ((ys - cy) / fy)[None, :, None]                          # [1,H',1]

    x3d = xx * z
    y3d = yy * z

    valid = (z != 0) & (y3d > -1.5) & (y3d < 0.1)

    half = (ego_size - 1) / 2.0
    u = x3d / local_scale
    v = -(z / local_scale)
    if heading is not None:
        c = jnp.cos(heading.reshape(-1))[:, None, None]
        s = jnp.sin(heading.reshape(-1))[:, None, None]
        u, v = c * u - s * v, s * u + c * v
    # torch .round() rounds half-to-even; jnp.round matches.
    x_gp = jnp.round(u + half).astype(jnp.int32)
    y_gp = jnp.round(v + half).astype(jnp.int32)
    return x_gp, y_gp, valid


def _subsample_indices(src: int, dst: int) -> Array:
    """Reference index subsampling (`rgb_mapping.py:189-193`): floor(i * K)."""
    k = src / dst
    return (jnp.arange(dst, dtype=jnp.float32) * k).astype(jnp.int32)


def _subgroup_size(b: int) -> int:
    """Largest group size <=6 that evenly divides b (0 if none >=2).

    Sub-batching lets the unpacked v4 splat kernel serve B>8: each
    lax.map call compiles at the small-batch shape where Mosaic doesn't
    lane-pad the 64-lane accumulators (B=24 groups of 8 already exceed
    scoped VMEM on the 2026-08 compile service, so the cap is 6).
    """
    for g in (6, 5, 4, 3, 2):
        if b % g == 0:
            return g
    return 0


def splat_to_ground(
    feats: Array,
    x_gp: Array,
    y_gp: Array,
    valid: Array,
    ego_size: int,
    backend: str = "xla",
) -> Array:
    """Scatter-max per-pixel features onto the egocentric ground grid.

    Args:
      feats: [B, Hf, Wf, C] pixel features (e.g. UNet proj feature at 224x224).
      x_gp, y_gp, valid: [B, Hd, Wd] from :func:`spatial_locs` (depth res).
    Returns:
      [B, ego_size, ego_size, C]; cells with no valid writes are 0
      (torch_scatter fills untouched with 0 and the reference zeroes
      eps-only cells at `rgb_mapping.py:229-230`).
    """
    b, hf, wf, c = feats.shape
    hd, wd = x_gp.shape[1:]
    if (hd, wd) != (hf, wf):
        iy = _subsample_indices(hd, hf)
        ix = _subsample_indices(wd, wf)
        x_gp = x_gp[:, iy[:, None], ix[None, :]]
        y_gp = y_gp[:, iy[:, None], ix[None, :]]
        valid = valid[:, iy[:, None], ix[None, :]]

    in_bounds = (
        (x_gp >= 0) & (x_gp < ego_size) & (y_gp >= 0) & (y_gp < ego_size)
    )
    invalid = ~(valid & in_bounds)

    # The reference masks invalid pixels to an EPS sentinel and scatters
    # them to cell (0,0) (`rgb_mapping.py:206-212`), then zeroes eps-only
    # cells (`:229-230`). Exactly equivalent — and ~2x cheaper on TPU — is
    # to DROP invalid pixels from the scatter entirely (out-of-range
    # segment ids are discarded by XLA): valid maxima are unchanged
    # (eps values never won a max), and cells with no valid writes come
    # back -inf, zeroed below just like eps-only/untouched cells. This also
    # removes the full-size eps-masking pass over the feature tensor.
    num_cells = ego_size * ego_size
    lin = jnp.where(invalid, num_cells, y_gp * ego_size + x_gp)  # [B, Hd, Wd]

    if backend == "auto":
        # the interleaved-accumulator Pallas kernel beats XLA's scatter
        # 2.5x on TPU at the production shape (PERF.md); its (1, C) row
        # RMWs need fp32 rows with full-sublane channel counts
        on_accel = jax.default_backend() != "cpu"
        backend = "pallas" if on_accel and c % 64 == 0 else "xla"

    if backend == "pallas":
        import os

        from ws_mgmap_tpu.ops.pallas.splat import (splat_pallas,
                                                   splat_pallas_packed)

        skip_ids = jnp.where(invalid, -1, y_gp * ego_size + x_gp)
        # bf16 feats go in natively — the kernel casts each chunk block to
        # fp32 in VMEM, skipping a full-feature-map fp32 round-trip in HBM.
        # Kernel choice, measured INSIDE the full update_map program on the
        # 2026-08 compile service (the standalone winner can differ — the
        # accumulator VMEM squeezes the neighboring fusions):
        #   b<=8  -> unpacked v4 at n_acc=4: compiles clean with no lane
        #            padding and runs fastest (948 vs 799 f/s at B=6).
        #   b>8   -> v4 accumulators lane-pad 64->128 past scoped VMEM, but
        #            the SAME b<=8 kernel lax.map'ed over sub-batch groups
        #            of <=6 keeps the no-padding compilation ("v4sub"):
        #            standalone B=24 splat 6.04 vs packed's 6.58 ms/step,
        #            full update_map 21.2 vs 22.5-23.7 ms/step = 1131 vs
        #            1014-1067 f/s (tools/bench_splat_b24.py,
        #            tools/bench_breakdown.py; groups of 8/12 still exceed
        #            VMEM). The packed 2-cells-per-row kernel serves batch
        #            sizes with no divisor in [2,6].
        # WS_SPLAT_KERNEL / WS_SPLAT_NACC override for re-tuning sweeps
        # after compiler-service updates; consumers wrap compiles in
        # tuning.with_compile_fallback, which flips safe mode (n_acc=2
        # everywhere) if a service build rejects the aggressive configs.
        kern = os.environ.get("WS_SPLAT_KERNEL") or (
            "v4" if b <= 8 else
            ("v4sub" if _subgroup_size(b) else "packed"))
        if kern == "packed":
            out = splat_pallas_packed(
                feats.reshape(b, -1, c), skip_ids.reshape(b, -1),
                ego_size=ego_size)
        elif kern == "v4sub":
            from ws_mgmap_tpu.ops.pallas import tuning
            env = os.environ.get("WS_SPLAT_NACC")
            n_acc = int(env) if env else (2 if tuning.safe_mode() else 4)
            g = _subgroup_size(b)
            fg = feats.reshape(b // g, g, -1, c)
            ig = skip_ids.reshape(b // g, g, -1)
            out = jax.lax.map(
                lambda xs: splat_pallas(
                    xs[0], xs[1], ego_size=ego_size, n_acc=n_acc),
                (fg, ig))
            out = out.reshape(b, ego_size, ego_size, c)
        else:
            from ws_mgmap_tpu.ops.pallas import tuning
            env = os.environ.get("WS_SPLAT_NACC")
            n_acc = int(env) if env else (2 if tuning.safe_mode() else 4)
            out = splat_pallas(
                feats.reshape(b, -1, c), skip_ids.reshape(b, -1),
                ego_size=ego_size, n_acc=n_acc)
        return out.astype(feats.dtype)

    def one(feat_flat: Array, ids_flat: Array) -> Array:
        return jax.ops.segment_max(
            feat_flat, ids_flat, num_segments=num_cells,
            indices_are_sorted=False, unique_indices=False,
        )

    out = jax.vmap(one)(feats.reshape(b, -1, c), lin.reshape(b, -1))
    # Untouched segments are -inf; eps replacement as in the reference.
    out = jnp.where(out <= jnp.asarray(EPS_INVALID, out.dtype), 0.0, out)
    return out.reshape(b, ego_size, ego_size, c)


@functools.partial(jax.jit,
                   static_argnames=("ego_size", "local_scale", "backend",
                                    "rotate_coords"))
def project_egocentric(
    feats: Array,
    depth_m: Array,
    heading: Array,
    ego_size: int = 100,
    local_scale: float = 0.12,
    backend: str = "xla",
    rotate_coords: bool = False,
) -> Array:
    """Full per-frame projection: pinhole -> splat -> rotate to heading.

    Mirrors `Projection.forward` (`rgb_mapping.py:264-268`); the caller passes
    ``heading = -compass`` exactly like `Mapping.project_feat_to_map`
    (`rgb_mapping.py:37`).

    ``rotate_coords=True`` is the TPU fast path: instead of splatting into
    an axis-aligned grid and bilinearly warping the whole [B,E,E,C] result
    (a full HBM round trip + element gather), each pixel's ground
    coordinate is rotated before cell binning and the splat writes the
    rotated grid directly. Content-equivalent to within the half-cell
    rounding the splat already performs — and sharper, since features land
    in whole cells instead of being bilinearly smeared over 4 — but not
    bitwise equal to the reference chain, so it is opt-in (production bf16
    rollout; the fp32 parity mode keeps the literal splat-then-rotate).
    """
    if rotate_coords:
        x_gp, y_gp, valid = spatial_locs(depth_m, ego_size, local_scale,
                                         out_hw=feats.shape[1:3],
                                         heading=heading)
        return splat_to_ground(feats, x_gp, y_gp, valid, ego_size, backend)
    x_gp, y_gp, valid = spatial_locs(depth_m, ego_size, local_scale,
                                     out_hw=feats.shape[1:3])
    grid = splat_to_ground(feats, x_gp, y_gp, valid, ego_size, backend)
    return rotate_about_center(grid, heading)
