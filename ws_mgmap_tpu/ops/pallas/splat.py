"""Pallas TPU kernel: ground-plane scatter-max splat.

Alternative backend for :func:`ws_mgmap_tpu.ops.projection.splat_to_ground`
(the torch_scatter.scatter_max replacement, reference
`rgb_mapping.py:179-232`).

Design (v4): grid = (batch, pixel-chunks). The per-cell max accumulator
lives in VMEM as **n_acc independent copies**; pixel q updates copy
q % n_acc. A scatter's cost on TPU is the serialized read-modify-write
dependency chain — with a single accumulator the compiler must assume any
dynamic row store may alias the next dynamic load, so updates issue at full
RMW latency. With separate scratch refs the n_acc updates per unrolled
group are provably independent and overlap. Invalid pixels (id < 0) are
redirected branch-free to a trash row past the real cells (cropped by the
caller) — a predicated skip measured slower than the redundant RMW
(PERF.md). Cell ids stream through SMEM blocks so the scalar core has the
addresses; the final chunk of each batch element max-merges the copies
into that element's output block.

Accumulation is always fp32 (Mosaic cannot lower dynamic (1, C) bf16 row
RMWs). bf16 inputs are NOT pre-cast by the caller: each chunk block is
cast to fp32 inside the kernel (one vector pass through a (chunk, C)
scratch), which removes the full-feature-map fp32 materialization in HBM
that the bf16 rollout path otherwise pays.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

EPS_INVALID = -1e16


def _skip_invalid() -> bool:
    """Predicated-skip mode for invalid pixels (WS_SPLAT_SKIP=1): measured
    slower than the branch-free trash-row redirect on the 2025-era compile
    service; re-measure after service updates."""
    import os

    return os.environ.get("WS_SPLAT_SKIP", "0") == "1"


@functools.partial(jax.jit,
                   static_argnames=("ego_size", "chunk", "n_acc"))
def splat_pallas_packed(feats: Array, lin_ids: Array, ego_size: int = 100,
                        chunk: int = 1024, n_acc: int | None = None) -> Array:
    """Packed-row variant of :func:`splat_pallas` (v5).

    A (cells, 64) fp32 accumulator wastes half of every 128-lane VMEM row;
    packing TWO adjacent cells per row — cell 2r in lanes [0,64), cell 2r+1
    in lanes [64,128) — halves the real footprint of each accumulator copy,
    so n_acc=8 independent copies fit where v4 fit 4. Each pixel's RMW
    becomes a full-row maximum against a half-lane-masked value vector
    (the non-owned half is -inf, so it never wins); same op count per
    pixel, twice the interleaving of the serialized RMW chains.

    feats [B, P, C] fp32/bf16, lin_ids [B, P] int32 (-1 = invalid pixel).
    Returns [B, E, E, C] fp32, zero at never-written cells.
    """
    if n_acc is None:
        import os

        from ws_mgmap_tpu.ops.pallas import tuning

        # n_acc=4 is the VMEM ceiling: copies are (cells/2, 2C) fp32 =
        # 2.56 MB at the production shape, the out block is double-buffered
        # across batch grid steps, so 4 copies + dup + input ~ 13.9 MB.
        # (The unpacked v4 kernel at n_acc=4 exceeds scoped VMEM inside the
        # full update_map program at B=24.) Default n_acc=4: measured best
        # inside the full B=24 update_map program on the current compiler
        # service (881 f/s vs 813 at n_acc=2); earlier service builds
        # preferred 2 — WS_SPLAT_NACC overrides for re-tuning sweeps, and
        # safe mode falls back to 2 for strict-VMEM-accounting builds.
        env = os.environ.get("WS_SPLAT_NACC")
        n_acc = int(env) if env else 4
        if tuning.safe_mode():
            n_acc = min(n_acc, 2)
    b, p, c = feats.shape
    acc = jnp.float32
    cells = ego_size * ego_size
    assert cells % 2 == 0, ego_size
    rows = cells // 2
    # one trash row past the real cells absorbs invalid pixels
    rows_pad = -(-(rows + 1) // 8) * 8
    trash = rows
    n_chunks = -(-p // chunk)
    p_pad = n_chunks * chunk
    if p_pad != p:
        feats = jnp.pad(feats, ((0, 0), (0, p_pad - p), (0, 0)))
        lin_ids = jnp.pad(lin_ids, ((0, 0), (0, p_pad - p)),
                          constant_values=-1)

    groups = chunk // n_acc
    assert groups * n_acc == chunk, (chunk, n_acc)

    # ids pre-reshaped to [b * n_chunks, 1, chunk]: batch-size-independent
    # 4 KB SMEM blocks (see the v4 kernel note below)
    lin_ids = lin_ids.reshape(b * n_chunks, 1, chunk)
    grid = (b, n_chunks)
    in_specs = [
        pl.BlockSpec((1, 1, chunk), lambda bi, ci: (bi * n_chunks + ci, 0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((1, chunk, c), lambda bi, ci: (bi, ci, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_specs = pl.BlockSpec((1, rows_pad, 2 * c),
                             lambda bi, ci: (bi, 0, 0),
                             memory_space=pltpu.VMEM)

    # Per-pixel parity (which lane half the pixel owns), computed on the
    # XLA side as a (chunk, 1) fp32 column so the kernel can pre-mask the
    # duplicated rows in ONE vector pass over the chunk — the serialized
    # per-pixel RMW loop then matches the unpacked v4 kernel op-for-op
    # (the old per-RMW iota/compare/select cost ~75% extra step time).
    parity = (lin_ids & 1).astype(jnp.float32).reshape(
        b * n_chunks, chunk, 1)
    in_specs.append(
        pl.BlockSpec((1, chunk, 1), lambda bi, ci: (bi * n_chunks + ci, 0, 0),
                     memory_space=pltpu.VMEM))

    def kernel(ids_ref, feats_ref, par_ref, out_ref, *scratch):
        ci = pl.program_id(1)
        *scratch, dup_ref = scratch
        # duplicate the chunk's rows across both lane halves (fp32), with
        # the non-owned half pre-masked to EPS so it never wins a max;
        # invalid pixels go to the trash row, which is cropped anyway
        rows32 = feats_ref[0].astype(acc)
        par = par_ref[0]  # [chunk, 1], 0.0 = owns lanes [0,c), 1.0 = [c,2c)
        dup_ref[:, :c] = jnp.where(par == 0.0, rows32, EPS_INVALID)
        dup_ref[:, c:] = jnp.where(par == 1.0, rows32, EPS_INVALID)

        @pl.when(ci == 0)
        def _():
            full = jnp.full((rows_pad, 2 * c), EPS_INVALID, acc)
            out_ref[0] = full
            for a in scratch:
                a[:] = full

        def load(g, idx):
            if g == 0:
                return out_ref[0, pl.ds(idx, 1), :]
            return scratch[g - 1][pl.ds(idx, 1), :]

        def store(g, idx, val):
            if g == 0:
                out_ref[0, pl.ds(idx, 1), :] = val
            else:
                scratch[g - 1][pl.ds(idx, 1), :] = val

        def body(q, _):
            for g in range(n_acc):
                idx = ids_ref[0, 0, q * n_acc + g]
                r = jnp.where(idx < 0, trash, idx >> 1)
                row = dup_ref[pl.ds(q * n_acc + g, 1), :]
                store(g, r, jnp.maximum(load(g, r), row))
            return 0

        jax.lax.fori_loop(0, groups, body, 0)

        @pl.when(ci == n_chunks - 1)
        def _():
            merged = out_ref[0]
            for a in scratch:
                merged = jnp.maximum(merged, a[:])
            out_ref[0] = merged

    scratch_shapes = [pltpu.VMEM((rows_pad, 2 * c), acc)
                      for _ in range(n_acc - 1)]
    scratch_shapes.append(pltpu.VMEM((chunk, 2 * c), acc))

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=jax.ShapeDtypeStruct((b, rows_pad, 2 * c), acc),
        scratch_shapes=scratch_shapes,
        interpret=jax.default_backend() == "cpu",
    )(lin_ids.astype(jnp.int32), feats, parity)

    # packed row r = [cell 2r | cell 2r+1]: a row-major reshape unpacks
    out = out[:, :rows, :].reshape(b, cells, c)
    out = jnp.where(out <= jnp.asarray(EPS_INVALID, acc), 0.0, out)
    return out.reshape(b, ego_size, ego_size, c)


@functools.partial(jax.jit,
                   static_argnames=("ego_size", "chunk", "n_acc"))
def splat_pallas(feats: Array, lin_ids: Array, ego_size: int = 100,
                 chunk: int = 1024, n_acc: int | None = None) -> Array:
    """feats [B, P, C] (fp32 or bf16), lin_ids [B, P] int32 with invalid
    pixels marked -1.

    n_acc=None resolves to 4 (fastest measured) or 2 under
    :func:`tuning.safe_mode` (fits every pool worker's VMEM accounting).

    Returns [B, E, E, C] **fp32**; cells with no valid write are 0
    (torch_scatter zero-fill + the reference's eps replacement,
    `rgb_mapping.py:229-230`).
    """
    if n_acc is None:
        from ws_mgmap_tpu.ops.pallas import tuning

        n_acc = 2 if tuning.safe_mode() else 4
    b, p, c = feats.shape
    acc = jnp.float32
    cast_in = feats.dtype != acc
    cells = ego_size * ego_size
    # a trash row band past the real cells absorbs invalid pixels
    cells_pad = -(-(cells + 1) // 8) * 8
    trash = cells
    n_chunks = -(-p // chunk)
    p_pad = n_chunks * chunk
    if p_pad != p:
        feats = jnp.pad(feats, ((0, 0), (0, p_pad - p), (0, 0)))
        lin_ids = jnp.pad(lin_ids, ((0, 0), (0, p_pad - p)),
                          constant_values=-1)

    groups = chunk // n_acc
    assert groups * n_acc == chunk, (chunk, n_acc)

    # single call, grid (batch, chunks): out/acc blocks stay resident in
    # VMEM across a sample's chunks and flush once per sample; the ids
    # stream through SMEM one (sample, chunk) block (4 KB) at a time so
    # the scalar core has row addresses ahead of the vector RMWs. The ids
    # are pre-reshaped to [b * n_chunks, 1, chunk] so the block is
    # batch-size-independent — the old (b, chunk) layout scaled SMEM with
    # B, pushed the B=24 compile over the scoped limit, and cost ~23%
    # step time even where it compiled (block dims must be whole or
    # (8,128)-divisible, hence the singleton middle dim).
    lin_ids = lin_ids.reshape(b * n_chunks, 1, chunk)
    grid = (b, n_chunks)
    in_specs = [
        pl.BlockSpec((1, 1, chunk),
                     lambda bi, ci: (bi * n_chunks + ci, 0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((1, chunk, c), lambda bi, ci: (bi, ci, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_specs = pl.BlockSpec((1, cells_pad, c),
                             lambda bi, ci: (bi, 0, 0),
                             memory_space=pltpu.VMEM)

    def kernel(ids_ref, feats_ref, out_ref, *scratch):
        bi = pl.program_id(0)
        ci = pl.program_id(1)
        if cast_in:
            *scratch, cast_ref = scratch
            # one vector pass: the chunk's bf16 rows -> fp32 scratch, so
            # the dynamic row loads below stay fp32 (Mosaic-lowerable)
            cast_ref[:] = feats_ref[0].astype(acc)
            rows = cast_ref
        else:
            rows = None

        # the resident output block doubles as accumulator copy 0 — one
        # fewer grid-size VMEM buffer (B=24 blew the scoped limit otherwise)
        @pl.when(ci == 0)
        def _():
            full = jnp.full((cells_pad, c), EPS_INVALID, acc)
            out_ref[0] = full
            for a in scratch:
                a[:] = full

        def load(g, idx):
            if g == 0:
                return out_ref[0, pl.ds(idx, 1), :]
            return scratch[g - 1][pl.ds(idx, 1), :]

        def store(g, idx, val):
            if g == 0:
                out_ref[0, pl.ds(idx, 1), :] = val
            else:
                scratch[g - 1][pl.ds(idx, 1), :] = val

        skip = _skip_invalid()

        def body(q, _):
            # n_acc independent RMWs on separate refs -> no alias hazard,
            # the loads/stores overlap instead of serializing
            for g in range(n_acc):
                raw = ids_ref[0, 0, q * n_acc + g]
                idx = jnp.where(raw < 0, trash, raw)
                if cast_in:
                    row = rows[pl.ds(q * n_acc + g, 1), :]
                else:
                    row = feats_ref[0, pl.ds(q * n_acc + g, 1), :]
                if skip:
                    # ~75% of pixels are invalid (height filter + OOB):
                    # a scalar-predicated skip drops their RMWs entirely
                    @pl.when(raw >= 0)
                    def _(g=g, idx=idx, row=row):
                        store(g, idx, jnp.maximum(load(g, idx), row))
                else:
                    # branch-free trash-row redirect
                    store(g, idx, jnp.maximum(load(g, idx), row))
            return 0

        jax.lax.fori_loop(0, groups, body, 0)

        @pl.when(ci == n_chunks - 1)
        def _():
            merged = out_ref[0]
            for a in scratch:
                merged = jnp.maximum(merged, a[:])
            out_ref[0] = merged

    scratch_shapes = [pltpu.VMEM((cells_pad, c), acc)
                      for _ in range(n_acc - 1)]
    if cast_in:
        scratch_shapes.append(pltpu.VMEM((chunk, c), acc))

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=jax.ShapeDtypeStruct((b, cells_pad, c), acc),
        scratch_shapes=scratch_shapes,
        interpret=jax.default_backend() == "cpu",
    )(lin_ids.astype(jnp.int32), feats)

    out = out[:, :cells, :]
    out = jnp.where(out <= jnp.asarray(EPS_INVALID, acc), 0.0, out)
    return out.reshape(b, ego_size, ego_size, c)
