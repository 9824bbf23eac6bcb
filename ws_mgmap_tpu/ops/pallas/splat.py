"""Pallas TPU kernel: ground-plane scatter-max splat.

Alternative backend for :func:`ws_mgmap_tpu.ops.projection.splat_to_ground`
(the torch_scatter.scatter_max replacement, reference
`rgb_mapping.py:179-232`). Keeps the per-cell max accumulator resident in
VMEM (100x100x64 fp32 = 2.5 MB) and streams pixel chunks through a serial
read-modify-write loop; cell ids ride as scalar-prefetch data in SMEM so the
row addresses are known to the scalar core ahead of the vector ops.

Measured on v5e (see PERF.md): XLA's native scatter lowering wins at the
production shape (50k pixels x 64ch), so `ops.projection` keeps
`jax.ops.segment_max` as the default; this kernel is the documented design
point and becomes profitable for narrower channel counts / fewer pixels.
Select with ``splat_backend="pallas"``.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

EPS_INVALID = -1e16


@functools.partial(jax.jit, static_argnames=("ego_size", "chunk"))
def splat_pallas(feats: Array, lin_ids: Array, ego_size: int = 100,
                 chunk: int = 2048) -> Array:
    """feats [B, P, C] fp32, lin_ids [B, P] int32 (invalid pre-masked to
    cell 0 with EPS values, exactly like ops.projection.splat_to_ground).

    Invalid pixels may be marked with id -1 (skipped entirely) or with
    id 0 + EPS feature values (the segment_max convention) — both yield the
    reference semantics. Returns [B, E, E, C] with untouched/eps cells
    zeroed.
    """
    b, p, c = feats.shape
    cells = ego_size * ego_size
    cells_pad = -(-cells // 8) * 8
    n_chunks = -(-p // chunk)
    p_pad = n_chunks * chunk
    if p_pad != p:
        # padding ids are -1: skipped by the kernel like invalid pixels
        feats = jnp.pad(feats, ((0, 0), (0, p_pad - p), (0, 0)),
                        constant_values=EPS_INVALID)
        lin_ids = jnp.pad(lin_ids, ((0, 0), (0, p_pad - p)),
                          constant_values=-1)

    # one sample per call: the scalar-prefetched ids (P * 4B) must fit SMEM
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((chunk, c), lambda ci, ids: (ci, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((cells_pad, c), lambda ci, ids: (0, 0),
                               memory_space=pltpu.VMEM),
    )

    def kernel(ids_ref, feats_ref, out_ref):
        ci = pl.program_id(0)

        @pl.when(ci == 0)
        def _():
            out_ref[:] = jnp.full_like(out_ref, EPS_INVALID)

        def body(q, _):
            idx = ids_ref[ci * chunk + q]

            # invalid pixels (id -1) only ever carry the EPS sentinel; a
            # cell receiving nothing stays at the EPS init and is zeroed by
            # the caller, exactly like an eps-only cell — so skipping them
            # is semantics-preserving and saves the dominant RMW cost.
            @pl.when(idx >= 0)
            def _():
                row = feats_ref[pl.ds(q, 1), :]
                cur = out_ref[pl.ds(idx, 1), :]
                out_ref[pl.ds(idx, 1), :] = jnp.maximum(cur, row)

            return 0

        jax.lax.fori_loop(0, chunk, body, 0)

    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((cells_pad, c), jnp.float32),
        interpret=jax.default_backend() == "cpu",
    )

    out = jax.lax.map(
        lambda args: call(args[0].astype(jnp.int32),
                          args[1].astype(jnp.float32)),
        (lin_ids, feats),
    )

    out = out[:, :cells, :]
    out = jnp.where(out <= EPS_INVALID, 0.0, out)
    return out.reshape(b, ego_size, ego_size, c)
