"""Pallas TPU kernel: ground-plane scatter-max splat.

Alternative backend for :func:`ws_mgmap_tpu.ops.projection.splat_to_ground`
(the torch_scatter.scatter_max replacement, reference
`rgb_mapping.py:179-232`).

Design (v3): grid = (batch, pixel-chunks). The per-cell max accumulator
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
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

EPS_INVALID = -1e16


@functools.partial(jax.jit,
                   static_argnames=("ego_size", "chunk", "n_acc"))
def splat_pallas(feats: Array, lin_ids: Array, ego_size: int = 100,
                 chunk: int = 1024, n_acc: int = 2) -> Array:
    """feats [B, P, C], lin_ids [B, P] int32 with invalid pixels marked -1.

    Returns [B, E, E, C]; cells with no valid write are 0 (torch_scatter
    zero-fill + the reference's eps replacement, `rgb_mapping.py:229-230`).
    """
    b, p, c = feats.shape
    dtype = feats.dtype
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
    # VMEM across a sample's chunks and flush once per sample; the
    # scalar-prefetched ids (B * P * 4B) live in SMEM so the scalar core
    # has row addresses ahead of the vector RMWs
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, n_chunks),
        in_specs=[
            pl.BlockSpec((1, chunk, c), lambda bi, ci, ids: (bi, ci, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, cells_pad, c),
                               lambda bi, ci, ids: (bi, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((cells_pad, c), dtype) for _ in range(n_acc)
        ],
    )

    def kernel(ids_ref, feats_ref, out_ref, *accs):
        bi = pl.program_id(0)
        ci = pl.program_id(1)

        @pl.when(ci == 0)
        def _():
            for acc in accs:
                acc[:] = jnp.full_like(acc, EPS_INVALID)

        def body(q, _):
            base = ci * chunk + q * n_acc
            # n_acc independent RMWs on separate refs -> no alias hazard,
            # the loads/stores overlap instead of serializing
            for g in range(n_acc):
                idx = ids_ref[bi, base + g]
                idx = jnp.where(idx < 0, trash, idx)
                row = feats_ref[0, pl.ds(q * n_acc + g, 1), :]
                cur = accs[g][pl.ds(idx, 1), :]
                accs[g][pl.ds(idx, 1), :] = jnp.maximum(cur, row)
            return 0

        jax.lax.fori_loop(0, groups, body, 0)

        @pl.when(ci == n_chunks - 1)
        def _():
            merged = accs[0][:]
            for acc in accs[1:]:
                merged = jnp.maximum(merged, acc[:])
            out_ref[0] = merged

    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, cells_pad, c), dtype),
        interpret=jax.default_backend() == "cpu",
    )(lin_ids.astype(jnp.int32), feats)

    out = out[:, :cells, :]
    out = jnp.where(out <= jnp.asarray(EPS_INVALID, dtype), 0.0, out)
    return out.reshape(b, ego_size, ego_size, c)
