"""Device mesh + sharding helpers.

The reference's only gradient parallelism is NCCL data-parallel DDP
(`common_trainer.py:35-44,61-66`; SURVEY §2.5). The TPU-native equivalent is
a 1-D (or 2-D, with a currently-trivial model axis) `jax.sharding.Mesh`:
episodes shard over the ``dp`` axis, parameters/optimizer state replicate,
and XLA inserts the gradient all-reduce over ICI automatically when the
jitted update consumes a ``dp``-sharded batch. Multi-host extends the same
mesh over DCN via ``jax.distributed`` — no user-visible backend code.
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(dp: Optional[int] = None, model: int = 1) -> Mesh:
    """Create a (dp, model) mesh; dp defaults to all local devices."""
    devices = jax.devices()
    if dp is None:
        dp = max(1, len(devices) // model)
    grid = mesh_utils.create_device_mesh((dp, model), devices[: dp * model])
    return Mesh(grid, ("dp", "model"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def dp_sharded(mesh: Mesh) -> NamedSharding:
    """Shard the leading (episode) axis over dp."""
    return NamedSharding(mesh, P("dp"))


def shard_batch(mesh: Mesh, batch: Any) -> Any:
    """Place a host batch with every leaf sharded on axis 0 over dp.

    Single-process: a plain sharded device_put. Multi-process (one jax
    process per host, `jax.distributed`): each process passes its LOCAL
    shard (the rank-sharded loader batch) and the leaves assemble into
    global arrays of leading size local * process_count — the TPU-native
    equivalent of DDP's per-rank batches (`common_trainer.py:61-66`).
    """
    if jax.process_count() == 1:
        sh = dp_sharded(mesh)
        return jax.tree.map(lambda x: jax.device_put(x, sh), batch)

    sh = dp_sharded(mesh)
    nproc = jax.process_count()

    def put(x):
        x = np.asarray(x)
        gshape = (x.shape[0] * nproc,) + x.shape[1:]
        return jax.make_array_from_process_local_data(sh, x, gshape)

    return jax.tree.map(put, batch)


def replicate(mesh: Mesh, tree: Any) -> Any:
    """Replicate a (host-identical) tree onto every device of the mesh."""
    sh = replicated(mesh)
    if jax.process_count() == 1:
        return jax.tree.map(lambda x: jax.device_put(x, sh), tree)

    def put(x):
        x = np.asarray(x)
        return jax.make_array_from_callback(x.shape, sh, lambda idx: x[idx])

    return jax.tree.map(put, tree)


def dp_size(mesh: Mesh) -> int:
    return int(np.prod([mesh.shape[a] for a in ("dp",)]))


def best_dp(batch_size: int, max_devices: Optional[int] = None) -> int:
    """Largest device count that evenly divides the episode batch."""
    n = max_devices or len(jax.devices())
    for d in range(min(n, batch_size), 0, -1):
        if batch_size % d == 0:
            return d
    return 1
