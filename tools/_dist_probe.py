"""Probe: 2-process jax.distributed over CPU — psum and global arrays."""
import os
import sys

rank = int(sys.argv[1])
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address="localhost:12321",
                           num_processes=2, process_id=rank)
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

devs = jax.devices()
print(f"[rank {rank}] process_count={jax.process_count()} devices={len(devs)}",
      flush=True)
mesh = Mesh(np.array(devs).reshape(2, 1), ("dp", "model"))
sh = NamedSharding(mesh, P("dp"))
local = np.full((1, 4), float(rank + 1), np.float32)
garr = jax.make_array_from_process_local_data(sh, local, (2, 4))


@jax.jit
def f(x):
    return jnp.sum(x)


out = float(f(garr))
print(f"[rank {rank}] global sum = {out}", flush=True)
assert out == 12.0, out
print(f"[rank {rank}] OK", flush=True)
