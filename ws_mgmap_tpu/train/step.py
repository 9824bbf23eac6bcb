"""Jitted teacher-forcing update step (data-parallel over a device mesh).

Equivalent of `DaggerTrainer._update_agent` (`dagger_trainer.py:505-541`)
re-designed for XLA: one fused jit computes forward (batched encoders +
time-scan core), loss, gradients, Adam update and BatchNorm stat updates.
Under a mesh, the batch is sharded over ``dp`` (episode axis) and parameters
are replicated; XLA inserts the gradient all-reduce (psum over ICI) — the
NCCL/DDP equivalent with zero backend code.

Frozen trunks (UNet rgb encoder, DD-PPO depth encoder —
`mg_map_policy.py:36-37`, `resnet_encoders.py:34-35`) get zero updates via
optax.multi_transform, mirroring requires_grad=False semantics while keeping
them in the checkpoint.
"""
from __future__ import annotations

from typing import Any, Callable, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import traverse_util
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ws_mgmap_tpu.models.policy import BasePolicy
from ws_mgmap_tpu.train.losses import MonitorConfig, total_loss

Array = jax.Array

FROZEN_PREFIXES = (("net", "rgb_encoder"), ("net", "depth_encoder"))


class TrainState(NamedTuple):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: Array


def make_optimizer(lr: float = 2.5e-4) -> optax.GradientTransformation:
    """Adam(lr) on trainable params, zero on frozen trunks
    (`common_trainer.py:67-69` + requires_grad=False)."""

    def label(params):
        flat = traverse_util.flatten_dict(params)
        labels = {
            k: "frozen" if any(k[: len(p)] == p for p in FROZEN_PREFIXES)
            else "train"
            for k in flat
        }
        return traverse_util.unflatten_dict(labels)

    return optax.multi_transform(
        {"train": optax.adam(lr), "frozen": optax.set_to_zero()}, label
    )


def create_train_state(variables: Dict[str, Any],
                       optimizer: optax.GradientTransformation) -> TrainState:
    params = variables["params"]
    return TrainState(
        params=params,
        batch_stats=variables.get("batch_stats", {}),
        opt_state=optimizer.init(params),
        step=jnp.zeros((), jnp.int32),
    )


def make_train_step(
    policy: BasePolicy,
    optimizer: optax.GradientTransformation,
    monitors: MonitorConfig,
    hidden_size: int,
    num_recurrent_layers: int = 2,
    remat: bool = False,
) -> Callable[[TrainState, Dict[str, Any]], Tuple[TrainState, Dict[str, Array]]]:
    """Returns update(state, batch) -> (state, metrics).

    batch: {"obs": {leaf: [N,T,...]}, "weights": [N,T],
            "not_done_masks": [N,T]}. Weights are 0 on padding; masks are 0
    at episode starts (`dagger_trainer.py:102-103`).

    ``remat=True`` rematerializes the forward in the backward pass
    (jax.checkpoint) — trades ~1.4x compute for dropping the multi-GB saved
    activations of long [N, T] batches (the `jax.checkpoint` lever from the
    TPU playbook; the reference has no equivalent and is capped by GPU RAM
    at `dagger_trainer.py:82-83`).
    """

    def update(state: TrainState, batch: Dict[str, Any]):
        obs = batch["obs"]
        weights = batch["weights"]
        masks = batch["not_done_masks"]
        n = weights.shape[0]
        h0 = jnp.zeros((num_recurrent_layers, n, hidden_size))

        def forward(params):
            variables = {"params": params}
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats
            return policy.apply(
                variables, obs, h0, masks, True,
                method=BasePolicy.forward_seq, mutable=["batch_stats"],
            )

        if remat:
            forward = jax.checkpoint(forward)

        def loss_fn(params):
            (pred, aux_out), mut = forward(params)
            loss, metrics = total_loss(pred, aux_out, obs, weights, monitors)
            return loss, (mut.get("batch_stats", {}), metrics)

        grads, (new_bs, metrics) = jax.grad(loss_fn, has_aux=True)(state.params)
        updates, new_opt = optimizer.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(new_params, new_bs, new_opt, state.step + 1)
        return new_state, metrics

    return update


def jit_train_step(update: Callable, mesh: Mesh) -> Callable:
    """Compile the update with DP shardings: state replicated (+donated),
    batch sharded over dp on the episode axis."""
    repl = NamedSharding(mesh, P())
    shard = NamedSharding(mesh, P("dp"))
    state_sh = TrainState(repl, repl, repl, repl)

    def spec_of(tree_sh, tree):
        return jax.tree.map(lambda _: tree_sh, tree,
                            is_leaf=lambda x: False)

    return jax.jit(
        update,
        in_shardings=(state_sh, shard),
        out_shardings=(state_sh, repl),
        donate_argnums=(0,),
    )
