"""2-D diagonal Gaussian waypoint head.

Re-design of `DiagGaussian`/`FixedNormal`/`AddBias`
(`vlnce_baselines/common/distributions.py:21-71`): mean = Linear(features),
log-std = a learned bias initialized to zero (state-independent). ``mode`` is
the mean; ``log_probs`` sums over the action dim.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ws_mgmap_tpu.models.layers import tdense

Array = jax.Array


class Normal2D(NamedTuple):
    mean: Array  # [B, A]
    logstd: Array  # [B, A]

    def mode(self) -> Array:
        return self.mean

    def sample(self, key: jax.Array) -> Array:
        eps = jax.random.normal(key, self.mean.shape, self.mean.dtype)
        return self.mean + eps * jnp.exp(self.logstd)

    def log_probs(self, actions: Array) -> Array:
        var = jnp.exp(2.0 * self.logstd)
        lp = -0.5 * ((actions - self.mean) ** 2 / var) \
            - self.logstd - 0.5 * jnp.log(2.0 * jnp.pi)
        return jnp.sum(lp, axis=-1)

    def entropy(self) -> Array:
        return jnp.sum(self.logstd + 0.5 * jnp.log(2.0 * jnp.pi * jnp.e), axis=-1)


class DiagGaussian(nn.Module):
    num_inputs: int
    num_outputs: int = 2

    @nn.compact
    def __call__(self, x: Array) -> Normal2D:
        mean = tdense(self.num_inputs, self.num_outputs, name="fc_mean")(x)
        # reference stores AddBias._bias with shape [A, 1] (`:60-71`)
        logstd = self.param(
            "logstd._bias", nn.initializers.zeros, (self.num_outputs, 1)
        )
        logstd = jnp.broadcast_to(logstd.reshape(1, -1), mean.shape)
        return Normal2D(mean, logstd)


class CriticHead(nn.Module):
    """habitat `CriticHead`: Linear(h, 1), orthogonal weight, zero bias."""

    num_inputs: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        return nn.Dense(
            1,
            kernel_init=nn.initializers.orthogonal(),
            bias_init=nn.initializers.zeros,
            name="fc",
        )(x)
