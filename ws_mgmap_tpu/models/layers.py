"""Building-block Flax helpers with torch-compatible naming and init.

Module names mirror the reference's ``nn.Sequential`` indices ("0", "1", ...)
and attribute names so a PyTorch ``state_dict`` key like
``layer0_1x1.0.weight`` maps 1:1 onto the flax param path
``layer0_1x1/0/kernel`` (see :mod:`ws_mgmap_tpu.utils.convert`).

Initializers replicate torch defaults (kaiming-uniform with a=sqrt(5), bias
uniform +-1/sqrt(fan_in)) so from-scratch training starts from the same
statistics as the reference.
"""
from __future__ import annotations

import math
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

Array = jax.Array


# ---------------------------------------------------------------------------
# torch-default initializers
# ---------------------------------------------------------------------------
def torch_conv_kernel_init(key, shape, dtype=jnp.float32):
    """torch Conv2d default: kaiming_uniform(a=sqrt(5)); flax [kh,kw,I,O]."""
    kh, kw, in_c, _ = shape
    fan_in = in_c * kh * kw
    gain = math.sqrt(2.0 / 6.0)  # leaky_relu gain with a=sqrt(5)
    bound = gain * math.sqrt(3.0 / fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_dense_kernel_init(key, shape, dtype=jnp.float32):
    fan_in = shape[0]
    gain = math.sqrt(2.0 / 6.0)
    bound = gain * math.sqrt(3.0 / fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_bias_init(fan_in: int) -> Callable:
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


# ---------------------------------------------------------------------------
# factories (NHWC) — used inside @nn.compact with explicit torch-style names
# ---------------------------------------------------------------------------
def tconv(
    in_c: int,
    out_c: int,
    kernel: int,
    stride: int = 1,
    padding: int = 0,
    bias: bool = True,
    name: Optional[str] = None,
    groups: int = 1,
) -> nn.Conv:
    return nn.Conv(
        features=out_c,
        kernel_size=(kernel, kernel),
        strides=(stride, stride),
        padding=[(padding, padding)] * 2,
        use_bias=bias,
        feature_group_count=groups,
        kernel_init=torch_conv_kernel_init,
        bias_init=torch_bias_init((in_c // groups) * kernel * kernel),
        name=name,
    )


def tbn(train: bool, name: Optional[str] = None) -> nn.BatchNorm:
    """torch `nn.BatchNorm2d` (momentum 0.1 -> flax 0.9, eps 1e-5)."""
    return nn.BatchNorm(
        use_running_average=not train, momentum=0.9, epsilon=1e-5, name=name
    )


def tgn(groups: int, name: Optional[str] = None) -> nn.GroupNorm:
    """torch `nn.GroupNorm(groups, C)` (eps 1e-5)."""
    return nn.GroupNorm(num_groups=groups, epsilon=1e-5, name=name)


def tdense(in_f: int, out_f: int, bias: bool = True, name: Optional[str] = None) -> nn.Dense:
    return nn.Dense(
        out_f,
        use_bias=bias,
        kernel_init=torch_dense_kernel_init,
        bias_init=torch_bias_init(in_f),
        name=name,
    )


def max_pool_3x3s2(x: Array) -> Array:
    """torch `nn.MaxPool2d(kernel_size=3, stride=2, padding=1)` (NHWC)."""
    return nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])


class TConvTranspose(nn.Module):
    """torch `nn.ConvTranspose2d` (NHWC); params kernel/bias at this level.

    torch weight layout [in, out, kh, kw]; we store flax [kh, kw, out, in]?
    No: we store [kh, kw, in, out] and the converter handles the transpose +
    spatial flip torch's transposed conv implies.
    """

    in_c: int
    features: int
    kernel: int
    stride: int
    padding: int
    use_bias: bool = False

    @nn.compact
    def __call__(self, x: Array) -> Array:
        k, s, p = self.kernel, self.stride, self.padding
        # 'kernel_t' leaf tells the checkpoint converter this is a
        # transposed conv (torch weight [in, out, kh, kw] + spatial flip).
        kernel = self.param(
            "kernel_t", torch_conv_kernel_init, (k, k, self.in_c, self.features)
        )
        pad = k - 1 - p
        y = jax.lax.conv_transpose(
            x,
            kernel,
            strides=(s, s),
            padding=[(pad, pad), (pad, pad)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            bias = self.param(
                "bias", torch_bias_init(self.in_c * k * k), (self.features,)
            )
            y = y + bias
        return y


class ConvBNReLU(nn.Module):
    """The reference's ``convrelu`` block (`unet_encoder.py:6-11`):
    Conv2d -> BatchNorm2d -> ReLU, children named "0"/"1" like Sequential."""

    in_c: int
    features: int
    kernel: int
    padding: int
    stride: int = 1

    @nn.compact
    def __call__(self, x: Array, train: bool,
                 x2: Optional[Array] = None) -> Array:
        """``x2``: optional second input, channel-concatenated to ``x``
        (the UNet decoder's upsample+skip concat) — the fused kernel
        streams it separately so the concat is never materialized."""
        from ws_mgmap_tpu.ops.pallas import conv as pconv

        full_c = x.shape[-1] + (0 if x2 is None else x2.shape[-1])
        if (not train and not self.is_initializing()
                and self.padding == 1
                and pconv.fused_conv_active(
                    x.shape[:3] + (full_c,), x.dtype, self.kernel,
                    self.stride)):
            p0 = self.get_variable("params", "0")
            p1 = self.get_variable("params", "1")
            st = self.get_variable("batch_stats", "1")
            if p0 is not None and p1 is not None and st is not None:
                scale, bias = pconv.fold_bn(
                    p0["kernel"], p0.get("bias"), p1["scale"], p1["bias"],
                    st["mean"], st["var"])
                return pconv.conv3x3_bn_relu(
                    x, p0["kernel"].astype(x.dtype), scale, bias, relu=True,
                    x2=x2)
        if x2 is not None:
            x = jnp.concatenate([x, x2], axis=-1)
        x = tconv(self.in_c, self.features, self.kernel, self.stride,
                  self.padding, bias=True, name="0")(x)
        x = tbn(train, name="1")(x)
        return nn.relu(x)
