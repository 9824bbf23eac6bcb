"""Map encoder / hallucination decoder / semantic classifier.

Re-design of `MapEncoder` / `MapDecoder`
(`vlnce_baselines/models/encoders/map_encoder.py:16-112`) and the
``map_classfier`` head (`mg_map_policy.py:78-86`). NHWC; torch-name param
paths for checkpoint conversion.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ws_mgmap_tpu.models.layers import ConvBNReLU, TConvTranspose, max_pool_3x3s2, tconv
from ws_mgmap_tpu.models.resnet import ResLayer
from ws_mgmap_tpu.ops.pooling import upsample_bilinear_x2_nhwc

Array = jax.Array


class MapEncoder(nn.Module):
    """3-layer strided CNN: [B,100,100,64] -> [B,24,24,256]
    (`map_encoder.py:16-44`; kernels 8/5/3, strides 2/2/1)."""

    in_channels: int = 64
    out_channels: int = 256

    @staticmethod
    def output_hw(map_size: int) -> int:
        d = map_size
        for k, s, p in ((8, 2, 3), (5, 2, 1), (3, 1, 1)):
            d = (d + 2 * p - k) // s + 1
        return d

    @nn.compact
    def __call__(self, x: Array, train: bool) -> Array:
        x = tconv(self.in_channels, 64, 8, 2, 3, name="cnn.0")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="cnn.1")(x)
        x = nn.relu(x)
        x = tconv(64, 128, 5, 2, 1, name="cnn.3")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="cnn.4")(x)
        x = nn.relu(x)
        x = tconv(128, self.out_channels, 3, 1, 1, name="cnn.6")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="cnn.7")(x)
        return nn.relu(x)


class _DecLayer0(nn.Module):
    in_c: int

    @nn.compact
    def __call__(self, x: Array, train: bool) -> Array:
        x = tconv(self.in_c, 64, 7, 2, 3, bias=False, name="0")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="1")(x)
        return nn.relu(x)


class _DecLayer1(nn.Module):
    @nn.compact
    def __call__(self, x: Array, train: bool) -> Array:
        x = max_pool_3x3s2(x)
        return ResLayer(64, 64, 1, name="1")(x, train)


class MapDecoder(nn.Module):
    """Mini-UNet over the encoded map: [B,24,24,256] -> [B,24,24,64]
    (`map_encoder.py:72-112`; resnet18 stem layers 0-1 + two upsamples)."""

    in_channels: int = 256

    @nn.compact
    def __call__(self, x: Array, train: bool) -> Array:
        x_original = ConvBNReLU(self.in_channels, 64, 3, 1,
                                name="conv_original_size0")(x, train)
        x_original = ConvBNReLU(64, 64, 3, 1,
                                name="conv_original_size1")(x_original, train)

        layer0 = _DecLayer0(self.in_channels, name="layer0")(x, train)
        layer1 = _DecLayer1(name="layer1")(layer0, train)

        layer1 = ConvBNReLU(64, 64, 1, 0, name="layer1_1x1")(layer1, train)
        y = upsample_bilinear_x2_nhwc(layer1)
        layer0 = ConvBNReLU(64, 64, 1, 0, name="layer0_1x1")(layer0, train)
        y = jnp.concatenate([y, layer0], axis=-1)
        y = ConvBNReLU(64 + 64, 128, 3, 1, name="conv_up0")(y, train)

        y = upsample_bilinear_x2_nhwc(y)
        y = jnp.concatenate([y, x_original], axis=-1)
        return ConvBNReLU(64 + 128, 64, 3, 1,
                          name="conv_original_size2")(y, train)


class MapClassifier(nn.Module):
    """``map_classfier`` head (`mg_map_policy.py:78-86`):
    ConvT(64->32, k4 s2 p1) + BN + ReLU + Conv3 + BN + ReLU + Conv1 -> 27
    class logits at 2x the decoder resolution ([B,48,48,27])."""

    num_classes: int = 27

    @nn.compact
    def __call__(self, x: Array, train: bool) -> Array:
        x = TConvTranspose(64, 32, 4, 2, 1, use_bias=False, name="0")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="1")(x)
        x = nn.relu(x)
        x = tconv(32, 32, 3, 1, 1, bias=False, name="3")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="4")(x)
        x = nn.relu(x)
        return tconv(32, self.num_classes, 1, 1, 0, bias=True, name="6")(x)
