"""ResNet trunks used by the framework.

Two families, matching the reference's two pretrained backbones:

  * :class:`BasicBlock` / layer helpers for the torchvision-style ResNet18
    trunk embedded in the UNet segmenter and the MapDecoder (reference
    `unet_encoder.py:30-62`, `map_encoder.py:72-92`). BatchNorm, bias-free
    convs, torchvision parameter naming (conv1/bn1/conv2/bn2/downsample).
  * :class:`GNBottleneck` / :class:`DDPPOResNet` for the DD-PPO PointNav
    ResNet50 depth encoder (habitat_baselines ddppo resnet: baseplanes 32,
    GroupNorm(ngroups=16), block layout convs.0..convs.7 + downsample),
    referenced at `resnet_encoders.py:25-32`.

All NHWC. ``train`` toggles BatchNorm batch-stats mode; the GN trunk has no
train-time state.
"""
from __future__ import annotations

from typing import Sequence

import jax
from flax import linen as nn

from ws_mgmap_tpu.models.layers import max_pool_3x3s2, tconv, tgn

Array = jax.Array


class BasicBlock(nn.Module):
    """torchvision resnet BasicBlock (3x3 conv, BN, residual)."""

    in_c: int
    planes: int
    stride: int = 1

    def _fused(self, x: Array, conv_name: str, bn_name: str,
               relu: bool, residual=None):
        """Pallas fused conv+frozen-BN(+residual)+ReLU; None if unavailable."""
        from ws_mgmap_tpu.ops.pallas import conv as pconv

        p = self.get_variable("params", conv_name)
        pb = self.get_variable("params", bn_name)
        st = self.get_variable("batch_stats", bn_name)
        if p is None or pb is None or st is None:
            return None
        scale, bias = pconv.fold_bn(p["kernel"], None, pb["scale"],
                                    pb["bias"], st["mean"], st["var"])
        return pconv.conv3x3_bn_relu(x, p["kernel"].astype(x.dtype), scale,
                                     bias, relu=relu, residual=residual)

    @nn.compact
    def __call__(self, x: Array, train: bool) -> Array:
        from ws_mgmap_tpu.ops.pallas import conv as pconv

        def fusable(h, stride):
            return (not train and not self.is_initializing()
                    and stride == 1
                    and pconv.fused_conv_active(h.shape, h.dtype, 3, 1))

        identity = x
        if self.stride != 1 or self.in_c != self.planes:
            identity = tconv(self.in_c, self.planes, 1, self.stride, 0,
                             bias=False, name="downsample.0")(x)
            identity = nn.BatchNorm(use_running_average=not train,
                                    momentum=0.9, epsilon=1e-5,
                                    name="downsample.1")(identity)

        out = None
        if fusable(x, self.stride):
            out = self._fused(x, "conv1", "bn1", relu=True)
        if out is None:
            out = tconv(self.in_c, self.planes, 3, self.stride, 1, bias=False,
                        name="conv1")(x)
            out = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                               epsilon=1e-5, name="bn1")(out)
            out = nn.relu(out)

        y = None
        if fusable(out, 1):
            y = self._fused(out, "conv2", "bn2", relu=True, residual=identity)
        if y is not None:
            return y
        out = tconv(self.planes, self.planes, 3, 1, 1, bias=False,
                    name="conv2")(out)
        out = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                           epsilon=1e-5, name="bn2")(out)
        return nn.relu(out + identity)


class ResLayer(nn.Module):
    """A torchvision `layerN` Sequential of two BasicBlocks ("0", "1")."""

    in_c: int
    planes: int
    stride: int = 1

    @nn.compact
    def __call__(self, x: Array, train: bool) -> Array:
        x = BasicBlock(self.in_c, self.planes, self.stride, name="0")(x, train)
        x = BasicBlock(self.planes, self.planes, 1, name="1")(x, train)
        return x


class GNBottleneck(nn.Module):
    """habitat ddppo Bottleneck: convs Sequential(1x1,GN,ReLU,3x3,GN,ReLU,
    1x1,GN) + optional downsample, expansion 4."""

    in_c: int
    planes: int
    ngroups: int
    stride: int = 1

    @nn.compact
    def __call__(self, x: Array) -> Array:
        exp = 4
        out = tconv(self.in_c, self.planes, 1, 1, 0, bias=False,
                    name="convs.0")(x)
        out = tgn(self.ngroups, name="convs.1")(out)
        out = nn.relu(out)
        out = tconv(self.planes, self.planes, 3, self.stride, 1, bias=False,
                    name="convs.3")(out)
        out = tgn(self.ngroups, name="convs.4")(out)
        out = nn.relu(out)
        out = tconv(self.planes, self.planes * exp, 1, 1, 0, bias=False,
                    name="convs.6")(out)
        out = tgn(self.ngroups, name="convs.7")(out)

        if self.stride != 1 or self.in_c != self.planes * exp:
            identity = tconv(self.in_c, self.planes * exp, 1, self.stride, 0,
                             bias=False, name="downsample.0")(x)
            identity = tgn(self.ngroups, name="downsample.1")(identity)
        else:
            identity = x
        return nn.relu(out + identity)


class GNLayer(nn.Module):
    in_c: int
    planes: int
    ngroups: int
    blocks: int
    stride: int = 1

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = GNBottleneck(self.in_c, self.planes, self.ngroups, self.stride,
                         name="0")(x)
        for i in range(1, self.blocks):
            x = GNBottleneck(self.planes * 4, self.planes, self.ngroups, 1,
                             name=str(i))(x)
        return x


class DDPPOResNet(nn.Module):
    """habitat ddppo `resnet50`: base_planes 32, ngroups 16, layers [3,4,6,3].

    Input NHWC; returns the 1/32-resolution feature map (final_channels =
    base_planes * 8 * 4 = 1024).
    """

    in_c: int = 1
    base_planes: int = 32
    ngroups: int = 16
    layers: Sequence[int] = (3, 4, 6, 3)

    @nn.compact
    def __call__(self, x: Array) -> Array:
        bp = self.base_planes
        x = tconv(self.in_c, bp, 7, 2, 3, bias=False, name="conv1")(x)
        x = tgn(self.ngroups, name="bn1")(x)
        x = nn.relu(x)
        x = max_pool_3x3s2(x)
        x = GNLayer(bp, bp, self.ngroups, self.layers[0], 1, name="layer1")(x)
        x = GNLayer(bp * 4, bp * 2, self.ngroups, self.layers[1], 2,
                    name="layer2")(x)
        x = GNLayer(bp * 8, bp * 4, self.ngroups, self.layers[2], 2,
                    name="layer3")(x)
        x = GNLayer(bp * 16, bp * 8, self.ngroups, self.layers[3], 2,
                    name="layer4")(x)
        return x
