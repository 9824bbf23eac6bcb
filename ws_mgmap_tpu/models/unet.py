"""ResNet18-backbone UNet RGB segmenter (frozen in the policy).

Re-design of the reference's `ResNetUNet` (`vlnce_baselines/models/encoders/
unet_encoder.py:30-111`): 3->27 classes at 224x224, returning both the
bottleneck feature (after ``layer4_1x1``, the tensor cached as
``rgb_features`` by the trainer hooks, `dagger_trainer.py:311`) and the
64-channel full-resolution feature (``proj_feat``) consumed by the ground
projection. NHWC throughout.

Parameter paths mirror the torch state_dict (relative to the reference's
``UNet.base_model``), e.g. ``layer0/0/kernel`` <- ``layer0.0.weight``,
``layer1/1/0/conv1`` <- ``layer1.1.0.conv1`` so released checkpoints convert
mechanically (see utils/convert.py).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ws_mgmap_tpu.models.layers import ConvBNReLU, max_pool_3x3s2, tconv
from ws_mgmap_tpu.models.resnet import ResLayer
from ws_mgmap_tpu.ops.pooling import upsample_bilinear_x2_nhwc

Array = jax.Array


class _Layer0(nn.Module):
    """Sequential(conv1 7x7 s2, bn1, relu) == resnet children[:3]."""

    in_c: int
    out_c: int = 64

    @nn.compact
    def __call__(self, x: Array, train: bool) -> Array:
        x = tconv(self.in_c, self.out_c, 7, 2, 3, bias=False, name="0")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="1")(x)
        return nn.relu(x)


class _Layer1(nn.Module):
    """Sequential(maxpool, resnet.layer1) == resnet children[3:5]."""

    c: int = 64

    @nn.compact
    def __call__(self, x: Array, train: bool) -> Array:
        x = max_pool_3x3s2(x)
        return ResLayer(self.c, self.c, 1, name="1")(x, train)


class ResNetUNet(nn.Module):
    """See module docstring. ``n_class_out=27`` for the mpcat40->27 remap.

    ``width_mult`` scales every internal channel count (1.0 = the reference
    architecture, required for checkpoint conversion). Small-scale testbeds
    (tools/learning_check.py) shrink it so the frozen-UNet step is CPU-
    affordable; the layer graph and parameter naming are unchanged."""

    n_channel_in: int = 3
    n_class_out: int = 27
    width_mult: float = 1.0

    output_bottleneck_channels: int = 512

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Tuple[Array, Array, Array]:
        """Returns (layer4_feat [B,7,7,512], proj_feat [B,224,224,64],
        seg_logits [B,224,224,27]) at width_mult=1."""
        c64, c128, c256, c512 = (max(8, int(c * self.width_mult))
                                 for c in (64, 128, 256, 512))
        x_original = ConvBNReLU(self.n_channel_in, c64, 3, 1,
                                name="conv_original_size0")(x, train)
        x_original = ConvBNReLU(c64, c64, 3, 1,
                                name="conv_original_size1")(x_original, train)

        layer0 = _Layer0(self.n_channel_in, c64, name="layer0")(x, train)
        layer1 = _Layer1(c64, name="layer1")(layer0, train)
        layer2 = ResLayer(c64, c128, 2, name="layer2")(layer1, train)
        layer3 = ResLayer(c128, c256, 2, name="layer3")(layer2, train)
        layer4 = ResLayer(c256, c512, 2, name="layer4")(layer3, train)

        layer4 = ConvBNReLU(c512, c512, 1, 0, name="layer4_1x1")(layer4, train)
        bottleneck = layer4

        # Decoder: the upsample+skip channel concats are passed as x2 so
        # the fused conv kernel streams both operands and the concatenated
        # tensor is never materialized in HBM (reference chains concat ->
        # conv, `unet_encoder.py:77-110`; torch weight layout [up | skip]
        # is preserved, so parameters are interchangeable).
        y = upsample_bilinear_x2_nhwc(layer4)
        layer3 = ConvBNReLU(c256, c256, 1, 0, name="layer3_1x1")(layer3, train)
        y = ConvBNReLU(c256 + c512, c512, 3, 1, name="conv_up3")(y, train,
                                                                 x2=layer3)

        y = upsample_bilinear_x2_nhwc(y)
        layer2 = ConvBNReLU(c128, c128, 1, 0, name="layer2_1x1")(layer2, train)
        y = ConvBNReLU(c128 + c512, c256, 3, 1, name="conv_up2")(y, train,
                                                                 x2=layer2)

        y = upsample_bilinear_x2_nhwc(y)
        layer1 = ConvBNReLU(c64, c64, 1, 0, name="layer1_1x1")(layer1, train)
        y = ConvBNReLU(c64 + c256, c256, 3, 1, name="conv_up1")(y, train,
                                                                x2=layer1)

        y = upsample_bilinear_x2_nhwc(y)
        layer0 = ConvBNReLU(c64, c64, 1, 0, name="layer0_1x1")(layer0, train)
        y = ConvBNReLU(c64 + c256, c128, 3, 1, name="conv_up0")(y, train,
                                                                x2=layer0)

        y = upsample_bilinear_x2_nhwc(y)
        proj_feat = ConvBNReLU(c64 + c128, c64, 3, 1,
                               name="conv_original_size2")(y, train,
                                                           x2=x_original)

        seg = tconv(c64, self.n_class_out, 1, 1, 0, bias=True,
                    name="conv_last")(proj_feat)

        return bottleneck, proj_feat, seg


class UNet(nn.Module):
    """Reference `UNet` wrapper (`unet_encoder.py:14-27`): the pretrained
    segmenter lives under ``base_model``. Frozen during policy training
    (`mg_map_policy.py:36-37`); the caller must pass ``train=False``."""

    width_mult: float = 1.0

    @nn.compact
    def __call__(self, rgb: Array, train: bool = False):
        return ResNetUNet(width_mult=self.width_mult,
                          name="base_model")(rgb, train)
