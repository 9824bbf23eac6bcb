"""DD-PPO PointNav ResNet50 depth encoder (frozen).

Re-design of `VlnResnetDepthEncoder`
(`vlnce_baselines/models/encoders/resnet_encoders.py:12-102`): the habitat
ResNetEncoder (avg-pool /2 -> GroupNorm resnet50 -> 3x3 compression to
128ch @ 4x4) plus 64 learned spatial-embedding channels when
``spatial_output``. Loads `gibson-2plus-resnet50.pth` weights via
utils/convert (torch keys ``visual_encoder.backbone.*`` /
``visual_encoder.compression.*``). NHWC.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ws_mgmap_tpu.models.layers import tconv, tgn
from ws_mgmap_tpu.models.resnet import DDPPOResNet

Array = jax.Array


class ResNetEncoder(nn.Module):
    """habitat ddppo `ResNetEncoder` over a depth observation (NHWC)."""

    spatial_size: int = 128  # depth H // 2 after the input avg-pool
    in_channels: int = 1

    @property
    def output_hw(self) -> Tuple[int, int]:
        s = self.spatial_size // 32
        return (s, s)

    @property
    def output_channels(self) -> int:
        s = self.spatial_size // 32
        return int(round(2048 / (s * s)))

    @nn.compact
    def __call__(self, depth: Array) -> Array:
        # F.avg_pool2d(x, 2) on the raw input (habitat resnet_policy).
        x = nn.avg_pool(depth, (2, 2), strides=(2, 2))
        x = DDPPOResNet(in_c=self.in_channels, name="backbone")(x)
        num_c = self.output_channels
        x = tconv(x.shape[-1], num_c, 3, 1, 1, bias=False, name="compression.0")(x)
        x = tgn(1, name="compression.1")(x)
        return nn.relu(x)


class VlnResnetDepthEncoder(nn.Module):
    """Depth trunk + spatial embeddings; returns [B, 4, 4, 128+64] (NHWC).

    The trainer caches the 128-channel ``visual_encoder`` output as
    ``depth_features`` (reference `dagger_trainer.py:317-320`); pass it via
    ``cached`` to bypass the trunk exactly like `resnet_encoders.py:79-80`.
    """

    spatial_size: int = 128
    embedding_dim: int = 64

    @nn.compact
    def __call__(self, depth: Array = None, cached: Array = None):
        """Returns (features [B,h,w,128+64], trunk [B,h,w,128]).

        ``trunk`` is the pre-embedding visual_encoder output the trainer
        caches as ``depth_features`` (`dagger_trainer.py:317-320`)."""
        if cached is not None:
            x = cached
        else:
            x = ResNetEncoder(self.spatial_size, name="visual_encoder")(depth)
        b, h, w, c = x.shape
        num_pos = h * w
        emb = nn.Embed(
            num_pos, self.embedding_dim,
            embedding_init=nn.initializers.normal(1.0),
            name="spatial_embeddings",
        )(jnp.arange(num_pos))
        # torch reshapes the [P, E] table to [E, h, w] row-major
        # (`resnet_encoders.py:87-98`); replicate, then to NHWC.
        spatial = emb.reshape(-1).reshape(self.embedding_dim, h, w)
        spatial = jnp.transpose(spatial, (1, 2, 0))[None]
        spatial = jnp.broadcast_to(spatial, (b, h, w, self.embedding_dim))
        return jnp.concatenate([x, spatial], axis=-1), x
