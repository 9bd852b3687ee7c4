"""GAN discriminators (reference ``src/networks.py:356-456``).

``ImageDiscriminator``: 6 stride-2 DCGAN convs (256 -> 4) + MLP + sigmoid,
conditioned by channel-concat (image (+) source frame, 6 ch in).
``FaceDiscriminator``: 4 convs for 64x64 face crops (face (+) face IUV).

BatchNorm uses current-batch statistics (torch train-mode; the reference
never evaluates the discriminators outside training).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from jafpro_tpu.models.propagation import BatchStatsNorm


class _ConvBNLReLU(nn.Module):
    features: int
    norm: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, (3, 3), strides=(2, 2),
                    padding=[(1, 1), (1, 1)], use_bias=False,
                    dtype=self.dtype)(x)
        if self.norm:
            x = BatchStatsNorm(self.features)(x)
        return nn.leaky_relu(x, 0.2)


class _MLPHead(nn.Module):
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        x = x.reshape(x.shape[0], -1)
        x = nn.Dense(100, dtype=self.dtype)(x)
        x = nn.leaky_relu(x, 0.2)
        x = nn.Dense(1, dtype=self.dtype)(x)
        return nn.sigmoid(x)


class ImageDiscriminator(nn.Module):
    ndf: int = 32
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        ndf = self.ndf
        for i, (c, norm) in enumerate([
            (ndf, False), (ndf * 2, True), (ndf * 2, True),
            (ndf * 4, True), (ndf * 4, True), (ndf * 8, True),
        ]):
            x = _ConvBNLReLU(c, norm=norm, dtype=self.dtype)(x)
        return _MLPHead(dtype=self.dtype)(x)


class FaceDiscriminator(nn.Module):
    ndf: int = 32
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        ndf = self.ndf
        for c, norm in [(ndf, False), (ndf * 2, True),
                        (ndf * 2, True), (ndf * 4, True)]:
            x = _ConvBNLReLU(c, norm=norm, dtype=self.dtype)(x)
        return _MLPHead(dtype=self.dtype)(x)
