"""The shared 24-part U-Net encoder/decoder stacks.

The reference builds 24 *independent* per-part networks and loops over them
in Python (``src/networks.py:1593-1828``) — 24 separate small-conv graphs.
Here each part network is a single Flax module vmapped over a leading parts
axis with per-part parameters (``nn.vmap`` with ``variable_axes={'params':0}``):
numerically identical to 24 independent networks, but one compiled graph
whose convs batch ``B x 24`` images onto the MXU.

Channel/spatial schedule (part tiles are 200x200):
  encoder:  [12@200, 24@100, 24@100, 24@50, 24@50, 48@25, 48@25, 96@13, 96@13]
  skips:    x1@200/12, x3@100/24, x5@50/24, x7@25/48, x9@13/96
  decoder:  48@25 -> 24@50 -> 12@100 -> 6@200 -> conv3x3 -> 3   (accumulate)
            96@25 -> 48@50 -> 24@100 -> 12@200 -> conv3x3 -> 3  (inpainter)
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from jafpro_tpu.models.common import ConvLReLU, UpsampleConvLReLU

ENC_NC = (12, 24, 24, 24, 24, 48, 48, 96, 96)


class PartEncoder(nn.Module):
    """The 9-conv ``Downsampler_stack_noEmbed`` (``src/networks.py:1177-1201``).

    Returns the 5 skip tensors (x1, x3, x5, x7, x9).
    """

    enc_nc: Sequence[int] = ENC_NC
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        nc = self.enc_nc
        x1 = ConvLReLU(nc[0], kernel=5, dtype=self.dtype)(x)
        x2 = ConvLReLU(nc[1], stride=2, dtype=self.dtype)(x1)
        x3 = ConvLReLU(nc[2], dtype=self.dtype)(x2)
        x4 = ConvLReLU(nc[3], stride=2, dtype=self.dtype)(x3)
        x5 = ConvLReLU(nc[4], dtype=self.dtype)(x4)
        x6 = ConvLReLU(nc[5], stride=2, dtype=self.dtype)(x5)
        x7 = ConvLReLU(nc[6], dtype=self.dtype)(x6)
        x8 = ConvLReLU(nc[7], stride=2, dtype=self.dtype)(x7)
        x9 = ConvLReLU(nc[8], dtype=self.dtype)(x8)
        return x1, x3, x5, x7, x9


class PartDecoder(nn.Module):
    """``Upsampler_stack_noEmbed`` (``src/networks.py:1203-1221``): fixed-size
    bilinear up + skip concat + conv, then a 3x3 head to RGB."""

    dec_nc: Sequence[int] = (48, 24, 12, 6)
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, skips, bottleneck=None):
        x1, x3, x5, x7, x9 = skips
        x = x9 if bottleneck is None else bottleneck
        # target sizes are each skip's own spatial size
        # (25/50/100/200 for 200px parts, matching Upsampler_SE's fixed sizes)
        x = UpsampleConvLReLU(self.dec_nc[0], x7.shape[1], dtype=self.dtype)(x, x7)
        x = UpsampleConvLReLU(self.dec_nc[1], x5.shape[1], dtype=self.dtype)(x, x5)
        x = UpsampleConvLReLU(self.dec_nc[2], x3.shape[1], dtype=self.dtype)(x, x3)
        x = UpsampleConvLReLU(self.dec_nc[3], x1.shape[1], dtype=self.dtype)(x, x1)
        return nn.Conv(3, (3, 3), padding=[(1, 1), (1, 1)], dtype=self.dtype)(x)


def vmap_parts(module_cls, **kwargs):
    """Lift a part module over a parts axis (axis 1) with per-part params."""
    return nn.vmap(
        module_cls,
        in_axes=1,
        out_axes=1,
        variable_axes={"params": 0},
        split_rngs={"params": True},
    )(**kwargs)
