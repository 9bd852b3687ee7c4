"""Texture inpainting: 24 per-part U-Nets sharing a global bottleneck.

Re-design of ``UNet_inpainter`` + ``Downsampler_stack`` / ``Upsampler_stack``
(reference ``src/networks.py:1121-1175, 1805-1828``): each part is encoded to
a 3-channel 13x13 embedding; the 24 embeddings concatenate into a 72-channel
global code that conditions every part's decoder, so occluded parts borrow
evidence from the whole atlas.  Parts run vmapped with stacked params.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from jafpro_tpu.models.common import ConvLReLU
from jafpro_tpu.models.parts import PartDecoder, PartEncoder, vmap_parts


class _PartEncoderCompress(nn.Module):
    """Encoder + the 96->3 compress conv (``Downsampler_stack``)."""

    compress_nc: int = 3
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        skips = PartEncoder(dtype=self.dtype)(x)
        embed = ConvLReLU(self.compress_nc, dtype=self.dtype)(skips[-1])
        return skips, embed


class _PartDecoderGlobal(nn.Module):
    """Decoder conditioned on the global code (``Upsampler_stack``):
    bottleneck = concat([x9, global_embed]) before the first upsample."""

    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, skips, global_embed):
        bottleneck = jnp.concatenate([skips[-1], global_embed], axis=-1)
        return PartDecoder(dec_nc=(96, 48, 24, 12), dtype=self.dtype)(
            skips, bottleneck
        )


class UNetInpainter(nn.Module):
    """(B, 24, h, w, 3) fused-texture parts -> inpainted parts (same shape)."""

    num_parts: int = 24
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, parts: jnp.ndarray) -> jnp.ndarray:
        B, P, H, W, C = parts.shape
        enc = vmap_parts(_PartEncoderCompress, dtype=self.dtype)
        skips, embeds = enc(parts)  # skips: tuple of (B,P,h,w,c); embeds (B,P,13,13,3)

        # global code: parts' embeddings concatenated on channels
        ge = jnp.transpose(embeds, (0, 2, 3, 1, 4))  # (B,13,13,P,3)
        ge = ge.reshape(B, ge.shape[1], ge.shape[2], P * embeds.shape[-1])
        ge_per_part = jnp.broadcast_to(
            ge[:, None], (B, P) + ge.shape[1:]
        )

        dec = vmap_parts(_PartDecoderGlobal, dtype=self.dtype)
        return dec(skips, ge_per_part)
