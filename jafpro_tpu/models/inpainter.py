"""Texture inpainting: 24 per-part U-Nets sharing a global bottleneck.

Re-design of ``UNet_inpainter`` + ``Downsampler_stack`` / ``Upsampler_stack``
(reference ``src/networks.py:1121-1175, 1805-1828``): each part is encoded to
a 3-channel 13x13 embedding; the 24 embeddings concatenate into a 72-channel
global code that conditions every part's decoder, so occluded parts borrow
evidence from the whole atlas.

Parts run as grouped convolutions over part-major packed channels (see
``models/parts.py``) — numerically identical to 24 independent networks with
full TPU lane utilization.  The packed layout makes the global code free:
the per-part embeddings ARE the packed (B, 13, 13, 24*3) tensor.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from jafpro_tpu.models.parts import (
    GroupConvLReLU, PartDecoder, PartEncoder, pack_parts, unpack_parts)


class UNetInpainter(nn.Module):
    """(B, 24, h, w, 3) fused-texture parts -> inpainted parts (same shape)."""

    num_parts: int = 24
    conv_impl: str = "dense"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, parts: jnp.ndarray) -> jnp.ndarray:
        B, P, H, W, C = parts.shape
        x = pack_parts(parts)
        skips = PartEncoder(parts=P, impl=self.conv_impl, dtype=self.dtype)(x)

        # per-part 96 -> 3 compress (``Downsampler_stack``'s enc_compress)
        embed = GroupConvLReLU(P, 3, impl=self.conv_impl,
                               dtype=self.dtype)(skips[-1])
        # global code: all parts' embeddings, shared by every part's decoder
        # (the packed layout IS the channel concat); broadcast per part
        ge = jnp.tile(embed, (1, 1, 1, P))  # (B, 13, 13, P*(P*3))
        # decoder bottleneck per part: [x9 (96), global code (72)]
        out = PartDecoder(parts=P, dec_nc=(96, 48, 24, 12),
                          impl=self.conv_impl,
                          dtype=self.dtype)(skips, bottleneck=[ge])
        return unpack_parts(out, P)
