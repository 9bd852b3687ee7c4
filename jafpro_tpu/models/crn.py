"""Cascaded refinement network generators.

Re-design of reference ``src/crn_model.py:109-308`` (``CRN``, ``CRN_small``,
``CRN_smaller``): a 6-level avg-pool encoder and a coarse-to-fine decoder
where each level consumes [bilinear-downsampled input label, encoder skip,
upsampled previous decode].  ``fg=True`` adds a sigmoid mask head — used as
the foreground refiner; the plain variant synthesizes the background.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple, Union

import flax.linen as nn
import jax.numpy as jnp

from jafpro_tpu.models.common import ConvBlock
from jafpro_tpu.ops.image import avg_pool_3x3s2
from jafpro_tpu.ops.sampling import resize_bilinear


class _CRNBase(nn.Module):
    enc_repeats: Sequence[int]
    enc_nc: Sequence[int]
    fg: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, label: jnp.ndarray, sp: int):
        """label: (B, sp, sp, C) -> (B, sp, sp, 3) [, fg mask (B, sp, sp, 1)]."""
        pools = []
        x = label
        for r, c in zip(self.enc_repeats, self.enc_nc):
            x = ConvBlock(r, c, dtype=self.dtype)(x)
            x = avg_pool_3x3s2(x)
            pools.append(x)

        net = None
        for lvl in range(6, 0, -1):  # decoder levels 6..1
            # clamp to 1px so sub-64 debug/dryrun sizes stay well-formed
            # (production sizes >=64 are unaffected: sp // 64 >= 1)
            size = max(1, sp // (2 ** lvl))
            down = resize_bilinear(label, (size, size), align_corners=True)
            parts = [down, pools[lvl - 1]]
            if net is not None:
                parts.append(net)
            x = jnp.concatenate(parts, axis=-1)
            x = ConvBlock(2, 512 if lvl > 1 else 256, dtype=self.dtype)(x)
            up = max(1, sp // (2 ** (lvl - 1)))
            net = resize_bilinear(x, (up, up), align_corners=True)

        x = jnp.concatenate([label, net], axis=-1)
        net = ConvBlock(2, 256, dtype=self.dtype)(x)
        out = nn.Conv(3, (1, 1), dtype=self.dtype)(net)
        if self.fg:
            mask = nn.sigmoid(nn.Conv(1, (1, 1), dtype=self.dtype)(net))
            return out, mask
        return out


class CRN(_CRNBase):
    enc_repeats: Sequence[int] = (2, 2, 3, 3, 3, 3)
    enc_nc: Sequence[int] = (64, 128, 256, 512, 512, 512)


class CRNSmall(_CRNBase):
    enc_repeats: Sequence[int] = (2, 2, 2, 2, 2, 2)
    enc_nc: Sequence[int] = (64, 128, 256, 256, 512, 512)


class CRNSmaller(_CRNBase):
    """The size actually used for both the refiner and the background model
    (reference ``train/4.convLSTM_flowpro_interval.py:131-141``)."""

    enc_repeats: Sequence[int] = (2, 2, 2, 2, 2, 2)
    enc_nc: Sequence[int] = (64, 128, 128, 256, 256, 512)
