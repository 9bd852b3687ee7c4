"""Texture accumulation: per-part U-Net whose skip levels are fused across
the N reference atlases by ConvLSTMs.

Re-design of ``Accumulate_LSTM[_no_loss]`` + ``Downsampler_convLSTM``
(reference ``src/networks.py:1290-1357, 1593-1662``): the 24-part Python loop
becomes a parts-axis vmap with stacked per-part parameters; the N-reference
recurrence is a scanned fused-gate ConvLSTM; a per-reference validity mask
replaces variable-length reference lists (the reference's curriculum zeroes
masks instead of reshaping — same semantics, static shapes).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from jafpro_tpu.models.conv_lstm import ConvLSTM
from jafpro_tpu.models.parts import ENC_NC, PartDecoder, PartEncoder, vmap_parts


class _PartAccumulator(nn.Module):
    """One part: (B, N, h, w, 3) references + (B, N) mask -> (B, h, w, 3)."""

    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, mask):
        B, N, H, W, C = x.shape
        flat = x.reshape(B * N, H, W, C)
        skips = PartEncoder(dtype=self.dtype)(flat)

        fused = []
        for level, s in enumerate(skips):
            hs, ws, cs = s.shape[1:]
            seq = s.reshape(B, N, hs, ws, cs)
            _, (h_last, _) = ConvLSTM(cs, dtype=self.dtype, name=f"lstm{level}")(
                seq, mask
            )
            fused.append(h_last)

        return PartDecoder(dtype=self.dtype)(tuple(fused))


class AccumulateLSTM(nn.Module):
    """(B, N, 24, h, w, 3) reference part stacks + (B, N) reference mask
    -> fused texture parts (B, 24, h, w, 3).

    Equivalent of ``Accumulate_LSTM_no_loss`` (the loss lives in
    ``jafpro_tpu.losses.masked_atlas_l1``, decoupled from the module).
    """

    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, parts: jnp.ndarray, ref_mask: Optional[jnp.ndarray] = None):
        B, N, P, H, W, C = parts.shape
        if ref_mask is None:
            ref_mask = jnp.ones((B, N), parts.dtype)
        x = jnp.swapaxes(parts, 1, 2)  # (B, P, N, h, w, C)

        part_net = vmap_parts(_PartAccumulator, dtype=self.dtype)
        # broadcast the mask across parts by expanding then vmapping axis 1
        mask_p = jnp.broadcast_to(ref_mask[:, None], (B, P) + ref_mask.shape[1:])
        return part_net(x, mask_p)


class _PartAccumulatorGRU(nn.Module):
    """GRU-fused variant of the per-part accumulator (the reference's
    ``Accumulate_GRU`` / ``Accumulate_ModGRU`` ablations,
    ``src/networks.py`` unused family; SURVEY.md §1 'dead code')."""

    cell: str = "gru"  # "gru" | "modgru"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, mask):
        from jafpro_tpu.models.conv_lstm import ConvGRU

        B, N, H, W, C = x.shape
        flat = x.reshape(B * N, H, W, C)
        skips = PartEncoder(dtype=self.dtype)(flat)
        fused = []
        for level, s in enumerate(skips):
            hs, ws, cs = s.shape[1:]
            seq = s.reshape(B, N, hs, ws, cs)
            _, h_last = ConvGRU(cs, cell=self.cell, dtype=self.dtype,
                                name=f"gru{level}")(seq, mask)
            fused.append(h_last)
        return PartDecoder(dtype=self.dtype)(tuple(fused))


class AccumulateGRU(nn.Module):
    """Ablation: reference-count fusion by ConvGRU (or ModGRU) instead of
    ConvLSTM.  Same interface as ``AccumulateLSTM``."""

    cell: str = "gru"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, parts: jnp.ndarray, ref_mask: Optional[jnp.ndarray] = None):
        B, N, P, H, W, C = parts.shape
        if ref_mask is None:
            ref_mask = jnp.ones((B, N), parts.dtype)
        x = jnp.swapaxes(parts, 1, 2)
        part_net = vmap_parts(_PartAccumulatorGRU, cell=self.cell,
                              dtype=self.dtype)
        mask_p = jnp.broadcast_to(ref_mask[:, None], (B, P) + ref_mask.shape[1:])
        return part_net(x, mask_p)
