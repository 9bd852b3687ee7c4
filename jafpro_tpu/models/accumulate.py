"""Texture accumulation: per-part U-Net whose skip levels are fused across
the N reference atlases by ConvLSTMs.

Re-design of ``Accumulate_LSTM[_no_loss]`` + ``Downsampler_convLSTM``
(reference ``src/networks.py:1290-1357, 1593-1662``): the 24-part Python loop
becomes grouped convolutions over part-major packed channels (see
``models/parts.py`` — numerically identical to 24 independent networks,
full TPU lanes); the N-reference recurrence is a scanned fused-gate grouped
ConvLSTM; a per-reference validity mask replaces variable-length reference
lists (the reference's curriculum zeroes masks instead of reshaping — same
semantics, static shapes).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from jafpro_tpu.models.conv_lstm import GroupedConvLSTM
from jafpro_tpu.models.parts import (
    ENC_NC, PartDecoder, PartEncoder, pack_parts, unpack_parts)


class AccumulateLSTM(nn.Module):
    """(B, N, 24, h, w, 3) reference part stacks + (B, N) reference mask
    -> fused texture parts (B, 24, h, w, 3).

    Equivalent of ``Accumulate_LSTM_no_loss`` (the loss lives in
    ``jafpro_tpu.losses.masked_atlas_l1``, decoupled from the module).
    ``conv_impl``: PartConv lowering ("dense" for training / "groups" for
    batch-1 inference — see ``models/parts.py``; params identical).
    """

    conv_impl: str = "dense"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, parts: jnp.ndarray, ref_mask: Optional[jnp.ndarray] = None):
        B, N, P, H, W, C = parts.shape
        if ref_mask is None:
            ref_mask = jnp.ones((B, N), parts.dtype)

        # (B*N, H, W, P*C) packed part-major
        x = pack_parts(parts.reshape(B * N, P, H, W, C))
        skips = PartEncoder(parts=P, impl=self.conv_impl, dtype=self.dtype)(x)

        fused = []
        for level, s in enumerate(skips):
            hs, ws = s.shape[1:3]
            seq = s.reshape(B, N, hs, ws, s.shape[-1])
            h_last = GroupedConvLSTM(
                parts=P, hidden_dim=ENC_NC[2 * level], impl=self.conv_impl,
                dtype=self.dtype,
                name=f"lstm{level}")(seq, ref_mask)
            fused.append(h_last)

        out = PartDecoder(parts=P, impl=self.conv_impl,
                          dtype=self.dtype)(tuple(fused))
        return unpack_parts(out, P)


class AccumulateGRU(nn.Module):
    """Ablation: reference-count fusion by ConvGRU (or ModGRU) instead of
    ConvLSTM (the reference's unused ``Accumulate_GRU``/``Accumulate_ModGRU``
    family).  Same interface as ``AccumulateLSTM``; parts run under vmap with
    stacked per-part parameters."""

    cell: str = "gru"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, parts: jnp.ndarray, ref_mask: Optional[jnp.ndarray] = None):
        import jax

        from jafpro_tpu.models.conv_lstm import ConvGRU

        B, N, P, H, W, C = parts.shape
        if ref_mask is None:
            ref_mask = jnp.ones((B, N), parts.dtype)

        class _PartGRU(nn.Module):
            cell: str
            dtype: Optional[jnp.dtype]

            @nn.compact
            def __call__(self, x, mask):
                b, n, h, w, c = x.shape
                flat = x.reshape(b * n, h, w, c)
                # single-part encoder via grouped machinery with parts=1
                sk = PartEncoder(parts=1, dtype=self.dtype)(flat)
                fused = []
                for level, s in enumerate(sk):
                    hs, ws = s.shape[1:3]
                    seq = s.reshape(b, n, hs, ws, s.shape[-1])
                    _, h_last = ConvGRU(s.shape[-1], cell=self.cell,
                                        dtype=self.dtype,
                                        name=f"gru{level}")(seq, mask)
                    fused.append(h_last)
                return PartDecoder(parts=1, dtype=self.dtype)(tuple(fused))

        net = nn.vmap(
            _PartGRU, in_axes=(1, None), out_axes=1,
            variable_axes={"params": 0}, split_rngs={"params": True},
        )(cell=self.cell, dtype=self.dtype)
        x = jnp.swapaxes(parts, 1, 2)  # (B, P, N, h, w, C)
        return net(x, ref_mask)
