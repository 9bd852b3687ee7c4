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

    ``ref_major=False`` (default, fastest at inference): encode ALL N
    reference atlases in one batched conv stack, then scan each skip
    level's ConvLSTM over the ref axis — every level's full (B, N, h, w,
    c) skip sequence is live at once.  ``ref_major=True`` (training /
    low-memory): unroll a Python loop over the static ref axis, encoding
    ONE reference per step and feeding all five ConvLSTM levels in
    lockstep — only one reference's encoder activations are ever live,
    which is what fits the batch-4 GAN step in a single chip's HBM
    (TUNING.md).  Numerically identical (same op order per (ref, level));
    the param tree is byte-identical so checkpoints/converters are mode-
    agnostic (``test_models.py::test_accumulate_ref_major_equivalence``).

    ``remat_steps`` (ref-major only): additionally rematerialize the
    per-ref encoder call and each ConvLSTM cell step in the backward pass
    (nested inside the trainer's outer ``jax.checkpoint``).  Without it
    the unrolled backward still stores every ref's encoder/gate
    activations — measured 17.5G at batch 4 vs 16.2G level-major; with
    it only one ref's activations plus the small per-ref carry states
    are live (TUNING.md).
    """

    conv_impl: str = "dense"
    ref_major: bool = False
    remat_steps: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, parts: jnp.ndarray, ref_mask: Optional[jnp.ndarray] = None):
        B, N, P, H, W, C = parts.shape
        if ref_mask is None:
            ref_mask = jnp.ones((B, N), parts.dtype)

        remat = self.ref_major and self.remat_steps
        enc_cls = nn.remat(PartEncoder) if remat else PartEncoder
        encoder = enc_cls(parts=P, impl=self.conv_impl, dtype=self.dtype,
                          name="PartEncoder_0")
        lstms = [
            GroupedConvLSTM(
                parts=P, hidden_dim=ENC_NC[2 * level], impl=self.conv_impl,
                remat_step=remat,
                dtype=self.dtype, name=f"lstm{level}")
            for level in range(5)
        ]

        if self.ref_major:
            states = None
            for n in range(N):
                xn = pack_parts(parts[:, n])  # (B, H, W, P*C)
                skips = encoder(xn)
                if states is None:
                    states = [
                        lstms[l].init_state(B, *s.shape[1:3], s.dtype)
                        for l, s in enumerate(skips)
                    ]
                states = [
                    lstms[l](s, ref_mask[:, n], initial_state=states[l])
                    for l, s in enumerate(skips)
                ]
            fused = [h for h, _ in states]
        else:
            # (B*N, H, W, P*C) packed part-major
            x = pack_parts(parts.reshape(B * N, P, H, W, C))
            skips = encoder(x)
            fused = []
            for level, s in enumerate(skips):
                hs, ws = s.shape[1:3]
                seq = s.reshape(B, N, hs, ws, s.shape[-1])
                fused.append(lstms[level](seq, ref_mask))

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
