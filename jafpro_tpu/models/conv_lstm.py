"""ConvLSTM with a fused 4-gate convolution and a scanned recurrence.

Re-design of the reference's Python time loop
(``src/convLSTM.py:7-63`` ``ConvLSTMCell``, ``:102-147`` wrapper): one conv
over [x, h] emitting all four gates (i, f, o, g), scanned over the
reference-frame axis — a single compiled graph regardless of sequence length.

A per-step ``mask`` (B, T) freezes the state on masked steps, turning the
reference's variable reference-count curriculum into static shapes +
masking (the TPU-friendly form).
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp


class ConvLSTMCell(nn.Module):
    """One step: x (B,H,W,C), state ((B,H,W,D), (B,H,W,D)) -> (state, h)."""

    hidden_dim: int
    kernel: int = 3
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, state, inputs):
        h_prev, c_prev = state
        if isinstance(inputs, tuple):
            x, m = inputs
        else:
            x, m = inputs, None
        combined = jnp.concatenate([x, h_prev], axis=-1)
        gates = nn.Conv(
            4 * self.hidden_dim,
            (self.kernel, self.kernel),
            padding=[(self.kernel // 2, self.kernel // 2)] * 2,
            dtype=self.dtype,
        )(combined)
        i, f, o, g = jnp.split(gates, 4, axis=-1)
        i, f, o = nn.sigmoid(i), nn.sigmoid(f), nn.sigmoid(o)
        g = nn.tanh(g)
        c = f * c_prev + i * g
        h = o * nn.tanh(c)
        if m is not None:
            m = m[:, None, None, None].astype(h.dtype)
            h = h_prev * (1 - m) + h * m
            c = c_prev * (1 - m) + c * m
        return (h, c), h


class ConvLSTM(nn.Module):
    """Single-layer ConvLSTM over (B, T, H, W, C).

    Returns (outputs (B, T, H, W, hidden), (h_T, c_T)).
    """

    hidden_dim: int
    kernel: int = 3
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, xs, mask: Optional[jnp.ndarray] = None):
        B, T, H, W, C = xs.shape
        scan = nn.scan(
            ConvLSTMCell,
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=1,
            out_axes=1,
        )
        cell = scan(self.hidden_dim, self.kernel, dtype=self.dtype)
        init = (
            jnp.zeros((B, H, W, self.hidden_dim), xs.dtype),
            jnp.zeros((B, H, W, self.hidden_dim), xs.dtype),
        )
        inputs = (xs, mask) if mask is not None else xs
        (h, c), ys = cell(init, inputs)
        return ys, (h, c)
