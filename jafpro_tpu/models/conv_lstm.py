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


class ConvGRUCell(nn.Module):
    """Convolutional GRU cell (reference ``src/convLSTM.py:167-230``):
    fused reset/update gates, candidate from the reset-gated state.
    Documented ablation alternative to the ConvLSTM fusion (unused on the
    reference's main path)."""

    hidden_dim: int
    kernel: int = 3
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, state, inputs):
        h_prev = state
        x, m = inputs if isinstance(inputs, tuple) else (inputs, None)
        pad = [(self.kernel // 2, self.kernel // 2)] * 2
        gates = nn.Conv(2 * self.hidden_dim, (self.kernel, self.kernel),
                        padding=pad, dtype=self.dtype)(
            jnp.concatenate([x, h_prev], axis=-1))
        r, z = jnp.split(gates, 2, axis=-1)
        r, z = nn.sigmoid(r), nn.sigmoid(z)
        cand = nn.tanh(nn.Conv(
            self.hidden_dim, (self.kernel, self.kernel), padding=pad,
            dtype=self.dtype)(jnp.concatenate([x, r * h_prev], axis=-1)))
        h = z * h_prev + (1 - z) * cand
        if m is not None:
            mm = m[:, None, None, None].astype(h.dtype)
            h = h_prev * (1 - mm) + h * mm
        return h, h


class ModConvGRUCell(nn.Module):
    """Learned-blend-mask GRU variant (reference ``convLSTM.py:334-394``):
    a single 1-channel sigmoid mask blends the previous state with a
    candidate computed from the input alone."""

    hidden_dim: int
    kernel: int = 3
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, state, inputs):
        h_prev = state
        x, m = inputs if isinstance(inputs, tuple) else (inputs, None)
        pad = [(self.kernel // 2, self.kernel // 2)] * 2
        blend = nn.sigmoid(nn.Conv(1, (self.kernel, self.kernel), padding=pad,
                                   dtype=self.dtype)(
            jnp.concatenate([x, h_prev], axis=-1)))
        cand = nn.tanh(nn.Conv(self.hidden_dim, (self.kernel, self.kernel),
                               padding=pad, dtype=self.dtype)(x))
        h = h_prev * blend + (1 - blend) * cand
        if m is not None:
            mm = m[:, None, None, None].astype(h.dtype)
            h = h_prev * (1 - mm) + h * mm
        return h, h


class ConvGRU(nn.Module):
    """Single-layer scanned ConvGRU over (B, T, H, W, C)."""

    hidden_dim: int
    kernel: int = 3
    cell: str = "gru"  # "gru" | "modgru"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, xs, mask: Optional[jnp.ndarray] = None):
        B, T, H, W, C = xs.shape
        cell_cls = ConvGRUCell if self.cell == "gru" else ModConvGRUCell
        scan = nn.scan(
            cell_cls,
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=1,
            out_axes=1,
        )
        cell = scan(self.hidden_dim, self.kernel, dtype=self.dtype)
        init = jnp.zeros((B, H, W, self.hidden_dim), xs.dtype)
        inputs = (xs, mask) if mask is not None else xs
        h, ys = cell(init, inputs)
        return ys, h


class _Cell(nn.Module):
    """One grouped-ConvLSTM step over packed part-major channels.

    Gates are computed as separate grouped convolutions per gate and per
    [x | h] operand: ``conv([x, h]) -> 4 gates`` == ``conv_x_g(x) +
    conv_h_g(h)`` per gate — an exact reparameterization of the reference
    cell (``src/convLSTM.py:41-56``) that avoids per-part channel concats
    and gate-split reshapes (5/6-D temps whose narrow trailing dims the
    TPU pads to 128 lanes).

    Module-level so both ``GroupedConvLSTM`` call forms (scanned sequence
    and single step) share it; the class name is load-bearing — ``nn.scan``
    derives the child scope ``Scan_Cell_0`` from it, which is the param
    path every checkpoint/converter uses.
    """

    parts: int
    hidden: int
    kernel: int
    impl: str
    dtype: Optional[jnp.dtype]

    @nn.compact
    def __call__(self, state, inputs):
        h_prev, c_prev = state
        x, m = inputs if isinstance(inputs, tuple) else (inputs, None)

        from jafpro_tpu.models.parts import PartConv

        def gate(name, act):
            gx = PartConv(self.parts, self.hidden,
                          kernel=self.kernel, impl=self.impl,
                          dtype=self.dtype,
                          name=f"{name}_x")(x)
            gh = PartConv(self.parts, self.hidden,
                          kernel=self.kernel, use_bias=False,
                          impl=self.impl,
                          dtype=self.dtype, name=f"{name}_h")(h_prev)
            return act(gx + gh)

        i = gate("i", nn.sigmoid)
        f = gate("f", nn.sigmoid)
        o = gate("o", nn.sigmoid)
        g = gate("g", nn.tanh)
        c = f * c_prev + i * g
        h = o * nn.tanh(c)
        if m is not None:
            mm = m[:, None, None, None].astype(h.dtype)
            h = h_prev * (1 - mm) + h * mm
            c = c_prev * (1 - mm) + c * mm
        return (h, c), None


class GroupedConvLSTM(nn.Module):
    """P independent single-layer ConvLSTMs over packed part-major channels.

    Sequence form: xs (B, T, H, W, P*C), mask (B, T) -> final hidden state
    (B, H, W, P*hidden), scanned over T.

    Single-step form (``initial_state`` given): xs is ONE step
    (B, H, W, P*C), mask (B,) or None -> the updated ``(h, c)`` state.
    Lets a caller interleave the producer of each step's input with the
    recurrence instead of materializing the whole (B, T, ...) sequence —
    the ref-major low-memory path of ``AccumulateLSTM``.  Both forms bind
    the identical param tree (child scope ``Scan_Cell_0``).

    ``remat_step``: rematerialize each single-step cell in the backward
    pass (``nn.remat`` — param-scope-transparent), so an unrolled caller's
    backward holds only one step's gate activations at a time.
    """

    parts: int
    hidden_dim: int  # per part
    kernel: int = 3
    impl: str = "dense"
    remat_step: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, xs, mask: Optional[jnp.ndarray] = None,
                 initial_state=None):
        P, D = self.parts, self.hidden_dim
        if initial_state is not None:
            # single step: same cell params, no scan lifting
            cell_cls = nn.remat(_Cell) if self.remat_step else _Cell
            cell = cell_cls(P, D, self.kernel, self.impl, self.dtype,
                            name="Scan_Cell_0")
            inputs = (xs, mask) if mask is not None else xs
            state, _ = cell(initial_state, inputs)
            return state

        B, T, H, W, _ = xs.shape
        scan = nn.scan(
            _Cell,
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=1,
            out_axes=1,
        )
        cell = scan(P, D, self.kernel, self.impl, self.dtype)
        init = (
            jnp.zeros((B, H, W, P * D), xs.dtype),
            jnp.zeros((B, H, W, P * D), xs.dtype),
        )
        inputs = (xs, mask) if mask is not None else xs
        (h, c), _ = cell(init, inputs)
        return h

    def init_state(self, batch: int, height: int, width: int, dtype):
        D = self.parts * self.hidden_dim
        z = jnp.zeros((batch, height, width, D), dtype)
        return (z, z)
