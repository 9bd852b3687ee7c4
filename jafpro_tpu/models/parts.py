"""The shared 24-part U-Net encoder/decoder stacks — grouped-channel form.

The reference builds 24 *independent* per-part networks and loops over them
in Python (``src/networks.py:1593-1828``).  A first TPU port vmapped one
part network over a parts axis; that still leaves every activation with a
12-96 channel trailing dim, which the TPU pads to 128 lanes — measured
10.7x memory expansion and matching bandwidth waste at full scale.

This implementation packs the parts axis INTO the channel axis
(part-major blocks: ``(B, H, W, P*C)``) and runs every per-part conv as one
grouped convolution (``feature_group_count=P``) — numerically identical to
P independent convs, but lanes stay full (288..2304 channels) and one conv
kernel feeds the MXU per layer.

Channel/spatial schedule (part tiles are 200x200):
  encoder:  [12@200, 24@100, 24@100, 24@50, 24@50, 48@25, 48@25, 96@13, 96@13]
  skips:    x1@200/12, x3@100/24, x5@50/24, x7@25/48, x9@13/96  (per part)
  decoder:  48@25 -> 24@50 -> 12@100 -> 6@200 -> conv3x3 -> 3   (accumulate)
            96@25 -> 48@50 -> 24@100 -> 12@200 -> conv3x3 -> 3  (inpainter)
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from jafpro_tpu.ops.sampling import resize_bilinear

ENC_NC = (12, 24, 24, 24, 24, 48, 48, 96, 96)


def part_cat(a: jnp.ndarray, b: jnp.ndarray, parts: int) -> jnp.ndarray:
    """Per-part channel concat of two part-major packed tensors:
    (B, H, W, P*ca) + (B, H, W, P*cb) -> (B, H, W, P*(ca+cb))."""
    B, H, W, _ = a.shape
    a = a.reshape(B, H, W, parts, -1)
    b = b.reshape(B, H, W, parts, -1)
    return jnp.concatenate([a, b], axis=-1).reshape(B, H, W, parts, -1
                                                    ).reshape(B, H, W, -1)


import jax
import numpy as np


class PartConv(nn.Module):
    """P independent per-part convs as ONE dense conv whose kernel is the
    block-diagonal embedding of P per-part kernels.

    Why not ``feature_group_count=P``: XLA-TPU lowers small-group convs by
    splitting channels into a (groups, per-group) trailing pair and padding
    the per-group dim (12-96 here) to 128 lanes — measured 10.7x activation
    memory expansion at full scale.  The dense form keeps activations as
    flat (B, H, W, P*C) tensors (288..2304 lanes, no padding) and runs the
    zero blocks through the MXU, which is far cheaper than the padding.
    Parameters are stored per part ((P, k, k, cin, cout)) and scattered
    onto the block diagonal at apply time, so off-diagonal weights do not
    exist — parts are exactly independent, like the reference's 24
    separate networks.

    Lowering is selectable (identical parameters and numerics every way):
      * ``impl="blocksQ"`` (e.g. ``"blocks8"``, the production default via
        Config): Q parts per block-diagonal block,
        ``feature_group_count=P/Q``.  MAC waste drops from P x (dense) to
        Q x while per-group channels stay lane-sized (Q*cin >= ~128),
        avoiding the grouped form's padding.  blocks8 measured fastest for
        BOTH batch-1 inference (65.8 vs 58.2 frames/s dense, same session)
        and batch-4 stage-4 training (0.681 vs 0.425 iters/s); blocks4 and
        blocks12 are slower on both (TUNING.md).  Non-divisible Q falls
        back to the single-block dense form.
      * ``impl="dense"``: one block-diagonal dense conv — largest matmul,
        flat activations; the round-1 training-memory-safe form.
      * ``impl="groups"``: XLA ``feature_group_count=P`` — ~P x fewer
        MACs on paper, but TPU pads each 12-96-channel group to 128 lanes:
        10.7x activation memory and SLOWER end to end on v5e (28.5 vs 43.1
        frames/s measured); kept as a selectable lowering for other
        shapes/hardware (and for the tiny-shape CPU multichip dryrun).
    """

    parts: int
    features: int  # per part
    kernel: int = 3
    stride: int = 1
    use_bias: bool = True
    impl: str = "dense"  # "dense" | "groups"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        P = self.parts
        cin = x.shape[-1] // P
        cout = self.features
        k = self.kernel
        w = self.param(
            "kernel",
            nn.initializers.variance_scaling(
                1.0, "fan_in", "truncated_normal"),
            (P, k, k, cin, cout))
        if self.impl == "groups":
            # group-major output channels == the dense form's part-major
            # layout, so outputs (and params) are interchangeable
            kern = jnp.transpose(w, (1, 2, 3, 0, 4)).reshape(
                k, k, cin, P * cout)
            out = jax.lax.conv_general_dilated(
                x.astype(self.dtype or x.dtype),
                kern.astype(self.dtype or x.dtype),
                window_strides=(self.stride, self.stride),
                padding=[(k // 2, k // 2)] * 2,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=P)
        elif self.impl.startswith("blocks"):
            # Q-part block-diagonal blocks as G = P/Q conv groups: group g
            # holds parts gQ..(g+1)Q-1, part-major inside the group, so
            # input/output channel layouts match the dense form exactly
            Q = int(self.impl[len("blocks"):])
            if P % Q:
                # non-divisible part counts (small synthetic tests) take the
                # dense single-block form; numerics are impl-invariant
                Q = P
            G = P // Q
            wq = w.reshape(G, Q, k, k, cin, cout)
            blk = jnp.zeros((G, Q, k, k, cin, Q, cout), w.dtype)
            idx = jnp.arange(Q)
            # advanced indexing puts the shared Q axis first -> (Q, G, ...)
            blk = blk.at[:, idx, :, :, :, idx, :].set(
                jnp.swapaxes(wq, 0, 1))
            kern = jnp.transpose(blk, (2, 3, 1, 4, 0, 5, 6)).reshape(
                k, k, Q * cin, P * cout)
            out = jax.lax.conv_general_dilated(
                x.astype(self.dtype or x.dtype),
                kern.astype(self.dtype or x.dtype),
                window_strides=(self.stride, self.stride),
                padding=[(k // 2, k // 2)] * 2,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=G)
        else:
            idx = jnp.arange(P)
            dense = jnp.zeros((P, k, k, cin, P, cout), w.dtype)
            dense = dense.at[idx, :, :, :, idx, :].set(w)
            dense = jnp.transpose(dense, (1, 2, 0, 3, 4, 5)).reshape(
                k, k, P * cin, P * cout)
            dense = dense.astype(self.dtype or x.dtype)
            out = jax.lax.conv_general_dilated(
                x.astype(self.dtype or x.dtype), dense,
                window_strides=(self.stride, self.stride),
                padding=[(k // 2, k // 2)] * 2,
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (P * cout,))
            out = out + b.astype(out.dtype)
        return out


class GroupConvLReLU(nn.Module):
    """P independent conv+LeakyReLU(0.2)
    (the reference's per-part ``Downsampler``, ``src/networks.py:868-878``).

    Accepts multiple inputs: ``conv(concat_per_part(a, b)) ==
    conv_a(a) + conv_b(b)`` exactly, so per-part skip concats never
    materialize (a per-part channel concat needs a 5-D reshape whose
    narrow trailing dim the TPU pads to 128 lanes)."""

    parts: int
    features: int  # per part
    kernel: int = 3
    stride: int = 1
    act: bool = True
    negative_slope: float = 0.2
    impl: str = "dense"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, *inputs):
        out = None
        for i, x in enumerate(inputs):
            y = PartConv(
                self.parts, self.features, kernel=self.kernel,
                stride=self.stride, use_bias=(i == 0), impl=self.impl,
                dtype=self.dtype,
            )(x)
            out = y if out is None else out + y
        if self.act:
            out = nn.leaky_relu(out, self.negative_slope)
        return out


class PartEncoder(nn.Module):
    """The 9-conv ``Downsampler_stack_noEmbed`` (``src/networks.py:1177-1201``)
    for all P parts at once.  Input (B, H, W, P*3); returns the 5 skip
    tensors (x1, x3, x5, x7, x9) in packed form."""

    parts: int = 24
    enc_nc: Sequence[int] = ENC_NC
    impl: str = "dense"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        P, nc = self.parts, self.enc_nc
        C = lambda f, k=3, s=1: GroupConvLReLU(
            P, f, kernel=k, stride=s, impl=self.impl, dtype=self.dtype)
        x1 = C(nc[0], k=5)(x)
        x2 = C(nc[1], s=2)(x1)
        x3 = C(nc[2])(x2)
        x4 = C(nc[3], s=2)(x3)
        x5 = C(nc[4])(x4)
        x6 = C(nc[5], s=2)(x5)
        x7 = C(nc[6])(x6)
        x8 = C(nc[7], s=2)(x7)
        x9 = C(nc[8])(x8)
        return x1, x3, x5, x7, x9


class PartDecoder(nn.Module):
    """``Upsampler_stack_noEmbed`` (``src/networks.py:1203-1221``): per level
    bilinear resize to the skip's size (25/50/100/200 for 200px parts,
    matching Upsampler_SE's fixed sizes), per-part skip concat, grouped
    conv+LeakyReLU; 3x3 grouped head to P*3 channels."""

    parts: int = 24
    dec_nc: Sequence[int] = (48, 24, 12, 6)
    impl: str = "dense"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, skips, bottleneck=None):
        """``bottleneck``: optional list of extra packed tensors at x9's
        resolution (e.g. the inpainter's global code) that join x9 as the
        decoder input — each is resized and convolved separately (exactly
        equal to per-part concat, without the 5-D reshape)."""
        P = self.parts
        x1, x3, x5, x7, x9 = skips
        xs = [x9] if bottleneck is None else [x9, *bottleneck]
        for feat, skip in zip(self.dec_nc, (x7, x5, x3, x1)):
            size = skip.shape[1]
            ups = [resize_bilinear(x, (size, size), align_corners=True)
                   for x in xs]
            xs = [GroupConvLReLU(P, feat, impl=self.impl,
                                 dtype=self.dtype)(*ups, skip)]
        return GroupConvLReLU(P, 3, act=False, impl=self.impl,
                              dtype=self.dtype)(xs[0])


def pack_parts(x: jnp.ndarray) -> jnp.ndarray:
    """(B, P, h, w, C) -> packed (B, h, w, P*C) (part-major channels)."""
    B, P, h, w, C = x.shape
    return jnp.transpose(x, (0, 2, 3, 1, 4)).reshape(B, h, w, P * C)


def unpack_parts(x: jnp.ndarray, parts: int) -> jnp.ndarray:
    """(B, h, w, P*C) -> (B, P, h, w, C)."""
    B, h, w, _ = x.shape
    return jnp.transpose(
        x.reshape(B, h, w, parts, -1), (0, 3, 1, 2, 4))
