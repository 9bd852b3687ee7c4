"""Shared Flax building blocks (NHWC)."""

from __future__ import annotations

from typing import Callable, Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from jafpro_tpu.ops.sampling import resize_bilinear


class ConvLReLU(nn.Module):
    """Conv + LeakyReLU(0.2) — the reference's ``Downsampler``
    (``src/networks.py:868-878``)."""

    features: int
    kernel: int = 3
    stride: int = 1
    negative_slope: float = 0.2
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=[(self.kernel // 2, self.kernel // 2)] * 2,
            dtype=self.dtype,
        )(x)
        return nn.leaky_relu(x, self.negative_slope)


class UpsampleConvLReLU(nn.Module):
    """Bilinear resize to a fixed size, concat skip, conv+LeakyReLU — the
    reference's ``Upsampler_SE`` (``src/networks.py:896-909``).
    torch ``UpsamplingBilinear2d`` == align_corners=True."""

    features: int
    output_size: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, skip):
        x = resize_bilinear(x, (self.output_size, self.output_size),
                            align_corners=True)
        x = jnp.concatenate([x, skip], axis=-1)
        return ConvLReLU(self.features, dtype=self.dtype)(x)


class SampleLayerNorm(nn.Module):
    """The CRN's custom LayerNorm (``src/crn_model.py:67-87``):
    per-sample statistics over ALL of (H, W, C) with *Bessel-corrected* std,
    normalized as (x - mean) / (std + eps), then per-channel affine."""

    features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        gamma = self.param("gamma", nn.initializers.uniform(scale=1.0),
                           (self.features,))
        beta = self.param("beta", nn.initializers.zeros, (self.features,))
        axes = tuple(range(1, x.ndim))
        n = 1
        for a in axes:
            n *= x.shape[a]
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=axes, keepdims=True)
        var = jnp.sum(jnp.square(x32 - mean), axis=axes, keepdims=True) / (n - 1)
        y = (x32 - mean) / (jnp.sqrt(var) + self.eps)
        return (y * gamma + beta).astype(x.dtype)


class ConvBlock(nn.Module):
    """n_repeats x [conv3x3, SampleLayerNorm, LeakyReLU(0.01)]
    (``src/crn_model.py:90-106``)."""

    n_repeats: int
    features: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        for _ in range(self.n_repeats):
            x = nn.Conv(self.features, (3, 3), padding=[(1, 1), (1, 1)],
                        dtype=self.dtype)(x)
            x = SampleLayerNorm(self.features)(x)
            x = nn.leaky_relu(x, 0.01)
        return x


def reflect_pad(x: jnp.ndarray, pad: int) -> jnp.ndarray:
    return jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")


class ReflectConv(nn.Module):
    """ReflectionPad + valid conv (reference ``flow_net.py`` style)."""

    features: int
    kernel: int = 3
    stride: int = 1
    use_bias: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        x = reflect_pad(x, self.kernel // 2)
        return nn.Conv(self.features, (self.kernel, self.kernel),
                       strides=(self.stride, self.stride), padding="VALID",
                       use_bias=self.use_bias, dtype=self.dtype)(x)
