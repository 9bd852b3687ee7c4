"""Parity tests for the shared sampling/pooling primitives vs torch (CPU)."""

import numpy as np
import pytest
import jax.numpy as jnp

import torch
import torch.nn.functional as F

from jafpro_tpu import ops

RNG = np.random.RandomState(0)


def nchw(x):  # numpy NHWC -> torch NCHW
    return torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))


def to_nhwc(t):  # torch NCHW -> numpy NHWC
    return np.transpose(t.numpy(), (0, 2, 3, 1))


@pytest.mark.parametrize("padding_mode", ["zeros", "border"])
def test_grid_sample_bilinear(padding_mode):
    im = RNG.randn(2, 7, 9, 3).astype(np.float32)
    grid = (RNG.rand(2, 5, 6, 2).astype(np.float32) * 2.4 - 1.2)  # incl. OOB
    ours = np.asarray(ops.grid_sample(jnp.asarray(im), jnp.asarray(grid),
                                      padding_mode=padding_mode))
    ref = to_nhwc(F.grid_sample(nchw(im), torch.from_numpy(grid),
                                mode="bilinear", padding_mode=padding_mode,
                                align_corners=True))
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_grid_sample_nearest():
    im = RNG.randn(1, 8, 8, 2).astype(np.float32)
    grid = (RNG.rand(1, 4, 4, 2).astype(np.float32) * 1.9 - 0.95)
    ours = np.asarray(ops.grid_sample(jnp.asarray(im), jnp.asarray(grid),
                                      mode="nearest"))
    ref = to_nhwc(F.grid_sample(nchw(im), torch.from_numpy(grid),
                                mode="nearest", align_corners=True))
    np.testing.assert_allclose(ours, ref, atol=1e-5)


@pytest.mark.parametrize("align", [True, False])
@pytest.mark.parametrize("size", [(4, 4), (13, 26), (50, 25)])
def test_resize_bilinear(align, size):
    im = RNG.randn(2, 13, 13, 3).astype(np.float32)
    ours = np.asarray(ops.resize_bilinear(jnp.asarray(im), size,
                                          align_corners=align))
    ref = to_nhwc(F.interpolate(nchw(im), size=size, mode="bilinear",
                                align_corners=align))
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_resize_nearest():
    im = RNG.randn(2, 10, 10, 3).astype(np.float32)
    ours = np.asarray(ops.resize_nearest(jnp.asarray(im), (64, 64)))
    ref = to_nhwc(F.interpolate(nchw(im), size=(64, 64), mode="nearest"))
    np.testing.assert_allclose(ours, ref, atol=1e-6)


@pytest.mark.parametrize("hw", [(8, 8), (9, 11), (13, 13)])
def test_avg_pool(hw):
    im = RNG.randn(2, hw[0], hw[1], 4).astype(np.float32)
    ours = np.asarray(ops.avg_pool_3x3s2(jnp.asarray(im)))
    ref = to_nhwc(F.avg_pool2d(nchw(im), 3, stride=2, padding=1))
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_max_pool():
    im = RNG.randn(2, 9, 9, 4).astype(np.float32)
    ours = np.asarray(ops.max_pool_3x3s2(jnp.asarray(im)))
    ref = to_nhwc(F.max_pool2d(nchw(im), 3, stride=2, padding=1))
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_channel_norm():
    im = RNG.randn(2, 5, 5, 8).astype(np.float32)
    ours = np.asarray(ops.channel_norm(jnp.asarray(im)))
    ref = np.linalg.norm(im, axis=-1, keepdims=True)
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_resample2d_identity_and_shift():
    im = RNG.randn(1, 8, 8, 3).astype(np.float32)
    zero_flow = np.zeros((1, 8, 8, 2), np.float32)
    out = np.asarray(ops.resample2d(jnp.asarray(im), jnp.asarray(zero_flow)))
    np.testing.assert_allclose(out, im, atol=1e-5)
    # integer shift by +1 in x: out(x) = im(x+1)
    flow = zero_flow.copy()
    flow[..., 0] = 1.0
    out = np.asarray(ops.resample2d(jnp.asarray(im), jnp.asarray(flow)))
    np.testing.assert_allclose(out[:, :, :-1], im[:, :, 1:], atol=1e-5)
    np.testing.assert_allclose(out[:, :, -1], 0.0, atol=1e-6)  # zero pad


def test_correlation_matches_naive():
    f1 = RNG.randn(1, 6, 6, 4).astype(np.float32)
    f2 = RNG.randn(1, 6, 6, 4).astype(np.float32)
    md, s2 = 2, 1
    out = np.asarray(ops.correlation(jnp.asarray(f1), jnp.asarray(f2),
                                     max_displacement=md, stride2=s2))
    # naive
    f2p = np.pad(f2, ((0, 0), (md, md), (md, md), (0, 0)))
    d = 0
    for dy in range(-md, md + 1, s2):
        for dx in range(-md, md + 1, s2):
            win = f2p[:, md + dy:md + dy + 6, md + dx:md + dx + 6]
            expect = (f1 * win).mean(-1)
            np.testing.assert_allclose(out[..., d], expect, atol=1e-5)
            d += 1
    assert out.shape[-1] == d
