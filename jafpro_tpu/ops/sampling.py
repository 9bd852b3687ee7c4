"""Shared bilinear sampling primitives (TPU-native).

One gather-based bilinear sampler replaces *every* warp in the reference:
``F.grid_sample`` call sites (reference ``src/cal_flow.py:38``,
``src/nmr.py:372``, ``train/4.convLSTM_flowpro_interval.py:73``) and the
CUDA ``resample2d_package`` flow-warp (reference
``src/flownet2_pytorch/networks/resample2d_package/``).

Layout: NHWC (TPU-preferred).  Semantics match PyTorch 1.2 ``grid_sample``
(align_corners=True; the only behaviour that existed then).

Resizes are expressed as two small matmuls with precomputed interpolation
weight matrices — static shapes, runs on the MXU, no scatter/gather.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _unnormalize(coord: jnp.ndarray, size: int) -> jnp.ndarray:
    """[-1, 1] -> [0, size-1] with align_corners=True."""
    return (coord + 1.0) * 0.5 * (size - 1)


def grid_sample(
    image: jnp.ndarray,
    grid: jnp.ndarray,
    padding_mode: str = "zeros",
    mode: str = "bilinear",
    pixel_coords: bool = False,
) -> jnp.ndarray:
    """Bilinear (or nearest) sampling of ``image`` at ``grid`` locations.

    Args:
      image: (B, H, W, C).
      grid:  (B, Hg, Wg, 2); ``grid[..., 0]`` is x (width), ``grid[..., 1]``
             is y (height).  Normalized [-1, 1] coords by default;
             ``pixel_coords=True`` takes raw pixel coordinates instead.
      padding_mode: "zeros" or "border".
    Returns:
      (B, Hg, Wg, C)
    """
    if padding_mode not in ("zeros", "border"):
        raise ValueError(f"unsupported padding_mode: {padding_mode}")
    B, H, W, C = image.shape
    if pixel_coords:
        x = grid[..., 0]
        y = grid[..., 1]
    else:
        x = _unnormalize(grid[..., 0], W)
        y = _unnormalize(grid[..., 1], H)

    if mode == "nearest":
        # torch 'nearest' rounds half away from zero-ish via floor(x+0.5)
        xi = jnp.floor(x + 0.5).astype(jnp.int32)
        yi = jnp.floor(y + 0.5).astype(jnp.int32)
        valid = (xi >= 0) & (xi <= W - 1) & (yi >= 0) & (yi <= H - 1)
        xi_c = jnp.clip(xi, 0, W - 1)
        yi_c = jnp.clip(yi, 0, H - 1)
        out = _gather_2d(image, yi_c, xi_c)
        if padding_mode == "zeros":
            out = jnp.where(valid[..., None], out, 0.0)
        return out

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0

    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    x1i = x0i + 1
    y1i = y0i + 1

    def corner(yi, xi, w):
        if padding_mode == "zeros":
            valid = (xi >= 0) & (xi <= W - 1) & (yi >= 0) & (yi <= H - 1)
            v = _gather_2d(image, jnp.clip(yi, 0, H - 1), jnp.clip(xi, 0, W - 1))
            return v * (w * valid.astype(image.dtype))[..., None]
        else:  # border: clamp
            v = _gather_2d(image, jnp.clip(yi, 0, H - 1), jnp.clip(xi, 0, W - 1))
            return v * w[..., None].astype(image.dtype)

    out = (
        corner(y0i, x0i, (1 - wy) * (1 - wx))
        + corner(y0i, x1i, (1 - wy) * wx)
        + corner(y1i, x0i, wy * (1 - wx))
        + corner(y1i, x1i, wy * wx)
    )
    return out


def _gather_2d(image: jnp.ndarray, yi: jnp.ndarray, xi: jnp.ndarray) -> jnp.ndarray:
    """Gather image[b, yi[b, ...], xi[b, ...], :] -> (B, *idx_shape, C)."""
    B, H, W, C = image.shape
    flat = image.reshape(B, H * W, C)
    idx = yi * W + xi  # (B, ...)
    idx_flat = idx.reshape(B, -1)
    out = jnp.take_along_axis(flat, idx_flat[..., None], axis=1)
    return out.reshape(*idx.shape, C)


def resample2d(image: jnp.ndarray, flow: jnp.ndarray) -> jnp.ndarray:
    """Backward-warp ``image`` by a pixel-displacement ``flow``.

    TPU-native equivalent of the reference's ``resample2d_cuda``
    (``src/flownet2_pytorch/networks/resample2d_package/``): output(p) =
    image(p + flow(p)), bilinear, zero padding.

    Args:
      image: (B, H, W, C)
      flow:  (B, H, W, 2) — flow[..., 0] = dx, flow[..., 1] = dy in pixels.
    """
    B, H, W, _ = flow.shape
    ys = jnp.arange(H, dtype=flow.dtype)
    xs = jnp.arange(W, dtype=flow.dtype)
    grid_y, grid_x = jnp.meshgrid(ys, xs, indexing="ij")
    sx = grid_x[None] + flow[..., 0]
    sy = grid_y[None] + flow[..., 1]
    # to normalized align_corners coords
    gx = 2.0 * sx / (W - 1) - 1.0
    gy = 2.0 * sy / (H - 1) - 1.0
    return grid_sample(image, jnp.stack([gx, gy], axis=-1), padding_mode="zeros")


@functools.lru_cache(maxsize=64)
def _interp_matrix(in_size: int, out_size: int, align_corners: bool) -> np.ndarray:
    """(out_size, in_size) linear interpolation weights."""
    w = np.zeros((out_size, in_size), dtype=np.float32)
    if out_size == 1:
        # torch: samples input coord 0 (align_corners) / center (half-pixel)
        if align_corners:
            w[0, 0] = 1.0
            return w
        src = (0.5) * in_size / out_size - 0.5
        src = np.array([src])
    elif align_corners:
        src = np.linspace(0.0, in_size - 1, out_size)
    else:
        src = (np.arange(out_size) + 0.5) * in_size / out_size - 0.5
    src = np.clip(src, 0.0, in_size - 1)
    lo = np.floor(src).astype(np.int64)
    hi = np.minimum(lo + 1, in_size - 1)
    frac = (src - lo).astype(np.float32)
    rows = np.arange(out_size)
    np.add.at(w, (rows, lo), 1.0 - frac)
    np.add.at(w, (rows, hi), frac)
    return w


def resize_bilinear(
    x: jnp.ndarray, size: tuple[int, int], align_corners: bool = True
) -> jnp.ndarray:
    """Bilinear resize of (B, H, W, C) to (B, size[0], size[1], C).

    Matches torch ``F.interpolate(mode='bilinear')``.  Implemented as two
    matmuls with static interpolation matrices so it maps onto the MXU
    instead of gathers.
    """
    B, H, W, C = x.shape
    Ho, Wo = size
    if (H, W) == (Ho, Wo):
        return x
    wh = jnp.asarray(_interp_matrix(H, Ho, align_corners))
    ww = jnp.asarray(_interp_matrix(W, Wo, align_corners))
    dt = x.dtype
    xf = x.astype(jnp.float32)
    # (B,H,W,C) -> rows: (Ho,H) @ (B,H,W*C)
    y = jnp.einsum("oh,bhwc->bowc", wh, xf)
    y = jnp.einsum("ow,bhwc->bhoc", ww, y)
    return y.astype(dt)


@functools.lru_cache(maxsize=64)
def _nearest_index(in_size: int, out_size: int) -> np.ndarray:
    # torch F.interpolate(mode='nearest'): src = floor(dst * in/out)
    return np.minimum(
        (np.arange(out_size) * in_size // out_size), in_size - 1
    ).astype(np.int32)


def resize_nearest(x: jnp.ndarray, size: tuple[int, int]) -> jnp.ndarray:
    """Nearest resize of (B, H, W, C), matching torch ``mode='nearest'``."""
    B, H, W, C = x.shape
    Ho, Wo = size
    if (H, W) == (Ho, Wo):
        return x
    yi = jnp.asarray(_nearest_index(H, Ho))
    xi = jnp.asarray(_nearest_index(W, Wo))
    return x[:, yi][:, :, xi]
