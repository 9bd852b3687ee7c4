"""DensePose texture atlas operations.

Layout: the 24 SMPL parts tile a (4*part, 6*part) atlas; part p occupies
tile (p // 6, p % 6) — matching the reference's ``TransferTexture``
(``src/utils.py:369-395``) and the 4x6 slicing loops in the train scripts.

``texture_warp`` is the fused TPU equivalent of ``texture_warp_pytorch``
(``train/4.convLSTM_flowpro_interval.py:43-76``): instead of a Python loop
over 24 parts x grid_sample each, all parts are sampled with one shared grid
under vmap and the result selected by part id with one gather.

``unwrap_texture`` is the NumPy data-prep equivalent of ``get_texture``
(``src/utils.py:232-256``) used to build reference atlases from IUV maps.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from jafpro_tpu.ops.sampling import grid_sample


def atlas_to_parts(atlas: jnp.ndarray, part_size: int = 200) -> jnp.ndarray:
    """(B, 4*p, 6*p, C) -> (B, 24, p, p, C)."""
    B, H, W, C = atlas.shape
    rows, cols = H // part_size, W // part_size
    x = atlas.reshape(B, rows, part_size, cols, part_size, C)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    return x.reshape(B, rows * cols, part_size, part_size, C)


def parts_to_atlas(parts: jnp.ndarray) -> jnp.ndarray:
    """(B, 24, p, p, C) -> (B, 4*p, 6*p, C)."""
    B, P, ph, pw, C = parts.shape
    rows, cols = 4, P // 4
    x = parts.reshape(B, rows, cols, ph, pw, C)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    return x.reshape(B, rows * ph, cols * pw, C)


@functools.partial(jax.jit, static_argnames=("num_parts",))
def texture_warp(
    parts: jnp.ndarray, iuv255: jnp.ndarray, num_parts: int = 24
) -> jnp.ndarray:
    """Warp texture parts into image space through an IUV map.

    Args:
      parts: (B, 24, p, p, 3) texture tiles (values in (-1, 1)).
      iuv255: (B, S, S, 3) float; channel 0 = part index (0 = background,
              1..24), channels 1, 2 = U, V in 0..255.
    Returns: (B, S, S, 3); 0 outside the body.

    Convenience form of :func:`texture_warp_atlas`; when warping many
    frames from the same texture (the 30-frame inference scan), assemble
    the atlas once with ``parts_to_atlas`` and call ``texture_warp_atlas``
    directly so the (B, 800, 1200, 3) relayout is hoisted out of the loop.
    """
    return texture_warp_atlas(parts_to_atlas(parts), iuv255, num_parts)


@functools.partial(jax.jit, static_argnames=("num_parts",))
def texture_warp_atlas(
    atlas: jnp.ndarray, iuv255: jnp.ndarray, num_parts: int = 24
) -> jnp.ndarray:
    """Warp an assembled (B, 4p, 6p, 3) texture atlas into image space.

    Reference math (``train/4:43-76``): per part, grid x =
    ((255-V)/255-0.5)*2 samples the tile's width, y = (U/255-0.5)*2 its
    height, bilinear, align_corners=True.  Because U, V are in [0, 255] the
    tile-local sample position (c * (p-1)/255) always lands inside [0, p-1],
    so sampling the *assembled atlas* at the tile's offset is bit-identical
    to per-tile sampling — one gather pass instead of 24 (24x fewer gathers;
    the per-part form was ~50 ms/frame on v5e, this is ~2 ms).
    """
    p = atlas.shape[1] // 4
    pid = iuv255[..., 0]
    u = iuv255[..., 1]
    v = iuv255[..., 2]
    part = jnp.clip(pid.astype(jnp.int32) - 1, 0, num_parts - 1)
    row = part // 6
    col = part % 6

    # bit-identical to the reference's arithmetic: normalized grid first,
    # then align_corners unnormalization to tile-local [0, p-1] coords;
    # bilinear weights are computed tile-locally (exactly as per-tile
    # sampling) while the gather indices are offset into the atlas
    gx = ((255.0 - v) / 255.0 - 0.5) * 2.0
    gy = (u / 255.0 - 0.5) * 2.0
    x_loc = (gx + 1.0) * 0.5 * (p - 1)
    y_loc = (gy + 1.0) * 0.5 * (p - 1)

    x0 = jnp.floor(x_loc)
    y0 = jnp.floor(y_loc)
    wx = x_loc - x0
    wy = y_loc - y0
    # u, v in [0, 255] => coords stay in [0, p-1]; the +1 corner can reach
    # the first texel of the next tile but always with weight 0, so the
    # clamped atlas gather is exact
    Ha, Wa = atlas.shape[1], atlas.shape[2]
    x0i = jnp.clip(x0.astype(jnp.int32) + col * p, 0, Wa - 1)
    y0i = jnp.clip(y0.astype(jnp.int32) + row * p, 0, Ha - 1)
    x1i = jnp.clip(x0i + 1, 0, Wa - 1)
    y1i = jnp.clip(y0i + 1, 0, Ha - 1)

    from jafpro_tpu.ops.sampling import _gather_2d

    out = (
        _gather_2d(atlas, y0i, x0i) * ((1 - wy) * (1 - wx))[..., None]
        + _gather_2d(atlas, y0i, x1i) * ((1 - wy) * wx)[..., None]
        + _gather_2d(atlas, y1i, x0i) * (wy * (1 - wx))[..., None]
        + _gather_2d(atlas, y1i, x1i) * (wy * wx)[..., None]
    )
    return jnp.where((pid > 0)[..., None], out, 0.0)


def build_texture_warp_lut(parts: jnp.ndarray, grid: int = 256) -> jnp.ndarray:
    """Precompute the warp table for integer-valued IUV maps.

    DensePose IUV maps are uint8 images, so U and V only ever take the
    ``grid``=256 integer values 0..255 — every bilinear sample position of
    ``texture_warp`` lies on a fixed 256x256 lattice per part tile.  This
    evaluates the tile at all lattice points once so the per-frame warp
    becomes a single-tap gather (:func:`texture_warp_lut`) instead of four
    random-access HBM taps (the reference re-runs ``grid_sample`` per frame,
    ``train/4.convLSTM_flowpro_interval.py:43-76``).

    Bilinear interpolation is separable, so the table is built with two
    small matmuls on the MXU — no gathers at all:
      ``lut[k, u, v] = Wy[u] @ parts[k] @ Wx[v]^T``
    with ``Wy`` rows at y = u*(p-1)/255 and ``Wx`` rows at
    x = (255-v)*(p-1)/255 (the V axis is mirrored exactly as the reference's
    grid ``x = ((255-V)/255-0.5)*2``).

    Args:
      parts: (B, P, p, p, C) texture tiles.
    Returns: (B, P, grid, grid, C) — lut[b, k, u, v] is the warped value for
      a pixel with part id k+1, U=u, V=v.
    """
    from jafpro_tpu.ops.sampling import _interp_matrix

    p = parts.shape[2]
    Wy = jnp.asarray(_interp_matrix(p, grid, True))        # row u: u*(p-1)/255
    Wx = jnp.asarray(_interp_matrix(p, grid, True)[::-1])  # row v: (255-v)*(p-1)/255
    x = parts.astype(jnp.float32)
    y = jnp.einsum("up,bkpqc->bkuqc", Wy, x)
    y = jnp.einsum("vq,bkuqc->bkuvc", Wx, y)
    return y.astype(parts.dtype)


def texture_warp_lut(lut: jnp.ndarray, iuv255: jnp.ndarray,
                     impl: str = "tap") -> jnp.ndarray:
    """Single-tap texture warp through a :func:`build_texture_warp_lut` table.

    Exact (to interpolation-order rounding) for integer-valued IUV, which is
    always the case for uint8 DensePose data; non-integer coordinates are
    rounded to the nearest lattice point.  Differentiable w.r.t. the texture
    through the LUT build's matmuls + this gather.

    ``impl``:
      * ``"tap"``: one (part, u, v) point gather per pixel.  Minimal
        logical traffic, but XLA-TPU lowers 3-element random gathers far
        off the HBM speed of light.
      * ``"rows"``: gather the whole contiguous (G*C)-element row at
        (part, u) — the lane-aligned gather shape the TPU vectorizes —
        then select v with a one-hot multiply-reduce that XLA fuses into
        the gather consumer.  Identical values.

    Args:
      lut: (B, P, G, G, C); iuv255: (B, S, S, 3).
    Returns: (B, S, S, C); 0 outside the body.
    """
    B, P, G, _, C = lut.shape
    pid = iuv255[..., 0]
    part = jnp.clip(pid.astype(jnp.int32) - 1, 0, P - 1)
    u = jnp.clip(jnp.floor(iuv255[..., 1] + 0.5).astype(jnp.int32), 0, G - 1)
    v = jnp.clip(jnp.floor(iuv255[..., 2] + 0.5).astype(jnp.int32), 0, G - 1)
    if impl == "rows":
        import jax

        rows = lut.reshape(B, P * G, G * C)
        ridx = (part * G + u).reshape(B, -1)                     # (B, N)
        r = jnp.take_along_axis(rows, ridx[..., None], axis=1)   # (B, N, G*C)
        sel = jax.nn.one_hot(v.reshape(B, -1), G, dtype=lut.dtype)
        out = jnp.einsum("bngc,bng->bnc",
                         r.reshape(B, -1, G, C), sel)
    else:
        flat = lut.reshape(B, P * G * G, C)
        idx = (part * G + u) * G + v
        out = jnp.take_along_axis(flat, idx.reshape(B, -1)[..., None], axis=1)
    out = out.reshape(pid.shape + (C,))
    return jnp.where((pid > 0)[..., None], out, 0.0)


def texture_warp_mm(parts: jnp.ndarray, iuv255: jnp.ndarray,
                    quant: str = "bf16") -> jnp.ndarray:
    """Dense-matmul lowering of :func:`texture_warp` — zero gathers.

    XLA-TPU lowers per-pixel random gathers at ~50 ns/index regardless of
    slice shape (TUNING.md: the 65k-tap LUT warp measures ~3.3 ms/frame,
    ~20x off the HBM floor), so the only way past the gather floor without
    Mosaic is to eliminate indexing entirely.  Per pixel the reference
    bilinear sample (``train/4.convLSTM_flowpro_interval.py:43-76``) is

      ``out = (sel_part ⊗ tent_y) @ T @ tent_x``

    where ``tent_k(c) = relu(1 - |c - k|)`` reproduces the bilinear
    weights exactly (two adjacent nonzeros ``1-f`` / ``f``; one exact 1 at
    integer coordinates) and ``T`` is the (P*p, p*C) tile tensor.  The
    (part, y) factor collapses into ONE dense (N, P*p) operand consumed by
    a single MXU matmul; the x-interpolation is a fused multiply-reduce.
    Traffic is dominated by the dense one-hot operand (S=256, p=200:
    65536 x 4800 ≈ 630 MB bf16 / 315 MB int8 per frame) and compute by
    the 189-GMAC matmul — both forms trade HBM-random-access serialization
    for dense MXU work.

    ``quant``:
      * ``"bf16"``: weights and tiles in bfloat16 — same precision class
        as the pipeline's compute dtype (~0.4% relative).
      * ``"int8"``: both matmul operands quantized to int8 (x127), int32
        accumulation on the MXU (2x the bf16 MXU rate, half the operand
        traffic).  Absolute output error ≤ ~1/127 on the (-1, 1) texture
        scale — the same order as the uint8 source data's own precision,
        but NOT bit-comparable to the float forms; opt-in perf mode.

    Args:
      parts: (B, P, p, p, C) texture tiles (values in (-1, 1)).
      iuv255: (B, S, S, 3) float; channel 0 = part id (0 = background).
    Returns: (B, S, S, C); 0 outside the body.
    """
    B, P, p, _, C = parts.shape
    S1, S2 = iuv255.shape[1], iuv255.shape[2]
    N = S1 * S2
    pid = iuv255[..., 0].reshape(B, N)
    u = iuv255[..., 1].reshape(B, N)
    v = iuv255[..., 2].reshape(B, N)
    part = jnp.clip(pid.astype(jnp.int32) - 1, 0, P - 1)
    # tile-local bilinear coordinates, exactly texture_warp_atlas's
    y_loc = (u / 255.0) * (p - 1)             # row (U axis)
    x_loc = ((255.0 - v) / 255.0) * (p - 1)   # col (mirrored V axis)
    ks = jnp.arange(p, dtype=jnp.float32)
    ty = jnp.maximum(0.0, 1.0 - jnp.abs(y_loc[..., None] - ks))  # (B,N,p)
    tx = jnp.maximum(0.0, 1.0 - jnp.abs(x_loc[..., None] - ks))  # (B,N,p)
    sel = part[..., None] == jnp.arange(P)[None, None]           # (B,N,P)
    T2 = parts.reshape(B, P * p, p * C)
    if quant == "int8":
        qty = jnp.rint(ty * 127.0).astype(jnp.int8)
        wpy = jnp.where(sel[..., None], qty[:, :, None, :],
                        jnp.int8(0)).reshape(B, N, P * p)
        tq = jnp.rint(jnp.clip(T2.astype(jnp.float32), -1.0, 1.0)
                      * 127.0).astype(jnp.int8)
        m = jax.lax.dot_general(
            wpy, tq, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.int32)
        m = m.astype(jnp.float32) * (1.0 / (127.0 * 127.0))
    else:
        dt = jnp.bfloat16 if quant == "bf16" else jnp.dtype(quant)
        wpy = jnp.where(sel[..., None], ty[:, :, None, :].astype(dt),
                        jnp.zeros((), dt)).reshape(B, N, P * p)
        m = jax.lax.dot_general(
            wpy, T2.astype(dt), (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
    out = jnp.einsum("bnxc,bnx->bnc", m.reshape(B, N, p, C),
                     tx.astype(m.dtype))
    out = out.reshape(B, S1, S2, C).astype(parts.dtype)
    return jnp.where((iuv255[..., :1] > 0), out, 0.0)


def unwrap_texture(
    image: np.ndarray, iuv255: np.ndarray, tex_size: int = 32,
    part_size: int = 200,
) -> np.ndarray:
    """Image + IUV -> (24, part, part, 3) partial texture tiles (0..1, RGB).

    NumPy data-prep path (host): nearest scatter at ``tex_size`` resolution,
    then bilinear resize to ``part_size`` (reference ``get_texture``).
    """
    import cv2

    sol = float(tex_size) - 1
    U, V = iuv255[..., 1], iuv255[..., 2]
    out = np.zeros((24, part_size, part_size, 3), np.float32)
    for p in range(1, 25):
        tile = np.zeros((tex_size, tex_size, 3), np.float64)
        ys, xs = np.where(iuv255[..., 0] == p)
        if len(ys):
            ti = ((255 - V[ys, xs]) * sol / 255.0).astype(int)
            tj = (U[ys, xs] * sol / 255.0).astype(int)
            tile[ti, tj] = image[ys, xs]
            resized = cv2.resize(tile, (part_size, part_size),
                                 interpolation=cv2.INTER_LINEAR)
            out[p - 1] = resized[:, :, ::-1] / 255.0
        # else: empty tile stays zero
    return out


def iuv_to_part_masks(
    iuv255: np.ndarray, tex_size: int = 32, part_size: int = 200
) -> np.ndarray:
    """Visibility mask of each part's texture tile: (24, part, part) {0,1}."""
    import cv2

    sol = float(tex_size) - 1
    U, V = iuv255[..., 1], iuv255[..., 2]
    out = np.zeros((24, part_size, part_size), np.float32)
    for p in range(1, 25):
        tile = np.zeros((tex_size, tex_size), np.float64)
        ys, xs = np.where(iuv255[..., 0] == p)
        if len(ys):
            ti = ((255 - V[ys, xs]) * sol / 255.0).astype(int)
            tj = (U[ys, xs] * sol / 255.0).astype(int)
            tile[ti, tj] = 1.0
            out[p - 1] = (
                cv2.resize(tile, (part_size, part_size),
                           interpolation=cv2.INTER_LINEAR) > 0
            ).astype(np.float32)
    return out


def transfer_texture(
    atlas: np.ndarray, iuv255: np.ndarray, part_size: int = 200
) -> np.ndarray:
    """Host-side nearest-neighbor atlas -> image warp (reference
    ``TransferTexture``, ``src/utils.py:369-394``): per target pixel, round
    its UV to the 200px tile grid of its DensePose part and copy that texel.

    atlas: (4p, 6p[, C]); iuv255: (S, S, 3) with part index in channel 0.
    Returns (S, S[, C]) with zeros at background, same dtype as atlas.
    """
    p = part_size
    pid = iuv255[..., 0].astype(np.int32)
    U = np.rint(iuv255[..., 1] / 255.0 * (p - 1)).astype(np.int64)
    V = np.rint(iuv255[..., 2] / 255.0 * (p - 1)).astype(np.int64)
    out = np.zeros(iuv255.shape[:2] + atlas.shape[2:], atlas.dtype)
    for part in range(1, 25):
        i_cor = (part - 1) // 6
        j_cor = part - i_cor * 6 - 1
        tex = atlas[i_cor * p:(i_cor + 1) * p, j_cor * p:(j_cor + 1) * p]
        ys, xs = np.where(pid == part)
        out[ys, xs] = tex[U[ys, xs], (p - 1) - V[ys, xs]]
    return out


def masks_to_atlas(part_masks: np.ndarray) -> np.ndarray:
    """(24, p, p) -> (4p, 6p) atlas-layout mask."""
    p = part_masks.shape[1]
    out = np.zeros((4 * p, 6 * p), part_masks.dtype)
    for i in range(24):
        r, c = i // 6, i % 6
        out[r * p:(r + 1) * p, c * p:(c + 1) * p] = part_masks[i]
    return out


def texture_fusion(
    texture1: np.ndarray, texture2: np.ndarray,
    mask1: np.ndarray, mask2: np.ndarray, radius: int = 7,
):
    """Greedy two-atlas fusion (reference ``Texture_fusion``
    ``src/utils.py:397-433``): keep texture1 everywhere it is observed and
    fill from texture2 only outside a dilated overlap band.

    textures: (H, W, 3) uint8-range; masks: (H, W) 0..255.
    Returns (fused_texture, observed_mask*255, inpaint_area*255).
    """
    import cv2

    m1 = (mask1 / 255).astype(np.uint8)
    m2 = (mask2 / 255).astype(np.uint8)
    inter = np.logical_and(m1, m2).astype(np.float64)
    kernel = np.ones((radius, radius), np.uint8)
    dilated = cv2.dilate(inter, kernel).astype(np.uint8)
    non_overlap = np.subtract(m2, dilated, dtype=np.uint8)
    complement = (non_overlap[..., None].repeat(3, 2) * texture2).astype(
        texture1.dtype)
    fused = complement + texture1
    observed = m1 + non_overlap * m2
    inpaint = np.subtract(1, observed, dtype=np.uint8)
    return fused, (observed * 255).astype(np.uint8), \
        (inpaint * 255).astype(np.uint8)


def write_gif(path: str, frames: np.ndarray, fps: int = 10) -> str:
    """GIF export (reference ``src/utils.py:434-468`` used moviepy; PIL
    here).  frames: (T, H, W[, 3]) floats [0,1] or uint8."""
    from PIL import Image
    import os as _os

    frames = np.asarray(frames)
    if frames.ndim == 3:
        frames = np.repeat(frames[..., None], 3, -1)
    if frames.dtype != np.uint8:
        frames = np.clip(frames * 255, 0, 255).astype(np.uint8)
    imgs = [Image.fromarray(f) for f in frames]
    base, _ = _os.path.splitext(path)
    path = base + ".gif"
    imgs[0].save(path, save_all=True, append_images=imgs[1:],
                 duration=int(1000 / fps), loop=0)
    return path
