"""Pallas TPU kernel for the face-index/weight-map rasterizer.

STATUS (round 4): reference design, CPU-interpret-verified only.  Four
long-budget Mosaic remote-compile attempts on this runtime's tunnel never
returned (40-45+ min each; TUNING.md rounds 1/3/4) — the kernel is NOT a
production lever here.  The banded/column-cropped XLA kernel
(``rasterizer.py``) is the production rasterizer; revisit this kernel on
a runtime with local Mosaic compiles.

Same math as ``rasterizer._rasterize_single`` (the CUDA-parity z-buffer),
but executed as a Pallas kernel that:

  * tiles pixels over the grid (ROWS_PER_TILE rows per program),
  * keeps all face data VMEM-resident (13776 faces x 18 floats < 1 MB),
  * carries the running (depth, face-index) minimum through a ``fori_loop``
    over face blocks — no (pixels x faces) tensor ever touches HBM (the XLA
    fallback streams ~27 such intermediates per image),
  * skips whole face blocks whose y-extent cannot intersect the pixel tile
    (block bounding-box culling): SMPL face indices are spatially coherent,
    so most blocks are culled for most tiles.

Mosaic layout notes: pixels are kept flat as (P, 1) vectors (P = rows*S)
with integer div/mod coordinates — reshapes between (rows, S) and (P, 1)
vector shapes are unsupported; outputs are (P, 1) blocks of an (S*S, 1)
array, reshaped to (S, S) outside the kernel.

Weights for the winning face are recomputed afterwards in XLA by one gather
(same trick as the XLA path).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _raster_kernel(xk_ref, yk_ref, zk_ref, invk_ref, valid_ref,
                   ymin_ref, ymax_ref,
                   depth_ref, idx_ref, *, image_size, rows, near, far,
                   n_blocks, block):
    S = image_size
    P = rows * S
    t = pl.program_id(0)
    row0 = t * rows

    # flat pixel index -> (yi, xi), all shapes (P, 1)
    p = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0)
    yi_i = row0 + p // S
    xi_i = p % S
    yi = yi_i.astype(jnp.float32)
    xi = xi_i.astype(jnp.float32)
    xp = (2.0 * xi + 1.0 - S) / S
    yp = (2.0 * yi + 1.0 - S) / S

    # tile y-extent in clip coords (yp grows with row index)
    tile_ymin = (2.0 * row0 + 1.0 - S) / S
    tile_ymax = (2.0 * (row0 + rows - 1) + 1.0 - S) / S

    far_f = jnp.float32(far)

    def compute_block(b, carry):
        depth_min, idx_min = carry
        # block data: (block, 3) / (block, 9)
        xs = xk_ref[pl.ds(b * block, block), :]
        ys = yk_ref[pl.ds(b * block, block), :]
        zs = zk_ref[pl.ds(b * block, block), :]
        inv = invk_ref[pl.ds(b * block, block), :]
        val = valid_ref[pl.ds(b * block, block), 0]

        x0, x1, x2 = xs[:, 0][None], xs[:, 1][None], xs[:, 2][None]
        y0, y1, y2 = ys[:, 0][None], ys[:, 1][None], ys[:, 2][None]

        e0 = (yp - y0) * (x1 - x0) >= (xp - x0) * (y1 - y0)
        e1 = (yp - y1) * (x2 - x1) >= (xp - x1) * (y2 - y1)
        e2 = (yp - y2) * (x0 - x2) >= (xp - x2) * (y0 - y2)
        inside = e0 & e1 & e2 & (val[None] > 0)

        w0 = inv[:, 0][None] * xi + inv[:, 1][None] * yi + inv[:, 2][None]
        w1 = inv[:, 3][None] * xi + inv[:, 4][None] * yi + inv[:, 5][None]
        w2 = inv[:, 6][None] * xi + inv[:, 7][None] * yi + inv[:, 8][None]
        w0 = jnp.clip(w0, 0.0, 1.0)
        w1 = jnp.clip(w1, 0.0, 1.0)
        w2 = jnp.clip(w2, 0.0, 1.0)
        ws = w0 + w1 + w2
        inv_zp = (w0 / zs[:, 0][None] + w1 / zs[:, 1][None]
                  + w2 / zs[:, 2][None]) / ws
        zp = 1.0 / inv_zp

        ok = inside & (zp > near) & (zp < far) & (inv_zp > 0)
        depth = jnp.where(ok, zp, far_f)  # (P, block)

        blk_min = jnp.min(depth, axis=1, keepdims=True)
        blk_arg = jnp.argmin(depth, axis=1, keepdims=True).astype(jnp.int32)

        better = blk_min < depth_min
        new_depth = jnp.where(better, blk_min, depth_min)
        new_idx = jnp.where(better, b * block + blk_arg, idx_min)
        return new_depth, new_idx

    def body(b, carry):
        # block bounding-box cull: skip blocks outside this tile's y-range
        hit = jnp.logical_and(ymax_ref[b, 0] >= tile_ymin,
                              ymin_ref[b, 0] <= tile_ymax)
        return jax.lax.cond(
            hit, lambda c: compute_block(b, c), lambda c: c, carry)

    init = (jnp.full((P, 1), far_f, jnp.float32),
            jnp.full((P, 1), -1, jnp.int32))
    depth_min, idx_min = jax.lax.fori_loop(0, n_blocks, body, init)

    depth_ref[...] = depth_min
    idx_ref[...] = idx_min


@functools.partial(
    jax.jit,
    static_argnames=("image_size", "near", "far", "block", "rows", "flip_y",
                     "interpret"))
def rasterize_fim_wim_pallas(
    face_verts: jnp.ndarray,
    image_size: int = 256,
    near: float = 0.1,
    far: float = 25.0,
    block: int = 512,
    rows: int = 8,
    flip_y: bool = True,
    interpret: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(B, F, 3, 3) view-space triangles -> (fim (B,S,S) int32, wim (B,S,S,3)).

    Drop-in replacement for ``rasterizer.rasterize_fim_wim`` on TPU.
    """
    S = image_size
    B, F = face_verts.shape[:2]
    fv = face_verts.astype(jnp.float32)

    x = fv[..., 0]  # (B, F, 3)
    y = fv[..., 1]
    z = fv[..., 2]
    front = (y[..., 2] - y[..., 0]) * (x[..., 1] - x[..., 0]) >= (
        (y[..., 1] - y[..., 0]) * (x[..., 2] - x[..., 0]))

    p = 0.5 * (fv[..., :2] * S + S - 1)  # (B, F, 3, 2)
    p0x, p0y = p[..., 0, 0], p[..., 0, 1]
    p1x, p1y = p[..., 1, 0], p[..., 1, 1]
    p2x, p2y = p[..., 2, 0], p[..., 2, 1]
    inv = jnp.stack([
        p1y - p2y, p2x - p1x, p1x * p2y - p2x * p1y,
        p2y - p0y, p0x - p2x, p2x * p0y - p0x * p2y,
        p0y - p1y, p1x - p0x, p0x * p1y - p1x * p0y,
    ], axis=-1)  # (B, F, 9)
    denom = (p2x * (p0y - p1y) + p0x * (p1y - p2y) + p1x * (p2y - p0y))
    inv = inv / denom[..., None]

    n_blocks = -(-F // block)
    pad = n_blocks * block - F
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
        y = jnp.pad(y, ((0, 0), (0, pad), (0, 0)), constant_values=1e9)
        z = jnp.pad(z, ((0, 0), (0, pad), (0, 0)), constant_values=1.0)
        inv = jnp.pad(inv, ((0, 0), (0, pad), (0, 0)))
        front = jnp.pad(front, ((0, 0), (0, pad)), constant_values=False)

    valid = front.astype(jnp.float32)[..., None]  # (B, F', 1)

    # block y-extents for culling (only front-facing faces count)
    ylo = jnp.where(front, jnp.min(y, -1), jnp.inf).reshape(B, n_blocks, block)
    yhi = jnp.where(front, jnp.max(y, -1), -jnp.inf).reshape(B, n_blocks, block)
    ymin_blk = jnp.min(ylo, axis=-1)[..., None]  # (B, n_blocks, 1)
    ymax_blk = jnp.max(yhi, axis=-1)[..., None]

    n_tiles = -(-S // rows)
    P = rows * S

    kernel = functools.partial(
        _raster_kernel, image_size=S, rows=rows, near=near, far=far,
        n_blocks=n_blocks, block=block)

    def single(xb, yb, zb, invb, validb, yminb, ymaxb):
        depth, idx = pl.pallas_call(
            kernel,
            grid=(n_tiles,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 7,
            out_specs=[
                pl.BlockSpec((P, 1), lambda t: (t, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((P, 1), lambda t: (t, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((S * S, 1), jnp.float32),
                jax.ShapeDtypeStruct((S * S, 1), jnp.int32),
            ],
            interpret=interpret,
        )(xb, yb, zb, invb, validb, yminb, ymaxb)
        return depth.reshape(S, S), idx.reshape(S, S)

    depth, idx = jax.vmap(single)(x, y, z, inv, valid, ymin_blk, ymax_blk)

    found = idx >= 0
    safe = jnp.where(found, idx, 0)

    def gather_w(inv_b, idx_b):
        return inv_b[idx_b]  # (S, S, 9)

    inv_w = jax.vmap(gather_w)(inv, safe)
    yi = jnp.arange(S, dtype=jnp.float32)[None, :, None]
    xi = jnp.arange(S, dtype=jnp.float32)[None, None, :]
    w0 = inv_w[..., 0] * xi + inv_w[..., 1] * yi + inv_w[..., 2]
    w1 = inv_w[..., 3] * xi + inv_w[..., 4] * yi + inv_w[..., 5]
    w2 = inv_w[..., 6] * xi + inv_w[..., 7] * yi + inv_w[..., 8]
    w = jnp.stack([w0, w1, w2], axis=-1)
    w = jnp.clip(w, 0.0, 1.0)
    w = w / jnp.sum(w, axis=-1, keepdims=True)
    w = jnp.where(found[..., None], w, 0.0)

    fim = jnp.where(found, idx, -1)
    if flip_y:
        fim = fim[:, ::-1]
        w = w[:, ::-1]
    return fim, w
