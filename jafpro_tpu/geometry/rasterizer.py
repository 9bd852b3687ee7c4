"""Face-index + barycentric-weight rasterizer (the z-buffer kernel).

TPU-native re-design of the reference's CUDA rasterizer
(``third_party/neural_renderer/neural_renderer/cuda/rasterize_cuda_kernel.cu:24-169``,
``forward_face_index_map`` kernels 1+2).  Exact math parity:

  * pixel centers: xp = (2*xi + 1 - S)/S, yp = (2*yi + 1 - S)/S  in [-1, 1]
  * backface cull: (y2-y0)*(x1-x0) < (y1-y0)*(x2-x0)
  * inside-triangle: three half-plane tests with strict '<' exclusion
  * barycentric w: per-face inverse matrix evaluated at *integer* pixel
    coords (the face matrix is built from p = 0.5*(v*S + S - 1)),
    clamped to [0,1] and renormalized
  * perspective-correct depth 1/zp = sum(w_k / z_k); near/far rejection
  * z-buffer argmin with first-face-wins tie-breaking

Instead of a per-pixel loop over 13776 faces (no atomics on TPU), the
computation is a blocked (pixels x face-chunk) reduction: ``lax.scan`` over
face chunks carrying a running (depth, face-index) minimum, fully vectorized
on the VPU.  Weights for the winning face are recomputed by one gather at the
end, so no (pixels x faces x 3) tensor ever materializes.

The forward-only design is sufficient for the training path: face indices
carry no gradient, and flow gradients pass through ``cal_bc_transform``
gathers and ``grid_sample`` (see reference ``src/nmr.py:617-659``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _face_inv(p: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-face inverse matrix (reference CUDA kernel_1).

    p: (F, 3, 2) pixel-space vertex coords.  Returns ((F, 3, 3), denom (F,)).
    """
    p0x, p0y = p[:, 0, 0], p[:, 0, 1]
    p1x, p1y = p[:, 1, 0], p[:, 1, 1]
    p2x, p2y = p[:, 2, 0], p[:, 2, 1]
    inv = jnp.stack(
        [
            jnp.stack([p1y - p2y, p2x - p1x, p1x * p2y - p2x * p1y], axis=1),
            jnp.stack([p2y - p0y, p0x - p2x, p2x * p0y - p0x * p2y], axis=1),
            jnp.stack([p0y - p1y, p1x - p0x, p0x * p1y - p1x * p0y], axis=1),
        ],
        axis=1,
    )  # (F, 3, 3)
    denom = p2x * (p0y - p1y) + p0x * (p1y - p2y) + p1x * (p2y - p0y)
    return inv, denom


def _rasterize_single(
    fv: jnp.ndarray, image_size: int, near: float, far: float, chunk: int
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """fv: (F, 3, 3) view-space triangles -> (fim (S,S) int32, wim (S,S,3))."""
    S = image_size
    F = fv.shape[0]
    dtype = fv.dtype

    x = fv[:, :, 0]  # (F, 3)
    y = fv[:, :, 1]
    z = fv[:, :, 2]

    front = (y[:, 2] - y[:, 0]) * (x[:, 1] - x[:, 0]) >= (
        (y[:, 1] - y[:, 0]) * (x[:, 2] - x[:, 0])
    )

    p = 0.5 * (fv[:, :, :2] * S + S - 1)  # (F, 3, 2) pixel coords
    inv, denom = _face_inv(p)
    inv = inv / denom[:, None, None]

    # pad faces to a chunk multiple with degenerate (culled) faces
    n_chunks = -(-F // chunk)
    pad = n_chunks * chunk - F
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0)))
        y = jnp.pad(y, ((0, pad), (0, 0)))
        z = jnp.pad(z, ((0, pad), (0, 0)), constant_values=1.0)
        inv = jnp.pad(inv, ((0, pad), (0, 0), (0, 0)))
        front = jnp.pad(front, (0, pad), constant_values=False)

    xc = x.reshape(n_chunks, chunk, 3)
    yc = y.reshape(n_chunks, chunk, 3)
    zc = z.reshape(n_chunks, chunk, 3)
    invc = inv.reshape(n_chunks, chunk, 3, 3)
    frontc = front.reshape(n_chunks, chunk)

    P = S * S
    yi = jnp.repeat(jnp.arange(S, dtype=dtype), S)  # (P,)
    xi = jnp.tile(jnp.arange(S, dtype=dtype), S)
    xp = (2.0 * xi + 1 - S) / S
    yp = (2.0 * yi + 1 - S) / S

    # depth comparisons run on inverse depth (min zp == max 1/zp, both
    # positive) with per-face reciprocal vertex depths precomputed — the
    # naive form costs 4 divides per (pixel, face), this form costs 1
    # (divides dominate the VPU time: ~3x end-to-end on v5e)
    izc = 1.0 / zc  # (n_chunks, chunk, 3)
    inv_far = jnp.asarray(1.0 / far, dtype)
    inv_near = jnp.asarray(1.0 / near, dtype)

    def step(carry, inputs):
        best_q, idx_min = carry  # best_q = max over faces of 1/zp
        xk, yk, izk, invk, frontk, base = inputs
        # half-plane inside tests, (P, K)
        e0 = (yp[:, None] - yk[None, :, 0]) * (xk[:, 1] - xk[:, 0])[None] >= (
            (xp[:, None] - xk[None, :, 0]) * (yk[:, 1] - yk[:, 0])[None]
        )
        e1 = (yp[:, None] - yk[None, :, 1]) * (xk[:, 2] - xk[:, 1])[None] >= (
            (xp[:, None] - xk[None, :, 1]) * (yk[:, 2] - yk[:, 1])[None]
        )
        e2 = (yp[:, None] - yk[None, :, 2]) * (xk[:, 0] - xk[:, 2])[None] >= (
            (xp[:, None] - xk[None, :, 2]) * (yk[:, 0] - yk[:, 2])[None]
        )
        inside = e0 & e1 & e2 & frontk[None, :]

        # barycentric weights at integer pixel coords
        w0 = invk[:, 0, 0][None] * xi[:, None] + invk[:, 0, 1][None] * yi[:, None] + invk[:, 0, 2][None]
        w1 = invk[:, 1, 0][None] * xi[:, None] + invk[:, 1, 1][None] * yi[:, None] + invk[:, 1, 2][None]
        w2 = invk[:, 2, 0][None] * xi[:, None] + invk[:, 2, 1][None] * yi[:, None] + invk[:, 2, 2][None]
        w0 = jnp.clip(w0, 0.0, 1.0)
        w1 = jnp.clip(w1, 0.0, 1.0)
        w2 = jnp.clip(w2, 0.0, 1.0)
        ws = w0 + w1 + w2
        t = (w0 * izk[None, :, 0] + w1 * izk[None, :, 1]
             + w2 * izk[None, :, 2])
        q = t / ws  # = 1/zp

        # zp <= near || zp >= far  <=>  q >= 1/near || q <= 1/far
        valid = inside & (q < inv_near) & (q > inv_far) & jnp.isfinite(q)
        q = jnp.where(valid, q, 0.0)

        k_arg = jnp.argmax(q, axis=1)  # first max wins within chunk
        k_max = jnp.take_along_axis(q, k_arg[:, None], axis=1)[:, 0]

        better = k_max > best_q
        best_q = jnp.where(better, k_max, best_q)
        idx_min = jnp.where(better, base + k_arg.astype(jnp.int32), idx_min)
        return (best_q, idx_min), None

    init = (
        jnp.zeros((P,), dtype),
        jnp.full((P,), -1, jnp.int32),
    )
    bases = (jnp.arange(n_chunks) * chunk).astype(jnp.int32)
    (best_q, idx_min), _ = jax.lax.scan(
        step, init, (xc, yc, izc, invc, frontc, bases)
    )
    depth_min = jnp.where(best_q > 0, 1.0 / jnp.maximum(best_q, 1e-20),
                          jnp.asarray(far, dtype))

    found = idx_min >= 0
    safe_idx = jnp.where(found, idx_min, 0)

    # recompute winning-face weights with one gather
    inv_w = inv[safe_idx]  # (P, 3, 3)
    w = (
        inv_w[:, :, 0] * xi[:, None]
        + inv_w[:, :, 1] * yi[:, None]
        + inv_w[:, :, 2]
    )
    w = jnp.clip(w, 0.0, 1.0)
    w = w / jnp.sum(w, axis=1, keepdims=True)
    w = jnp.where(found[:, None], w, 0.0)

    fim = jnp.where(found, idx_min, -1).reshape(S, S)
    wim = w.reshape(S, S, 3)
    dim = jnp.where(found, depth_min, 0.0).reshape(S, S)
    return fim, wim, dim


@functools.partial(
    jax.jit, static_argnames=("image_size", "near", "far", "chunk", "flip_y",
                              "return_depth")
)
def rasterize_fim_wim(
    face_verts: jnp.ndarray,
    image_size: int = 256,
    near: float = 0.1,
    far: float = 25.0,
    chunk: int = 2048,
    flip_y: bool = True,
    return_depth: bool = False,
):
    """Rasterize (B, F, 3, 3) view-space triangles into per-pixel
    (face_index_map (B, S, S) int32 [-1 = background],
     weight_map (B, S, S, 3) float [, depth_map (B, S, S)]).

    Equivalent of reference ``nr.rasterize_face_index_map_and_weight_map``
    (``neural_renderer/rasterize.py:543-571``), including the python
    wrapper's vertical flip of the CUDA kernel's output
    (``rasterize.py:335-338``) — ``flip_y=False`` gives the raw kernel
    orientation.
    """
    fn = functools.partial(
        _rasterize_single, image_size=image_size, near=near, far=far, chunk=chunk
    )
    fim, wim, dim = jax.vmap(fn)(face_verts)
    if flip_y:
        fim = fim[:, ::-1]
        wim = wim[:, ::-1]
        dim = dim[:, ::-1]
    if return_depth:
        return fim, wim, dim
    return fim, wim
