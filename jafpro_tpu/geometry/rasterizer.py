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


def _zbuffer_pass(xc, yc, payload, frontc, idsc, xi, yi, xp, yp,
                  inv_near, inv_far, mode="exact", range_checked=False):
    """Blocked z-buffer over face chunks for one pixel set.

    xc/yc: (n_chunks, K, 3) vertex coords (None in "fused" mode — the edge
    geometry lives in the payload's precomputed coefficients); frontc:
    (n_chunks, K) validity, idsc: (n_chunks, K) int32 ORIGINAL face ids
    (ascending within/between chunks so first-face-wins tie-breaking
    matches the CUDA loop order).
    xi/yi/xp/yp: (P,) pixel integer / clip coords.

    ``payload`` carries the per-face depth data, shaped by ``mode``:
      * "exact": (izc (n_chunks, K, 3) reciprocal vertex depths,
        invc (n_chunks, K, 3, 3)) — the CUDA formula: clamp the barycentric
        weights to [0,1], renormalize, blend 1/z.
      * "affine": (qc (n_chunks, K, 3),) — per-face affine coefficients of
        1/zp (see ``_rasterize_single``): q = qc0*xi + qc1*yi + qc2.
        Because unclamped barycentric weights sum to exactly 1, 1/zp is an
        affine function of the pixel coords; skipping the clamps and the
        divide cuts the per-(pixel, face) depth arithmetic from ~27 ops
        (incl. the divide) to 3 madds and the per-face scan traffic from 12
        to 3 values.  Differs from "exact" only by rounding-level noise
        (~1e-6 relative), so the winning face can differ solely where two
        faces z-fight within that tolerance.
      * "fused": (ec (n_chunks, K, 3, 3), qc (n_chunks, K, 3)) — affine
        depth PLUS (a) the three half-plane tests as precomputed per-face
        affine edge functions of the integer pixel coords (2 FMAs + sign
        test per edge instead of the 4 subtract/multiply cross-product
        form) and (b) the chunk argmax + gather + compare + two selects
        replaced by ONE uint32 max over ``floor(q*scale)*16384 + (16383 -
        face_id)`` — depth quantized to 18 bits over (0, 1/near), id in
        the low 14 (requires F <= 16383; ties at the ~4e-5·(1/near)
        quantization step resolve to the lowest id, the CUDA tie rule).
        Cuts per-(pixel, face) VPU work another ~30% on top of "affine";
        same rounding-level caveat at z-fights/edge-marginal pixels.
    Returns (best_q (P,), idx_min (P,)) for exact/affine; (best_pv (P,)
    uint32 [0 none],) for fused.
    """
    dtype = xi.dtype
    P = xi.shape[0]

    if mode == "fused":
        # scale q in (0, inv_near) to 18 bits (constant-folded by XLA)
        scale = (2.0**18 - 1.0) / inv_near

        def step_fused(best_pv, inputs):
            pl, frontk, ids = inputs
            ek, qk = pl  # (K, 3, 3), (K, 3)
            # neutralize culled/padded slots once per chunk (O(K), not O(PK))
            ek = jnp.where(frontk[:, None, None], ek, -1.0)
            e0 = ek[:, 0, 0][None] * xi[:, None] + ek[:, 0, 1][None] * yi[:, None] + ek[:, 0, 2][None]
            e1 = ek[:, 1, 0][None] * xi[:, None] + ek[:, 1, 1][None] * yi[:, None] + ek[:, 1, 2][None]
            e2 = ek[:, 2, 0][None] * xi[:, None] + ek[:, 2, 1][None] * yi[:, None] + ek[:, 2, 2][None]
            inside = (e0 >= 0) & (e1 >= 0) & (e2 >= 0)
            q = (qk[:, 0][None] * xi[:, None]
                 + qk[:, 1][None] * yi[:, None] + qk[:, 2][None])
            if range_checked:
                # every vertex depth is host-verified strictly inside
                # (near, far) (``depth_range_checked``), and an inside
                # pixel's affine 1/zp is a convex combination of its face's
                # vertex 1/z values — the near/far compares and the upper
                # clamp can never fire, so skip them.  max(q, 0) stays: it
                # guards the float->uint32 convert on NON-inside lanes
                # (whose q is unconstrained; their pv is masked below, but
                # the convert itself must see a representable value).
                valid = inside
                qi = (jnp.maximum(q, 0.0) * scale).astype(jnp.uint32)
            else:
                valid = inside & (q < inv_near) & (q > inv_far)
                qi = (jnp.clip(q, 0.0, inv_near) * scale).astype(jnp.uint32)
            idpack = (jnp.uint32(16383) - ids.astype(jnp.uint32))[None]
            pv = jnp.where(valid, qi * jnp.uint32(16384) + idpack,
                           jnp.uint32(0))
            return jnp.maximum(best_pv, jnp.max(pv, axis=1)), None

        best_pv, _ = jax.lax.scan(
            step_fused, jnp.zeros((P,), jnp.uint32),
            (payload, frontc, idsc))
        return (best_pv,)

    def step(carry, inputs):
        best_q, idx_min = carry  # best_q = max over faces of 1/zp
        xk, yk, pl, frontk, ids = inputs
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

        if mode == "affine":
            (qk,) = pl
            q = (qk[:, 0][None] * xi[:, None]
                 + qk[:, 1][None] * yi[:, None] + qk[:, 2][None])
        else:
            izk, invk = pl
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
        idx_min = jnp.where(better, ids[k_arg], idx_min)
        return (best_q, idx_min), None

    init = (jnp.zeros((P,), dtype), jnp.full((P,), -1, jnp.int32))
    (best_q, idx_min), _ = jax.lax.scan(
        step, init, (xc, yc, payload, frontc, idsc))
    return best_q, idx_min


def _rasterize_single(
    fv: jnp.ndarray, image_size: int, near: float, far: float, chunk: int,
    band_rows: int = 0, band_capacity: int = 4096, depth_mode: str = "exact",
    bin_impl: str = "sort", bin_span: int = 2,
    depth_range_checked: bool = False, crop_cols: int = 0,
    tile_cols: int = 0, tile_span: int = 2, tile_capacity: int = 1024,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """fv: (F, 3, 3) view-space triangles -> (fim (S,S) int32, wim (S,S,3)).

    ``band_rows > 0`` enables row-band face binning: the image is split into
    S/band_rows horizontal bands and each band only tests the (at most
    ``band_capacity``, lowest-id-first) faces whose y-extent overlaps it —
    for the SMPL mesh this cuts the (pixels x faces) work ~3-7x with bitwise
    identical output (faces are excluded only when no pixel center of the
    band can lie inside them; SMPL triangles are far smaller than a band,
    so per-band face counts sit well under the default capacity).

    ``0 < crop_cols < S`` (banded path only) restricts the z-buffer race to
    a ``crop_cols``-wide column window positioned per frame from the
    front-face pixel-x extents (a traced offset — only the WIDTH is a
    static compile parameter), scattering the result back into the full
    (S, S) canvas.  Band capacity culls the FACE side of the (pixels x
    faces) race; the column crop culls the PIXEL side, which capacity can
    never reach: a person occupies a fraction of the frame width (the
    bench clip: 76/256 columns), and every pixel outside the mesh's x
    extent races all ``band_capacity`` faces just to write background.
    Exact whenever every frame's front-face x extent fits the window —
    ``select_crop_cols`` validates a width per clip the same way
    ``select_band_capacity`` validates capacity."""
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

    # depth comparisons run on inverse depth (min zp == max 1/zp, both
    # positive) with per-face reciprocal vertex depths precomputed — the
    # naive form costs 4 divides per (pixel, face), this form costs 1
    # (divides dominate the VPU time: ~3x end-to-end on v5e)
    iz = 1.0 / z  # (F, 3)
    inv_far = jnp.asarray(1.0 / far, dtype)
    inv_near = jnp.asarray(1.0 / near, dtype)
    if depth_mode == "fused" and F > 16383:
        depth_mode = "affine"  # packed ids carry 14 bits (SMPL F=13776 fits)
    if depth_mode in ("affine", "fused"):
        # 1/zp as an affine function of integer pixel coords: the unclamped
        # barycentric weights w_k = inv[k,0]*xi + inv[k,1]*yi + inv[k,2]
        # sum to exactly 1, so q = sum_k w_k iz_k = qc0*xi + qc1*yi + qc2
        qcoef = jnp.einsum("fkc,fk->fc", inv, iz)  # (F, 3)
    else:
        qcoef = None
    if depth_mode == "fused":
        # the three half-plane tests, each rewritten as a per-face affine
        # function of INTEGER pixel coords: with edge k anchored at vertex
        # a=v_k toward b=v_{k+1 mod 3} (the CUDA test order),
        #   e = (yp - ya)*dx - (xp - xa)*dy,  xp = (2*xi + 1 - S)/S
        #     = ea*xi + eb*yi + ec  — 2 FMAs + a sign test per pair instead
        # of 4 subtract/multiplies + compare; same sign away from
        # rounding-marginal (sub-1e-6 relative) edge distances
        dx = jnp.roll(x, -1, axis=1) - x  # (F, 3) per-edge deltas
        dy = jnp.roll(y, -1, axis=1) - y
        ea = -2.0 * dy / S
        eb = 2.0 * dx / S
        ec = (dx - dy) * (float(1 - S) / S) + dy * x - dx * y
        ecoef = jnp.stack([ea, eb, ec], axis=-1)  # (F, 3 edges, 3 coefs)
        ok = (front & jnp.all(jnp.isfinite(qcoef), axis=1)
              & jnp.all(jnp.isfinite(ecoef), axis=(1, 2)))
        ecoef = jnp.where(ok[:, None, None], ecoef, -1.0)
        qcoef = jnp.where(ok[:, None], qcoef, 0.0)

    if band_rows and S % band_rows == 0:
        nb = S // band_rows
        # column-crop window (computed before the tables: the 2-D tile
        # membership needs the window's left edge): static width, per-frame
        # traced offset from the front-face pixel-x extents (same p coords
        # the inside tests use).  -1 margin + select_crop_cols' +3 width
        # margin keep a rounding-marginal edge pixel from ever falling
        # outside the window.
        W = crop_cols if 0 < crop_cols < S else S
        if W < S:
            px_all = p[:, :, 0]  # (F, 3) pixel-space x
            okf = front & jnp.all(jnp.isfinite(px_all), axis=1)
            px_min_all = jnp.min(jnp.where(okf[:, None], px_all, jnp.inf))
            col0 = jnp.clip(jnp.floor(px_min_all) - 1, 0,
                            S - W).astype(jnp.int32)
            col0f = col0.astype(dtype)
        else:
            col0, col0f = None, jnp.asarray(0.0, dtype)

        # 2-D (row-band x column-tile) binning: each tile races only the
        # faces whose x extent overlaps its column range — the face-side
        # analogue of the pixel-side column crop, reaching the work the
        # 1-D band capacity can never cull (a band's faces spread over the
        # body's full width, but each column tile sees a fraction of them).
        # Membership is bounded with INTEGER pixel coords (floor(px)-1 ..
        # floor(px)+2, the crop margins), so the host validator
        # (``select_tile_bins``) mirrors it bitwise.  Only defined on the
        # copysort form (a per-tile row-sort would be nb*nc sorts).
        tiled = (0 < tile_cols < W and W % tile_cols == 0
                 and bin_impl == "copysort" and F <= 16383)
        nc = (W // tile_cols) if tiled else 1
        G = nb * nc
        K = min(tile_capacity if tiled else band_capacity, F)
        # a chunk wider than the band capacity would pad K back up to one
        # full chunk, silently re-inflating the per-band work the capacity
        # was chosen to avoid (non-power-of-two buckets, e.g. 1536)
        chunk = min(chunk, K)
        # band b covers pixel-center clip-y in [lo_b, hi_b]
        r0 = jnp.arange(nb, dtype=dtype) * band_rows
        lo = (2.0 * r0 + 1 - S) / S                       # (nb,)
        hi = (2.0 * (r0 + band_rows - 1) + 1 - S) / S
        fy_min = jnp.min(y, axis=1)                       # (F,)
        fy_max = jnp.max(y, axis=1)
        import os
        if tiled:
            M, Mc = bin_span, tile_span
            B0 = jnp.searchsorted(hi, fy_min, side="left").astype(jnp.int32)
            B1 = (jnp.searchsorted(lo, fy_max, side="right").astype(jnp.int32)
                  - 1)
            px = p[:, :, 0]  # (F, 3)
            okf2 = front & jnp.all(jnp.isfinite(px), axis=1)
            pxm = jnp.where(okf2[:, None], px, 0.0)
            cl = jnp.floor(jnp.min(pxm, axis=1)).astype(jnp.int32) - 1
            cr = jnp.floor(jnp.max(pxm, axis=1)).astype(jnp.int32) + 2
            col0_i = col0 if col0 is not None else jnp.int32(0)
            C0 = jnp.clip(cl - col0_i, 0, W - 1) // tile_cols  # (F,)
            C1 = jnp.clip(cr - col0_i, 0, W - 1) // tile_cols
            band_j = B0[:, None] + jnp.arange(M, dtype=jnp.int32)[None]
            tile_t = C0[:, None] + jnp.arange(Mc, dtype=jnp.int32)[None]
            okg = (okf2[:, None, None]
                   & (band_j <= B1[:, None])[:, :, None]
                   & (band_j < nb)[:, :, None]
                   & (tile_t <= C1[:, None])[:, None, :])    # (F, M, Mc)
            gidx = band_j[:, :, None] * nc + tile_t[:, None, :]
            fid = jnp.arange(F, dtype=jnp.int32)[:, None, None]
            key = jnp.where(okg, gidx * 16384 + fid,
                            jnp.int32(G * 16384 + 16383))
            keys_sorted = jnp.sort(key.reshape(-1))          # (F*M*Mc,)
            offs = jnp.searchsorted(
                keys_sorted,
                jnp.arange(G, dtype=jnp.int32) * 16384,
                side="left").astype(jnp.int32)               # (G,)
            idx = offs[:, None] + jnp.arange(K, dtype=jnp.int32)[None, :]
            k2 = keys_sorted[jnp.minimum(idx, F * M * Mc - 1)]
            in_g = ((idx < F * M * Mc)
                    & ((k2 // 16384)
                       == jnp.arange(G, dtype=jnp.int32)[:, None]))
            ids = jnp.where(in_g, k2 & 16383, jnp.int32(F))  # (G, K)
        elif os.environ.get("JAFPRO_RASTER_BIN_DIAG") == "window":
            # TIMING DIAGNOSTIC ONLY (bench A/B of the binning cost): skip
            # the per-band membership sort and take a fixed id window per
            # band — downstream shapes/gathers identical, output WRONG.
            ids = jnp.broadcast_to(
                jnp.arange(K, dtype=jnp.int32)[None, :], (nb, K))
            ids = jnp.minimum(ids + (jnp.arange(nb, dtype=jnp.int32)
                                     * jnp.int32(7))[:, None], jnp.int32(F))
        elif bin_impl == "copysort" and F <= 16383:
            # Single composite-key sort instead of nb row-sorts: the bands a
            # face overlaps form a CONTIGUOUS index range [B0, B1] (lo/hi are
            # increasing in the band index), found by two searchsorted passes
            # over the same f32 values the membership comparisons use —
            # bitwise-identical membership.  Each face emits ``bin_span``
            # copies keyed (band << 14) | id; one ascending sort of the
            # F*span copies then lists every band's members id-ascending in
            # one contiguous run, unpacked to the (nb, K) table with a
            # searchsorted over the band prefix + one gather.  Sort work
            # drops from nb*F keys to F*span (span is 2 for SMPL faces under
            # 16-row bands: triangles are a few pixels tall), measured ~2x
            # end-to-end on the rasterizer (TUNING.md).  Per-band capacity
            # overflow keeps the K lowest ids — the row-sort rule.  Spans
            # wider than ``bin_span`` would drop the excess bands' copies, so
            # production validates the span per clip exactly like the
            # capacity bucket (``select_bin_bounds``; F > 16383 falls back to
            # the row-sort path above, same id budget as the fused race).
            M = bin_span
            B0 = jnp.searchsorted(hi, fy_min, side="left").astype(jnp.int32)
            B1 = (jnp.searchsorted(lo, fy_max, side="right").astype(jnp.int32)
                  - 1)
            band_j = B0[:, None] + jnp.arange(M, dtype=jnp.int32)[None, :]
            ok_copy = (front[:, None] & (band_j <= B1[:, None])
                       & (band_j < nb))                     # (F, M)
            fid = jnp.arange(F, dtype=jnp.int32)[:, None]
            key = jnp.where(ok_copy, band_j * 16384 + fid,
                            jnp.int32(nb * 16384 + 16383))
            keys_sorted = jnp.sort(key.reshape(-1))         # (F*M,)
            offs = jnp.searchsorted(
                keys_sorted,
                jnp.arange(nb, dtype=jnp.int32) * 16384,
                side="left").astype(jnp.int32)              # (nb,)
            idx = offs[:, None] + jnp.arange(K, dtype=jnp.int32)[None, :]
            k2 = keys_sorted[jnp.minimum(idx, F * M - 1)]   # (nb, K)
            in_band = ((idx < F * M)
                       & ((k2 // 16384)
                          == jnp.arange(nb, dtype=jnp.int32)[:, None]))
            ids = jnp.where(in_band, k2 & 16383, jnp.int32(F))
        else:
            member = (front[None, :]
                      & (fy_max[None, :] >= lo[:, None])
                      & (fy_min[None, :] <= hi[:, None]))   # (nb, F)
            # lowest-id member faces first; pad slots get id F (invalid)
            key = jnp.where(member, jnp.arange(F, dtype=jnp.int32)[None, :],
                            jnp.int32(F))
            ids = jax.lax.sort(key, dimension=1)[:, :K]     # (nb, K) ascending
        valid = ids < F
        safe = jnp.minimum(ids, F - 1)

        if depth_mode == "fused":
            # edges live in the precomputed coefficients — no x/y gathers
            xg = yg = None
            depth_g = (ecoef[safe], qcoef[safe])          # (G,K,3,3)+(G,K,3)
        elif depth_mode == "affine":
            xg, yg = x[safe], y[safe]                     # (G, K, 3)
            depth_g = (qcoef[safe],)                      # (G, K, 3)
        else:
            xg, yg = x[safe], y[safe]
            depth_g = (iz[safe], inv[safe])               # + (G, K, 3, 3)

        n_chunks = -(-K // chunk)
        pad = n_chunks * chunk - K
        if pad:
            if xg is not None:
                xg = jnp.pad(xg, ((0, 0), (0, pad), (0, 0)))
                yg = jnp.pad(yg, ((0, 0), (0, pad), (0, 0)))
            depth_g = jax.tree_util.tree_map(
                lambda a: jnp.pad(
                    a, ((0, 0), (0, pad)) + ((0, 0),) * (a.ndim - 2),
                    constant_values=1.0 if a.ndim == 3 else 0.0),
                depth_g)
            valid = jnp.pad(valid, ((0, 0), (0, pad)), constant_values=False)
            safe = jnp.pad(safe, ((0, 0), (0, pad)))

        # per-table-entry pixel block: a full window row-band (nc == 1) or
        # a (band_rows x tile_cols) tile (nc > 1)
        tw = W // nc
        Pb = band_rows * tw
        yi_b = jnp.repeat(jnp.arange(band_rows, dtype=dtype), tw)  # (Pb,)
        xi_b = col0f + jnp.tile(jnp.arange(tw, dtype=dtype), band_rows)
        gi = jnp.arange(G, dtype=jnp.int32)
        r0g = ((gi // nc) * band_rows).astype(dtype)       # (G,) row offsets
        c0g = ((gi % nc) * tw).astype(dtype)               # (G,) col offsets

        def one_tile(xb, yb, depth_b, vb, idb, row0, coff):
            yi = yi_b + row0
            xi = xi_b + coff
            yp = (2.0 * yi + 1 - S) / S
            xp = (2.0 * xi + 1 - S) / S
            return _zbuffer_pass(
                None if xb is None else xb.reshape(n_chunks, chunk, 3),
                None if yb is None else yb.reshape(n_chunks, chunk, 3),
                jax.tree_util.tree_map(
                    lambda a: a.reshape((n_chunks, chunk) + a.shape[1:]),
                    depth_b),
                vb.reshape(n_chunks, chunk),
                idb.reshape(n_chunks, chunk),
                xi, yi, xp, yp, inv_near, inv_far, depth_mode,
                depth_range_checked)

        # lax.map (scan) over bands/tiles: only ONE block's (Pb x chunk)
        # temps are live at a time — a vmap here keeps all G blocks'
        # temporaries resident, which OOMs the batched training step (2
        # rasterizations per iter under a batch-4 GAN step)
        if depth_mode == "fused":
            out = jax.lax.map(
                lambda t: one_tile(None, None, *t),
                (depth_g, valid, safe, r0g, c0g))         # ((G, Pb),)
        else:
            out = jax.lax.map(
                lambda t: one_tile(*t),
                (xg, yg, depth_g, valid, safe, r0g, c0g)) # 2 x (G, Pb)
        # (G, Pb) = (nb, nc, band_rows, tw) -> row-major (S, W)
        out = tuple(
            a.reshape(nb, nc, band_rows, tw)
            .transpose(0, 2, 1, 3).reshape(S * W)
            for a in out)
        P = S * W
        yi = jnp.repeat(jnp.arange(S, dtype=dtype), W)
        xi = col0f + jnp.tile(jnp.arange(W, dtype=dtype), S)
    else:
        W, col0 = S, None
        # dense path: every pixel tests every face chunk
        n_chunks = -(-F // chunk)
        pad = n_chunks * chunk - F
        ids = jnp.arange(F, dtype=jnp.int32)
        if depth_mode == "fused":
            depth_full = (ecoef, qcoef)
        elif depth_mode == "affine":
            depth_full = (qcoef,)
        else:
            depth_full = (iz, inv)
        if pad:
            x = jnp.pad(x, ((0, pad), (0, 0)))
            y = jnp.pad(y, ((0, pad), (0, 0)))
            depth_full = jax.tree_util.tree_map(
                lambda a: jnp.pad(
                    a, ((0, pad),) + ((0, 0),) * (a.ndim - 1),
                    constant_values=1.0 if a.ndim == 2 else 0.0),
                depth_full)
            front = jnp.pad(front, (0, pad), constant_values=False)
            ids = jnp.pad(ids, (0, pad))

        P = S * S
        yi = jnp.repeat(jnp.arange(S, dtype=dtype), S)  # (P,)
        xi = jnp.tile(jnp.arange(S, dtype=dtype), S)
        xp = (2.0 * xi + 1 - S) / S
        yp = (2.0 * yi + 1 - S) / S

        fused = depth_mode == "fused"
        out = _zbuffer_pass(
            None if fused else x.reshape(n_chunks, chunk, 3),
            None if fused else y.reshape(n_chunks, chunk, 3),
            jax.tree_util.tree_map(
                lambda a: a.reshape((n_chunks, chunk) + a.shape[1:]),
                depth_full),
            front.reshape(n_chunks, chunk),
            ids.reshape(n_chunks, chunk),
            xi, yi, xp, yp, inv_near, inv_far, depth_mode,
            depth_range_checked)

    if depth_mode == "fused":
        # unpack (18-bit quantized 1/zp | 14-bit reversed id); the output
        # depth is recomputed UNquantized from the winner's affine coefs
        (best_pv,) = out
        found = best_pv > 0
        idx_min = jnp.where(
            found,
            jnp.int32(16383) - (best_pv & jnp.uint32(16383)).astype(jnp.int32),
            jnp.int32(-1))
        safe_idx = jnp.where(found, idx_min, 0)
        qg = qcoef[safe_idx]  # (P, 3)
        best_q = qg[:, 0] * xi + qg[:, 1] * yi + qg[:, 2]
        best_q = jnp.where(found, best_q, 0.0)
    else:
        best_q, idx_min = out
        found = idx_min >= 0
        safe_idx = jnp.where(found, idx_min, 0)

    depth_min = jnp.where(best_q > 0, 1.0 / jnp.maximum(best_q, 1e-20),
                          jnp.asarray(far, dtype))

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

    fim = jnp.where(found, idx_min, -1).reshape(S, W)
    wim = w.reshape(S, W, 3)
    dim = jnp.where(found, depth_min, 0.0).reshape(S, W)
    if W < S:
        # scatter the cropped window back into the full background canvas
        fim = jax.lax.dynamic_update_slice(
            jnp.full((S, S), -1, fim.dtype), fim, (jnp.int32(0), col0))
        wim = jax.lax.dynamic_update_slice(
            jnp.zeros((S, S, 3), wim.dtype), wim,
            (jnp.int32(0), col0, jnp.int32(0)))
        dim = jax.lax.dynamic_update_slice(
            jnp.zeros((S, S), dim.dtype), dim, (jnp.int32(0), col0))
    return fim, wim, dim


def band_occupancy(face_verts: np.ndarray, image_size: int = 256,
                   band_rows: int = 16) -> np.ndarray:
    """Per-band front-face counts (B, S/band_rows) — host-side diagnostic
    for choosing ``band_capacity``: the banded rasterizer is exact whenever
    every count stays <= capacity (over-capacity bands drop the
    highest-index faces).  Run over a sample of your dataset's SMPL poses
    to validate a lower capacity (e.g. 2048, ~+10% throughput)."""
    fv = np.asarray(face_verts, np.float32)
    x, y = fv[..., 0], fv[..., 1]
    front = (y[..., 2] - y[..., 0]) * (x[..., 1] - x[..., 0]) >= (
        (y[..., 1] - y[..., 0]) * (x[..., 2] - x[..., 0]))
    S = image_size
    nb = S // band_rows
    r0 = np.arange(nb, dtype=np.float32) * band_rows
    lo = (2.0 * r0 + 1 - S) / S
    hi = (2.0 * (r0 + band_rows - 1) + 1 - S) / S
    fy_min, fy_max = y.min(-1), y.max(-1)
    member = (front[:, None, :]
              & (fy_max[:, None, :] >= lo[None, :, None])
              & (fy_min[:, None, :] <= hi[None, :, None]))
    return member.sum(-1)


BAND_CAPACITY_BUCKETS = (512, 768, 1024, 1536, 2048, 3072, 4096)


def select_band_capacity(
    face_verts: np.ndarray, image_size: int = 256, band_rows: int = 16,
    buckets: tuple = BAND_CAPACITY_BUCKETS,
) -> int:
    """Smallest capacity bucket that keeps the banded rasterizer *exact*
    for every frame of ``face_verts`` (B, F, 3, >=2), or 0 when even the
    largest bucket would drop faces (caller should fall back to the dense
    path, ``band_rows=0``).

    The banded kernel's work is ``image_size**2 * capacity`` regardless of
    the mesh, so capacity is a pure speed/safety dial: measuring the real
    clip's occupancy on the host (cheap NumPy, no device dispatch) and
    bucketing bounds recompiles to ``len(buckets)+1`` programs while
    guaranteeing bitwise-exact output — the round-1 fixed default had to
    assume a worst case (a zoomed-out mesh concentrates every face into a
    few bands, where a fixed 2048 silently drops geometry)."""
    occ = int(band_occupancy(face_verts, image_size, band_rows).max())
    for cap in sorted(buckets):
        if occ <= cap:
            return cap
    return 0


CROP_COLS_BUCKETS = (64, 96, 128, 160, 192, 224)


def select_crop_cols(
    face_verts: np.ndarray, image_size: int = 256,
    buckets: tuple = CROP_COLS_BUCKETS,
) -> int:
    """Smallest column-window bucket covering every frame's front-face
    pixel-x extent for ``crop_cols`` cropping, or 0 when no bucket fits
    (caller rasterizes full-width).

    Mirrors the device's window placement bitwise: the same f32
    ``p = 0.5*(x*S + S - 1)`` pixel coords and the same ``floor(px_min)-1``
    left edge, so a selected width *guarantees* the cropped output equals
    the full-width output — a face can only cover integer pixel centers
    inside its [px_min, px_max] extent, and the +3 margin (1 left, 2
    right) absorbs the fused edge tests' ~1e-6-relative rounding at
    window-boundary pixels."""
    fv = np.asarray(face_verts, np.float32)
    x, y = fv[..., 0], fv[..., 1]
    front = (y[..., 2] - y[..., 0]) * (x[..., 1] - x[..., 0]) >= (
        (y[..., 1] - y[..., 0]) * (x[..., 2] - x[..., 0]))
    S = image_size
    px = (0.5 * (x * S + S - 1)).astype(np.float32)  # (B, F, 3)
    ok = front & np.isfinite(px).all(-1)
    need = 1
    for b in range(px.shape[0]):
        if not ok[b].any():
            continue
        pxb = px[b][ok[b]]
        lo = np.floor(pxb.min())
        hi = np.floor(pxb.max())
        need = max(need, int(hi - lo) + 3)
    for w in sorted(buckets):
        if need <= w < S:
            return w
    return 0


def select_mask_crop_cols(
    mask: np.ndarray, buckets: tuple = CROP_COLS_BUCKETS
) -> int:
    """Smallest column-window bucket covering every frame's True-column
    extent of a boolean mask (B, S, S) — the IUV-body analogue of
    :func:`select_crop_cols` for per-pixel stages whose body support is an
    integer data mask rather than projected geometry (no rounding, so no
    margin is needed).  0 when no bucket fits (callers run full-width).

    Serving uses it on ``tgt_iuv255``'s part-id channel to crop the
    texture warp (``VideoGenerator.warp_crop_cols``): outside the body a
    DensePose part id is 0 and the warp output is exactly 0, so a window
    covering every ``pid > 0`` column reproduces the full-width warp
    bitwise."""
    m = np.asarray(mask).astype(bool)
    S = m.shape[-1]
    cols = m.reshape(-1, m.shape[-2], S).any(-2)  # (B, S)
    need = 1
    for b in range(cols.shape[0]):
        idx = np.nonzero(cols[b])[0]
        if idx.size:
            need = max(need, int(idx[-1] - idx[0]) + 1)
    for w in sorted(buckets):
        if need <= w < S:
            return w
    return 0


def column_window_offset(body: jnp.ndarray, width: int) -> jnp.ndarray:
    """Traced left edge of a ``width``-wide column window covering every
    True column of ``body`` (..., rows, S) — one window per leading index.

    Exact whenever each frame's True-column extent fits ``width``, which
    the caller must have validated on the host (``select_mask_crop_cols``
    for data masks; ``select_crop_cols`` already bounds every ``fim >= 0``
    column because a rasterized pixel center lies inside its face's pixel-x
    extent).  All-False frames place the window at 0 — every pixel is
    background there, so placement cannot matter.  This is the pixel-side
    cull for the per-pixel gather stages DOWNSTREAM of the rasterizer
    (barycentric transform, source-image warp, texture warp): slice the
    window, run the stage on (rows, width), scatter back into the stage's
    background value."""
    S = body.shape[-1]
    any_col = jnp.any(body, axis=-2)  # (..., S)
    first = jnp.argmax(any_col, axis=-1).astype(jnp.int32)
    return jnp.minimum(first, S - width)


TILE_CAPACITY_BUCKETS = (192, 256, 384, 512, 768, 1024, 1536, 2048, 3072,
                         4096)
BIN_SPAN_BUCKETS = (2, 3, 4, 6, 8, 12, 16)


def select_tile_bins(
    face_verts: np.ndarray, image_size: int = 256, band_rows: int = 16,
    crop_cols: int = 0, tile_cols: int = 32,
    capacity_buckets: tuple = TILE_CAPACITY_BUCKETS,
    span_buckets: tuple = BIN_SPAN_BUCKETS,
) -> tuple:
    """Validated (tile_capacity, tile_span) buckets for the 2-D
    (row-band x column-tile) binning at this ``tile_cols`` width, or
    (0, 0) when no bucket admits every frame (caller keeps 1-D banding).

    Mirrors the device's membership arithmetic bitwise: the same f32
    ``lo``/``hi`` band comparisons, the same per-frame window left edge
    ``clip(floor(px_min) - 1, 0, S - W)``, and the same integer column
    bounds ``floor(px) - 1 .. floor(px) + 2`` (the crop margins) — so a
    selected pair *guarantees* the tiled tables hold every face the
    per-tile race could need, i.e. output identical to the untiled race."""
    fv = np.asarray(face_verts, np.float32)
    x, y = fv[..., 0], fv[..., 1]
    front = (y[..., 2] - y[..., 0]) * (x[..., 1] - x[..., 0]) >= (
        (y[..., 1] - y[..., 0]) * (x[..., 2] - x[..., 0]))
    S = image_size
    W = crop_cols if 0 < crop_cols < S else S
    if tile_cols <= 0 or tile_cols >= W or W % tile_cols \
            or fv.shape[1] > 16383 or S % band_rows:
        return 0, 0
    nb = S // band_rows
    nc = W // tile_cols
    r0 = np.arange(nb, dtype=np.float32) * band_rows
    lo = (2.0 * r0 + 1 - S) / S
    hi = (2.0 * (r0 + band_rows - 1) + 1 - S) / S
    fy_min, fy_max = y.min(-1), y.max(-1)
    px = (0.5 * (x * S + S - 1)).astype(np.float32)  # (B, F, 3)
    need_cap, need_span = 1, 1
    for b in range(fv.shape[0]):
        okf = front[b] & np.isfinite(px[b]).all(-1)
        if not okf.any():
            continue
        B0 = np.searchsorted(hi, fy_min[b], side="left").astype(np.int64)
        B1 = np.searchsorted(lo, fy_max[b], side="right").astype(np.int64) - 1
        col0 = (int(np.clip(np.floor(px[b][okf].min()) - 1, 0, S - W))
                if W < S else 0)
        pxm = np.where(okf[:, None], px[b], 0.0)
        cl = np.floor(pxm.min(-1)).astype(np.int64) - 1
        cr = np.floor(pxm.max(-1)).astype(np.int64) + 2
        C0 = np.clip(cl - col0, 0, W - 1) // tile_cols
        C1 = np.clip(cr - col0, 0, W - 1) // tile_cols
        ok = okf & (B1 >= B0)
        if not ok.any():
            continue
        need_span = max(need_span, int((C1 - C0 + 1)[ok].max()))
        # per-(band, tile) member counts via a 2-D difference image
        diff = np.zeros((nb + 1, nc + 1), np.int64)
        b0, b1 = np.clip(B0[ok], 0, nb - 1), np.clip(B1[ok], 0, nb - 1)
        c0, c1 = C0[ok], C1[ok]
        np.add.at(diff, (b0, c0), 1)
        np.add.at(diff, (b0, c1 + 1), -1)
        np.add.at(diff, (b1 + 1, c0), -1)
        np.add.at(diff, (b1 + 1, c1 + 1), 1)
        counts = diff.cumsum(0).cumsum(1)[:nb, :nc]
        need_cap = max(need_cap, int(counts.max()))
    cap = next((c for c in sorted(capacity_buckets) if need_cap <= c), 0)
    span = next((s for s in sorted(span_buckets) if need_span <= s), 0)
    if cap == 0 or span == 0:
        return 0, 0
    return cap, span


def select_bin_span(
    face_verts: np.ndarray, image_size: int = 256, band_rows: int = 16,
    buckets: tuple = BIN_SPAN_BUCKETS,
) -> int:
    """Smallest ``bin_span`` bucket admitting every front face's band range
    for the ``bin_impl="copysort"`` binning, or 0 when no bucket does
    (caller should fall back to ``bin_impl="sort"``).

    Mirrors the device's searchsorted band-range computation bitwise (same
    f32 ``lo``/``hi`` arrays, same comparisons), so a selected span is a
    *guarantee*, not a heuristic: a face overlapping bands [B0, B1] emits
    exactly B1-B0+1 copies whenever span >= that count.  For SMPL meshes at
    256 px / 16-row bands the span is 2 (triangles are a few pixels tall);
    a span that small keeps the copy-sort ~nb/span times cheaper than the
    per-band row sort."""
    fv = np.asarray(face_verts, np.float32)
    x, y = fv[..., 0], fv[..., 1]
    front = (y[..., 2] - y[..., 0]) * (x[..., 1] - x[..., 0]) >= (
        (y[..., 1] - y[..., 0]) * (x[..., 2] - x[..., 0]))
    S = image_size
    nb = S // band_rows
    r0 = np.arange(nb, dtype=np.float32) * band_rows
    lo = (2.0 * r0 + 1 - S) / S
    hi = (2.0 * (r0 + band_rows - 1) + 1 - S) / S
    fy_min, fy_max = y.min(-1), y.max(-1)
    B0 = np.searchsorted(hi, fy_min, side="left")
    B1 = np.searchsorted(lo, fy_max, side="right") - 1
    span = np.where(front & (B1 >= B0), B1 - B0 + 1, 0)
    need = int(span.max()) if span.size else 1
    for s in sorted(buckets):
        if need <= s:
            return s
    return 0


@functools.partial(
    jax.jit, static_argnames=("image_size", "near", "far", "chunk", "flip_y",
                              "return_depth", "band_rows", "band_capacity",
                              "depth_mode", "bin_impl", "bin_span",
                              "depth_range_checked", "crop_cols",
                              "tile_cols", "tile_span", "tile_capacity")
)
def rasterize_fim_wim(
    face_verts: jnp.ndarray,
    image_size: int = 256,
    near: float = 0.1,
    far: float = 25.0,
    chunk: int = 2048,
    flip_y: bool = True,
    return_depth: bool = False,
    band_rows: int = 0,
    band_capacity: int = 4096,
    depth_mode: str = "exact",
    bin_impl: str = "sort",
    bin_span: int = 2,
    depth_range_checked: bool = False,
    crop_cols: int = 0,
    tile_cols: int = 0,
    tile_span: int = 2,
    tile_capacity: int = 1024,
):
    """Rasterize (B, F, 3, 3) view-space triangles into per-pixel
    (face_index_map (B, S, S) int32 [-1 = background],
     weight_map (B, S, S, 3) float [, depth_map (B, S, S)]).

    Equivalent of reference ``nr.rasterize_face_index_map_and_weight_map``
    (``neural_renderer/rasterize.py:543-571``), including the python
    wrapper's vertical flip of the CUDA kernel's output
    (``rasterize.py:335-338``) — ``flip_y=False`` gives the raw kernel
    orientation.

    ``band_rows > 0`` bins faces into horizontal pixel bands before the
    z-buffer pass (see ``_rasterize_single``) — ~2x end-to-end on the SMPL
    pipeline, but bands over ``band_capacity`` front faces silently drop
    the highest-id overflow, so it is OFF by default here (exact for any
    mesh); ``SMPLFlowEngine`` turns it on for the SMPL topology, whose
    per-band counts sit far under the default capacity (validate other
    meshes with ``band_occupancy``).

    ``depth_mode="affine"`` evaluates 1/zp per (pixel, face) as a
    precomputed per-face affine function instead of the CUDA clamp +
    renormalize + divide chain (see ``_zbuffer_pass``) — the same value up
    to ~1e-6 relative rounding, so the selected face can differ only at
    z-fighting pixels; the weight map is always recomputed with the exact
    clamped formula for the winning face.

    ``depth_mode="fused"`` adds two more VPU cuts on top of "affine": the
    half-plane tests become precomputed per-face affine edge functions and
    the per-chunk (argmax, gather, compare, select) depth race becomes ONE
    uint32 max over packed (quantized 1/zp | reversed face id) words (see
    ``_zbuffer_pass``).  Output differs from "exact" only at edge-marginal
    pixels (sub-1e-6 relative edge distances round differently) and where
    faces z-fight within the ~4e-5·(1/near) depth quantization step (ties
    resolve to the lowest face id, the CUDA rule); the emitted weight and
    depth maps are always recomputed exactly for the winning face.
    Requires F <= 16383 (falls back to "affine" above that).

    ``bin_impl="copysort"`` (banded path only) builds the per-band face
    tables with ONE composite-key sort over ``bin_span`` copies per face
    instead of a row-sort per band — identical tables (see
    ``_rasterize_single``) whenever every face's band range fits
    ``bin_span`` (validate per clip with ``select_bin_span``; F > 16383
    falls back to the row-sort form).

    ``depth_range_checked=True`` (fused mode only) skips the per-(pixel,
    face) near/far validity compares and the quantizer's upper clamp —
    sound whenever every vertex depth lies strictly inside (near, far),
    which ``SMPLFlowEngine.adapt_to_clip`` verifies on the host per clip.

    ``0 < crop_cols < image_size`` (banded path only) races only a
    ``crop_cols``-wide column window placed per frame from the front-face
    x extents, scattered back into the full canvas — exact whenever every
    frame's extent fits the window (validate per clip with
    ``select_crop_cols``); see ``_rasterize_single``.

    ``0 < tile_cols < crop window`` (copysort path, F <= 16383) further
    bins faces into (row-band x column-tile) tables of per-tile capacity
    ``tile_capacity`` with at most ``tile_span`` column tiles per face —
    each tile then races only its overlapping faces (the face-side cull
    the 1-D band capacity cannot reach).  Exact whenever the host-selected
    (``select_tile_bins``) capacity/span admit every frame.
    """
    fn = functools.partial(
        _rasterize_single, image_size=image_size, near=near, far=far,
        chunk=chunk, band_rows=band_rows, band_capacity=band_capacity,
        depth_mode=depth_mode, bin_impl=bin_impl, bin_span=bin_span,
        depth_range_checked=depth_range_checked, crop_cols=crop_cols,
        tile_cols=tile_cols, tile_span=tile_span,
        tile_capacity=tile_capacity,
    )
    fim, wim, dim = jax.vmap(fn)(face_verts)
    if flip_y:
        fim = fim[:, ::-1]
        wim = wim[:, ::-1]
        dim = dim[:, ::-1]
    if return_depth:
        return fim, wim, dim
    return fim, wim
