"""SMPL barycentric flow engine.

Re-design of the reference's ``float_estimate`` (``src/cal_flow.py:13-39``)
plus ``SMPLRenderer.render_fim_wim`` / ``cal_bc_transform``
(``src/nmr.py:263-278, 617-659``): render source and target poses to
face-index/weight maps, transform each target pixel to the source-image
location of its face's vertices blended by barycentric weights, then
backward-warp the source image.

The reference's per-batch-item Python loop in ``cal_bc_transform`` becomes a
batched gather; the whole engine is one jittable function.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from jafpro_tpu.config import default_smpl_faces_path
from jafpro_tpu.geometry.projection import project_to_view, vertices_to_faces
from jafpro_tpu.geometry.rasterizer import rasterize_fim_wim
from jafpro_tpu.ops.sampling import grid_sample


def cal_bc_transform(
    src_f2pts: jnp.ndarray, dst_fims: jnp.ndarray, dst_wims: jnp.ndarray
) -> jnp.ndarray:
    """Barycentric transform map (reference ``nmr.py:617-659``, de-looped).

    Args:
      src_f2pts: (B, F, 3, 2) source-image xy of each face's vertices.
      dst_fims:  (B, S, S) int32 target face-index map (-1 = background).
      dst_wims:  (B, S, S, 3) target barycentric weights.
    Returns:
      (B, S, S, 2) sampling grid into the source image; -2 at background.
    """
    B, S, _ = dst_fims.shape
    exist = dst_fims >= 0
    safe = jnp.where(exist, dst_fims, 0)

    # gather (B, S, S, 3, 2) face-vertex positions
    def gather_one(f2pts, fim):
        return f2pts[fim]  # (S, S, 3, 2)

    gathered = jax.vmap(gather_one)(src_f2pts, safe)
    T = jnp.sum(gathered * dst_wims[..., None], axis=3)  # (B, S, S, 2)
    return jnp.where(exist[..., None], T, -2.0)


@dataclasses.dataclass
class SMPLFlowEngine:
    """Holds the static face topology; all methods are jit-friendly.

    The default face set is the 13776-triangle SMPL topology loaded from the
    standard ``smpl_faces.npy`` asset (auto-discovered); tests may pass a
    small synthetic topology.
    """

    faces: np.ndarray  # (F, 3) int32
    image_size: int = 256
    near: float = 0.1
    far: float = 25.0
    viewing_angle: float = 30.0
    chunk: int = 2048  # swept on v5e: 2048 ~1.6x faster than 512 (TUNING.md)
    backend: str = "auto"  # "auto" | "xla" | "pallas"
    # Row-band face binning (XLA backend only; the opt-in pallas kernel has
    # its own VMEM block culling and ignores these).  Exact for the SMPL
    # topology at this capacity (validate other meshes with
    # ``rasterizer.band_occupancy``); band_rows=0 -> dense/exact for any
    # mesh.
    band_rows: int = 16
    band_capacity: int = 4096
    # "fused" (default): affine 1/zp + precomputed affine edge functions +
    # packed uint32 single-max depth race (rasterizer.py) — identical to
    # the CUDA clamp/renormalize/divide chain up to ~1e-6 rounding plus an
    # 18-bit depth quantization in the race (the winner can differ only at
    # z-fighting pixels; ties pick the lowest id, the CUDA rule; emitted
    # weights/depth stay exact for the winner).  Measured in-session
    # 49.4 -> 55.1 (affine over exact) then 55.9 -> 63.7 frames/s (fused
    # over affine) — TUNING.md.
    # "affine": per-face affine 1/zp only (exact CUDA edge tests, no
    # quantized race).  "exact": the CUDA formula bit-for-bit — parity
    # oracles pin this.
    depth_mode: str = "fused"
    # Band-table construction (banded XLA path): "sort" = per-band row
    # sort (safe for any mesh); "copysort" = one composite-key sort over
    # ``bin_span`` copies per face (identical tables when every face's
    # band range fits the span — ``select_bin_span``); "auto" = resolve to
    # "copysort" with a measured span in ``adapt_to_clip``, "sort"
    # otherwise.
    bin_impl: str = "auto"
    bin_span: int = 2
    # Column-window cropping (banded XLA path): 0 = full width; > 0 races
    # only a crop_cols-wide window positioned per frame from the
    # front-face x extents (static width, traced offset — see
    # ``rasterizer.select_crop_cols``).  ``adapt_to_clip`` selects the
    # measured-exact bucket: capacity culls the face side of the
    # (pixels x faces) race, the crop culls the pixel side (a person
    # covers a fraction of the frame width).
    crop_cols: int = 0
    # Skip the fused race's per-(pixel, face) near/far compares + clamp;
    # ONLY set by ``adapt_to_clip`` after host-verifying every vertex
    # depth of the clip lies strictly inside (near, far).
    depth_range_checked: bool = False
    # 2-D (row-band x column-tile) binning on top of the column crop
    # (rasterizer.select_tile_bins): tile_cols = column-tile width
    # (0 = 1-D banding); tile_capacity/tile_span are the host-validated
    # per-tile buckets.  Set by ``adapt_to_clip`` when
    # ``JAFPRO_RASTER_TILE_COLS`` (or the tile_request field) asks for a
    # width and the clip validates it.
    tile_cols: int = 0
    tile_span: int = 2
    tile_capacity: int = 1024

    @classmethod
    def create(
        cls, faces: Optional[np.ndarray] = None, image_size: int = 256, **kw
    ) -> "SMPLFlowEngine":
        if faces is None:
            path = default_smpl_faces_path()
            if path is None:
                raise FileNotFoundError(
                    "smpl_faces.npy not found; set JAFPRO_SMPL_FACES or pass faces"
                )
            faces = np.load(path).astype(np.int32)
        return cls(faces=np.asarray(faces, np.int32), image_size=image_size, **kw)

    def adapt_to_clip(self, cams: np.ndarray, vertices: np.ndarray,
                      include_crop: bool = True) -> "SMPLFlowEngine":
        """Return an engine whose band capacity is *measured-exact* for this
        clip's poses: project the clip's SMPL vertices on the host, take the
        max per-band front-face count over all frames, and pick the smallest
        power-of-two capacity bucket that admits it (falling back to the
        dense/exact rasterizer when even the largest bucket would drop
        faces, e.g. a zoomed-out mesh squeezing into a few bands).

        Host-side NumPy only — no device dispatch; call once per clip.
        Capacity is a static jit arg, so bucketing bounds the number of
        compiled programs to the bucket count."""
        if self.band_rows <= 0 or self._use_pallas():
            return self
        from jafpro_tpu.geometry.projection import project_to_view_np
        from jafpro_tpu.geometry.rasterizer import (
            select_band_capacity, select_bin_span, select_crop_cols)

        view = project_to_view_np(np.asarray(vertices, np.float32),
                                  np.asarray(cams, np.float32),
                                  self.viewing_angle)
        fv = view[:, self.faces]
        # NOT selected: depth_range_checked.  The precondition (every vertex
        # depth strictly inside (near, far)) holds for normal clips, but the
        # "optimization" MEASURED SLOWER on TPU — 58.0 vs 64.4 f/s in-session
        # (TUNING.md round 2: dropping the compares denies XLA the
        # clip-before-convert form it fuses better).  It stays a tested
        # opt-in knob only.
        eng = self
        cap = select_band_capacity(fv, self.image_size, self.band_rows)
        if cap == 0:
            return dataclasses.replace(eng, band_rows=0)
        eng = dataclasses.replace(eng, band_capacity=cap)
        if eng.bin_impl == "auto":
            span = select_bin_span(fv, self.image_size, self.band_rows)
            eng = dataclasses.replace(
                eng, bin_impl="copysort" if span else "sort",
                bin_span=span or eng.bin_span)
        if include_crop:
            # 26.5% off raster time, bitwise-equal (TUNING.md round 3) — but
            # the cropped kernel's traced-offset scatter-back compiles ~15x
            # slower.  Serving amortizes that per width bucket (and via the
            # persistent XLA cache); training callers pass False: the step
            # is conv/backward-dominated and measured no throughput change
            # (0.685 vs 0.68 it/s), so the compile cost buys nothing there.
            eng = dataclasses.replace(
                eng, crop_cols=select_crop_cols(fv, self.image_size))
        # 2-D (row-band x column-tile) binning on the copysort path; the
        # clip must validate a per-tile capacity/span pair
        # (select_tile_bins) or tiling stays off.  OPT-IN
        # (JAFPRO_RASTER_TILE_COLS=<width>; the width must divide the
        # raced window or validation rejects it): measured A/Bs found no
        # win at any valid width on either bench workload and a clear
        # loss at 32 px — the round-3 column crop already bounds the
        # x-extent, and within the 96-px body window the per-tile cull
        # removes too few faces to pay for the extra tables
        # (TUNING.md round 4).
        import os

        req = int(os.environ.get("JAFPRO_RASTER_TILE_COLS",
                                 str(self.tile_cols)) or 0)
        if req > 0 and eng.bin_impl == "copysort":
            from jafpro_tpu.geometry.rasterizer import select_tile_bins

            cap2, span2 = select_tile_bins(
                fv, self.image_size, self.band_rows,
                crop_cols=eng.crop_cols, tile_cols=req)
            eng = dataclasses.replace(
                eng, tile_cols=req if cap2 else 0,
                tile_capacity=cap2 or eng.tile_capacity,
                tile_span=span2 or eng.tile_span)
        else:
            eng = dataclasses.replace(eng, tile_cols=0)
        return eng

    @staticmethod
    def merge_conservative(engines: list) -> "SMPLFlowEngine":
        """Combine per-clip adapted engines into one that is exact for
        EVERY clip (batch serving renders a group with one program).

        Each adapt-selected field must be merged independently — picking
        the single most conservative *engine* is wrong (clip A can bind
        the capacity while clip B binds the crop window): dense beats any
        banding, larger capacity beats smaller, full width (crop 0) beats
        any window, larger window beats smaller, row-sort beats copysort,
        larger span beats smaller, and the range-check skip is only sound
        when every clip verified it."""
        if any(e.band_rows == 0 for e in engines):
            return dataclasses.replace(engines[0], band_rows=0)
        return dataclasses.replace(
            engines[0],
            band_capacity=max(e.band_capacity for e in engines),
            bin_impl=("sort" if any(e.bin_impl != "copysort"
                                    for e in engines) else "copysort"),
            bin_span=max(e.bin_span for e in engines),
            crop_cols=(0 if any(e.crop_cols == 0 for e in engines)
                       else max(e.crop_cols for e in engines)),
            depth_range_checked=all(e.depth_range_checked for e in engines),
            # tiling only survives a merge when every clip validated the
            # SAME (tile width, crop window) pair: per-tile capacity/span
            # guarantees are stated relative to the raced window width
            tile_cols=(engines[0].tile_cols
                       if len({(e.tile_cols, e.crop_cols)
                               for e in engines}) == 1
                       else 0),
            tile_capacity=max(e.tile_capacity for e in engines),
            tile_span=max(e.tile_span for e in engines),
        )

    def _use_pallas(self) -> bool:
        # "auto" currently resolves to the blocked-XLA kernel: on the
        # remote-compile TPU runtime available here the Mosaic build of the
        # Pallas kernel is an order of magnitude slower to compile, and the
        # XLA kernel is already device-bound.  Set backend="pallas"
        # explicitly to use the VMEM-resident kernel.
        if self.backend == "pallas":
            return True
        return False

    def project_faces(self, cam: jnp.ndarray, vertices: jnp.ndarray):
        """View-space face vertices only: (B,3),(B,V,3) -> (B,F,3,3).

        The flow source pose needs just these — the reference's
        ``cal_flow`` (``src/cal_flow.py:29-31``) rasterizes the source and
        then discards ``src_fim``/``src_wim``, using only the projected
        ``src_f2verts``; the z-buffer pass for the source is pure waste
        (XLA does not DCE it through the banded scan — measured ~3 ms/frame
        amortized in bench_breakdown's srcraster ablation)."""
        view_verts = project_to_view(vertices, cam, self.viewing_angle)
        return vertices_to_faces(view_verts, jnp.asarray(self.faces))

    def render_fim_wim(self, cam: jnp.ndarray, vertices: jnp.ndarray):
        """cam: (B, 3), vertices: (B, V, 3) ->
        (f2verts (B,F,3,3) view-space, fim (B,S,S), wim (B,S,S,3)).
        Reference ``nmr.py:263-278``.
        """
        fv = self.project_faces(cam, vertices)
        if self._use_pallas():
            from jafpro_tpu.geometry.rasterizer_pallas import (
                rasterize_fim_wim_pallas)

            # smaller face blocks than the XLA path: every (pixels x block)
            # temporary lives in VMEM
            fim, wim = rasterize_fim_wim_pallas(
                fv, image_size=self.image_size, near=self.near,
                far=self.far, block=min(self.chunk, 256))
        else:
            fim, wim = rasterize_fim_wim(
                fv, image_size=self.image_size, near=self.near,
                far=self.far, chunk=self.chunk,
                band_rows=self.band_rows, band_capacity=self.band_capacity,
                depth_mode=self.depth_mode,
                # "auto" = not adapted to a clip: the row sort is the form
                # that needs no host-validated span
                bin_impl=("sort" if self.bin_impl == "auto"
                          else self.bin_impl),
                bin_span=self.bin_span,
                depth_range_checked=self.depth_range_checked,
                crop_cols=self.crop_cols,
                tile_cols=self.tile_cols, tile_span=self.tile_span,
                tile_capacity=self.tile_capacity,
            )
        return fv, fim, wim

    def cal_flow(
        self,
        src_cam: jnp.ndarray,
        src_vertices: jnp.ndarray,
        tgt_cam: jnp.ndarray,
        tgt_vertices: jnp.ndarray,
    ) -> jnp.ndarray:
        """Dense target->source sampling grid (B, S, S, 2).

        Reference ``cal_flow.py:28-35``: the source faces' xy keep the
        projected x and un-flip y (the render path flipped it), i.e. the
        grid is in grid_sample's normalized coords of the source image.
        """
        src_f2verts = self.project_faces(src_cam, src_vertices)
        src_f2pts = src_f2verts[..., 0:2]
        src_f2pts = src_f2pts.at[..., 1].multiply(-1.0)
        _, tsf_fim, tsf_wim = self.render_fim_wim(tgt_cam, tgt_vertices)
        return cal_bc_transform(src_f2pts, tsf_fim, tsf_wim)

    def warp_image(self, src_image: jnp.ndarray, flow: jnp.ndarray) -> jnp.ndarray:
        """grid_sample with border padding (reference ``cal_flow.py:37-39``).
        src_image: (B, S, S, C) NHWC."""
        return grid_sample(src_image, flow, padding_mode="border")

    def __call__(
        self,
        src_img: jnp.ndarray,
        src_cam: jnp.ndarray,
        src_vertices: jnp.ndarray,
        tgt_cam: jnp.ndarray,
        tgt_vertices: jnp.ndarray,
    ) -> jnp.ndarray:
        """tsf_image = warp(src_img, flow(src->tgt)); the ``float_estimate``
        forward (reference ``cal_flow.py:21-26``)."""
        flow = self.cal_flow(src_cam, src_vertices, tgt_cam, tgt_vertices)
        return self.warp_image(src_img, flow)


def swap_smpl(
    src_cam: jnp.ndarray, src_shape: jnp.ndarray, tgt_smpl: jnp.ndarray,
    first_cam: jnp.ndarray, cam_strategy: str = "smooth",
) -> jnp.ndarray:
    """Motion-transfer SMPL recomposition (reference ``cal_flow.py:41-58``):
    take the target's pose, the source's shape, and a camera per strategy
    ('smooth': source cam + target's xy drift relative to the first frame;
    'source': source cam; else target cam).  tgt_smpl: (B, 85)."""
    tgt_cam = tgt_smpl[:, 0:3]
    pose = tgt_smpl[:, 3:75]
    if cam_strategy == "smooth":
        delta_xy = tgt_cam[:, 1:] - first_cam[:, 1:]
        cam = jnp.concatenate(
            [src_cam[:, :1], src_cam[:, 1:] + delta_xy], axis=1)
    elif cam_strategy == "source":
        cam = src_cam
    else:
        cam = tgt_cam
    return jnp.concatenate([cam, pose, src_shape], axis=1)
