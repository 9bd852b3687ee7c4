"""End-to-end video generation (the ``conv_pro_test.py`` equivalent).

Per clip: accumulate + inpaint the reference textures once, synthesize the
background once, then generate all 30 frames with a ``lax.scan`` over the
frame axis (reference per-frame Python loop ``test/conv_pro_test.py:255-304``)
— one compiled graph for the whole clip, so the frames/sec/chip north-star
is a single device program.

Per frame (matching the reference):
  * the propagation source is the reference frame whose clip index is
    nearest to the target frame (``argmin |i - chosen_frames|``)
  * texture_warp through the frame's IUV -> refine -> fuse with bg
  * SMPL flow from the chosen reference pose to the target pose warps the
    reference image; the propagation net blends it with the generated frame.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from jafpro_tpu.pipeline import JAFProPipeline


@dataclasses.dataclass
class VideoGenerator:
    """``frame_batch`` frames are generated together per scan step: frames
    are independent given the clip textures (the propagation source is a
    *reference* frame, not the previous output — ``conv_pro_test.py:258``),
    so batching them fills the MXU far better than the reference's
    frame-by-frame loop.  Propagation normalization uses per-sample
    statistics, which equals the reference's batch-1 behavior exactly, so
    results are identical for any ``frame_batch``."""

    pipe: JAFProPipeline
    # measured on v5e (TUNING.md): the scanned per-frame schedule overlaps
    # better than frame batching while the rasterizer dominates; raise this
    # once the z-buffer is VMEM-resident
    frame_batch: int = 1
    # "scan": rasterize each frame inside the frame scan (round-1 schedule).
    # "batch": rasterize ALL target poses in one batched z-buffer pass up
    # front and scan only the conv stack — rasterization batches well
    # (bigger per-band pixel blocks amortize the face gathers) while CRN
    # batching measured slower (TUNING.md), so batch the one and scan the
    # other.  Output is identical either way.
    raster_mode: str = "scan"
    # "batch": hoist the ENTIRE flow branch (z-buffer + barycentric
    # transform + source-image warp) out of the frame scan as one batched
    # pass — the branch is scan-independent (its inputs are the per-frame
    # pose and the per-clip references) and bench_breakdown measured it at
    # ~half of frame time, dominated by gathers that batch well.  Output is
    # identical.  Supersedes raster_mode for the tsf path when "batch".
    flow_mode: str = "scan"
    # "lut": precompute the warp table once per clip (two MXU matmuls over
    # the integer-UV lattice, build_texture_warp_lut) and warp each frame
    # with a single-tap gather — 4x fewer random HBM loads than the 4-tap
    # atlas gather ("gather"), which bench_breakdown measured at ~5.5
    # ms/frame HBM-bound.  Exact for integer-valued (uint8-decoded) IUV,
    # i.e. all real DensePose data; "gather" keeps the bilinear form for
    # arbitrary float coordinates.  "lut2": same table, but the per-frame
    # lookup gathers the contiguous (part, u) row and selects v with a
    # fused one-hot reduce (texture_warp_lut impl="rows") — the
    # lane-aligned gather shape the TPU vectorizes.  "mm"/"mm8": dense
    # tent-weight matmul straight off the part tiles (texture_warp_mm) —
    # zero gathers; "mm" keeps bf16 operands, "mm8" quantizes both matmul
    # operands to int8 (2x MXU rate, ~1/127 absolute tolerance).
    warp_mode: str = "lut"
    # Pixel-side culls for the per-pixel gather stages (serving-side, like
    # the rasterizer's own crop_cols): a person covers a fraction of the
    # frame width, and these stages gather per PIXEL (round-3 attribution:
    # warp LUT 3.3 ms/f, bc-transform + source warp ~1.5 ms/f — TUNING.md).
    # warp_crop_cols > 0 crops the texture warp to a column window placed
    # per frame from the IUV body extent; the width must be host-validated
    # per clip (rasterizer.select_mask_crop_cols on tgt_iuv255's part ids —
    # cli.py's adapt step selects the bucket).  Bitwise-exact: part id 0
    # outside the body makes the full-width warp 0 there.
    warp_crop_cols: int = 0
    # crop_flow=True additionally crops the barycentric transform + the
    # source-image warp to the flow engine's raster window width
    # (engine.crop_cols — its select_crop_cols validation already covers
    # every fim >= 0 column); a no-op while engine.crop_cols == 0.
    # Bitwise-exact: outside the window fim is -1, the flow is -2, and the
    # border-clamped sample of -2 is a per-image constant fill.
    crop_flow: bool = True
    # Timing diagnostics ONLY (bench_breakdown.py): component names to
    # replace with cheap shape-preserving stand-ins so whole-program A/B
    # deltas attribute frame time per component.  The stand-ins stay
    # data-dependent (never constants) so XLA cannot fold the downstream
    # graph away.  Recognized: "prep" (accumulate+inpaint+bg; "accu" and
    # "bg" split it), "lutbuild" (the per-clip warp-table matmuls),
    # "srcraster" (the hoisted per-clip source z-buffer), "warp"
    # (24-part texture warp), "refine" (refine CRN), "raster" (per-frame
    # z-buffer), "flow" (raster + bc-transform + image warp), "pro"
    # (propagation net).  Output is NOT the real pipeline under ablation.
    ablate: frozenset = frozenset()
    # Serving epilogue: encode the four output streams to uint8 ON DEVICE
    # (the same rounding frames_to_uint8 applies on host), so the per-clip
    # D2H fetch ships 1 byte/channel instead of 4 — measured ~1 s/clip of
    # fetch+convert at float32 on the remote transport (TUNING.md round
    # 4), vs ~0.4 s of device compute.  Off by default: training/eval
    # consumers read float frames.
    output_uint8: bool = False

    def __post_init__(self):
        # propagation with per-sample norm shares the training parameters
        # (identical tree structure, different normalization axes)
        from jafpro_tpu.models.propagation import Propagation3DFlowNet

        src = self.pipe.pro
        self._pro_infer = Propagation3DFlowNet(
            ngf=src.ngf, n_downsampling=src.n_downsampling,
            n_blocks=src.n_blocks, use_mask=src.use_mask,
            use_iuv=src.use_iuv, per_sample_norm=True, dtype=src.dtype)

    @functools.cached_property
    def _jitted(self):
        return jax.jit(self._generate)

    def _generate(self, params: Dict[str, Any], clip: Dict[str, jnp.ndarray]):
        # uint8 wire-format clips (load_clip) expand to float semantics on
        # device and tgt_iuv is derived from tgt_iuv255 here; float32 clips
        # (synthetic/tests) pass through unchanged.  Shipping the decoded
        # PNG bytes instead of float32 copies cuts the per-clip H2D
        # transfer ~4x — the serving loop's floor on the remote transport.
        from jafpro_tpu.train.common import normalize_batch

        clip = normalize_batch(clip)
        pipe = self.pipe
        engine = pipe.flow_engine
        if "prep" in self.ablate or "accu" in self.ablate:
            inpainted = clip["src_parts"][:, 0]
        else:
            inpainted, _ = pipe.prepare_textures(
                params, clip["src_parts"], clip["ref_mask"],
                clip["src_mask_parts"])
        if "prep" in self.ablate or "bg" in self.ablate:
            bg_out = clip["bg_incomplete"]
        else:
            bg_out = pipe.background(params, clip["bg_incomplete"])

        chosen = clip["chosen_frames"]          # (R,) int32 clip indices
        src_imgs = clip["src_imgs"]             # (R, S, S, 3)
        cams = clip["cams"]                     # (T, 3)
        verts = clip["verts"]                   # (T, V, 3)
        S = pipe.cfg.image_size

        # The R source poses are frame-invariant AND need no z-buffer: the
        # flow uses only the projected face vertices (the reference renders
        # src fim/wim every frame and discards them, conv_pro_test.py:274 /
        # cal_flow.py:29-31).  Projection-only replaces the round-1 batched
        # source rasterization (~3 ms/frame amortized, bench_breakdown).
        pro_index = jnp.clip(chosen, 0, cams.shape[0] - 1)  # (R,)
        if "srcraster" in self.ablate:
            # face-vertex gather without even the projection pass
            faces = jnp.asarray(engine.faces)
            src_f2verts = verts[pro_index][:, faces]  # (R, F, 3, 3)
        else:
            src_f2verts = engine.project_faces(
                cams[pro_index], verts[pro_index])
        src_f2pts_all = src_f2verts[..., 0:2]
        src_f2pts_all = src_f2pts_all.at[..., 1].multiply(-1.0)  # (R,F,3,2)

        from jafpro_tpu.data.texture import (
            build_texture_warp_lut, parts_to_atlas, texture_warp_atlas,
            texture_warp_lut, texture_warp_mm)
        from jafpro_tpu.geometry.flow import cal_bc_transform
        from jafpro_tpu.geometry.rasterizer import column_window_offset

        Wf = (engine.crop_cols
              if self.crop_flow and 0 < engine.crop_cols < S else 0)

        def bc_warp(f2pts, fim, wim, src):
            """flow = bc_transform(fim, wim); tsf = border-warp(src, flow),
            column-cropped to the raster window when Wf > 0 (bitwise-equal:
            outside the window fim = -1 -> flow = -2 -> the border-clamped
            constant fill)."""
            if not Wf:
                return engine.warp_image(src, cal_bc_transform(
                    f2pts, fim, wim))
            c0 = column_window_offset(fim >= 0, Wf)  # (B,)
            fim_w = jax.vmap(
                lambda a, c: jax.lax.dynamic_slice(a, (0, c), (S, Wf)))(
                    fim, c0)
            wim_w = jax.vmap(
                lambda a, c: jax.lax.dynamic_slice(a, (0, c, 0), (S, Wf, 3)))(
                    wim, c0)
            flow_w = cal_bc_transform(f2pts, fim_w, wim_w)
            tsf_w = engine.warp_image(src, flow_w)          # (B, S, Wf, C)
            fill = engine.warp_image(
                src, jnp.full((src.shape[0], 1, 1, 2), -2.0, flow_w.dtype))
            canvas = jnp.broadcast_to(
                fill, tsf_w.shape[:1] + (S, S) + tsf_w.shape[-1:])
            return jax.vmap(
                lambda cv, w, c: jax.lax.dynamic_update_slice(
                    cv, w, (0, c, 0)))(canvas, tsf_w, c0)

        Wc = (self.warp_crop_cols
              if (0 < self.warp_crop_cols < S
                  and self.warp_mode in ("lut", "lut2")) else 0)

        def warp_cropped(iuv255):
            """texture_warp_lut on the IUV body's column window only,
            scattered back into the zero background (bitwise-equal given
            the host-validated width: part id 0 -> warp 0)."""
            c0 = column_window_offset(iuv255[..., 0] > 0, Wc)  # (fb,)
            iuv_w = jax.vmap(
                lambda a, c: jax.lax.dynamic_slice(a, (0, c, 0), (S, Wc, 3)))(
                    iuv255, c0)
            w_w = texture_warp_lut(
                warp_src_b, iuv_w,
                impl="rows" if self.warp_mode == "lut2" else "tap")
            return jax.vmap(
                lambda w, c: jax.lax.dynamic_update_slice(
                    jnp.zeros((S, S, w.shape[-1]), w.dtype), w, (0, c, 0)))(
                        w_w, c0)

        T = clip["tgt_iuv255"].shape[0]
        fb = self.frame_batch
        while T % fb:  # largest divisor of T not above frame_batch
            fb -= 1
        # assemble the warp source ONCE per clip (frame-invariant; leaving
        # the relayout inside the scan measured ~30% of frame time —
        # bench_breakdown, TUNING.md round 2): either the (4p, 6p, 3) atlas
        # for the 4-tap gather, or the integer-UV LUT for the 1-tap form
        if self.warp_mode in ("lut", "lut2"):
            if "lutbuild" in self.ablate:
                # shape-matched stand-in: pad the 200-px tiles to the
                # 256-px lattice instead of the two interpolation matmuls
                p = inpainted.shape[2]
                warp_src = jnp.pad(
                    inpainted, ((0, 0), (0, 0), (0, 256 - p),
                                (0, 256 - p), (0, 0)))
            else:
                warp_src = build_texture_warp_lut(inpainted)
        elif self.warp_mode in ("mm", "mm8"):
            warp_src = inpainted  # matmul consumes the tiles directly
        else:
            warp_src = parts_to_atlas(inpainted)
        warp_src_b = jnp.broadcast_to(warp_src, (fb,) + warp_src.shape[1:])
        bg_b = jnp.broadcast_to(bg_out, (fb,) + bg_out.shape[1:])

        if self.flow_mode == "batch" and "flow" not in self.ablate:
            # hoist the whole scan-independent flow branch: batched
            # z-buffer -> batched barycentric flow -> batched source warp
            src_pro_all = jnp.argmin(
                jnp.abs(jnp.arange(T)[:, None] - chosen[None, :]), axis=1)
            _, fim_all, wim_all = engine.render_fim_wim(cams, verts)
            tsf_all = bc_warp(src_f2pts_all[src_pro_all], fim_all, wim_all,
                              src_imgs[src_pro_all])
        elif self.raster_mode == "batch":
            # one batched z-buffer over every target pose; the scan below
            # consumes precomputed fim/wim slices
            _, fim_all, wim_all = engine.render_fim_wim(cams, verts)

        def frame_step(carry, xs):
            i, iuv255, iuv, smpl_mask = xs[:4]  # leading axis fb
            dist = jnp.abs(i[:, None] - chosen[None, :])  # (fb, R)
            src_pro = jnp.argmin(dist, axis=1)            # (fb,)
            prev_img = src_imgs[src_pro]                  # (fb, S, S, 3)

            if "warp" in self.ablate:
                warped = iuv  # shape-matched, data-dependent stand-in
            elif Wc:
                warped = warp_cropped(iuv255)
            elif self.warp_mode == "lut2":
                warped = texture_warp_lut(warp_src_b, iuv255, impl="rows")
            elif self.warp_mode == "lut":
                warped = texture_warp_lut(warp_src_b, iuv255)
            elif self.warp_mode in ("mm", "mm8"):
                warped = texture_warp_mm(
                    warp_src_b, iuv255,
                    quant="int8" if self.warp_mode == "mm8" else "bf16")
            else:
                warped = texture_warp_atlas(warp_src_b, iuv255)
            if "refine" in self.ablate:
                refined = warped
                fg_mask = jnp.mean(warped, -1, keepdims=True) * 1e-6 + 0.5
            else:
                refined, fg_mask = pipe.refine.apply(
                    params["refine"], warped, S)
            fusion = refined * fg_mask + bg_b * (1.0 - fg_mask)

            if "flow" in self.ablate:
                tsf = prev_img
            elif self.flow_mode == "batch":
                tsf = xs[4]
            else:
                if self.raster_mode == "batch":
                    tsf_fim, tsf_wim = xs[4], xs[5]
                elif "raster" in self.ablate:
                    # valid face ids with some -1 background, derived from
                    # runtime data so XLA keeps the downstream gathers
                    tsf_fim = iuv255[..., 0].astype(jnp.int32) % 97 - 1
                    tsf_wim = iuv * 0.33 + 0.33
                else:
                    _, tsf_fim, tsf_wim = engine.render_fim_wim(
                        cams[i], verts[i])
                tsf = bc_warp(src_f2pts_all[src_pro], tsf_fim, tsf_wim,
                              prev_img)

            if "pro" in self.ablate:
                out = {"pred_target": fusion,
                       "weight": jnp.mean(tsf, -1, keepdims=True) * 1e-6 + .5}
            else:
                out = self._pro_infer.apply(
                    params["pro"], fusion, tsf, iuv, smpl_mask)
            return carry, {
                "final": out["pred_target"],
                "coarse": fusion,
                "mask": out["weight"],
                "tsf": tsf,
            }

        def fold(x):
            return x.reshape((T // fb, fb) + x.shape[1:])

        xs = (fold(jnp.arange(T)), fold(clip["tgt_iuv255"]),
              fold(clip["tgt_iuv"]), fold(clip["smpl_mask"]))
        if self.flow_mode == "batch" and "flow" not in self.ablate:
            xs = xs + (fold(tsf_all),)
        elif self.raster_mode == "batch":
            xs = xs + (fold(fim_all), fold(wim_all))
        _, frames = jax.lax.scan(frame_step, None, xs)
        # (T//fb, fb, ...) -> (T, ...)
        out = jax.tree_util.tree_map(
            lambda x: x.reshape((T,) + x.shape[2:]), frames)
        if self.output_uint8:
            def enc(x):  # (-1,1) -> u8, matching frames_to_uint8
                return jnp.clip((x * 0.5 + 0.5) * 255.0, 0, 255
                                ).astype(jnp.uint8)

            out = {"final": enc(out["final"]), "coarse": enc(out["coarse"]),
                   "tsf": enc(out["tsf"]),
                   "mask": jnp.clip(out["mask"] * 255.0, 0, 255
                                    ).astype(jnp.uint8)}
        return out

    def __call__(self, params, clip) -> Dict[str, np.ndarray]:
        """clip fields:
          src_parts (1, R, 24, p, p, 3), src_mask_parts (1, R, 24, p, p),
          ref_mask (1, R), bg_incomplete (1, S, S, 3),
          src_imgs (R, S, S, 3), chosen_frames (R,),
          tgt_iuv255 / tgt_iuv (T, S, S, 3), smpl_mask (T, S, S, 1),
          cams (T, 3), verts (T, V, 3).
        Non-array bookkeeping fields from ``load_clip`` (``vid_name``,
        ``gt_frames``, ...) are ignored, so the whole clip dict can be
        passed directly.
        Returns dict of (T, S, S, C) arrays: final / coarse / mask / tsf.
        """
        clip = {k: clip[k] for k in self._CLIP_FIELDS if k in clip}
        return self._jitted(params, clip)

    # tgt_iuv is optional: uint8 wire-format clips derive it on device
    _CLIP_FIELDS = (
        "src_parts", "src_mask_parts", "ref_mask", "bg_incomplete",
        "src_imgs", "chosen_frames", "tgt_iuv255", "tgt_iuv", "smpl_mask",
        "cams", "verts")

    @functools.cached_property
    def _jitted_batch(self):
        return jax.jit(jax.vmap(self._generate, in_axes=(None, 0)))

    def generate_batch(self, params, clips, mesh=None):
        """Serving scale-out: generate many clips at once.

        ``clips``: a clip dict whose every field carries a leading n_clips
        axis (stack per-clip dicts with ``jax.tree_util.tree_map``).  With a
        ``mesh`` (1-D, axis 'data'), clips are sharded across devices and
        parameters replicated — whole-clip data parallelism over ICI, the
        TPU equivalent of running the reference's single-GPU test script on
        N GPUs at once.  Returns (n_clips, T, S, S, C) arrays.
        """
        clips = {k: clips[k] for k in self._CLIP_FIELDS if k in clips}
        if mesh is not None:
            from jafpro_tpu.parallel.mesh import replicate, shard_batch

            clips = shard_batch(mesh, clips)
            params = replicate(mesh, params)
        return self._jitted_batch(params, clips)


def frames_to_uint8(frames: jnp.ndarray) -> np.ndarray:
    """(-1, 1) floats -> uint8 images (reference save path).

    Passthrough for arrays already uint8 (the ``output_uint8`` generator
    mode converts on device before the D2H fetch)."""
    x = np.asarray(frames)
    if x.dtype == np.uint8:
        return x
    return np.clip((x.astype(np.float32) / 2.0 + 0.5) * 255.0,
                   0, 255).astype(np.uint8)
