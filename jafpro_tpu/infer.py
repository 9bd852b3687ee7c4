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
    pipe: JAFProPipeline

    @functools.cached_property
    def _jitted(self):
        return jax.jit(self._generate)

    def _generate(self, params: Dict[str, Any], clip: Dict[str, jnp.ndarray]):
        pipe = self.pipe
        engine = pipe.flow_engine
        inpainted, _ = pipe.prepare_textures(
            params, clip["src_parts"], clip["ref_mask"],
            clip["src_mask_parts"])
        bg_out = pipe.background(params, clip["bg_incomplete"])

        chosen = clip["chosen_frames"]          # (R,) int32 clip indices
        src_imgs = clip["src_imgs"]             # (R, S, S, 3)
        cams = clip["cams"]                     # (T, 3)
        verts = clip["verts"]                   # (T, V, 3)
        S = pipe.cfg.image_size

        # The R source poses are frame-invariant: rasterize them once per
        # clip instead of inside the 30-frame scan (the reference re-renders
        # the source every frame, conv_pro_test.py:274) — halves the
        # z-buffer work of the whole clip.
        pro_index = jnp.clip(chosen, 0, cams.shape[0] - 1)  # (R,)
        src_f2verts, _, _ = engine.render_fim_wim(
            cams[pro_index], verts[pro_index])
        src_f2pts_all = src_f2verts[..., 0:2]
        src_f2pts_all = src_f2pts_all.at[..., 1].multiply(-1.0)  # (R,F,3,2)

        from jafpro_tpu.data.texture import texture_warp
        from jafpro_tpu.geometry.flow import cal_bc_transform

        def frame_step(carry, xs):
            i, iuv255, iuv, smpl_mask = xs
            dist = jnp.abs(i - chosen)
            src_pro = jnp.argmin(dist)
            prev_img = src_imgs[src_pro][None]

            warped = texture_warp(inpainted, iuv255[None])
            refined, fg_mask = pipe.refine.apply(params["refine"], warped, S)
            fusion = refined * fg_mask + bg_out * (1.0 - fg_mask)

            _, tsf_fim, tsf_wim = engine.render_fim_wim(
                cams[i][None], verts[i][None])
            flow = cal_bc_transform(
                src_f2pts_all[src_pro][None], tsf_fim, tsf_wim)
            tsf = engine.warp_image(prev_img, flow)

            out = pipe.pro.apply(
                params["pro"], fusion, tsf, iuv[None], smpl_mask[None])
            return carry, {
                "final": out["pred_target"][0],
                "coarse": fusion[0],
                "mask": out["weight"][0],
                "tsf": tsf[0],
            }

        T = clip["tgt_iuv255"].shape[0]
        xs = (jnp.arange(T), clip["tgt_iuv255"], clip["tgt_iuv"],
              clip["smpl_mask"])
        _, frames = jax.lax.scan(frame_step, None, xs)
        return frames

    def __call__(self, params, clip) -> Dict[str, np.ndarray]:
        """clip fields:
          src_parts (1, R, 24, p, p, 3), src_mask_parts (1, R, 24, p, p),
          ref_mask (1, R), bg_incomplete (1, S, S, 3),
          src_imgs (R, S, S, 3), chosen_frames (R,),
          tgt_iuv255 / tgt_iuv (T, S, S, 3), smpl_mask (T, S, S, 1),
          cams (T, 3), verts (T, V, 3).
        Returns dict of (T, S, S, C) arrays: final / coarse / mask / tsf.
        """
        return self._jitted(params, clip)


def frames_to_uint8(frames: jnp.ndarray) -> np.ndarray:
    """(-1, 1) floats -> uint8 images (reference save path)."""
    x = np.asarray(frames, np.float32)
    return np.clip((x / 2.0 + 0.5) * 255.0, 0, 255).astype(np.uint8)
