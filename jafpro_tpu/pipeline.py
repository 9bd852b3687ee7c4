"""The fused end-to-end JAFPro generator.

One functional pipeline shared by training stage 4 and inference
(reference call stacks: ``train/4.convLSTM_flowpro_interval.py:248-330`` and
``test/conv_pro_test.py:199-279``):

  accumulate (ConvLSTM fusion over refs)
    -> mask by the union of reference visibility
    -> inpaint (global-bottleneck 24-part U-Net)
    -> texture_warp through the target IUV
    -> CRN foreground refine (+ soft mask)
    -> fuse with CRN background
    -> SMPL-flow warp of the nearest reference frame
    -> propagation blend
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from jafpro_tpu.config import Config
from jafpro_tpu.data.texture import texture_warp
from jafpro_tpu.geometry.flow import SMPLFlowEngine
from jafpro_tpu.models import (
    AccumulateLSTM,
    CRNSmaller,
    FaceDiscriminator,
    ImageDiscriminator,
    Propagation3DFlowNet,
    UNetInpainter,
    VGG19Features,
)
from jafpro_tpu.ops.sampling import grid_sample


@dataclasses.dataclass
class JAFProPipeline:
    """Module bundle + pure apply helpers.

    ``params`` trees are kept per-module under the reference's checkpoint
    names: {'accu', 'inpaint', 'bg', 'refine', 'pro', 'D', 'FD', 'vgg'}.
    """

    cfg: Config
    flow_engine: Optional[SMPLFlowEngine] = None

    def __post_init__(self):
        dtype = jnp.dtype(self.cfg.compute_dtype)
        impl = self.cfg.part_conv_impl
        self.accu = AccumulateLSTM(
            conv_impl=impl, dtype=dtype,
            ref_major=self.cfg.accu_ref_major,
            remat_steps=self.cfg.accu_ref_major and self.cfg.remat_training)
        self.inpaint = UNetInpainter(conv_impl=impl, dtype=dtype)
        self.bg = CRNSmaller(fg=False, dtype=dtype)
        self.refine = CRNSmaller(fg=True, dtype=dtype)
        self.pro = Propagation3DFlowNet(dtype=dtype)
        self.D = ImageDiscriminator(ndf=32, dtype=dtype)
        self.FD = FaceDiscriminator(ndf=32, dtype=dtype)
        self.vgg = VGG19Features(dtype=dtype)
        if self.flow_engine is None and self.cfg.num_faces:
            try:
                self.flow_engine = SMPLFlowEngine.create(
                    image_size=self.cfg.image_size,
                    near=self.cfg.near, far=self.cfg.far,
                    viewing_angle=self.cfg.viewing_angle,
                    chunk=self.cfg.rasterizer_face_chunk,
                )
            except FileNotFoundError:
                self.flow_engine = None

    # ---- initialization ----

    def init_params(
        self, rng: jax.Array, num_parts: Optional[int] = None,
        part_size: Optional[int] = None,
    ) -> Dict[str, Any]:
        cfg = self.cfg
        P = num_parts or cfg.num_parts
        ps = part_size or cfg.part_size
        S = cfg.image_size
        N = cfg.maximum_ref_frames
        keys = jax.random.split(rng, 8)
        parts = jnp.zeros((1, N, P, ps, ps, 3), jnp.float32)
        mask = jnp.ones((1, N), jnp.float32)
        img = jnp.zeros((1, S, S, 3), jnp.float32)
        face = jnp.zeros((1, cfg.face_crop_size, cfg.face_crop_size, 6),
                         jnp.float32)
        smask = jnp.ones((1, S, S, 1), jnp.float32)
        return {
            "accu": self.accu.init(keys[0], parts, mask),
            "inpaint": self.inpaint.init(keys[1], parts[:, 0]),
            "bg": self.bg.init(keys[2], img, S),
            "refine": self.refine.init(keys[3], img, S),
            "pro": self.pro.init(keys[4], img, img, img, smask),
            "D": self.D.init(keys[5], jnp.concatenate([img, img], -1)),
            "FD": self.FD.init(keys[6], face),
            "vgg": self.vgg.init(keys[7], img),
        }

    # ---- stages ----

    def prepare_textures(
        self,
        params: Dict[str, Any],
        src_parts: jnp.ndarray,       # (B, N, P, p, p, 3)
        ref_mask: jnp.ndarray,        # (B, N) {0,1}
        src_mask_parts: jnp.ndarray,  # (B, N, P, p, p) visibility
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Accumulate + union-mask + inpaint.  Returns
        (inpainted parts (B,P,p,p,3), union mask (B,P,p,p))."""
        accu_parts = self.accu.apply(params["accu"], src_parts, ref_mask)
        masked = src_mask_parts * ref_mask[:, :, None, None, None]
        union = jnp.max(masked, axis=1)  # (B, P, p, p)
        accu_parts = accu_parts * union[..., None]
        inpainted = self.inpaint.apply(params["inpaint"], accu_parts)
        return inpainted, union

    def background(self, params, bg_incomplete: jnp.ndarray) -> jnp.ndarray:
        return self.bg.apply(params["bg"], bg_incomplete, self.cfg.image_size)

    def generate_frame(
        self,
        params: Dict[str, Any],
        inpainted_parts: jnp.ndarray,  # (B, P, p, p, 3)
        bg_output: jnp.ndarray,        # (B, S, S, 3)
        tgt_iuv255: jnp.ndarray,       # (B, S, S, 3)
        tgt_iuv: jnp.ndarray,          # (B, S, S, 3) normalized
        smpl_mask: jnp.ndarray,        # (B, S, S, 1)
        prev_img: jnp.ndarray,         # (B, S, S, 3)
        prev_cam: jnp.ndarray, prev_verts: jnp.ndarray,
        tgt_cam: jnp.ndarray, tgt_verts: jnp.ndarray,
        tsf: Optional[jnp.ndarray] = None,
    ) -> Dict[str, jnp.ndarray]:
        S = self.cfg.image_size
        warped = texture_warp(inpainted_parts, tgt_iuv255)
        refined, fg_mask = self.refine.apply(params["refine"], warped, S)
        fusion = refined * fg_mask + bg_output * (1.0 - fg_mask)
        # The SMPL-flow warp has no trainable parameters upstream (vertices
        # and the previous frame come from the dataset; the reference's
        # rasterizer is likewise forward-only on this path — SURVEY §2.4
        # #20), so cut autodiff here: without this, grad saves the
        # rasterizer's (pixels x face-chunk) scan residuals (tens of GB).
        # Callers that wrap this function in jax.checkpoint pass a
        # precomputed ``tsf`` instead: as a remat *input* it is saved, not
        # recomputed, so the backward pass never re-rasterizes.
        if tsf is None:
            tsf = jax.lax.stop_gradient(self.flow_engine(
                prev_img, prev_cam, prev_verts, tgt_cam, tgt_verts
            ))
        out = self.pro.apply(
            params["pro"], fusion, tsf, tgt_iuv, smpl_mask
        )
        return {
            "final": out["pred_target"],
            "weight": out["weight"],
            "fusion": fusion,
            "refined": refined,
            "fg_mask": fg_mask,
            "tsf": tsf,
            "warped": warped,
        }


def crop_faces(
    images: jnp.ndarray, bbox: jnp.ndarray, out_size: int = 64,
    mode: str = "bilinear",
) -> jnp.ndarray:
    """Static-shape face crop: resample the bbox region to (out, out).

    Replaces the reference's data-dependent slicing + upsample
    (``train/4:334-353``) with a fixed-size grid_sample, keeping shapes
    static under jit.  bbox: (B, 4) = (x0, x1, y0, y1) pixel coords.
    """
    B, H, W, C = images.shape
    x0, x1, y0, y1 = bbox[:, 0], bbox[:, 1], bbox[:, 2], bbox[:, 3]
    t = (jnp.arange(out_size, dtype=images.dtype) + 0.5) / out_size  # centers
    # sample positions in pixel space, then normalize (align_corners grid)
    xs = x0[:, None] + t[None] * (x1 - x0)[:, None] - 0.5
    ys = y0[:, None] + t[None] * (y1 - y0)[:, None] - 0.5
    gx = 2.0 * xs / (W - 1) - 1.0
    gy = 2.0 * ys / (H - 1) - 1.0
    grid = jnp.stack(
        [jnp.broadcast_to(gx[:, None, :], (B, out_size, out_size)),
         jnp.broadcast_to(gy[:, :, None], (B, out_size, out_size))],
        axis=-1,
    )
    return grid_sample(images, grid, padding_mode="border", mode=mode)
