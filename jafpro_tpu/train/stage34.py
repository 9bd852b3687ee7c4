"""Stages 3 and 4: the adversarial image stages.

Stage 3 (reference ``train/3.inpaint_global_convLSTM_FGAN.py``): full image
path *without* propagation.  Trains accu/inpaint/bg/refine @1e-4;
image D and face D @3e-6, 3 update steps each per iteration;
G loss = VGG_l1(final, target) + 2*errG + 2*F_errG.

Stage 4 (reference ``train/4.convLSTM_flowpro_interval.py``): adds SMPL-flow
propagation; bg frozen (eval + no_grad); fine-tune lrs accu/inpaint/refine
1e-5, propagation 5e-5, D 3e-6, face D 1e-6; face D takes 1 step, image D 3.

Faithfulness notes:
  * the reference's stage-4 generator face term is computed on a *detached*
    face crop (``train/4:399``) so it contributes no gradient — stage 3 does
    backprop it (``train/3:365``); both behaviors are reproduced.
  * D steps re-run the discriminator forward after each of its Adam updates
    on the same batch, exactly like the reference's inner loops.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from jafpro_tpu.losses import bce, bce_masked, vgg_l1_loss
from jafpro_tpu.pipeline import JAFProPipeline, crop_faces
from jafpro_tpu.train.common import TrainState, normalize_batch


def stage3_lrs():
    return {"accu": 1e-4, "inpaint": 1e-4, "bg": 1e-4, "refine": 1e-4,
            "D": 3e-6, "FD": 3e-6}


def stage4_lrs():
    return {"accu": 1e-5, "inpaint": 1e-5, "refine": 1e-5, "pro": 5e-5,
            "D": 3e-6, "FD": 1e-6}


def _generator_forward(pipe: JAFProPipeline, params, batch, *,
                       with_propagation: bool, tsf=None,
                       ablate: frozenset = frozenset()):
    """Shared G path; returns (final, aux)."""
    prepare = pipe.prepare_textures
    if pipe.cfg.remat_training:
        # the 24-part encoder/LSTM activations dominate training memory;
        # recompute them in the backward pass (jax.checkpoint)
        prepare = jax.checkpoint(
            lambda p, sp, rm, smp: pipe.prepare_textures(p, sp, rm, smp))
    if "accu" in ablate:  # bench attribution only (see _make_gan_step)
        inpainted = batch["src_parts"][:, 0]
    else:
        inpainted, _ = prepare(
            params, batch["src_parts"], batch["ref_mask"],
            batch["src_mask_parts"])
    bg_out = pipe.background(params, batch["bg_incomplete"])
    if not with_propagation:
        from jafpro_tpu.data.texture import texture_warp

        S = pipe.cfg.image_size
        warped = texture_warp(inpainted, batch["tgt_iuv255"])
        refined, fg = pipe.refine.apply(params["refine"], warped, S)
        fusion = refined * fg + bg_out * (1.0 - fg)
        return fusion, {"fusion": fusion, "fg_mask": fg}
    gen_frame = pipe.generate_frame
    if pipe.cfg.remat_training:
        gen_frame = jax.checkpoint(
            pipe.generate_frame,
            static_argnums=(),
        )
    out = gen_frame(
        params, inpainted, jax.lax.stop_gradient(bg_out),
        batch["tgt_iuv255"], batch["tgt_iuv"], batch["smpl_mask"],
        batch["prev_img"], batch["prev_cam"], batch["prev_verts"],
        batch["tgt_cam"], batch["tgt_verts"], tsf)
    return out["final"], out


def _make_gan_step(pipe: JAFProPipeline, *, with_propagation: bool,
                   gen_modules: Tuple[str, ...], face_d_steps: int,
                   img_d_steps: int, detach_face_g: bool,
                   form: str = "vjp",
                   ablate: frozenset = frozenset()):
    face_gan = pipe.cfg.face_GAN
    """``form`` selects how the generator fwd/bwd is wired (same numerics):

    * ``"vjp"`` (production): ONE generator forward per step.  ``jax.vjp``
      captures the forward once; its value (stop-gradient) feeds the D/FD
      updates and the G-loss tail differentiates w.r.t. ``final`` only,
      pulling generator grads back through the saved vjp.  The SMPL-flow
      ``tsf`` (parameter-free) is hoisted out of the remat region so the
      backward never re-rasterizes.  Valid because (a) G params don't
      change between the D updates and the G step, and (b) the reference
      itself reuses one forward's graph for both (``train/4:396-408``).
    * ``"grad"``: the transliterated two-forward form (one detached
      forward for D targets + ``value_and_grad`` re-tracing the forward
      inside the G loss) — kept for A/B measurement and the equivalence
      test (``test_train.py``); measured slower (TUNING.md round 5).

    ``ablate`` (bench_train_breakdown.py only — NOT a training mode):
    component names to stub out so the step's cost can be attributed by
    difference against the full step, mirroring bench_breakdown's
    inference-side methodology.  Members: "img_d" / "face_d" (skip those
    D updates), "gstep" (skip the generator grad+update), "raster" (tsf
    := prev_img), "vgg" (recon := plain L1), "accu" (inpainted :=
    first-ref parts, skipping the accumulate+inpaint nets).
    """
    face_size = pipe.cfg.face_crop_size
    if not face_gan:
        # reference ``face_GAN`` option off: no face-D updates and no
        # face term in the G loss (gates ``train/4:357-374`` and the
        # ``2*F_errG`` summand; ``options.py`` flag)
        face_d_steps = 0
    if "img_d" in ablate:
        img_d_steps = 0
    if "face_d" in ablate:
        face_d_steps = 0

    def gen_loss_fn(gen_params, frozen_params, d_params, fd_params, batch):
        params = {**frozen_params, **gen_params}
        final, aux = _generator_forward(
            pipe, params, batch, with_propagation=with_propagation,
            ablate=ablate)
        total, metrics = _g_loss_tail(final, d_params, fd_params, batch,
                                      vgg_params=params["vgg"])
        return total, (final, metrics)

    def _g_loss_tail(final, d_params, fd_params, batch, *, vgg_params):
        if "vgg" in ablate:
            recon = jnp.mean(jnp.abs(final - batch["tgt_img"]))
        else:
            recon = vgg_l1_loss(
                lambda p, x: pipe.vgg.apply(p, x), vgg_params,
                final, batch["tgt_img"])

        d_in = jnp.concatenate([final, batch["src_img_first"]], axis=-1)
        err_g = bce(pipe.D.apply(d_params, d_in),
                    jnp.ones((final.shape[0], 1), final.dtype))

        face_valid = batch["face_bbox"][:, 1] > batch["face_bbox"][:, 0]
        face_pred = crop_faces(final, batch["face_bbox"], face_size)
        if detach_face_g:
            face_pred = jax.lax.stop_gradient(face_pred)
        face_iuv = crop_faces(batch["tgt_iuv"], batch["face_bbox"],
                              face_size, mode="nearest")
        if face_gan:
            f_in = jnp.concatenate([face_pred, face_iuv], axis=-1)
            # samples without face pixels drop out (reference skips them)
            f_err_g = bce_masked(
                pipe.FD.apply(fd_params, f_in),
                jnp.ones((final.shape[0], 1), final.dtype), face_valid)
        else:
            f_err_g = jnp.zeros((), final.dtype)

        total = recon + 2.0 * err_g + 2.0 * f_err_g
        metrics = {"loss": total, "recon": recon, "G": err_g, "FG": f_err_g}
        return total, metrics

    def step(state: TrainState, batch) -> Tuple[TrainState, Dict[str, Any]]:
        batch = normalize_batch(batch)
        params = state.params
        gen_params = {k: params[k] for k in gen_modules}
        frozen = {k: v for k, v in params.items() if k not in gen_modules}

        # ---- generator forward once ----
        if form == "vjp":
            tsf = None
            if with_propagation and "raster" in ablate:
                tsf = batch["prev_img"]
            elif with_propagation and pipe.flow_engine is not None:
                # parameter-free: rasterize ONCE per step, outside vjp/remat
                tsf = jax.lax.stop_gradient(pipe.flow_engine(
                    batch["prev_img"], batch["prev_cam"],
                    batch["prev_verts"], batch["tgt_cam"],
                    batch["tgt_verts"]))

            def g_fwd(gp):
                p = {**frozen, **gp}
                final, _ = _generator_forward(
                    pipe, p, batch, with_propagation=with_propagation,
                    tsf=tsf, ablate=ablate)
                return final

            final_live, g_vjp = jax.vjp(g_fwd, gen_params)
            final_detached = jax.lax.stop_gradient(final_live)
        else:
            final_detached, _ = _generator_forward(
                pipe, params, batch, with_propagation=with_propagation,
                ablate=ablate)
            final_detached = jax.lax.stop_gradient(final_detached)

        face_real = crop_faces(batch["tgt_img"], batch["face_bbox"], face_size)
        face_fake = jax.lax.stop_gradient(
            crop_faces(final_detached, batch["face_bbox"], face_size))
        face_iuv = crop_faces(batch["tgt_iuv"], batch["face_bbox"],
                              face_size, mode="nearest")
        B = final_detached.shape[0]
        ones = jnp.ones((B, 1), final_detached.dtype)
        zeros = jnp.zeros((B, 1), final_detached.dtype)

        metrics: Dict[str, Any] = {}

        # ---- face discriminator ----
        face_valid = batch["face_bbox"][:, 1] > batch["face_bbox"][:, 0]

        def fd_loss(fd_params):
            real = bce_masked(pipe.FD.apply(
                fd_params, jnp.concatenate([face_real, face_iuv], -1)), ones,
                face_valid)
            fake = bce_masked(pipe.FD.apply(
                fd_params, jnp.concatenate([face_fake, face_iuv], -1)), zeros,
                face_valid)
            return real + fake

        for _ in range(face_d_steps):
            fd_val, fd_grads = jax.value_and_grad(fd_loss)(state.params["FD"])
            state = state.apply_gradients({"FD": fd_grads})
        metrics["FD"] = fd_val if face_d_steps else jnp.zeros(())

        # ---- image discriminator ----
        real_in = jnp.concatenate(
            [batch["tgt_img"], batch["src_img_first"]], -1)
        fake_in = jnp.concatenate(
            [final_detached, batch["src_img_first"]], -1)

        def d_loss(d_params):
            real = bce(pipe.D.apply(d_params, real_in), ones)
            fake = bce(pipe.D.apply(d_params, fake_in), zeros)
            return real + fake

        for _ in range(img_d_steps):
            d_val, d_grads = jax.value_and_grad(d_loss)(state.params["D"])
            state = state.apply_gradients({"D": d_grads})
        metrics["D"] = d_val if img_d_steps else jnp.zeros(())

        # ---- generator ----
        if "gstep" in ablate:
            metrics.update({"loss": jnp.mean(final_detached),
                            "recon": jnp.zeros(()), "G": jnp.zeros(()),
                            "FG": jnp.zeros(())})
            return state, metrics
        if form == "vjp":
            # differentiate the loss tail w.r.t. ``final`` only (VGG + one
            # D/FD forward — cheap), then pull the cotangent back through
            # the single saved generator forward
            (_, g_metrics), tail_grad = jax.value_and_grad(
                lambda f: _g_loss_tail(
                    f, state.params["D"], state.params["FD"], batch,
                    vgg_params=params["vgg"]),
                has_aux=True)(final_live)
            (grads,) = g_vjp(tail_grad)
        else:
            (_, (_, g_metrics)), grads = jax.value_and_grad(
                gen_loss_fn, has_aux=True)(
                gen_params, frozen, state.params["D"], state.params["FD"],
                batch)
        state = state.apply_gradients(grads)
        metrics.update(g_metrics)
        return state, metrics

    return step


def _stage_form(form: str = None) -> str:
    import os

    return form or os.environ.get("JAFPRO_STAGE34_FORM", "vjp")


def make_stage3_step(pipe: JAFProPipeline, form: str = None):
    return _make_gan_step(
        pipe, with_propagation=False,
        gen_modules=("accu", "inpaint", "bg", "refine"),
        face_d_steps=3, img_d_steps=3, detach_face_g=False,
        form=_stage_form(form))


def make_stage4_step(pipe: JAFProPipeline, form: str = None):
    return _make_gan_step(
        pipe, with_propagation=True,
        gen_modules=("accu", "inpaint", "refine", "pro"),
        face_d_steps=1, img_d_steps=3, detach_face_g=True,
        form=_stage_form(form))
