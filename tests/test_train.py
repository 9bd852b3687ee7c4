"""End-to-end smoke tests: stage training steps and video generation on
tiny synthetic geometry (image 64, parts 24x16, quad-grid mesh)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from jafpro_tpu.config import Config
from jafpro_tpu.geometry.flow import SMPLFlowEngine
from jafpro_tpu.infer import VideoGenerator
from jafpro_tpu.pipeline import JAFProPipeline
from jafpro_tpu.train import (
    TrainState,
    make_stage1_step,
    make_stage2_step,
    make_stage4_step,
    sample_reference_curriculum,
)
from jafpro_tpu.train.common import synthetic_batch, synthetic_quad_mesh
from jafpro_tpu.train.stage1 import stage1_lrs
from jafpro_tpu.train.stage2 import stage2_lrs
from jafpro_tpu.train.stage34 import stage4_lrs

RNG = np.random.RandomState(0)


def tiny_pipeline():
    cfg = Config(
        image_size=64, part_size=16, maximum_ref_frames=2,
        face_crop_size=16, compute_dtype="float32",
        rasterizer_face_chunk=32,
    )
    verts, faces = synthetic_quad_mesh(6)
    engine = SMPLFlowEngine.create(
        faces=faces, image_size=64, chunk=32)
    pipe = JAFProPipeline(cfg, flow_engine=engine)
    return pipe, verts


def tiny_batch(num_verts):
    return {
        k: jnp.asarray(v) for k, v in synthetic_batch(
            RNG, batch=1, num_refs=2, part_size=16, image_size=64,
            num_verts=num_verts).items()
    }


@pytest.fixture(scope="module")
def setup():
    pipe, verts = tiny_pipeline()
    params = pipe.init_params(jax.random.PRNGKey(0))
    batch = tiny_batch(verts.shape[0])
    # use the real planar mesh vertices so rasterization hits pixels
    v = jnp.asarray(verts)[None]
    batch["prev_verts"] = v
    batch["tgt_verts"] = v + jnp.asarray([0.05, 0.0, 0.0])
    return pipe, params, batch


def test_stage1_step(setup):
    pipe, params, batch = setup
    state = TrainState.create(params, stage1_lrs())
    step = jax.jit(make_stage1_step(pipe))
    state2, m = step(state, batch)
    assert np.isfinite(float(m["loss"]))
    # params actually moved
    before = jax.tree_util.tree_leaves(params["accu"])[0]
    after = jax.tree_util.tree_leaves(state2.params["accu"])[0]
    assert not np.allclose(np.asarray(before), np.asarray(after))
    # loss decreases over a few steps on a fixed batch
    losses = [float(m["loss"])]
    for _ in range(3):
        state2, m = step(state2, batch)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0]


def test_stage1_training_improves_ssim(setup):
    """Quality-metric smoke (not just loss): a short stage-1 run must
    improve the *evaluation* metric — SSIM between the accumulated texture
    and the target texture — on the region the loss observes.  This is the
    random-weight stand-in for the reference's SSIM-at-parity evidence
    (no trained reference checkpoints ship with either repo)."""
    from jafpro_tpu.evaluate import ssim

    pipe, params, batch = setup
    state = TrainState.create(params, stage1_lrs())
    step = jax.jit(make_stage1_step(pipe))

    def metric(p):
        out = pipe.accu.apply(p["accu"], batch["src_parts"],
                              batch["ref_mask"])
        masked = batch["src_mask_parts"] * \
            batch["ref_mask"][:, :, None, None, None]
        area = (jnp.max(masked, axis=1)
                * batch["tgt_mask_parts"][:, 0])[..., None]
        pred = (area * out).mean(-1).reshape(-1, 16, 16)  # (B*P, p, p) gray
        gt = (area * batch["tgt_parts"][:, 0]).mean(-1).reshape(-1, 16, 16)
        return float(jnp.mean(ssim(pred, gt, data_range=2.0)))

    before = metric(state.params)
    for _ in range(25):
        state, _ = step(state, batch)
    after = metric(state.params)
    assert np.isfinite(before) and np.isfinite(after)
    assert after > before


def test_stage2_step(setup):
    pipe, params, batch = setup
    state = TrainState.create(params, stage2_lrs())
    step = jax.jit(make_stage2_step(pipe))
    state, m = step(state, batch)
    assert np.isfinite(float(m["loss"]))


def test_stage4_step(setup):
    pipe, params, batch = setup
    state = TrainState.create(params, stage4_lrs())
    step = jax.jit(make_stage4_step(pipe))
    state2, m = step(state, batch)
    for k in ("loss", "recon", "G", "FG", "D", "FD"):
        assert np.isfinite(float(m[k])), k
    # frozen bg must be untouched
    b0 = jax.tree_util.tree_leaves(state.params["bg"])
    b1 = jax.tree_util.tree_leaves(state2.params["bg"])
    for x, y in zip(b0, b1):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


@pytest.mark.slow
@pytest.mark.parametrize("stage", [3, 4])
def test_gan_step_vjp_form_equals_grad_form(setup, stage):
    """The production single-forward (vjp) GAN step computes the SAME
    gradients as the transliterated two-forward form: the generator params
    don't change between the D updates and the G step, so capturing one
    forward with jax.vjp (and hoisting the parameter-free SMPL-flow tsf
    out of the remat region) is an exact restructure, not an
    approximation (reference reuses one forward's graph the same way,
    ``train/4.convLSTM_flowpro_interval.py:396-408``).

    Compared with an identity optimizer (param delta == -grad): Adam's
    g/sqrt(v) normalization would amplify float-reassociation noise on
    near-zero gradients into O(lr) param flips, which tests optimizer
    sensitivity, not the restructure."""
    import optax

    from jafpro_tpu.train.stage34 import make_stage3_step, stage3_lrs

    pipe, params, batch = setup
    make = make_stage3_step if stage == 3 else make_stage4_step
    lrs = stage3_lrs() if stage == 3 else stage4_lrs()
    out = {}
    for form in ("grad", "vjp"):
        txs = {k: optax.sgd(1e-3) for k in lrs}
        state = TrainState(
            params=params,
            opt_states={k: txs[k].init(params[k]) for k in txs},
            txs=txs, step=jnp.zeros((), jnp.int32))
        step = jax.jit(make(pipe, form=form))
        state, m = step(state, batch)
        state, m = step(state, batch)  # 2 steps: updated-D path exercised
        out[form] = (state.params, m)

    def check(path, a, b):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=1e-6,
            err_msg=jax.tree_util.keystr(path))
    jax.tree_util.tree_map_with_path(check, out["grad"][0], out["vjp"][0])
    for k in out["grad"][1]:
        np.testing.assert_allclose(
            float(out["grad"][1][k]), float(out["vjp"][1][k]),
            rtol=5e-4, atol=1e-6, err_msg=k)


def test_curriculum_sampler():
    rng = np.random.RandomState(3)
    counts = np.zeros(5)
    for _ in range(200):
        mask, prosrc = sample_reference_curriculum(rng, 4)
        k = int(mask.sum())
        counts[k] += 1
        assert mask[prosrc] == 1.0
    assert (counts[1:] > 10).all()  # all of 1..4 refs appear


def _tiny_clip(batch):
    verts, _ = synthetic_quad_mesh(6)
    T, R = 3, 2
    return {
        "src_parts": batch["src_parts"],
        "src_mask_parts": batch["src_mask_parts"],
        "ref_mask": batch["ref_mask"],
        "bg_incomplete": batch["bg_incomplete"],
        "src_imgs": jnp.tile(batch["prev_img"], (R, 1, 1, 1)),
        "chosen_frames": jnp.asarray([0, 2], jnp.int32),
        "tgt_iuv255": jnp.tile(batch["tgt_iuv255"], (T, 1, 1, 1)),
        "tgt_iuv": jnp.tile(batch["tgt_iuv"], (T, 1, 1, 1)),
        "smpl_mask": jnp.tile(batch["smpl_mask"], (T, 1, 1, 1)),
        "cams": jnp.tile(jnp.asarray([[1.0, 0, 0]]), (T, 1)),
        "verts": jnp.tile(jnp.asarray(verts)[None], (T, 1, 1)),
    }


def test_video_generator(setup):
    pipe, params, batch = setup
    clip = _tiny_clip(batch)
    T, S = 3, 64
    gen = VideoGenerator(pipe)
    out = gen(params, clip)
    assert out["final"].shape == (T, S, S, 3)
    assert out["mask"].shape == (T, S, S, 1)
    assert np.isfinite(np.asarray(out["final"])).all()


def test_video_generator_ablations(setup):
    """bench_breakdown.py's diagnostic variants: every single-component
    stand-in must compile and keep the output contract (shapes/finite),
    and the empty set must be the real pipeline bit-for-bit."""
    pipe, params, batch = setup
    clip = _tiny_clip(batch)
    T, S = clip["tgt_iuv255"].shape[0], pipe.cfg.image_size
    ref = VideoGenerator(pipe)(params, clip)
    same = VideoGenerator(pipe, ablate=frozenset())(params, clip)
    np.testing.assert_array_equal(np.asarray(ref["final"]),
                                  np.asarray(same["final"]))
    for name in ("prep", "warp", "refine", "raster", "flow", "pro"):
        out = VideoGenerator(pipe, ablate=frozenset({name}))(params, clip)
        assert out["final"].shape == (T, S, S, 3), name
        assert out["mask"].shape == (T, S, S, 1), name
        for k in ("final", "coarse", "mask", "tsf"):
            assert np.isfinite(np.asarray(out[k])).all(), (name, k)


def test_video_generator_crop_invariance(setup):
    """A column-cropped engine (adapt_to_clip-selected width) produces the
    same video as the full-width engine when the clip's x extent fits the
    window — the whole-generator check on top of the kernel-level
    bitwise test (test_geometry.test_rasterizer_crop_cols_matches_full)."""
    import dataclasses

    pipe, params, batch = setup
    clip = _tiny_clip(batch)
    # squeeze the mesh into a narrow column band so a crop bucket fits
    clip = dict(clip)
    clip["verts"] = clip["verts"] * jnp.asarray([0.35, 1.0, 1.0]) + \
        jnp.asarray([0.1, 0.0, 0.0])
    from jafpro_tpu.geometry.projection import project_to_view_np
    from jafpro_tpu.geometry.rasterizer import select_crop_cols

    view = project_to_view_np(np.asarray(clip["verts"], np.float32),
                              np.asarray(clip["cams"], np.float32),
                              pipe.flow_engine.viewing_angle)
    w = select_crop_cols(view[:, pipe.flow_engine.faces], image_size=64,
                         buckets=(16, 24, 32, 48))
    assert w > 0
    eng = dataclasses.replace(pipe.flow_engine, band_rows=8,
                              band_capacity=4096)
    ref = VideoGenerator(JAFProPipeline(pipe.cfg, flow_engine=eng))(
        params, clip)
    cropped = VideoGenerator(JAFProPipeline(
        pipe.cfg,
        flow_engine=dataclasses.replace(eng, crop_cols=w)))(params, clip)
    for k in ("final", "mask", "tsf"):
        np.testing.assert_array_equal(np.asarray(ref[k]),
                                      np.asarray(cropped[k]))


def test_video_generator_warp_crop_invariance(setup):
    """warp_crop_cols (texture warp on the IUV body's column window only)
    must reproduce the full-width generator bitwise when the body extent
    fits the host-selected bucket, and crop_flow must do the same for the
    bc-transform + source-warp window (exercised here alongside the raster
    crop, the production serving combination)."""
    import dataclasses

    pipe, params, batch = setup
    clip = _tiny_clip(batch)
    S = pipe.cfg.image_size
    # confine the IUV body to a narrow column band (a real DensePose map
    # is 0 off the body); keep u/v random inside it
    iuv = np.array(clip["tgt_iuv255"])  # copy: jax arrays view read-only
    body_cols = np.zeros((S,), bool)
    body_cols[21:39] = True
    iuv[..., 0] *= body_cols[None, None, :]
    clip = dict(clip, tgt_iuv255=jnp.asarray(iuv),
                tgt_iuv=jnp.asarray((iuv / 255.0 - 0.5) * 2.0, np.float32))
    from jafpro_tpu.geometry.rasterizer import select_mask_crop_cols

    w = select_mask_crop_cols(iuv[..., 0] > 0, buckets=(8, 16, 24, 32))
    assert w > 0
    ref = VideoGenerator(pipe)(params, clip)
    got = VideoGenerator(pipe, warp_crop_cols=w)(params, clip)
    for k in ("final", "coarse", "mask", "tsf"):
        np.testing.assert_array_equal(np.asarray(ref[k]),
                                      np.asarray(got[k]))
    # flow crop alone (no raster crop): engine.crop_cols gates it, so a
    # cropped engine with crop_flow=False isolates the raster kernel's own
    # crop from the downstream bc-transform/source-warp crop
    clip2 = dict(clip)
    clip2["verts"] = clip2["verts"] * jnp.asarray([0.35, 1.0, 1.0])
    from jafpro_tpu.geometry.projection import project_to_view_np
    from jafpro_tpu.geometry.rasterizer import select_crop_cols

    view = project_to_view_np(np.asarray(clip2["verts"], np.float32),
                              np.asarray(clip2["cams"], np.float32),
                              pipe.flow_engine.viewing_angle)
    wr = select_crop_cols(view[:, pipe.flow_engine.faces], image_size=S,
                          buckets=(16, 24, 32, 48))
    assert wr > 0
    eng = dataclasses.replace(pipe.flow_engine, crop_cols=wr)
    cpipe = JAFProPipeline(pipe.cfg, flow_engine=eng)
    ref2 = VideoGenerator(pipe)(params, clip2)
    raster_only = VideoGenerator(cpipe, crop_flow=False)(params, clip2)
    both = VideoGenerator(cpipe)(params, clip2)
    for k in ("final", "coarse", "mask", "tsf"):
        np.testing.assert_array_equal(np.asarray(ref2[k]),
                                      np.asarray(raster_only[k]))
        np.testing.assert_array_equal(np.asarray(ref2[k]),
                                      np.asarray(both[k]))


def test_video_generator_warp_mode_invariance(setup):
    """warp_mode='lut' (per-clip integer-UV table + 1-tap gather) must match
    warp_mode='gather' (4-tap atlas gather) on integer IUV data."""
    pipe, params, batch = setup
    clip = _tiny_clip(batch)
    out_lut = VideoGenerator(pipe, warp_mode="lut")(params, clip)
    out_gather = VideoGenerator(pipe, warp_mode="gather")(params, clip)
    np.testing.assert_allclose(np.asarray(out_lut["final"]),
                               np.asarray(out_gather["final"]), atol=2e-5)
    # the gather-free dense-matmul lowering (bf16 operands) stays within
    # the pipeline's own bf16 tolerance of the gather form
    out_mm = VideoGenerator(pipe, warp_mode="mm")(params, clip)
    np.testing.assert_allclose(np.asarray(out_mm["final"]),
                               np.asarray(out_gather["final"]), atol=6e-2)


def test_stage3_step(setup):
    from jafpro_tpu.train.stage34 import make_stage3_step, stage3_lrs

    pipe, params, batch = setup
    state = TrainState.create(params, stage3_lrs())
    step = jax.jit(make_stage3_step(pipe))
    state2, m = step(state, batch)
    for k in ("loss", "recon", "G", "FG", "D", "FD"):
        assert np.isfinite(float(m[k])), k
    # stage 3 trains bg (unlike stage 4)
    b0 = jax.tree_util.tree_leaves(state.params["bg"])[0]
    b1 = jax.tree_util.tree_leaves(state2.params["bg"])[0]
    assert not np.allclose(np.asarray(b0), np.asarray(b1))


def test_video_generator_frame_batch_invariance(setup):
    """Per-sample propagation norm makes frame batching exact: outputs for
    frame_batch=1 and frame_batch=3 must match."""
    pipe, params, batch = setup
    verts, _ = synthetic_quad_mesh(6)
    T, R = 3, 2
    clip = {
        "src_parts": batch["src_parts"],
        "src_mask_parts": batch["src_mask_parts"],
        "ref_mask": batch["ref_mask"],
        "bg_incomplete": batch["bg_incomplete"],
        "src_imgs": jnp.tile(batch["prev_img"], (R, 1, 1, 1)),
        "chosen_frames": jnp.asarray([0, 2], jnp.int32),
        "tgt_iuv255": jnp.tile(batch["tgt_iuv255"], (T, 1, 1, 1)),
        "tgt_iuv": jnp.tile(batch["tgt_iuv"], (T, 1, 1, 1)),
        "smpl_mask": jnp.tile(batch["smpl_mask"], (T, 1, 1, 1)),
        "cams": jnp.tile(jnp.asarray([[1.0, 0, 0]]), (T, 1)),
        "verts": jnp.tile(jnp.asarray(verts)[None], (T, 1, 1)),
    }
    out1 = VideoGenerator(pipe, frame_batch=1)(params, clip)
    out3 = VideoGenerator(pipe, frame_batch=3)(params, clip)
    np.testing.assert_allclose(np.asarray(out1["final"]),
                               np.asarray(out3["final"]), atol=2e-5)


def test_video_generator_batch_sharded(setup):
    """Whole-clip data parallelism: a 2-clip batch sharded over a 2-device
    mesh matches the single-clip path per clip."""
    from jafpro_tpu.parallel.mesh import create_mesh

    pipe, params, batch = setup
    verts, _ = synthetic_quad_mesh(6)
    T, R = 3, 2
    clip = {
        "src_parts": batch["src_parts"],
        "src_mask_parts": batch["src_mask_parts"],
        "ref_mask": batch["ref_mask"],
        "bg_incomplete": batch["bg_incomplete"],
        "src_imgs": jnp.tile(batch["prev_img"], (R, 1, 1, 1)),
        "chosen_frames": jnp.asarray([0, 2], jnp.int32),
        "tgt_iuv255": jnp.tile(batch["tgt_iuv255"], (T, 1, 1, 1)),
        "tgt_iuv": jnp.tile(batch["tgt_iuv"], (T, 1, 1, 1)),
        "smpl_mask": jnp.tile(batch["smpl_mask"], (T, 1, 1, 1)),
        "cams": jnp.tile(jnp.asarray([[1.0, 0, 0]]), (T, 1)),
        "verts": jnp.tile(jnp.asarray(verts)[None], (T, 1, 1)),
    }
    gen = VideoGenerator(pipe)
    single = gen(params, clip)
    clips = jax.tree_util.tree_map(
        lambda x: jnp.stack([x, x]), clip)
    mesh = create_mesh(2)
    out = gen.generate_batch(params, clips, mesh=mesh)
    assert out["final"].shape == (2,) + single["final"].shape
    np.testing.assert_allclose(np.asarray(out["final"][0]),
                               np.asarray(single["final"]), atol=2e-5)
    np.testing.assert_allclose(np.asarray(out["final"][1]),
                               np.asarray(out["final"][0]), atol=1e-6)


def test_video_generator_raster_mode_invariance(setup):
    """raster_mode='batch' (all target poses z-buffered up front) must be
    bit-identical to the in-scan rasterization schedule."""
    pipe, params, batch = setup
    verts, _ = synthetic_quad_mesh(6)
    T, R = 3, 2
    clip = {
        "src_parts": batch["src_parts"],
        "src_mask_parts": batch["src_mask_parts"],
        "ref_mask": batch["ref_mask"],
        "bg_incomplete": batch["bg_incomplete"],
        "src_imgs": jnp.tile(batch["prev_img"], (R, 1, 1, 1)),
        "chosen_frames": jnp.asarray([0, 2], jnp.int32),
        "tgt_iuv255": jnp.tile(batch["tgt_iuv255"], (T, 1, 1, 1)),
        "tgt_iuv": jnp.tile(batch["tgt_iuv"], (T, 1, 1, 1)),
        "smpl_mask": jnp.tile(batch["smpl_mask"], (T, 1, 1, 1)),
        "cams": jnp.tile(jnp.asarray([[1.0, 0, 0]]), (T, 1)),
        "verts": jnp.tile(jnp.asarray(verts)[None], (T, 1, 1)),
    }
    out_scan = VideoGenerator(pipe, raster_mode="scan")(params, clip)
    out_batch = VideoGenerator(pipe, raster_mode="batch")(params, clip)
    np.testing.assert_array_equal(np.asarray(out_scan["final"]),
                                  np.asarray(out_batch["final"]))
    # flow_mode='batch' hoists the whole flow branch (z-buffer + barycentric
    # flow + source warp) out of the scan; must also be bit-identical
    out_flow = VideoGenerator(pipe, flow_mode="batch")(params, clip)
    for k in ("final", "coarse", "mask", "tsf"):
        np.testing.assert_array_equal(np.asarray(out_scan[k]),
                                      np.asarray(out_flow[k]), err_msg=k)


def test_stage2_step_consumes_reference_target_count(setup):
    """Stage 2 trains on 2 targets (reference train/2:62) even though
    textonly records carry the stage-1 schedule's 3 (options.py:23): the
    loss must be invariant to the third target and sensitive to the
    second."""
    from jafpro_tpu.train.common import synthetic_batch

    pipe, params, _ = setup
    rng = np.random.RandomState(11)
    b = {k: jnp.asarray(v) for k, v in synthetic_batch(
        rng, batch=1, num_refs=2, part_size=16, image_size=64,
        num_verts=36, num_targets=3).items()}
    state = TrainState.create(params, stage2_lrs())
    step = jax.jit(make_stage2_step(pipe))  # default num_target=2

    _, m0 = step(state, b)
    # perturb target 3 only -> identical loss
    b3 = dict(b)
    b3["tgt_parts"] = b["tgt_parts"].at[:, 2].add(0.5)
    b3["tgt_mask_parts"] = b["tgt_mask_parts"].at[:, 2].set(1.0)
    _, m3 = step(state, b3)
    assert float(m0["loss"]) == float(m3["loss"])
    # perturb target 2 -> loss changes
    b2 = dict(b)
    b2["tgt_parts"] = b["tgt_parts"].at[:, 1].add(0.5)
    _, m2 = step(state, b2)
    assert float(m0["loss"]) != float(m2["loss"])


def test_video_generator_uint8_clip_equivalence(setup):
    """A uint8 wire-format clip (load_clip's output form) must produce the
    SAME video as the float32 clip it decodes to — normalize_batch is the
    inverse of the shard/clip encoding and tgt_iuv derives from
    tgt_iuv255.  Tolerance is ~1 input ulp, not bitwise: XLA fuses the
    device-side x/255*2-1 into a different rounding sequence than the
    host NumPy control (max observed delta 8e-07 on [-1,1] outputs)."""
    from jafpro_tpu.data.shardio import encode_field_u8

    pipe, params, batch = setup
    clip = _tiny_clip(batch)

    u8 = {}
    f32 = {}
    for k, v in clip.items():
        a = np.asarray(v)
        if k in ("src_parts", "src_imgs"):
            enc = encode_field_u8(k, a)
            u8[k] = jnp.asarray(enc)
            f32[k] = jnp.asarray(enc.astype(np.float32) / 255.0 * 2.0 - 1.0)
        elif k in ("src_mask_parts", "smpl_mask"):
            enc = encode_field_u8(k, a)
            u8[k] = jnp.asarray(enc)
            f32[k] = jnp.asarray(enc.astype(np.float32) / 255.0)
        elif k == "tgt_iuv255":
            enc = np.clip(np.rint(a), 0, 255).astype(np.uint8)
            u8[k] = jnp.asarray(enc)
            f32[k] = jnp.asarray(enc.astype(np.float32))
        elif k == "tgt_iuv":
            continue  # u8 clip omits it; f32 gets the derived value below
        else:
            u8[k] = f32[k] = v
    f32["tgt_iuv"] = (f32["tgt_iuv255"] / 255.0 - 0.5) * 2.0

    gen = VideoGenerator(pipe)
    out_u8 = gen(params, u8)
    out_f32 = gen(params, f32)
    for k in ("final", "coarse", "mask", "tsf"):
        np.testing.assert_allclose(
            np.asarray(out_u8[k]), np.asarray(out_f32[k]),
            atol=2e-5, rtol=0, err_msg=k)


def test_video_generator_output_uint8_matches_host_encode(setup):
    """output_uint8=True must equal the host-side frames_to_uint8 encode of
    the float output (up to 1 code at truncation boundaries where XLA's
    fused multiply rounds the f32 product differently)."""
    from jafpro_tpu.infer import frames_to_uint8

    pipe, params, batch = setup
    clip = _tiny_clip(batch)
    out_f = VideoGenerator(pipe)(params, clip)
    out_u = VideoGenerator(pipe, output_uint8=True)(params, clip)
    for k in ("final", "coarse", "tsf"):
        a = frames_to_uint8(out_f[k]).astype(np.int16)
        b = np.asarray(out_u[k]).astype(np.int16)
        assert np.abs(a - b).max() <= 1, k
    m_a = np.clip(np.asarray(out_f["mask"]) * 255, 0, 255).astype(np.int16)
    m_b = np.asarray(out_u["mask"]).astype(np.int16)
    assert np.abs(m_a - m_b).max() <= 1
