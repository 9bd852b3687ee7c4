"""Shape-contract and behavior tests for the Flax modules."""

import chex
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from jafpro_tpu.models import (
    AccumulateLSTM,
    ConvLSTM,
    CRNSmaller,
    FaceDiscriminator,
    ImageDiscriminator,
    Propagation3DFlowNet,
    UNetInpainter,
    VGG19Features,
)
from jafpro_tpu.data.texture import atlas_to_parts, parts_to_atlas, texture_warp

KEY = jax.random.PRNGKey(0)


def test_conv_lstm_shapes_and_mask():
    m = ConvLSTM(hidden_dim=8)
    xs = jax.random.normal(KEY, (2, 4, 8, 8, 3))
    mask = jnp.asarray([[1, 1, 0, 0], [1, 1, 1, 1]], jnp.float32)
    params = m.init(KEY, xs, mask)
    ys, (h, c) = m.apply(params, xs, mask)
    assert ys.shape == (2, 4, 8, 8, 8) and h.shape == (2, 8, 8, 8)
    # masked-out steps freeze the state: batch 0 final == step-2 output
    np.testing.assert_allclose(np.asarray(ys[0, 1]), np.asarray(h[0]), atol=1e-6)
    # a fully-masked suffix never equals the unmasked run (sanity)
    ys_full, (h_full, _) = m.apply(params, xs, jnp.ones_like(mask))
    assert not np.allclose(np.asarray(h_full[0]), np.asarray(h[0]))


def test_accumulate_shapes():
    # tiny geometry: part=32 keeps the test fast; parts=6 instead of 24
    m = AccumulateLSTM()
    parts = jax.random.normal(KEY, (1, 3, 6, 32, 32, 3))
    mask = jnp.ones((1, 3))
    params = m.init(KEY, parts, mask)
    out = m.apply(params, parts, mask)
    assert out.shape == (1, 6, 32, 32, 3)
    # grouped convs keep parts independent: perturbing part 5's input
    # must not change part 0's output (no cross-part path in accumulate)
    parts2 = parts.at[:, :, 5].add(10.0)
    out2 = m.apply(params, parts2, mask)
    np.testing.assert_allclose(np.asarray(out[:, 0]), np.asarray(out2[:, 0]),
                               atol=1e-6)
    assert not np.allclose(np.asarray(out[:, 5]), np.asarray(out2[:, 5]))


def test_inpainter_shapes_and_global_code():
    m = UNetInpainter()
    parts = jax.random.normal(KEY, (1, 6, 32, 32, 3))
    params = m.init(KEY, parts)
    out = m.apply(params, parts)
    assert out.shape == (1, 6, 32, 32, 3)
    # the global bottleneck makes part 0's output depend on part 5's input
    # (checked by gradient — a forward perturbation attenuates through the
    # 9-conv encoder at init)
    g = jax.grad(lambda p: jnp.sum(m.apply(params, p)[:, 0] ** 2))(parts)
    assert float(jnp.abs(g[:, 5]).max()) > 0.0


def test_crn_smaller():
    m = CRNSmaller(fg=True)
    x = jax.random.normal(KEY, (1, 64, 64, 3))
    params = m.init(KEY, x, 64)
    out, mask = m.apply(params, x, 64)
    assert out.shape == (1, 64, 64, 3) and mask.shape == (1, 64, 64, 1)
    assert (np.asarray(mask) >= 0).all() and (np.asarray(mask) <= 1).all()

    m_bg = CRNSmaller(fg=False)
    params = m_bg.init(KEY, x, 64)
    out = m_bg.apply(params, x, 64)
    assert out.shape == (1, 64, 64, 3)


def test_propagation():
    m = Propagation3DFlowNet()
    fake = jax.random.normal(KEY, (2, 64, 64, 3))
    tsf = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 64, 3))
    iuv = jax.random.normal(jax.random.PRNGKey(2), (2, 64, 64, 3))
    mask = jnp.ones((2, 64, 64, 1))
    params = m.init(KEY, fake, tsf, iuv, mask)
    out = m.apply(params, fake, tsf, iuv, mask)
    w = np.asarray(out["weight"])
    assert out["pred_target"].shape == (2, 64, 64, 3)
    assert (w >= 0).all() and (w <= 1).all()
    # blend identity: pred == fake*w + tsf*(1-w)
    expect = np.asarray(fake) * w + np.asarray(tsf) * (1 - w)
    np.testing.assert_allclose(np.asarray(out["pred_target"]), expect, atol=1e-5)


def test_discriminators():
    d = ImageDiscriminator(ndf=8)
    x = jax.random.normal(KEY, (2, 256, 256, 6))
    params = d.init(KEY, x)
    out = d.apply(params, x)
    assert out.shape == (2, 1)
    assert (np.asarray(out) >= 0).all() and (np.asarray(out) <= 1).all()

    f = FaceDiscriminator(ndf=8)
    x = jax.random.normal(KEY, (2, 64, 64, 6))
    params = f.init(KEY, x)
    assert f.apply(params, x).shape == (2, 1)


def test_vgg_features():
    m = VGG19Features()
    x = jax.random.normal(KEY, (1, 64, 64, 3))
    params = m.init(KEY, x)
    feats = m.apply(params, x)
    assert [f.shape[-1] for f in feats] == [64, 128, 256, 512, 512]
    assert [f.shape[1] for f in feats] == [64, 32, 16, 8, 4]


def test_atlas_part_roundtrip():
    atlas = jax.random.normal(KEY, (2, 4 * 16, 6 * 16, 3))
    parts = atlas_to_parts(atlas, 16)
    assert parts.shape == (2, 24, 16, 16, 3)
    back = parts_to_atlas(parts)
    np.testing.assert_allclose(np.asarray(back), np.asarray(atlas))
    # tile (r, c) is part r*6+c
    np.testing.assert_allclose(
        np.asarray(parts[0, 7]), np.asarray(atlas[0, 16:32, 16:32])
    )


def test_texture_warp_matches_reference_loop():
    """Compare the fused warp against a literal torch transcription of
    texture_warp_pytorch (train/4:43-76)."""
    import torch
    import torch.nn.functional as F

    rng = np.random.RandomState(7)
    S, P = 32, 24
    parts = rng.randn(1, P, 16, 16, 3).astype(np.float32)
    iuv = np.zeros((1, S, S, 3), np.float32)
    iuv[..., 0] = rng.randint(0, 25, size=(1, S, S))
    iuv[..., 1] = rng.randint(0, 256, size=(1, S, S))
    iuv[..., 2] = rng.randint(0, 256, size=(1, S, S))

    ours = np.asarray(texture_warp(jnp.asarray(parts), jnp.asarray(iuv)))

    IUV = torch.from_numpy(iuv[0])
    U, V = IUV[:, :, 1], IUV[:, :, 2]
    gen = torch.zeros((1, 3, S, S))
    for pid in range(1, 25):
        sel = IUV[:, :, 0] == pid
        u = torch.where(sel, U, torch.zeros_like(U))
        v = torch.where(sel, V, torch.zeros_like(V))
        x = ((255 - v) / 255.0 - 0.5) * 2
        y = (u / 255.0 - 0.5) * 2
        grid = torch.stack([x, y], dim=2)[None]
        tex = torch.from_numpy(parts[0, pid - 1]).permute(2, 0, 1)[None]
        samp = F.grid_sample(tex, grid, mode="bilinear", align_corners=True)
        gen = torch.where(sel, samp, gen)
    ref = gen[0].permute(1, 2, 0).numpy()
    np.testing.assert_allclose(ours[0], ref, atol=1e-5)


def test_texture_warp_lut_matches_gather():
    """The integer-UV LUT warp (build once, 1-tap gather per frame) must
    agree with the 4-tap bilinear warp wherever IUV is integer-valued —
    which is always, for uint8 DensePose data.  Covers background pixels
    (pid 0) and the u/v extremes 0 and 255."""
    from jafpro_tpu.data.texture import build_texture_warp_lut, texture_warp_lut

    rng = np.random.RandomState(11)
    S, P = 32, 24
    parts = rng.randn(2, P, 16, 16, 3).astype(np.float32)
    iuv = np.zeros((2, S, S, 3), np.float32)
    iuv[..., 0] = rng.randint(0, 25, size=(2, S, S))
    iuv[..., 1:] = rng.randint(0, 256, size=(2, S, S, 2))
    iuv[0, 0, :4, 1:] = [[0, 0], [0, 255], [255, 0], [255, 255]]

    lut = build_texture_warp_lut(jnp.asarray(parts))
    assert lut.shape == (2, P, 256, 256, 3)
    ours = np.asarray(texture_warp_lut(lut, jnp.asarray(iuv)))
    ref = np.asarray(texture_warp(jnp.asarray(parts), jnp.asarray(iuv)))
    # separable (two-matmul) interpolation vs fused 4-tap: rounding-order ulps
    np.testing.assert_allclose(ours, ref, atol=1e-5)
    # the row-gather + one-hot-select lowering must match the point gather
    rows = np.asarray(texture_warp_lut(lut, jnp.asarray(iuv), impl="rows"))
    np.testing.assert_allclose(rows, ours, atol=1e-5)
    assert (ours[iuv[..., 0] == 0] == 0).all()


def test_texture_warp_mm_matches_gather():
    """The dense tent-weight matmul warp (zero gathers) must reproduce the
    4-tap bilinear warp: exactly in float32, within dtype tolerance in its
    bf16 and int8 production quantizations.  Unlike the LUT form it is
    exact bilinear, so non-integer IUV coordinates are covered too."""
    from jafpro_tpu.data.texture import texture_warp_mm

    rng = np.random.RandomState(13)
    S, P = 32, 24
    parts = np.tanh(rng.randn(2, P, 16, 16, 3)).astype(np.float32)
    iuv = np.zeros((2, S, S, 3), np.float32)
    iuv[..., 0] = rng.randint(0, 25, size=(2, S, S))
    iuv[..., 1:] = rng.randint(0, 256, size=(2, S, S, 2))
    iuv[0, 0, :4, 1:] = [[0, 0], [0, 255], [255, 0], [255, 255]]
    iuv[1, ..., 1:] += rng.uniform(0, 1, size=(S, S, 2))  # non-integer UV
    iuv[1, ..., 1:] = np.clip(iuv[1, ..., 1:], 0, 255)

    ref = np.asarray(texture_warp(jnp.asarray(parts), jnp.asarray(iuv)))
    exact = np.asarray(
        texture_warp_mm(jnp.asarray(parts), jnp.asarray(iuv),
                        quant="float32"))
    np.testing.assert_allclose(exact, ref, atol=1e-5)
    bf16 = np.asarray(
        texture_warp_mm(jnp.asarray(parts), jnp.asarray(iuv), quant="bf16"))
    np.testing.assert_allclose(bf16, ref, atol=3e-2)
    i8 = np.asarray(
        texture_warp_mm(jnp.asarray(parts), jnp.asarray(iuv), quant="int8"))
    # two x127 quantized factors -> <= ~2/127 absolute on the (-1,1) scale
    np.testing.assert_allclose(i8, ref, atol=2.5e-2)
    assert (exact[iuv[..., 0] == 0] == 0).all()


def test_sample_layer_norm_matches_torch_reference():
    """The CRN's custom LayerNorm has unusual semantics (per-sample stats
    over all dims, Bessel-corrected std, (x-mean)/(std+eps)) — check against
    a literal torch transcription of crn_model.py:67-87."""
    import torch

    from jafpro_tpu.models.common import SampleLayerNorm

    rng = np.random.RandomState(3)
    x = rng.randn(2, 5, 5, 4).astype(np.float32)
    m = SampleLayerNorm(features=4)
    params = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    gamma = np.asarray(params["params"]["gamma"])
    beta = np.asarray(params["params"]["beta"])
    ours = np.asarray(m.apply(params, jnp.asarray(x)))

    t = torch.from_numpy(x.transpose(0, 3, 1, 2))  # NCHW like the reference
    mean = t.reshape(2, -1).mean(1).reshape(2, 1, 1, 1)
    std = t.reshape(2, -1).std(1).reshape(2, 1, 1, 1)  # Bessel by default
    y = (t - mean) / (std + 1e-5)
    y = y * torch.from_numpy(gamma).reshape(1, -1, 1, 1) + \
        torch.from_numpy(beta).reshape(1, -1, 1, 1)
    ref = y.numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_accumulate_gru_ablation():
    from jafpro_tpu.models.accumulate import AccumulateGRU

    for cell in ("gru", "modgru"):
        m = AccumulateGRU(cell=cell)
        parts = jax.random.normal(KEY, (1, 2, 4, 16, 16, 3))
        mask = jnp.ones((1, 2))
        params = m.init(KEY, parts, mask)
        out = m.apply(params, parts, mask)
        assert out.shape == (1, 4, 16, 16, 3)


def test_part_conv_impls_equivalent():
    """The dense block-diagonal and grouped-conv lowerings share one
    parameter tree and produce identical outputs (models/parts.py)."""
    from jafpro_tpu.models.parts import PartConv

    x = jax.random.normal(KEY, (2, 8, 8, 4 * 5))
    dense = PartConv(parts=4, features=6, impl="dense")
    params = dense.init(KEY, x)
    ref = np.asarray(dense.apply(params, x))
    # blocks8 with parts=4 exercises the non-divisible fallback (Q -> P)
    for impl in ("groups", "blocks1", "blocks2", "blocks4", "blocks8"):
        other = PartConv(parts=4, features=6, impl=impl)
        np.testing.assert_allclose(
            ref, np.asarray(other.apply(params, x)), atol=1e-5)


def test_accumulate_impls_equivalent():
    from jafpro_tpu.models.accumulate import AccumulateLSTM

    parts = jax.random.normal(KEY, (1, 2, 3, 16, 16, 3))
    mask = jnp.ones((1, 2))
    dense = AccumulateLSTM(conv_impl="dense")
    params = dense.init(KEY, parts, mask)
    ref = np.asarray(dense.apply(params, parts, mask))
    for impl in ("groups", "blocks3", "blocks8"):
        other = AccumulateLSTM(conv_impl=impl)
        np.testing.assert_allclose(
            ref, np.asarray(other.apply(params, parts, mask)), atol=2e-5)


def test_accumulate_ref_major_equivalence():
    """ref_major=True (per-ref unrolled encoder+LSTM lockstep — the
    training-memory form) must bind the identical param tree and produce
    the level-major result, including masked-out refs."""
    from jafpro_tpu.models.accumulate import AccumulateLSTM

    parts = jax.random.normal(KEY, (2, 3, 4, 16, 16, 3))
    mask = jnp.asarray([[1.0, 0.0, 1.0], [1.0, 1.0, 0.0]])
    level = AccumulateLSTM()
    refm = AccumulateLSTM(ref_major=True)
    params = level.init(KEY, parts, mask)
    params_rm = refm.init(KEY, parts, mask)
    chex.assert_trees_all_equal_shapes(params, params_rm)
    want = np.asarray(level.apply(params, parts, mask))
    np.testing.assert_allclose(
        np.asarray(refm.apply(params, parts, mask)), want, atol=2e-5)

    # with per-step rematerialization (the training form): same value AND
    # matching gradients w.r.t. the shared params
    rm2 = AccumulateLSTM(ref_major=True, remat_steps=True)
    np.testing.assert_allclose(
        np.asarray(rm2.apply(params, parts, mask)), want, atol=2e-5)

    def loss(m):
        return lambda p: jnp.sum(m.apply(p, parts, mask) ** 2)

    g_level = jax.grad(loss(level))(params)
    g_rm2 = jax.grad(loss(rm2))(params)
    chex.assert_trees_all_close(g_level, g_rm2, atol=2e-4)
