"""Shape-contract and behavior tests for the unused-capability ports
(``models/ablations.py``, ``losses_extra.py``, ``fit_uv_image``)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jafpro_tpu.models.ablations import (
    AccumulateAvgFusion,
    AccumulateMask,
    AccumulateMaxFusion,
    AccumulatePlain,
    AutoEncoder,
    BlendingModule,
    CodeDecoder,
    CodeEncoder,
    CRNAuto,
    EdgeGenerator,
    InpaintGenerator,
    InstanceNorm,
    MaxFusionModule,
    NLayerDiscriminator,
    PatchDiscriminator70,
    PixelDiscriminator,
    PredictiveModule,
    RRDB,
    SpatioTempoCRN,
    TorchConvTranspose,
    UNetGenerator,
    UNetSE,
    UNetTA,
    lsgan_loss,
)
from jafpro_tpu import losses_extra as LX

KEY = jax.random.PRNGKey(0)


def _run(module, *args, **kwargs):
    params = module.init(KEY, *args, **kwargs)
    return module.apply(params, *args, **kwargs)


def test_torch_conv_transpose_sizes():
    # the CodeDecoder ladder 1 -> 3 -> 6 -> 12 -> 25 -> 50 -> 100 -> 200
    sizes = [(3, 2, 0), (4, 2, 1), (4, 2, 1), (3, 2, 0), (4, 2, 1),
             (4, 2, 1), (4, 2, 1)]
    x = jnp.zeros((1, 1, 1, 4))
    expect = [3, 6, 12, 25, 50, 100, 200]
    for (k, s, p), e in zip(sizes, expect):
        x = _run(TorchConvTranspose(4, k, s, p), x)
        assert x.shape[1] == e, (k, s, p, x.shape)


def test_instance_norm_matches_torch():
    torch = pytest.importorskip("torch")
    x = np.random.RandomState(0).randn(2, 5, 7, 3).astype(np.float32)
    ours = _run(InstanceNorm(), jnp.asarray(x))
    ref = torch.nn.InstanceNorm2d(3)(
        torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy().transpose(
            0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-5)


def test_unet_se_and_generator_shapes():
    x = jax.random.normal(KEY, (1, 48, 48, 6))
    assert _run(UNetSE(), x).shape == (1, 48, 48, 3)
    img = jax.random.normal(KEY, (1, 64, 64, 3))
    assert _run(UNetGenerator(), img).shape == (1, 64, 64, 3)
    atlas = jax.random.normal(KEY, (1, 64, 96, 6))
    assert _run(UNetTA(), atlas).shape == (1, 64, 96, 3)


@pytest.mark.parametrize("cls", [AccumulatePlain, AccumulateMaxFusion,
                                 AccumulateAvgFusion, AccumulateMask])
def test_accumulate_ablations(cls):
    parts = jax.random.normal(KEY, (1, 3, 4, 24, 24, 3))
    out = _run(cls(), parts)
    assert out.shape == (1, 4, 24, 24, 3)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_max_fusion_is_order_invariant():
    parts = jax.random.normal(KEY, (1, 3, 4, 24, 24, 3))
    m = AccumulateMaxFusion()
    params = m.init(KEY, parts)
    out1 = m.apply(params, parts)
    out2 = m.apply(params, parts[:, ::-1])
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-5)


def test_code_encoder_decoder_roundtrip_shapes():
    x = jax.random.normal(KEY, (2, 200, 200, 3))
    code = _run(CodeEncoder(), x)
    assert code.shape == (2, 256)
    out = _run(CodeDecoder(), jnp.concatenate([code, code], -1))
    assert out.shape == (2, 200, 200, 3)


def test_max_fusion_module():
    parts = jax.random.normal(KEY, (1, 2, 24, 200, 200, 3))
    out = _run(MaxFusionModule(), parts)
    assert out.shape == (1, 24, 200, 200, 3)
    assert bool(jnp.all(jnp.abs(out) <= 1.0))


def test_vid2vid_modules():
    x = jax.random.normal(KEY, (1, 32, 32, 9))
    pred = _run(PredictiveModule(n_blocks=2), x)
    assert pred.shape == (1, 32, 32, 3)
    img = jax.random.normal(KEY, (1, 32, 32, 3))
    out = _run(BlendingModule(), img, img, img)
    assert out.shape == (1, 32, 32, 3)


def test_edgeconnect_generators_and_disc():
    x = jax.random.normal(KEY, (1, 32, 32, 6))
    out = _run(InpaintGenerator(residual_blocks=2), x)
    assert out.shape == (1, 32, 32, 3)
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0

    e = EdgeGenerator(residual_blocks=1)
    ein = jax.random.normal(KEY, (1, 32, 32, 3))
    variables = e.init(KEY, ein)
    edge, _ = e.apply(variables, ein, update_sn=True,
                      mutable=["batch_stats"])
    assert edge.shape == (1, 32, 32, 1)

    d = PatchDiscriminator70(in_features=3)
    variables = d.init(KEY, ein)
    (probs, feats), _ = d.apply(variables, ein, update_sn=True,
                                mutable=["batch_stats"])
    assert probs.shape[-1] == 1 and len(feats) == 5
    assert float(probs.min()) >= 0.0 and float(probs.max()) <= 1.0


def test_pix2pix_discriminators_and_lsgan():
    x = jax.random.normal(KEY, (1, 64, 64, 3))
    patch = _run(NLayerDiscriminator(ndf=16), x)
    assert patch.shape[-1] == 1 and patch.shape[1] < 64
    pix = _run(PixelDiscriminator(ndf=16), x)
    assert pix.shape == (1, 64, 64, 1)
    assert float(lsgan_loss(jnp.ones((2, 2)), True)) == 0.0
    assert float(lsgan_loss(jnp.zeros((2, 2)), True)) == 1.0


def test_rrdb_shapes():
    x = jax.random.normal(KEY, (1, 16, 16, 8))
    assert _run(RRDB(8, growth=4), x).shape == x.shape


def test_crn_auto_and_autoencoder():
    emb = _run(AutoEncoder(), jax.random.normal(KEY, (1, 64, 64, 3)))
    assert emb.shape == (1, 1, 1, 128)
    label = jax.random.normal(KEY, (1, 64, 64, 6))
    src = jax.random.normal(KEY, (1, 64, 64, 3))
    out = _run(CRNAuto(), label, 64, src)
    assert out.shape == (1, 64, 64, 3)


def test_spatio_tempo_crn():
    label = jax.random.normal(KEY, (1, 64, 64, 6))
    prev = jax.random.normal(KEY, (1, 64, 64, 6))
    flow = 0.01 * jax.random.normal(KEY, (1, 64, 64, 2))
    out, prev_out = _run(SpatioTempoCRN(ngf=32), label, prev, 64, flow)
    assert out.shape == (1, 64, 64, 3) and prev_out.shape == (1, 64, 64, 3)


# ---------------------------------------------------------------------------
# losses_extra
# ---------------------------------------------------------------------------


def test_vid_loss_weights():
    x = jnp.ones((1, 3, 4, 4, 3))
    y = jnp.zeros((1, 3, 4, 4, 3))
    l1 = lambda a, b: jnp.mean(jnp.abs(a - b))
    # linear weights for T=3: [2/12, 4/12, 6/12] -> sum 1 -> loss 1
    assert float(LX.vid_loss(x, y, l1)) == pytest.approx(1.0)


def test_masked_l1():
    pred = jnp.ones((1, 4, 4, 3))
    tgt = jnp.zeros((1, 4, 4, 3))
    mask = jnp.zeros((1, 4, 4, 1)).at[:, :2].set(1.0)
    assert float(LX.masked_l1_loss(pred, tgt, mask)) == pytest.approx(0.5)


def test_vgg_taps_and_losses():
    m = LX.VGG19Taps(taps=LX.VID2VID_VGG_TAPS, pool="max")
    x = jax.random.normal(KEY, (1, 32, 32, 3))
    params = m.init(KEY, x)
    feats = m.apply(params, x)
    assert len(feats) == 5
    assert feats[0].shape == (1, 32, 32, 64)
    assert feats[4].shape == (1, 2, 2, 512)

    fn = lambda im: m.apply(params, im)
    y = x + 0.1
    assert float(LX.vid2vid_vgg_loss(fn, x, x)) == pytest.approx(0.0, abs=1e-6)
    assert float(LX.vid2vid_vgg_loss(fn, x, y)) > 0.0
    assert float(LX.style_loss(fn, x, y, size=32)) > 0.0
    assert float(LX.face_feature_loss(fn, x, y, size=(32, 32))) > 0.0

    trunc = LX.VGG19Taps(taps=LX.TRUNC_VGG_TAPS, pool="avg")
    tp = trunc.init(KEY, x)
    tf = lambda im: trunc.apply(tp, im)
    feats12 = tf(x)
    assert len(feats12) == 12
    stds = [jnp.ones((f.shape[-1],)) for f in feats12]
    assert float(LX.pvgg_loss(tf, x, x, stds)) == pytest.approx(0.0, abs=1e-6)
    assert float(LX.pvgg_loss_no_norm(tf, x, y, 12)) > 0.0


def test_nsgan_and_edgeconnect_losses():
    assert float(LX.nsgan_loss(jnp.full((2, 2), 0.999999), True)
                 ) == pytest.approx(0.0, abs=1e-4)

    d = PatchDiscriminator70(in_features=3)
    img = jax.random.normal(KEY, (1, 32, 32, 3))
    dv = d.init(KEY, img)
    disc_fn = lambda x: d.apply(dv, x)

    m = LX.VGG19Taps(taps=LX.VID2VID_VGG_TAPS, pool="max")
    mp = m.init(KEY, img)
    vgg_fn = lambda x: m.apply(mp, x)

    out = jnp.tanh(img) * 0.5 + 0.5
    real = jnp.zeros_like(img) + 0.5
    mask = jnp.ones((1, 32, 32, 1))
    g, dd, logs = LX.edgeconnect_inpainting_losses(out, real, mask, disc_fn,
                                                   vgg_fn)
    assert jnp.isfinite(g) and jnp.isfinite(dd)
    assert set(logs) == {"l_d2", "l_g2", "l_l1", "l_per", "l_sty"}


def test_hmr_loss_generic():
    fn = lambda x: (x.mean(axis=(1, 2)), x.sum(axis=(1, 2)))
    x = jax.random.normal(KEY, (1, 8, 8, 3))
    assert float(LX.hmr_loss(fn, x, x)) == pytest.approx(0.0)
    assert float(LX.hmr_loss(fn, x, x + 1)) > 0.0


def test_fit_uv_image_recovers_flat_color():
    from jafpro_tpu.geometry.uvmap import fit_uv_image

    rng = np.random.RandomState(0)
    F, T = 16, 3
    uv = rng.uniform(-0.9, 0.9, size=(F, T * T, 2)).astype(np.float32)
    tgt = np.full((F, T, T, 3), 0.5, np.float32)
    img = fit_uv_image(uv, tgt, uv_size=16, steps=300)
    assert img.shape == (16, 16, 3)
    # sampled locations should approach the flat target color
    from jafpro_tpu.ops.sampling import grid_sample

    samp = grid_sample(img[None], jnp.asarray(uv)[None])
    assert float(jnp.mean(jnp.abs(samp - 0.5))) < 0.1
