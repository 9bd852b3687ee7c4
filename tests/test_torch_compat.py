"""Numerical parity of the torch->flax checkpoint converters: the reference
torch modules run as oracles with random weights; the converted flax modules
must reproduce their outputs (proving the packed-parts / per-gate
re-parameterizations exact)."""

import os
import sys
import types

import numpy as np
import jax.numpy as jnp
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(os.path.join(REF, "src")),
                                reason="reference checkout not available")


@pytest.fixture(scope="module")
def ref():
    """Import reference modules (stubbing torchvision, which the reference
    only uses for its VGG losses — not needed to build the generators)."""
    torch = pytest.importorskip("torch")
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tv.models = types.ModuleType("torchvision.models")
        tv.models.vgg19 = None
        tv.models.vgg16 = None
        tv.transforms = types.ModuleType("torchvision.transforms")
        tv.transforms.functional = types.ModuleType(
            "torchvision.transforms.functional")
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.models"] = tv.models
        sys.modules["torchvision.transforms"] = tv.transforms
        sys.modules["torchvision.transforms.functional"] = (
            tv.transforms.functional)
    sys.path.insert(0, REF)
    import src.convLSTM as conv_lstm
    import src.crn_model as crn_model
    import src.flow_net as flow_net
    import src.networks as networks

    torch.manual_seed(0)
    return types.SimpleNamespace(torch=torch, networks=networks,
                                 crn=crn_model, flow=flow_net,
                                 conv_lstm=conv_lstm)


def _nchw(x):
    return np.ascontiguousarray(np.transpose(x, (0, 3, 1, 2)))


def test_crn_smaller_parity(ref):
    torch = ref.torch
    from jafpro_tpu.models import CRNSmaller
    from jafpro_tpu.torch_compat import load_torch_crn

    tm = ref.crn.CRN_smaller(6, fg=True).eval()
    rng = np.random.RandomState(0)
    x = rng.randn(2, 64, 64, 6).astype(np.float32)
    with torch.no_grad():
        t_out, t_mask = tm(torch.from_numpy(_nchw(x)), 64)

    variables = load_torch_crn(tm.state_dict(), fg=True)
    out, mask = CRNSmaller(fg=True).apply(variables, jnp.asarray(x), 64)
    np.testing.assert_allclose(
        np.asarray(out), t_out.numpy().transpose(0, 2, 3, 1), atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(mask), t_mask.numpy().transpose(0, 2, 3, 1), atol=2e-4)


def test_propagation_parity(ref):
    torch = ref.torch
    from jafpro_tpu.models import Propagation3DFlowNet
    from jafpro_tpu.torch_compat import load_torch_propagation

    tm = ref.flow.Propagation3DFlowNet(9, 32, 2, 3, use_deconv=False).train()
    rng = np.random.RandomState(1)
    fake = rng.randn(2, 32, 32, 3).astype(np.float32)
    tsf = rng.randn(2, 32, 32, 3).astype(np.float32)
    iuv = rng.randn(2, 32, 32, 3).astype(np.float32)
    m = (rng.rand(2, 32, 32, 1) > 0.3).astype(np.float32)
    with torch.no_grad():
        t_out = tm({"fake_tgt": torch.from_numpy(_nchw(fake)),
                    "tsf_image": torch.from_numpy(_nchw(tsf)),
                    "tgt_IUV": torch.from_numpy(_nchw(iuv)),
                    "use_IUV": True, "use_mask": True,
                    "tgt_smpl_mask": torch.from_numpy(_nchw(m))})

    variables = load_torch_propagation(tm.state_dict())
    out = Propagation3DFlowNet().apply(
        variables, jnp.asarray(fake), jnp.asarray(tsf), jnp.asarray(iuv),
        jnp.asarray(m))
    np.testing.assert_allclose(
        np.asarray(out["weight"]),
        t_out["weight"].numpy().transpose(0, 2, 3, 1), atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(out["pred_target"]),
        t_out["pred_target"].numpy().transpose(0, 2, 3, 1), atol=2e-4)


def test_discriminator_parity(ref):
    torch = ref.torch
    from jafpro_tpu.models import FaceDiscriminator, ImageDiscriminator
    from jafpro_tpu.torch_compat import (
        load_torch_face_discriminator, load_torch_image_discriminator)

    rng = np.random.RandomState(2)
    tm = ref.networks.ImageDiscriminator(8, input_channel=6).train()
    x = rng.randn(2, 256, 256, 6).astype(np.float32)
    with torch.no_grad():
        t_out = tm(torch.from_numpy(_nchw(x)))
    variables = load_torch_image_discriminator(tm.state_dict())
    out = ImageDiscriminator(ndf=8).apply(variables, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), t_out.numpy(), atol=2e-4)

    tm = ref.networks.FaceDiscriminator(8, input_channel=6).train()
    x = rng.randn(2, 64, 64, 6).astype(np.float32)
    with torch.no_grad():
        t_out = tm(torch.from_numpy(_nchw(x)))
    variables = load_torch_face_discriminator(tm.state_dict())
    out = FaceDiscriminator(ndf=8).apply(variables, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), t_out.numpy(), atol=2e-4)


def test_hmr_parity(ref):
    """The reference ``HumanModelRecovery`` ctor needs the (absent) SMPL
    pickle; its resnet+regressor forward (``src/hmr.py:276-300``) is
    composed here from the real reference submodules instead."""
    torch = ref.torch
    import torch.nn.functional as F
    import src.hmr as ref_hmr

    from jafpro_tpu.models import HumanModelRecovery
    from jafpro_tpu.torch_compat import load_torch_hmr

    resnet = ref_hmr.preActResNet50().eval()
    regressor = ref_hmr.ThetaRegressor(2048 + 85, 85, 3).eval()
    # exercise running statistics (the converter maps them)
    torch.manual_seed(5)
    for m in resnet.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.normal_(0, 0.05)
            m.running_var.uniform_(0.5, 1.5)

    rng = np.random.RandomState(6)
    x = rng.randn(2, 224, 224, 3).astype(np.float32)
    with torch.no_grad():
        out = resnet.conv1(torch.from_numpy(_nchw(x)))
        out = F.max_pool2d(out, kernel_size=3, stride=2, ceil_mode=True)
        for layer in (resnet.layer1, resnet.layer2, resnet.layer3,
                      resnet.layer4):
            out = layer(out)
        out = F.relu(resnet.post_bn(out))
        out = F.avg_pool2d(out, 7).view(out.size(0), -1)
        t_theta = regressor(out)

    sd = {f"resnet.{k}": v for k, v in resnet.state_dict().items()}
    sd.update({f"regressor.{k}": v for k, v in regressor.state_dict().items()})
    variables = load_torch_hmr(sd)
    theta = HumanModelRecovery().apply(variables, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(theta), t_theta.numpy(), atol=5e-4)


def test_load_torch_pipeline_glue(ref, tmp_path):
    """The conv_pro_test-style directory loader: reference file names,
    nn.DataParallel 'module.' prefixes, and tree compatibility with the
    pipeline's init_params structure."""
    torch = ref.torch
    import jax

    from jafpro_tpu.torch_compat import (
        load_torch_crn, load_torch_propagation)

    bg = ref.crn.CRN_smaller(3, fg=False)
    refine = ref.crn.CRN_smaller(3, fg=True)
    pro = ref.flow.Propagation3DFlowNet(9, 32, 2, 3, use_deconv=False)

    def save(stem, module):
        sd = {f"module.{k}": v for k, v in module.state_dict().items()}
        torch.save(sd, tmp_path / f"{stem}_iter_7.pth")

    save("bg", bg)
    save("refine", refine)
    save("pro", pro)

    # per-module loaders accept the saved files with the DP prefix
    pb = load_torch_crn(str(tmp_path / "bg_iter_7.pth"), fg=False)
    pr = load_torch_crn(str(tmp_path / "refine_iter_7.pth"), fg=True)
    pp = load_torch_propagation(str(tmp_path / "pro_iter_7.pth"))
    assert "Conv_1" in pr["params"] and "Conv_1" not in pb["params"]
    leaves = jax.tree_util.tree_leaves(pp["params"])
    assert all(np.isfinite(np.asarray(x)).all() for x in leaves)


def _patch_lstm_cpu(ref, module, sizes):
    """Point the reference ConvLSTM cells at CPU zeros with the right
    spatial sizes (the reference hardcodes .cuda() and 200px)."""
    import torch

    def init_hidden(self, batch_size, cuda=True):
        return (torch.zeros(batch_size, self.hidden_dim, self.height,
                            self.width),
                torch.zeros(batch_size, self.hidden_dim, self.height,
                            self.width))

    ref.conv_lstm.ConvLSTMCell.init_hidden = init_hidden
    for p in range(24):
        ds = module.Downsampler_list[p]
        for lvl, s in enumerate(sizes):
            cell = getattr(ds, f"convLSTM{lvl + 1}").cell_list[0]
            cell.height = cell.width = s


@pytest.mark.slow
def test_accumulate_parity(ref):
    torch = ref.torch
    from jafpro_tpu.models import AccumulateLSTM
    from jafpro_tpu.torch_compat import load_torch_accumulate

    tm = ref.networks.Accumulate_LSTM_no_loss().eval()
    # the reference decoder hardcodes 25/50/100/200 upsample targets ->
    # oracle must run at the real 200px part size
    _patch_lstm_cpu(ref, tm, sizes=(200, 100, 50, 25, 13))
    rng = np.random.RandomState(3)
    N, P, s = 2, 24, 200
    parts = rng.randn(1, N, P, s, s, 3).astype(np.float32)
    x_in = [[torch.from_numpy(_nchw(parts[:, n, p]))
             for n in range(N)] for p in range(P)]
    with torch.no_grad():
        t_list = tm(x_in)

    variables = load_torch_accumulate(tm.state_dict())
    out = AccumulateLSTM().apply(variables, jnp.asarray(parts),
                                 jnp.ones((1, N)))
    for p in range(P):
        np.testing.assert_allclose(
            np.asarray(out[:, p]),
            t_list[p].numpy().transpose(0, 2, 3, 1), atol=5e-4)


@pytest.mark.slow
def test_inpainter_parity(ref):
    torch = ref.torch
    from jafpro_tpu.models import UNetInpainter
    from jafpro_tpu.torch_compat import load_torch_inpainter

    tm = ref.networks.UNet_inpainter().eval()
    rng = np.random.RandomState(4)
    P, s = 24, 200
    parts = rng.randn(1, P, s, s, 3).astype(np.float32)
    tex_list = [torch.from_numpy(_nchw(parts[:, p])) for p in range(P)]
    with torch.no_grad():
        t_list = tm(tex_list)

    variables = load_torch_inpainter(tm.state_dict())
    out = UNetInpainter().apply(variables, jnp.asarray(parts))
    for p in range(P):
        np.testing.assert_allclose(
            np.asarray(out[:, p]),
            t_list[p].numpy().transpose(0, 2, 3, 1), atol=5e-4)
