"""FlowNetSD: structural test + weight-converter parity against the
reference torch implementation executed as an oracle (random weights)."""

import os
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from jafpro_tpu.models.flownet import FlowNetSD, FlowNetC, load_torch_flownet_sd

REF_NET_DIR = "/root/reference/src/flownet2_pytorch"


def test_flownet_sd_shapes():
    m = FlowNetSD()
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 64, 64, 6))
    variables = m.init(jax.random.PRNGKey(0), x)
    flow = m.apply(variables, x)
    assert flow.shape == (1, 16, 16, 2)


def test_flownet_c_shapes():
    m = FlowNetC()
    x1 = jax.random.normal(jax.random.PRNGKey(0), (1, 64, 64, 3))
    x2 = jax.random.normal(jax.random.PRNGKey(1), (1, 64, 64, 3))
    variables = m.init(jax.random.PRNGKey(0), x1, x2)
    flow = m.apply(variables, x1, x2)
    assert flow.shape == (1, 16, 16, 2)


@pytest.mark.skipif(not os.path.isdir(REF_NET_DIR),
                    reason="reference checkout not available")
def test_flownet_sd_matches_torch_reference(tmp_path):
    """Run the reference FlowNetSD (torch CPU, random weights) as an oracle
    and check the converted weights reproduce its output."""
    import torch

    sys.path.insert(0, REF_NET_DIR)
    try:
        from networks.FlowNetSD import FlowNetSD as TorchFlowNetSD
    finally:
        sys.path.pop(0)

    torch.manual_seed(0)
    tm = TorchFlowNetSD(args=None, batchNorm=True).eval()
    # randomize running stats so the BN conversion is actually exercised
    for mod in tm.modules():
        if isinstance(mod, torch.nn.BatchNorm2d):
            mod.running_mean.uniform_(-0.5, 0.5)
            mod.running_var.uniform_(0.5, 1.5)

    ckpt = tmp_path / "sd.pth"
    torch.save({"state_dict": tm.state_dict()}, ckpt)

    variables = load_torch_flownet_sd(str(ckpt))
    m = FlowNetSD()

    rng = np.random.RandomState(0)
    x = rng.rand(1, 64, 64, 6).astype(np.float32)
    ours = np.asarray(m.apply(variables, jnp.asarray(x)))

    with torch.no_grad():
        ref = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)))[0]
    ref = ref.numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(ours, ref, atol=2e-4)


def test_flownet_s_fusion_flownet2_shapes():
    from jafpro_tpu.models.flownet import (
        FlowNet2, FlowNetFusion, FlowNetS, epe, flownet2_preprocess,
        multiscale_flow_loss)

    key = jax.random.PRNGKey(0)
    s = FlowNetS()
    x = jax.random.normal(key, (1, 64, 64, 12))
    v = s.init(key, x)
    assert s.apply(v, x).shape == (1, 16, 16, 2)

    f = FlowNetFusion()
    xf = jax.random.normal(key, (1, 64, 64, 11))
    vf = f.init(key, xf)
    assert f.apply(vf, xf).shape == (1, 64, 64, 2)

    frames = jax.random.uniform(key, (1, 64, 64, 3, 2)) * 255
    x2 = flownet2_preprocess(frames)
    assert x2.shape == (1, 64, 64, 6)
    net = FlowNet2()
    v2 = net.init(key, x2)
    flow = net.apply(v2, x2)
    assert flow.shape == (1, 64, 64, 2)

    # losses
    tgt = jax.random.normal(key, (1, 64, 64, 2))
    assert float(epe(tgt, tgt)) == 0.0
    pyr = tuple(jax.random.normal(key, (1, 64 // (4 * 2 ** i),
                                        64 // (4 * 2 ** i), 2))
                for i in range(3))
    loss, e = multiscale_flow_loss(pyr, tgt)
    assert np.isfinite(float(loss)) and np.isfinite(float(e))
