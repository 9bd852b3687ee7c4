"""FlowNet family, TPU-native.

``FlowNetSD`` (reference ``src/flownet2_pytorch/networks/FlowNetSD.py``):
the no-correlation optical-flow net JAFPro uses as a frozen flow-consistency
metric (``test/video_evaluation.py:66, 199-202``).

``FlowNetC`` (reference ``networks/FlowNetC.py``): the cost-volume variant —
its CUDA correlation layer is replaced by ``jafpro_tpu.ops.correlation``.

Both run in NHWC with eval-mode batch norm (running statistics), matching
the frozen-metric usage.  ``load_torch_flownet_sd`` converts the published
FlowNet2-SD checkpoint.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from jafpro_tpu.ops.correlation import correlation


class _ConvBlock(nn.Module):
    """conv + BN + LeakyReLU(0.1) (reference ``submodules.py:conv``)."""

    features: int
    kernel: int = 3
    stride: int = 1
    act: bool = True
    norm: bool = True
    bias: Optional[bool] = None  # default: no bias when normed (torch `conv`)
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = (self.kernel - 1) // 2
        use_bias = self.bias if self.bias is not None else not self.norm
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride),
                    padding=[(pad, pad)] * 2, use_bias=use_bias,
                    dtype=self.dtype)(x)
        if self.norm:
            x = nn.BatchNorm(use_running_average=not train)(x)
        if self.act:
            x = nn.leaky_relu(x, 0.1)
        return x


class _Deconv(nn.Module):
    """ConvTranspose(k4, s2, p1) + LeakyReLU(0.1)."""

    features: int
    act: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        # torch ConvTranspose2d(k=4, s=2, p=1) == flax 'SAME' (out = 2*in,
        # one row/col trimmed from each side) — verified by the torch parity
        # test in tests/test_flownet_parity.py
        x = nn.ConvTranspose(self.features, (4, 4), strides=(2, 2),
                             padding="SAME", dtype=self.dtype)(x)
        if self.act:
            x = nn.leaky_relu(x, 0.1)
        return x


class _PredictFlow(nn.Module):
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        return nn.Conv(2, (3, 3), padding=[(1, 1), (1, 1)],
                       dtype=self.dtype)(x)


class FlowNetSD(nn.Module):
    """Input: (B, H, W, 6) image pair in [0, 1]; returns flow2 (B, H/4, W/4, 2)
    (eval mode), or the 5-scale pyramid when ``train_mode``."""

    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False, train_mode: bool = False):
        C = lambda f, k=3, s=1, name=None: _ConvBlock(
            f, k, s, dtype=self.dtype, name=name)

        c0 = C(64, name="conv0")(x, train)
        c1 = C(64, s=2, name="conv1")(c0, train)
        c1 = C(128, name="conv1_1")(c1, train)
        c2 = C(128, s=2, name="conv2")(c1, train)
        c2 = C(128, name="conv2_1")(c2, train)
        c3 = C(256, s=2, name="conv3")(c2, train)
        c3 = C(256, name="conv3_1")(c3, train)
        c4 = C(512, s=2, name="conv4")(c3, train)
        c4 = C(512, name="conv4_1")(c4, train)
        c5 = C(512, s=2, name="conv5")(c4, train)
        c5 = C(512, name="conv5_1")(c5, train)
        c6 = C(1024, s=2, name="conv6")(c5, train)
        c6 = C(1024, name="conv6_1")(c6, train)

        flow6 = _PredictFlow(name="predict_flow6")(c6)
        flow6_up = nn.ConvTranspose(2, (4, 4), strides=(2, 2),
                                    padding="SAME",
                                    name="up_flow6")(flow6)
        d5 = _Deconv(512, name="deconv5")(c6)

        cat5 = jnp.concatenate([c5, d5, flow6_up], -1)
        i5 = _ConvBlock(512, act=False, bias=True, name="inter_conv5")(cat5, train)
        flow5 = _PredictFlow(name="predict_flow5")(i5)
        flow5_up = nn.ConvTranspose(2, (4, 4), strides=(2, 2),
                                    padding="SAME",
                                    name="up_flow5")(flow5)
        d4 = _Deconv(256, name="deconv4")(cat5)

        cat4 = jnp.concatenate([c4, d4, flow5_up], -1)
        i4 = _ConvBlock(256, act=False, bias=True, name="inter_conv4")(cat4, train)
        flow4 = _PredictFlow(name="predict_flow4")(i4)
        flow4_up = nn.ConvTranspose(2, (4, 4), strides=(2, 2),
                                    padding="SAME",
                                    name="up_flow4")(flow4)
        d3 = _Deconv(128, name="deconv3")(cat4)

        cat3 = jnp.concatenate([c3, d3, flow4_up], -1)
        i3 = _ConvBlock(128, act=False, bias=True, name="inter_conv3")(cat3, train)
        flow3 = _PredictFlow(name="predict_flow3")(i3)
        flow3_up = nn.ConvTranspose(2, (4, 4), strides=(2, 2),
                                    padding="SAME",
                                    name="up_flow3")(flow3)
        d2 = _Deconv(64, name="deconv2")(cat3)

        cat2 = jnp.concatenate([c2, d2, flow3_up], -1)
        i2 = _ConvBlock(64, act=False, bias=True, name="inter_conv2")(cat2, train)
        flow2 = _PredictFlow(name="predict_flow2")(i2)

        if train_mode:
            return flow2, flow3, flow4, flow5, flow6
        return flow2


class FlowNetC(nn.Module):
    """Correlation-based FlowNet (reference ``networks/FlowNetC.py``):
    siamese 3-level encoders, a 441-channel cost volume at 1/8 resolution
    (our XLA correlation kernel), then the FlowNetS-style decoder."""

    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x1, x2, train: bool = False, train_mode: bool = False):
        C = lambda f, k=3, s=1, name=None: _ConvBlock(
            f, k, s, dtype=self.dtype, name=name)

        def encode(x, suffix):
            a = C(64, k=7, s=2, name=f"conv1{suffix}")(x, train)
            b = C(128, k=5, s=2, name=f"conv2{suffix}")(a, train)
            c = C(256, k=5, s=2, name=f"conv3{suffix}")(b, train)
            return a, b, c

        a1, b1, c1 = encode(x1, "a")
        _, _, c2 = encode(x2, "b")

        corr = nn.leaky_relu(
            correlation(c1, c2, max_displacement=20, stride2=2), 0.1)
        redir = C(32, k=1, name="conv_redir")(c1, train)
        x = jnp.concatenate([redir, corr], -1)

        x = C(256, name="conv3_1")(x, train)
        c4 = C(512, s=2, name="conv4")(x, train)
        c4 = C(512, name="conv4_1")(c4, train)
        c5 = C(512, s=2, name="conv5")(c4, train)
        c5 = C(512, name="conv5_1")(c5, train)
        c6 = C(1024, s=2, name="conv6")(c5, train)
        c6 = C(1024, name="conv6_1")(c6, train)

        flow6 = _PredictFlow(name="predict_flow6")(c6)
        flow6_up = nn.ConvTranspose(2, (4, 4), strides=(2, 2),
                                    padding="SAME",
                                    name="up_flow6")(flow6)
        d5 = _Deconv(512, name="deconv5")(c6)
        cat5 = jnp.concatenate([c5, d5, flow6_up], -1)

        flow5 = _PredictFlow(name="predict_flow5")(cat5)
        flow5_up = nn.ConvTranspose(2, (4, 4), strides=(2, 2),
                                    padding="SAME",
                                    name="up_flow5")(flow5)
        d4 = _Deconv(256, name="deconv4")(cat5)
        cat4 = jnp.concatenate([c4, d4, flow5_up], -1)

        flow4 = _PredictFlow(name="predict_flow4")(cat4)
        flow4_up = nn.ConvTranspose(2, (4, 4), strides=(2, 2),
                                    padding="SAME",
                                    name="up_flow4")(flow4)
        d3 = _Deconv(128, name="deconv3")(cat4)
        cat3 = jnp.concatenate([x, d3, flow4_up], -1)

        flow3 = _PredictFlow(name="predict_flow3")(cat3)
        flow3_up = nn.ConvTranspose(2, (4, 4), strides=(2, 2),
                                    padding="SAME",
                                    name="up_flow3")(flow3)
        d2 = _Deconv(64, name="deconv2")(cat3)
        cat2 = jnp.concatenate([b1, d2, flow3_up], -1)

        flow2 = _PredictFlow(name="predict_flow2")(cat2)
        if train_mode:
            return flow2, flow3, flow4, flow5, flow6
        return flow2


def load_torch_flownet_sd(path: str) -> dict:
    """Convert the published FlowNet2-SD torch checkpoint (or any state_dict
    of the reference FlowNetSD) to this module's variables
    ({'params': ..., 'batch_stats': ...}).  Validated against the torch
    implementation in tests/test_flownet_parity.py."""
    import numpy as np
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt)
    sd = {k: v.numpy() for k, v in sd.items()}

    params: dict = {}
    stats: dict = {}

    def put(tree, keys, val):
        node = tree
        for k in keys[:-1]:
            node = node.setdefault(k, {})
        node[keys[-1]] = jnp.asarray(val)

    def conv_w(w):  # OIHW -> HWIO
        return w.transpose(2, 3, 1, 0)

    def deconv_w(w):  # torch (in, out, kh, kw) -> flax (kh, kw, in, out),
        # spatially flipped (conv_transpose vs gradient-of-conv convention)
        return np.flip(w, (2, 3)).transpose(2, 3, 0, 1).copy()

    up_map = {
        "upsampled_flow6_to_5": "up_flow6",
        "upsampled_flow5_to_4": "up_flow5",
        "upsampled_flow4_to_3": "up_flow4",
        "upsampled_flow3_to_2": "up_flow3",
    }
    for key in sd:
        v = sd[key]
        parts = key.split(".")
        mod = parts[0]
        if mod in up_map:  # bare ConvTranspose
            name = up_map[mod]
            if parts[-1] == "weight":
                put(params, (name, "kernel"), deconv_w(v))
            else:
                put(params, (name, "bias"), v)
        elif mod.startswith("predict_flow"):  # bare Conv
            if parts[-1] == "weight":
                put(params, (mod, "Conv_0", "kernel"), conv_w(v))
            else:
                put(params, (mod, "Conv_0", "bias"), v)
        elif mod.startswith("deconv"):  # Sequential(ConvTranspose, LeakyReLU)
            if parts[-1] == "weight":
                put(params, (mod, "ConvTranspose_0", "kernel"), deconv_w(v))
            else:
                put(params, (mod, "ConvTranspose_0", "bias"), v)
        else:  # conv blocks: .0 = conv, .1 = batchnorm
            idx, leaf = parts[1], parts[2]
            if idx == "0":
                if leaf == "weight":
                    put(params, (mod, "Conv_0", "kernel"), conv_w(v))
                else:
                    put(params, (mod, "Conv_0", "bias"), v)
            else:
                if leaf == "weight":
                    put(params, (mod, "BatchNorm_0", "scale"), v)
                elif leaf == "bias":
                    put(params, (mod, "BatchNorm_0", "bias"), v)
                elif leaf == "running_mean":
                    put(stats, (mod, "BatchNorm_0", "mean"), v)
                elif leaf == "running_var":
                    put(stats, (mod, "BatchNorm_0", "var"), v)
    return {"params": params, "batch_stats": stats}


class FlowNetS(nn.Module):
    """Simple encoder-decoder FlowNet (reference ``networks/FlowNetS.py``):
    6-level encoder on a 12-channel stacked input, decoder predicting flow
    directly from the concats (no inter convs)."""

    input_channels: int = 12
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False, train_mode: bool = False):
        C = lambda f, k=3, s=1, name=None: _ConvBlock(
            f, k, s, dtype=self.dtype, name=name)

        c1 = C(64, k=7, s=2, name="conv1")(x, train)
        c2 = C(128, k=5, s=2, name="conv2")(c1, train)
        c3 = C(256, k=5, s=2, name="conv3")(c2, train)
        c3 = C(256, name="conv3_1")(c3, train)
        c4 = C(512, s=2, name="conv4")(c3, train)
        c4 = C(512, name="conv4_1")(c4, train)
        c5 = C(512, s=2, name="conv5")(c4, train)
        c5 = C(512, name="conv5_1")(c5, train)
        c6 = C(1024, s=2, name="conv6")(c5, train)
        c6 = C(1024, name="conv6_1")(c6, train)

        def up(name):
            return nn.ConvTranspose(2, (4, 4), strides=(2, 2),
                                    padding="SAME", use_bias=False, name=name)

        flow6 = _PredictFlow(name="predict_flow6")(c6)
        cat5 = jnp.concatenate(
            [c5, _Deconv(512, name="deconv5")(c6), up("up_flow6")(flow6)], -1)
        flow5 = _PredictFlow(name="predict_flow5")(cat5)
        cat4 = jnp.concatenate(
            [c4, _Deconv(256, name="deconv4")(cat5), up("up_flow5")(flow5)], -1)
        flow4 = _PredictFlow(name="predict_flow4")(cat4)
        cat3 = jnp.concatenate(
            [c3, _Deconv(128, name="deconv3")(cat4), up("up_flow4")(flow4)], -1)
        flow3 = _PredictFlow(name="predict_flow3")(cat3)
        cat2 = jnp.concatenate(
            [c2, _Deconv(64, name="deconv2")(cat3), up("up_flow3")(flow3)], -1)
        flow2 = _PredictFlow(name="predict_flow2")(cat2)

        if train_mode:
            return flow2, flow3, flow4, flow5, flow6
        return flow2


class FlowNetFusion(nn.Module):
    """Shallow fusion net over the 11-channel stack of both branch outputs
    (reference ``networks/FlowNetFusion.py``)."""

    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        C = lambda f, k=3, s=1, name=None: _ConvBlock(
            f, k, s, dtype=self.dtype, name=name)

        c0 = C(64, name="conv0")(x, train)
        c1 = C(64, s=2, name="conv1")(c0, train)
        c1 = C(128, name="conv1_1")(c1, train)
        c2 = C(128, s=2, name="conv2")(c1, train)
        c2 = C(128, name="conv2_1")(c2, train)

        flow2 = _PredictFlow(name="predict_flow2")(c2)
        flow2_up = nn.ConvTranspose(2, (4, 4), strides=(2, 2),
                                    padding="SAME", name="up_flow2")(flow2)
        d1 = _Deconv(32, name="deconv1")(c2)
        cat1 = jnp.concatenate([c1, d1, flow2_up], -1)
        i1 = _ConvBlock(32, act=False, bias=True, name="inter_conv1")(cat1, train)
        flow1 = _PredictFlow(name="predict_flow1")(i1)
        flow1_up = nn.ConvTranspose(2, (4, 4), strides=(2, 2),
                                    padding="SAME", name="up_flow1")(flow1)
        d0 = _Deconv(16, name="deconv0")(cat1)
        cat0 = jnp.concatenate([c0, d0, flow1_up], -1)
        i0 = _ConvBlock(16, act=False, bias=True, name="inter_conv0")(cat0, train)
        return _PredictFlow(name="predict_flow0")(i0)


class FlowNet2(nn.Module):
    """The full warping-and-stacking composite (reference
    ``models.py:29-188``): FlowNetC -> two warped-refinement FlowNetS passes
    -> FlowNetSD branch -> FlowNetFusion, with bilinear/nearest upsampling,
    flow-warping (``ops.resample2d``) and channel-norm error magnitudes
    (``ops.channel_norm``) between stages.

    Input: (B, H, W, 6) =two stacked normalized frames.  Output: (B, H, W, 2).
    """

    div_flow: float = 20.0
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        from jafpro_tpu.ops.image import channel_norm
        from jafpro_tpu.ops.sampling import resample2d, resize_bilinear, resize_nearest

        B, H, W, _ = x.shape
        img0, img1 = x[..., :3], x[..., 3:]

        flow_c2 = FlowNetC(dtype=self.dtype, name="flownetc")(
            img0, img1, train)
        flow_c = resize_bilinear(flow_c2 * self.div_flow, (H, W),
                                 align_corners=False)

        warped1 = resample2d(img1, flow_c)
        diff = channel_norm(img0 - warped1)
        cat1 = jnp.concatenate(
            [x, warped1, flow_c / self.div_flow, diff], -1)

        flow_s1_2 = FlowNetS(dtype=self.dtype, name="flownets_1")(cat1, train)
        flow_s1 = resize_bilinear(flow_s1_2 * self.div_flow, (H, W),
                                  align_corners=False)

        warped1 = resample2d(img1, flow_s1)
        diff = channel_norm(img0 - warped1)
        cat2 = jnp.concatenate(
            [x, warped1, flow_s1 / self.div_flow, diff], -1)

        flow_s2_2 = FlowNetS(dtype=self.dtype, name="flownets_2")(cat2, train)
        flow_s2 = resize_nearest(flow_s2_2 * self.div_flow, (H, W))
        norm_s2 = channel_norm(flow_s2)
        warp_s2 = resample2d(img1, flow_s2)
        diff_s2 = channel_norm(img0 - warp_s2)

        flow_sd_2 = FlowNetSD(dtype=self.dtype, name="flownets_d")(x, train)
        flow_sd = resize_nearest(flow_sd_2 / self.div_flow, (H, W))
        norm_sd = channel_norm(flow_sd)
        warp_sd = resample2d(img1, flow_sd)
        diff_sd = channel_norm(img0 - warp_sd)

        cat3 = jnp.concatenate(
            [img0, flow_sd, flow_s2, norm_sd, norm_s2, diff_sd, diff_s2], -1)
        return FlowNetFusion(dtype=self.dtype, name="flownetfusion")(
            cat3, train)


def flownet2_preprocess(frames: jnp.ndarray, rgb_max: float = 255.0):
    """(B, H, W, 3, 2) raw frame pair -> (B, H, W, 6) mean-subtracted stack
    (reference ``models.py:120-127``)."""
    rgb_mean = jnp.mean(frames, axis=(1, 2, 4), keepdims=True)
    x = (frames - rgb_mean) / rgb_max
    return jnp.concatenate([x[..., 0], x[..., 1]], axis=-1)


# ---- flow training losses (reference flownet2_pytorch/losses.py) ----

def epe(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """End-point error: mean L2 norm over the flow channel axis (NHWC)."""
    return jnp.mean(jnp.linalg.norm(target - pred, axis=-1))


def multiscale_flow_loss(
    pyramid, target: jnp.ndarray, start_scale: int = 4,
    l_weight: float = 0.32, div_flow: float = 0.05, norm: str = "L1",
):
    """Weighted multi-scale flow loss (reference ``losses.py:MultiScale``).
    pyramid: tuple of NHWC flows at 1/4, 1/8, ... resolution."""
    import jax

    target = div_flow * target
    loss = 0.0
    epev = 0.0
    for i, p in enumerate(pyramid):
        k = start_scale * (2 ** i)
        t = jax.lax.reduce_window(
            target, 0.0, jax.lax.add, (1, k, k, 1), (1, k, k, 1), "VALID"
        ) / (k * k)
        w = l_weight / (2 ** i)
        if norm == "L1":
            loss = loss + w * jnp.mean(jnp.abs(p - t))
        else:
            loss = loss + w * jnp.mean(jnp.linalg.norm(p - t, axis=-1))
        epev = epev + w * epe(p, t)
    return loss, epev
