"""torch -> flax weight converters for the five production modules.

Lets a user of the reference bring trained checkpoints
(``{Accu,inpaint,bg,refine,pro,D,FD}_iter_<N>.pth``, saved by
``train/4.convLSTM_flowpro_interval.py:514-533`` and consumed by
``test/conv_pro_test.py:110-141``) into the TPU pipeline.

Every converter is validated against the reference torch module executed as
an oracle with random weights (tests/test_torch_compat.py) — so the packed
per-part re-parameterization (PartConv block-diagonal kernels, conv-of-
concat = sum-of-convs splits, per-gate ConvLSTM convs) is proven numerically
identical to the reference's 24 independent networks.

Layout conventions:
  * torch Conv2d weight (out, in, kh, kw)  ->  flax (kh, kw, in, out)
  * per-part stacks: 24 torch convs        ->  PartConv (P, kh, kw, in, out),
    bias (P*out,) part-major
  * one torch conv over concatenated inputs -> several PartConvs, kernel
    input-columns split in the concat order (bias on the first)
  * torch ConvLSTMCell conv over [x, h] with gate chunks (i, f, o, g) ->
    eight per-gate PartConvs ({i,f,o,g}_{x,h}); bias lives on the _x conv
  * torch NCHW flatten before Linear        ->  permuted Dense kernel
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Sequence

import jax.numpy as jnp
import numpy as np

from jafpro_tpu.models.parts import ENC_NC


def _load_sd(path_or_sd):
    if isinstance(path_or_sd, (str, os.PathLike)):
        import torch

        sd = torch.load(path_or_sd, map_location="cpu", weights_only=False)
        sd = sd.get("state_dict", sd) if isinstance(sd, dict) else sd
    else:
        sd = path_or_sd
    out = {}
    for k, v in sd.items():
        if k.startswith("module."):  # nn.DataParallel prefix
            k = k[len("module."):]
        out[k] = v.numpy() if hasattr(v, "numpy") else np.asarray(v)
    return out


def _conv(w):
    return jnp.asarray(w.transpose(2, 3, 1, 0))  # OIHW -> HWIO


def _stack_part_conv(sd, fmt, parts):
    """fmt with one ``{p}`` -> PartConv {'kernel': (P,k,k,in,out),
    'bias': (P*out,)}."""
    ws = [sd[fmt.format(p=p) + ".weight"] for p in range(parts)]
    bs = [sd[fmt.format(p=p) + ".bias"] for p in range(parts)]
    kern = np.stack([w.transpose(2, 3, 1, 0) for w in ws])
    return {"kernel": jnp.asarray(kern),
            "bias": jnp.asarray(np.concatenate(bs))}


def _split_part_conv(sd, fmt, parts, in_splits: Sequence[int]):
    """One torch conv over concatenated inputs -> list of PartConv trees,
    kernel split along input channels at ``in_splits`` boundaries."""
    ws = np.stack([sd[fmt.format(p=p) + ".weight"].transpose(2, 3, 1, 0)
                   for p in range(parts)])  # (P, k, k, in, out)
    bs = np.concatenate([sd[fmt.format(p=p) + ".bias"]
                         for p in range(parts)])
    out, start = [], 0
    for i, c in enumerate(in_splits):
        tree = {"kernel": jnp.asarray(ws[:, :, :, start:start + c, :])}
        if i == 0:
            tree["bias"] = jnp.asarray(bs)
        out.append(tree)
        start += c
    return out


def _part_encoder(sd, fmt, parts):
    """9 stacked ``Downsampler`` convs -> PartEncoder tree.
    fmt: e.g. 'Downsampler_list.{{p}}.enc{n}.enconv.0'."""
    return {
        f"GroupConvLReLU_{n}": {
            "PartConv_0": _stack_part_conv(
                sd, fmt.format(n=n + 1), parts)}
        for n in range(9)
    }


def _part_decoder(sd, dec_fmt, head_fmt, parts, dec_in_splits):
    """4 ``Upsampler_SE`` convs + 3-ch head -> PartDecoder tree.
    ``dec_in_splits[level]``: input-channel split of dec{level+1}."""
    tree = {}
    for lvl in range(4):
        convs = _split_part_conv(
            sd, dec_fmt.format(n=lvl + 1), parts, dec_in_splits[lvl])
        tree[f"GroupConvLReLU_{lvl}"] = {
            f"PartConv_{i}": c for i, c in enumerate(convs)}
    tree["GroupConvLReLU_4"] = {
        "PartConv_0": _stack_part_conv(sd, head_fmt, parts)}
    return tree


def _lstm_cell(sd, prefix, parts, in_dim, hidden):
    """torch ConvLSTMCell fused conv -> eight per-gate PartConvs."""
    ws = np.stack([sd[f"{prefix.format(p=p)}.weight"].transpose(2, 3, 1, 0)
                   for p in range(parts)])  # (P, k, k, in+D, 4D)
    bs = np.stack([sd[f"{prefix.format(p=p)}.bias"]
                   for p in range(parts)])  # (P, 4D)
    tree = {}
    for g, name in enumerate(("i", "f", "o", "g")):
        sl = slice(g * hidden, (g + 1) * hidden)
        tree[f"{name}_x"] = {
            "kernel": jnp.asarray(ws[:, :, :, :in_dim, sl]),
            "bias": jnp.asarray(bs[:, sl].reshape(-1)),
        }
        tree[f"{name}_h"] = {
            "kernel": jnp.asarray(ws[:, :, :, in_dim:, sl])}
    return tree


def load_torch_accumulate(path_or_sd, parts: int = 24) -> dict:
    """``Accumulate_LSTM[_no_loss]`` state_dict -> AccumulateLSTM params
    (reference ``src/networks.py:1593-1662`` + ``Downsampler_convLSTM``
    ``:1290-1357`` + ``convLSTM.py:7-63``)."""
    sd = _load_sd(path_or_sd)
    nc = ENC_NC
    params = {
        "PartEncoder_0": _part_encoder(
            sd, "Downsampler_list.{{p}}.enc{n}.enconv.0", parts),
        "PartDecoder_0": _part_decoder(
            sd, "Upsampler_list.{{p}}.dec{n}.myconv.0",
            "Upsampler_list.{p}.conv", parts,
            # dec1 [x9(96) | x7(48)], dec2 [48 | x5(24)],
            # dec3 [24 | x3(24)], dec4 [12 | x1(12)]
            [(96, 48), (48, 24), (24, 24), (12, 12)]),
    }
    for lvl in range(5):
        d = nc[2 * lvl]
        params[f"lstm{lvl}"] = {"Scan_Cell_0": _lstm_cell(
            sd, f"Downsampler_list.{{p}}.convLSTM{lvl + 1}.cell_list.0.conv",
            parts, d, d)}
    return {"params": params}


def load_torch_inpainter(path_or_sd, parts: int = 24) -> dict:
    """``UNet_inpainter`` state_dict -> UNetInpainter params (reference
    ``src/networks.py:1121-1170, 1805-1828``)."""
    sd = _load_sd(path_or_sd)
    ge = 3 * parts
    params = {
        "PartEncoder_0": _part_encoder(
            sd, "Downsampler_list.{{p}}.enc{n}.enconv.0", parts),
        "GroupConvLReLU_0": {"PartConv_0": _stack_part_conv(
            sd, "Downsampler_list.{p}.enc_compress.enconv.0", parts)},
        "PartDecoder_0": _part_decoder(
            sd, "Upsampler_list.{{p}}.dec{n}.myconv.0",
            "Upsampler_list.{p}.conv", parts,
            # dec1 [x9(96) | global(72) | x7(48)], then [prev | skip]
            [(96, ge, 48), (96, 24), (48, 24), (24, 12)]),
    }
    return {"params": params}


def _conv_block(sd, prefix):
    """reference CRN ``ConvBlock`` (2 repeats) -> our ConvBlock tree
    (``crn_model.py:90-106``; Sequential [conv, LayerNorm, LReLU] x2)."""
    return {
        "Conv_0": {"kernel": _conv(sd[f"{prefix}.conv_block.0.weight"]),
                   "bias": jnp.asarray(sd[f"{prefix}.conv_block.0.bias"])},
        "SampleLayerNorm_0": {
            "gamma": jnp.asarray(sd[f"{prefix}.conv_block.1.gamma"]),
            "beta": jnp.asarray(sd[f"{prefix}.conv_block.1.beta"])},
        "Conv_1": {"kernel": _conv(sd[f"{prefix}.conv_block.3.weight"]),
                   "bias": jnp.asarray(sd[f"{prefix}.conv_block.3.bias"])},
        "SampleLayerNorm_1": {
            "gamma": jnp.asarray(sd[f"{prefix}.conv_block.4.gamma"]),
            "beta": jnp.asarray(sd[f"{prefix}.conv_block.4.beta"])},
    }


def load_torch_crn(path_or_sd, fg: bool = False) -> dict:
    """``CRN_smaller`` state_dict -> CRNSmaller params (reference
    ``src/crn_model.py:243-308``)."""
    sd = _load_sd(path_or_sd)
    params = {}
    for i in range(6):  # encoders 1..6
        params[f"ConvBlock_{i}"] = _conv_block(sd, f"conv{i + 1}_encoder")
    for i, lvl in enumerate(range(6, 0, -1)):  # decoders 6..1
        params[f"ConvBlock_{6 + i}"] = _conv_block(sd, f"conv{lvl}_decoder")
    params["ConvBlock_12"] = _conv_block(sd, "decoder")
    params["Conv_0"] = {"kernel": _conv(sd["out_conv.weight"]),
                        "bias": jnp.asarray(sd["out_conv.bias"])}
    if fg:
        params["Conv_1"] = {"kernel": _conv(sd["fg_conv.weight"]),
                            "bias": jnp.asarray(sd["fg_conv.bias"])}
    return {"params": params}


def _bn(sd, prefix):
    return {"scale": jnp.asarray(sd[f"{prefix}.weight"]),
            "bias": jnp.asarray(sd[f"{prefix}.bias"])}


def _reflect_conv(sd, prefix):
    return {"Conv_0": {"kernel": _conv(sd[f"{prefix}.weight"]),
                       "bias": jnp.asarray(sd[f"{prefix}.bias"])}}


def load_torch_propagation(path_or_sd) -> dict:
    """``Propagation3DFlowNet(9, 32, 2, 3, use_deconv=False)`` state_dict ->
    our Propagation3DFlowNet params (reference ``src/flow_net.py:6-99``).
    Sequential layout for (ngf=32, n_down=2, n_blocks=3):
    down [pad, conv, bn, relu, conv, bn, relu, conv, bn, relu, res, res],
    res [res], up [ups, conv, bn, relu, ups, conv, bn, relu],
    final [pad, conv, sigmoid]; ResnetBlock.conv_block
    [pad, conv, bn, act, pad, conv, bn]."""
    sd = _load_sd(path_or_sd)
    d = "composite_unet.model_down_img"
    r = "composite_unet.model_res_img"
    u = "composite_unet.model_up_img"
    f = "composite_unet.model_final_w"

    def res_block(prefix):
        return {
            "ReflectConv_0": _reflect_conv(sd, f"{prefix}.conv_block.1"),
            "BatchStatsNorm_0": _bn(sd, f"{prefix}.conv_block.2"),
            "ReflectConv_1": _reflect_conv(sd, f"{prefix}.conv_block.5"),
            "BatchStatsNorm_1": _bn(sd, f"{prefix}.conv_block.6"),
        }

    cw = {
        "ReflectConv_0": _reflect_conv(sd, f"{d}.1"),
        "BatchStatsNorm_0": _bn(sd, f"{d}.2"),
        "Conv_0": {"kernel": _conv(sd[f"{d}.4.weight"]),
                   "bias": jnp.asarray(sd[f"{d}.4.bias"])},
        "BatchStatsNorm_1": _bn(sd, f"{d}.5"),
        "Conv_1": {"kernel": _conv(sd[f"{d}.7.weight"]),
                   "bias": jnp.asarray(sd[f"{d}.7.bias"])},
        "BatchStatsNorm_2": _bn(sd, f"{d}.8"),
        "_ResnetBlock_0": res_block(f"{d}.10"),
        "_ResnetBlock_1": res_block(f"{d}.11"),
        "_ResnetBlock_2": res_block(f"{r}.0"),
        "Conv_2": {"kernel": _conv(sd[f"{u}.1.weight"]),
                   "bias": jnp.asarray(sd[f"{u}.1.bias"])},
        "BatchStatsNorm_3": _bn(sd, f"{u}.2"),
        "Conv_3": {"kernel": _conv(sd[f"{u}.5.weight"]),
                   "bias": jnp.asarray(sd[f"{u}.5.bias"])},
        "BatchStatsNorm_4": _bn(sd, f"{u}.6"),
        "ReflectConv_1": _reflect_conv(sd, f"{f}.1"),
    }
    return {"params": {"CompositeWeightUnet_0": cw}}


def _dense_from_nchw(w, b, c, h, wid):
    """torch Linear over an NCHW flatten -> flax Dense over NHWC flatten."""
    w = w.reshape(-1, c, h, wid).transpose(2, 3, 1, 0).reshape(
        h * wid * c, -1)
    return {"kernel": jnp.asarray(w), "bias": jnp.asarray(b)}


def _dcgan_discriminator(sd, conv_idx, bn_idx, feat_hw):
    params = {}
    for i, ci in enumerate(conv_idx):
        blk = {"Conv_0": {"kernel": _conv(sd[f"main.{ci}.weight"])}}
        if i > 0:
            blk["BatchStatsNorm_0"] = _bn(sd, f"main.{bn_idx[i - 1]}")
        params[f"_ConvBNLReLU_{i}"] = blk
    c_last = sd[f"main.{conv_idx[-1]}.weight"].shape[0]
    params["_MLPHead_0"] = {
        "Dense_0": _dense_from_nchw(
            sd["classifier.0.weight"], sd["classifier.0.bias"],
            c_last, feat_hw, feat_hw),
        "Dense_1": {"kernel": jnp.asarray(sd["classifier.2.weight"].T),
                    "bias": jnp.asarray(sd["classifier.2.bias"])},
    }
    return {"params": params}


def load_torch_image_discriminator(path_or_sd) -> dict:
    """``ImageDiscriminator`` (``src/networks.py:356-417``): 6 DCGAN convs
    (256 -> 4 px) + MLP."""
    sd = _load_sd(path_or_sd)
    return _dcgan_discriminator(
        sd, conv_idx=(0, 2, 5, 8, 11, 14), bn_idx=(3, 6, 9, 12, 15),
        feat_hw=4)


def load_torch_face_discriminator(path_or_sd) -> dict:
    """``FaceDiscriminator`` (``src/networks.py:419-456``): 4 convs
    (64 -> 4 px) + MLP."""
    sd = _load_sd(path_or_sd)
    return _dcgan_discriminator(
        sd, conv_idx=(0, 2, 5, 8), bn_idx=(3, 6, 9), feat_hw=4)


def load_torch_hmr(path_or_sd, num_blocks=(3, 4, 6, 3)) -> dict:
    """``HumanModelRecovery`` state_dict (e.g. the ``hmr_tf2pt.pth`` weights
    loaded at ``src/cal_flow.py:17-19``) -> our HMR variables
    ({'params', 'batch_stats'}).  SMPL buffers in the checkpoint are
    ignored (vertices come from `geometry.smpl`)."""
    sd = _load_sd(path_or_sd)
    params: dict = {"resnet": {}, "regressor": {}}
    stats: dict = {"resnet": {}}

    def bn(prefix):
        return ({"scale": jnp.asarray(sd[f"{prefix}.weight"]),
                 "bias": jnp.asarray(sd[f"{prefix}.bias"])},
                {"mean": jnp.asarray(sd[f"{prefix}.running_mean"]),
                 "var": jnp.asarray(sd[f"{prefix}.running_var"])})

    r = params["resnet"]
    rs = stats["resnet"]
    r["conv1"] = {"kernel": _conv(sd["resnet.conv1.weight"]),
                  "bias": jnp.asarray(sd["resnet.conv1.bias"])}
    for li, n in enumerate(num_blocks):
        for bi in range(n):
            t = f"resnet.layer{li + 1}.{bi}"
            name = f"layer{li + 1}_{bi}"
            blk, blk_s = {}, {}
            for b in ("bn1", "bn2", "bn3"):
                blk[b], blk_s[b] = bn(f"{t}.{b}")
            for c in ("conv1", "conv2"):
                blk[c] = {"kernel": _conv(sd[f"{t}.{c}.weight"])}
            blk["conv3"] = {"kernel": _conv(sd[f"{t}.conv3.weight"]),
                            "bias": jnp.asarray(sd[f"{t}.conv3.bias"])}
            if f"{t}.shortcut.0.weight" in sd:
                blk["shortcut"] = {
                    "kernel": _conv(sd[f"{t}.shortcut.0.weight"]),
                    "bias": jnp.asarray(sd[f"{t}.shortcut.0.bias"])}
            r[name] = blk
            rs[name] = blk_s
    r["post_bn"], rs["post_bn"] = bn("resnet.post_bn")

    g = params["regressor"]
    g["mean_theta"] = jnp.asarray(sd["regressor.mean_theta"])
    for i in (1, 2, 3):
        g[f"fc{i}"] = {
            "kernel": jnp.asarray(sd[f"regressor.fc_blocks.fc{i}.weight"].T),
            "bias": jnp.asarray(sd[f"regressor.fc_blocks.fc{i}.bias"])}
    return {"params": params, "batch_stats": stats}


def load_torch_pipeline(ckpt_dir: str, iteration: int = 42000,
                        names: Optional[Dict[str, str]] = None) -> dict:
    """Load the five generation modules the way ``conv_pro_test.py:110-141``
    does (``{Accu,inpaint,bg,refine,pro}_iter_<N>.pth``) into the pipeline's
    params dict {accu, inpaint, bg, refine, pro}."""
    n = dict(accu="Accu", inpaint="inpaint", bg="bg", refine="refine",
             pro="pro")
    if names:
        n.update(names)

    def p(stem):
        return os.path.join(ckpt_dir, f"{stem}_iter_{iteration}.pth")

    return {
        "accu": load_torch_accumulate(p(n["accu"]))["params"],
        "inpaint": load_torch_inpainter(p(n["inpaint"]))["params"],
        "bg": load_torch_crn(p(n["bg"]), fg=False)["params"],
        "refine": load_torch_crn(p(n["refine"]), fg=True)["params"],
        "pro": load_torch_propagation(p(n["pro"]))["params"],
    }
